"""Full-surface rehearsal artifact: run EVERY `oracle_sql()`-gated query
against its DuckDB twin and write `GATE_RESULTS.json` (query ->
pass/fail + both value hashes) — the checked-in evidence the driver's
sampled CORRECTNESS rows can be diffed against (VERDICT r4 "Next" #4).

    python scripts/gate_artifact.py [--sf /root/testdata/sf0.01]

Hash = sha256 over the column-name-sorted, row-sorted CSV rendering of
the result (9 significant digits for floats) — the same normalization
`tests/test_queries_vs_duckdb.py` compares with, reduced to a digest.
Rows-only queries (no SQL twin) are recorded with their row count.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(list(df.columns))
    return df.reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    body = _norm(pd.DataFrame(df)).to_csv(index=False, float_format="%.9g")
    return hashlib.sha256(body.encode()).hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="GATE_RESULTS.json")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as R

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{args.sf}/{t}.parquet'")

    q, o = R.queries(), R.oracle_sql()
    results: dict[str, dict] = {}
    n_pass = n_fail = 0
    t_all = time.time()
    for name in sorted(q):
        t0 = time.time()
        row: dict = {}
        try:
            res = q[name](args.sf)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            df = pd.DataFrame(df)
            row["rows"] = int(len(df))
            row["hash"] = value_hash(df)
            if name in o:
                odf = con.sql(o[name]).df()
                row["oracle_rows"] = int(len(odf))
                row["oracle_hash"] = value_hash(odf)
                row["pass"] = (row["hash"] == row["oracle_hash"]
                               and sorted(df.columns)
                               == sorted(odf.columns))
            else:
                row["pass"] = None  # rows-only query: executed, no twin
        except Exception as e:  # noqa: BLE001 - record, keep sweeping
            row["pass"] = False
            row["error"] = f"{type(e).__name__}: {e}"[:300]
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        if row["pass"] is True:
            n_pass += 1
        elif row["pass"] is False:
            n_fail += 1
            print(f"FAIL {name}: {row.get('error', 'hash mismatch')}",
                  file=sys.stderr)

    out = {
        "sf": args.sf,
        "n_queries": len(q),
        "n_sql_gated": len(o),
        "n_pass": n_pass,
        "n_fail": n_fail,
        "n_rows_only": len(q) - len(o),
        "total_sec": round(time.time() - t_all, 1),
        "queries": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{args.out}: {n_pass}/{len(o)} SQL-gated pass, "
          f"{n_fail} fail, {len(q) - len(o)} rows-only, "
          f"{out['total_sec']}s")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
