"""Seeded fuzz for the embeddings-only and events-only SQL-gated
operators over RANDOMIZED tables — same gate as the documents fuzz in
test_fuzz_session5.py: bit-exact DuckDB parity must hold on ANY input,
including planted exact duplicates, cosine ties, same-timestamp events
and empty-ish groups."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as R  # noqa: E402

EMB_OPS = ["embedding_centroids", "embedding_covariance",
           "embedding_near_dup", "embedding_quantize", "kmeans_step",
           "knn_brute", "near_dup_clusters", "semantic_dedup"]
EV_OPS = ["distinct_users_salted", "event_type_stats",
          "events_group_zscore", "events_hopping_window",
          "events_late_drop", "events_props_parse",
          "events_running_stats", "events_tumbling_window",
          "events_value_band", "funnel_counts", "results_upsert",
          "sessionize", "top_events_per_user", "value_quantiles"]


def _norm(df):
    df = pd.DataFrame(df)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _random_embeddings(rng, n=48, dim=64):
    mat = rng.normal(0, 1, (n, dim)).round(4)
    # plant exact duplicates and near-duplicates (scaled copies have
    # cosine 1.0; tiny perturbations sit near the near-dup thresholds)
    mat[7] = mat[3]
    mat[11] = mat[5] * 2.0
    mat[13] = mat[5] + rng.normal(0, 0.01, dim).round(4)
    return pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
        "label": pa.array((np.arange(n) % 4).astype(np.int32)),
    })


def _random_events(rng, n=400):
    base = np.datetime64("2024-01-01T00:00:00")
    # coarse offsets force same-timestamp ties; bursts force session
    # and window boundary cases
    offs = np.sort(rng.integers(0, 5000, n)) * np.timedelta64(37, "s")
    types = np.array(["signup", "login", "purchase", "error", "view"])
    return pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "ts": pa.array((base + offs).astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 12, n).astype(np.int64)),
        "event_type": pa.array(types[rng.integers(0, 5, n)]),
        "value": pa.array(np.round(rng.uniform(0, 300, n), 2)),
        "props": pa.array(
            [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n)]),
    })


def _run(ops, table_name, tbl, tmp_path):
    pq.write_table(tbl, tmp_path / f"{table_name}.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW {table_name} AS SELECT * "
            f"FROM '{tmp_path}/{table_name}.parquet'")
    q, sql = R.queries(), R.oracle_sql()
    for name in ops:
        res = q[name](str(tmp_path))
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        odf = con.sql(sql[name]).df()
        a, b = _norm(df), _norm(odf)
        assert list(a.columns) == list(b.columns), name
        assert len(a) == len(b), (name, len(a), len(b))
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=True, obj=name)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_embeddings_ops_fuzz_vs_duckdb(ray_session, tmp_path, seed):
    rng = np.random.default_rng(200 + seed)
    _run(EMB_OPS, "embeddings", _random_embeddings(rng), tmp_path)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_events_ops_fuzz_vs_duckdb(ray_session, tmp_path, seed):
    rng = np.random.default_rng(300 + seed)
    _run(EV_OPS, "events", _random_events(rng), tmp_path)
