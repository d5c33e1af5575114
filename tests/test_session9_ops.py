"""Ninth-continuation operators: token entropy, grouped correlation /
regression, hard-negative mining, code detection, edit-distance pairs —
hand-checkable semantics beyond the DuckDB-twin gate."""

import math
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from visiblev8_crawler_ray.pipelines import analytics as A  # noqa: E402
from visiblev8_crawler_ray.pipelines import textops as T  # noqa: E402


def _write_docs(tmp_path, texts, sources=None):
    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * n),
        "source": pa.array(sources or ["s0"] * n),
        "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_token_entropy_hand_cases(ray_session, tmp_path):
    sf = _write_docs(tmp_path, [
        "a a a a",      # one token repeated -> entropy exactly 0
        "a b c d",      # uniform over 4 -> ln(4)
        "a a b b",      # uniform over 2 -> ln(2)
        "",             # empty -> all-zero row
    ])
    out = T.token_entropy(sf)
    assert out["n_tokens"].tolist() == [4, 4, 4, 0]
    assert out["n_distinct"].tolist() == [1, 4, 2, 0]
    assert out["entropy_q"].tolist()[0] == 0
    assert out["entropy"].tolist()[3] == 0.0
    assert abs(out["entropy"][1] - math.log(4)) < 1e-5
    assert abs(out["entropy"][2] - math.log(2)) < 1e-5
    # entropy is maximal for the uniform doc
    assert out["entropy"][1] > out["entropy"][2] > out["entropy"][0]


def test_group_corr_hand_cases(ray_session, tmp_path):
    # group A: y = 10x exactly -> corr 1, slope 10, intercept 0
    # group N: y = -10x + 40    -> corr -1, slope -10, intercept 40
    # group R/O (constant x)    -> degenerate: corr/slope 0, icpt avg(y)
    ts = pd.Timestamp("1995-06-01")
    rows = [
        ("A", "F", 1.0, 10.0), ("A", "F", 2.0, 20.0), ("A", "F", 3.0, 30.0),
        ("N", "O", 1.0, 30.0), ("N", "O", 2.0, 20.0), ("N", "O", 3.0, 10.0),
        ("R", "O", 5.0, 7.0), ("R", "O", 5.0, 9.0),
    ]
    t = pa.table({
        "l_returnflag": pa.array([r[0] for r in rows]),
        "l_linestatus": pa.array([r[1] for r in rows]),
        "l_shipdate": pa.array([ts] * len(rows), type=pa.timestamp("us")),
        "l_quantity": pa.array([r[2] for r in rows]),
        "l_extendedprice": pa.array([r[3] for r in rows]),
    })
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = A.group_corr(str(tmp_path)).set_index("l_returnflag")
    # corr is three float ops deep -> 1 +- 1 ulp, exactly like the twin
    assert abs(out.loc["A", "corr_qty_price"] - 1.0) < 1e-12
    assert out.loc["A", "slope_price_qty"] == 10.0
    assert out.loc["A", "intercept_price_qty"] == 0.0
    assert abs(out.loc["N", "corr_qty_price"] + 1.0) < 1e-12
    assert out.loc["N", "slope_price_qty"] == -10.0
    assert out.loc["N", "intercept_price_qty"] == 40.0
    assert out.loc["R", "corr_qty_price"] == 0.0
    assert out.loc["R", "slope_price_qty"] == 0.0
    assert out.loc["R", "intercept_price_qty"] == 8.0
    assert out["ship_year"].tolist() == [1995] * 3
