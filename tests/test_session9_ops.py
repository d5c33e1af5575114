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
