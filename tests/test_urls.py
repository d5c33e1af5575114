"""URL canonicalize/validate truth table + DuckDB SQL parity.

Mirrors the reference's only real unit tests: the URL-validation truth
table in ``backend/tests/unit/test_api_v1.py:30-48``.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from visiblev8_crawler_ray.config import DEFAULT_CONFIG
from visiblev8_crawler_ray.functions import urls as U
from visiblev8_crawler_ray import synth

CASES = [
    # raw, canonical, valid
    ("http://a.example/x", "http://a.example/x", True),
    ("https://a.example", "https://a.example/", True),
    ("a.example/x", "https://a.example/x", True),          # scheme default
    ("HTTP://A.EXAMPLE/X", "http://a.example/X", True),    # case: scheme+host only
    ("http://a.example:80/x", "http://a.example/x", True),  # default port
    ("https://a.example:443/x", "https://a.example/x", True),
    ("https://a.example:8443/x", "https://a.example:8443/x", True),  # kept
    ("https://a.example/x#frag", "https://a.example/x", True),
    ("https://a.example/x?b=2&a=1", "https://a.example/x?a=1&b=2", True),  # M2 param sort
    ("ftp://a.example/x", "ftp://a.example/x", False),
    ("", "https:///", False),
    ("   http://a.example/x  ", "http://a.example/x", True),
]


def test_canonicalize_truth_table():
    out = U.canonicalize(pa.array([c[0] for c in CASES]))
    assert out["canonical_url"].to_pylist() == [c[1] for c in CASES]
    assert out["valid"].to_pylist() == [c[2] for c in CASES]


def test_sql_parity_on_cases():
    con = duckdb.connect()
    con.register("t", pa.table({"url": [c[0] for c in CASES]}))
    got = con.sql(
        f"SELECT {U.canonical_sql_expr('url')} c, {U.valid_sql_expr('url')} v FROM t"
    ).fetchall()
    assert [g[0] for g in got] == [c[1] for c in CASES]
    assert [bool(g[1]) for g in got] == [c[2] for c in CASES]


def test_seed_derivation_sql_parity():
    # the python seed generator and seeds_sql() must agree row for row
    doc_ids = np.arange(200)
    tbl = synth.seeds_table(doc_ids, DEFAULT_CONFIG)
    con = duckdb.connect()
    con.register("documents", pa.table({"doc_id": doc_ids}))
    got = con.sql(synth.seeds_sql() + " ORDER BY seed_id").fetchall()
    assert [g[1] for g in got] == tbl["url"].to_pylist()


def test_md5_matches_duckdb():
    vals = ["", "abc", "https://a.example/x"]
    con = duckdb.connect()
    got = [con.sql(f"select md5('{v}')").fetchone()[0] for v in vals]
    assert U.md5_hex(pa.array(vals)).to_pylist() == got


def test_extract_host():
    arr = pa.array(["https://a.b.example/x/y", "http://h.example:8080/z"])
    assert U.extract_host(arr).to_pylist() == ["a.b.example", "h.example"]


def test_actions_sql_parity():
    """actions_for and actions_sql_expr must emit byte-identical JSON."""
    doc_ids = np.arange(100)
    py = synth.actions_for(doc_ids).tolist()
    con = duckdb.connect()
    con.register("documents", pa.table({"doc_id": doc_ids}))
    got = con.sql(
        f"SELECT {synth.actions_sql_expr('doc_id')} FROM documents ORDER BY doc_id"
    ).fetchall()
    assert [g[0] for g in got] == py
