"""Property tests: the Python canonicalizer and its DuckDB SQL twin
must agree on arbitrary inputs, not just the curated truth table."""

import duckdb
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from visiblev8_crawler_ray.functions import urls as U

# URL-ish strings assembled from printable AND control-whitespace
# tokens — embedded \t\n\r\v\f must parse byte-identically on both
# engines (the (?s) dotall alignment, ADVICE r3; leading/trailing ones
# exercise the shared trim char set)
_TOKEN = st.sampled_from(
    list("abcXYZ019./:?#&=%-_~ \t\n\r\x0b\x0c")
    + ["://", "http://", "HTTPS://", ":80", ":443", "#f", "?a=1", "ftp://"]
)
_ALPHA = st.lists(_TOKEN, min_size=0, max_size=8).map("".join)


@settings(max_examples=200, deadline=None)
@given(st.lists(_ALPHA, min_size=1, max_size=20))
def test_canonicalize_sql_parity_fuzz(urls):
    out = U.canonicalize(pa.array(urls, type=pa.string()))
    con = duckdb.connect()
    con.register("t", pa.table({"url": pa.array(urls, type=pa.string())}))
    got = con.sql(
        f"SELECT {U.canonical_sql_expr('url')} c, {U.valid_sql_expr('url')} v FROM t"
    ).fetchall()
    assert [g[0] for g in got] == out["canonical_url"].to_pylist()
    assert [bool(g[1]) for g in got] == out["valid"].to_pylist()


@settings(max_examples=100, deadline=None)
@given(_ALPHA)
def test_canonicalize_idempotent(url):
    once = U.canonicalize(pa.array([url]))
    if not once["valid"][0].as_py():
        return
    cu = once["canonical_url"][0].as_py()
    twice = U.canonicalize(pa.array([cu]))
    assert twice["canonical_url"][0].as_py() == cu
