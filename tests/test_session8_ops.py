"""Eighth-continuation operators: ExactSubstr removal, cross-source
shingle overlap, FULL OUTER customer/orders rollup — hand-checkable
semantics beyond the DuckDB-twin gate."""

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


def test_strip_dup_substrings_hand_case(ray_session, tmp_path):
    # 8-token run "a b c d e f g h" appears in doc0 and doc1 -> those
    # tokens vanish from both; doc2 is untouched; doc3 is shorter than
    # k and survives whole; doc4 is whitespace-only.
    dup = "a b c d e f g h"
    sf = _write_docs(tmp_path, [
        f"x1 {dup} y1 y2 y3 y4 y5 y6 y7",
        f"{dup} z1 z2 z3 z4 z5 z6 z7",
        "u1 u2 u3 u4 u5 u6 u7 u8 u9",
        "short doc",
        "  \t ",
    ])
    out = (T.strip_dup_substrings(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_tokens"].tolist() == [16, 15, 9, 2, 0]
    assert out["clean_text"].tolist() == [
        "x1 y1 y2 y3 y4 y5 y6 y7",
        "z1 z2 z3 z4 z5 z6 z7",
        "u1 u2 u3 u4 u5 u6 u7 u8 u9",
        "short doc",
        "",
    ]
    assert out["n_kept"].tolist() == [8, 7, 9, 2, 0]


def test_strip_dup_substrings_within_doc_repeat(ray_session, tmp_path):
    # the duplicated shingle occurs twice INSIDE one doc -> both
    # occurrences are covered (corpus-wide count >= 2 includes same-doc)
    run = "p q r s t u v w"
    sf = _write_docs(tmp_path, [f"{run} mid {run} tail"])
    out = T.strip_dup_substrings(sf).to_pandas()
    assert out["clean_text"].tolist() == ["mid tail"]
    assert out["n_kept"].tolist() == [2]


def test_strip_dup_substrings_overlapping_intervals(ray_session, tmp_path):
    # doc0/doc1 share a 9-token run -> two overlapping dup shingles in
    # each doc; interval union must not double-count or leave gaps
    run = "a b c d e f g h i"
    sf = _write_docs(tmp_path, [f"{run} x", f"y {run}"])
    out = (T.strip_dup_substrings(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["clean_text"].tolist() == ["x", "y"]


def test_source_overlap_hand_case(ray_session, tmp_path):
    # s0 and s1 share two distinct shingles; s2 shares nothing
    ra = "a b c d e f g h"
    rb = "m n o p q r s t"
    sf = _write_docs(
        tmp_path,
        [f"{ra} {rb}", f"{ra} tail0", f"pre0 {rb}", "u v w x y z q2 q3"],
        sources=["s0", "s1", "s1", "s2"])
    out = T.source_overlap(sf)
    # s0<->s1 share: shingle ra, shingle rb, plus any window crossing?
    # doc0 = ra+rb has crossing shingles not present in s1 docs, so
    # exactly the 2 runs overlap
    assert out[["source_a", "source_b"]].values.tolist() == [["s0", "s1"]]
    assert out["n_shared"].tolist() == [2]


def test_customer_orders_full_outer_semantics(ray_session, tmp_path):
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], type=pa.int64()),
        "c_name": pa.array(["alice", "bob", "carol"]),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 9], type=pa.int64()),  # 9 = orphan
        "o_totalprice": pa.array([10.005, 20.0, 5.0]),
    }), tmp_path / "orders.parquet")
    out = A.customer_orders_full(str(tmp_path))
    assert out["custkey"].tolist() == [1, 2, 3, 9]
    assert out["n_orders"].tolist() == [2, 0, 0, 1]
    # 10.005 * 100 rounds half-away to 1001 (the repo-wide contract)
    assert out["total_cents"].tolist() == [3001, 0, 0, 500]
    assert out["c_name"].tolist()[:3] == ["alice", "bob", "carol"]
    assert pd.isna(out["c_name"].iloc[3])


def test_link_stats_constructed_doc(ray_session):
    import ray.data as rd
    from visiblev8_crawler_ray.stages.parse import link_stats

    def span(kind, text, off):
        return {"kind": kind, "text": text, "media_ref": "", "offset": off}

    docs = rd.from_items([
        {"doc_id": "d0", "spans": [
            span("isolate", "0x0001", 0),
            span("origin", "http://a.example", 1),
            span("link", "http://a.example/x", 2),
            span("link", "http://a.example/x", 3),   # duplicate URL
            span("link", "http://b.example/y", 4),   # offsite
        ]},
        {"doc_id": "d1", "spans": [
            span("origin", "https://c.example", 0),
        ]},
    ])
    out = (link_stats(docs).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["page_host"].tolist() == ["a.example", "c.example"]
    assert out["n_links"].tolist() == [3, 0]
    assert out["n_distinct_links"].tolist() == [2, 0]
    assert out["n_offsite"].tolist() == [1, 0]


def test_hash_embed_exactness(ray_session, tmp_path):
    # components must equal the naive integer reference: tf per md5
    # bucket x the deterministic weight matrix
    import hashlib
    sf = _write_docs(tmp_path, ["alpha beta alpha", "", "gamma"])
    out = (T.hash_embed(str(tmp_path)).sort_values("doc_id")
           .reset_index(drop=True))
    W = T._hash_embed_weights(32, 8)

    def emb(text):
        v = np.zeros(8, dtype=np.int64)
        n = 0
        for tok in text.split():
            b = int.from_bytes(
                hashlib.md5(tok.encode()).digest()[8:], "little") % 32
            v += W[b]
            n += 1
        return n, v

    for i, text in enumerate(["alpha beta alpha", "", "gamma"]):
        n, v = emb(text)
        assert out.loc[i, "n_tokens"] == n
        got = out.loc[i, [f"e{j}" for j in range(8)]].to_numpy(np.int64)
        assert (got == v).all(), (i, got, v)


def test_url_path_rollup_constructed_log(ray_session):
    import ray.data as rd
    from visiblev8_crawler_ray.pipelines.analytics import url_path_rollup

    log = rd.from_items([
        {"host": "a", "url": "http://a/x/1", "status": "ok"},
        {"host": "a", "url": "http://a/x/2", "status": "failed"},
        {"host": "a", "url": "http://a/y", "status": "ok"},
        {"host": "a", "url": "http://a", "status": "ok"},        # root
        {"host": "b", "url": "http://b/x?q=1", "status": "ok"},
    ])
    out = url_path_rollup(log)
    assert out.values.tolist() == [
        ["a", "", 1, 1], ["a", "x", 2, 1], ["a", "y", 1, 1],
        ["b", "x", 1, 1]]
