"""crawl_to_corpus (the end-to-end crawl -> curated packed corpus
composition): branch-forcing constructed docs vs the generated DuckDB
twin, plus non-triviality on the real crawl-backed gate fixture (that
path is covered by test_queries_vs_duckdb)."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")
import ray.data as rd  # noqa: E402

from visiblev8_crawler_ray.pipelines import curation as CU  # noqa: E402


def _doc(doc_id, texts, media=()):
    spans = []
    off = 0
    for t in texts:
        spans.append({"kind": "script", "text": t, "media_ref": "",
                      "offset": off})
        off += 1
    for m in media:
        spans.append({"kind": "media/screenshot", "text": "",
                      "media_ref": m, "offset": off})
        off += 1
    return {"doc_id": doc_id, "spans": spans}


SPAN_T = pa.struct([("kind", pa.string()), ("text", pa.string()),
                    ("media_ref", pa.string()), ("offset", pa.int32())])


def _docs_table(rows):
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows]),
        "spans": pa.array([r["spans"] for r in rows],
                          type=pa.list_(SPAN_T)),
    })


@pytest.mark.parametrize("seed", [0, 1])
def test_constructed_branches_vs_sql(ray_session, tmp_path, seed):
    rng = np.random.default_rng(4700 + seed)
    words = np.array(["alpha", "beta", "gamma", "delta", "eps"])
    rows = []
    long_text = " ".join(words[rng.integers(0, 5, 150)])
    for i in range(12):
        # long docs that pass the floor; ids interleave two hex prefixes
        pid = f"{'a' if i % 2 else 'f'}{i:03x}-w0"
        body = " ".join(words[rng.integers(0, 5, 120 + i)])
        rows.append(_doc(pid, [body, long_text]))
    # planted EXACT duplicates of doc 0 (same rendered text, later ids:
    # the min-doc_id canonicality must keep only f000-w0)
    rows.append({"doc_id": "f900-w0", "spans": rows[0]["spans"]})
    rows.append({"doc_id": "f901-w0", "spans": rows[0]["spans"]})
    # short doc (under the floor), media-heavy doc (density cap),
    # empty doc (no spans)
    rows.append(_doc("b000-w0", ["tiny doc"]))
    rows.append(_doc("b001-w0", ["some words here now"],
                     media=[f"blob://m{j}" for j in range(9)]))
    rows.append({"doc_id": "b002-w0", "spans": []})
    tbl = _docs_table(rows)
    exp = tmp_path / "docs.parquet"
    pq.write_table(tbl, exp)

    res = CU.crawl_to_corpus(rd.from_arrow(tbl), window=64,
                             min_tokens=30, media_den=10)
    odf = duckdb.sql(CU.crawl_to_corpus_sql(str(exp), window=64,
                                            min_tokens=30,
                                            media_den=10)).df()
    a = res.sort_values("doc_id").reset_index(drop=True)
    b = odf.sort_values("doc_id").reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  check_exact=True)
    kept = set(a["doc_id"])
    # duplicates of f000's text: only the smallest id survives
    assert "f900-w0" not in kept and "f901-w0" not in kept
    assert sum(1 for d in kept if d.startswith("f0")) >= 1
    # floor, density cap and empty doc all dropped
    assert {"b000-w0", "b001-w0", "b002-w0"} & kept == set()
    # packing invariants: offsets are the exclusive prefix sum in
    # doc_id order and pack ids are monotone
    srt = a.sort_values("doc_id")
    n = srt["n_tokens"].to_numpy()
    assert (srt["start_offset"].to_numpy()
            == np.cumsum(n) - n).all()
    assert (np.diff(srt["pack_id"].to_numpy()) >= 0).all()


def test_crawl_backed_output_nontrivial(ray_session):
    """On the real sf0.001 crawl fixture the composite must keep a
    non-trivial subset (filters fire but don't wipe the corpus)."""
    import __ray_entry__ as R

    out = R.queries()["crawl_to_corpus"]("/root/testdata/sf0.001")
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert 0 < len(df)
    assert df["spans_boundary"].any()
    assert df["pack_id"].max() > 0


def test_host_boilerplate_constructed(ray_session, tmp_path):
    """Planted template spans: hosts a (4 pages, shared footer) and b
    (2 pages — under min_pages) vs the generated SQL twin."""
    import pyarrow.parquet as _pq

    from visiblev8_crawler_ray.stages.parse import (
        host_boilerplate_spans, host_boilerplate_spans_sql)

    rows, log = [], []
    for i in range(4):
        rows.append(_doc(f"a{i:02d}-w0",
                         [f"unique body {i}", "SHARED FOOTER"],
                         media=["blob://x"] if i == 0 else ()))
        log.append({"doc_id": f"a{i:02d}-w0", "host": "a.example"})
    for i in range(2):
        rows.append(_doc(f"b{i:02d}-w0", ["tiny page", "B FOOTER"]))
        log.append({"doc_id": f"b{i:02d}-w0", "host": "b.example"})
    # a doc missing from the log: dropped by the inner join on both sides
    rows.append(_doc("c00-w0", ["orphan page", "SHARED FOOTER"]))
    tbl = _docs_table(rows)
    ltbl = pa.table({"doc_id": pa.array([r["doc_id"] for r in log]),
                     "host": pa.array([r["host"] for r in log])})
    _pq.write_table(tbl, tmp_path / "docs.parquet")
    _pq.write_table(ltbl, tmp_path / "log.parquet")

    res = host_boilerplate_spans(rd.from_arrow(tbl), rd.from_arrow(ltbl),
                                 min_pages=3, num=1, den=2)
    odf = duckdb.sql(host_boilerplate_spans_sql(
        str(tmp_path / "docs.parquet"), str(tmp_path / "log.parquet"),
        min_pages=3, num=1, den=2)).df()
    a = res.reset_index(drop=True)
    b = odf.reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  check_exact=True)
    # the shared footer on host a is the only boilerplate hit
    assert len(a) == 1 and a.loc[0, "host"] == "a.example"
    assert a.loc[0, "n_pages"] == 4 and a.loc[0, "host_pages"] == 4


def test_strip_boilerplate_constructed(ray_session, tmp_path):
    """Detect->strip round trip on the planted-template corpus: host a's
    shared footer is removed from all 4 pages, everything else kept."""
    import pyarrow.parquet as _pq

    from visiblev8_crawler_ray.stages.parse import (
        strip_boilerplate, strip_boilerplate_sql)

    rows, log = [], []
    for i in range(4):
        rows.append(_doc(f"a{i:02d}-w0",
                         [f"unique body words {i}", "SHARED FOOTER HERE"],
                         media=["blob://x"] if i == 0 else ()))
        log.append({"doc_id": f"a{i:02d}-w0", "host": "a.example"})
    rows.append(_doc("c00-w0", ["orphan page", "SHARED FOOTER HERE"]))
    tbl = _docs_table(rows)
    ltbl = pa.table({"doc_id": pa.array([r["doc_id"] for r in log]),
                     "host": pa.array([r["host"] for r in log])})
    _pq.write_table(tbl, tmp_path / "docs.parquet")
    _pq.write_table(ltbl, tmp_path / "log.parquet")

    res = strip_boilerplate(rd.from_arrow(tbl), rd.from_arrow(ltbl),
                            min_pages=3, num=1, den=2)
    odf = duckdb.sql(strip_boilerplate_sql(
        str(tmp_path / "docs.parquet"), str(tmp_path / "log.parquet"),
        min_pages=3, num=1, den=2)).df()
    pd.testing.assert_frame_equal(
        res.reset_index(drop=True), odf.reset_index(drop=True),
        check_dtype=False, check_exact=True)
    by_id = res.set_index("doc_id")
    for i in range(4):
        assert by_id.loc[f"a{i:02d}-w0", "n_removed"] == 1
    # the orphan (no log row) keeps its copy of the shared footer
    assert by_id.loc["c00-w0", "n_removed"] == 0
    # a00 keeps its media placeholder token: 4 body + 1 media
    assert by_id.loc["a00-w0", "n_tokens_clean"] == 5


def test_crawl_diff_constructed(ray_session, tmp_path):
    """All four delta classes forced: same, changed, removed (A only),
    added (B only) — engine vs the generated SQL twin."""
    import pyarrow.parquet as _pq

    from visiblev8_crawler_ray.stages.parse import (crawl_diff,
                                                    crawl_diff_sql)

    def mk(rows, log):
        t = _docs_table(rows)
        lt = pa.table({
            "doc_id": pa.array([r[0] for r in log]),
            "url_key": pa.array([r[1] for r in log]),
            "host": pa.array([r[2] for r in log]),
            "status": pa.array([r[3] for r in log]),
        })
        return t, lt

    docs_a, log_a = mk(
        [_doc("d1-w0", ["stable page text"]),
         _doc("d2-w0", ["old content here"]),
         _doc("d3-w0", ["vanishing page"]),
         _doc("d5-w0", ["failed fetch content"])],
        [("d1-w0", "k1", "a.example", "ok"),
         ("d2-w0", "k2", "a.example", "ok"),
         ("d3-w0", "k3", "b.example", "ok"),
         ("d5-w0", "k5", "b.example", "failed")])  # non-ok: excluded
    docs_b, log_b = mk(
        [_doc("d1-w1", ["stable page text"]),
         _doc("d2-w1", ["NEW content here"]),
         _doc("d4-w1", ["brand new page"])],
        [("d1-w1", "k1", "a.example", "ok"),
         ("d2-w1", "k2", "a.example", "ok"),
         ("d4-w1", "k4", "c.example", "ok")])
    for name, t in (("da", docs_a), ("db", docs_b),
                    ("la", log_a), ("lb", log_b)):
        _pq.write_table(t, tmp_path / f"{name}.parquet")

    res = crawl_diff(rd.from_arrow(docs_a), rd.from_arrow(log_a),
                     rd.from_arrow(docs_b), rd.from_arrow(log_b))
    odf = duckdb.sql(crawl_diff_sql(
        str(tmp_path / "da.parquet"), str(tmp_path / "la.parquet"),
        str(tmp_path / "db.parquet"), str(tmp_path / "lb.parquet"))).df()
    pd.testing.assert_frame_equal(
        res.reset_index(drop=True), odf.reset_index(drop=True),
        check_dtype=False, check_exact=True)
    got = {(r.host, r.change): r.n for r in res.itertuples()}
    assert got == {("a.example", "changed"): 1, ("a.example", "same"): 1,
                   ("b.example", "removed"): 1, ("c.example", "added"): 1}


def test_clean_chain_strip_exposes_duplicates(ray_session, tmp_path):
    """The production order (strip THEN dedup) must catch cross-host
    duplicates the raw render hides: two hosts serve the same article
    wrapped in different per-host templates — after template stripping
    the articles dedup to ONE canonical doc."""
    import pyarrow.parquet as _pq

    from visiblev8_crawler_ray.pipelines.curation import (
        crawl_to_corpus, crawl_to_corpus_clean, crawl_to_corpus_clean_sql)

    article = " ".join(f"body{i}" for i in range(40))
    rows, log = [], []
    for h, hn in (("a", "a.example"), ("b", "b.example")):
        for i in range(4):
            body = article if i == 0 else \
                " ".join(f"{h}{i}w{j}" for j in range(40))
            rows.append(_doc(f"{h}{i:02d}-w0",
                             [f"TEMPLATE OF HOST {hn}", body]))
            log.append((f"{h}{i:02d}-w0", hn))
    tbl = _docs_table(rows)
    ltbl = pa.table({"doc_id": pa.array([d for d, _ in log]),
                     "host": pa.array([h for _, h in log])})
    _pq.write_table(tbl, tmp_path / "docs.parquet")
    _pq.write_table(ltbl, tmp_path / "log.parquet")

    kw = dict(window=64, min_tokens=20, media_den=8, min_pages=3,
              num=9, den=10)
    res = crawl_to_corpus_clean(rd.from_arrow(tbl), rd.from_arrow(ltbl),
                                **kw)
    odf = duckdb.sql(crawl_to_corpus_clean_sql(
        str(tmp_path / "docs.parquet"), str(tmp_path / "log.parquet"),
        **kw)).df()
    pd.testing.assert_frame_equal(
        res.reset_index(drop=True), odf.reset_index(drop=True),
        check_dtype=False, check_exact=True)
    kept = set(res["doc_id"])
    # raw render: template makes the two article copies distinct -> the
    # raw chain keeps both; clean chain keeps only the min-id copy
    raw = crawl_to_corpus(rd.from_arrow(tbl), window=64, min_tokens=20,
                          media_den=8)
    assert {"a00-w0", "b00-w0"} <= set(raw["doc_id"])
    assert "a00-w0" in kept and "b00-w0" not in kept


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_corpus_family_random_fuzz(ray_session, tmp_path, seed):
    """Seeded random docs+log star through the WHOLE corpus family
    (detect, strip, raw pack, clean pack, diff) vs the generated SQL
    twins — random span mixes, random template sharing, random hosts,
    dangling log rows, docs absent from the log."""
    import pyarrow.parquet as _pq

    from visiblev8_crawler_ray.pipelines.curation import (
        crawl_to_corpus, crawl_to_corpus_sql, crawl_to_corpus_clean,
        crawl_to_corpus_clean_sql)
    from visiblev8_crawler_ray.stages.parse import (
        crawl_diff, crawl_diff_sql, host_boilerplate_spans,
        host_boilerplate_spans_sql, strip_boilerplate,
        strip_boilerplate_sql)

    rng = np.random.default_rng(5100 + seed)
    words = np.array(["ww%d" % i for i in range(30)])
    templates = [" ".join(words[rng.integers(0, 30, 8)])
                 for _ in range(6)]
    hosts = [f"h{i}.example" for i in range(4)]
    rows, log = [], []
    for i in range(40):
        h = hosts[rng.integers(0, len(hosts))]
        texts = [" ".join(words[rng.integers(0, 30, rng.integers(3, 30))])
                 for _ in range(rng.integers(1, 5))]
        # each doc embeds 0-2 of its host's shared templates
        for t in range(rng.integers(0, 3)):
            texts.append(templates[(int(h[1]) * 2 + t) % len(templates)])
        media = [f"blob://m{i}"] if rng.random() < 0.3 else []
        did = f"{rng.integers(0, 16):x}{i:03d}-w0"
        rows.append(_doc(did, texts, media=media))
        if rng.random() < 0.9:  # some docs never reach the log
            log.append((did, f"k{i}", h,
                        "ok" if rng.random() < 0.9 else "failed"))
    # dangling log row without a doc
    log.append(("zzzz-w0", "kz", hosts[0], "ok"))
    tbl = _docs_table(rows)
    ltbl = pa.table({"doc_id": pa.array([d for d, *_ in log]),
                     "url_key": pa.array([k for _, k, *_ in log]),
                     "host": pa.array([h for _, _, h, _ in log]),
                     "status": pa.array([s for *_, s in log])})
    _pq.write_table(tbl, tmp_path / "docs.parquet")
    _pq.write_table(ltbl, tmp_path / "log.parquet")
    dp, lp = str(tmp_path / "docs.parquet"), str(tmp_path / "log.parquet")
    docs, lg = rd.from_arrow(tbl), rd.from_arrow(ltbl)

    def cmp(res, sql, name):
        odf = duckdb.sql(sql).df()
        a = _norm(res)
        b = _norm(odf)
        assert list(a.columns) == list(b.columns), name
        assert len(a) == len(b), (name, len(a), len(b))
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=True, obj=name)

    def _norm(df):
        df = pd.DataFrame(df)
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    kw = dict(min_pages=2, num=1, den=2)
    cmp(host_boilerplate_spans(docs, lg, **kw),
        host_boilerplate_spans_sql(dp, lp, **kw), "detect")
    cmp(strip_boilerplate(docs, lg, **kw),
        strip_boilerplate_sql(dp, lp, **kw), "strip")
    cmp(crawl_to_corpus(docs, window=32, min_tokens=5, media_den=5),
        crawl_to_corpus_sql(dp, window=32, min_tokens=5, media_den=5),
        "pack")
    ckw = dict(window=32, min_tokens=5, media_den=5, min_pages=2,
               num=1, den=2)
    cmp(crawl_to_corpus_clean(docs, lg, **ckw),
        crawl_to_corpus_clean_sql(dp, lp, **ckw), "clean-pack")
    # diff this corpus against a mutated copy of itself
    rows_b = [dict(r) for r in rows[5:]]           # 5 removed
    for r in rows_b[:4]:                           # 4 changed
        r["spans"] = r["spans"] + [{"kind": "script",
                                    "text": "mutation span",
                                    "media_ref": "",
                                    "offset": len(r["spans"])}]
    rows_b.append(_doc("added-w1", ["fresh page content"]))
    tbl_b = _docs_table(rows_b)
    keep_ids = {r["doc_id"] for r in rows_b}
    lb_rows = [(d, k, h, s) for d, k, h, s in log if d in keep_ids]
    lb_rows.append(("added-w1", "knew", hosts[1], "ok"))
    ltbl_b = pa.table({"doc_id": pa.array([d for d, *_ in lb_rows]),
                       "url_key": pa.array([k for _, k, *_ in lb_rows]),
                       "host": pa.array([h for _, _, h, _ in lb_rows]),
                       "status": pa.array([s for *_, s in lb_rows])})
    _pq.write_table(tbl_b, tmp_path / "docs_b.parquet")
    _pq.write_table(ltbl_b, tmp_path / "log_b.parquet")
    cmp(crawl_diff(docs, lg, rd.from_arrow(tbl_b),
                   rd.from_arrow(ltbl_b)),
        crawl_diff_sql(dp, lp, str(tmp_path / "docs_b.parquet"),
                       str(tmp_path / "log_b.parquet")), "diff")


def test_incremental_corpus_continuation(ray_session, tmp_path):
    """The incremental manifest continues run A's token stream: its
    first start_offset equals A's packed total, and building one corpus
    from (A's docs + the delta docs) reproduces the same offsets."""
    import pyarrow.parquet as _pq

    from visiblev8_crawler_ray.pipelines.curation import (
        crawl_to_corpus, incremental_corpus, incremental_corpus_sql)

    words = ["tok%d" % i for i in range(20)]

    def body(seed, n=40):
        rng = np.random.default_rng(seed)
        return " ".join(np.array(words)[rng.integers(0, 20, n)])

    rows_a, log_a = [], []
    for i in range(6):
        rows_a.append(_doc(f"a{i:02d}-w0", [body(i), body(100 + i)]))
        log_a.append((f"a{i:02d}-w0", f"k{i}", "h.example", "ok"))
    # B: first 4 urls unchanged, k4 changed, k5 dropped, k9 added
    rows_b, log_b = [], []
    for i in range(4):
        rows_b.append({"doc_id": f"b{i:02d}-w0",
                       "spans": rows_a[i]["spans"]})
        log_b.append((f"b{i:02d}-w0", f"k{i}", "h.example", "ok"))
    rows_b.append(_doc("b04-w0", [body(4), body(100 + 4),
                                  "EDIT " + body(777)]))
    log_b.append(("b04-w0", "k4", "h.example", "ok"))
    rows_b.append(_doc("b09-w0", [body(9), body(109)]))
    log_b.append(("b09-w0", "k9", "h.example", "ok"))

    def mk(rows, log, tag):
        t = _docs_table(rows)
        lt = pa.table({
            "doc_id": pa.array([r[0] for r in log]),
            "url_key": pa.array([r[1] for r in log]),
            "host": pa.array([r[2] for r in log]),
            "status": pa.array([r[3] for r in log]),
        })
        _pq.write_table(t, tmp_path / f"docs_{tag}.parquet")
        _pq.write_table(lt, tmp_path / f"log_{tag}.parquet")
        return t, lt

    ta, la = mk(rows_a, log_a, "a")
    tb, lb = mk(rows_b, log_b, "b")
    kw = dict(window=64, min_tokens=10, media_den=8)
    inc = incremental_corpus(rd.from_arrow(ta), rd.from_arrow(la),
                             rd.from_arrow(tb), rd.from_arrow(lb), **kw)
    odf = duckdb.sql(incremental_corpus_sql(
        str(tmp_path / "docs_a.parquet"), str(tmp_path / "log_a.parquet"),
        str(tmp_path / "docs_b.parquet"), str(tmp_path / "log_b.parquet"),
        **kw)).df()
    pd.testing.assert_frame_equal(
        inc.reset_index(drop=True), odf.reset_index(drop=True),
        check_dtype=False, check_exact=True)
    # delta = changed k4 + added k9 only
    assert set(inc["doc_id"]) == {"b04-w0", "b09-w0"}
    base = crawl_to_corpus(rd.from_arrow(ta), **kw)
    assert int(inc["start_offset"].min()) == int(base["n_tokens"].sum())
