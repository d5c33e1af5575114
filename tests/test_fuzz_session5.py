"""Seeded fuzz: this session's SQL-gated operators vs their DuckDB
twins over RANDOMIZED corpora (empty docs, whitespace-only, glued
punctuation, digits, unicode, tabs/newlines, duplicate texts) — the
curated sf fixtures never exercise several of these shapes."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as R  # noqa: E402

SF_DOCS = "/root/testdata/sf0.001"
from visiblev8_crawler_ray.pipelines import textops as T  # noqa: E402

WORDS = ["the", "a", "of", "to", "and", "spark", "data", "row", "12",
         "9001", "x", "zz", "café", "a.b,c", "!!!", "loooooooooong",
         "Mixed", "UPPER", "semi;colon", "bob@example.com", "10.0.0.1",
         "555-123-4567", "not.an@email", "999.999.999.999"]


def _random_corpus(rng, n_docs):
    texts = []
    for d in range(n_docs):
        kind = int(rng.integers(0, 10))
        if kind == 0:
            texts.append("")
        elif kind == 1:
            texts.append(" \t\n  ")
        elif kind == 2 and texts:
            texts.append(texts[int(rng.integers(0, len(texts)))])  # dup
        else:
            n = int(rng.integers(1, 40))
            ws = [WORDS[int(i)] for i in rng.integers(0, len(WORDS), n)]
            sep = [" ", "  ", "\t", "\n"][int(rng.integers(0, 4))]
            texts.append(sep.join(ws))
    langs = ["en", "es", "de", "fr", "zh", "und"]
    return pa.table({
        "doc_id": pa.array(range(n_docs), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array([langs[d % len(langs)] for d in range(n_docs)]),
        "source": pa.array([f"src{d % 5}" for d in range(n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })


def _con(sf):
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * "
          f"FROM '{sf}/documents.parquet'")
    return c


def _norm(df):
    df = pd.DataFrame(df)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _documents_only_ops() -> list[str]:
    """Every SQL-gated query whose oracle touches ONLY the documents
    table — all of them must hold on ANY corpus, so the whole set runs
    under the randomized fuzz, not just the curated fixture."""
    other = ["region", "nation", "customer", "supplier", " orders",
             "lineitem", " events", "embeddings", "read_parquet", "seeds"]
    out = []
    for name, q in R.oracle_sql().items():
        ql = q.lower()
        if "documents" in ql and not any(t in ql for t in other):
            out.append(name)
    return sorted(out)


OPS = _documents_only_ops()


def test_fuzz_covers_the_session_ops():
    for name in ["gopher_filter", "bpe_pair_counts", "sample_weighted",
                 "unigram_logprob", "mix_temperature", "normalize_text",
                 "corpus_novelty", "pii_scan", "hashed_tf",
                 "source_quality_report", "export_corpus"]:
        assert name in OPS, name
    assert len(OPS) >= 50


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_session5_ops_fuzz_vs_duckdb(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    docs = _random_corpus(rng, 60)
    pq.write_table(docs, tmp_path / "documents.parquet")
    con = _con(tmp_path)
    q = R.queries()
    sql = R.oracle_sql()
    for name in OPS:
        res = q[name](str(tmp_path))
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        odf = con.sql(sql[name]).df()
        a, b = _norm(df), _norm(odf)
        assert list(a.columns) == list(b.columns), name
        assert len(a) == len(b), (name, len(a), len(b))
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=True, obj=name)


@pytest.mark.parametrize("seed", [0, 1])
def test_embedding_covariance_fuzz(ray_session, tmp_path, seed):
    rng = np.random.default_rng(100 + seed)
    n, dim = 50, 64
    mat = rng.normal(0, 1, (n, dim)).round(4)
    t = pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array(mat.tolist(),
                              type=pa.list_(pa.float32(), dim)),
        "label": pa.array((np.arange(n) % 3).astype(np.int64)),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * "
            f"FROM '{tmp_path}/embeddings.parquet'")
    res = R.queries()["embedding_covariance"](str(tmp_path))
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    odf = con.sql(R.oracle_sql()["embedding_covariance"]).df()
    pd.testing.assert_frame_equal(_norm(df), _norm(odf),
                                  check_dtype=False, check_exact=True)


def test_blob_audit_detects_missing_and_orphans(ray_session, tmp_path):
    """Clean store audits clean; deleting a blob -> refs_missing=1;
    planting a stray file -> files_orphaned=1."""
    import os
    import numpy as np
    import ray.data as rd
    from visiblev8_crawler_ray import synth
    from visiblev8_crawler_ray.config import CrawlConfig
    from visiblev8_crawler_ray.pipelines.crawl import run_crawl
    from visiblev8_crawler_ray.pipelines.multimodal import blob_audit

    cfg = CrawlConfig(max_depth=1, max_waves=2, max_per_host_per_wave=10)
    seeds = synth.seeds_table(np.arange(12), cfg)
    store = str(tmp_path / "store")
    run = run_crawl(seeds, cfg, store, blob_artifacts=True)
    blob_dir = os.path.join(store, "blobs")

    clean = blob_audit(run.docs(), blob_dir).iloc[0]
    assert clean["refs_missing"] == 0 and clean["files_orphaned"] == 0
    assert clean["refs_resolved"] == clean["refs_distinct"] > 0
    assert clean["files_total"] == clean["refs_distinct"]
    assert clean["bytes_total"] > 0

    # delete one blob, plant one stray
    victim = None
    for root, _, names in os.walk(blob_dir):
        for n in names:
            victim = os.path.join(root, n)
            break
        if victim:
            break
    os.remove(victim)
    with open(os.path.join(blob_dir, "stray.bin"), "wb") as f:
        f.write(b"zz")
    dirty = blob_audit(run.docs(), blob_dir).iloc[0]
    assert dirty["refs_missing"] == 1
    assert dirty["files_orphaned"] == 1


def test_degenerate_corpora_do_not_crash(ray_session, tmp_path):
    """Review regressions: empty-incoming novelty, all-empty-doc
    unigram/mix_temperature — graceful typed empties / zero allocs."""
    from visiblev8_crawler_ray.pipelines.textops import (
        corpus_novelty, mix_temperature, unigram_logprob)

    even_only = pa.table({
        "doc_id": pa.array([0, 2, 4], type=pa.int64()),
        "text": pa.array(["a", "b", "c"]),
        "source": pa.array(["s0", "s0", "s0"]),
    })
    d1 = tmp_path / "even"
    d1.mkdir()
    pq.write_table(even_only, d1 / "documents.parquet")
    nov = corpus_novelty(str(d1))
    assert list(nov.columns) == ["doc_id", "novel"] and len(nov) == 0

    empty_docs = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["", " \t\n"]),
        "source": pa.array(["s0", "s1"]),
    })
    d2 = tmp_path / "empty"
    d2.mkdir()
    pq.write_table(empty_docs, d2 / "documents.parquet")
    lp = unigram_logprob(str(d2))
    assert lp["n_tokens"].tolist() == [0, 0]
    assert lp["avg_logprob"].tolist() == [0.0, 0.0]
    mt = mix_temperature(str(d2), budget=7)
    assert mt["alloc"].tolist() == [0, 0]
    assert mt["share"].tolist() == [0.0, 0.0]


def test_pii_scan_counts_and_redaction(ray_session, tmp_path):
    """Hand-checked typed counts and ordered anonymization."""
    from visiblev8_crawler_ray.pipelines.textops import pii_scan

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array([
            "mail bob@example.com ip 8.8.8.8 tel 555-123-4567 end",
            "no pii",
            "two mails a@b.io c@d.org",
        ]),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    df = pii_scan(str(tmp_path)).to_pandas().set_index("doc_id")
    assert df.loc[0, ["n_email", "n_ipv4", "n_phone"]].tolist() == [1, 1, 1]
    assert "[EMAIL]" in df.loc[0, "clean_text"]
    assert "[IPV4]" in df.loc[0, "clean_text"]
    assert "[PHONE]" in df.loc[0, "clean_text"]
    assert "bob@example.com" not in df.loc[0, "clean_text"]
    assert df.loc[1, "clean_text"] == "no pii"
    assert df.loc[2, "n_email"] == 2


def test_hashed_tf_mass_conservation(ray_session):
    """Sum of tf over buckets equals the corpus token totals per doc."""
    from visiblev8_crawler_ray.pipelines.textops import (hashed_tf,
                                                         token_counts)

    tf = hashed_tf(SF_DOCS)
    toks = token_counts(SF_DOCS)
    toks = toks.to_pandas() if hasattr(toks, "to_pandas") else toks
    got = tf.groupby("doc_id")["tf"].sum()
    want = toks.set_index("doc_id")["n_ws_tokens"]
    pd.testing.assert_series_equal(got, want[got.index],
                                   check_names=False)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_api_kgrams_fuzz_vs_naive(ray_session, seed):
    """Trigram counts over random span docs (incl. docs shorter than k)
    match a per-doc naive reference; doc boundaries never bleed."""
    import collections
    import ray.data as rd
    from tests.test_fuzz_new_ops import _random_docs
    from visiblev8_crawler_ray.stages.parse import api_kgrams

    rng = np.random.default_rng(seed)
    docs = _random_docs(rng, 50)
    got = api_kgrams(rd.from_arrow(docs), top=1000)
    want = collections.Counter()
    for spans in docs["spans"].to_pylist():
        kinds = [s["kind"] for s in spans]
        for i in range(len(kinds) - 2):
            want[">".join(kinds[i:i + 3])] += 1
    got_d = dict(zip(got["kgram"], got["n"]))
    assert got_d == dict(want)


def test_api_kgrams_empty_corpus(ray_session):
    """Docs shorter than k everywhere -> typed empty frame (the empty
    branch had a latent missing-import crash before the module-level
    pandas import)."""
    import ray.data as rd
    from visiblev8_crawler_ray.stages.parse import api_kgrams

    SPAN_T = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()), ("offset", pa.int32())])
    docs = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "spans": pa.array([
            [{"kind": "get", "text": "t", "media_ref": "", "offset": 0}],
            [],
        ], type=pa.list_(SPAN_T)),
    })
    out = api_kgrams(rd.from_arrow(docs))
    assert list(out.columns) == ["kgram", "n"] and len(out) == 0


def test_har_entries_fuzz_vs_duckdb(ray_session, tmp_path):
    """Randomized HAR payloads (entry counts 0-12, arbitrary status /
    mime / host / size draws, unicode-ish urls) -> har_entries must
    match an independent DuckDB re-parse of the same bytes, and the
    as_dataset seam must stream the identical rows."""
    import json
    import os

    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from visiblev8_crawler_ray.pipelines.multimodal import har_entries

    rng = np.random.default_rng(5107)
    mimes = ["text/html", "text/css", "text/plain",
             "application/javascript", "image/png", "image/jpeg",
             "application/json", "font/woff2"]
    statuses = [200, 200, 200, 204, 301, 404, 500]
    blob_dir = str(tmp_path / "blobs")
    n_docs = 30
    for d in range(n_docs):
        n = int(rng.integers(0, 13))
        entries = []
        for i in range(n):
            host = f"h{int(rng.integers(0, 5))}.example"
            entries.append({
                "request": {"url": f"https://{host}/p/{i}?q=a%20b",
                            "method": "GET"},
                "response": {
                    "status": int(rng.choice(statuses)),
                    "content": {
                        "mimeType": str(rng.choice(mimes)),
                        "size": int(rng.integers(0, 100_000))}},
            })
        p = os.path.join(blob_dir, f"d{d}", "har.json")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(json.dumps(
                {"log": {"doc": f"d{d}", "entries": entries}}).encode())

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()),
                        ("offset", pa.int32())])
    docs = pa.table({
        "doc_id": pa.array([f"d{d}" for d in range(n_docs)]),
        "spans": pa.array([[{"kind": "media/har", "text": "",
                             "media_ref": f"blob://d{d}/har.json",
                             "offset": 0}] for d in range(n_docs)],
                          type=pa.list_(span_t)),
    })
    ds = rd.from_arrow(docs)
    got = har_entries(ds, blob_dir)
    streamed = (har_entries(ds, blob_dir, as_dataset=True).to_pandas()
                .sort_values("media_ref").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, streamed, check_dtype=False)

    con = duckdb.connect()
    want = con.sql(f"""
        WITH raw AS (SELECT substr(filename, {len(blob_dir) + 2}) AS rel,
                            CAST(decode(content) AS VARCHAR) AS j
                     FROM read_blob('{blob_dir}/**/har.json')),
        m AS (SELECT 'blob://' || rel AS media_ref, j,
                     CAST(json_array_length(j, '$.log.entries')
                          AS BIGINT) AS cnt FROM raw),
        ix AS (SELECT media_ref, j,
                      unnest(generate_series(0, cnt - 1)) AS i FROM m),
        x AS (SELECT media_ref,
                     json_extract_string(j, '$.log.entries[' || i
                         || '].request.url') AS url,
                     CAST(json_extract(j, '$.log.entries[' || i
                         || '].response.status') AS BIGINT) AS status,
                     json_extract_string(j, '$.log.entries[' || i
                         || '].response.content.mimeType') AS mime,
                     CAST(json_extract(j, '$.log.entries[' || i
                         || '].response.content.size') AS BIGINT) AS sz
              FROM ix),
        agg AS (SELECT media_ref,
                   CAST(count(*) AS BIGINT) AS n_requests,
                   CAST(count(DISTINCT regexp_extract(url,
                        '^https://([^/]+)', 1)) AS BIGINT) AS n_hosts,
                   CAST(sum(CASE WHEN status = 200 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_ok,
                   CAST(sum(sz) AS BIGINT) AS bytes_total,
                   CAST(sum(CASE WHEN mime LIKE 'text/%' THEN sz
                            ELSE 0 END) AS BIGINT) AS bytes_text,
                   CAST(sum(CASE WHEN mime = 'application/javascript'
                            THEN sz ELSE 0 END) AS BIGINT)
                       AS bytes_script,
                   CAST(sum(CASE WHEN mime LIKE 'image/%' THEN sz
                            ELSE 0 END) AS BIGINT) AS bytes_image
            FROM x GROUP BY media_ref)
        SELECT m.media_ref,
               coalesce(a.n_requests, 0) AS n_requests,
               coalesce(a.n_hosts, 0) AS n_hosts,
               coalesce(a.n_ok, 0) AS n_ok,
               coalesce(a.bytes_total, 0) AS bytes_total,
               coalesce(a.bytes_text, 0) AS bytes_text,
               coalesce(a.bytes_script, 0) AS bytes_script,
               coalesce(a.bytes_image, 0) AS bytes_image
        FROM m LEFT JOIN agg a USING (media_ref)
        ORDER BY media_ref""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_har_third_party_constructed(ray_session, tmp_path):
    """har_third_party over handcrafted HARs: all-first-party,
    all-third-party, mixed, and empty pages — exact counts and the
    4-decimal share convention."""
    import json
    import os

    import pyarrow as pa
    import ray.data as rd

    from visiblev8_crawler_ray.pipelines.multimodal import har_third_party

    def entry(host, size):
        return {"request": {"url": f"https://{host}/r", "method": "GET"},
                "response": {"status": 200,
                             "content": {"mimeType": "text/html",
                                         "size": size}}}

    blob_dir = str(tmp_path / "blobs")
    blobs = {
        "a/har.json": [entry("origin.example", 10)] * 3,
        "b/har.json": [entry("cdn1.example", 7),
                       entry("cdn2.example", 9)],
        "c/har.json": [entry("origin.example", 5),
                       entry("cdn1.example", 11),
                       entry("cdn1.example", 13)],
        "d/har.json": [],
    }
    for rel, entries in blobs.items():
        p = os.path.join(blob_dir, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(json.dumps(
                {"log": {"entries": entries}}).encode())
    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()),
                        ("offset", pa.int32())])
    docs = pa.table({
        "doc_id": pa.array(list("abcd")),
        "spans": pa.array([[{"kind": "media/har", "text": "",
                             "media_ref": f"blob://{d}/har.json",
                             "offset": 0}] for d in "abcd"],
                          type=pa.list_(span_t)),
    })
    out = har_third_party(rd.from_arrow(docs), blob_dir) \
        .set_index("media_ref")
    assert out.loc["blob://a/har.json"].tolist() == [3, 0, 0, 0.0]
    assert out.loc["blob://b/har.json"].tolist() == [2, 2, 16, 1.0]
    assert out.loc["blob://c/har.json"].tolist() == [3, 2, 24, 0.6667]
    assert out.loc["blob://d/har.json"].tolist() == [0, 0, 0, 0.0]
