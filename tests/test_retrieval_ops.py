"""Seeded fuzz: the retrieval/corpus-stats operators (inverted index,
BM25, PMI, prefix mirrors, grouped z-score) vs naive single-process
references over randomized corpora — catches batch-split and shape
assumptions the oracle fixtures may miss."""

import itertools
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")
from visiblev8_crawler_ray.pipelines import analytics as A  # noqa: E402
from visiblev8_crawler_ray.pipelines import textops as T  # noqa: E402

VOCAB = ["table", "scan", "merge", "vector", "row", "key", "agg", "fast",
         "slow", "part"]


def _write_docs(rng, tmp_path, n_docs=60):
    texts = []
    for d in range(n_docs):
        n = int(rng.integers(1, 40))
        texts.append(" ".join(VOCAB[i] for i in rng.integers(0, len(VOCAB), n)))
    # a couple of shared-prefix mirror docs
    if n_docs >= 6:
        texts[3] = texts[1]
        texts[5] = texts[1] + " extraword"
    t = pa.table({
        "doc_id": pa.array(range(n_docs), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * n_docs),
        "source": pa.array(["s0"] * n_docs),
        "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
    })
    # small row groups force multiple Ray blocks (batch-split coverage)
    pq.write_table(t, str(tmp_path / "documents.parquet"), row_group_size=16)
    return texts


@pytest.mark.parametrize("seed", [0, 1])
def test_inverted_index_fuzz(seed, tmp_path):
    rng = np.random.default_rng(seed)
    texts = _write_docs(rng, tmp_path)
    got = T.inverted_index(str(tmp_path))

    post = {}
    for d, s in enumerate(texts):
        for tok in set(s.split()):
            post.setdefault(tok, []).append(d)
    exp = pd.DataFrame({
        "token": sorted(post),
        "df": [len(post[t]) for t in sorted(post)],
        "postings": [",".join(map(str, sorted(post[t])[:8]))
                     for t in sorted(post)],
    })
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.parametrize("seed", [0, 1])
def test_bm25_fuzz(seed, tmp_path):
    rng = np.random.default_rng(seed)
    texts = _write_docs(rng, tmp_path)
    got = T.bm25_topk(str(tmp_path))

    k1, b = 1.5, 0.75
    terms = list(T.BM25_QUERY)
    toks = [s.split() for s in texts]
    N = len(toks)
    avgdl = sum(len(t) for t in toks) * 1.0 / N
    dfs = [sum(1 for t in toks if term in t) for term in terms]
    rows = []
    for d, t in enumerate(toks):
        s, any_tf = 0.0, 0
        for i, term in enumerate(terms):
            tf = t.count(term)
            any_tf += tf
            idf = np.log((N - dfs[i] + 0.5) / (dfs[i] + 0.5) + 1.0)
            s = s + idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(t) / avgdl))
        if any_tf:
            rows.append((d, s))
    rows.sort(key=lambda r: (-r[1], r[0]))
    exp_ids = [r[0] for r in rows[:10]]
    assert list(got["doc_id"]) == exp_ids
    np.testing.assert_allclose(
        got["score"].to_numpy(), [round(r[1], 4) for r in rows[:10]],
        atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_pmi_fuzz(seed, tmp_path):
    rng = np.random.default_rng(seed)
    texts = _write_docs(rng, tmp_path)
    got = T.pmi_cooccurrence(str(tmp_path))

    from collections import Counter
    uni, pair = Counter(), Counter()
    for s in texts:
        d = sorted(set(s.split()))
        uni.update(d)
        pair.update(itertools.combinations(d, 2))
    N = len(texts)
    exp = pd.DataFrame(
        [(a, bt, c, round(float(np.log(N * 1.0 * c / (uni[a] * 1.0 * uni[bt]))), 4))
         for (a, bt), c in sorted(pair.items())],
        columns=["token_a", "token_b", "c_ab", "pmi"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_prefix_pairs_fuzz(seed, tmp_path):
    rng = np.random.default_rng(seed)
    texts = _write_docs(rng, tmp_path)
    got = T.prefix_dup_pairs(str(tmp_path))

    pre = {}
    for d, s in enumerate(texts):
        w = s.split()
        if len(w) >= 5:
            pre.setdefault(" ".join(w[:5]), []).append(d)
    exp = sorted((a, bt, k) for k, ids in pre.items()
                 for a, bt in itertools.combinations(sorted(ids), 2))
    assert [tuple(r) for r in got[["doc_a", "doc_b", "prefix"]].values] == exp


@pytest.mark.parametrize("seed", [0, 1])
def test_group_zscore_fuzz(seed, tmp_path):
    rng = np.random.default_rng(seed)
    n = 500
    t = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "ts": pa.array([0] * n, type=pa.int64()),
        "user_id": pa.array(rng.integers(0, 20, n), type=pa.int64()),
        "event_type": pa.array([f"e{i}" for i in rng.integers(0, 4, n)]),
        "value": pa.array(rng.uniform(-10, 1000, n), type=pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"), row_group_size=64)
    got = A.events_group_zscore(str(tmp_path))

    df = t.to_pandas()
    cents = np.sign(df.value * 100.0) * np.floor(np.abs(df.value * 100.0) + 0.5)
    df["cents"] = cents.astype(np.int64)
    g = df.groupby("event_type")["cents"]
    mean = df.event_type.map(g.sum()).astype(float) / df.event_type.map(g.size())
    ex2 = df.event_type.map((g.apply(lambda s: (s.astype(object) ** 2).sum()))
                            ).astype(float) / df.event_type.map(g.size())
    var = ex2 - mean * mean
    z = np.where(var > 0,
                 (df.cents - mean) / np.sqrt(np.where(var > 0, var, 1.0)), 0.0)
    np.testing.assert_allclose(got["z"].to_numpy(),
                               np.round(z, 4), atol=2e-4)
    assert list(got["event_id"]) == list(range(n))


def _naive_cdc(texts, w=16, avg=64):
    import hashlib
    B, M = 257, (1 << 31) - 1
    rows = []
    for d, s in enumerate(texts):
        raw = s.encode()
        cuts = [0]
        for i in range(len(raw) - w + 1):
            h = 0
            for j in range(w):
                h = (h + raw[i + j] * pow(B, w - 1 - j, M)) % M
            if h % avg == 0 and i + w < len(raw):
                cuts.append(i + w)
        cuts.append(len(raw))
        cuts = sorted(set(cuts))
        for ix, (a, b) in enumerate(zip(cuts[:-1], cuts[1:])):
            rows.append((d, ix, b - a,
                         hashlib.md5(raw[a:b].hex().encode()).hexdigest()))
    return rows


@pytest.mark.parametrize("seed", [0, 1])
def test_cdc_chunks_fuzz(seed, tmp_path):
    rng = np.random.default_rng(seed)
    texts = _write_docs(rng, tmp_path, n_docs=30)
    got = T.cdc_chunks(str(tmp_path))
    exp = _naive_cdc(texts)
    assert [tuple(r) for r in
            got[["doc_id", "chunk_ix", "length", "chunk_hash"]].values] == exp


def test_cdc_shift_resistance(tmp_path):
    """Inserting a prefix re-chunks only the head: the tail chunk-hash
    stream re-synchronizes — the property that makes CDC a dedup
    primitive (fixed-size chunking loses ALL alignment)."""
    rng = np.random.default_rng(7)
    body = " ".join(VOCAB[i] for i in rng.integers(0, len(VOCAB), 400))
    texts = [body, "inserted prefix words " + body]
    t = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en", "en"]),
        "source": pa.array(["s0", "s0"]),
        "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = T.cdc_chunks(str(tmp_path))
    h0 = list(got[got.doc_id == 0]["chunk_hash"])
    h1 = list(got[got.doc_id == 1]["chunk_hash"])
    shared = set(h0) & set(h1)
    # all but the first boundary-spanning chunks of each doc re-align
    assert len(shared) >= len(h0) - 2, (len(shared), len(h0), len(h1))


def test_cdc_empty_and_short_docs(tmp_path):
    texts = ["", "ab", "x" * 15, "word " * 100]
    t = pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["s0"] * 4),
        "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = T.cdc_chunks(str(tmp_path))
    exp = _naive_cdc(texts)
    assert [tuple(r) for r in
            got[["doc_id", "chunk_ix", "length", "chunk_hash"]].values] == exp
    assert 0 not in set(got["doc_id"])          # empty doc emits nothing


def test_irregular_whitespace_matches_oracle(tmp_path):
    """Tabs/newlines/double spaces: engine tokenization must stay
    byte-identical to the oracles' regexp_extract_all('\\S+') (caught
    a real divergence: pc.split_pattern(' ') emits empty tokens)."""
    import duckdb
    import __ray_entry__ as R

    texts = ["a  b\t c", "  x y  ", "table scan\nmerge", "table  scan table"]
    t = pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["s0"] * 4),
        "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet'")

    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for name in ["inverted_index", "bm25_topk", "pmi_cooccurrence",
                 "prefix_dup_pairs", "token_rarity"]:
        df = pd.DataFrame(R.queries()[name](str(tmp_path)))
        odf = con.sql(R.oracle_sql()[name]).df()
        pd.testing.assert_frame_equal(norm(df), norm(odf),
                                      check_dtype=False, check_exact=True)
