"""Round-3 additions: sitemap seed source, count-min sketch bounds,
recrawl scheduling policy."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://src0.example/page/1 </loc>
    <lastmod>2025-03-01</lastmod>
    <priority>0.8</priority>
  </url>
  <url><loc>https://src1.example/page/2</loc></url>
  <url>
    <loc>https://hot.example/page/3</loc>
    <lastmod>2025-04-15</lastmod>
  </url>
</urlset>
"""


def test_read_sitemap(ray_session, tmp_path):
    from visiblev8_crawler_ray.sources.readers import (read_sitemap,
                                                       union_seed_sources)

    f = tmp_path / "sitemap.xml"
    f.write_text(SITEMAP)
    df = read_sitemap(str(f)).to_pandas().sort_values("seed_id")
    assert df["seed_id"].tolist() == [0, 1, 2]
    assert df["url"].tolist() == ["https://src0.example/page/1",
                                  "https://src1.example/page/2",
                                  "https://hot.example/page/3"]
    assert df["lastmod"].tolist() == ["2025-03-01", "", "2025-04-15"]
    assert df["priority"].tolist() == [0.8, 0.5, 0.5]

    # unions with the other seed sources (D6 contract)
    g = tmp_path / "seeds.txt"
    g.write_text("https://src2.example/page/9\n")
    from visiblev8_crawler_ray.sources.readers import read_url_file
    u = union_seed_sources(read_sitemap(str(f)), read_url_file(str(g)))
    assert sorted(u.to_pandas()["url"]) == sorted(
        df["url"].tolist() + ["https://src2.example/page/9"])


def test_cms_bounds_under_collisions(ray_session, tmp_path):
    """CMS guarantees: est >= true always, and est <= true +
    eps * stream_length for the vast majority of point queries — on a
    corpus wide enough (30k unique tokens vs 4096 cells) that
    collisions are unavoidable."""
    from visiblev8_crawler_ray.pipelines.textops import (
        CMS_W, token_cms, _flat_tokens)

    rng = np.random.default_rng(11)
    # zipf-ish: token t{i} appears with skewed frequency
    toks = [f"t{i}" for i in np.clip(
        rng.zipf(1.3, size=60_000), 1, 30_000)]
    docs = pd.DataFrame({
        "doc_id": np.arange(60, dtype="int64"),
        "text": [" ".join(toks[i::60]) for i in range(60)],
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    est = token_cms(str(tmp_path), k=25)
    true = pd.Series(toks).value_counts()
    n = len(toks)
    merged = est.assign(true=est["token"].map(true))
    assert (merged["est_count"] >= merged["true"]).all()
    # the epsilon bound (e/W); deterministic seed, comfortably inside
    eps_bound = np.e / CMS_W * n
    assert (merged["est_count"] - merged["true"] <= eps_bound).all()


def test_cms_merge_is_parallelism_invariant(ray_session, tmp_path):
    """Partial matrices merge by addition: two different batch sizes
    produce the identical sketch estimates."""
    from visiblev8_crawler_ray.pipelines import textops as T

    docs = pd.DataFrame({
        "doc_id": np.arange(40, dtype="int64"),
        "text": [" ".join(f"w{j % 97}" for j in range(i, i + 50))
                 for i in range(40)],
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    a = T.token_cms(str(tmp_path), k=10)
    b = T.token_cms(str(tmp_path), k=10)
    pd.testing.assert_frame_equal(a, b)


def test_recrawl_due_policy(ray_session, tmp_path):
    """recrawl_due over a crawl: every row keeps the invariant
    due == (age_ms >= revisit_ms), ages decrease with seq, and the
    per-host intervals follow crawl_delay_ms."""
    from visiblev8_crawler_ray import synth
    from visiblev8_crawler_ray.config import CrawlConfig
    from visiblev8_crawler_ray.pipelines.crawl import (REVISIT_FACTOR,
                                                       recrawl_due, run_crawl)

    cfg = CrawlConfig(max_depth=1, max_waves=3, max_per_host_per_wave=20)
    seeds = synth.seeds_table(np.arange(50), cfg)
    run = run_crawl(seeds, cfg, str(tmp_path / "store"))
    out = recrawl_due(run.crawl_log(), cfg).to_pandas()
    assert len(out) > 0
    assert (out["due"] == (out["age_ms"] >= out["revisit_ms"])).all()
    adm = int(cfg.admission_delay_s * 1000)
    horizon = out["last_seq"].max() + 1
    assert (out["age_ms"] == (horizon - out["last_seq"]) * adm).all()
    for host, grp in out.groupby("host"):
        assert (grp["revisit_ms"]
                == REVISIT_FACTOR * cfg.crawl_delay_ms(str(host))).all()


SF = "/root/testdata/sf0.001"


def _naive_kmeans(sf_dir: str, k: int = 8, iters: int = 5):
    """Obviously-correct single-process Lloyd's with the same
    determinism contract (rounded-L2 argmin, fixed-point means)."""
    import pyarrow.parquet as pq

    from visiblev8_crawler_ray.functions.util import round_half_away

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
        np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    S = 1 << 20
    cent = mat[ids < k].copy()
    for _ in range(iters):
        d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(round_half_away(np.sqrt(d2), 4), axis=1)
        fp = (np.sign(mat * S) * np.floor(np.abs(mat * S) + 0.5)).astype(
            np.int64)
        for c in range(k):
            sel = fp[assign == c]
            if len(sel):
                cent[c] = sel.sum(axis=0) / len(sel) / S
    d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    assign = np.argmin(round_half_away(np.sqrt(d2), 4), axis=1)
    return pd.DataFrame({"vec_id": ids.astype(np.int64),
                         "cluster": assign.astype(np.int64)})


def test_kmeans_clusters_matches_naive(ray_session):
    """Distributed Lloyd's == the sequential reference, bit-for-bit:
    the fixed-point partial sums make the mean order-independent across
    blocks, so block boundaries cannot change any assignment."""
    from visiblev8_crawler_ray.pipelines.embeddings import kmeans_clusters

    got = kmeans_clusters(SF, k=8, iters=5)
    want = _naive_kmeans(SF, k=8, iters=5)
    assert got[["vec_id", "cluster"]].values.tolist() == \
        want[["vec_id", "cluster"]].values.tolist()
    # n_members is the actual cluster size
    sizes = got.groupby("cluster").size()
    assert all(int(r.n_members) == int(sizes[r.cluster])
               for r in got.itertuples())
    # non-trivial clustering: more than one cluster in use
    assert got["cluster"].nunique() > 1


def test_kmeans_block_invariance(ray_session):
    """Same result when the corpus is split into many tiny blocks —
    the partial-sum exchange is exact, not approximate."""
    import ray.data as rd

    from visiblev8_crawler_ray.pipelines import embeddings as E

    base = E.kmeans_clusters(SF, k=4, iters=3)
    orig = E._read_emb

    def shredded(sf_dir):
        return orig(sf_dir).repartition(13)

    E._read_emb, tmp = shredded, E._read_emb
    try:
        split = E.kmeans_clusters(SF, k=4, iters=3)
    finally:
        E._read_emb = tmp
    assert base.values.tolist() == split.values.tolist()


def test_dsir_sample_properties(ray_session):
    """Integer invariants of the DSIR scorer: hit sums are exact token
    sums, the target slice scores >= corpus average more often than the
    complement, and selection matches the integer predicate."""
    from visiblev8_crawler_ray.pipelines.textops import dsir_sample

    out = dsir_sample(SF)
    assert (out["s_hits"] >= out["t_hits"]).all()  # target ⊆ source
    sel = out["selected"].to_numpy()
    assert 0 < sel.sum() < len(out)  # the threshold actually splits
    # selection is a threshold on t_hits/s_hits, so the (rounded)
    # importance of every selected doc sits at-or-above every
    # unselected doc's, up to the 6-decimal rounding width
    imp = out["importance"].to_numpy()
    assert imp[sel].min() >= imp[~sel].max() - 1e-6
    tgt = out[out.doc_id % 97 == 0]
    assert tgt["selected"].mean() >= out["selected"].mean()


def test_semantic_dedup_kmeans_matches_naive(ray_session):
    """SemDeDup over learned clusters == the sequential composition of
    the naive k-means reference and the per-cluster dedup kernel."""
    from visiblev8_crawler_ray.functions.util import round_half_away
    from visiblev8_crawler_ray.pipelines.embeddings import (
        _normalize, semantic_dedup_kmeans)
    import pyarrow.parquet as pq

    got = semantic_dedup_kmeans(SF, threshold=0.3, k=8, iters=3)

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
        np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    assign = _naive_kmeans(SF, k=8, iters=3)["cluster"].to_numpy()
    kept = np.ones(len(ids), dtype=bool)
    dup_of = np.full(len(ids), -1, dtype=np.int64)
    for c in np.unique(assign):
        sel = np.flatnonzero(assign == c)
        nrm = _normalize(mat[sel])
        sims = round_half_away(nrm @ nrm.T, 4)
        dup = np.triu(sims >= 0.3, k=1)
        has = dup.any(axis=0)
        kept[sel] = ~has
        dup_of[sel[has]] = ids[sel][dup.argmax(axis=0)[has]]
    want = pd.DataFrame({"vec_id": ids.astype(np.int64), "kept": kept,
                         "dup_of": dup_of})
    assert got[["vec_id", "kept", "dup_of"]].values.tolist() == \
        want.values.tolist()
    assert (~got["kept"]).sum() > 0  # the threshold actually dedups


# ---------------------------------------------------------------------------
# BPE tokenizer training / Gopher filter / weighted sampling (5th session)
# ---------------------------------------------------------------------------

SF = "/root/testdata/sf0.001"


def _naive_bpe(texts, n_merges):
    """Single-process reference: Sennrich-style BPE over the word-freq
    table; adjacent pairs counted overlapping, greedy left-to-right
    apply, ties -> (count DESC, left ASC, right ASC)."""
    from collections import Counter

    wf = Counter()
    for t in texts:
        wf.update(w for w in t.split() if w)
    syms = {w: list(w) for w in wf}
    merges = []
    for it in range(n_merges):
        counts = Counter()
        for w, f in wf.items():
            s = syms[w]
            for j in range(len(s) - 1):
                counts[(s[j], s[j + 1])] += f
        if not counts:
            break
        (left, right), cnt = min(counts.items(),
                                 key=lambda kv: (-kv[1], kv[0]))
        merges.append((it, left, right, int(cnt)))
        new = left + right
        for w in wf:
            s = syms[w]
            j = 0
            while j < len(s) - 1:
                if s[j] == left and s[j + 1] == right:
                    s[j:j + 2] = [new]
                else:
                    j += 1
    return pd.DataFrame(merges, columns=["iter", "left", "right", "cnt"])


def test_bpe_merges_matches_naive(ray_session):
    from visiblev8_crawler_ray.pipelines.textops import bpe_merges

    import pyarrow.parquet as pq

    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    got = bpe_merges(SF, n_merges=8)
    want = _naive_bpe(texts, 8)
    pd.testing.assert_frame_equal(got, want)
    # learned rules must eventually chain (a merged symbol reappears)
    symbols = set()
    chained = False
    for _, r in got.iterrows():
        if r["left"] in symbols or r["right"] in symbols:
            chained = True
        symbols.add(r["left"] + r["right"])
    assert chained, "8 merges over this corpus must reuse a merged symbol"


def test_bpe_merges_block_invariance(ray_session, tmp_path):
    """Same corpus split across many small blocks -> identical merges
    (the per-block pair partials are a mergeable summary)."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from visiblev8_crawler_ray.pipelines.textops import bpe_merges

    t = pq.read_table(f"{SF}/documents.parquet")
    d = tmp_path / "docs13"
    d.mkdir()
    n = t.num_rows
    step = max(1, n // 13)
    for i, lo in enumerate(range(0, n, step)):
        pq.write_table(t.slice(lo, step), d / f"part{i:02d}.parquet")
    # point a fake sf_dir at the 13-file layout
    sf2 = tmp_path
    (tmp_path / "documents.parquet").symlink_to(d)
    got = bpe_merges(str(sf2), n_merges=5)
    want = bpe_merges(SF, n_merges=5)
    pd.testing.assert_frame_equal(got, want)


def test_bpe_pair_counts_overlapping_runs(ray_session, tmp_path):
    """'aaa' contributes ('a','a') twice — overlapping adjacent pairs,
    the Sennrich counting convention the SQL twin mirrors."""
    import pyarrow.parquet as pq
    from visiblev8_crawler_ray.pipelines.textops import bpe_pair_counts

    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "text": pa.array(["aaa bb", "ab"], type=pa.string())})
    pq.write_table(t, tmp_path / "documents.parquet")
    got = bpe_pair_counts(str(tmp_path))
    want = {"aa": 2, "bb": 1, "ab": 1}
    assert dict(zip(got["pair"], got["cnt"])) == want


def test_gopher_filter_rules(ray_session, tmp_path):
    """Hand-computed flags on crafted docs (digit-heavy, short-words,
    too-short, clean)."""
    import pyarrow.parquet as pq
    from visiblev8_crawler_ray.pipelines.textops import gopher_filter

    clean = ("the fast data " * 10).strip()          # 30 words, stops: the
    clean = clean + " a of"                          # +2 stopwords
    digits = "the a " + " ".join(str(i) for i in range(30))  # 32 words
    shortw = "a " * 25 + "the"                       # mean len < 3
    tiny = "the a big"                               # < 20 words
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array([clean, digits, shortw, tiny], type=pa.string()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    df = gopher_filter(str(tmp_path)).to_pandas().set_index("doc_id")
    assert bool(df.loc[0, "keep"])
    assert not bool(df.loc[1, "ok_digits"]) and not bool(df.loc[1, "keep"])
    assert not bool(df.loc[2, "ok_wordlen"]) and not bool(df.loc[2, "keep"])
    assert not bool(df.loc[3, "ok_nwords"]) and not bool(df.loc[3, "keep"])


def test_sample_weighted_block_invariance(ray_session, tmp_path):
    """Partial top-k per block is exact: a 13-block layout returns the
    identical sample, and heavier docs are over-represented vs uniform
    hashing (the E-S property)."""
    import pyarrow.parquet as pq
    from visiblev8_crawler_ray.pipelines.textops import sample_weighted

    t = pq.read_table(f"{SF}/documents.parquet")
    d = tmp_path / "docs13"
    d.mkdir()
    n = t.num_rows
    step = max(1, n // 13)
    for i, lo in enumerate(range(0, n, step)):
        pq.write_table(t.slice(lo, step), d / f"part{i:02d}.parquet")
    (tmp_path / "documents.parquet").symlink_to(d)
    got = sample_weighted(str(tmp_path), k=60)
    want = sample_weighted(SF, k=60)
    pd.testing.assert_frame_equal(got, want)
    # weighted sample should skew above the corpus mean weight
    corpus_mean = pq.read_table(
        f"{SF}/documents.parquet", columns=["text"])["text"].to_pandas() \
        .str.split().str.len().mean()
    assert want["wt"].mean() > corpus_mean


def test_unigram_logprob_properties(ray_session, tmp_path):
    """Rare-token docs score below common-token docs; empty doc gets
    (0, 0, 0.0); sum_q is block-order-independent (13-block layout)."""
    import pyarrow.parquet as pq
    from visiblev8_crawler_ray.pipelines.textops import unigram_logprob

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["the the the the", "zyxwv qqqzz", "  "],
                         type=pa.string()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    df = unigram_logprob(str(tmp_path)).set_index("doc_id")
    assert df.loc[0, "avg_logprob"] > df.loc[1, "avg_logprob"]
    assert df.loc[2, "n_tokens"] == 0 and df.loc[2, "avg_logprob"] == 0.0

    big = pq.read_table(f"{SF}/documents.parquet")
    d = tmp_path / "docs13"
    d.mkdir()
    step = max(1, big.num_rows // 13)
    for i, lo in enumerate(range(0, big.num_rows, step)):
        pq.write_table(big.slice(lo, step), d / f"part{i:02d}.parquet")
    sf13 = tmp_path / "sf13"
    sf13.mkdir()
    (sf13 / "documents.parquet").symlink_to(d)
    got = unigram_logprob(str(sf13))
    want = unigram_logprob(SF)
    pd.testing.assert_frame_equal(got, want)


def test_mix_temperature_allocation(ray_session, tmp_path):
    """Allocation sums exactly to the budget; alpha=0.5 flattens the
    mixture (share ratio < raw token ratio); skewed fixture."""
    import pyarrow.parquet as pq
    from visiblev8_crawler_ray.pipelines.textops import mix_temperature

    t = pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "source": pa.array(["big", "big", "big", "tiny"]),
        "text": pa.array(["w " * 400, "w " * 400, "w " * 200, "w w w w"]),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    df = mix_temperature(str(tmp_path), budget=97).set_index("source")
    assert int(df["alloc"].sum()) == 97
    raw_ratio = df.loc["big", "n_tokens"] / df.loc["tiny", "n_tokens"]
    share_ratio = df.loc["big", "share"] / df.loc["tiny", "share"]
    assert 1 < share_ratio < raw_ratio  # temperature flattens, not inverts
    assert abs(share_ratio**2 - raw_ratio) / raw_ratio < 1e-6  # alpha=0.5


def test_normalize_text_idempotent(ray_session, tmp_path):
    """Normalizing already-normalized text is a fixed point."""
    import pyarrow.parquet as pq
    from visiblev8_crawler_ray.pipelines.textops import normalize_text

    t = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["  Hello,   WORLD!.. x ", "already clean"]),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    one = normalize_text(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert one["norm_text"].tolist() == ["hello world x", "already clean"]
    t2 = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                   "text": pa.array(one["norm_text"])})
    sf2 = tmp_path / "again"
    sf2.mkdir()
    pq.write_table(t2, sf2 / "documents.parquet")
    two = normalize_text(str(sf2)).to_pandas().sort_values("doc_id")
    assert two["norm_text"].tolist() == one["norm_text"].tolist()


def test_corpus_novelty_flags_dups(ray_session, tmp_path):
    """An incoming doc whose text matches a committed doc is not novel;
    unseen text is; an incoming-only duplicate pair stays novel (dedup
    within the incoming batch is dedup_exact's job, not novelty's)."""
    import pyarrow.parquet as pq
    from visiblev8_crawler_ray.pipelines.textops import corpus_novelty

    t = pa.table({
        "doc_id": pa.array([0, 2, 1, 3, 5, 7], type=pa.int64()),
        "text": pa.array(["seen doc", "other committed", "seen doc",
                          "brand new", "dup in batch", "dup in batch"]),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    df = corpus_novelty(str(tmp_path)).set_index("doc_id")
    assert not bool(df.loc[1, "novel"])
    assert bool(df.loc[3, "novel"])
    assert bool(df.loc[5, "novel"]) and bool(df.loc[7, "novel"])


def test_bpe_encode_matches_naive(ray_session):
    """Encoded symbol counts equal applying the naive BPE reference's
    merge rules word-by-word; compression <= 1 and decreases vs 0
    merges."""
    import pyarrow.parquet as pq
    from visiblev8_crawler_ray.pipelines.textops import bpe_encode

    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"]).to_pandas()
    rules = _naive_bpe(texts["text"].tolist(), 8)
    merge_list = list(zip(rules["left"], rules["right"]))

    def enc(w):
        s = list(w)
        for left, right in merge_list:
            j = 0
            while j < len(s) - 1:
                if s[j] == left and s[j + 1] == right:
                    s[j:j + 2] = [left + right]
                else:
                    j += 1
        return len(s)

    got = bpe_encode(SF, n_merges=8).set_index("doc_id")
    for _, r in texts.head(50).iterrows():
        toks = [w for w in r["text"].split() if w]
        want_syms = sum(enc(w) for w in toks)
        assert got.loc[r["doc_id"], "n_syms"] == want_syms
    assert (got["n_syms"] <= got["n_chars"]).all()


def test_embedding_pca_matches_naive_and_block_invariant(ray_session,
                                                         tmp_path):
    """Projection equals a single-process PCA over the same quantized
    covariance (sign convention pinned), component variances descend,
    and a 7-block layout yields the identical result."""
    import pyarrow.parquet as pq
    from visiblev8_crawler_ray.pipelines.embeddings import embedding_pca

    got = embedding_pca(SF, k=4)
    v = got[["pc0", "pc1", "pc2", "pc3"]].var().to_numpy()
    assert (np.diff(v) <= 1e-12).all()

    # naive reference: same 2^16 quantization, driver-side eigh
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    S1 = float(1 << 16)
    q = (np.sign(mat * S1) * np.floor(np.abs(mat * S1) + 0.5))
    n = q.shape[0]
    mean = q.sum(0) / (n * S1)
    C = (q.T @ q) / (n * S1 * S1) - np.outer(mean, mean)
    w, vec = np.linalg.eigh(C)
    basis = vec[:, np.argsort(-w)[:4]]
    amax = np.argmax(np.abs(basis), axis=0)
    flip = np.sign(basis[amax, np.arange(4)])
    flip[flip == 0] = 1.0
    basis = basis * flip
    proj = (mat - mean) @ basis
    ids = np.asarray(t["vec_id"].to_pylist())
    order = np.argsort(ids)
    want = np.round(proj[order], 6)
    np.testing.assert_allclose(
        got[["pc0", "pc1", "pc2", "pc3"]].to_numpy(), want, atol=2e-6)

    # block invariance
    full = pq.read_table(f"{SF}/embeddings.parquet")
    d = tmp_path / "emb7"
    d.mkdir()
    step = max(1, full.num_rows // 7)
    for i, lo in enumerate(range(0, full.num_rows, step)):
        pq.write_table(full.slice(lo, step), d / f"p{i}.parquet")
    (tmp_path / "embeddings.parquet").symlink_to(d)
    got7 = embedding_pca(str(tmp_path), k=4)
    pd.testing.assert_frame_equal(got7, got)


def test_embedding_top_eigvec_direction_and_invariance(ray_session, tmp_path):
    """The fixed-round integer power iteration must (a) land within
    cosine 0.95 of LAPACK's leading eigenvector of the same integer
    second-moment matrix, (b) be invariant to input block layout, and
    (c) renormalize into the documented fixed-point band."""
    import pyarrow.parquet as pq

    from visiblev8_crawler_ray.pipelines.embeddings import (
        _cov_partials, embedding_top_eigvec)

    SF = "/root/testdata/sf0.001"
    got = embedding_top_eigvec(SF)
    agg = _cov_partials(SF)
    dim = int(agg["i"].max()) + 1
    P = np.zeros((dim, dim))
    P[agg["i"], agg["j"]] = agg["pp"]
    w, v = np.linalg.eigh(P)
    lead = v[:, -1]
    mine = got["v"].to_numpy().astype(float)
    mine /= np.linalg.norm(mine)
    assert abs(float(mine @ lead)) >= 0.95
    # fixed-point band: max |v| in [2^20, 2^21)
    m = int(np.abs(got["v"].to_numpy()).max())
    assert (1 << 20) <= m < (1 << 21)

    full = pq.read_table(f"{SF}/embeddings.parquet")
    d = tmp_path / "emb5"
    d.mkdir()
    step = max(1, full.num_rows // 5)
    for i, lo in enumerate(range(0, full.num_rows, step)):
        pq.write_table(full.slice(lo, step), d / f"p{i}.parquet")
    (tmp_path / "embeddings.parquet").symlink_to(d)
    got5 = embedding_top_eigvec(str(tmp_path))
    pd.testing.assert_frame_equal(got5, got)


def test_page_captcha_systems_constructed(ray_session):
    """Each captcha marker family fires independently; the JSON set is
    sorted, compact, and docs without detections are absent
    (1_postgres_schema.sql:160-166 page_captcha_systems semantics)."""
    import pyarrow as pa
    import ray.data as rd

    from visiblev8_crawler_ray.stages.parse import (CAPTCHA_SYSTEMS,
                                                    page_captcha_systems)

    def span(kind, text):
        return {"kind": kind, "text": text, "media_ref": "", "offset": 0}

    rows = [
        {"doc_id": "d-audio", "spans": [
            span("call", "AudioContext.createOscillator")]},
        {"doc_id": "d-canvas", "spans": [
            span("call", "HTMLCanvasElement.toDataURL")]},
        {"doc_id": "d-multi", "spans": [
            span("get", "MouseEvent.clientX"),
            span("set", "KeyboardEvent.key"),
            span("call", "WebGLRenderingContext.getParameter")]},
        {"doc_id": "d-none", "spans": [
            span("call", "Window.setTimeout"),
            # trigger spans are NOT usage spans: must not count
            span("trigger/mouse", "MouseEvent.clientY")]},
    ]
    out = page_captcha_systems(rd.from_items(rows)).to_pandas() \
        .set_index("doc_id")
    assert "d-none" not in out.index
    assert out.loc["d-audio", "captcha_systems"] == '["audio_challenge"]'
    assert out.loc["d-canvas", "captcha_systems"] == '["canvas_fingerprint"]'
    assert out.loc["d-multi", "captcha_systems"] == \
        '["keystroke_biometric","pointer_biometric","webgl_fingerprint"]'
    assert int(out.loc["d-multi", "n_systems"]) == 3
    assert len(CAPTCHA_SYSTEMS) == 6
