"""Training-mix curation operators over the ``documents`` table.

The reference stops at per-table dedup/upserts (D1-D5,
``2_mega_vv8_postgres_schema.sql:29-43``); these are the
corpus-assembly operators a pretraining pipeline layers on top —
global sequence packing, train/val/test splitting, seeded global
shuffle, per-group outlier fences and token-budget subsampling.  All
are first-class ``queries()`` entries with exact DuckDB twins.

Scale notes (the whole point of this module):

- Global *ordered* computations (packing offsets, shuffle positions)
  use the classic two-pass distributed prefix scan: pass 1 reduces a
  per-range partial (sum or count) to a tiny driver-side table — one
  row per range, O(n / range_size) — whose exclusive prefix is then
  broadcast; pass 2 is a single ``groupby(range)`` where each group
  adds its base to a vectorized local cumsum/rank.  No global sort,
  no all-to-all beyond the one hash shuffle on the range key.
- Pure per-row predicates (hash splits) stay shuffle-free maps.
- Per-group order-dependent selections (budget sampling) are ONE
  hash shuffle on the group key with a vectorized per-group kernel.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.util import round_half_away, two_phase_agg
from .textops import BPE_RE


def _read_docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    from ..functions.util import read_parquet_clean
    return read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _md5_u32(prefix: str, ids: np.ndarray) -> np.ndarray:
    """First 4 md5 bytes of ``prefix + str(id)`` as uint64 — matches
    DuckDB ``('0x' || substr(md5(prefix || CAST(id AS VARCHAR)), 1, 8))
    ::UBIGINT``.  Python loop over an id column only (no text); same
    precedent as functions/urls.py:md5_hex."""
    return np.array(
        [int.from_bytes(hashlib.md5((prefix + str(i)).encode()).digest()[:4],
                        "big") for i in ids],
        dtype=np.uint64,
    )


def _md5_hex_ids(prefix: str, ids: np.ndarray) -> list[str]:
    return [hashlib.md5((prefix + str(i)).encode()).hexdigest() for i in ids]


# ---------------------------------------------------------------------------
# Global concat-and-chunk packing (two-pass prefix scan)

def pack_global(sf_dir: str, window: int = 512,
                range_docs: int = 128,
                as_dataset: bool = False) -> pd.DataFrame:
    """GPT-style GLOBAL sequence packing: concatenate every document's
    BPE-ish tokens in doc_id order and slice the stream into fixed
    ``window``-token packs; each doc reports the pack its first token
    lands in, its offset inside that pack, and whether it straddles a
    pack boundary.

    Unlike ``textops.pack_sequences`` (which *restarts* packing every
    ``part_docs`` ids so the cumsum never leaves a partition), this is
    the true global layout: the exclusive prefix sum over the whole
    corpus.  Distributed as a two-pass scan —

      pass 1: tokenize once, reduce ``sum(n_tokens)`` per id-range
              (``doc_id // range_docs``) via the shuffle-free two-phase
              combiner; the per-range table (O(n/range_docs) rows) comes
              to the driver, where its exclusive prefix gives each
              range's global base offset;
      pass 2: one ``groupby(range)`` re-partitions the narrow
              (doc_id, n_tokens) table; each group sorts locally by
              doc_id and adds its broadcast base to a vectorized
              exclusive cumsum.

    The narrow token table (16 B/doc — no text) is materialized between
    passes so the full text corpus is tokenized exactly once; at 10^10
    docs that intermediate is ~160 GB spread across the object store,
    which is the cheap side of re-reading 100 TB of text.
    Partitioning assumption: doc ids are orderable (dense not required);
    ``range_docs`` only balances pass-2 groups.
    """
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def tokenize(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n = pc.count_substring_regex(t["text"], BPE_RE).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "rng": pa.array(ids // range_docs, type=pa.int64()),
            "n_tokens": pa.array(n, type=pa.int64()),
        })

    tokens = ds.map_batches(tokenize, batch_format="pyarrow").materialize()

    per_range = two_phase_agg(
        tokens, ["rng"], [("n_tokens", "sum")], ["rng", "rng_tokens"]
    ).to_pandas().sort_values("rng").reset_index(drop=True)
    bases = dict(zip(
        per_range["rng"],
        np.concatenate(([0], np.cumsum(per_range["rng_tokens"].to_numpy())[:-1])),
    ))

    def per_range_pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        n = g["n_tokens"].to_numpy()
        start = int(bases[g["rng"].iloc[0]]) + np.cumsum(n) - n
        off = start % window
        return pd.DataFrame({
            "doc_id": g["doc_id"],
            "n_tokens": n,
            "start_offset": start,
            "pack_id": start // window,
            "offset_in_pack": off,
            "spans_boundary": off + n > window,
        })

    from ..functions.util import collect_or_ds
    return collect_or_ds(
        tokens.groupby("rng").map_groups(per_range_pack,
                                         batch_format="pandas"),
        as_dataset, sort_by="doc_id")


# ---------------------------------------------------------------------------
# Train/val/test hash split

def split_assign(sf_dir: str, pct_train: int = 80,
                 pct_val: int = 10,
                 as_dataset: bool = False) -> pd.DataFrame:
    """Deterministic train/val/test assignment by salted content-key
    hash — the split every training pipeline needs pinned *before* any
    shuffling or sampling, and the reason it must be a pure per-row
    predicate: stable across reruns, cluster sizes and input order, no
    coordination, composable with every downstream stage.  Salted
    (``split|``) so it is independent of the ``sample_hash`` /
    ``sample_stratified`` Bernoulli keys."""
    ds = _read_docs(sf_dir, ["doc_id", "lang", "source"])
    hi_val = pct_train + pct_val

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        b = (_md5_u32("split|", ids) % 100).astype(np.int64)
        split = np.where(b < pct_train, "train",
                         np.where(b < hi_val, "val", "test"))
        return t.append_column("split", pa.array(split, type=pa.string()))

    from ..functions.util import collect_or_ds
    return collect_or_ds(ds.map_batches(assign, batch_format="pyarrow"),
                         as_dataset, sort_by="doc_id")


# ---------------------------------------------------------------------------
# Seeded global shuffle (two-pass rank assignment)

def shuffle_order(sf_dir: str, seed: str = "s42",
                  as_dataset: bool = False) -> pd.DataFrame:
    """Seeded deterministic GLOBAL shuffle: every doc gets its position
    in the permutation induced by ``md5(seed | doc_id)`` — reproducible
    across runs and cluster sizes, unlike ``ds.random_shuffle``.

    Rank assignment without a global sort: the first hex byte of the
    shuffle key splits the keyspace into 256 uniform buckets; pass 1
    counts per bucket (shuffle-free combiner → 256-row driver table →
    exclusive prefix = each bucket's base rank); pass 2 is one
    ``groupby(bucket)`` whose groups argsort locally by (key, doc_id)
    and add their base.  md5 keys are uniform, so buckets are balanced
    by construction — no skew salting needed."""
    ds = _read_docs(sf_dir, ["doc_id"])

    def key(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keys = _md5_hex_ids(seed + "|", ids)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "shuffle_key": pa.array(keys, type=pa.string()),
            "bucket": pa.array([int(k[:2], 16) for k in keys],
                               type=pa.int64()),
        })

    keyed = ds.map_batches(key, batch_format="pyarrow").materialize()
    counts = two_phase_agg(
        keyed, ["bucket"], [("doc_id", "count")], ["bucket", "n"]
    ).to_pandas().sort_values("bucket").reset_index(drop=True)
    bases = dict(zip(
        counts["bucket"],
        np.concatenate(([0], np.cumsum(counts["n"].to_numpy())[:-1])),
    ))

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shuffle_key", "doc_id"]).reset_index(drop=True)
        base = int(bases[g["bucket"].iloc[0]])
        return pd.DataFrame({
            "doc_id": g["doc_id"],
            "shuffle_key": g["shuffle_key"],
            "shuffle_pos": base + np.arange(1, len(g) + 1, dtype=np.int64),
        })

    from ..functions.util import collect_or_ds
    return collect_or_ds(
        keyed.groupby("bucket").map_groups(rank, batch_format="pandas"),
        as_dataset, sort_by="shuffle_pos")


# ---------------------------------------------------------------------------
# Per-group IQR outlier fences

def iqr_outliers(sf_dir: str) -> pd.DataFrame:
    """Tukey outlier flags per source: docs whose ``n_chars`` falls
    outside [q1 - 1.5·IQR, q3 + 1.5·IQR] of their group.  The
    quality-filter shape for heterogeneous training mixes (each source
    gets its own fences).

    Two stages: exact per-group quantiles (linear interpolation — the
    same arithmetic as DuckDB ``percentile_cont``) via one groupby over
    the narrow (source, n_chars) projection; the tiny fence table is
    broadcast into a shuffle-free flag map over the full table.  Fences
    are rounded half-away to 4 dp on BOTH sides so the boundary compare
    cannot diverge under the value-hash gate.  For corpora where even
    per-group exact quantiles are too hot, ``value_quantiles_sketch``
    is the mergeable-sketch path."""
    ds = _read_docs(sf_dir, ["doc_id", "source", "n_chars"])

    def fences(g: pd.DataFrame) -> pd.DataFrame:
        v = g["n_chars"].to_numpy()
        q1, q3 = np.percentile(v, [25.0, 75.0])  # linear, = percentile_cont
        iqr = q3 - q1
        return pd.DataFrame({
            "source": [g["source"].iloc[0]],
            "lo": [float(round_half_away(np.array([q1 - 1.5 * iqr]), 4)[0])],
            "hi": [float(round_half_away(np.array([q3 + 1.5 * iqr]), 4)[0])],
        })

    f = (
        ds.groupby("source").map_groups(fences, batch_format="pandas")
        .to_pandas()
    )
    lo = dict(zip(f["source"], f["lo"]))
    hi = dict(zip(f["source"], f["hi"]))

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        l = df["source"].map(lo).to_numpy()
        h = df["source"].map(hi).to_numpy()
        v = df["n_chars"].to_numpy()
        df["is_outlier"] = (v < l) | (v > h)
        return df

    return ds.map_batches(flag, batch_format="pandas").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Token-budget subsampling

def token_budget_sample(sf_dir: str, budget: int = 1000,
                        as_dataset: bool = False) -> pd.DataFrame:
    """Greedy per-source token-budget subsample: walk each source's docs
    in salted-hash order (a fixed "random" order, independent of id
    locality) and keep docs while the running BPE-token total stays
    within ``budget`` — the standard way to hit a per-source token
    quota in a training mix.  ONE hash shuffle on the group key; the
    per-group kernel is argsort + cumsum + mask, fully vectorized."""
    ds = _read_docs(sf_dir, ["doc_id", "source", "text"])

    def prep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n = pc.count_substring_regex(t["text"], BPE_RE).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "source": t["source"],
            "n_tokens": pa.array(n, type=pa.int64()),
            "k": pa.array(_md5_hex_ids("budget|", ids), type=pa.string()),
        })

    def take(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["k", "doc_id"]).reset_index(drop=True)
        cum = g["n_tokens"].to_numpy().cumsum()
        keep = cum <= budget
        return pd.DataFrame({
            "doc_id": g["doc_id"][keep],
            "source": g["source"][keep],
            "n_tokens": g["n_tokens"][keep],
            "cum_tokens": cum[keep],
        })

    from ..functions.util import collect_or_ds
    return collect_or_ds(
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("source").map_groups(take, batch_format="pandas"),
        as_dataset, sort_by="doc_id")


def export_corpus(sf_dir: str, out_dir: str, nparts: int = 8) -> pd.DataFrame:
    """Resumable curated-corpus export — the text-side twin of the
    crawl store's checkpointed writes: Gopher-keep docs with normalized
    text land as hash-partitioned parquet (``doc_id %% nparts``), each
    partition committed through the store's tmp+rename manifest, so a
    killed export re-run SKIPS every committed partition (no rewrite,
    no double rows) and rebuilds only the missing ones.

    One streaming pass over the corpus: the map stage side-writes each
    batch's rows into every MISSING partition's staging dir under a
    content-hash file name (idempotent under task retries — a retry
    re-stages identical bytes under the identical name, the FetchWriter
    contract), then the driver commits each partition with its row
    count as lineage.  Partitions already committed are filtered out
    before any byte moves.

    Returns one row per partition: (partition, n_rows, skipped)."""
    import uuid

    from ..store import TableStore
    from .textops import _gopher_flag_arrays, normalize_kernel

    store = TableStore(out_dir)
    committed = store.committed_waves("corpus")
    if committed:
        # a store written under a different partition scheme must error,
        # not silently skip mod-N partitions holding mod-M subsets
        prior = store.read_manifest("corpus", committed[0]).get("nparts")
        if prior is not None and prior != nparts:
            raise ValueError(
                f"store at {out_dir} was written with nparts={prior}; "
                f"re-run with that value or use a fresh out_dir")
    missing = [p for p in range(nparts)
               if not store.committed("corpus", p)]
    summary = []
    if missing:
        dirs = {p: store.prepare_partition("corpus", p) for p in missing}
        missing_set = frozenset(missing)

        def write_part(t: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq

            (_, _, _, _, ok_nwords, ok_wordlen, ok_digits,
             ok_stop) = _gopher_flag_arrays(t["text"])
            keep = ok_nwords & ok_wordlen & ok_digits & ok_stop
            x = normalize_kernel(t["text"])
            kept = pa.table({
                "doc_id": t["doc_id"],
                "source": t["source"],
                "norm_text": x,
            }).filter(pa.array(keep))
            ids = kept["doc_id"].to_numpy(zero_copy_only=False)
            part = ids % nparts
            counts = {}
            for p in set(part.tolist()) & missing_set:
                sub = kept.filter(pa.array(part == p))
                sub_ids = sub["doc_id"].to_numpy(zero_copy_only=False)
                name = hashlib.blake2b(
                    sub_ids.tobytes(), digest_size=12).hexdigest()
                final = os.path.join(dirs[p], f"{name}.parquet")
                # uuid tmp + rename to the deterministic final name:
                # two concurrent attempts (at-least-once retries) never
                # share a tmp path, and the last atomic replace wins
                # with identical content (the FetchWriter contract)
                tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
                pq.write_table(sub, tmp)
                os.replace(tmp, final)
                counts[p] = sub.num_rows
            return pa.table({
                "partition": pa.array(sorted(counts), type=pa.int64()),
                "n_rows": pa.array([counts[p] for p in sorted(counts)],
                                   type=pa.int64()),
            })

        parts = _read_docs(sf_dir, ["doc_id", "source", "text"]) \
            .map_batches(write_part, batch_format="pyarrow").to_pandas()
        rows_by_part = (parts.groupby("partition")["n_rows"].sum()
                        if len(parts) else pd.Series(dtype="int64"))
        for p in missing:
            n = int(rows_by_part.get(p, 0))
            store.commit_partition("corpus", p,
                                   lineage={"n_rows": n, "nparts": nparts})
            summary.append({"partition": p, "n_rows": n, "skipped": False})
    for p in range(nparts):
        if p not in missing:
            n = int(store.read_manifest("corpus", p).get("n_rows", 0))
            summary.append({"partition": p, "n_rows": n, "skipped": True})
    return (pd.DataFrame(summary).sort_values("partition")
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# Crawl store -> training corpus (the end-to-end north-star composition)

def crawl_to_corpus(docs: rd.Dataset, window: int = 512,
                    min_tokens: int = 100, media_den: int = 40,
                    prefix_len: int = 2) -> pd.DataFrame:
    """The full crawl-to-training-data composition in ONE streaming
    pipeline: interleaved crawl documents -> rendered training text
    (media spans as placeholder tokens) -> exact-dedup canonicality ∧
    length floor ∧ media-density cap -> GPT-style GLOBAL sequence
    packing of the kept docs.  This is the end-to-end path the north
    star describes (crawl store of interleaved text+media docs feeding
    a pretraining mix); every stage reuses the standalone operators'
    kernels (reconstruct_text, digest_hex, pack_global's two-pass
    prefix scan), so the composite inherits their gates.

    Filters (exact integers, so the DuckDB twin agrees bit-for-bit):
      keep = (doc_id == min(doc_id) over same rendered-text md5)
           ∧ n_tokens >= min_tokens
           ∧ n_media * media_den <= n_tokens          (density cap)

    Scale shape: reconstruction+signals is one streaming pass over the
    span table; the narrow signal table (5 scalar cols, no text) is
    materialized ONCE and reused for the dedup exchange, the flag pass
    and both packing passes — the corpus text is rendered exactly once.
    The keep-list broadcasts (sorted key/value arrays); above broadcast
    scale it hash-partition-joins on content_key (the dedup_minhash
    co-group, same switch as curate_corpus).  Packing is the two-pass
    distributed prefix scan over doc_id PREFIX ranges (hex ids ->
    balanced ranges; same-length prefixes order consistently with the
    full lexicographic doc_id order), so no global sort ever runs.

    Empty-doc note: a doc with no spans renders to '' and is dropped by
    the length floor on both engines (the SQL twin's GROUP BY never
    emits it), so parity holds for min_tokens >= 1."""
    import ray

    from ..functions.util import (digest_hex, digest_hex_dict,
                                  empty_frame)
    from ..stages.parse import reconstruct_text

    rt = reconstruct_text(docs)

    def signals(t: pa.Table) -> pa.Table:
        text = t["doc_text"]
        n_tok = pc.count_substring_regex(text, r"\S+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_med = pc.count_substring_regex(
            text, r"<\|media/[a-z]+\|>").to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            "doc_id": ids,
            "rng": pc.utf8_slice_codeunits(ids, 0, prefix_len),
            "content_key": digest_hex(text),
            "n_tokens": pa.array(n_tok),
            "n_media": pa.array(n_med),
        })

    sig = rt.map_batches(signals, batch_format="pyarrow").materialize()

    keep = two_phase_agg(sig, ["content_key"], [("doc_id", "min")],
                         ["content_key", "keep_doc_id"]).to_pandas()
    empty = empty_frame({"doc_id": "object", "n_tokens": "int64",
                         "start_offset": "int64", "pack_id": "int64",
                         "offset_in_pack": "int64",
                         "spans_boundary": "bool"})
    if keep.empty:
        return empty
    kk = keep["content_key"].to_numpy()
    ko = np.argsort(kk, kind="stable")
    keep_ref = ray.put((kk[ko], keep["keep_doc_id"].to_numpy()[ko]))

    def flag(t: pa.Table) -> pa.Table:
        keys, kd = ray.get(keep_ref)
        ck = t["content_key"].to_numpy(zero_copy_only=False)
        ix = np.searchsorted(keys, ck)
        ix = np.minimum(ix, len(keys) - 1)  # every key exists (pass 1)
        canonical = kd[ix] == t["doc_id"].to_numpy(zero_copy_only=False)
        n_tok = t["n_tokens"].to_numpy(zero_copy_only=False)
        n_med = t["n_media"].to_numpy(zero_copy_only=False)
        kept = canonical & (n_tok >= min_tokens) \
            & (n_med * media_den <= n_tok)
        return t.filter(pa.array(kept)).select(
            ["doc_id", "rng", "n_tokens"])

    kept = sig.map_batches(flag, batch_format="pyarrow").materialize()

    per_range = two_phase_agg(
        kept, ["rng"], [("n_tokens", "sum")], ["rng", "rng_tokens"]
    ).to_pandas()
    if per_range.empty or "rng" not in per_range.columns:
        return empty
    per_range = per_range.sort_values("rng").reset_index(drop=True)
    bases = dict(zip(
        per_range["rng"],
        np.concatenate(([0], np.cumsum(
            per_range["rng_tokens"].to_numpy())[:-1])),
    ))

    def per_range_pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        n = g["n_tokens"].to_numpy()
        start = int(bases[g["rng"].iloc[0]]) + np.cumsum(n) - n
        off = start % window
        return pd.DataFrame({
            "doc_id": g["doc_id"],
            "n_tokens": n,
            "start_offset": start,
            "pack_id": start // window,
            "offset_in_pack": off,
            "spans_boundary": off + n > window,
        })

    return (kept.groupby("rng").map_groups(
        per_range_pack, batch_format="pandas")
        .to_pandas().sort_values("doc_id").reset_index(drop=True))


def crawl_to_corpus_sql(export_path: str, window: int = 512,
                        min_tokens: int = 100,
                        media_den: int = 40) -> str:
    """DuckDB twin over the committed docs export — same rendering,
    same md5 canonicality, same integer filters, same prefix-sum
    packing (window-function form)."""
    return f"""
        WITH sp AS (SELECT doc_id, unnest(spans, recursive := true)
                    FROM read_parquet('{export_path}')),
        r AS (SELECT doc_id,
                     string_agg(CASE WHEN kind LIKE 'media/%'
                                     THEN '<|' || kind || '|>'
                                     ELSE text END, ' '
                                ORDER BY "offset") AS doc_text
              FROM sp GROUP BY doc_id),
        t AS (SELECT doc_id, md5(doc_text) AS content_key,
                     CAST(len(regexp_extract_all(doc_text, '\\S+'))
                          AS BIGINT) AS n_tokens,
                     CAST(len(regexp_extract_all(doc_text,
                          '<\\|media/[a-z]+\\|>')) AS BIGINT) AS n_media
              FROM r),
        k AS (SELECT content_key, min(doc_id) AS keep_doc_id
              FROM t GROUP BY content_key),
        f AS (SELECT t.doc_id, t.n_tokens
              FROM t JOIN k USING (content_key)
              WHERE t.doc_id = k.keep_doc_id
                AND t.n_tokens >= {min_tokens}
                AND t.n_media * {media_den} <= t.n_tokens),
        c AS (SELECT doc_id, n_tokens,
                     CAST(sum(n_tokens) OVER (ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tokens
                          AS BIGINT) AS start_offset
              FROM f)
        SELECT doc_id, n_tokens, start_offset,
               start_offset // {window} AS pack_id,
               start_offset % {window} AS offset_in_pack,
               (start_offset % {window}) + n_tokens > {window}
                   AS spans_boundary
        FROM c ORDER BY doc_id"""


def crawl_to_corpus_clean(docs: rd.Dataset, log: rd.Dataset,
                          window: int = 512, min_tokens: int = 32,
                          media_den: int = 8, min_pages: int = 3,
                          num: int = 9, den: int = 10,
                          prefix_len: int = 2) -> pd.DataFrame:
    """The PRODUCTION corpus chain: boilerplate detect -> strip ->
    render clean text -> exact-dedup canonicality on the CLEAN content
    ∧ length floor ∧ media-density cap -> global packing.  Same
    contract as :func:`crawl_to_corpus` but every downstream decision
    (dedup key, token floor) sees the template-stripped text — the
    order a real pretraining pipeline applies (strip first, then
    dedup: template removal EXPOSES cross-host duplicates the raw
    render hides).

    A doc whose spans all strip renders to '' and is dropped by the
    floor on both engines (the twin's FILTERed string_agg yields NULL
    there; NULL never joins the dedup keep-list and NULL token counts
    fail the floor — same outcome).  Media spans never strip, so
    placeholders survive into the clean render."""
    import ray

    from ..functions.util import (digest_hex, digest_hex_dict,
                                  empty_frame)
    from ..stages.parse import (_spans_of, host_boilerplate_spans)

    empty = empty_frame({"doc_id": "object", "n_tokens": "int64",
                         "start_offset": "int64", "pack_id": "int64",
                         "offset_in_pack": "int64",
                         "spans_boundary": "bool"})
    if log is None:
        return empty
    bp = host_boilerplate_spans(docs, log, min_pages, num, den)
    ldf = log.select_columns(["doc_id", "host"]).to_pandas()
    if len(ldf) == 0:
        return empty
    order = np.argsort(ldf["doc_id"].to_numpy())
    map_ref = ray.put((ldf["doc_id"].to_numpy()[order],
                       ldf["host"].to_numpy()[order]))
    bp_sets = {h: pa.array(g["span_key"].to_numpy(), type=pa.string())
               for h, g in bp.groupby("host")} if len(bp) else {}
    bp_ref = ray.put(bp_sets)

    def signals(t: pa.Table) -> pa.Table:
        keys, hosts = ray.get(map_ref)
        bpk = ray.get(bp_ref)
        spans, doc_ids = _spans_of(t)
        flat = spans.flatten()
        parent = pc.list_parent_indices(spans).to_numpy(
            zero_copy_only=False)
        n_docs = t.num_rows
        kinds = flat.field("kind")
        is_media = pc.starts_with(kinds, "media/").to_numpy(
            zero_copy_only=False)
        ids = doc_ids.to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, ids)
        pos = np.minimum(pos, max(len(keys) - 1, 0))
        hit = keys[pos] == ids if len(keys) else np.zeros(n_docs, bool)
        doc_host = np.where(hit, hosts[pos] if len(keys) else "", "")
        removed = np.zeros(len(parent), bool)
        span_host = doc_host[parent]
        if bpk:
            skey = digest_hex_dict(flat.field("text"))
            for h in pd.unique(span_host):
                vs = bpk.get(h)
                if vs is None or h == "":
                    continue
                hm = span_host == h
                hits = pc.is_in(skey.take(pa.array(np.flatnonzero(hm))),
                                value_set=vs).to_numpy(
                    zero_copy_only=False)
                removed[np.flatnonzero(hm)[hits]] = True
            removed &= ~is_media
        # clean render: kept pieces re-joined per doc (all C kernels)
        placeholder = pc.binary_join_element_wise(
            pa.scalar("<|"), kinds, pa.scalar("|>"), pa.scalar(""))
        merged = pc.if_else(pa.array(is_media), placeholder,
                            flat.field("text"))
        if isinstance(merged, pa.ChunkedArray):
            merged = merged.combine_chunks()
        keep_ix = np.flatnonzero(~removed)
        kept = merged.take(pa.array(keep_ix))
        kept_per_doc = np.bincount(parent[keep_ix],
                                   minlength=n_docs)
        offsets = np.zeros(n_docs + 1, dtype=np.int32)
        np.cumsum(kept_per_doc, out=offsets[1:])
        lists = pa.ListArray.from_arrays(pa.array(offsets), kept)
        clean_text = pc.binary_join(lists, " ")
        n_tok = pc.count_substring_regex(clean_text, r"\S+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_med = pc.count_substring_regex(
            clean_text, r"<\|media/[a-z]+\|>").to_numpy(
            zero_copy_only=False).astype(np.int64)
        did = doc_ids.combine_chunks() if isinstance(
            doc_ids, pa.ChunkedArray) else doc_ids
        return pa.table({
            "doc_id": did,
            "rng": pc.utf8_slice_codeunits(did, 0, prefix_len),
            "content_key": digest_hex(clean_text),
            "n_tokens": pa.array(n_tok),
            "n_media": pa.array(n_med),
        })

    sig = docs.map_batches(signals, batch_format="pyarrow").materialize()
    keep = two_phase_agg(sig, ["content_key"], [("doc_id", "min")],
                         ["content_key", "keep_doc_id"]).to_pandas()
    if keep.empty:
        return empty
    kk = keep["content_key"].to_numpy()
    ko = np.argsort(kk, kind="stable")
    keep_ref = ray.put((kk[ko], keep["keep_doc_id"].to_numpy()[ko]))

    def flag(t: pa.Table) -> pa.Table:
        keys, kd = ray.get(keep_ref)
        ck = t["content_key"].to_numpy(zero_copy_only=False)
        ix = np.searchsorted(keys, ck)
        ix = np.minimum(ix, len(keys) - 1)
        canonical = kd[ix] == t["doc_id"].to_numpy(zero_copy_only=False)
        n_tok = t["n_tokens"].to_numpy(zero_copy_only=False)
        n_med = t["n_media"].to_numpy(zero_copy_only=False)
        kept = canonical & (n_tok >= min_tokens) \
            & (n_med * media_den <= n_tok)
        return t.filter(pa.array(kept)).select(
            ["doc_id", "rng", "n_tokens"])

    kept = sig.map_batches(flag, batch_format="pyarrow").materialize()
    per_range = two_phase_agg(
        kept, ["rng"], [("n_tokens", "sum")], ["rng", "rng_tokens"]
    ).to_pandas()
    if per_range.empty or "rng" not in per_range.columns:
        return empty
    per_range = per_range.sort_values("rng").reset_index(drop=True)
    bases = dict(zip(
        per_range["rng"],
        np.concatenate(([0], np.cumsum(
            per_range["rng_tokens"].to_numpy())[:-1])),
    ))

    def per_range_pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        n = g["n_tokens"].to_numpy()
        start = int(bases[g["rng"].iloc[0]]) + np.cumsum(n) - n
        off = start % window
        return pd.DataFrame({
            "doc_id": g["doc_id"],
            "n_tokens": n,
            "start_offset": start,
            "pack_id": start // window,
            "offset_in_pack": off,
            "spans_boundary": off + n > window,
        })

    return (kept.groupby("rng").map_groups(
        per_range_pack, batch_format="pandas")
        .to_pandas().sort_values("doc_id").reset_index(drop=True))


def crawl_to_corpus_clean_sql(export_path: str, log_path: str,
                              window: int = 512, min_tokens: int = 32,
                              media_den: int = 8, min_pages: int = 3,
                              num: int = 9, den: int = 10) -> str:
    from ..stages.parse import host_boilerplate_spans_sql

    bp = host_boilerplate_spans_sql(export_path, log_path,
                                    min_pages, num, den)
    return f"""
        WITH bp AS ({bp}),
        sp AS (SELECT doc_id, unnest(spans, recursive := true)
               FROM read_parquet('{export_path}')),
        e AS (SELECT s.doc_id, s."offset", l.host,
                     s.kind LIKE 'media/%' AS is_media,
                     CASE WHEN s.kind LIKE 'media/%'
                          THEN '<|' || s.kind || '|>'
                          ELSE s.text END AS piece,
                     md5(s.text) AS span_key
              FROM sp s LEFT JOIN read_parquet('{log_path}') l
                   USING (doc_id)),
        f AS (SELECT e.*,
                     (NOT e.is_media AND e.host IS NOT NULL
                      AND EXISTS (SELECT 1 FROM bp
                                  WHERE bp.host = e.host
                                    AND bp.span_key = e.span_key))
                         AS removed
              FROM e),
        r AS (SELECT doc_id,
                     string_agg(piece, ' ' ORDER BY "offset")
                         FILTER (WHERE NOT removed) AS doc_text
              FROM f GROUP BY doc_id),
        t AS (SELECT doc_id, md5(doc_text) AS content_key,
                     CAST(len(regexp_extract_all(doc_text, '\\S+'))
                          AS BIGINT) AS n_tokens,
                     CAST(len(regexp_extract_all(doc_text,
                          '<\\|media/[a-z]+\\|>')) AS BIGINT) AS n_media
              FROM r),
        k AS (SELECT content_key, min(doc_id) AS keep_doc_id
              FROM t GROUP BY content_key),
        f2 AS (SELECT t.doc_id, t.n_tokens
               FROM t JOIN k USING (content_key)
               WHERE t.doc_id = k.keep_doc_id
                 AND t.n_tokens >= {min_tokens}
                 AND t.n_media * {media_den} <= t.n_tokens),
        c AS (SELECT doc_id, n_tokens,
                     CAST(sum(n_tokens) OVER (ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tokens
                          AS BIGINT) AS start_offset
              FROM f2)
        SELECT doc_id, n_tokens, start_offset,
               start_offset // {window} AS pack_id,
               start_offset % {window} AS offset_in_pack,
               (start_offset % {window}) + n_tokens > {window}
                   AS spans_boundary
        FROM c ORDER BY doc_id"""


def incremental_corpus(docs_a: rd.Dataset, log_a: rd.Dataset,
                       docs_b: rd.Dataset, log_b: rd.Dataset,
                       window: int = 512, min_tokens: int = 100,
                       media_den: int = 40,
                       prefix_len: int = 2) -> pd.DataFrame:
    """Incremental crawl->corpus ingest: pack ONLY the recrawl's new
    payload — docs of B whose url_key is absent from A ('added') or
    whose rendered training text changed ('changed') — continuing the
    global token stream where run A's manifest ends, so the combined
    layout equals one corpus built from A's docs plus B's delta.  The
    incremental sibling of `export_corpus`'s partition resume and the
    consumer of `crawl_diff`'s delta classes.

    Delta identity is PER URL (url_key from the crawl log, 'ok' rows);
    the packed unit is B's doc.  Docs of B without a log row cannot be
    classified and are excluded (the twin's inner join).  The filter /
    dedup inside the delta reuses the crawl_to_corpus contract
    (canonicality within the delta, length floor, media cap).

    Scale shape: A contributes only (url_key, content_key) control
    rows and ONE scalar (its packed-token total); the delta selection
    is the crawl_diff bucketed co-group; packing is the two-pass
    prefix scan over the delta."""
    import ray

    from ..functions.util import digest_hex, empty_frame
    from ..stages.parse import reconstruct_text

    empty = empty_frame({"doc_id": "object", "n_tokens": "int64",
                         "start_offset": "int64", "pack_id": "int64",
                         "offset_in_pack": "int64",
                         "spans_boundary": "bool"})
    if docs_a is None or docs_b is None or log_a is None or log_b is None:
        return empty

    # run A's packed-token total: the baseline manifest's stream end
    base_manifest = crawl_to_corpus(docs_a, window=window,
                                    min_tokens=min_tokens,
                                    media_den=media_den,
                                    prefix_len=prefix_len)
    base_total = int(base_manifest["n_tokens"].sum()) \
        if len(base_manifest) else 0

    def _keyed(docs, log):
        ck = reconstruct_text(docs).map_batches(
            lambda t: pa.table({
                "doc_id": t["doc_id"],
                "content_key": digest_hex(t["doc_text"]),
            }), batch_format="pyarrow").to_pandas()
        lg = log.map_batches(
            lambda t: t.filter(pc.equal(t["status"], "ok")).select(
                ["doc_id", "url_key"]), batch_format="pyarrow").to_pandas()
        return lg.merge(ck, on="doc_id")

    # control tables: (url_key, content_key[, doc_id]) — narrow; at
    # crawl scale these become the crawl_diff co-group instead of a
    # driver merge (same columns, same semantics)
    a = _keyed(docs_a, log_a)[["url_key", "content_key"]]
    b = _keyed(docs_b, log_b)
    m = b.merge(a, on="url_key", how="left", suffixes=("", "_a"))
    delta_ids = set(m[(m["content_key_a"].isna())
                      | (m["content_key_a"] != m["content_key"])]
                    ["doc_id"])
    if not delta_ids:
        return empty
    ids_ref = ray.put(np.sort(np.array(sorted(delta_ids), dtype=object)
                              .astype(str)))

    def pick(t: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(str)
        ix = np.searchsorted(ids, d)
        ix = np.minimum(ix, len(ids) - 1)
        return t.filter(pa.array(ids[ix] == d))

    delta_docs = docs_b.map_batches(pick, batch_format="pyarrow")
    out = crawl_to_corpus(delta_docs, window=window,
                          min_tokens=min_tokens, media_den=media_den,
                          prefix_len=prefix_len)
    if out.empty:
        return empty
    start = out["start_offset"].to_numpy() + base_total
    out = out.assign(
        start_offset=start,
        pack_id=start // window,
        offset_in_pack=start % window,
        spans_boundary=(start % window) + out["n_tokens"].to_numpy()
        > window,
    )
    return out.reset_index(drop=True)


def incremental_corpus_sql(docs_a: str, log_a: str, docs_b: str,
                           log_b: str, window: int = 512,
                           min_tokens: int = 100,
                           media_den: int = 40) -> str:
    def _rend(docs: str, alias: str) -> str:
        return f"""
        r{alias} AS (SELECT doc_id,
                 string_agg(CASE WHEN kind LIKE 'media/%'
                                 THEN '<|' || kind || '|>'
                                 ELSE text END, ' '
                            ORDER BY "offset") AS doc_text
              FROM (SELECT doc_id, unnest(spans, recursive := true)
                    FROM read_parquet('{docs}')) GROUP BY doc_id)"""

    return f"""
        WITH {_rend(docs_a, 'a')}, {_rend(docs_b, 'b')},
        ta AS (SELECT doc_id, md5(doc_text) AS content_key,
                      CAST(len(regexp_extract_all(doc_text, '\\S+'))
                           AS BIGINT) AS n_tokens,
                      CAST(len(regexp_extract_all(doc_text,
                           '<\\|media/[a-z]+\\|>')) AS BIGINT) AS n_media
               FROM ra),
        ka AS (SELECT content_key, min(doc_id) AS keep_doc_id
               FROM ta GROUP BY content_key),
        fa AS (SELECT ta.n_tokens FROM ta JOIN ka USING (content_key)
               WHERE ta.doc_id = ka.keep_doc_id
                 AND ta.n_tokens >= {min_tokens}
                 AND ta.n_media * {media_den} <= ta.n_tokens),
        base AS (SELECT CAST(coalesce(sum(n_tokens), 0) AS BIGINT)
                     AS total FROM fa),
        la AS (SELECT l.url_key, md5(ra.doc_text) AS content_key
               FROM read_parquet('{log_a}') l JOIN ra USING (doc_id)
               WHERE l.status = 'ok'),
        lb AS (SELECT l.url_key, l.doc_id, md5(rb.doc_text)
                   AS content_key
               FROM read_parquet('{log_b}') l JOIN rb USING (doc_id)
               WHERE l.status = 'ok'),
        delta AS (SELECT DISTINCT lb.doc_id
                  FROM lb LEFT JOIN la USING (url_key)
                  WHERE la.content_key IS NULL
                     OR la.content_key <> lb.content_key),
        tb AS (SELECT rb.doc_id, md5(rb.doc_text) AS content_key,
                      CAST(len(regexp_extract_all(rb.doc_text, '\\S+'))
                           AS BIGINT) AS n_tokens,
                      CAST(len(regexp_extract_all(rb.doc_text,
                           '<\\|media/[a-z]+\\|>')) AS BIGINT) AS n_media
               FROM rb JOIN delta USING (doc_id)),
        kb AS (SELECT content_key, min(doc_id) AS keep_doc_id
               FROM tb GROUP BY content_key),
        fb AS (SELECT tb.doc_id, tb.n_tokens
               FROM tb JOIN kb USING (content_key)
               WHERE tb.doc_id = kb.keep_doc_id
                 AND tb.n_tokens >= {min_tokens}
                 AND tb.n_media * {media_den} <= tb.n_tokens),
        c AS (SELECT doc_id, n_tokens,
                     (SELECT total FROM base)
                     + CAST(sum(n_tokens) OVER (ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tokens
                            AS BIGINT) AS start_offset
              FROM fb)
        SELECT doc_id, n_tokens, start_offset,
               start_offset // {window} AS pack_id,
               start_offset % {window} AS offset_in_pack,
               (start_offset % {window}) + n_tokens > {window}
                   AS spans_boundary
        FROM c ORDER BY doc_id"""
