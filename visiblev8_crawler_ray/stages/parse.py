"""Span parsing: interleaved docs -> script records -> usage facts.

The reference's Go post-processor ("flow" agg) turns raw VV8 log lines
into ``script_flow`` rows (code, sha256, ordered ``apis TEXT[]``) and
usage-count tables (``1_postgres_schema.sql:55-82``,
``log_parser_worker/tasks.py:28-74``).  Here parsing is a pure,
vectorized function of the document row — ``map_batches`` over Arrow
list<struct> columns, no actors needed (SURVEY.md M8).

Two outputs:
- ``parse_scripts``: one row per script span, with the ordered list of
  API features observed until the next script span (the per-script
  ``apis`` trace);
- ``explode_usage``: one row per g/s/c/n span (USAGE_SCHEMA), the input
  to the usage-count rollups (A1).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.util import round_half_away

_USAGE_KINDS = {"get": "g", "set": "s", "call": "c", "new": "n"}
_HDR_RE = __import__("re").compile(r"^g=([a-z_]+);p=(-?\d+);")


def _split_script_header(raw: str) -> tuple[str, int, str]:
    """'g=<genesis>;p=<parent ordinal>;<code>' -> (genesis, parent, code).

    Raw VV8 script records pack id/parent/source into one log line; the
    synthetic trace mirrors that.  Records without the header parse as
    genesis 'unknown' (the reference enum's no-pattern default,
    1_postgres_schema.sql:126-133).
    """
    m = _HDR_RE.match(raw)
    if not m:
        return "unknown", -1, raw
    return m.group(1), int(m.group(2)), raw[m.end():]


def _spans_of(batch: pa.Table) -> tuple[pa.ListArray, pa.Array]:
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    doc_ids = batch.column("doc_id")
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    return spans, doc_ids


def explode_spans_batch(batch: pa.Table) -> pa.Table:
    """docs -> one row per span (doc_id, kind, text, media_ref, offset)."""
    spans, doc_ids = _spans_of(batch)
    flat = spans.flatten()
    parent = pc.list_parent_indices(spans)
    return pa.table(
        {
            "doc_id": doc_ids.take(parent),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "offset": flat.field("offset"),
        }
    )


def _ffill_script_index(kinds: np.ndarray, parent: np.ndarray
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-doc forward-fill: for every exploded span, the flat
    index of the nearest preceding 'script' span WITHIN its doc (-1 if
    none yet).  Segment trick: running max of script positions vs running
    max of doc-start positions — a script binds iff it is newer than the
    current doc's start.  Replaces a per-row Python loop over the
    hottest exploded column (VERDICT r1 #3).
    """
    n = len(kinds)
    ar = np.arange(n, dtype=np.int64)
    is_script = kinds == "script"
    starts = np.ones(n, dtype=bool)
    if n:
        starts[1:] = parent[1:] != parent[:-1]
    last_script = np.maximum.accumulate(np.where(is_script, ar, -1))
    doc_start = np.maximum.accumulate(np.where(starts, ar, -1))
    bound = np.where(last_script >= doc_start, last_script, -1)
    return bound, is_script


def _mode_of(kinds: np.ndarray) -> np.ndarray:
    mode = np.full(len(kinds), "", dtype=object)
    for k, v in _USAGE_KINDS.items():
        mode[kinds == k] = v
    return mode


def _script_records(texts: np.ndarray, script_ix: np.ndarray, doc_slot: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-script (sha, code, genesis, evaled_by) — the loop runs only
    over script spans (~2% of the exploded column).

    ``evaled_by`` resolves the header's parent ordinal to that script's
    sha within the same doc (script_flow.evaled_by,
    1_postgres_schema.sql:55-69); '' when the script has no parent.
    """
    k = len(script_ix)
    shas = np.empty(k, dtype=object)
    codes = np.empty(k, dtype=object)
    genesis = np.empty(k, dtype=object)
    parent_ord = np.empty(k, dtype=np.int64)
    for j, i in enumerate(script_ix):
        g, p, code = _split_script_header(texts[i])
        codes[j] = code
        genesis[j] = g
        parent_ord[j] = p
        shas[j] = hashlib.sha256(code.encode()).hexdigest()[:16]
    # resolve parent ordinals to shas within each doc
    evaled_by = np.full(k, "", dtype=object)
    if k:
        doc_first = np.zeros(k, dtype=np.int64)   # slot of doc's first script
        for j in range(1, k):
            doc_first[j] = doc_first[j - 1] if doc_slot[j] == doc_slot[j - 1] else j
        ok = parent_ord >= 0
        tgt = doc_first + parent_ord
        ordinal = np.arange(k) - doc_first
        ok &= parent_ord < ordinal  # parent must precede the child
        evaled_by[ok] = shas[tgt[ok]]
    return shas, codes, genesis, evaled_by


def _script_shas(texts: np.ndarray, script_ix: np.ndarray) -> np.ndarray:
    """sha256[:16] per script span (scripts are ~2% of spans; the digest
    loop runs only over them)."""
    return np.array(
        [hashlib.sha256(_split_script_header(texts[i])[2].encode()).hexdigest()[:16]
         for i in script_ix],
        dtype=object,
    )


def explode_usage_batch(batch: pa.Table) -> pa.Table:
    """docs -> usage facts (doc_id, script_sha, offset, feature, mode).

    Each g/s/c/n span is attributed to the nearest preceding script span
    — the eval/provenance attribution the reference's parser performs.
    Fully vectorized: numpy segment forward-fill over the exploded span
    columns, digests only over the script spans.
    """
    spans, doc_ids = _spans_of(batch)
    flat = spans.flatten()
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    kinds = flat.field("kind").to_numpy(zero_copy_only=False)
    texts = flat.field("text").to_numpy(zero_copy_only=False)
    offsets = flat.field("offset").to_numpy(zero_copy_only=False)

    bound, is_script = _ffill_script_index(kinds, parent)
    script_ix = np.flatnonzero(is_script)
    shas = _script_shas(texts, script_ix)
    # map flat script index -> compact sha slot
    slot = np.full(len(kinds), -1, dtype=np.int64)
    slot[script_ix] = np.arange(len(script_ix))
    sha_all = np.where(bound >= 0, np.r_[shas, [""]][slot[bound]], "")

    mode = _mode_of(kinds)
    sel = np.flatnonzero(np.isin(kinds, list(_USAGE_KINDS)))
    doc_np = doc_ids.to_numpy(zero_copy_only=False)
    # usage text is 'Feature.name[:arg]' — the optional arg carries the
    # call argument channel (createElement tag names, A2); split
    # vectorized with arrow regex kernels
    feats = pa.array(texts[sel], type=pa.string())
    feature = pc.replace_substring_regex(feats, r":.*$", "")
    arg = pc.replace_substring_regex(feats, r"^[^:]*:?", "")
    return pa.table(
        {
            "doc_id": pa.array(doc_np[parent[sel]], type=pa.string()),
            "script_sha": pa.array(sha_all[sel], type=pa.string()),
            "offset": pa.array(offsets[sel], type=pa.int32()),
            "feature": feature,
            "arg": arg,
            "mode": pa.array(mode[sel], type=pa.string()),
        }
    )


def parse_scripts_batch(batch: pa.Table) -> pa.Table:
    """docs -> script records with ordered api traces (script_flow analog).

    Vectorized: one explode, numpy forward-fill to attribute usage rows
    to their script, and a ListArray built straight from per-script
    usage counts (usage rows for a script are contiguous because the
    fill index is monotone) — replaces nested to_pylist() loops over
    every span (VERDICT r1 #4).
    """
    spans, doc_ids = _spans_of(batch)
    flat = spans.flatten()
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    kinds = flat.field("kind").to_numpy(zero_copy_only=False)
    texts = flat.field("text").to_numpy(zero_copy_only=False)

    bound, is_script = _ffill_script_index(kinds, parent)
    script_ix = np.flatnonzero(is_script)
    k = len(script_ix)
    doc_np = doc_ids.to_numpy(zero_copy_only=False)
    shas, codes, genesis, evaled_by = _script_records(
        texts, script_ix, parent[script_ix])

    slot = np.full(len(kinds), -1, dtype=np.int64)
    slot[script_ix] = np.arange(k)
    is_usage = np.isin(kinds, list(_USAGE_KINDS))
    usage_sel = np.flatnonzero(is_usage & (bound >= 0))
    owner = slot[bound[usage_sel]]           # compact script slot, monotone
    counts = np.bincount(owner, minlength=k) if k else np.zeros(0, dtype=np.int64)
    offsets_arr = pa.array(
        np.concatenate([[0], np.cumsum(counts)]).astype(np.int32))
    api_texts = pc.replace_substring_regex(
        pa.array(texts[usage_sel], type=pa.string()), r":.*$", "")
    apis = pa.ListArray.from_arrays(offsets_arr, api_texts)
    return pa.table(
        {
            "doc_id": pa.array(doc_np[parent[script_ix]], type=pa.string()),
            "script_sha": pa.array(shas, type=pa.string()),
            "code": pa.array(codes, type=pa.string()),
            "genesis": pa.array(genesis, type=pa.string()),
            "evaled_by": pa.array(evaled_by, type=pa.string()),
            "apis": apis,
        }
    )


def usage_rollup(docs: rd.Dataset) -> rd.Dataset:
    """A1 analog: count per (feature, mode) — two-phase combiner (the
    explode map fuses with the partial group_by; no Ray shuffle for a
    |vocab| x |modes| key set)."""
    from ..functions.util import two_phase_agg

    exploded = docs.map_batches(
        lambda b: explode_usage_batch(b).select(["feature", "mode", "offset"]),
        batch_format="pyarrow")
    return two_phase_agg(exploded, ["feature", "mode"],
                         [("offset", "count")], ["feature", "mode", "n"])


def create_elements(docs: rd.Dataset) -> rd.Dataset:
    """A2: document.createElement rollup (create_elements,
    ``1_postgres_schema.sql:148-158``): create_count per (script_hash,
    tag_name), from the usage rows' argument channel.  Two-phase
    combiner over a |scripts| x |tags| key set."""
    from ..functions.util import two_phase_agg

    def creates(batch: pa.Table) -> pa.Table:
        u = explode_usage_batch(batch)
        u = u.filter(pc.and_(
            pc.equal(u["feature"], "Document.createElement"),
            pc.not_equal(u["arg"], "")))
        return u.select(["script_sha", "arg", "offset"]).rename_columns(
            ["script_sha", "tag_name", "offset"])

    return two_phase_agg(
        docs.map_batches(creates, batch_format="pyarrow"),
        ["script_sha", "tag_name"], [("offset", "count")],
        ["script_sha", "tag_name", "create_count"])


def scripts_provenance(docs: rd.Dataset) -> rd.Dataset:
    """M8 provenance surface: one row per script with its causality
    fields (script_flow.evaled_by + script_genesis,
    ``1_postgres_schema.sql:55-69,126-133``)."""
    return docs.map_batches(parse_scripts_batch, batch_format="pyarrow"
    ).map_batches(
        lambda t: t.select(["doc_id", "script_sha", "genesis", "evaled_by"]),
        batch_format="pyarrow",
    )


def trigger_stats(docs: rd.Dataset) -> rd.Dataset:
    """M7 rollup: per trigger type — fired/timeout counts and the mean
    virtual duration of successful fires (crawler.js:280-420 budgets).
    Combiner pattern: per-batch partials, tiny final groupby."""
    def partial(batch: pa.Table) -> pa.Table:
        ex = explode_spans_batch(batch)
        trig = ex.filter(pc.starts_with(ex["kind"], "trigger/"))
        name = pc.replace_substring_regex(trig["kind"], r"^trigger/", "")
        is_to = pc.equal(trig["text"], "timeout")
        dur = pc.cast(pc.if_else(is_to, pa.scalar("0"), trig["text"]),
                      pa.int64())
        t = pa.table({
            "trigger": name,
            "fired": pa.array(np.ones(trig.num_rows, dtype=np.int64)),
            "timeouts": pc.cast(is_to, pa.int64()),
            "dur_sum": pc.if_else(is_to, pa.scalar(0, type=pa.int64()), dur),
        })
        return t

    from ..functions.util import two_phase_agg

    agg = two_phase_agg(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["trigger"], [("fired", "sum"), ("timeouts", "sum"),
                      ("dur_sum", "sum")],
        ["trigger", "fired", "timeouts", "dur_sum"])

    def finish(t: pa.Table) -> pa.Table:
        fired = t["fired"].to_numpy(zero_copy_only=False)
        to = t["timeouts"].to_numpy(zero_copy_only=False)
        ds_ = t["dur_sum"].to_numpy(zero_copy_only=False)
        okn = np.maximum(fired - to, 1)
        return pa.table({
            "trigger": t["trigger"],
            "fired": t["fired"],
            "timeouts": t["timeouts"],
            "avg_duration_ms": pa.array(
                round_half_away(ds_ / okn, 2), type=pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def feature_dedup(docs: rd.Dataset) -> pa.Table:
    """D4: feature-name dedup — one row per distinct API feature, keyed
    by its content hash (mega_features' ``sha256(full_name)`` unique
    constraint, ``2_mega_vv8_postgres_schema.sql:70-78``).  Combiner
    shape: per-batch distinct + partial counts, tiny final groupby; the
    sha runs only over the deduped result rows."""
    import hashlib as _hl

    from ..functions.util import two_phase_agg

    # per-batch distinct (feature, mode) pairs with partial usage
    # counts — COUNT DISTINCT decomposes exactly as pair-distinct
    # then a per-feature pair count (the A9 pattern)
    exploded = docs.map_batches(
        lambda b: explode_usage_batch(b).select(["feature", "mode", "offset"]),
        batch_format="pyarrow")
    pairs = two_phase_agg(
        exploded, ["feature", "mode"], [("offset", "count")],
        ["feature", "mode", "pair_usages"]).to_pandas()
    agg = pairs.groupby("feature").agg(
        n_modes=("mode", "size"),
        n_usages=("pair_usages", "sum")).reset_index()
    agg["feature_sha"] = [
        _hl.sha256(f.encode()).hexdigest()[:16] for f in agg["feature"]]
    agg["n_modes"] = agg["n_modes"].astype("int64")
    agg["n_usages"] = agg["n_usages"].astype("int64")
    return agg[["feature_sha", "feature", "n_modes", "n_usages"]].sort_values(
        "feature").reset_index(drop=True)


def instance_dedup(docs: rd.Dataset) -> pa.Table:
    """D5: instance dedup — one row per distinct (script, document)
    instance with a composite instance hash (mega_instances'
    ``instance_hash = H(oid+sha2+...)`` unique constraint,
    ``2_mega_vv8_postgres_schema.sql:46-56``); usage rows collapse onto
    their instance with a count.  Hashes run over the deduped result."""
    import hashlib as _hl

    def partial(batch: pa.Table) -> pa.Table:
        # block-local aggregation is EXACT here: the key embeds doc_id
        # and a doc's spans never split across blocks (docs are whole
        # rows), so no global groupby/shuffle is needed at any scale
        u = explode_usage_batch(batch)
        u = u.filter(pc.not_equal(u["script_sha"], ""))
        g = u.group_by(["script_sha", "doc_id"]).aggregate(
            [("offset", "count")])
        return g.rename_columns(["script_sha", "doc_id", "n_usages"])

    agg = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    # guard the documented unique constraint even if an input ever
    # carries a doc_id twice (retry re-emission, multi-source union):
    # merge the (rare) cross-batch duplicates on the collected result
    agg = agg.groupby(["script_sha", "doc_id"], as_index=False)[
        "n_usages"].sum()
    agg["instance_hash"] = [
        _hl.sha256(f"{s}:{d}".encode()).hexdigest()[:16]
        for s, d in zip(agg["script_sha"], agg["doc_id"])]
    agg["n_usages"] = agg["n_usages"].astype("int64")
    return agg[["instance_hash", "script_sha", "doc_id", "n_usages"]] \
        .sort_values(["script_sha", "doc_id"]).reset_index(drop=True)


def span_kind_transitions(docs: rd.Dataset) -> rd.Dataset:
    """Order-sensitive span-sequence profile: counts of adjacent
    (kind -> next_kind) transitions within each doc's span list — a
    direct probe of the interleaved-document invariant (spans are
    stored in trace order; a shuffled or re-sorted spans column changes
    this table).  Flat kinds + parent indices, adjacency masked at doc
    boundaries, two-phase combiner over a |kinds|² key set."""
    from ..functions.util import two_phase_agg

    def partial(batch: pa.Table) -> pa.Table:
        spans, _ = _spans_of(batch)
        flat = spans.flatten()
        kinds = flat.field("kind")
        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        m = len(parent) - 1
        if m < 1:
            return pa.table({"kind": pa.array([], type=pa.string()),
                             "next_kind": pa.array([], type=pa.string()),
                             "o": pa.array([], type=pa.int64())})
        adj = pa.array(parent[:-1] == parent[1:])
        return pa.table({
            "kind": kinds.slice(0, m).filter(adj),
            "next_kind": kinds.slice(1, m).filter(adj),
            "o": pa.nulls(int(pc.sum(adj).as_py() or 0), type=pa.int64()),
        })

    return two_phase_agg(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["kind", "next_kind"], [("o", "count")], ["kind", "next_kind", "n"])


def media_text_ratio(docs: rd.Dataset) -> rd.Dataset:
    """Per-doc interleave profile: text-span vs media-span counts and
    the media fraction — the payload-mix statistic a multimodal
    curation pass filters on.  Pure per-doc map (no shuffle)."""

    def fn(batch: pa.Table) -> pa.Table:
        spans, doc_ids = _spans_of(batch)
        flat = spans.flatten()
        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        is_media = pc.starts_with(flat.field("kind"), "media/") \
            .to_numpy(zero_copy_only=False)
        n_docs = batch.num_rows
        n_media = np.bincount(parent[is_media], minlength=n_docs) \
            .astype(np.int64)
        n_total = np.bincount(parent, minlength=n_docs).astype(np.int64)
        n_text = n_total - n_media
        ratio = round_half_away(
            n_media * 1.0 / np.maximum(n_total, 1), 4)
        return pa.table({
            "doc_id": doc_ids,
            "n_text_spans": pa.array(n_text),
            "n_media_spans": pa.array(n_media),
            "media_frac": pa.array(ratio, type=pa.float64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


def caption_pairs(docs: rd.Dataset) -> rd.Dataset:
    """Media-text pair extraction over the interleaved spans: for every
    media span, the nearest PRECEDING non-media span in trace order —
    the (image, caption-context) pairs a multimodal training set is
    built from (the reference stores exactly this adjacency when it
    interleaves screenshot/HAR artifacts into the per-URL trace,
    vv8_worker/tasks.py:184-264).

    Same segment trick as :func:`_ffill_script_index`: running max of
    non-media positions vs running max of doc starts — a candidate
    caption binds iff it is newer than its doc's first span.  Pure
    per-doc map (docs are whole rows), no shuffle at any scale.
    Emits (doc_id, media_ref, media_kind, caption, caption_kind, gap);
    gap = offset distance, -1 when the doc opens with media.
    """

    def fn(batch: pa.Table) -> pa.Table:
        spans, doc_ids = _spans_of(batch)
        flat = spans.flatten()
        kinds = flat.field("kind")
        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        n = len(parent)
        is_media = pc.starts_with(kinds, "media/") \
            .to_numpy(zero_copy_only=False)
        ar = np.arange(n, dtype=np.int64)
        starts = np.ones(n, dtype=bool)
        if n:
            starts[1:] = parent[1:] != parent[:-1]
        last_text = np.maximum.accumulate(np.where(~is_media, ar, -1))
        doc_start = np.maximum.accumulate(np.where(starts, ar, -1))
        bound = np.where(last_text >= doc_start, last_text, -1)

        mi = ar[is_media]
        cap = bound[is_media]
        has = cap >= 0
        texts = flat.field("text")
        offs = flat.field("offset").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # take() with -1 would wrap; point missing rows at 0 and blank
        # them after (vectorized, no row loop)
        safe = np.where(has, cap, 0)
        caption = texts.take(pa.array(safe))
        caption_kind = kinds.take(pa.array(safe))
        blank = pa.array(~has)
        empty = pa.nulls(len(mi), type=pa.string()).fill_null("")
        gap = np.where(has, offs[mi] - offs[safe], -1)
        return pa.table({
            "doc_id": doc_ids.take(pa.array(parent[is_media])),
            "media_ref": flat.field("media_ref").take(pa.array(mi)),
            "media_kind": kinds.take(pa.array(mi)),
            "caption": pc.if_else(blank, empty, caption),
            "caption_kind": pc.if_else(blank, empty, caption_kind),
            "gap": pa.array(gap, type=pa.int64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


def reconstruct_text(docs: rd.Dataset) -> rd.Dataset:
    """Interleaved doc -> one training-text string per doc: text spans
    joined in trace order with media spans replaced by a
    ``<|media/kind|>`` placeholder token — the render step that turns
    the span table back into model input (the inverse of the
    reference's per-URL artifact bundling).

    All C kernels: one element-wise CASE over the flat span column,
    the list structure rebuilt zero-copy from the original offsets,
    one ``binary_join`` per doc.  Pure per-doc map, no shuffle.
    """

    def fn(batch: pa.Table) -> pa.Table:
        spans, doc_ids = _spans_of(batch)
        flat = spans.flatten()
        kinds = flat.field("kind")
        is_media = pc.starts_with(kinds, "media/")
        placeholder = pc.binary_join_element_wise(
            pa.scalar("<|"), kinds, pa.scalar("|>"), pa.scalar(""))
        merged = pc.if_else(is_media, placeholder, flat.field("text"))
        if isinstance(merged, pa.ChunkedArray):
            merged = merged.combine_chunks()
        # offsets rebuilt from value lengths: aligned with flatten()
        # even if the list array arrives sliced (spans.offsets is not)
        lens = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
        offsets = np.zeros(len(lens) + 1, dtype=np.int32)
        np.cumsum(lens, out=offsets[1:])
        lists = pa.ListArray.from_arrays(pa.array(offsets), merged)
        return pa.table({
            "doc_id": doc_ids,
            "doc_text": pc.binary_join(lists, " "),
            "n_spans": pc.list_value_length(spans).cast(pa.int64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


def api_kgrams(docs: rd.Dataset, k: int = 3, top: int = 30) -> pd.DataFrame:
    """API-sequence mining: the corpus' most frequent ``k``-grams of
    consecutive span KINDS within a doc's trace — the sequential
    fingerprint tracker/anomaly classifiers consume on top of the bag
    of per-feature counts (script_classification extracts bag features;
    the sequence view is the interleaved-trace extension).

    Per block: flat kinds + parent indices, ``k-1`` vectorized shifts
    masked at doc boundaries, one string join, block-local counts —
    a kgram-vocabulary-sized partial, never span-sized.  Deterministic
    total order (n DESC, kgram ASC) makes the top-``top`` boundary
    exact against the export-based DuckDB twin."""

    def partial(batch: pa.Table) -> pa.Table:
        spans, _ = _spans_of(batch)
        flat = spans.flatten()
        kinds = flat.field("kind").to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(spans).to_numpy(
            zero_copy_only=False)
        empty = pa.table({"kgram": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64())})
        m = len(parent) - (k - 1)
        if m < 1:
            return empty
        same_doc = parent[: m] == parent[k - 1:]
        if not same_doc.any():
            return empty
        g = kinds[:m].astype(object)
        for j in range(1, k):
            g = g + ">" + kinds[j: m + j]
        g = g[same_doc]
        uniq, counts = np.unique(g, return_counts=True)
        return pa.table({
            "kgram": pa.array(list(uniq), type=pa.string()),
            "n": pa.array(counts.astype(np.int64)),
        })

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({"kgram": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    agg = parts.groupby("kgram", as_index=False)["n"].sum()
    agg = agg.sort_values(["n", "kgram"],
                          ascending=[False, True]).head(top)
    return agg.reset_index(drop=True)


def crawl_host_quality(docs: rd.Dataset, log: rd.Dataset) -> pd.DataFrame:
    """Per-host training-text rollup over the CRAWL corpus: reconstruct
    each interleaved doc (media spans -> placeholder tokens), count its
    whitespace tokens and media placeholders, and roll both up per host
    with the doc->host dimension from the crawl log — the bridge from
    the crawl store to the training-data curation ops (which host
    contributes how much text, at what media density).

    Scale shape: reconstruction + counting is one streaming pass (RE2
    kernels on the rendered text, identical to the export-based twin);
    the doc->host map broadcasts as SORTED parallel arrays with a
    vectorized searchsorted probe (at crawl scale, swap for a
    hash-partitioned join on doc_id — the dedup_minhash co-group
    shape); per-host partials are integer sketches, mean is ONE IEEE
    division of identical ints."""
    import ray

    from ..functions.util import empty_frame

    empty = empty_frame({"host": "object", "n_docs": "int64",
                         "sum_tokens": "int64", "sum_media": "int64",
                         "mean_tokens": "float64"})
    if log is None:
        return empty
    ldf = log.select_columns(["doc_id", "host"]).to_pandas()
    if len(ldf) == 0:
        return empty
    order = np.argsort(ldf["doc_id"].to_numpy())
    keys = ldf["doc_id"].to_numpy()[order]
    hosts = ldf["host"].to_numpy()[order]
    map_ref = ray.put((keys, hosts))

    def stats(t: pa.Table) -> pa.Table:
        keys, hosts = ray.get(map_ref)
        text = t["doc_text"]
        n_tok = pc.count_substring_regex(text, r"\S+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_media = pc.count_substring_regex(
            text, r"<\|media/[a-z]+\|>").to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, ids)
        pos = np.minimum(pos, len(keys) - 1)
        hit = keys[pos] == ids
        h = hosts[pos]
        codes, uniq = pd.factorize(h[hit])
        nd = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        st = np.zeros(len(uniq), dtype=np.int64)
        sm = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(st, codes, n_tok[hit])
        np.add.at(sm, codes, n_media[hit])
        return pa.table({
            "host": pa.array(uniq, type=pa.string()),
            "n_docs": pa.array(nd),
            "sum_tokens": pa.array(st),
            "sum_media": pa.array(sm),
        })

    parts = reconstruct_text(docs).map_batches(
        stats, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("host", as_index=False).agg(
        n_docs=("n_docs", "sum"), sum_tokens=("sum_tokens", "sum"),
        sum_media=("sum_media", "sum"))
    agg["mean_tokens"] = agg["sum_tokens"] / (agg["n_docs"] * 1.0)
    return agg.sort_values("host").reset_index(drop=True)


def link_stats(docs: rd.Dataset) -> rd.Dataset:
    """Per-doc outlink profile over the interleaved trace: total links,
    distinct link URLs, and offsite links (target host != the page's
    origin host) — the fan-out statistics a frontier scheduler
    prioritizes by (SURVEY §4.2 frontier expansion; the reference's
    crawler collects exactly these hrefs before enqueueing,
    crawler.js:556-622).

    Pure per-doc map, no shuffle at any scale: docs are whole rows, the
    origin host comes from the doc's own ``origin`` span and the link
    hosts from one vectorized RE2 extract over the flat span text."""
    host_re = r"^[a-z]+://([^/]+)"

    def fn(batch: pa.Table) -> pa.Table:
        spans, doc_ids = _spans_of(batch)
        flat = spans.flatten()
        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        kind = flat.field("kind")
        text = flat.field("text")
        n_docs = batch.num_rows
        is_origin = pc.equal(kind, "origin").to_numpy(zero_copy_only=False)
        o_host = pc.replace_substring_regex(
            text.filter(pa.array(is_origin)), host_re + r".*$", r"\1"
        ).to_numpy(zero_copy_only=False)
        page_host = np.full(n_docs, "", dtype=object)
        # first origin span wins (reverse assignment keeps the first)
        op = parent[is_origin]
        page_host[op[::-1]] = o_host[::-1]
        is_link = pc.equal(kind, "link").to_numpy(zero_copy_only=False)
        lp = parent[is_link]
        lurls = text.filter(pa.array(is_link))
        lhost = pc.replace_substring_regex(
            lurls, host_re + r".*$", r"\1").to_numpy(zero_copy_only=False)
        n_links = np.bincount(lp, minlength=n_docs).astype(np.int64)
        dd = pd.DataFrame({
            "p": lp, "u": lurls.to_numpy(zero_copy_only=False)
        }).drop_duplicates()
        n_distinct = np.zeros(n_docs, dtype=np.int64)
        if len(dd):
            np.add.at(n_distinct, dd["p"].to_numpy(), 1)
        offsite = lhost != np.asarray(page_host, dtype=object)[lp]
        n_offsite = np.zeros(n_docs, dtype=np.int64)
        if len(lp):
            np.add.at(n_offsite, lp[offsite], 1)
        return pa.table({
            "doc_id": doc_ids,
            "page_host": pa.array(page_host, type=pa.string()),
            "n_links": pa.array(n_links),
            "n_distinct_links": pa.array(n_distinct),
            "n_offsite": pa.array(n_offsite),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# page_captcha_systems: the [VPC-specific] per-page detected-captcha-set
# accounting (vv8_backend_database/init/1_postgres_schema.sql:160-166 —
# page/logfile/{set-of-detected-captchas} JSONB records; the detection
# itself lives in the reference's Go post-processor, keyed off the
# fingerprinting/biometric API families its classifier inspects,
# script_classification/.../classify.py:184-248)

#: system -> usage-span API prefixes that mark it (alphabetical order —
#: the JSON set is emitted sorted on both engines)
CAPTCHA_SYSTEMS = (
    ("audio_challenge", ("AudioContext.",)),
    ("canvas_fingerprint", ("CanvasRenderingContext2D.",
                            "HTMLCanvasElement.")),
    ("keystroke_biometric", ("KeyboardEvent.",)),
    ("pointer_biometric", ("MouseEvent.",)),
    ("touch_biometric", ("TouchEvent.",)),
    ("webgl_fingerprint", ("WebGLRenderingContext.",)),
)
# usage-span kinds: the existing module-level _USAGE_KINDS dict
# (kind -> mode char) is the single source of truth; iterate its keys


def _captcha_json_lut() -> list[str]:
    """All 2^|systems| detected-set JSON strings, indexed by bitmask —
    the per-doc string build is ONE vectorized array take."""
    import json

    names = [n for n, _ in CAPTCHA_SYSTEMS]
    out = []
    for mask in range(1 << len(names)):
        sel = [n for i, n in enumerate(names) if mask >> i & 1]
        out.append(json.dumps(sel, separators=(",", ":")))
    return out


def page_captcha_systems(docs: rd.Dataset) -> rd.Dataset:
    """docs -> (doc_id, captcha_systems JSON array, n_systems) for every
    page with >= 1 detected system.

    Scale shape: a doc's spans live in its own row, so detection is
    row-local — one streaming map_batches, zero shuffle (exactly like
    the reference's per-logfile post-processor pass).  The per-system
    match is a prefix test over the exploded usage spans; the JSON set
    string is a 2^6-entry LUT take."""
    lut = pa.array(_captcha_json_lut(), type=pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        sp = explode_spans_batch(batch)
        keep = pc.is_in(sp["kind"], value_set=pa.array(list(_USAGE_KINDS)))
        sp = sp.filter(keep)
        # parent doc index of each usage span (doc_ids unique per batch)
        doc_ids = batch["doc_id"]
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        parent = pc.index_in(sp["doc_id"], value_set=doc_ids) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        text = sp["text"]
        mask = np.zeros(n_docs, dtype=np.int64)
        for bit, (_name, prefixes) in enumerate(CAPTCHA_SYSTEMS):
            hit = np.zeros(len(parent), dtype=bool)
            for p in prefixes:
                hit |= pc.starts_with(text, p) \
                    .to_numpy(zero_copy_only=False)
            flags = np.zeros(n_docs, dtype=bool)
            if hit.any():
                flags[np.unique(parent[hit])] = True
            mask |= flags.astype(np.int64) << bit
        det = mask > 0
        n_sys = np.array([bin(m).count("1") for m in mask])[det]
        return pa.table({
            "doc_id": doc_ids.filter(pa.array(det)),
            "captcha_systems": lut.take(pa.array(mask[det])),
            "n_systems": pa.array(n_sys.astype(np.int64)),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


def page_captcha_systems_sql(sp_cte: str) -> str:
    """DuckDB twin generated from the same CAPTCHA_SYSTEMS constants."""
    flags, names = [], []
    for i, (name, prefixes) in enumerate(CAPTCHA_SYSTEMS):
        cond = " OR ".join(f"starts_with(text, '{p}')" for p in prefixes)
        flags.append(f"max(CASE WHEN {cond} THEN 1 ELSE 0 END) AS s{i}")
        names.append(f"CASE WHEN s{i} = 1 THEN '\"{name}\"' END")
    total = " + ".join(f"s{i}" for i in range(len(CAPTCHA_SYSTEMS)))
    return f"""
        WITH sp AS {sp_cte},
        u AS (SELECT doc_id, text FROM sp
              WHERE kind IN ('get', 'set', 'call', 'new')),
        d AS (SELECT doc_id, {', '.join(flags)} FROM u GROUP BY doc_id)
        SELECT doc_id,
               '[' || concat_ws(',', {', '.join(names)}) || ']'
                   AS captcha_systems,
               CAST({total} AS BIGINT) AS n_systems
        FROM d WHERE {total} >= 1"""


def host_boilerplate_spans(docs: rd.Dataset, log: rd.Dataset,
                           min_pages: int = 3, num: int = 1,
                           den: int = 2) -> pd.DataFrame:
    """Template-span (boilerplate) detection over the CRAWL corpus:
    text spans whose rendered content appears on at least ``num/den``
    of a host's pages (hosts with >= ``min_pages`` pages) — the
    nav-bar/footer/banner signal a pretraining cleaner strips before
    packing (the host-level sibling of the C4 paragraph dedup the
    documents family implements; reference analog: the per-site
    template scripts the classifier down-weights,
    script_classification/heuristics/production_classifier.py).

    Scale shape: docs are whole rows, so a block-local DISTINCT
    (doc_id, span_key) is globally distinct — per-block partial counts
    per (host, span_key) and per host are EXACT partials, and the only
    exchange is the two-phase combine on those keys (span-vocabulary
    sized, no text).  The doc->host dimension broadcasts sorted (the
    crawl_host_quality idiom; above broadcast scale: hash-partition
    join on doc_id).  The share test is integer cross-multiplication,
    so the DuckDB twin agrees exactly."""
    import ray

    from ..functions.util import (digest_hex_dict, empty_frame,
                                  two_phase_agg)

    empty = empty_frame({"host": "object", "span_key": "object",
                         "n_pages": "int64", "host_pages": "int64"})
    if log is None:
        return empty
    ldf = log.select_columns(["doc_id", "host"]).to_pandas()
    if len(ldf) == 0:
        return empty
    order = np.argsort(ldf["doc_id"].to_numpy())
    map_ref = ray.put((ldf["doc_id"].to_numpy()[order],
                       ldf["host"].to_numpy()[order]))

    def partials(batch: pa.Table) -> pa.Table:
        keys, hosts = ray.get(map_ref)
        spans, doc_ids = _spans_of(batch)
        flat = spans.flatten()
        parent = pc.list_parent_indices(spans).to_numpy(
            zero_copy_only=False)
        keep = np.flatnonzero(
            ~pc.starts_with(flat.field("kind"), "media/").to_numpy(
                zero_copy_only=False))
        if len(keep) == 0:
            return pa.table({"host": pa.array([], type=pa.string()),
                             "span_key": pa.array([], type=pa.string()),
                             "n_pages": pa.array([], type=pa.int64())})
        skey = digest_hex_dict(flat.field("text").take(pa.array(keep)))
        sdoc = doc_ids.take(pa.array(parent[keep]))
        # block-local DISTINCT (doc, key) == global (docs are rows)
        d = pa.table({"doc": sdoc, "span_key": skey}) \
            .group_by(["doc", "span_key"]).aggregate([])
        pos = np.searchsorted(keys,
                              d["doc"].to_numpy(zero_copy_only=False))
        pos = np.minimum(pos, max(len(keys) - 1, 0))
        hit = keys[pos] == d["doc"].to_numpy(zero_copy_only=False)
        sub = d.filter(pa.array(hit))
        h = pa.array(hosts[pos[hit]], type=pa.string())
        return pa.table({"host": h, "span_key": sub["span_key"]}) \
            .group_by(["host", "span_key"]) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["host", "span_key", "n_pages"])

    cnt = two_phase_agg(
        docs.map_batches(partials, batch_format="pyarrow"),
        ["host", "span_key"], [("n_pages", "sum")],
        ["host", "span_key", "n_pages"]).to_pandas()
    if cnt.empty:
        return empty

    def host_pages(batch: pa.Table) -> pa.Table:
        keys, hosts = ray.get(map_ref)
        spans, doc_ids = _spans_of(batch)
        # docs that contribute >= 1 text span (the twin's tx source)
        flat = spans.flatten()
        parent = pc.list_parent_indices(spans).to_numpy(
            zero_copy_only=False)
        is_text = ~pc.starts_with(flat.field("kind"), "media/") \
            .to_numpy(zero_copy_only=False)
        has_text = np.zeros(batch.num_rows, dtype=bool)
        has_text[np.unique(parent[is_text])] = True
        ids = doc_ids.to_numpy(zero_copy_only=False)[has_text]
        pos = np.searchsorted(keys, ids)
        pos = np.minimum(pos, max(len(keys) - 1, 0))
        hit = keys[pos] == ids
        codes, uniq = pd.factorize(hosts[pos[hit]])
        return pa.table({
            "host": pa.array(uniq, type=pa.string()),
            "host_pages": pa.array(
                np.bincount(codes, minlength=len(uniq)).astype(np.int64)),
        })

    hp = two_phase_agg(
        docs.map_batches(host_pages, batch_format="pyarrow"),
        ["host"], [("host_pages", "sum")],
        ["host", "host_pages"]).to_pandas()
    m = cnt.merge(hp, on="host")
    m = m[(m["host_pages"] >= min_pages)
          & (den * m["n_pages"] >= num * m["host_pages"])]
    return m.sort_values(["host", "span_key"]).reset_index(drop=True) \
        .astype({"n_pages": "int64", "host_pages": "int64"})


def host_boilerplate_spans_sql(export_path: str, log_path: str,
                               min_pages: int = 3, num: int = 1,
                               den: int = 2) -> str:
    return f"""
        WITH sp AS (SELECT doc_id, unnest(spans, recursive := true)
                    FROM read_parquet('{export_path}')),
        tx AS (SELECT DISTINCT doc_id, md5(text) AS span_key
               FROM sp WHERE kind NOT LIKE 'media/%'),
        j AS (SELECT t.doc_id, t.span_key, l.host
              FROM tx t JOIN read_parquet('{log_path}') l USING (doc_id)),
        hp AS (SELECT host, count(DISTINCT doc_id) AS host_pages
               FROM j GROUP BY host),
        c AS (SELECT host, span_key, count(*) AS n_pages
              FROM j GROUP BY host, span_key)
        SELECT c.host, c.span_key, CAST(c.n_pages AS BIGINT) AS n_pages,
               CAST(hp.host_pages AS BIGINT) AS host_pages
        FROM c JOIN hp USING (host)
        WHERE hp.host_pages >= {min_pages}
          AND {den} * c.n_pages >= {num} * hp.host_pages
        ORDER BY host, span_key"""


def strip_boilerplate(docs: rd.Dataset, log: rd.Dataset,
                      min_pages: int = 3, num: int = 1,
                      den: int = 2,
                      bp: pd.DataFrame | None = None) -> pd.DataFrame:
    """Boilerplate removal over the crawl corpus: drop every text span
    flagged by :func:`host_boilerplate_spans` (same params) from its
    host's pages and report the per-doc cleaning profile — the second
    half of the template-cleaning pass (detect -> strip) a pretraining
    pipeline runs before packing.

    Token accounting is PER SPAN (each span's whitespace-token count,
    media spans = 1 placeholder token) summed per doc — identical on
    both engines because the render joins spans with ' ' so tokens
    never merge across span boundaries.  Docs without spans emit no
    row (the twin's GROUP BY can't see them); docs without a log row
    keep all their spans (no host, no template set).

    Scale shape: the boilerplate set is host-sized x template-sized
    (tiny — it only contains spans repeated across >= num/den of a
    host's pages) and broadcasts as per-host key arrays probed with
    the ``pc.is_in`` C kernel (exact string membership — no composite
    strings, no hash identity beyond the md5 both engines share);
    cleaning is then a pure per-doc map — no shuffle beyond the
    detection pass itself.  Pass ``bp`` (a prior
    :func:`host_boilerplate_spans` result with the same params) to
    skip re-detection."""
    import ray

    from ..functions.util import digest_hex_dict, empty_frame

    if bp is None:
        bp = host_boilerplate_spans(docs, log, min_pages, num, den)
    empty = empty_frame({"doc_id": "object", "n_spans": "int64",
                         "n_removed": "int64", "n_tokens_clean": "int64"})
    if log is None:
        return empty
    ldf = log.select_columns(["doc_id", "host"]).to_pandas()
    if len(ldf) == 0:
        return empty
    order = np.argsort(ldf["doc_id"].to_numpy())
    map_ref = ray.put((ldf["doc_id"].to_numpy()[order],
                       ldf["host"].to_numpy()[order]))
    # per-host boilerplate key sets as arrow arrays: each batch probes
    # only the hosts it contains, with the vectorized is_in kernel
    bp_sets = {h: pa.array(g["span_key"].to_numpy(), type=pa.string())
               for h, g in bp.groupby("host")} if len(bp) else {}
    bp_ref = ray.put(bp_sets)

    def clean(batch: pa.Table) -> pa.Table:
        keys, hosts = ray.get(map_ref)
        bpk = ray.get(bp_ref)
        spans, doc_ids = _spans_of(batch)
        flat = spans.flatten()
        parent = pc.list_parent_indices(spans).to_numpy(
            zero_copy_only=False)
        n_docs = batch.num_rows
        n_spans = pc.list_value_length(spans).to_numpy(
            zero_copy_only=False).astype(np.int64)
        is_media = pc.starts_with(flat.field("kind"), "media/") \
            .to_numpy(zero_copy_only=False)
        # per-span token count: whitespace tokens, placeholder = 1
        tok = pc.count_substring_regex(flat.field("text"), r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        tok[is_media] = 1
        # host per span via the doc map
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
        n_removed = np.bincount(parent[removed],
                                minlength=n_docs).astype(np.int64)
        clean_tok = np.zeros(n_docs, dtype=np.int64)
        np.add.at(clean_tok, parent[~removed], tok[~removed])
        keep_docs = n_spans > 0   # the twin's GROUP BY can't see them
        return pa.table({
            "doc_id": doc_ids.filter(pa.array(keep_docs)),
            "n_spans": pa.array(n_spans[keep_docs]),
            "n_removed": pa.array(n_removed[keep_docs]),
            "n_tokens_clean": pa.array(clean_tok[keep_docs]),
        })

    out = docs.map_batches(clean, batch_format="pyarrow").to_pandas()
    if out.empty:
        return empty
    return out.sort_values("doc_id").reset_index(drop=True)


def strip_boilerplate_sql(export_path: str, log_path: str,
                          min_pages: int = 3, num: int = 1,
                          den: int = 2) -> str:
    bp = host_boilerplate_spans_sql(export_path, log_path,
                                    min_pages, num, den)
    return f"""
        WITH bp AS ({bp}),
        sp AS (SELECT doc_id, unnest(spans, recursive := true)
               FROM read_parquet('{export_path}')),
        e AS (SELECT s.doc_id, l.host,
                     s.kind LIKE 'media/%' AS is_media,
                     CASE WHEN s.kind LIKE 'media/%' THEN CAST(1 AS BIGINT)
                          ELSE CAST(len(regexp_extract_all(s.text,
                               '\\S+')) AS BIGINT) END AS tok,
                     md5(s.text) AS span_key
              FROM sp s LEFT JOIN read_parquet('{log_path}') l
                   USING (doc_id)),
        f AS (SELECT e.*,
                     (NOT e.is_media AND e.host IS NOT NULL
                      AND EXISTS (SELECT 1 FROM bp
                                  WHERE bp.host = e.host
                                    AND bp.span_key = e.span_key))
                         AS removed
              FROM e)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_removed,
               CAST(coalesce(sum(tok) FILTER (WHERE NOT removed), 0)
                   AS BIGINT) AS n_tokens_clean
        FROM f GROUP BY doc_id ORDER BY doc_id"""


def crawl_diff(docs_a: rd.Dataset, log_a: rd.Dataset,
               docs_b: rd.Dataset, log_b: rd.Dataset,
               n_buckets: int = 8) -> pd.DataFrame:
    """Recrawl delta report: per (host, change) counts comparing two
    crawl stores — ``removed`` (only in A), ``added`` (only in B),
    ``changed`` (both, rendered-text content differs), ``same`` — the
    accounting a recrawl scheduler and an incremental-corpus ingest
    both need (the incremental sibling of ``recrawl_due``; reference
    analog: the rerun/cache semantics of resubmitted URLs,
    backend endpoints/tasks.py:150-156).

    Content identity = md5 of the reconstructed training text (media
    spans as placeholders) — the same key crawl_to_corpus dedups on,
    so 'changed' means the TRAINING PAYLOAD changed, not just the
    trace bytes.

    Scale shape: two bucketed co-group exchanges, both on md5-mixed
    key hashes (no skew from key shape): (1) per side, attach each
    ok log row's (url_key, host) to its doc's content key by doc_id;
    (2) align the two sides on url_key and classify.  Per-bucket
    output is a (host, change) count partial; the driver adds
    |hosts| x 4 x |buckets| rows.  One url_key fetches at most once
    per run (the URL-seen contract), so the per-bucket align is 1:1."""
    from ..functions.util import digest_hex, empty_frame, md5_low64

    empty = empty_frame({"host": "object", "change": "object",
                         "n": "int64"})
    if docs_a is None or docs_b is None or log_a is None or log_b is None:
        return empty

    def _content(docs: rd.Dataset) -> rd.Dataset:
        return reconstruct_text(docs).map_batches(
            lambda t: pa.table({
                "doc_id": t["doc_id"],
                "content_key": digest_hex(t["doc_text"]),
            }), batch_format="pyarrow")

    def _tag(side: int, role: int):
        # role 0 = log row (url_key, host), 1 = content row
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            did = t["doc_id"]
            if isinstance(did, pa.ChunkedArray):
                did = did.combine_chunks()
            bucket = (md5_low64(did) % n_buckets).astype(np.int64)
            return pa.table({
                "doc_id": did,
                "url_key": t["url_key"] if role == 0
                else pa.array([""] * n, type=pa.string()),
                "host": t["host"] if role == 0
                else pa.array([""] * n, type=pa.string()),
                "content_key": t["content_key"] if role == 1
                else pa.array([""] * n, type=pa.string()),
                "role": pa.array(np.full(n, role, np.int8)),
                "bucket": pa.array(bucket),
            })
        return fn

    def _joined(docs: rd.Dataset, log: rd.Dataset) -> rd.Dataset:
        ok = log.map_batches(
            lambda t: t.filter(pc.equal(t["status"], "ok")).select(
                ["doc_id", "url_key", "host"]),
            batch_format="pyarrow")
        cols = ["doc_id", "url_key", "host", "content_key", "role",
                "bucket"]
        both = ok.map_batches(_tag(0, 0), batch_format="pyarrow") \
            .map_batches(lambda t: t.select(cols),
                         batch_format="pyarrow").union(
            _content(docs).map_batches(_tag(0, 1),
                                       batch_format="pyarrow")
            .map_batches(lambda t: t.select(cols),
                         batch_format="pyarrow"))

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            l = g[g["role"] == 0][["doc_id", "url_key", "host"]]
            c = g[g["role"] == 1][["doc_id", "content_key"]]
            m = l.merge(c, on="doc_id")
            return m[["url_key", "host", "content_key"]]

        return both.groupby("bucket").map_groups(
            merge, batch_format="pandas")

    def _retag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            uk = t["url_key"]
            if isinstance(uk, pa.ChunkedArray):
                uk = uk.combine_chunks()
            return pa.table({
                "url_key": uk,
                "host": t["host"],
                "content_key": t["content_key"],
                "side": pa.array(np.full(t.num_rows, side, np.int8)),
                "bucket": pa.array(
                    (md5_low64(uk) % n_buckets).astype(np.int64)),
            })
        return fn

    a = _joined(docs_a, log_a).map_batches(_retag(0),
                                           batch_format="pyarrow")
    b = _joined(docs_b, log_b).map_batches(_retag(1),
                                           batch_format="pyarrow")

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        ga = g[g["side"] == 0][["url_key", "host", "content_key"]]
        gb = g[g["side"] == 1][["url_key", "host", "content_key"]]
        m = ga.merge(gb, on="url_key", how="outer",
                     suffixes=("_a", "_b"), indicator=True)
        host = m["host_a"].where(m["host_a"].notna(), m["host_b"])
        change = np.where(
            m["_merge"] == "left_only", "removed",
            np.where(m["_merge"] == "right_only", "added",
                     np.where(m["content_key_a"] == m["content_key_b"],
                              "same", "changed")))
        out = pd.DataFrame({"host": host, "change": change})
        return out.groupby(["host", "change"], as_index=False).agg(
            n=("change", "size"))

    parts = a.union(b).groupby("bucket").map_groups(
        classify, batch_format="pandas").to_pandas()
    if parts.empty:
        return empty
    fin = parts.groupby(["host", "change"], as_index=False)["n"].sum()
    return fin.sort_values(["host", "change"]).reset_index(drop=True) \
        .astype({"n": "int64"})


def crawl_diff_sql(docs_a: str, log_a: str, docs_b: str,
                   log_b: str) -> str:
    def _side(docs: str, log: str, alias: str) -> str:
        return f"""
        r{alias} AS (SELECT doc_id,
                 string_agg(CASE WHEN kind LIKE 'media/%'
                                 THEN '<|' || kind || '|>'
                                 ELSE text END, ' '
                            ORDER BY "offset") AS doc_text
              FROM (SELECT doc_id, unnest(spans, recursive := true)
                    FROM read_parquet('{docs}')) GROUP BY doc_id),
        {alias} AS (SELECT l.url_key, l.host, md5(r{alias}.doc_text)
                        AS content_key
                    FROM read_parquet('{log}') l
                    JOIN r{alias} USING (doc_id)
                    WHERE l.status = 'ok')"""

    return f"""
        WITH {_side(docs_a, log_a, 'a')},
        {_side(docs_b, log_b, 'b')},
        j AS (SELECT coalesce(a.host, b.host) AS host,
                     CASE WHEN a.url_key IS NULL THEN 'added'
                          WHEN b.url_key IS NULL THEN 'removed'
                          WHEN a.content_key = b.content_key THEN 'same'
                          ELSE 'changed' END AS change
              FROM a FULL OUTER JOIN b ON a.url_key = b.url_key)
        SELECT host, change, CAST(count(*) AS BIGINT) AS n
        FROM j GROUP BY host, change ORDER BY host, change"""


def host_crawl_report(log: rd.Dataset) -> pd.DataFrame:
    """Per-host crawl operations report over the client ledger: status
    counts (ok / failed / robots_blocked / budget_exhausted), wave
    span and depth reach — the per-host accounting the reference's
    local sqlite ledger answers (scripts/local_data_store.py:27-48)
    and an operator reads to retune politeness budgets.

    Scale shape: every column is a decomposable aggregate (boolean
    sums, min/max), so ONE two-phase combine on host carries the whole
    report — no distinct-counting, no shuffle beyond the host-sized
    exchange."""
    from ..functions.util import empty_frame, two_phase_agg

    empty = empty_frame({"host": "object", "n_ok": "int64",
                         "n_failed": "int64", "n_robots_blocked": "int64",
                         "n_budget_exhausted": "int64",
                         "first_wave": "int64", "last_wave": "int64",
                         "max_depth": "int64"})
    if log is None:
        return empty

    def partial(t: pa.Table) -> pa.Table:
        st = t["status"].to_numpy(zero_copy_only=False)
        return pa.table({
            "host": t["host"],
            "n_ok": pa.array((st == "ok").astype(np.int64)),
            "n_failed": pa.array((st == "failed").astype(np.int64)),
            "n_robots_blocked": pa.array(
                (st == "robots_blocked").astype(np.int64)),
            "n_budget_exhausted": pa.array(
                (st == "budget_exhausted").astype(np.int64)),
            "wave_lo": t["wave"],
            "wave_hi": t["wave"],
            "depth": t["depth"],
        })

    keyed = log.map_batches(partial, batch_format="pyarrow")
    out = two_phase_agg(
        keyed, ["host"],
        [("n_ok", "sum"), ("n_failed", "sum"),
         ("n_robots_blocked", "sum"), ("n_budget_exhausted", "sum"),
         ("wave_lo", "min"), ("wave_hi", "max"), ("depth", "max")],
        ["host", "n_ok", "n_failed", "n_robots_blocked",
         "n_budget_exhausted", "first_wave", "last_wave", "max_depth"],
    ).to_pandas()
    if out.empty:
        return empty
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


def host_crawl_report_sql(log_path: str) -> str:
    return f"""
        SELECT host,
               sum(CASE WHEN status = 'ok' THEN 1 ELSE 0 END)
                   AS n_ok,
               sum(CASE WHEN status = 'failed' THEN 1 ELSE 0 END)
                   AS n_failed,
               sum(CASE WHEN status = 'robots_blocked' THEN 1 ELSE 0 END)
                   AS n_robots_blocked,
               sum(CASE WHEN status = 'budget_exhausted' THEN 1 ELSE 0
                   END) AS n_budget_exhausted,
               CAST(min(wave) AS BIGINT) AS first_wave,
               CAST(max(wave) AS BIGINT) AS last_wave,
               CAST(max(depth) AS BIGINT) AS max_depth
        FROM read_parquet('{log_path}')
        GROUP BY host ORDER BY host"""
