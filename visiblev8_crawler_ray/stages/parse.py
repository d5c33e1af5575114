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
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_USAGE_KINDS = {"get": "g", "set": "s", "call": "c", "new": "n"}


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


def explode_usage_batch(batch: pa.Table) -> pa.Table:
    """docs -> usage facts (doc_id, script_sha, offset, feature, mode).

    Each g/s/c/n span is attributed to the nearest preceding script span
    — the eval/provenance attribution the reference's parser performs.
    """
    ex = explode_spans_batch(batch)
    kinds = ex.column("kind").to_numpy(zero_copy_only=False)
    texts = ex.column("text").to_numpy(zero_copy_only=False)
    doc_ids = ex.column("doc_id").to_numpy(zero_copy_only=False)
    offsets = ex.column("offset").to_numpy(zero_copy_only=False)

    is_script = kinds == "script"
    # forward-fill script sha within each doc (docs are contiguous in the
    # exploded table because list_parent_indices is monotone)
    script_sha = np.empty(len(kinds), dtype=object)
    sha_for_script = {
        i: hashlib.sha256(texts[i].encode()).hexdigest()[:16]
        for i in np.flatnonzero(is_script)
    }
    cur_doc, cur_sha = None, ""
    for i in range(len(kinds)):
        if doc_ids[i] != cur_doc:
            cur_doc, cur_sha = doc_ids[i], ""
        if is_script[i]:
            cur_sha = sha_for_script[i]
        script_sha[i] = cur_sha

    is_usage = np.isin(kinds, list(_USAGE_KINDS))
    mode = np.array([_USAGE_KINDS.get(k, "") for k in kinds], dtype=object)
    sel = np.flatnonzero(is_usage)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[sel], type=pa.string()),
            "script_sha": pa.array(script_sha[sel], type=pa.string()),
            "offset": pa.array(offsets[sel], type=pa.int32()),
            "feature": pa.array(texts[sel], type=pa.string()),
            "mode": pa.array(mode[sel], type=pa.string()),
        }
    )


def parse_scripts_batch(batch: pa.Table) -> pa.Table:
    """docs -> script records with ordered api traces (script_flow analog)."""
    spans, doc_ids = _spans_of(batch)
    out_doc, out_sha, out_code, out_apis = [], [], [], []
    for did, span_list in zip(doc_ids.to_pylist(), spans.to_pylist()):
        cur = None
        for s in span_list:
            if s["kind"] == "script":
                if cur is not None:
                    out_apis.append(cur["apis"])
                code = s["text"]
                cur = {"apis": []}
                out_doc.append(did)
                out_sha.append(hashlib.sha256(code.encode()).hexdigest()[:16])
                out_code.append(code)
            elif s["kind"] in _USAGE_KINDS and cur is not None:
                cur["apis"].append(s["text"])
        if cur is not None:
            out_apis.append(cur["apis"])
    return pa.table(
        {
            "doc_id": pa.array(out_doc, type=pa.string()),
            "script_sha": pa.array(out_sha, type=pa.string()),
            "code": pa.array(out_code, type=pa.string()),
            "apis": pa.array(out_apis, type=pa.list_(pa.string())),
        }
    )


def usage_rollup(docs: rd.Dataset) -> rd.Dataset:
    """A1 analog: count per (feature, mode) with per-batch partial
    aggregation before the small final groupby (combiner pattern)."""
    def partial(batch: pa.Table) -> pa.Table:
        u = explode_usage_batch(batch)
        df = u.group_by(["feature", "mode"]).aggregate([("offset", "count")])
        return df.rename_columns(["feature", "mode", "partial_count"])

    partials = docs.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    return partials.groupby(["feature", "mode"]).aggregate(
        Sum("partial_count", alias_name="n")
    )
