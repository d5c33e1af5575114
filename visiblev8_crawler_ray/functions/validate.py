"""Interleaved-document invariant checks (the per-row contract).

The driver's input-hint invariant: within every row, span ``offset`` is
strictly increasing from 0, ``kind`` is one of SPAN_KINDS, text spans
carry no media_ref and media spans carry no text.  ``validate_docs``
runs the check distributed (map_batches) and returns per-block
violation counts — cheap enough to leave on in pipelines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..schemas import SPAN_KINDS


def validate_docs_batch(batch: pa.Table) -> pa.Table:
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    offs = flat.field("offset").to_numpy(zero_copy_only=False)
    kinds = flat.field("kind").to_numpy(zero_copy_only=False)
    texts = flat.field("text").to_numpy(zero_copy_only=False)
    medias = flat.field("media_ref").to_numpy(zero_copy_only=False)

    # offsets strictly increasing per row == offset equals rank within row
    lens = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    starts = np.repeat(np.cumsum(lens) - lens, lens)
    expect = np.arange(len(offs)) - starts
    bad_offset = int((offs != expect).sum())

    bad_kind = int((~np.isin(kinds, list(SPAN_KINDS))).sum())
    is_media = np.char.startswith(kinds.astype(str), "media/")
    bad_media = int(((medias == "") & is_media).sum()
                    + ((medias != "") & ~is_media).sum())
    return pa.table(
        {
            "rows": pa.array([batch.num_rows], type=pa.int64()),
            "bad_offset": pa.array([bad_offset], type=pa.int64()),
            "bad_kind": pa.array([bad_kind], type=pa.int64()),
            "bad_media": pa.array([bad_media], type=pa.int64()),
        }
    )


def validate_docs(docs: rd.Dataset) -> dict[str, int]:
    out = docs.map_batches(validate_docs_batch, batch_format="pyarrow").to_pandas()
    return {c: int(out[c].sum()) for c in out.columns}
