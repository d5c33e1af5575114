"""Multimodal column plumbing: media spans -> decoded features.

The reference stores screenshots/HARs as opaque GridFS blobs referenced
from the per-URL Mongo doc (``vv8_worker/tasks.py:184-279``); here media
lives as ``media_ref`` strings inside the interleaved span column, and
decode/feature-extract runs as an actor-pool ``map_batches`` stage.

The image/audio libraries are not available in this container, so the
actual decode is STUBBED: when PIL is importable the real path would
run; otherwise a deterministic fake derives (width, height, n_bytes)
from the ref hash.  The Ray-side plumbing — schema, batch size, actor
signature, output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

try:  # pragma: no cover - not present in this sandbox
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


class MediaDecoder:
    """Actor-pool stage: decode media spans into typed features.

    One actor holds the (hypothetical) decoder state; batches should be
    small because media payloads are large (see module docstring in
    pipelines.crawl on block sizing for wide binary rows).
    """

    def __init__(self, allow_stub: bool = True):
        if not HAVE_PIL and not allow_stub:
            raise NotImplementedError(
                "real media decode needs PIL/libav — not in this container"
            )
        self.stub = not HAVE_PIL

    def _decode_stub(self, ref: str) -> tuple[int, int, int]:
        h = int.from_bytes(hashlib.md5(ref.encode()).digest()[:8], "big")
        return 320 + h % 1600, 240 + (h >> 16) % 900, 1024 + h % (1 << 20)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        dims = [self._decode_stub(r) for r in refs]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_ref": batch["media_ref"],
                "kind": batch["kind"],
                "width": pa.array([d[0] for d in dims], type=pa.int32()),
                "height": pa.array([d[1] for d in dims], type=pa.int32()),
                "n_bytes": pa.array([d[2] for d in dims], type=pa.int64()),
            }
        )


def media_features(docs: rd.Dataset) -> rd.Dataset:
    """docs -> one feature row per media span (screenshot/HAR)."""
    from ..stages.parse import explode_spans_batch

    media = docs.map_batches(explode_spans_batch, batch_format="pyarrow").map_batches(
        lambda t: t.filter(pc.starts_with(t["kind"], "media/")),
        batch_format="pyarrow",
    )
    return media.map_batches(
        MediaDecoder, batch_format="pyarrow", batch_size=1024,
        # autoscaling pool: decoder state (image/audio libs, models)
        # loads once per actor; width follows load instead of pinning 2
        concurrency=(2, max(2, int(ray.cluster_resources().get("CPU", 8)) // 2))
    )
