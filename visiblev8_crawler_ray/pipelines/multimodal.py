"""Multimodal column plumbing: media spans -> decoded features.

The reference stores screenshots/HARs as opaque GridFS blobs referenced
from the per-URL Mongo doc (``vv8_worker/tasks.py:184-279``); here media
lives as ``media_ref`` strings inside the interleaved span column, and
decode/feature-extract runs as an actor-pool ``map_batches`` stage.

Decode has two modes:

- **real** (``blob_dir`` given): reads each artifact's actual bytes and
  decodes PNGs with the stdlib codec in :mod:`..functions.png`
  (IHDR/IDAT parse + inflate + unfilter) — genuine byte-level image
  decode, no PIL needed; HAR artifacts parse as JSON.  PIL, when
  importable, would extend this to formats beyond RGB8 PNG.
- **stub** (no ``blob_dir``): a deterministic md5-derived fake — kept
  because the refs-only span stream (blob bytes not materialized) is
  the common crawl output, and because its DuckDB twin makes the whole
  explode→filter→actor-pool path SQL-checkable (``media_features``).
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

    def __init__(self, blob_dir: str | None = None, allow_stub: bool = True):
        if blob_dir is None and not allow_stub:
            raise NotImplementedError(
                "refs-only decode is a stub; pass blob_dir for real decode"
            )
        self.blob_dir = blob_dir

    def _decode_stub(self, ref: str) -> tuple[int, int, int]:
        h = int.from_bytes(hashlib.md5(ref.encode()).digest()[:8], "big")
        return 320 + h % 1600, 240 + (h >> 16) % 900, 1024 + h % (1 << 20)

    def _decode_real(self, ref: str) -> tuple[int, int, int]:
        """Parse the artifact's actual bytes (per-item by nature — a
        real decoder call — like the batched model inference in T3)."""
        import json
        import os

        from ..functions.png import decode_png

        path = os.path.join(self.blob_dir, ref[len("blob://"):])
        with open(path, "rb") as f:
            data = f.read()
        if path.endswith(".png"):
            try:
                img = decode_png(data)
                return img.shape[1], img.shape[0], len(data)
            except NotImplementedError:
                # beyond RGB8 (palette, alpha, interlace): PIL handles
                # it when present; otherwise surface the real gap
                if not HAVE_PIL:
                    raise
                import io

                from PIL import Image

                with Image.open(io.BytesIO(data)) as im:
                    return im.width, im.height, len(data)
        json.loads(data)  # HAR: validate, no intrinsic dims
        return 0, 0, len(data)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        dec = self._decode_real if self.blob_dir else self._decode_stub
        dims = [dec(r) for r in refs]
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


def media_features(docs: rd.Dataset,
                   blob_dir: str | None = None) -> rd.Dataset:
    """docs -> one feature row per media span (screenshot/HAR).

    With ``blob_dir`` the decode stage reads and parses each artifact's
    actual bytes (real PNG decode, stdlib codec); without it, the
    refs-only deterministic stub (SQL-checked)."""
    from ..stages.parse import explode_spans_batch

    media = docs.map_batches(explode_spans_batch, batch_format="pyarrow").map_batches(
        lambda t: t.filter(pc.starts_with(t["kind"], "media/")),
        batch_format="pyarrow",
    )
    return media.map_batches(
        MediaDecoder, fn_constructor_kwargs={"blob_dir": blob_dir},
        batch_format="pyarrow", batch_size=1024,
        # autoscaling pool: decoder state (image/audio libs, models)
        # loads once per actor; width follows load instead of pinning 2
        concurrency=(2, max(2, int(ray.cluster_resources().get("CPU", 8)) // 2))
    )
