"""Deterministic synthetic video artifacts — the fourth media modality
of the interleaved-document contract (screenshot PNG, HAR, WAV audio,
and now a frame-container video capture).

No codec libraries exist in this sandbox, so the CONTAINER is the
repo's own length-prefixed frame concat (u32 frame count, then
u32-length-prefixed payloads — the ``pack_frames`` format
``pipelines/multimodal.py`` has always decoded); the FRAMES inside are
REAL RGB8 PNGs via the stdlib codec in :mod:`functions.png`, so the
video pipeline exercises genuine byte-level decode end to end
(container walk -> per-frame PNG inflate/unfilter).  A real decoder
(PyAV/ffmpeg) would replace only :func:`iter_frames`.

Reference parity: the reference captures one screenshot per page
(``crawler.js:878-884``); a frame-sequence capture is the natural
extension the brief's multimodal requirement asks for.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FRAME_W, FRAME_H = 8, 6


def _jfif_end(data: bytes, pos: int) -> int:
    """End offset (exclusive) of the JFIF frame starting at ``pos`` —
    a marker-aware walk (a naive FFD9 search can false-trigger on table
    payload bytes): skip length-prefixed segments to SOS, then scan the
    entropy stream for the first marker that is not byte-stuffing (00)
    or a restart (D0-D7)."""
    p = pos + 2
    while p + 4 <= len(data):
        if data[p] != 0xFF:
            return len(data)  # malformed: consume the rest
        m = data[p + 1]
        if m == 0xD9:
            return p + 2
        seglen = int.from_bytes(data[p + 2:p + 4], "big")
        if m != 0xDA:
            p += 2 + seglen
            continue
        q = p + 2 + seglen  # entropy-coded data
        while q + 1 < len(data):
            if data[q] == 0xFF and data[q + 1] != 0x00 and \
                    not (0xD0 <= data[q + 1] <= 0xD7):
                return q + 2 if data[q + 1] == 0xD9 else q
            q += 1
        return len(data)
    return len(data)


def encode_frames(frames: list[bytes]) -> bytes:
    """Container encode: u32-count header + u32-length-prefixed frame
    payloads (the one copy of the container format; multimodal's
    pack_frames/_iter_frames delegate here)."""
    out = [struct.pack(">I", len(frames))]
    for f in frames:
        out.append(struct.pack(">I", len(f)))
        out.append(f)
    return b"".join(out)


def iter_frames(payload: bytes):
    """Container decode: yields each frame's bytes.

    Two formats: the length-prefixed concat above, and RAW MJPEG
    (back-to-back JFIF frames, the classic motion-JPEG stream: detected
    by the leading SOI marker, split on SOI..EOI spans) — real-web
    video capture via the in-repo baseline JPEG codec
    (functions/jpeg.py)."""
    if payload[:2] == b"\xff\xd8":  # MJPEG: concatenated JFIF frames
        pos = 0
        while pos + 2 <= len(payload) and \
                payload[pos:pos + 2] == b"\xff\xd8":
            end = _jfif_end(payload, pos)
            yield payload[pos:end]
            pos = end
        return
    (n,) = struct.unpack_from(">I", payload, 0)
    pos = 4
    for _ in range(n):
        (ln,) = struct.unpack_from(">I", payload, pos)
        yield payload[pos + 4:pos + 4 + ln]
        pos += 4 + ln


def synth_video(doc_id: str) -> bytes:
    """Deterministic capture for one doc: 5-11 PNG frames whose pixels
    drift per frame (a moving gradient), all derived from md5(doc_id)
    — same idempotent-rewrite contract as synth_screenshot/synth_clip."""
    from .png import encode_png

    seed = hashlib.md5(doc_id.encode()).digest()
    n_frames = 5 + seed[0] % 7
    base = np.frombuffer(seed, dtype=np.uint8)[:3].astype(np.int64)
    yy, xx = np.mgrid[0:FRAME_H, 0:FRAME_W]
    frames = []
    for i in range(n_frames):
        px = np.empty((FRAME_H, FRAME_W, 3), dtype=np.uint8)
        for c in range(3):
            px[:, :, c] = ((base[c] + 7 * i + 11 * xx + 13 * yy
                            + c * 29) % 256).astype(np.uint8)
        frames.append(encode_png(px))
    return encode_frames(frames)
