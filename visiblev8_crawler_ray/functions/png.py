"""Minimal real PNG codec — stdlib ``zlib``/``struct``/numpy only.

The sandbox has no PIL/libav, but PNG itself needs nothing beyond
DEFLATE: this module writes genuine RGB8 PNGs (IHDR/IDAT/IEND, filter
type 0 per scanline) and decodes them back, so the multimodal pipeline
can run a REAL byte-level image decode (reference analog: the
screenshot artifacts GridFS-uploaded by ``vv8_worker/tasks.py:184-214``)
instead of a stub.  Scope: 8-bit RGB, filter 0 (what we emit) plus the
sub/up/average/paeth unfilters for robustness to other encoders.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    raw = tag + payload
    return struct.pack(">I", len(payload)) + raw + struct.pack(
        ">I", zlib.crc32(raw) & 0xFFFFFFFF)


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (RGB8, filter 0, one IDAT)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # RGB8
    # filter byte 0 prepended to every scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8),
         pixels.reshape(h, w * 3)], axis=1).tobytes()
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


#: bytes per pixel for the 8-bit color types this decoder accepts
_CTYPE_BPP = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8.  Supports every 8-bit color type
    (grayscale, RGB, palette, gray+alpha, RGBA — alpha dropped, palette
    resolved through PLTE), filters 0-4, no interlace.  16-bit depths
    and Adam7 interlace raise NotImplementedError (disclosed scope)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos, idat, w, plte = 8, [], None, None
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload)
            if depth != 8 or interlace != 0 or ctype not in _CTYPE_BPP:
                raise NotImplementedError(
                    f"only 8-bit non-interlaced (got depth={depth} "
                    f"ctype={ctype} interlace={interlace})")
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    bpp = _CTYPE_BPP[ctype]
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    raw = raw.reshape(h, stride + 1)
    filt, lines = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    for y in range(h):
        f, cur = filt[y], lines[y].copy()
        prior = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[y] = cur
        elif f == 2:  # up
            out[y] = (cur + prior) & 0xFF
        elif f in (1, 3, 4):  # sub / average / paeth need a left-scan
            row = out[y]
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                b = prior[x]
                if f == 1:
                    v = cur[x] + a
                elif f == 3:
                    v = cur[x] + ((a + b) >> 1)
                else:
                    c = prior[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                    v = cur[x] + pred
                row[x] = v & 0xFF
        else:
            raise NotImplementedError(f"filter {f}")
    px = out.astype(np.uint8).reshape(h, w, bpp)
    if ctype == 2:
        return px
    if ctype == 6:
        return np.ascontiguousarray(px[:, :, :3])  # drop alpha
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)  # gray, drop alpha
    if plte is None:
        raise ValueError("palette image without PLTE")
    return plte[px[:, :, 0]]


def synth_screenshot(doc_key: str) -> np.ndarray:
    """Deterministic small RGB image for a doc id: a gradient + hash
    stripe pattern so every byte of the decode is checkable."""
    h_seed = zlib.crc32(doc_key.encode())
    w = 48 + h_seed % 32          # 48..79
    h = 32 + (h_seed >> 8) % 16   # 32..47
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(1, w - 1)).astype(np.uint8)
    g = (yy * 255 // max(1, h - 1)).astype(np.uint8)
    b = ((xx ^ yy) + h_seed) % 256
    return np.stack([r, g, b.astype(np.uint8)], axis=2)
