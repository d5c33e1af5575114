"""PNG codec completeness (VERDICT r4 "Next" #7): palette, alpha,
grayscale, Adam7 interlace, sub-byte and 16-bit depths — round-trip
through the stdlib-only encoder/decoder plus hand-built streams for
forms the encoder doesn't emit."""

import struct
import zlib

import numpy as np
import pytest

from visiblev8_crawler_ray.functions.png import (
    _chunk,
    _SIG,
    decode_png,
    encode_png,
    encode_png_gray,
    encode_png_palette,
    encode_png_rgba,
    synth_screenshot,
)


def _rand_img(h, w, c, seed):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, c) if c > 1 else (h, w), dtype=np.uint16
    ).astype(np.uint8)


def test_rgb_roundtrip_plain_and_adam7():
    px = _rand_img(23, 31, 3, 0)
    assert (decode_png(encode_png(px)) == px).all()
    assert (decode_png(encode_png(px, interlace=True)) == px).all()
    # degenerate sizes exercise empty Adam7 passes
    for h, w in [(1, 1), (2, 3), (7, 5), (8, 8), (9, 17)]:
        im = _rand_img(h, w, 3, h * 100 + w)
        assert (decode_png(encode_png(im, interlace=True)) == im).all(), \
            (h, w)


def test_palette_roundtrip():
    plte = _rand_img(16, 3, 1, 1).reshape(16, 3)
    idx = np.random.default_rng(2).integers(0, 16, size=(12, 9),
                                            dtype=np.uint8)
    got = decode_png(encode_png_palette(idx, plte))
    assert (got == plte[idx]).all()


def test_rgba_and_gray_alpha_drop_alpha():
    rgba = _rand_img(10, 14, 4, 3)
    assert (decode_png(encode_png_rgba(rgba)) == rgba[:, :, :3]).all()
    g = _rand_img(11, 7, 1, 4)
    a = _rand_img(11, 7, 1, 5)
    got = decode_png(encode_png_gray(g, alpha=a))
    assert (got == np.repeat(g[:, :, None], 3, axis=2)).all()
    got2 = decode_png(encode_png_gray(g))
    assert (got2 == np.repeat(g[:, :, None], 3, axis=2)).all()


def _hand_png(w, h, depth, ctype, scanlines: bytes,
              plte: np.ndarray | None = None,
              interlace: int = 0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(scanlines, 6))
    return out + _chunk(b"IEND", b"")


def test_subbyte_palette_depths():
    plte = np.arange(48, dtype=np.uint8).reshape(16, 3)
    # depth 4: 6 px/row -> 3 bytes; indices 1,2,3,4,5,6 then 7..12
    rows = bytes([0, 0x12, 0x34, 0x56]) + bytes([0, 0x78, 0x9A, 0xBC])
    got = decode_png(_hand_png(6, 2, 4, 3, rows, plte=plte))
    want_idx = np.array([[1, 2, 3, 4, 5, 6], [7, 8, 9, 10, 11, 12]])
    assert (got == plte[want_idx]).all()
    # depth 1: 5 px/row -> 1 byte, bits MSB-first: 10110 -> 0xB0
    plte2 = np.array([[0, 0, 0], [255, 10, 20]], dtype=np.uint8)
    got1 = decode_png(_hand_png(5, 1, 1, 3, bytes([0, 0b10110000]),
                                plte=plte2))
    assert (got1 == plte2[np.array([[1, 0, 1, 1, 0]])]).all()


def test_subbyte_grayscale_scales():
    # depth 2 gray, 4 px: values 0,1,2,3 -> 0b00011011 = 0x1B
    got = decode_png(_hand_png(4, 1, 2, 0, bytes([0, 0x1B])))
    want = (np.array([0, 1, 2, 3]) * 255 // 3).astype(np.uint8)
    assert (got[0, :, 0] == want).all()
    assert (got[:, :, 0] == got[:, :, 1]).all()


def test_16bit_high_byte():
    # 16-bit gray, 2 px: 0x1234 0xFF00 -> high bytes 0x12, 0xFF
    got = decode_png(_hand_png(2, 1, 16, 0,
                               bytes([0, 0x12, 0x34, 0xFF, 0x00])))
    assert list(got[0, :, 0]) == [0x12, 0xFF]
    # 16-bit RGB, 1 px
    got3 = decode_png(_hand_png(1, 1, 16, 2,
                                bytes([0, 1, 2, 3, 4, 5, 6])))
    assert list(got3[0, 0]) == [1, 3, 5]


def test_filters_on_interlaced_stream():
    """Adam7 with filter 2 (up) inside a pass: build pass bytes by
    hand for a 2x2 RGB image (passes 1,2,3 empty beyond bounds)."""
    px = np.array([[[10, 20, 30], [40, 50, 60]],
                   [[70, 80, 90], [15, 25, 35]]], dtype=np.uint8)
    # 2x2: pass 1 = (0,0); pass 6 = (1,0); pass 7 = row 1 (both cols)
    p1 = bytes([0]) + px[0, 0].tobytes()
    p6 = bytes([0]) + px[0, 1].tobytes()
    p7 = bytes([0]) + px[1].tobytes()
    got = decode_png(_hand_png(2, 2, 8, 2, p1 + p6 + p7, interlace=1))
    assert (got == px).all()


def test_decoder_rejects_out_of_scope():
    with pytest.raises(NotImplementedError):
        decode_png(_hand_png(1, 1, 8, 7, bytes([0, 1])))  # bad ctype
    with pytest.raises(NotImplementedError):
        decode_png(_hand_png(1, 1, 3, 0, bytes([0, 1])))  # bad depth


def test_synth_screenshot_still_roundtrips():
    for key in ["abc", "0123def", "x"]:
        img = synth_screenshot(key)
        assert (decode_png(encode_png(img)) == img).all()
        assert (decode_png(encode_png(img, interlace=True)) == img).all()


def test_media_dedup_collapses_alternate_png_forms(ray_session, tmp_path):
    """Content-level dedup must collapse the SAME pixels stored as
    plain RGB8, Adam7-interlaced RGB8, and palette PNG into one key."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from visiblev8_crawler_ray.pipelines.multimodal import media_dedup

    blob_dir = str(tmp_path / "blobs")
    plte = np.array([[9, 8, 7], [100, 110, 120], [200, 210, 220],
                     [1, 2, 3]], dtype=np.uint8)
    idx = np.random.default_rng(0).integers(0, 4, size=(9, 13),
                                            dtype=np.uint8)
    px = plte[idx]
    blobs = {
        "1/shot.png": encode_png(px),
        "2/shot.png": encode_png(px, interlace=True),
        "3/shot.png": encode_png_palette(idx, plte),
        "4/shot.png": encode_png(px[::-1]),  # different pixels
    }
    for rel, data in blobs.items():
        p = os.path.join(blob_dir, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)
    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()),
                        ("offset", pa.int32())])
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "spans": pa.array([[{"kind": "media/shot", "text": "",
                             "media_ref": f"blob://{d}/shot.png",
                             "offset": 0}] for d in (1, 2, 3, 4)],
                          type=pa.list_(span_t)),
    })
    out = media_dedup(rd.from_arrow(docs), blob_dir)
    assert len(out) == 2  # {1,2,3} collapse; {4} alone
    by_ref = out.set_index("keep_ref")
    assert by_ref.loc["blob://1/shot.png", "n_refs"] == 3
    assert by_ref.loc["blob://4/shot.png", "n_refs"] == 1
