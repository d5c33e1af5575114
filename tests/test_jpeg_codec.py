"""Baseline-JPEG codec (VERDICT r3 #10): real byte-level encode/decode
behind the MediaDecoder seam — round-trip fidelity, format plumbing,
and the media_features path over .jpg blobs."""

import numpy as np
import pyarrow as pa
import pytest

from visiblev8_crawler_ray.functions.jpeg import decode_jpeg, encode_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_jpeg_roundtrip_fidelity():
    from visiblev8_crawler_ray.functions.png import synth_screenshot

    for key in ("doc-a", "doc-b", "doc-c"):
        img = synth_screenshot(key)
        out = decode_jpeg(encode_jpeg(img, quality=90))
        assert out.shape == img.shape and out.dtype == np.uint8
        assert _psnr(img, out) > 35.0  # q=90 baseline on synth content

    # non-multiple-of-8 dims + smooth gradient at high quality
    g = np.zeros((50, 70, 3), np.uint8)
    g[..., 0] = np.linspace(0, 255, 70, dtype=np.uint8)[None, :]
    g[..., 1] = np.linspace(0, 255, 50, dtype=np.uint8)[:, None]
    g[..., 2] = 128
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == g.shape
    assert _psnr(g, out) > 40.0


def test_jpeg_quality_monotone_and_headers():
    from visiblev8_crawler_ray.functions.png import synth_screenshot

    img = synth_screenshot("doc-q")
    lo, hi = encode_jpeg(img, 30), encode_jpeg(img, 95)
    assert len(lo) < len(hi)          # coarser quant -> fewer bits
    assert hi[:2] == b"\xff\xd8" and hi[-2:] == b"\xff\xd9"
    assert _psnr(img, decode_jpeg(hi)) > _psnr(img, decode_jpeg(lo))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")


def test_media_decoder_jpeg_path(ray_session, tmp_path):
    """MediaDecoder dispatches .jpg refs to the real JFIF decode and
    recovers true dimensions (the PNG test's twin for JPEG)."""
    import os

    import ray.data as rd

    from visiblev8_crawler_ray.functions.png import synth_screenshot
    from visiblev8_crawler_ray.pipelines.multimodal import media_features

    blob_dir = str(tmp_path / "blobs")
    rows = []
    for i in range(6):
        key = f"jdoc{i}"
        img = synth_screenshot(key)
        os.makedirs(os.path.join(blob_dir, key), exist_ok=True)
        with open(os.path.join(blob_dir, key, "shot.jpg"), "wb") as f:
            f.write(encode_jpeg(img, 85))
        rows.append({
            "doc_id": key,
            "spans": [{"kind": "media/screenshot", "text": "",
                       "media_ref": f"blob://{key}/shot.jpg", "offset": 0}],
        })
    docs = rd.from_items(rows)
    out = media_features(docs, blob_dir=blob_dir).to_pandas()
    assert len(out) == 6
    for _, row in out.iterrows():
        key = row["media_ref"][len("blob://"):].split("/", 1)[0]
        img = synth_screenshot(key)
        assert (row["width"], row["height"]) == (img.shape[1], img.shape[0])
        assert row["n_bytes"] == os.path.getsize(
            os.path.join(blob_dir, key, "shot.jpg"))


def test_png_decode_all_8bit_color_types():
    """decode_png handles grayscale / palette / gray+alpha / RGBA
    streams (hand-built with the same chunk writer), not just the RGB8
    the engine emits — the 'beyond RGB8' codec-breadth item."""
    import struct
    import zlib

    from visiblev8_crawler_ray.functions.png import _SIG, _chunk, decode_png

    def build(ctype, w, h, rowbytes, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        raw = b"".join(b"\x00" + r for r in rowbytes)
        return (_SIG + _chunk(b"IHDR", ihdr) + extra
                + _chunk(b"IDAT", zlib.compress(raw))
                + _chunk(b"IEND", b""))

    # grayscale (ctype 0)
    g = build(0, 3, 2, [bytes([10, 20, 30]), bytes([40, 50, 60])])
    img = decode_png(g)
    assert img.shape == (2, 3, 3)
    assert (img[0, 1] == [20, 20, 20]).all()

    # palette (ctype 3)
    plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0, 0, 0, 255]))
    p = build(3, 3, 1, [bytes([0, 1, 2])], extra=plte)
    img = decode_png(p)
    assert img.tolist() == [[[255, 0, 0], [0, 255, 0], [0, 0, 255]]]

    # gray+alpha (ctype 4): alpha dropped
    ga = build(4, 2, 1, [bytes([100, 255, 200, 0])])
    assert decode_png(ga).tolist() == [[[100] * 3, [200] * 3]]

    # RGBA (ctype 6): alpha dropped
    rgba = build(6, 2, 1, [bytes([1, 2, 3, 9, 4, 5, 6, 9])])
    assert decode_png(rgba).tolist() == [[[1, 2, 3], [4, 5, 6]]]

    # 16-bit is in scope since r5 (high byte kept)
    deep = build(0, 2, 1, [bytes([0x12, 0x34, 0xFF, 0x00])])
    deep = deep.replace(
        _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)),
        _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0)))
    assert decode_png(deep)[0, :, 0].tolist() == [0x12, 0xFF]
    # an invalid depth still refuses loudly
    bad = _SIG + _chunk(b"IHDR", struct.pack(
        ">IIBBBBB", 1, 1, 3, 2, 0, 0, 0))
    with pytest.raises(NotImplementedError):
        decode_png(bad)


def test_png_rgb_roundtrip_unchanged():
    """The original RGB8 path is byte-identical after the breadth
    extension (crawl blob integrity depends on it)."""
    from visiblev8_crawler_ray.functions.png import (decode_png, encode_png,
                                                     synth_screenshot)

    img = synth_screenshot("breadth-check")
    assert (decode_png(encode_png(img)) == img).all()


def test_wav_decode_breadth():
    """decode_wav accepts PCM8 / PCM16 / PCM32 and stereo (downmixed),
    not just the engine's own mono PCM16."""
    import io
    import wave

    from visiblev8_crawler_ray.functions.audio import decode_wav, synth_clip

    clip = synth_clip("breadth")

    def wav(samples_bytes, nch, width, rate=8000):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(width)
            w.setframerate(rate)
            w.writeframes(samples_bytes)
        return buf.getvalue()

    # PCM16 mono: bit-exact passthrough
    rate, got = decode_wav(wav(clip.astype("<i2").tobytes(), 1, 2))
    assert rate == 8000 and (got == clip).all()
    # PCM8: unsigned midpoint-128, rescaled
    u8 = ((clip.astype(np.int32) >> 8) + 128).astype(np.uint8)
    _, got8 = decode_wav(wav(u8.tobytes(), 1, 1))
    assert np.abs(got8.astype(np.int32) - clip.astype(np.int32)).max() < 256
    # PCM32: rescaled back down
    i32 = (clip.astype(np.int64) << 16).astype("<i4")
    _, got32 = decode_wav(wav(i32.tobytes(), 1, 4))
    assert (got32 == clip).all()
    # stereo downmix: mean of identical channels = original
    st = np.stack([clip, clip], axis=1).astype("<i2")
    _, gots = decode_wav(wav(st.tobytes(), 2, 2))
    assert (gots == clip).all()
    with pytest.raises(NotImplementedError):
        decode_wav(wav(clip.astype("<i2").tobytes()[:60], 1, 3))


def test_mjpeg_stream_roundtrip(ray_session, tmp_path):
    """Raw MJPEG (concatenated JFIF) splits marker-aware into frames,
    each decodable; MediaDecoder dispatches .mjpg refs."""
    import os

    import ray.data as rd

    from visiblev8_crawler_ray.functions.png import synth_screenshot
    from visiblev8_crawler_ray.functions.video import iter_frames
    from visiblev8_crawler_ray.pipelines.multimodal import media_features

    imgs = [synth_screenshot(f"mj{i}") for i in range(4)]
    # use ONE dims-consistent source so frames share shape
    imgs = [imgs[0]] * 4
    stream = b"".join(encode_jpeg(im, 80) for im in imgs)
    frames = list(iter_frames(stream))
    assert len(frames) == 4
    for f in frames:
        out = decode_jpeg(f)
        assert out.shape == imgs[0].shape

    blob_dir = str(tmp_path / "blobs")
    os.makedirs(os.path.join(blob_dir, "vdoc"), exist_ok=True)
    with open(os.path.join(blob_dir, "vdoc", "cap.mjpg"), "wb") as fh:
        fh.write(stream)
    docs = rd.from_items([{
        "doc_id": "vdoc",
        "spans": [{"kind": "media/video", "text": "",
                   "media_ref": "blob://vdoc/cap.mjpg", "offset": 0}],
    }])
    out = media_features(docs, blob_dir=blob_dir).to_pandas()
    assert len(out) == 1
    assert (int(out.loc[0, "width"]), int(out.loc[0, "height"])) == \
        (imgs[0].shape[1], imgs[0].shape[0])
    assert int(out.loc[0, "n_bytes"]) == len(stream)
