"""Stdlib WAV codec + deterministic synthetic clips.

Same philosophy as :mod:`.png` (the stdlib PNG codec): the sandbox has
no audio libraries, but ``wave`` + numpy are enough for REAL encode /
decode of PCM WAV — so the audio pipeline stages parse genuine bytes
instead of stubbing (reference stores media artifacts opaquely in
GridFS, ``vv8_worker/tasks.py:184-264``; the decode/feature stages are
the training-pipeline extension).
"""

from __future__ import annotations

import hashlib
import io
import wave

import numpy as np

RATE = 8000          # Hz, mono PCM16
CLIP_SAMPLES = 400   # 50 ms


def synth_clip(doc_id: str, n: int = CLIP_SAMPLES,
               rate: int = RATE) -> np.ndarray:
    """Deterministic int16 mono clip for a doc id: a sine + square mix
    whose frequency/phase derive from the id hash (pure function, so
    fetch retries rewrite identical bytes)."""
    h = int.from_bytes(
        hashlib.blake2b(doc_id.encode(), digest_size=8).digest(), "big")
    freq = 200.0 + (h % 1800)
    phase = (h >> 32) % 628 / 100.0
    t = np.arange(n, dtype=np.float64) / rate
    x = (0.5 * np.sin(2 * np.pi * freq * t + phase)
         + 0.25 * np.sign(np.sin(2 * np.pi * (freq / 3.0) * t)))
    return np.clip(x * 32767.0, -32768, 32767).astype(np.int16)


def encode_wav(samples: np.ndarray, rate: int = RATE) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse real RIFF/WAVE bytes -> (sample_rate, mono int16 samples).

    Accepts PCM8 (unsigned), PCM16 and PCM32 at any channel count —
    multi-channel downmixes by channel mean, other widths rescale to
    int16 — so feature stages digest what real recorders emit, not just
    the engine's own mono-PCM16 clips (codec-breadth item)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, width = w.getnchannels(), w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif width == 1:  # PCM8 is unsigned, midpoint 128
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                - 128) << 8
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.int64) >> 16
    else:
        raise NotImplementedError(f"PCM width {width * 8} bits")
    if nch > 1:
        data = data[: len(data) // nch * nch].reshape(-1, nch) \
            .mean(axis=1).astype(np.int64)
    return rate, np.clip(data, -32768, 32767).astype(np.int16)
