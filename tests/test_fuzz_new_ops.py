"""Seeded fuzz: the new interleaved/profile/sketch operators vs naive
single-process references over randomized corpora — the same
fuzz-vs-reference pattern as the as-of-join suite, catching shape
assumptions (batch splits, empty docs, all-media docs, vocab skew) the
curated fixtures may miss."""

import collections
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")
from visiblev8_crawler_ray.pipelines import textops as T  # noqa: E402
from visiblev8_crawler_ray.stages import parse as P  # noqa: E402

SPAN_T = pa.struct([("kind", pa.string()), ("text", pa.string()),
                    ("media_ref", pa.string()), ("offset", pa.int32())])
KINDS = ["get", "set", "call", "new", "script", "media/shot", "media/har"]


def _random_docs(rng, n_docs):
    rows = []
    for d in range(n_docs):
        n = int(rng.integers(0, 7))
        spans = []
        for off in range(n):
            kind = KINDS[int(rng.integers(0, len(KINDS)))]
            if kind.startswith("media/"):
                spans.append({"kind": kind, "text": "",
                              "media_ref": f"blob://{d}/{off}", "offset": off})
            else:
                spans.append({"kind": kind, "text": f"t{d}.{off}",
                              "media_ref": "", "offset": off})
        rows.append(spans)
    return pa.table({
        "doc_id": pa.array(range(n_docs), type=pa.int64()),
        "spans": pa.array(rows, type=pa.list_(SPAN_T)),
    })


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_caption_pairs_fuzz(seed):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    docs = _random_docs(rng, 40)
    got = P.caption_pairs(rd.from_arrow(docs)).to_pandas() \
        .sort_values(["doc_id", "media_ref"]).reset_index(drop=True)

    exp = []
    for did, spans in zip(docs["doc_id"].to_pylist(),
                          docs["spans"].to_pylist()):
        last = None
        for s in spans:
            if s["kind"].startswith("media/"):
                exp.append({
                    "doc_id": did, "media_ref": s["media_ref"],
                    "media_kind": s["kind"],
                    "caption": last["text"] if last else "",
                    "caption_kind": last["kind"] if last else "",
                    "gap": s["offset"] - last["offset"] if last else -1})
            else:
                last = s
    edf = pd.DataFrame(exp, columns=["doc_id", "media_ref", "media_kind",
                                     "caption", "caption_kind", "gap"]) \
        .sort_values(["doc_id", "media_ref"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, edf, check_dtype=False)


@pytest.mark.parametrize("seed", [0, 1])
def test_reconstruct_fuzz(seed):
    import ray.data as rd

    rng = np.random.default_rng(seed + 10)
    docs = _random_docs(rng, 30)
    got = P.reconstruct_text(rd.from_arrow(docs)).to_pandas() \
        .set_index("doc_id")
    for did, spans in zip(docs["doc_id"].to_pylist(),
                          docs["spans"].to_pylist()):
        parts = [f"<|{s['kind']}|>" if s["kind"].startswith("media/")
                 else s["text"] for s in spans]
        assert got.loc[did, "doc_text"] == " ".join(parts)
        assert got.loc[did, "n_spans"] == len(spans)


@pytest.mark.parametrize("seed,k", [(0, 5), (1, 3), (2, 20)])
def test_heavy_hitters_fuzz(seed, k, tmp_path):
    rng = np.random.default_rng(seed + 50)
    vocab = [f"w{i}" for i in range(200)]
    p = rng.dirichlet(np.ones(200) * 0.05)   # skewed
    toks = rng.choice(vocab, size=5000, p=p)
    texts = [" ".join(toks[i:i + 25]) for i in range(0, 5000, 25)]
    d = tmp_path / f"hh{seed}"
    d.mkdir()
    pd.DataFrame({"doc_id": range(len(texts)), "text": texts}) \
        .to_parquet(d / "documents.parquet")

    got = T.heavy_hitters(str(d), k=k)
    cnt = collections.Counter(toks.tolist())
    total = sum(cnt.values())
    exp = sorted([(t, c) for t, c in cnt.items() if c * k > total],
                 key=lambda x: (-x[1], x[0]))
    assert list(map(tuple, got[["token", "c"]].itertuples(index=False))) == exp


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_minlabel_components_fuzz(seed):
    """Shared union-find vs naive BFS closure on random graphs."""
    from visiblev8_crawler_ray.functions.util import minlabel_components

    rng = np.random.default_rng(seed + 99)
    n_edges = int(rng.integers(0, 60))
    a = rng.integers(0, 30, size=n_edges)
    b = rng.integers(0, 30, size=n_edges)
    keys, vals = minlabel_components(a, b)

    adj = collections.defaultdict(set)
    for x, y in zip(a.tolist(), b.tolist()):
        adj[x].add(y)
        adj[y].add(x)
    expect = {}
    for start in adj:
        seen, stack = {start}, [start]
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        expect[start] = min(seen)
    got = dict(zip(keys.tolist(), vals.tolist()))
    assert got == expect


def test_media_dup_clusters(tmp_path):
    """Pairs -> one row per image with cluster representative + keep
    flag; transitive classes collapse to the min ref."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from visiblev8_crawler_ray.functions.png import encode_png
    from visiblev8_crawler_ray.pipelines.multimodal import media_dup_clusters

    rng = np.random.default_rng(21)
    base = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    near1 = base.copy(); near1[0, 0] = (near1[0, 0].astype(int) + 3) % 256
    near2 = base.copy(); near2[1, 1] = (near2[1, 1].astype(int) + 3) % 256
    other = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    blob_dir = str(tmp_path / "blobs")
    for rel, px in [("1/shot.png", base), ("2/shot.png", near1),
                    ("3/shot.png", near2), ("4/shot.png", other)]:
        p = os.path.join(blob_dir, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(encode_png(px))
    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()), ("offset", pa.int32())])
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "spans": pa.array([
            [{"kind": "media/shot", "text": "",
              "media_ref": f"blob://{i}/shot.png", "offset": 0}]
            for i in (1, 2, 3, 4)
        ], type=pa.list_(span_t)),
    })
    out = media_dup_clusters(rd.from_arrow(docs), blob_dir) \
        .set_index("media_ref")
    # 1,2,3 form one perceptual class (1-2 and 1-3 within radius; 2-3
    # joins transitively even if its direct distance exceeds it)
    assert out.loc["blob://1/shot.png", "cluster_ref"] == "blob://1/shot.png"
    assert out.loc["blob://2/shot.png", "cluster_ref"] == "blob://1/shot.png"
    assert out.loc["blob://3/shot.png", "cluster_ref"] == "blob://1/shot.png"
    assert out.loc["blob://4/shot.png", "cluster_ref"] == "blob://4/shot.png"
    assert out["keep"].sum() == 2


def test_media_thumbnails_real_resize(tmp_path):
    """REAL decode -> nearest-neighbor resize -> re-encode: thumbnail
    bytes decode back to the exact expected pixel grid."""
    import os

    import ray.data as rd

    from visiblev8_crawler_ray.functions.png import decode_png, encode_png
    from visiblev8_crawler_ray.pipelines.multimodal import media_thumbnails

    rng = np.random.default_rng(31)
    px = rng.integers(0, 256, size=(30, 40, 3), dtype=np.uint8)
    blob_dir = str(tmp_path / "blobs")
    os.makedirs(os.path.join(blob_dir, "1"))
    with open(os.path.join(blob_dir, "1/shot.png"), "wb") as f:
        f.write(encode_png(px))
    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()), ("offset", pa.int32())])
    docs = pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "spans": pa.array([[{"kind": "media/shot", "text": "",
                             "media_ref": "blob://1/shot.png",
                             "offset": 0}]], type=pa.list_(span_t)),
    })
    out = media_thumbnails(rd.from_arrow(docs), blob_dir,
                           out_w=8, out_h=6).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["src_width"], row["src_height"]) == (40, 30)
    thumb = decode_png(row["thumb_png"])
    ys = (np.arange(6) * 30) // 6
    xs = (np.arange(8) * 40) // 8
    np.testing.assert_array_equal(thumb, px[ys[:, None], xs[None, :]])


def test_sample_frames_plumbing():
    """Every-k-th sampling with a per-video cap over the stub
    container; frame bytes round-trip exactly."""
    import ray.data as rd

    from visiblev8_crawler_ray.pipelines.multimodal import (
        pack_frames, sample_frames)

    vids = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "media_ref": ["vframes://1/clip", "vframes://2/clip"],
        "payload": pa.array([
            pack_frames([bytes([i] * 10) for i in range(23)]),
            pack_frames([b"only"]),
        ], type=pa.binary()),
    })
    out = sample_frames(rd.from_arrow(vids), every_k=5, max_frames=3) \
        .to_pandas().sort_values(["doc_id", "frame_idx"]) \
        .reset_index(drop=True)
    # video 1: frames 0,5,10 (cap 3 of the 0,5,10,15,20 candidates)
    v1 = out[out["doc_id"] == 1]
    assert list(v1["frame_idx"]) == [0, 5, 10]
    assert list(v1["frame"]) == [bytes([0] * 10), bytes([5] * 10),
                                 bytes([10] * 10)]
    v2 = out[out["doc_id"] == 2]
    assert list(v2["frame_idx"]) == [0] and list(v2["frame"]) == [b"only"]


def test_wav_codec_roundtrip():
    from visiblev8_crawler_ray.functions.audio import (
        decode_wav, encode_wav, synth_clip)

    x = synth_clip("deadbeef-w0")
    rate, y = decode_wav(encode_wav(x))
    assert rate == 8000
    assert np.array_equal(x, y)
    # full-scale square wave: rms 0.5 at half amplitude
    sq = (np.ones(800) * 16384).astype(np.int16)
    _, z = decode_wav(encode_wav(sq))
    rms = float(np.sqrt(np.mean((z / 32768.0) ** 2)))
    assert abs(rms - 0.5) < 1e-6


def test_audio_features_e2e(tmp_path):
    import shutil

    from visiblev8_crawler_ray import synth
    from visiblev8_crawler_ray.config import CrawlConfig
    from visiblev8_crawler_ray.pipelines.crawl import run_crawl
    from visiblev8_crawler_ray.pipelines.multimodal import audio_features

    cfg = CrawlConfig(max_depth=0, max_waves=1, max_per_host_per_wave=100)
    seeds = synth.seeds_table(np.arange(60), cfg)
    root = str(tmp_path / "store")
    shutil.rmtree(root, ignore_errors=True)
    run = run_crawl(seeds, cfg, root, blob_artifacts=True)
    docs = run.docs()
    feats = audio_features(docs, root + "/blobs")
    # every third page (by url hash) carries a clip; all decode for real
    n_audio = sum(
        1 for spans in docs.to_pandas()["spans"]
        for s in spans if s["kind"] == "media/audio")
    assert len(feats) == n_audio > 0
    assert (feats["sample_rate"] == 8000).all()
    assert (feats["n_samples"] == 400).all()
    assert ((feats["rms"] > 0.0) & (feats["rms"] < 1.0)).all()
    assert ((feats["zcr"] > 0.0) & (feats["zcr"] < 1.0)).all()
    # determinism: same clip bytes -> same features on a second pass
    again = audio_features(docs, root + "/blobs")
    assert feats.equals(again)
