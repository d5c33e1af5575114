"""Contract invariants beyond oracle equality: span-sequence shape and
politeness-schedule properties of the crawl output."""

import shutil

import numpy as np
import pandas as pd
import pytest

from visiblev8_crawler_ray import synth
from visiblev8_crawler_ray.config import CrawlConfig
from visiblev8_crawler_ray.functions.validate import validate_docs
from visiblev8_crawler_ray.pipelines.crawl import run_crawl

CFG = CrawlConfig(max_depth=1, max_waves=4, max_per_host_per_wave=12)


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    seeds = synth.seeds_table(np.arange(70), CFG)
    root = str(tmp_path_factory.mktemp("inv") / "store")
    shutil.rmtree(root, ignore_errors=True)
    return run_crawl(seeds, CFG, root)


def test_span_sequence_invariants(run):
    """Per-row: offsets strictly increasing from 0, kinds in the domain,
    media_ref present iff media span (the driver input-hint contract)."""
    counts = validate_docs(run.docs())
    assert counts["rows"] > 0
    assert counts["bad_offset"] == 0
    assert counts["bad_kind"] == 0
    assert counts["bad_media"] == 0


def test_politeness_schedule_invariants(run):
    """Per (wave, host): at most `max_per_host_per_wave` admissions, and
    fetch_vtime == host_rank * crawl_delay_ms(host) for the admitted
    order (virtual-time politeness, SURVEY.md T6)."""
    log = run.crawl_log().to_pandas()
    fetched = log[log.seq >= 0]
    per = fetched.groupby(["wave", "host"]).size()
    assert (per <= CFG.max_per_host_per_wave).all()
    for (wave, host), g in fetched.groupby(["wave", "host"]):
        g = g.sort_values(["fetch_vtime", "seq"]).reset_index(drop=True)
        delay = CFG.crawl_delay_ms(host)
        expect = np.arange(len(g)) * delay
        assert (g["fetch_vtime"].to_numpy() == expect).all(), (wave, host)


def test_urlseen_unique(run):
    seen = run.urlseen().to_pandas()
    assert seen.url_key.is_unique
    assert seen.first_seq.is_unique


def test_blob_artifacts_and_url_status(tmp_path):
    """S6/S7: blob_artifacts=True materializes the bytes every media
    span ref points to; M12: url_status projects per-URL state with
    matching artifact refs."""
    import os

    import numpy as np
    import pyarrow.compute as pc

    from visiblev8_crawler_ray import synth
    from visiblev8_crawler_ray.pipelines.crawl import run_crawl

    cfg = CrawlConfig(max_depth=0, max_waves=1)
    seeds = synth.seeds_table(np.arange(30), cfg)
    root = str(tmp_path / "blobstore")
    run = run_crawl(seeds, cfg, root, blob_artifacts=True)

    docs = run.docs().to_pandas()
    n_refs = 0
    for spans in docs.spans:
        for s in spans:
            if s["media_ref"]:
                rel = s["media_ref"][len("blob://"):]
                p = os.path.join(root, "blobs", rel)
                assert os.path.exists(p), p
                with open(p, "rb") as f:
                    head = f.read(8)
                if rel.endswith(".png"):
                    assert head == b"\x89PNG\r\n\x1a\n"
                n_refs += 1
    assert n_refs > 0

    status = run.url_status().to_pandas()
    ok = status[status.status == "ok"]
    assert (ok.screenshot_ref == "blob://" + ok.doc_id + "/shot.png").all()
    assert (status[status.status != "ok"].screenshot_ref == "").all()
    assert status.complete.all()


def test_fetch_rows_flat_matches_naive_reference():
    """The batch-vectorized span generator must be byte-identical to the
    per-URL naive reference (make_spans_flat), including actioned rows,
    multi-wave doc ids and non-page paths."""
    from visiblev8_crawler_ray import synth
    from visiblev8_crawler_ray.config import CrawlConfig

    cfg = CrawlConfig()
    n = 257
    urls = [f"https://src{i % 7}.example/page/{i % 91}" for i in range(n)]
    urls[3] = "https://odd.example/nopage"  # page_of -> 0 path shape
    hosts = [u.split("://", 1)[1].split("/", 1)[0] for u in urls]
    paths = ["/" + u.split("://", 1)[1].split("/", 1)[1] for u in urls]
    waves = [i % 3 for i in range(n)]
    acts: list = [None] * n
    for i in range(0, n, 11):
        acts[i] = [(i % 1280, (i * 13) % 720), ((i * 7) % 1280, i % 720)]
    dids = [synth.doc_id_for(u, int(w)) for u, w in zip(urls, waves)]

    kinds: list = []
    texts: list = []
    medias: list = []
    counts = []
    links = []
    for u, h, p, w, d, a in zip(urls, hosts, paths, waves, dids, acts):
        c, lk = synth.make_spans_flat(u, h, p, int(w), cfg, kinds, texts,
                                      medias, did=d, actions=a)
        counts.append(c)
        links.append(lk)

    K, T, M, C, D, L = synth.fetch_rows_flat(
        urls, hosts, paths, waves, cfg, doc_ids=dids, actions=acts)
    assert list(C) == counts
    assert list(K) == kinds
    assert list(T) == texts
    assert list(M) == medias
    assert L == links


def test_png_codec_roundtrip():
    """The stdlib PNG codec is a real codec: encode -> decode is the
    identity for synthetic screenshots and random images (filter 0,
    what encode_png emits)."""
    import numpy as np

    from visiblev8_crawler_ray.functions.png import (
        decode_png, encode_png, synth_screenshot)

    for key in ["a", "b", "42"]:
        img = synth_screenshot(key)
        assert np.array_equal(decode_png(encode_png(img)), img)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (17, 29, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_decode_nonzero_filters():
    """decode_png handles scanlines written by OTHER encoders: build a
    PNG by hand with every filter type (sub/up/average/paeth) applied
    per the spec and assert the decode recovers the exact pixels."""
    import struct
    import zlib

    import numpy as np

    from visiblev8_crawler_ray.functions.png import _SIG, _chunk, decode_png

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    h, w, _ = img.shape
    stride = w * 3
    flat = img.reshape(h, stride).astype(np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)

    raw = bytearray()
    for y, f in enumerate([1, 2, 3, 4, 1]):   # every non-zero filter
        raw.append(f)
        prior = flat[y - 1] if y else np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = int(flat[y][x - 3]) if x >= 3 else 0
            b = int(prior[x])
            c = int(prior[x - 3]) if x >= 3 else 0
            pred = {1: a, 2: b, 3: (a + b) >> 1, 4: paeth(a, b, c)}[f]
            raw.append((int(flat[y][x]) - pred) & 0xFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))
    assert np.array_equal(decode_png(data), img)


def test_media_decode_real_path(tmp_path):
    """End-to-end real decode: crawl with blob_artifacts=True writes
    genuine PNGs; MediaDecoder(blob_dir=...) parses the actual bytes
    and recovers each screenshot's true dimensions + file size."""
    import os

    import numpy as np

    from visiblev8_crawler_ray import synth
    from visiblev8_crawler_ray.functions.png import synth_screenshot
    from visiblev8_crawler_ray.pipelines.crawl import run_crawl
    from visiblev8_crawler_ray.pipelines.multimodal import media_features

    cfg = CrawlConfig(max_depth=0, max_waves=1)
    seeds = synth.seeds_table(np.arange(20), cfg)
    root = str(tmp_path / "mediastore")
    run = run_crawl(seeds, cfg, root, blob_artifacts=True)
    blob_dir = os.path.join(root, "blobs")

    out = media_features(run.docs(), blob_dir=blob_dir).to_pandas()
    pngs = out[out["media_ref"].str.endswith(".png")]
    assert len(pngs) > 0
    for _, row in pngs.iterrows():
        did = row["media_ref"][len("blob://"):].split("/", 1)[0]
        img = synth_screenshot(did)
        assert (row["width"], row["height"]) == (img.shape[1], img.shape[0])
        path = os.path.join(blob_dir, row["media_ref"][len("blob://"):])
        assert row["n_bytes"] == os.path.getsize(path)
    vids = out[out["media_ref"].str.endswith(".vid")]
    if len(vids):  # video: dims of the first decoded frame
        from visiblev8_crawler_ray.functions.video import FRAME_H, FRAME_W

        assert (vids["width"] == FRAME_W).all()
        assert (vids["height"] == FRAME_H).all()
    flat = out[~out["media_ref"].str.contains(r"\.(?:png|vid)$")]
    assert (flat["width"] == 0).all()  # HAR/WAV: no intrinsic dims


def test_two_phase_agg_count_star_semantics():
    """two_phase_agg's "count" is SQL count(*) (nulls included) and
    "count_valid" is SQL count(col) — pinned so null-bearing inputs
    cannot silently diverge from the count(*)/avg() oracles."""
    import pandas as pd
    import ray.data as rd

    from visiblev8_crawler_ray.functions.util import two_phase_agg

    df = pd.DataFrame({"k": ["a", "a", "a", "b"],
                       "v": [1.0, None, 3.0, None]})
    out = two_phase_agg(
        rd.from_pandas(df, override_num_blocks=2), ["k"],
        [("v", "count"), ("v", "count_valid"), ("v", "sum")],
        ["k", "n", "nv", "s"],
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert out["n"].tolist() == [3, 1]       # count(*)
    assert out["nv"].tolist() == [2, 0]      # count(v)
    assert out["s"].tolist()[0] == 4.0


def test_media_dedup_content_level(tmp_path):
    """media_dedup keys by DECODED content: two PNG files with identical
    pixels but different bytes (extra ancillary chunk) collapse to one
    key; byte-identical HARs collapse; distinct pixels stay apart.
    First-wins holder is the (doc_id, media_ref) minimum."""
    import os
    import struct
    import zlib

    import pyarrow as pa
    import ray.data as rd

    from visiblev8_crawler_ray.functions.png import encode_png
    from visiblev8_crawler_ray.pipelines.multimodal import media_dedup

    blob_dir = str(tmp_path / "blobs")
    rng = np.random.default_rng(3)
    px_a = rng.integers(0, 256, size=(8, 10, 3), dtype=np.uint8)
    px_b = rng.integers(0, 256, size=(8, 10, 3), dtype=np.uint8)
    png_a1 = encode_png(px_a)
    # same pixels, different bytes: splice a tEXt chunk before IEND
    raw = b"tEXtcomment\x00dup"
    chunk = struct.pack(">I", len(raw) - 4) + raw + struct.pack(
        ">I", zlib.crc32(raw) & 0xFFFFFFFF)
    png_a2 = png_a1[:-12] + chunk + png_a1[-12:]
    assert png_a2 != png_a1
    blobs = {
        "1/shot.png": png_a1,
        "2/shot.png": png_a2,          # pixel-dup of doc 1
        "3/shot.png": encode_png(px_b),
        "1/har.json": b'{"log": 1}',
        "3/har.json": b'{"log": 1}',   # byte-dup of doc 1's har
    }
    for rel, data in blobs.items():
        p = os.path.join(blob_dir, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()), ("offset", pa.int32())])

    def sp(kind, ref, off):
        return {"kind": kind, "text": "", "media_ref": ref, "offset": off}

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "spans": pa.array([
            [sp("media/shot", "blob://1/shot.png", 0),
             sp("media/har", "blob://1/har.json", 1)],
            [sp("media/shot", "blob://2/shot.png", 0)],
            [sp("media/shot", "blob://3/shot.png", 0),
             sp("media/har", "blob://3/har.json", 1)],
        ], type=pa.list_(span_t)),
    })
    out = media_dedup(rd.from_arrow(docs), blob_dir)
    # 5 refs -> 3 distinct contents: {px_a x2}, {px_b}, {har x2}
    assert len(out) == 3
    by_ref = out.set_index("keep_ref")
    assert by_ref.loc["blob://1/shot.png", "n_refs"] == 2
    assert by_ref.loc["blob://1/shot.png", "keep_doc_id"] == 1
    assert by_ref.loc["blob://3/shot.png", "n_refs"] == 1
    assert by_ref.loc["blob://1/har.json", "n_refs"] == 2
    assert "blob://2/shot.png" not in by_ref.index


def test_media_near_dup_perceptual(tmp_path):
    """Banded-Hamming aHash near-dup: a noise-perturbed re-encode of an
    image pairs with its original (small Hamming distance); an
    unrelated image pairs with nothing.  Pigeonhole banding guarantees
    recall 1.0 within the radius, verified here."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from visiblev8_crawler_ray.functions.png import encode_png
    from visiblev8_crawler_ray.pipelines.multimodal import media_near_dup

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    near = base.copy()
    near[0, 0] = (near[0, 0].astype(int) + 4) % 256   # tiny perturbation
    other = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)

    blob_dir = str(tmp_path / "blobs")
    for rel, px in [("1/shot.png", base), ("2/shot.png", near),
                    ("3/shot.png", other)]:
        p = os.path.join(blob_dir, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(encode_png(px))

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()), ("offset", pa.int32())])
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "spans": pa.array([
            [{"kind": "media/shot", "text": "",
              "media_ref": f"blob://{i}/shot.png", "offset": 0}]
            for i in (1, 2, 3)
        ], type=pa.list_(span_t)),
    })
    pairs = media_near_dup(rd.from_arrow(docs), blob_dir)
    assert len(pairs) == 1
    assert pairs.iloc[0]["ref_a"] == "blob://1/shot.png"
    assert pairs.iloc[0]["ref_b"] == "blob://2/shot.png"
    assert pairs.iloc[0]["hamming"] <= 3


def test_fetch_writer_replay_idempotent(tmp_path):
    """Ray task-retry contract for the side-writing fetch stage: a full
    replay of the SAME batch (retry after a crash that may have left a
    half-written .tmp and/or already-renamed part files) must converge
    to the identical file set, identical parquet contents and identical
    blob bytes — never duplicates (deterministic part names + tmp+rename
    is the mechanism; this pins it)."""
    import hashlib
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from visiblev8_crawler_ray import synth
    from visiblev8_crawler_ray.functions import urls as U
    from visiblev8_crawler_ray.stages.fetcher import FetchWriter

    cfg = CrawlConfig(max_depth=0, max_waves=1)
    seeds = synth.seeds_table(np.arange(24), cfg)
    c = U.canonicalize(seeds["url"])
    keep = c["valid"].to_numpy(zero_copy_only=False)
    urls = c["canonical_url"].to_numpy(zero_copy_only=False)[keep]
    hosts = c["host"].to_numpy(zero_copy_only=False)[keep]
    paths = c["path"].to_numpy(zero_copy_only=False)[keep]
    n = len(urls)
    batch = pa.table({
        "url": pa.array(urls, type=pa.string()),
        "host": pa.array(hosts, type=pa.string()),
        "path": pa.array(paths, type=pa.string()),
        "wave": pa.array(np.zeros(n, np.int32)),
        "seq": pa.array(np.arange(n, dtype=np.int64)),
    })

    out_dir = str(tmp_path / "fetch"); os.makedirs(out_dir)
    blob_dir = str(tmp_path / "blobs"); os.makedirs(blob_dir)

    def snapshot():
        files = {}
        for root, _, names in os.walk(tmp_path):
            for f in names:
                p = os.path.join(root, f)
                with open(p, "rb") as fh:
                    files[os.path.relpath(p, tmp_path)] = \
                        hashlib.md5(fh.read()).hexdigest()
        return files

    w = FetchWriter(cfg, out_dir, blob_dir=blob_dir)
    out1 = w(batch)
    snap1 = snapshot()
    parts1 = sorted(f for f in snap1 if f.endswith(".parquet"))
    assert len(parts1) == 1 and parts1[0].startswith("fetch/part-s")

    # crash debris: a half-written temp from a killed attempt
    stray = os.path.join(out_dir, ".tmp-deadbeef")
    with open(stray, "wb") as f:
        f.write(b"partial garbage")
    # replay the WHOLE batch (a Ray retry re-runs the task verbatim)
    out2 = w(batch)
    snap2 = {k: v for k, v in snapshot().items()
             if not k.endswith(".tmp-deadbeef")}
    assert out1.equals(out2)  # writer returns control columns only
    assert snap1 == snap2  # same names, same bytes — no duplicates

    # read-back ignores debris: only part-*.parquet is data
    datafiles = [f for f in os.listdir(out_dir)
                 if f.startswith("part-") and f.endswith(".parquet")]
    assert len(datafiles) == 1
    tbl = pq.read_table(os.path.join(out_dir, datafiles[0]))
    assert tbl.num_rows == n


def test_media_near_dup_cross_format(tmp_path):
    """Cross-codec perceptual identity: the SAME screenshot stored as
    PNG and as a q90 JPEG re-encode must pair (aHash is computed after
    decode, so the codec is invisible); an unrelated JPEG pairs with
    nothing.  This is the real-web mixed-format case the reference's
    GridFS artifacts exhibit (screenshots arrive in whatever format the
    browser produced)."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from visiblev8_crawler_ray.functions.jpeg import encode_jpeg
    from visiblev8_crawler_ray.functions.png import encode_png
    from visiblev8_crawler_ray.pipelines.multimodal import media_near_dup

    rng = np.random.default_rng(12)
    # smooth gradient image: JPEG-friendly, so q90 stays in the aHash
    # neighborhood (pure noise would shatter under DCT quantization)
    yy, xx = np.mgrid[0:24, 0:32]
    base = np.stack([(yy * 8) % 256, (xx * 8) % 256,
                     ((yy + xx) * 4) % 256], axis=2).astype(np.uint8)
    other = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)

    blob_dir = str(tmp_path / "blobs")
    payloads = [("1/shot.png", encode_png(base)),
                ("2/shot.jpg", encode_jpeg(base, quality=90)),
                ("3/shot.jpg", encode_jpeg(other, quality=90))]
    for rel, data in payloads:
        p = os.path.join(blob_dir, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()), ("offset", pa.int32())])
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "spans": pa.array([
            [{"kind": "media/shot", "text": "",
              "media_ref": f"blob://{rel}", "offset": 0}]
            for rel, _ in payloads
        ], type=pa.list_(span_t)),
    })
    pairs = media_near_dup(rd.from_arrow(docs), blob_dir)
    assert len(pairs) == 1
    assert pairs.iloc[0]["ref_a"] == "blob://1/shot.png"
    assert pairs.iloc[0]["ref_b"] == "blob://2/shot.jpg"
    assert pairs.iloc[0]["hamming"] <= 3


def test_video_near_dup_shared_frames(tmp_path):
    """Clip-overlap pairs: video B is a trimmed+extended copy of A
    (shares 3 of A's frames byte-identically); video C shares nothing.
    Engine vs the recursive-walk SQL twin over the same blob bytes."""
    import os
    import struct

    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from visiblev8_crawler_ray.pipelines.multimodal import video_near_dup

    rng = np.random.default_rng(13)

    def container(frames):
        out = [struct.pack(">I", len(frames))]
        for f in frames:
            out.append(struct.pack(">I", len(f)))
            out.append(f)
        return b"".join(out)

    shared = [rng.bytes(40) for _ in range(3)]
    vid_a = container(shared + [rng.bytes(30)])
    vid_b = container([rng.bytes(25)] + shared[::-1])   # order-free
    vid_c = container([rng.bytes(40) for _ in range(4)])

    blob_dir = str(tmp_path / "blobs")
    for rel, data in (("1/a.vid", vid_a), ("2/b.vid", vid_b),
                      ("3/c.vid", vid_c)):
        p = os.path.join(blob_dir, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()), ("offset", pa.int32())])
    docs = pa.table({
        "doc_id": pa.array(["d1", "d2", "d3"]),
        "spans": pa.array([
            [{"kind": "media/video", "text": "",
              "media_ref": f"blob://{rel}", "offset": 0}]
            for rel in ("1/a.vid", "2/b.vid", "3/c.vid")
        ], type=pa.list_(span_t)),
    })
    pairs = video_near_dup(rd.from_arrow(docs), blob_dir)
    assert len(pairs) == 1
    assert pairs.iloc[0]["ref_a"] == "blob://1/a.vid"
    assert pairs.iloc[0]["ref_b"] == "blob://2/b.vid"
    assert pairs.iloc[0]["shared_frames"] == 3

    # SQL twin over the same constructed store
    import pyarrow.parquet as _pq
    exp = tmp_path / "docs.parquet"
    _pq.write_table(docs, exp)
    sql = f"""
        WITH RECURSIVE sp AS (SELECT doc_id,
                unnest(spans, recursive := true)
                FROM read_parquet('{exp}')),
        v AS (SELECT DISTINCT media_ref FROM sp
              WHERE kind = 'media/video'),
        hx AS (SELECT substr(filename, {len(blob_dir) + 2}) AS rel,
                      to_hex(content) AS h,
                      ('0x' || substr(to_hex(content), 1, 8))::BIGINT
                          AS n_frames
               FROM read_blob('{blob_dir}/**/*.vid')),
        walk(rel, idx, hpos, hlen) AS (
          SELECT rel, 0, 9, 2 * ('0x' || substr(h, 9, 8))::BIGINT
          FROM hx WHERE n_frames > 0
          UNION ALL
          SELECT w.rel, w.idx + 1, w.hpos + 8 + w.hlen,
                 2 * ('0x' || substr(hx.h, w.hpos + 8 + w.hlen, 8))::BIGINT
          FROM walk w JOIN hx USING (rel)
          WHERE w.idx + 1 < hx.n_frames),
        d AS (SELECT DISTINCT v.media_ref AS ref,
                     md5(substr(hx.h, w.hpos + 8, w.hlen)) AS frame_md5
              FROM walk w JOIN hx USING (rel)
              JOIN v ON w.rel = substr(v.media_ref, 8))
        SELECT a.ref AS ref_a, b.ref AS ref_b,
               CAST(count(*) AS BIGINT) AS shared_frames
        FROM d a JOIN d b ON a.frame_md5 = b.frame_md5 AND a.ref < b.ref
        GROUP BY a.ref, b.ref HAVING count(*) >= 2
        ORDER BY ref_a, ref_b"""
    odf = duckdb.sql(sql).df()
    import pandas as pd
    pd.testing.assert_frame_equal(pairs.reset_index(drop=True), odf,
                                  check_dtype=False, check_exact=True)


def test_har_entries_constructed_vs_duckdb(ray_session, tmp_path):
    """har_entries on a constructed blob dir (synthetic HARs plus
    handcrafted edge cases: empty entries, all-dup hosts, no-200
    statuses) must match an independent DuckDB re-parse of the same
    bytes."""
    import json
    import os

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from visiblev8_crawler_ray.functions.har import synth_har
    from visiblev8_crawler_ray.pipelines.multimodal import har_entries

    blob_dir = str(tmp_path / "blobs")

    def entry(url, status, mime, size):
        return {"request": {"url": url, "method": "GET"},
                "response": {"status": status,
                             "content": {"mimeType": mime,
                                         "size": size}}}

    blobs = {
        "a/har.json": synth_har("a"),
        "b/har.json": synth_har("b"),
        "c/har.json": json.dumps(
            {"log": {"doc": "c", "entries": []}}).encode(),
        "d/har.json": json.dumps({"log": {"doc": "d", "entries": [
            entry("https://one.example/x", 404, "text/html", 10),
            entry("https://one.example/y", 500,
                  "application/javascript", 20),
            entry("https://one.example/z", 301, "image/png", 30),
            entry("https://one.example/w", 204,
                  "application/json", 40),
        ]}}).encode(),
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
        "doc_id": pa.array(list("abcd")),
        "spans": pa.array([[{"kind": "media/har", "text": "",
                             "media_ref": f"blob://{d}/har.json",
                             "offset": 0}] for d in "abcd"],
                          type=pa.list_(span_t)),
    })
    got = har_entries(rd.from_arrow(docs), blob_dir)

    con = duckdb.connect()
    want = con.sql(f"""
        WITH raw AS (SELECT substr(filename, {len(blob_dir) + 2}) AS rel,
                            CAST(decode(content) AS VARCHAR) AS j
                     FROM read_blob('{blob_dir}/**/har.json')),
        m AS (SELECT 'blob://' || rel AS media_ref, j,
                     CAST(json_array_length(j, '$.log.entries')
                          AS BIGINT) AS cnt FROM raw),
        ix AS (SELECT media_ref, j,
                      unnest(generate_series(0, cnt - 1)) AS i FROM m),
        x AS (SELECT media_ref,
                     json_extract_string(j, '$.log.entries[' || i
                         || '].request.url') AS url,
                     CAST(json_extract(j, '$.log.entries[' || i
                         || '].response.status') AS BIGINT) AS status,
                     json_extract_string(j, '$.log.entries[' || i
                         || '].response.content.mimeType') AS mime,
                     CAST(json_extract(j, '$.log.entries[' || i
                         || '].response.content.size') AS BIGINT) AS sz
              FROM ix),
        agg AS (SELECT media_ref,
                   CAST(count(*) AS BIGINT) AS n_requests,
                   CAST(count(DISTINCT regexp_extract(url,
                        '^https://([^/]+)', 1)) AS BIGINT) AS n_hosts,
                   CAST(sum(CASE WHEN status = 200 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_ok,
                   CAST(sum(sz) AS BIGINT) AS bytes_total,
                   CAST(sum(CASE WHEN mime LIKE 'text/%' THEN sz
                            ELSE 0 END) AS BIGINT) AS bytes_text,
                   CAST(sum(CASE WHEN mime = 'application/javascript'
                            THEN sz ELSE 0 END) AS BIGINT)
                       AS bytes_script,
                   CAST(sum(CASE WHEN mime LIKE 'image/%' THEN sz
                            ELSE 0 END) AS BIGINT) AS bytes_image
            FROM x GROUP BY media_ref)
        SELECT m.media_ref,
               coalesce(a.n_requests, 0) AS n_requests,
               coalesce(a.n_hosts, 0) AS n_hosts,
               coalesce(a.n_ok, 0) AS n_ok,
               coalesce(a.bytes_total, 0) AS bytes_total,
               coalesce(a.bytes_text, 0) AS bytes_text,
               coalesce(a.bytes_script, 0) AS bytes_script,
               coalesce(a.bytes_image, 0) AS bytes_image
        FROM m LEFT JOIN agg a USING (media_ref)
        ORDER BY media_ref""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the empty-entries HAR keeps a zeroed row
    assert got.set_index("media_ref").loc[
        "blob://c/har.json", "n_requests"] == 0
    assert got.set_index("media_ref").loc[
        "blob://d/har.json", "n_hosts"] == 1
    assert got.set_index("media_ref").loc[
        "blob://d/har.json", "n_ok"] == 0
