"""Sixth-continuation operators: duplicate-span removal
(dedup_paragraphs) and the RANGE-interval rolling window
(events_rolling_window) — hand-computed cases + DuckDB twins over
adversarial inputs the sf fixtures don't exercise."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")
import __ray_entry__ as R  # noqa: E402
from visiblev8_crawler_ray.pipelines import textops as T  # noqa: E402


def _norm(df):
    df = pd.DataFrame(df)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _docs_table(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["src0"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })


def test_dedup_paragraphs_hand_case(ray_session, tmp_path):
    """4-word blocks via the param: doc1 repeats doc0's first block and
    its own block (within-doc dup); doc2 is all-duplicate; empty and
    whitespace-only docs are excluded on both sides."""
    texts = [
        "a b c d e f g h",          # blocks: [a b c d] [e f g h]
        "a b c d x y z w x y z w",  # [a b c d] dup, [x y z w] kept, dup
        "e f g h",                  # dup of doc0 block 1
        "",                         # no tokens -> excluded
        " \t ",                     # no tokens -> excluded
        "tail one two",             # short block (3 words) kept
    ]
    pq.write_table(_docs_table(texts), tmp_path / "documents.parquet")
    out = T.dedup_paragraphs(str(tmp_path), block_words=4)
    got = {int(r.doc_id): (int(r.n_blocks), int(r.n_kept), r.text_clean)
           for r in out.itertuples()}
    assert got == {
        0: (2, 2, "a b c d e f g h"),
        1: (3, 1, "x y z w"),
        2: (1, 0, ""),
        5: (1, 1, "tail one two"),
    }
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{tmp_path}/documents.parquet'")
    odf = con.sql(T.dedup_paragraphs_sql(block_words=4)).df()
    pd.testing.assert_frame_equal(_norm(out), _norm(odf),
                                  check_dtype=False, check_exact=True)


def test_dedup_paragraphs_all_empty_corpus(ray_session, tmp_path):
    pq.write_table(_docs_table(["", "  ", "\n"]),
                   tmp_path / "documents.parquet")
    out = T.dedup_paragraphs(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "n_blocks", "n_kept",
                                 "text_clean"]


def test_dedup_paragraphs_block_invariance(ray_session, tmp_path):
    """The bucket count must not change results (partition-shape
    independence of the first-wins exchange)."""
    rng = np.random.default_rng(7)
    words = ["a", "b", "c", "d", "e"]
    texts = [" ".join(words[i] for i in rng.integers(0, 5, 40))
             for _ in range(30)]
    texts += texts[:5]  # whole-doc dups -> shared blocks
    pq.write_table(_docs_table(texts), tmp_path / "documents.parquet")
    a = T.dedup_paragraphs(str(tmp_path), block_words=8, nparts=1)
    b = T.dedup_paragraphs(str(tmp_path), block_words=8, nparts=13)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_events_rolling_window_hand_case(ray_session, tmp_path):
    """RANGE semantics: equal timestamps are peers (identical windows),
    the 10-minute boundary is inclusive, users never mix."""
    ts = pd.to_datetime([
        "2024-01-01 00:00:00",   # u1
        "2024-01-01 00:05:00",   # u1
        "2024-01-01 00:05:00",   # u1 peer of the above
        "2024-01-01 00:10:00",   # u1 boundary: includes 00:00:00
        "2024-01-01 00:30:00",   # u1 isolated
        "2024-01-01 00:05:00",   # u2
    ]).astype("datetime64[us]")
    t = pa.table({
        "event_id": pa.array(range(6), type=pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array([1, 1, 1, 1, 1, 2], type=pa.int64()),
        "event_type": pa.array(["view"] * 6),
        "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0, 32.0]),
        "props": pa.array(["{}"] * 6),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    from visiblev8_crawler_ray.pipelines import analytics as A
    out = A.events_rolling_window(str(tmp_path)).sort_values(
        "event_id").reset_index(drop=True)
    assert list(out.w_cnt) == [1, 3, 3, 4, 1, 1]
    assert list(out.w_sum_cents) == [100, 700, 700, 1500, 1600, 3200]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    odf = con.sql(R.oracle_sql()["events_rolling_window"]).df()
    pd.testing.assert_frame_equal(_norm(out), _norm(odf),
                                  check_dtype=False, check_exact=True)


def test_video_codec_roundtrip_and_determinism():
    from visiblev8_crawler_ray.functions.png import decode_png
    from visiblev8_crawler_ray.functions.video import (
        FRAME_H, FRAME_W, encode_frames, iter_frames, synth_video)

    payload = synth_video("doc-abc")
    assert payload == synth_video("doc-abc")          # idempotent rewrite
    frames = list(iter_frames(payload))
    assert 5 <= len(frames) <= 11
    for i, fr in enumerate(frames):
        px = decode_png(fr)
        assert px.shape == (FRAME_H, FRAME_W, 3)
    # frames drift: consecutive frames differ
    assert frames[0] != frames[1]
    # container round-trip is exact
    assert list(iter_frames(encode_frames(frames))) == frames


def test_video_frames_e2e(ray_session, tmp_path):
    import shutil

    from visiblev8_crawler_ray import synth
    from visiblev8_crawler_ray.config import CrawlConfig
    from visiblev8_crawler_ray.pipelines.multimodal import video_frames

    from visiblev8_crawler_ray.pipelines.crawl import run_crawl

    cfg = CrawlConfig(max_depth=0, max_waves=1, max_per_host_per_wave=100)
    seeds = synth.seeds_table(np.arange(60), cfg)
    root = str(tmp_path / "store")
    shutil.rmtree(root, ignore_errors=True)
    run = run_crawl(seeds, cfg, root, blob_artifacts=True)
    docs = run.docs()
    out = video_frames(docs, root + "/blobs", every_k=2, max_frames=4)
    n_video = sum(
        1 for spans in docs.to_pandas()["spans"]
        for s in spans if s["kind"] == "media/video")
    assert n_video > 0
    # per video: min(max_frames, ceil(n_frames / every_k)) sampled rows
    per = out.groupby("media_ref")
    assert len(per) == n_video
    for _, g in per:
        nfr = int(g["n_frames"].iloc[0])
        assert len(g) == min(4, -(-nfr // 2))
        assert list(g["frame_idx"]) == list(range(0, 2 * len(g), 2))
    assert (out["width"] == 8).all() and (out["height"] == 6).all()
    assert ((out["px_mean"] > 0) & (out["px_mean"] < 255)).all()
    again = video_frames(docs, root + "/blobs", every_k=2, max_frames=4)
    assert out.equals(again)
