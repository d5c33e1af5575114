"""TableStore.compact: per-partition small-file rewrite preserves rows,
manifests and all downstream reads; crash recovery restores a parked
partition."""

import os
import shutil

import numpy as np
import pandas as pd

from visiblev8_crawler_ray import synth
from visiblev8_crawler_ray.config import CrawlConfig
from visiblev8_crawler_ray.pipelines.crawl import run_crawl

CFG = CrawlConfig(max_depth=1, max_waves=3, max_per_host_per_wave=15)


def _spans_key(df: pd.DataFrame) -> list:
    out = []
    for r in df.sort_values("doc_id").itertuples():
        out.append((r.doc_id,
                    tuple((s["kind"], s["text"], s["media_ref"], s["offset"])
                          for s in r.spans)))
    return out


def test_compact_preserves_reads_and_reduces_files(tmp_path):
    seeds = synth.seeds_table(np.arange(60), CFG)
    root = str(tmp_path / "store")
    run = run_crawl(seeds, CFG, root, fetch_concurrency=2,
                    fetch_batch_size=32)
    before_docs = run.docs().to_pandas()
    before_metrics = sorted(run.metrics().to_pylist(), key=lambda r: r["wave"])
    before_seen = sorted(run.urlseen().to_pandas()["url_key"])

    fetch_dir = run.store.part_dir("fetch", 0)
    files_before = len([f for f in os.listdir(fetch_dir)
                        if f.endswith(".parquet")])
    assert files_before > 1  # the crawl side-writes one file per task

    done = run.store.compact("fetch", target_rows=10 ** 9)
    assert done[0][0] == files_before and done[0][1] == 1

    after_docs = run.docs().to_pandas()
    assert _spans_key(after_docs) == _spans_key(before_docs)
    assert sorted(run.metrics().to_pylist(),
                  key=lambda r: r["wave"]) == before_metrics
    assert sorted(run.urlseen().to_pandas()["url_key"]) == before_seen
    # manifest survives with lineage + compaction record
    man = run.store.read_manifest("fetch", 0)
    assert man["compacted"]["files_before"] == files_before

    # resume against the compacted store stays a no-op with equal output
    run2 = run_crawl(seeds, CFG, root)
    assert _spans_key(run2.docs().to_pandas()) == _spans_key(before_docs)


def test_compact_crash_recovery(tmp_path):
    seeds = synth.seeds_table(np.arange(40), CFG)
    root = str(tmp_path / "store")
    run = run_crawl(seeds, CFG, root, fetch_concurrency=2,
                    fetch_batch_size=32)
    before = _spans_key(run.docs().to_pandas())

    # simulate a crash between the two renames: live dir parked as .old
    d = run.store.part_dir("fetch", 1)
    os.rename(d, d + ".old")
    assert not os.path.exists(d)

    done = run.store.compact("fetch", target_rows=10 ** 9)
    assert os.path.exists(d) and not os.path.exists(d + ".old")
    assert _spans_key(run.docs().to_pandas()) == before
    assert set(done) == set(run.store.committed_waves("fetch"))


def test_compact_crash_windows_all(tmp_path):
    """Every interruption window of the compaction swap must be repaired
    by the NEXT store open (reader-side), not just by a later compact():
    a leaked tmp dir, a parked .old with live missing, and a stale .old
    next to a completed swap must all leave reads working."""
    from visiblev8_crawler_ray.store import TableStore

    seeds = synth.seeds_table(np.arange(40), CFG)
    root = str(tmp_path / "store")
    run = run_crawl(seeds, CFG, root, fetch_concurrency=2,
                    fetch_batch_size=32)
    before = _spans_key(run.docs().to_pandas())
    d0 = run.store.part_dir("fetch", 0)
    d1 = run.store.part_dir("fetch", 1)

    # window 1: tmp rewrite complete (incl. manifest) but never swapped
    tmp = d0 + ".compact-deadbeef"
    shutil.copytree(d0, tmp)
    # window 2: between the renames — live parked, tmp still present
    tmp2 = d1 + ".compact-cafecafe"
    shutil.copytree(d1, tmp2)
    os.rename(d1, d1 + ".old")

    store = TableStore(root)  # a fresh reader-side open repairs both
    assert not os.path.exists(tmp) and not os.path.exists(tmp2)
    assert os.path.exists(d1) and not os.path.exists(d1 + ".old")
    assert store.committed_waves("fetch") == run.store.committed_waves("fetch")
    assert _spans_key(run.docs().to_pandas()) == before

    # window 3: swap done, stale .old left behind
    shutil.copytree(d0, d0 + ".old")
    store2 = TableStore(root)
    assert not os.path.exists(d0 + ".old")
    assert _spans_key(run.docs().to_pandas()) == before


def test_committed_waves_ignores_non_wave_dirs(tmp_path):
    """A CONCURRENT reader (no recovery pass) must not trip over the
    sibling dirs a mid-swap crash leaves around."""
    from visiblev8_crawler_ray.store import TableStore

    seeds = synth.seeds_table(np.arange(40), CFG)
    root = str(tmp_path / "store")
    run = run_crawl(seeds, CFG, root, fetch_concurrency=2,
                    fetch_batch_size=32)
    waves = run.store.committed_waves("fetch")
    d0 = run.store.part_dir("fetch", 0)
    shutil.copytree(d0, d0 + ".old")
    shutil.copytree(d0, d0 + ".compact-deadbeef")
    # same store object, no fresh open: the parse must simply skip them
    assert run.store.committed_waves("fetch") == waves
