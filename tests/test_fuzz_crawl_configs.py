"""Property fuzz for the crawl engine itself: RANDOMIZED CrawlConfigs
and seed sets vs the sequential oracle.

The fixed-config e2e suite (test_crawl_vs_oracle.py) pins one politeness
budget; this campaign samples the config space — depth/wave limits,
branching, per-host windows and total budgets, both wave paths
(small_wave_threshold 0 vs default), both seen fronts, shard counts and
a forced exact-tier spill — and asserts the full equality contract
(URL-seen set, crawl order, per-wave metrics, span sequences) on every
draw.  Non-contiguous random seed ids additionally stress the
first-wins int64 pack and the child-key derivation."""

import shutil
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
from visiblev8_crawler_ray import synth  # noqa: E402
from visiblev8_crawler_ray.config import CrawlConfig  # noqa: E402
from visiblev8_crawler_ray.oracle import crawl_oracle  # noqa: E402
from visiblev8_crawler_ray.pipelines.crawl import run_crawl  # noqa: E402


def _random_config(rng) -> CrawlConfig:
    return CrawlConfig(
        max_depth=int(rng.integers(0, 3)),
        max_waves=int(rng.integers(1, 6)),
        branching=int(rng.integers(1, 6)),
        max_per_host_per_wave=int(rng.integers(3, 40)),
        max_per_host_total=(None if rng.random() < 0.5
                            else int(rng.integers(5, 60))),
        small_wave_threshold=int(rng.choice([0, 200_000])),
        n_seen_shards=int(rng.choice([1, 4, 8])),
        seen_front=str(rng.choice(["bloom", "cuckoo"])),
        seen_spill_max_mem_keys=(None if rng.random() < 0.5 else 16),
    )


def _span_tuples(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in spans]


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_random_config_matches_oracle(ray_session, tmp_path, seed):
    rng = np.random.default_rng(1000 + seed)
    cfg = _random_config(rng)
    n_seeds = int(rng.integers(15, 90))
    # non-contiguous ids; bound keeps seed*64^depth*256 < 2^63
    ids = np.sort(rng.choice(1 << 20, size=n_seeds, replace=False))
    seeds = synth.seeds_table(ids, cfg)
    orc = crawl_oracle(
        list(zip(seeds["seed_id"].to_pylist(), seeds["url"].to_pylist())),
        cfg, seed_actions=seeds["actions"].to_pylist())

    store = str(tmp_path / f"fuzz{seed}")
    shutil.rmtree(store, ignore_errors=True)
    run = run_crawl(seeds, cfg, store)

    # URL-seen set + first-wins attribution
    seen = run.urlseen().to_pandas().sort_values("first_seq")
    o_seen = pd.DataFrame(orc.urlseen).sort_values("first_seq")
    assert set(seen.url_key) == set(o_seen.url_key), cfg
    assert list(seen.url) == list(o_seen.url), cfg
    assert list(seen.first_wave) == list(o_seen.first_wave), cfg

    # crawl order (global seq over fetched rows)
    log = run.crawl_log().to_pandas()
    olog = pd.DataFrame(orc.crawl_log)
    cols = ["seq", "wave", "host", "url", "url_key", "doc_id", "depth",
            "fetch_vtime", "status", "n_spans", "n_links", "retry_count"]
    fetched = log[log.seq >= 0].sort_values("seq")
    ofetched = olog[olog.seq >= 0].sort_values("seq")
    assert fetched[cols].values.tolist() == ofetched[cols].values.tolist(), cfg
    assert sorted(log[log.seq < 0].url) == sorted(olog[olog.seq < 0].url), cfg

    # per-wave metrics (admissions, drops, budget accounting)
    metrics = sorted(run.metrics().to_pylist(), key=lambda r: r["wave"])
    assert metrics == orc.metrics, cfg

    # span sequences (the per-row interleaved-document invariant)
    docs = run.docs().to_pandas()
    odocs = {d["doc_id"]: d["spans"] for d in orc.docs}
    assert set(docs.doc_id) == set(odocs), cfg
    for did, spans in zip(docs.doc_id, docs.spans):
        assert _span_tuples(spans) == _span_tuples(odocs[did]), (cfg, did)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_random_continuous_admission_matches_oracle(ray_session,
                                                    tmp_path, seed):
    """Continuous-admission fuzz: random configs, a random crash wave,
    and a random second seed batch arriving between waves — the full
    equality contract must hold against the oracle's staged-arrival
    simulation (r5 feature hardening: the fixed-scenario tests in
    test_crawl_vs_oracle.py pin two shapes; this samples the space)."""
    rng = np.random.default_rng(7200 + seed)
    cfg = _random_config(rng)
    # arrivals need a resumable wave after the crash: ensure >= 2 waves
    cfg = CrawlConfig(**{**cfg.__dict__, "max_waves":
                         int(rng.integers(3, 6))})
    n_a = int(rng.integers(15, 60))
    n_b = int(rng.integers(5, 40))
    ids_a = np.sort(rng.choice(1 << 18, size=n_a, replace=False))
    # second batch: later id range (arrival order == id order contract),
    # with a chance of overlapping URLs via duplicate id re-derivation
    ids_b = np.sort(rng.choice(1 << 18, size=n_b, replace=False)
                    + (1 << 18))
    seeds_a = synth.seeds_table(ids_a, cfg)
    seeds_b = synth.seeds_table(ids_b, cfg)

    stop = int(rng.integers(0, max(1, cfg.max_waves - 1)))
    store = str(tmp_path / f"follow{seed}")
    shutil.rmtree(store, ignore_errors=True)
    first = run_crawl(seeds_a, cfg, store, stop_after_wave=stop)
    arrive_at = first.waves  # next uncommitted wave
    if arrive_at >= cfg.max_waves:
        pytest.skip("crawl consumed every wave before the arrival")
    run = run_crawl(seeds_b, cfg, store, admit_new_seeds=True)

    orc = crawl_oracle(
        list(zip(seeds_a["seed_id"].to_pylist(),
                 seeds_a["url"].to_pylist())), cfg,
        seed_actions=seeds_a["actions"].to_pylist(),
        arrivals={arrive_at: list(zip(
            seeds_b["seed_id"].to_pylist(),
            seeds_b["url"].to_pylist()))},
        arrival_actions={arrive_at: seeds_b["actions"].to_pylist()},
    )

    seen = run.urlseen().to_pandas().sort_values("first_seq")
    o_seen = pd.DataFrame(orc.urlseen).sort_values("first_seq")
    assert set(seen.url_key) == set(o_seen.url_key), cfg
    assert list(seen.url) == list(o_seen.url), cfg
    assert list(seen.first_wave) == list(o_seen.first_wave), cfg
    metrics = sorted(run.metrics().to_pylist(), key=lambda r: r["wave"])
    assert metrics == orc.metrics, cfg
    docs = run.docs().to_pandas()
    odocs = {d["doc_id"]: d["spans"] for d in orc.docs}
    assert set(docs.doc_id) == set(odocs), cfg
    for did, spans in zip(docs.doc_id, docs.spans):
        assert _span_tuples(spans) == _span_tuples(odocs[did]), (cfg, did)
