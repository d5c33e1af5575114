"""E2E: the Ray crawl pipeline equals the sequential oracle.

Checks the driver-mandated invariants (BASELINE.md "Correctness gate"):
- final URL-seen set equality,
- crawl-order equality (ordered URL list + dense seq),
- per-row span-sequence equality (kind, text, media_ref, offset),
- per-wave metrics equality,
- determinism across executor parallelism (different batch sizes /
  actor-pool widths must not change any output).
"""

import shutil

import numpy as np
import pandas as pd
import pytest

from visiblev8_crawler_ray import synth
from visiblev8_crawler_ray.config import CrawlConfig
from visiblev8_crawler_ray.oracle import crawl_oracle
from visiblev8_crawler_ray.pipelines.crawl import run_crawl

CFG = CrawlConfig(max_depth=1, max_waves=4, max_per_host_per_wave=15)


@pytest.fixture(scope="module")
def oracle_result():
    seeds = synth.seeds_table(np.arange(80), CFG)
    return seeds, crawl_oracle(
        list(zip(seeds["seed_id"].to_pylist(), seeds["url"].to_pylist())), CFG,
        seed_actions=seeds["actions"].to_pylist(),
    )


def _run(seeds, tmpdir, **kw):
    shutil.rmtree(tmpdir, ignore_errors=True)
    return run_crawl(seeds, CFG, tmpdir, **kw)


def _span_tuples(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


def test_crawl_matches_oracle(oracle_result, tmp_path):
    seeds, orc = oracle_result
    run = _run(seeds, str(tmp_path / "store"), fetch_concurrency=2,
               fetch_batch_size=64)

    seen = run.urlseen().to_pandas().sort_values("first_seq")
    o_seen = pd.DataFrame(orc.urlseen).sort_values("first_seq")
    assert set(seen.url_key) == set(o_seen.url_key)
    assert list(seen.url) == list(o_seen.url)
    assert list(seen.first_seq) == list(o_seen.first_seq)
    assert list(seen.first_wave) == list(o_seen.first_wave)

    metrics = sorted(run.metrics().to_pylist(), key=lambda r: r["wave"])
    assert metrics == orc.metrics

    docs = run.docs().to_pandas()
    odocs = {d["doc_id"]: d["spans"] for d in orc.docs}
    assert set(docs.doc_id) == set(odocs)
    for did, spans in zip(docs.doc_id, docs.spans):
        assert _span_tuples(spans) == _span_tuples(odocs[did]), did

    log = run.crawl_log().to_pandas()
    olog = pd.DataFrame(orc.crawl_log)
    fetched = log[log.seq >= 0].sort_values("seq")
    ofetched = olog[olog.seq >= 0].sort_values("seq")
    cols = ["seq", "wave", "host", "url", "url_key", "doc_id", "depth",
            "fetch_vtime", "status", "n_spans", "n_links", "retry_count"]
    assert fetched[cols].values.tolist() == ofetched[cols].values.tolist()
    # retry ledger semantics: retry_count == the per-URL predicate, the
    # wave metric counts them, and a transient hit keeps status='ok'
    from visiblev8_crawler_ray.oracle import fetch_retries
    assert all(int(r.retry_count) == fetch_retries(r.url)
               for r in fetched.itertuples())
    mdf = pd.DataFrame(sorted(run.metrics().to_pylist(),
                              key=lambda r: r["wave"]))
    per_wave = fetched.groupby("wave")["retry_count"].apply(
        lambda s: int((s > 0).sum())).to_dict()
    assert all(int(r.retried) == per_wave.get(int(r.wave), 0)
               for r in mdf.itertuples())
    blocked = sorted(log[log.seq < 0].url)
    oblocked = sorted(olog[olog.seq < 0].url)
    assert blocked == oblocked


def test_determinism_across_parallelism(oracle_result, tmp_path):
    """Same output under different actor-pool widths and batch sizes —
    the scheduling-independence requirement of SURVEY.md §4.3."""
    seeds, orc = oracle_result
    o_order = [r["url"] for r in sorted(orc.urlseen, key=lambda r: r["first_seq"])]
    for i, kw in enumerate(
        [dict(fetch_concurrency=1, fetch_batch_size=17),
         dict(fetch_concurrency=3, fetch_batch_size=200)]
    ):
        run = _run(seeds, str(tmp_path / f"s{i}"), **kw)
        seen = run.urlseen().to_pandas().sort_values("first_seq")
        assert list(seen.url) == o_order


def test_resume_no_refetch_no_double_count(oracle_result, tmp_path):
    seeds, orc = oracle_result
    full = _run(seeds, str(tmp_path / "full"))
    interrupted = str(tmp_path / "interrupted")
    shutil.rmtree(interrupted, ignore_errors=True)
    run_crawl(seeds, CFG, interrupted, stop_after_wave=0)
    resumed = run_crawl(seeds, CFG, interrupted)

    f_docs = sorted(full.docs().to_pandas().doc_id)
    r_docs = sorted(resumed.docs().to_pandas().doc_id)
    assert f_docs == r_docs
    assert len(r_docs) == len(set(r_docs))  # no duplicate fetches
    assert sorted(full.metrics().to_pylist(), key=lambda r: r["wave"]) == \
        sorted(resumed.metrics().to_pylist(), key=lambda r: r["wave"])
    f_seen = full.urlseen().to_pandas().sort_values("first_seq")
    r_seen = resumed.urlseen().to_pandas().sort_values("first_seq")
    assert f_seen[["url_key", "first_wave", "first_seq"]].values.tolist() == \
        r_seen[["url_key", "first_wave", "first_seq"]].values.tolist()


def test_action_replay_and_fallback(oracle_result, tmp_path):
    """M6: actioned seeds emit action/click + action/nav spans; replay
    failures fall back to a direct crawl (span-identical to a no-actions
    fetch); fetch_mode matches the oracle per URL."""
    import pandas as pd

    seeds, orc = oracle_result
    run = _run(seeds, str(tmp_path / "acts"), fetch_concurrency=2,
               fetch_batch_size=64)
    fetch = run.store.read_dataset(
        "fetch", columns=["url", "status", "fetch_mode", "spans"]).to_pandas()
    olog = pd.DataFrame([r for r in orc.crawl_log if r["status"] == "ok"])
    got = fetch[fetch.status == "ok"].set_index("url")
    modes = got["fetch_mode"].to_dict()
    omodes = dict(zip(olog.url, olog.fetch_mode))
    assert modes == omodes
    # the synthetic seed set must actually exercise all three modes
    assert {"direct", "actions"} <= set(modes.values())
    # actioned docs carry action spans; fallback/direct docs none
    for url, spans in got["spans"].items():
        kinds = {s["kind"] for s in spans}
        if modes[url] == "actions":
            assert "action/click" in kinds and "action/nav" in kinds, url
        else:
            assert "action/click" not in kinds, url


def test_resume_after_midwave_crash(oracle_result, tmp_path):
    """Crash BETWEEN a wave's sub-table commits and its metrics commit:
    blocked/fetch/urlseen for wave k are on disk but metrics is not, so
    the resume must re-run wave k WITHOUT treating its URLs as seen
    (the restore reads only waves <= the last metrics-committed wave)."""
    import os

    seeds, orc = oracle_result
    full = _run(seeds, str(tmp_path / "mfull"))
    crashed = str(tmp_path / "midwave")
    shutil.rmtree(crashed, ignore_errors=True)
    run_crawl(seeds, CFG, crashed, stop_after_wave=1)
    # simulate a crash just before wave 1's metrics commit: wave-1 data
    # partitions exist, the wave-1 metrics manifest does not
    os.remove(os.path.join(crashed, "metrics", "wave=1", "_MANIFEST.json"))
    resumed = run_crawl(seeds, CFG, crashed)

    f_docs = sorted(full.docs().to_pandas().doc_id)
    r_docs = sorted(resumed.docs().to_pandas().doc_id)
    assert f_docs == r_docs
    assert len(r_docs) == len(set(r_docs))
    assert sorted(full.metrics().to_pylist(), key=lambda r: r["wave"]) == \
        sorted(resumed.metrics().to_pylist(), key=lambda r: r["wave"])
    f_seen = full.urlseen().to_pandas().sort_values("first_seq")
    r_seen = resumed.urlseen().to_pandas().sort_values("first_seq")
    assert f_seen[["url_key", "first_wave", "first_seq"]].values.tolist() == \
        r_seen[["url_key", "first_wave", "first_seq"]].values.tolist()


def test_scale_path_matches_oracle(oracle_result, tmp_path):
    """Force the distributed shuffle path (small_wave_threshold=0) and
    require identical output — the adaptive small/scale split must be
    behaviorally invisible."""
    from dataclasses import replace

    seeds, orc = oracle_result
    cfg = replace(CFG, small_wave_threshold=0)
    import shutil as _sh
    root = str(tmp_path / "scale")
    _sh.rmtree(root, ignore_errors=True)
    run = run_crawl(seeds, cfg, root, fetch_concurrency=2, fetch_batch_size=64)
    seen = run.urlseen().to_pandas().sort_values("first_seq")
    o_seen = pd.DataFrame(orc.urlseen).sort_values("first_seq")
    assert list(seen.url) == list(o_seen.url)
    assert sorted(run.metrics().to_pylist(), key=lambda r: r["wave"]) == orc.metrics


def test_cuckoo_front_matches_oracle(oracle_result, tmp_path):
    """seen_front='cuckoo' must be behaviorally invisible: the front is
    an accelerator, the exact tier decides membership, so seen set and
    crawl order are identical to the oracle (and to the bloom runs)."""
    from dataclasses import replace

    seeds, orc = oracle_result
    cfg = replace(CFG, seen_front="cuckoo")
    root = str(tmp_path / "cuckoo")
    run = run_crawl(seeds, cfg, root, fetch_concurrency=2,
                    fetch_batch_size=64)
    seen = run.urlseen().to_pandas().sort_values("first_seq")
    o_seen = pd.DataFrame(orc.urlseen).sort_values("first_seq")
    assert set(seen.url_key) == set(o_seen.url_key)
    assert list(seen.url) == list(o_seen.url)
    assert sorted(run.metrics().to_pylist(), key=lambda r: r["wave"]) == \
        orc.metrics


def test_seen_spill_matches_oracle_and_resumes(oracle_result, tmp_path):
    """Force the exact-tier spill (tiny max_mem_keys): every shard spills
    its sorted key array to parquet runs each wave, membership probes go
    bloom-first + range-pruned searchsorted into the runs, and lazy
    compaction merges them — output and resume must equal the in-memory
    tier exactly."""
    import os
    from dataclasses import replace

    seeds, orc = oracle_result
    cfg = replace(CFG, seen_spill_max_mem_keys=10)
    root = str(tmp_path / "spill")
    shutil.rmtree(root, ignore_errors=True)
    run = run_crawl(seeds, cfg, root, fetch_concurrency=2,
                    fetch_batch_size=64)
    # the spill actually happened
    spill_dir = os.path.join(root, "seen_spill")
    assert os.path.isdir(spill_dir) and any(
        f.endswith(".parquet") for f in os.listdir(spill_dir))
    seen = run.urlseen().to_pandas().sort_values("first_seq")
    o_seen = pd.DataFrame(orc.urlseen).sort_values("first_seq")
    assert list(seen.url) == list(o_seen.url)
    assert sorted(run.metrics().to_pylist(), key=lambda r: r["wave"]) == \
        orc.metrics

    # kill-and-resume with the spill tier active
    crashed = str(tmp_path / "spill_crash")
    shutil.rmtree(crashed, ignore_errors=True)
    run_crawl(seeds, cfg, crashed, stop_after_wave=0)
    resumed = run_crawl(seeds, cfg, crashed)
    assert sorted(resumed.docs().to_pandas().doc_id) == \
        sorted(run.docs().to_pandas().doc_id)
    assert sorted(resumed.metrics().to_pylist(), key=lambda r: r["wave"]) == \
        orc.metrics


def test_resume_after_midwave_crash_scale_path(oracle_result, tmp_path):
    """ADVICE r2: the scale path (small_wave_threshold=0) has a distinct
    commit ordering (blocked committed mid-wave; fetch/urlseen
    side-written then committed before metrics) — crash it between the
    sub-table commits and the metrics commit and require identical
    docs/metrics/urlseen after resume."""
    import os
    from dataclasses import replace

    seeds, orc = oracle_result
    cfg = replace(CFG, small_wave_threshold=0)
    full_root = str(tmp_path / "sfull")
    shutil.rmtree(full_root, ignore_errors=True)
    full = run_crawl(seeds, cfg, full_root)
    crashed = str(tmp_path / "smidwave")
    shutil.rmtree(crashed, ignore_errors=True)
    run_crawl(seeds, cfg, crashed, stop_after_wave=1)
    os.remove(os.path.join(crashed, "metrics", "wave=1", "_MANIFEST.json"))
    resumed = run_crawl(seeds, cfg, crashed)

    f_docs = sorted(full.docs().to_pandas().doc_id)
    r_docs = sorted(resumed.docs().to_pandas().doc_id)
    assert f_docs == r_docs
    assert len(r_docs) == len(set(r_docs))
    assert sorted(full.metrics().to_pylist(), key=lambda r: r["wave"]) == \
        sorted(resumed.metrics().to_pylist(), key=lambda r: r["wave"])
    f_seen = full.urlseen().to_pandas().sort_values("first_seq")
    r_seen = resumed.urlseen().to_pandas().sort_values("first_seq")
    assert f_seen[["url_key", "first_wave", "first_seq"]].values.tolist() == \
        r_seen[["url_key", "first_wave", "first_seq"]].values.tolist()


def test_per_host_total_budget_matches_oracle(oracle_result, tmp_path):
    """cfg.max_per_host_total: rows past a host's remaining mission-wide
    budget drop for good (status='budget_exhausted', marked seen,
    counted in metrics.budget_dropped) — on BOTH wave paths, equal to
    the oracle."""
    from dataclasses import replace

    seeds, _ = oracle_result
    cfg = replace(CFG, max_per_host_total=3)
    orc = crawl_oracle(
        list(zip(seeds["seed_id"].to_pylist(), seeds["url"].to_pylist())),
        cfg, seed_actions=seeds["actions"].to_pylist())
    # the fixture must actually exercise the budget
    assert sum(m["budget_dropped"] for m in orc.metrics) > 0
    for sub, extra in (("bud_small", {}),
                       ("bud_scale", {"small_wave_threshold": 0})):
        c = replace(cfg, **extra)
        root = str(tmp_path / sub)
        shutil.rmtree(root, ignore_errors=True)
        run = run_crawl(seeds, c, root, fetch_concurrency=2,
                        fetch_batch_size=64)
        seen = run.urlseen().to_pandas().sort_values("first_seq")
        o_seen = pd.DataFrame(orc.urlseen).sort_values("first_seq")
        assert list(seen.url) == list(o_seen.url), sub
        assert sorted(run.metrics().to_pylist(),
                      key=lambda r: r["wave"]) == orc.metrics, sub
        log = run.crawl_log().to_pandas()
        bud = log[log.status == "budget_exhausted"]
        obud = sorted(r["url"] for r in orc.crawl_log
                      if r["status"] == "budget_exhausted")
        assert sorted(bud.url) == obud, sub
        # the budget is a hard per-host admission ceiling
        assert log[log.seq >= 0].groupby("host").size().max() <= 3, sub


def test_per_host_total_budget_resume(oracle_result, tmp_path):
    """Resume must restore the per-host budget state from the committed
    fetch partitions: stop after wave 0 (budgets partially consumed),
    resume, and require metrics/docs identical to an uninterrupted run
    — on both wave paths."""
    from dataclasses import replace

    seeds, _ = oracle_result
    for sub, extra in (("b_small", {}),
                       ("b_scale", {"small_wave_threshold": 0})):
        cfg = replace(CFG, max_per_host_total=3, **extra)
        full_root = str(tmp_path / f"{sub}_full")
        shutil.rmtree(full_root, ignore_errors=True)
        full = run_crawl(seeds, cfg, full_root)
        part = str(tmp_path / f"{sub}_part")
        shutil.rmtree(part, ignore_errors=True)
        run_crawl(seeds, cfg, part, stop_after_wave=0)
        resumed = run_crawl(seeds, cfg, part)
        assert sorted(full.docs().to_pandas().doc_id) == \
            sorted(resumed.docs().to_pandas().doc_id), sub
        assert sorted(full.metrics().to_pylist(), key=lambda r: r["wave"]) \
            == sorted(resumed.metrics().to_pylist(),
                      key=lambda r: r["wave"]), sub


def test_action_join_mode_matches_oracle(oracle_result, tmp_path):
    """Force the hash-partitioned actions join (actions_broadcast_max=0):
    fetch modes and span sequences must equal the broadcast path / the
    oracle exactly, on both the small and the scale wave path."""
    from dataclasses import replace

    seeds, orc = oracle_result
    for sub, extra in (("ajoin", {}), ("ajoin_scale",
                                      {"small_wave_threshold": 0})):
        cfg = replace(CFG, actions_broadcast_max=0, **extra)
        root = str(tmp_path / sub)
        shutil.rmtree(root, ignore_errors=True)
        run = run_crawl(seeds, cfg, root, fetch_concurrency=2,
                        fetch_batch_size=64)
        fetch = run.store.read_dataset(
            "fetch", columns=["url", "status", "fetch_mode"]).to_pandas()
        olog = pd.DataFrame([r for r in orc.crawl_log if r["status"] == "ok"])
        modes = fetch[fetch.status == "ok"].set_index("url")[
            "fetch_mode"].to_dict()
        assert modes == dict(zip(olog.url, olog.fetch_mode)), sub
        assert "actions" in set(modes.values()), sub
        docs = run.docs().to_pandas()
        odocs = {d["doc_id"]: d["spans"] for d in orc.docs}
        assert set(docs.doc_id) == set(odocs), sub
        for did, spans in zip(docs.doc_id, docs.spans):
            assert _span_tuples(spans) == _span_tuples(odocs[did]), (sub, did)


def test_resume_after_midwave_crash_scale_path(oracle_result, tmp_path):
    """VERDICT r3 #7: the mid-wave crash-resume contract must hold on
    the DISTRIBUTED control plane too (small_wave_threshold=0 forces
    every wave through the shuffle path): wave-1 data partitions are on
    disk but its metrics manifest is not, so the resume re-runs wave 1
    without double-counting or treating its URLs as seen."""
    import os
    from dataclasses import replace

    seeds, orc = oracle_result
    cfg = replace(CFG, small_wave_threshold=0)
    full_root = str(tmp_path / "sfull")
    shutil.rmtree(full_root, ignore_errors=True)
    full = run_crawl(seeds, cfg, full_root)
    crashed = str(tmp_path / "smidwave")
    shutil.rmtree(crashed, ignore_errors=True)
    run_crawl(seeds, cfg, crashed, stop_after_wave=1)
    os.remove(os.path.join(crashed, "metrics", "wave=1", "_MANIFEST.json"))
    resumed = run_crawl(seeds, cfg, crashed)

    f_docs = sorted(full.docs().to_pandas().doc_id)
    r_docs = sorted(resumed.docs().to_pandas().doc_id)
    assert f_docs == r_docs
    assert len(r_docs) == len(set(r_docs))
    assert sorted(full.metrics().to_pylist(), key=lambda r: r["wave"]) == \
        sorted(resumed.metrics().to_pylist(), key=lambda r: r["wave"])
    assert sorted(resumed.metrics().to_pylist(),
                  key=lambda r: r["wave"]) == orc.metrics
    f_seen = full.urlseen().to_pandas().sort_values("first_seq")
    r_seen = resumed.urlseen().to_pandas().sort_values("first_seq")
    assert f_seen[["url_key", "first_wave", "first_seq"]].values.tolist() == \
        r_seen[["url_key", "first_wave", "first_seq"]].values.tolist()


def _full_contract_check(run, orc):
    seen = run.urlseen().to_pandas().sort_values("first_seq")
    o_seen = pd.DataFrame(orc.urlseen).sort_values("first_seq")
    assert set(seen.url_key) == set(o_seen.url_key)
    assert list(seen.url) == list(o_seen.url)
    assert list(seen.first_wave) == list(o_seen.first_wave)
    metrics = sorted(run.metrics().to_pylist(), key=lambda r: r["wave"])
    assert metrics == orc.metrics
    docs = run.docs().to_pandas()
    odocs = {d["doc_id"]: d["spans"] for d in orc.docs}
    assert set(docs.doc_id) == set(odocs)
    for did, spans in zip(docs.doc_id, docs.spans):
        assert _span_tuples(spans) == _span_tuples(odocs[did]), did


def test_continuous_admission_mid_crawl(ray_session, tmp_path):
    """Seeds arriving BETWEEN waves (the reference's always-on queue,
    vv8_worker/app.py:16-28): a resumed run with admit_new_seeds=True
    must equal the oracle given the same staged arrivals."""
    seeds_a = synth.seeds_table(np.arange(60), CFG)
    seeds_b = synth.seeds_table(np.arange(100, 130), CFG)
    store = str(tmp_path / "follow1")

    run_crawl(seeds_a, CFG, store, stop_after_wave=0)
    run = run_crawl(seeds_b, CFG, store, admit_new_seeds=True)

    orc = crawl_oracle(
        list(zip(seeds_a["seed_id"].to_pylist(),
                 seeds_a["url"].to_pylist())), CFG,
        seed_actions=seeds_a["actions"].to_pylist(),
        arrivals={1: list(zip(seeds_b["seed_id"].to_pylist(),
                              seeds_b["url"].to_pylist()))},
        arrival_actions={1: seeds_b["actions"].to_pylist()},
    )
    _full_contract_check(run, orc)


def test_continuous_admission_after_exhaustion(ray_session, tmp_path):
    """Seeds arriving after the frontier ran dry: the resumed run opens
    a fresh wave with just the arrivals; same oracle contract."""
    cfg = CrawlConfig(max_depth=0, max_waves=6,
                      max_per_host_per_wave=15)
    seeds_a = synth.seeds_table(np.arange(40), cfg)
    seeds_b = synth.seeds_table(np.arange(200, 230), cfg)
    store = str(tmp_path / "follow2")

    first = run_crawl(seeds_a, cfg, store)
    exhausted_at = first.waves  # frontier dry after this many waves
    run = run_crawl(seeds_b, cfg, store, admit_new_seeds=True)

    orc = crawl_oracle(
        list(zip(seeds_a["seed_id"].to_pylist(),
                 seeds_a["url"].to_pylist())), cfg,
        seed_actions=seeds_a["actions"].to_pylist(),
        arrivals={exhausted_at: list(zip(
            seeds_b["seed_id"].to_pylist(),
            seeds_b["url"].to_pylist()))},
        arrival_actions={exhausted_at: seeds_b["actions"].to_pylist()},
    )
    _full_contract_check(run, orc)
