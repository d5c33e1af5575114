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
