"""Host-graph ops: edges must equal a naive per-row recompute via
synth.outlinks itself (the engine and its SQL twin share a vectorized
formula — this checks both against the generator), and the fixed-point
PageRank must track a float reference."""

import sys
from collections import Counter
from urllib.parse import urlparse

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

sys.path.insert(0, "/root/repo")
from visiblev8_crawler_ray import synth  # noqa: E402
from visiblev8_crawler_ray.config import CrawlConfig  # noqa: E402
from visiblev8_crawler_ray.pipelines import graph as G  # noqa: E402

CFG = CrawlConfig()


def _fake_log() -> pa.Table:
    hosts, urls, status = [], [], []
    for h in ["alpha.example", "src3.example", "src17.example"]:
        for p in [0, 7, 42, 9999, 123456]:
            hosts.append(h)
            urls.append(f"https://{h}/page/{p}")
            status.append("ok")
    # a failed fetch and a pageless URL must not / must-with-page-0 count
    hosts += ["alpha.example", "src3.example"]
    urls += ["https://alpha.example/page/5", "https://src3.example/"]
    status += ["failed", "ok"]
    return pa.table({"host": hosts, "url": urls, "status": status})


def test_host_edges_match_synth_outlinks(ray_session):
    log = _fake_log()
    edges = G.host_edges(rd.from_arrow(log), CFG)
    naive = Counter()
    for h, u, s in zip(log["host"].to_pylist(), log["url"].to_pylist(),
                       log["status"].to_pylist()):
        if s != "ok":
            continue
        page = synth.page_of(urlparse(u).path)
        for link in synth.outlinks(h, page, CFG):
            naive[(h, urlparse(link).hostname)] += 1
    got = {(r.src_host, r.dst_host): r.n_links
           for r in edges.itertuples()}
    assert got == dict(naive)


def test_pagerank_tracks_float_reference(ray_session):
    log = _fake_log()
    pr = G.host_pagerank(rd.from_arrow(log), CFG)
    edges = G.host_edges(rd.from_arrow(log), CFG)
    hosts = sorted(set(edges["src_host"]) | set(edges["dst_host"]))
    hidx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    w = Counter()
    for r in edges.itertuples():
        w[r.src_host] += r.n_links
    s = np.full(n, 1.0 / n)
    for _ in range(G.PR_ITERS):
        agg = np.zeros(n)
        for r in edges.itertuples():
            agg[hidx[r.dst_host]] += s[hidx[r.src_host]] * r.n_links \
                / w[r.src_host]
        s = 0.15 / n + 0.85 * agg
    got = pr.set_index("host")["score"].to_numpy() / G.PR_SCALE
    assert np.abs(got - s).max() < 1e-6
    # deterministic across runs
    pr2 = G.host_pagerank(rd.from_arrow(log), CFG)
    pd.testing.assert_frame_equal(pr, pr2, check_exact=True)
