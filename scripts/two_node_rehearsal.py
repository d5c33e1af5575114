"""Two-node dress rehearsal (VERDICT r4 "Next" #9): start a local Ray
CLUSTER of two raylets (head + one worker joined over localhost), run
the crawl across it, and verify the full oracle-equality contract —
proving the wave loop, sharded seen actors, and store commits survive
real object transfer between nodes (the `ray job submit` fixed-cluster
shape the north rule targets, as close as one VM allows).

    python scripts/two_node_rehearsal.py [--cpus-per-node 4]

Exit code 0 = every check green.  Used by tests/test_two_node.py.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus-per-node", type=int, default=4)
    ap.add_argument("--port", type=int, default=6410)
    args = ap.parse_args()

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # the preset 'local' would bypass the cluster
    head = f"127.0.0.1:{args.port}"
    subprocess.run(["ray", "stop", "--force"], env=env,
                   capture_output=True)
    try:
        subprocess.run(
            ["ray", "start", "--head", f"--port={args.port}",
             f"--num-cpus={args.cpus_per_node}",
             "--include-dashboard=false",
             "--node-name=node-a"],
            env=env, check=True, capture_output=True, text=True)
        subprocess.run(
            ["ray", "start", f"--address={head}",
             f"--num-cpus={args.cpus_per_node}",
             "--node-name=node-b"],
            env=env, check=True, capture_output=True, text=True)

        import ray

        ray.init(address=head, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        nodes = [n for n in ray.nodes() if n["Alive"]]
        n_cpus = int(ray.cluster_resources().get("CPU", 0))
        print(f"cluster: {len(nodes)} nodes, {n_cpus} CPUs")
        assert len(nodes) == 2, f"expected 2 raylets, got {len(nodes)}"
        assert n_cpus == 2 * args.cpus_per_node

        import numpy as np
        import pandas as pd

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from visiblev8_crawler_ray import synth
        from visiblev8_crawler_ray.config import CrawlConfig
        from visiblev8_crawler_ray.oracle import crawl_oracle
        from visiblev8_crawler_ray.pipelines.crawl import run_crawl

        cfg = CrawlConfig(max_depth=1, max_waves=4,
                          max_per_host_per_wave=20,
                          small_wave_threshold=0)  # force the scale path
        seeds = synth.seeds_table(np.arange(120), cfg)
        store = "/tmp/vv8ray_two_node"
        shutil.rmtree(store, ignore_errors=True)

        t0 = time.time()
        run = run_crawl(seeds, cfg, store, fetch_concurrency=2,
                        fetch_batch_size=64)
        dt = time.time() - t0
        orc = crawl_oracle(
            list(zip(seeds["seed_id"].to_pylist(),
                     seeds["url"].to_pylist())), cfg,
            seed_actions=seeds["actions"].to_pylist())

        seen = run.urlseen().to_pandas().sort_values("first_seq")
        o_seen = pd.DataFrame(orc.urlseen).sort_values("first_seq")
        assert set(seen.url_key) == set(o_seen.url_key)
        assert list(seen.url) == list(o_seen.url), "order mismatch"
        metrics = sorted(run.metrics().to_pylist(),
                         key=lambda r: r["wave"])
        assert metrics == orc.metrics
        docs = run.docs().to_pandas()
        odocs = {d["doc_id"]: d["spans"] for d in orc.docs}
        assert set(docs.doc_id) == set(odocs)

        def tup(spans):
            return [(s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in spans]

        for did, spans in zip(docs.doc_id, docs.spans):
            assert tup(spans) == tup(odocs[did]), did

        # kill-and-resume across the SAME 2-node cluster
        shutil.rmtree(store, ignore_errors=True)
        run_crawl(seeds, cfg, store, stop_after_wave=0)
        run2 = run_crawl(seeds, cfg, store)
        m2 = sorted(run2.metrics().to_pylist(), key=lambda r: r["wave"])
        assert m2 == orc.metrics, "resume mismatch on 2-node cluster"

        print(f"TWO-NODE OK: {len(seen)} urls, {len(metrics)} waves, "
              f"{dt:.1f}s crawl, resume equal")
        ray.shutdown()
        return 0
    finally:
        subprocess.run(["ray", "stop", "--force"], env=env,
                       capture_output=True)


if __name__ == "__main__":
    sys.exit(main())
