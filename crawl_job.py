"""Crawl job entry point — `ray job submit` target.

    ray job submit --working-dir . -- \
        python crawl_job.py --seeds urls.txt --store /data/crawl1 \
            --max-depth 2 --max-waves 8

Seeds come from a newline URL file (S1), a Tranco-style CSV (S2), a
JSONL candidate file (S3), or `--n-synthetic N` (the deterministic
synthetic seed generator used by tests/bench).  The job resumes from a
committed store automatically; re-submitting after a failure never
refetches or double-counts (manifest-gated wave partitions).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--seeds", help="newline URL seed file")
    src.add_argument("--csv", help="Tranco-style CSV (rank,domain)")
    src.add_argument("--jsonl", help="JSONL candidate file")
    src.add_argument("--n-synthetic", type=int,
                     help="derive N deterministic synthetic seeds")
    ap.add_argument("--store", required=True, help="store root directory")
    ap.add_argument("--max-depth", type=int, default=2)
    ap.add_argument("--max-waves", type=int, default=8)
    ap.add_argument("--host-budget", type=int, default=None,
                    help="per-host TOTAL crawl budget across the mission "
                         "(default: uncapped)")
    ap.add_argument("--host-window", type=int, default=100,
                    help="max URLs per host per wave (politeness window)")
    ap.add_argument("--fetcher-mode", choices=["task", "actor"],
                    default="task")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="only for standalone runs; under `ray job submit` "
                         "the cluster's resources are used")
    ap.add_argument("--compact", type=int, metavar="TARGET_ROWS",
                    default=None,
                    help="after the crawl (or resume no-op), compact the "
                         "span tables' wave partitions to ~TARGET_ROWS-row "
                         "files (store maintenance; crash-safe)")
    ap.add_argument("--corpus", metavar="OUT_PARQUET", default=None,
                    help="after the crawl, run the end-to-end curation "
                         "(exact-dedup + quality filters + boilerplate "
                         "strip stats + global sequence packing) and "
                         "write the packed-corpus manifest parquet")
    ap.add_argument("--corpus-window", type=int, default=512,
                    help="pack window (tokens) for --corpus")
    ap.add_argument("--corpus-clean", action="store_true",
                    help="with --corpus: run the PRODUCTION chain "
                         "(boilerplate detect -> strip -> dedup on the "
                         "clean content -> pack) instead of the raw "
                         "render chain")
    ap.add_argument("--follow", action="store_true",
                    help="continuous admission: poll the seed source and "
                         "admit newly-appended seeds into the next wave "
                         "of the resumable store (tail -f the seed list "
                         "— the reference's always-on queue semantics)")
    ap.add_argument("--follow-polls", type=int, default=5,
                    help="number of polls before exiting --follow")
    ap.add_argument("--follow-interval", type=float, default=1.0,
                    help="seconds between --follow polls")
    args = ap.parse_args()
    if args.follow and args.n_synthetic:
        ap.error("--follow needs a file seed source (--seeds/--csv/--jsonl)")

    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kw.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from visiblev8_crawler_ray import synth
    from visiblev8_crawler_ray.config import CrawlConfig
    from visiblev8_crawler_ray.pipelines.crawl import run_crawl
    from visiblev8_crawler_ray.sources import readers

    cfg = CrawlConfig(max_depth=args.max_depth, max_waves=args.max_waves,
                      max_per_host_per_wave=args.host_window,
                      max_per_host_total=args.host_budget)

    def read_source():
        if args.n_synthetic:
            import numpy as np

            return synth.seeds_table(np.arange(args.n_synthetic), cfg)
        if args.seeds:
            return readers.read_url_file(args.seeds)
        if args.csv:
            return readers.read_tranco_csv(args.csv)
        return readers.read_candidates_jsonl(args.jsonl).select_columns(
            ["seed_id", "url"])

    t0 = time.time()
    if args.follow:
        # tail -f the seed source: each poll admits only the rows past
        # the last consumed offset (seed ids are line-stable, so the
        # slice is exactly the appended tail); run_crawl resumes the
        # store and merges the tail into the next wave's candidates.
        import pyarrow as pa

        from visiblev8_crawler_ray.store import TableStore

        # resuming an existing store: the file may already hold lines
        # appended since the original run — admit from the start (the
        # wave dedup drops the already-crawled ones) instead of
        # silently pinning them under the consumed offset
        resumed = bool(TableStore(args.store).committed_waves("metrics"))
        consumed = 0
        run = None
        polls = 0
        for poll in range(args.follow_polls):
            tbl = read_source()
            if hasattr(tbl, "to_pandas") and not isinstance(tbl, pa.Table):
                tbl = pa.Table.from_pandas(tbl.to_pandas(),
                                           preserve_index=False)
            if tbl.num_rows > consumed or run is None:
                tail = tbl.slice(consumed)
                run = run_crawl(tail, cfg, args.store,
                                fetcher_mode=args.fetcher_mode,
                                admit_new_seeds=consumed > 0 or resumed)
                consumed = tbl.num_rows
                polls += 1
            if poll < args.follow_polls - 1:
                time.sleep(args.follow_interval)
    else:
        run = run_crawl(read_source(), cfg, args.store,
                        fetcher_mode=args.fetcher_mode)
    dt = time.time() - t0
    m = run.metrics()
    summary = {
        "store": args.store,
        "seconds": round(dt, 1),
        "waves": len(m) if m is not None else 0,
        "urls": int(sum(r["admitted"] for r in m.to_pylist())) if m is not None else 0,
    }
    if args.compact:
        comp = run.store.compact("fetch", target_rows=args.compact)
        summary["compacted"] = {
            "files_before": sum(b for b, _ in comp.values()),
            "files_after": sum(a for _, a in comp.values()),
        }
    if args.corpus:
        from visiblev8_crawler_ray.pipelines.curation import (
            crawl_to_corpus, crawl_to_corpus_clean)
        from visiblev8_crawler_ray.stages.parse import strip_boilerplate

        docs = run.docs()
        if docs is not None:
            if args.corpus_clean:
                manifest = crawl_to_corpus_clean(
                    docs, run.crawl_log(), window=args.corpus_window)
            else:
                manifest = crawl_to_corpus(docs,
                                           window=args.corpus_window)
            import pyarrow as pa
            import pyarrow.parquet as pq

            pq.write_table(pa.Table.from_pandas(manifest, preserve_index=False),
                           args.corpus)
            summary["corpus"] = {
                "path": args.corpus,
                "docs_kept": int(len(manifest)),
                "packs": int(manifest["pack_id"].max()) + 1
                if len(manifest) else 0,
                "tokens": int(manifest["n_tokens"].sum()),
            }
            if args.corpus_clean:
                # Report the strip stats with the SAME detection params
                # the clean packing chain used, and only when that chain
                # actually ran (the raw chain strips nothing).
                clean = strip_boilerplate(docs, run.crawl_log(),
                                          min_pages=3, num=9, den=10)
                summary["corpus"]["boilerplate_spans_stripped"] = \
                    int(clean["n_removed"].sum())
        else:
            summary["corpus"] = {"path": args.corpus, "docs_kept": 0}
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
