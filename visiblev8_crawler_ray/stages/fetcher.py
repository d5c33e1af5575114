"""Fetcher actor-pool stage — the browser-worker analog.

The reference runs one Chromium per URL under a Celery worker
(``celery_workers/vv8_worker/tasks.py:41-135``, ``crawler.js:774-884``),
recycled every task.  Here the fetcher is a callable class used with
``map_batches(Fetcher, concurrency=N)``: per-actor setup happens once in
``__init__`` (browser-launch analog: config, compiled patterns), and each
``__call__`` fetches a politeness-window batch of URLs.

In this sandbox the "network" is the deterministic synthetic web
(:mod:`..synth`); a real deployment swaps ``fetch_rows`` for a browser
driver without touching the pipeline.  Retry-once semantics mirror
``url_sender.py:242-252`` / ``vv8_worker/tasks.py:148-178`` — the
deterministic failure predicate models a permanently-failing page.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import CrawlConfig
from ..oracle import fetch_fails
from ..synth import doc_id_for, fetch_rows
from ..schemas import SPAN_STRUCT


class Fetcher:
    def __init__(self, cfg: CrawlConfig):
        # Once-per-actor setup (browser launch analog).
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        hosts = batch.column("host").to_pylist()
        paths = batch.column("path").to_pylist()
        waves = batch.column("wave").to_pylist()

        ok = np.array([not fetch_fails(u) for u in urls], dtype=bool)
        span_lists, doc_ids, link_lists = fetch_rows(
            [u for u, o in zip(urls, ok) if o],
            [h for h, o in zip(hosts, ok) if o],
            [p for p, o in zip(paths, ok) if o],
            [w for w, o in zip(waves, ok) if o],
            self.cfg,
        )
        # re-expand to full batch with failed rows empty
        n = len(urls)
        full_spans: list = [[] for _ in range(n)]
        full_docids = [""] * n
        full_links: list = [[] for _ in range(n)]
        j = 0
        for i in range(n):
            if ok[i]:
                full_spans[i] = span_lists[j]
                full_docids[i] = doc_ids[j]
                full_links[i] = link_lists[j]
                j += 1
        status = pa.array(
            ["ok" if o else "failed" for o in ok], type=pa.string()
        )
        spans_arr = pa.array(full_spans, type=pa.list_(SPAN_STRUCT))
        links_arr = pa.array(full_links, type=pa.list_(pa.string()))
        n_spans = pa.array(
            [len(s) for s in full_spans], type=pa.int32()
        )
        n_links = pa.array([len(x) for x in full_links], type=pa.int32())
        return (
            batch.append_column("doc_id", pa.array(full_docids, type=pa.string()))
            .append_column("status", status)
            .append_column("spans", spans_arr)
            .append_column("links", links_arr)
            .append_column("n_spans", n_spans)
            .append_column("n_links", n_links)
        )
