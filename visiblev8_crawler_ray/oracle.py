"""Single-process reference simulator (the correctness oracle).

A small, obviously-correct sequential implementation of the crawl
contract — canonicalize -> validate -> first-wins dedup -> robots ->
politeness scheduling -> deterministic fetch -> span assembly — mirroring
the reference's semantics:

- first-wins URL dedup before enqueue (``endpoints/tasks.py:148-156``);
- seed-file admission order (``url_sender.py:228-241``);
- politeness pacing constants (``url_sender.py:45-49``) recast as
  *virtual time* so the schedule is a pure function of (seeds, budget),
  not wall-clock (SURVEY.md §4.3);
- per-URL retry-once semantics (``url_sender.py:242-252``).

The deterministic contract (shared with pipelines/crawl.py):

1. admission_key: seeds -> seed_id; discovered links ->
   parent_admission_key * 64 + link_index + 1; deferred rows keep theirs.
2. Within a wave, dedup keeps the row with min (admission_key, depth,
   url); URLs seen in earlier waves are dropped.
3. robots-blocked URLs are recorded (status='robots_blocked') and marked
   seen, but never fetched.
4. host_rank = rank within (wave, host) ordered by (admission_key, url);
   rows with host_rank >= max_per_host_per_wave are DEFERRED to the next
   wave (hot-host politeness window / skew split).
5. fetch_vtime = host_rank * crawl_delay_ms(host)  (integer ms — no
   float associativity hazards across implementations).
6. Crawl order = ascending (wave, fetch_vtime, admission_key, url);
   `seq` is the dense global index in that order.
7. Fetch fails permanently iff seeded_hash64(url) % 211 == 0 (after
   the retry budget; functions/urls.py:fail_mask); failed URLs emit no
   document and no outlinks.
8. Outlinks expand until depth == max_depth; the loop stops at
   max_waves or an empty frontier.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from .config import CrawlConfig
from .functions import urls as U
from .synth import (
    doc_id_for,
    make_spans,
    parse_actions,
    robots_blocked,
)


def fetch_fails(canonical_url: str) -> bool:
    """Per-row view of the vectorized predicate the fetcher applies."""
    return bool(U.fail_mask([canonical_url])[0])


def fetch_retries(canonical_url: str) -> int:
    """Per-row retry_count the fetcher ledgers: 1 if the first attempt
    failed (transient — saved by the in-task retry — or permanent —
    retry exhausted), else 0."""
    return int(U.transient_fail_mask([canonical_url])[0]
               or U.fail_mask([canonical_url])[0])


def url_key_of(canonical_url: str) -> str:
    """Per-row view of the crawl's vectorized 128-bit url_key."""
    h1, h2 = U.hash128_parts([canonical_url])
    return f"{h1[0]:016x}{h2[0]:016x}"


@dataclass
class OracleResult:
    urlseen: list[dict] = field(default_factory=list)   # URLSEEN_SCHEMA rows
    crawl_log: list[dict] = field(default_factory=list)  # CRAWL_LOG_SCHEMA rows
    docs: list[dict] = field(default_factory=list)       # DOCS_SCHEMA rows
    metrics: list[dict] = field(default_factory=list)    # METRICS_SCHEMA rows


def crawl_oracle(seed_urls: list[tuple[int, str]], cfg: CrawlConfig,
                 seed_actions: list[str] | None = None,
                 arrivals: dict[int, list[tuple[int, str]]] | None = None,
                 arrival_actions: dict[int, list[str]] | None = None,
                 ) -> OracleResult:
    """seed_urls: (seed_id, raw_url) in file order; ``seed_actions``
    the aligned per-seed actions JSON strings ('' = none, M6).

    ``arrivals``: continuous-admission seeds — wave -> (seed_id,
    raw_url) batches that join that wave's candidates (the engine's
    ``run_crawl(admit_new_seeds=True)`` resume contract: seeds arriving
    between waves enter the next uncommitted wave).  Arrival waves must
    be reachable (contiguous with the crawl — the engine never runs an
    empty gap wave).  ``arrival_actions`` aligns per batch like
    ``seed_actions``."""
    res = OracleResult()
    seen: set[str] = set()          # url_key of fetched + blocked + failed
    host_fetched: dict[str, int] = {}  # per-host admitted total (budget)
    seq = 0

    # wave-0 candidates: canonicalize + validate
    raw = pa.array([u for _, u in seed_urls], type=pa.string())
    c = U.canonicalize(raw)
    cand: list[tuple[int, str, int]] = []  # (admission_key, canonical_url, depth)
    # first-wins actions map: the FIRST submission of a canonical URL
    # decides its actions (duplicates are served from cache —
    # endpoints/tasks.py:150-156); rows without actions still claim the
    # first-wins slot.
    amap: dict[str, str] = {}
    acts_in = seed_actions or [""] * len(seed_urls)
    for (sid, _), cu, ok, aj in sorted(
        zip(seed_urls, c["canonical_url"].to_pylist(),
            c["valid"].to_pylist(), acts_in),
        key=lambda r: r[0][0],
    ):
        if ok and cu not in amap:
            amap[cu] = aj
    for (sid, _), cu, ok in zip(
        seed_urls, c["canonical_url"].to_pylist(), c["valid"].to_pylist()
    ):
        if ok:
            cand.append((sid, cu, 0))

    arrivals = arrivals or {}
    arrival_actions = arrival_actions or {}
    wave = 0
    while wave < cfg.max_waves:
        batch = arrivals.get(wave)
        if batch:
            raw2 = pa.array([u for _, u in batch], type=pa.string())
            c2 = U.canonicalize(raw2)
            aj2 = arrival_actions.get(wave) or [""] * len(batch)
            for (sid, _), cu, ok, aj in sorted(
                zip(batch, c2["canonical_url"].to_pylist(),
                    c2["valid"].to_pylist(), aj2),
                key=lambda r: r[0][0],
            ):
                if ok and cu not in amap:
                    amap[cu] = aj
            for (sid, _), cu, ok in zip(
                batch, c2["canonical_url"].to_pylist(),
                c2["valid"].to_pylist()
            ):
                if ok:
                    cand.append((sid, cu, 0))
        if not cand:
            break
        m = {"wave": wave, "admitted": 0, "fetched": 0, "deduped": 0,
             "robots_blocked": 0, "deferred": 0, "failed": 0,
             "retried": 0, "budget_dropped": 0}
        # within-wave dedup: min (admission_key, depth, url) per canonical
        # url (depth in the tiebreak mirrors the pipeline's packed-min)
        best: dict[str, tuple[int, str, int]] = {}
        for key, url, depth in cand:
            cur = best.get(url)
            if cur is None or (key, depth, url) < (cur[0], cur[2], cur[1]):
                best[url] = (key, url, depth)
        m["deduped"] += len(cand) - len(best)
        # cross-wave seen drop
        rows = []
        for url, (key, _, depth) in best.items():
            uk = url_key_of(url)
            if uk in seen:
                m["deduped"] += 1
                continue
            rows.append((key, url, uk, depth))
        # robots
        fetchable = []
        for key, url, uk, depth in sorted(rows, key=lambda r: (r[0], r[1])):
            host, path = _host_path(url)
            if robots_blocked(host, path, cfg):
                m["robots_blocked"] += 1
                seen.add(uk)
                res.crawl_log.append(
                    dict(seq=-1, wave=wave, host=host, url=url, url_key=uk,
                         doc_id="", depth=depth, fetch_vtime=0,
                         status="robots_blocked", n_spans=0, n_links=0,
                         retry_count=0)
                )
                continue
            fetchable.append((key, url, uk, depth, host, path))
        # host_rank + total budget + deferral: within the politeness
        # order, rows past the host's REMAINING total budget drop for
        # good (status='budget_exhausted', marked seen); rows between
        # the per-wave window and the remaining budget defer as before.
        by_host: dict[str, int] = {}
        sched, deferred = [], []
        for key, url, uk, depth, host, path in fetchable:  # already sorted
            r = by_host.get(host, 0)
            by_host[host] = r + 1
            if cfg.max_per_host_total is not None:
                remaining = max(
                    cfg.max_per_host_total - host_fetched.get(host, 0), 0)
                if r >= remaining:
                    m["budget_dropped"] += 1
                    seen.add(uk)
                    res.crawl_log.append(
                        dict(seq=-1, wave=wave, host=host, url=url,
                             url_key=uk, doc_id="", depth=depth,
                             fetch_vtime=0, status="budget_exhausted",
                             n_spans=0, n_links=0, retry_count=0)
                    )
                    continue
            if r >= cfg.max_per_host_per_wave:
                deferred.append((key, url, depth))
                continue
            vt = r * cfg.crawl_delay_ms(host)
            sched.append((vt, key, url, uk, depth, host, path))
        m["deferred"] = len(deferred)
        for _, _, _, _, _, host, _ in sched:
            host_fetched[host] = host_fetched.get(host, 0) + 1
        # crawl order within the wave
        sched.sort(key=lambda r: (r[0], r[1], r[2]))
        next_cand: list[tuple[int, str, int]] = list(deferred)
        for vt, key, url, uk, depth, host, path in sched:
            m["admitted"] += 1
            seen.add(uk)
            res.urlseen.append(
                dict(url_key=uk, url=url, first_wave=wave, first_seq=seq)
            )
            rc = fetch_retries(url)
            m["retried"] += rc
            if fetch_fails(url):
                m["failed"] += 1
                res.crawl_log.append(
                    dict(seq=seq, wave=wave, host=host, url=url, url_key=uk,
                         doc_id="", depth=depth, fetch_vtime=vt,
                         status="failed", n_spans=0, n_links=0,
                         retry_count=rc)
                )
                seq += 1
                continue
            aj = amap.get(url, "")
            acts = parse_actions(aj) if aj else None
            if acts and U.action_fail_mask([url])[0]:
                acts = None          # replay failed -> direct-URL fallback
                fetch_mode = "actions_fallback"
            elif acts:
                fetch_mode = "actions"
            else:
                fetch_mode = "direct"
            spans = make_spans(url, host, path, wave, cfg, actions=acts)
            did = doc_id_for(url, wave)
            links = [s["text"] for s in spans if s["kind"] == "link"]
            res.docs.append(dict(doc_id=did, spans=spans))
            res.crawl_log.append(
                dict(seq=seq, wave=wave, host=host, url=url, url_key=uk,
                     doc_id=did, depth=depth, fetch_vtime=vt, status="ok",
                     n_spans=len(spans), n_links=len(links),
                     retry_count=rc, fetch_mode=fetch_mode)
            )
            m["fetched"] += 1
            if depth < cfg.max_depth:
                for j, link in enumerate(links):
                    next_cand.append((key * 64 + j + 1, link, depth + 1))
            seq += 1
        res.metrics.append(m)
        cand = next_cand
        wave += 1
    return res


def _host_path(canonical_url: str) -> tuple[str, str]:
    rest = canonical_url.split("://", 1)[1]
    i = rest.find("/")
    hostport = rest if i < 0 else rest[:i]
    path = "/" if i < 0 else rest[i:]
    host = hostport.split(":", 1)[0]
    return host, path
