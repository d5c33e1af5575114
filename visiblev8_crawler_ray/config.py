"""Run configuration — the politeness budget and crawl constants.

Defaults reproduce the reference's operating-point constants
(BASELINE.md): 1 URL/s admission (``url_sender.py:45``), batch size
10 000 (``:47``), retry limit 1 (``:242-252``), max in-flight 128
(``scripts/crawl.py:42``).  Tests/bench scale the time constants down —
all scheduling here is *virtual time*, a pure function of the input
(SURVEY.md §4.3), so scaling them changes the schedule deterministically
rather than the wall clock.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class CrawlConfig:
    # Politeness budget (reference constants, virtualized).
    admission_delay_s: float = 1.0      # global pacing: url_sender.py:45
    batch_size: int = 10_000            # url_sender.py:47
    max_inflight: int = 128             # scripts/crawl.py:42
    retry_limit: int = 1                # url_sender.py:242-252
    hard_timeout_s: float = 1200.0      # endpoints/tasks.py:105

    # Frontier shape.
    max_depth: int = 2                  # BFS waves beyond the seeds
    max_waves: int = 8                  # termination backstop (deferrals extend waves)
    branching: int = 3                  # outlinks per page (synthetic web)
    max_per_host_per_wave: int = 100    # hot-host politeness window (skew split)
    # Per-host TOTAL crawl budget across the whole mission (None = no
    # cap).  Within a wave's politeness order, a host's rows beyond its
    # remaining budget are dropped for good: logged
    # status='budget_exhausted', marked seen (never revisited), counted
    # in metrics.budget_dropped.  The per-wave window still applies on
    # top (rows between the window and the remaining budget defer).
    max_per_host_total: int | None = None

    # Synthetic web model.
    n_src_hosts: int = 20               # src0..src19 (.example)
    hot_host: str = "hot.example"
    page_space: int = 100_000           # page-id universe for outlink targets
    default_crawl_delay_ms: int = 100

    # Dedup / sharding.
    n_seen_shards: int = 8              # URL-seen actor shards
    bloom_bits: int = 1 << 20           # per-shard front size budget (fast path only)
    # Membership front per seen shard: "bloom" (two-probe bitmap) or
    # "cuckoo" (4-slot 12-bit-fingerprint cuckoo filter, stash +
    # rebuild-on-pressure).  Both are accelerators only — the exact
    # tier decides membership, so the seen set is identical either way.
    seen_front: str = "bloom"
    # Exact-tier spill: shards whose sorted key array exceeds this spill
    # it to sorted parquet runs under <store>/seen_spill, probed
    # bloom-first + range-pruned searchsorted, compacted lazily.  None =
    # all-in-memory (sandbox scale); the 10^10 design point sets ~10^7.
    seen_spill_max_mem_keys: int | None = None
    # T7 real-format tier: path to a robots.txt cache file
    # (functions/robots.py corpus format).  When set, the crawl's
    # robots split AND the per-host politeness delay consult the
    # parsed RFC 9309 rules (parsed once per process, memoized) instead
    # of the synthetic robots_disallow prefixes — the sequential oracle
    # evaluates the same objects, so order/seen equality is preserved.
    robots_file: str | None = None

    # Actioned-seed lookup: missions up to this many rows broadcast as
    # one arrow table (ray.put once, pc.index_in per batch); above it
    # the wave loop attaches actions via a hash-partitioned co-group
    # join on url_key instead of shipping the list to every worker.
    actions_broadcast_max: int = 1_000_000

    # Adaptive execution: waves whose candidate set is below this row
    # count run their dedup/schedule/order steps on a single coalesced
    # block (pure map ops, ~0 fixed cost) instead of a distributed
    # shuffle — the same broadcast-threshold idea Spark applies to
    # joins.  Above it, the hash-partitioned groupby/sort paths run.
    small_wave_threshold: int = 200_000

    def __post_init__(self) -> None:
        # Enforce the packing invariants _pack_firstwins/_explode_links
        # rely on: child admission keys are pkey*64 + pos + 1, so pages
        # may emit at most 63 outlinks, depth packs into one byte, and
        # seed_id * 64^depth * 256 must stay under 2^63 (the int64
        # first-wins pack is ak*256+depth, so admission keys are bounded
        # by 2^55; _canonicalize_batch asserts the seed-id magnitude).
        assert 0 < self.branching < 64, "branching must be in [1, 63]"
        assert 0 <= self.max_depth < 256, "depth must pack into one byte"
        assert self.max_waves >= 1

    def crawl_delay_ms(self, host: str) -> int:
        """Per-host politeness delay; pure function of the host name
        (and, when ``robots_file`` is set, of that host's declared
        Crawl-delay — the robots cache becomes the politeness budget)."""
        if self.robots_file:
            from .functions.robots import corpus_rules

            hr = corpus_rules(self.robots_file).get(host)
            if hr is not None and hr.crawl_delay_ms is not None:
                return hr.crawl_delay_ms
        if host == self.hot_host:
            return 50
        # src hosts: 100..500ms spread by host index
        idx = _host_index(host)
        return self.default_crawl_delay_ms * (1 + idx % 5)

    def robots_disallow(self, host: str) -> tuple[str, ...]:
        """Robots rules; reference crawls ignore robots (SURVEY.md T7) —
        compliance is a new, north-rule-mandated stage.  Prefix semantics."""
        idx = _host_index(host)
        if host != self.hot_host and idx >= 0 and idx % 4 == 0:
            return ("/page/1",)
        return ()


def _host_index(host: str) -> int:
    """'src7.example' -> 7; anything else -> -1."""
    if host.startswith("src") and host.endswith(".example"):
        mid = host[3 : -len(".example")]
        if mid.isdigit():
            return int(mid)
    return -1


DEFAULT_CONFIG = CrawlConfig()

# Fast test/bench config: same semantics, smaller virtual-time constants.
TEST_CONFIG = CrawlConfig(
    admission_delay_s=0.001,
    max_depth=2,
    max_waves=8,
    max_per_host_per_wave=50,
)
