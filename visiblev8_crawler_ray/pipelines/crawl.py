"""The crawl pipeline: URL frontier + fetch scheduler as a Ray Data wave loop.

Reference lifecycle (SURVEY.md §3.1): seed feeder -> validate/dedup ->
Celery queues -> per-URL browser -> artifact bundle -> parse.  Here each
BFS *wave* is one streaming Dataset pipeline; the frontier between waves
is the only materialized control set:

    frontier(w) ──canonicalize──────────────────▶ candidates
      ─pack-min combiner + groupby(url_key)─────▶ unique    (within-wave dedup, D1)
      ─SeenFilter (sharded actors)──────────────▶ new URLs  (cross-wave dedup, T5)
      ─robots split (blocked side-written)──────▶ fetchable (T7)
      ─sort(host,key)+group-rank (skew-proof)───▶ scheduled / deferred (T6
                                                  politeness window, skew split:
                                                  a hot host spreads across
                                                  range-partitioned blocks)
      ─sort+zip-with-index──────────────────────▶ global crawl order (O4, §4.3)
      ─SeenAdd -> FetchWriter───────────────────▶ spans side-written to the wave
                                                  partition; CONTROL columns flow on
      ─urlseen side-write -> explode links──────▶ frontier(w+1) ∪ deferred

Adaptive execution: a wave whose candidate set fits under
``cfg.small_wave_threshold`` runs its whole control plane as one
vectorized kernel ON THE DRIVER (zero Ray executions — the only
execution is the fetch chain); larger waves run the identical semantics
as distributed shuffles.  Both paths produce byte-identical output
(tests force each).

Determinism contract: see :mod:`..oracle` — the oracle and this pipeline
implement the same pure function of (seeds, politeness budget); pytest
asserts equality of crawl order, URL-seen set, span sequences and
metrics at two parallelism levels.

Scale notes (10^10 design point):
- the only all-to-all exchanges per wave are groupby(url_key), the
  host-rank sort and the scheduling sort — all over the *admitted
  frontier* (bounded by the politeness budget), never over span payloads;
- span payloads take exactly ONE hop, task -> storage
  (stages/fetcher.py:FetchWriter): they never enter the object store,
  and there is no read-back — derived outputs (urlseen, links, status
  counts) ride the control columns or the parquet footers;
- per-wave control-plane cost is 1 Ray execution (small waves) or ~5
  (scale waves: dedup+seen+robots, host schedule, sort, summaries,
  fetch chain) — down from ~12 in round 1, which is what the N->4N
  scaling criterion keys on;
- every wave commits atomically (manifest) → kill-and-resume never
  refetches or double-counts; side-written files use deterministic
  names so task retries overwrite rather than duplicate.
"""

from __future__ import annotations

import os

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..config import CrawlConfig
from ..functions import urls as U
from ..functions.seq import assign_global_seq, assign_group_rank
from ..stages.fetcher import FetchWriter
from ..state.urlseen import get_seen_index
from ..store import TableStore

FRONTIER_COLS = ["admission_key", "url", "url_key", "host", "path", "depth"]
LOG_COLS = ["seq", "wave", "host", "url", "url_key", "doc_id", "depth",
            "fetch_vtime", "status", "n_spans", "n_links", "retry_count"]


# ---------------------------------------------------------------------------
# stages

def _canonicalize_batch(batch: pa.Table) -> pa.Table:
    c = U.canonicalize(batch.column("url"))
    keep = c["valid"]
    uk, _ = U.url_key128(c["canonical_url"])
    sid = batch.column("seed_id").cast(pa.int64())
    if batch.num_rows:
        # sortkey packs (admission_key, depth) into one int64 as
        # ak*256+depth, and child keys grow as seed*64^depth — the whole
        # scheme needs max(seed_id) * 64^max_depth * 256 < 2^63, i.e.
        # admission keys below 2^55.  Fail loudly instead of silently
        # wrapping the dedup order (ADVICE r2).
        mx = pc.max(sid).as_py()
        assert mx is None or mx < (1 << 55), (
            f"seed_id {mx} overflows the int64 first-wins pack "
            f"(admission keys must stay below 2^55)")
    t = pa.table(
        {
            "admission_key": sid,
            "url": c["canonical_url"],
            "url_key": uk,
            "host": c["host"],
            "path": c["path"],
            "depth": pa.array(np.zeros(batch.num_rows, dtype=np.int32)),
        }
    )
    if "actions" in batch.column_names:
        # passthrough so the cold-start Dataset path can derive the
        # actions first-wins table from the SAME canonicalize pass
        t = t.append_column("actions", batch.column("actions"))
    return t.filter(keep)


def _pack_firstwins(batch: pa.Table) -> pa.Table:
    """Block-level combiner for first-wins dedup (D1): pack the
    first-wins order into ONE int64 and take the per-key arrow min.

    ``sortkey = admission_key * 256 + depth`` makes integer order ==
    (admission_key, depth) order (CrawlConfig asserts depth < 256); the
    url needs no tiebreak — equal 128-bit url_key means equal url — but
    is carried (arbitrary-but-deterministic ``min``) to recover the row.
    All vectorized: no per-row Python (replaced an f-string pack loop).
    """
    ak = batch["admission_key"].to_numpy(zero_copy_only=False).astype(np.int64)
    dp = batch["depth"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = pa.table({
        "url_key": batch["url_key"],
        "sortkey": pa.array(ak * 256 + dp),
        "url": batch["url"],
    })
    return _combine_pack_min(t)


def _unpack_firstwins(batch: pa.Table) -> pa.Table:
    """Inverse of _pack_firstwins: recover the frontier columns."""
    sk = batch["sortkey"].to_numpy(zero_copy_only=False)
    url = batch["url"]
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    parts = pc.extract_regex(
        url, r"^[a-z][a-z0-9+.\-]*://(?P<hostport>[^/]*)(?P<path>.*)$")
    host = pc.replace_substring_regex(
        pc.struct_field(parts, "hostport"), r":.*$", "")
    return pa.table(
        {
            "admission_key": pa.array(sk >> 8),
            "url": url,
            "url_key": batch["url_key"],
            "host": host,
            "path": pc.struct_field(parts, "path"),
            "depth": pa.array((sk & 255).astype(np.int32)),
        }
    )


def _combine_pack_min(batch: pa.Table) -> pa.Table:
    """Final (or intermediate) combiner over packed rows — idempotent."""
    g = batch.group_by(["url_key"]).aggregate(
        [("sortkey", "min"), ("url", "min")])
    return g.rename_columns(["url_key", "sortkey", "url"])




def _wave_kernel(cfg: CrawlConfig, shards, next_seq: int, wave: int,
                 host_prior: dict[str, int] | None = None):
    """Small-wave fused control kernel — the whole per-wave control plane
    (dedup -> seen filter -> robots -> politeness schedule -> budget ->
    deferral -> crawl order) in ONE map over the single coalesced
    control block.

    Valid only when the wave's candidates fit one block (the adaptive
    threshold); block-local == global then, so every step is exact.
    Emits the frontier columns plus host_rank / fetch_vtime / seq and a
    ``role`` column: 'blocked' | 'budget' | 'deferred' | 'admitted'.
    ``host_prior``: per-host admitted totals from earlier waves (the
    total-budget state; only read when cfg.max_per_host_total is set).
    """
    n_shards = len(shards)
    cap = cfg.max_per_host_per_wave

    def fn(batch: pa.Table) -> pa.Table:
        # 1. first-wins dedup (single block => exact)
        uniq = _unpack_firstwins(_pack_firstwins(batch))
        # 2. cross-wave seen filter (sharded actor read phase)
        if uniq.num_rows:
            arr, hashes, sid = _route_keys(uniq["url_key"], n_shards)
            seen_mask = np.zeros(len(arr), dtype=bool)
            futs, idxs = [], []
            for s in range(n_shards):
                ix = np.flatnonzero(sid == s)
                if len(ix):
                    futs.append(shards[s].contains.remote(arr[ix], hashes[ix]))
                    idxs.append(ix)
            for ix, m in zip(idxs, ray.get(futs)):
                seen_mask[ix] = m
            uniq = uniq.filter(pa.array(~seen_mask))
        # 3. robots
        flagged = _robots_flag(cfg)(uniq)
        bmask = flagged["blocked"]
        blocked = flagged.filter(bmask).drop_columns(["blocked"])
        fetchable = flagged.filter(pc.invert(bmask)).drop_columns(["blocked"])
        # 4. politeness schedule + window deferral (arrow sort + numpy
        # segment-rank — no pandas; the two sorts are the kernel's cost)
        fetchable = fetchable.take(pc.sort_indices(
            fetchable, sort_keys=[("admission_key", "ascending"),
                                  ("url", "ascending")]))
        hosts = fetchable["host"].to_numpy(zero_copy_only=False)
        uniq_hosts, codes = np.unique(hosts, return_inverse=True)
        # per-host cumcount in admission order: stable-sort the codes,
        # rank within each segment, scatter back
        perm = np.argsort(codes, kind="stable")
        counts = np.bincount(codes, minlength=len(uniq_hosts))
        starts = np.cumsum(counts) - counts
        within = np.arange(len(codes), dtype=np.int64) - np.repeat(starts, counts)
        rank = np.empty(len(codes), dtype=np.int64)
        rank[perm] = within
        delays = np.array([cfg.crawl_delay_ms(str(h)) for h in uniq_hosts],
                          dtype=np.int64)[codes] if len(codes) else \
            np.array([], dtype=np.int64)
        vtime = rank * delays
        fetchable = fetchable.append_column(
            "host_rank", pa.array(rank)).append_column(
            "fetch_vtime", pa.array(vtime))
        if cfg.max_per_host_total is not None and len(codes):
            prior = np.array(
                [(host_prior or {}).get(str(h), 0) for h in uniq_hosts],
                dtype=np.int64)[codes]
            remaining = np.maximum(cfg.max_per_host_total - prior, 0)
            exhausted = rank >= remaining
        else:
            exhausted = np.zeros(len(codes), dtype=bool)
        budget = fetchable.filter(pa.array(exhausted))
        admitted = fetchable.filter(pa.array((rank < cap) & ~exhausted))
        deferred = fetchable.filter(pa.array((rank >= cap) & ~exhausted))
        # 5. crawl order
        admitted = admitted.take(pc.sort_indices(
            admitted, sort_keys=[("fetch_vtime", "ascending"),
                                 ("admission_key", "ascending"),
                                 ("url", "ascending")]))
        admitted = admitted.append_column(
            "seq", pa.array(next_seq + np.arange(admitted.num_rows,
                                                 dtype=np.int64)))

        def tag(t: pa.Table, role: str) -> pa.Table:
            n = t.num_rows
            if "host_rank" not in t.column_names:
                t = t.append_column("host_rank",
                                    pa.array(np.full(n, -1, dtype=np.int64)))
            if "seq" not in t.column_names:
                t = t.append_column("seq",
                                    pa.array(np.full(n, -1, dtype=np.int64)))
            if "fetch_vtime" not in t.column_names:
                t = t.append_column("fetch_vtime",
                                    pa.array(np.zeros(n, dtype=np.int64)))
            t = t.append_column("role", pa.array([role] * n, type=pa.string()))
            return t.select(FRONTIER_COLS +
                            ["host_rank", "fetch_vtime", "seq", "role"])

        return pa.concat_tables(
            [tag(blocked, "blocked"), tag(budget, "budget"),
             tag(deferred, "deferred"), tag(admitted, "admitted")])

    return fn


def _route_keys(keys, n_shards: int):
    """(arrow string array | ndarray) -> (S32 array, uint64 hashes, shard ids)."""
    from ..state.urlseen import as_key_array, routing_hash

    arr = as_key_array(keys)
    hashes = routing_hash(arr)
    return arr, hashes, (hashes % np.uint64(n_shards)).astype(np.int64)


def _robots_flag(cfg: CrawlConfig):
    def fn(batch: pa.Table) -> pa.Table:
        hosts = batch.column("host")
        paths = batch.column("path")
        hosts_np = hosts.to_numpy(zero_copy_only=False)
        paths_np = paths.to_numpy(zero_copy_only=False)
        if cfg.robots_file:
            # T7 real-format tier: RFC 9309 longest-match rules, parsed
            # once per worker process (corpus_rules memo)
            from ..functions.robots import corpus_rules, decide_batch

            allowed, _ = decide_batch(
                corpus_rules(cfg.robots_file), hosts_np, paths_np)
            return batch.append_column("blocked", pa.array(~allowed))
        blocked = np.zeros(batch.num_rows, dtype=bool)
        # vectorized per distinct host (robots rules are per-host prefixes)
        for h in np.unique(hosts_np):
            rules = cfg.robots_disallow(str(h))
            if not rules:
                continue
            sel = hosts_np == h
            sub = paths_np[sel]
            m = np.zeros(len(sub), dtype=bool)
            for pfx in rules:
                m |= np.char.startswith(sub.astype(str), pfx)
            blocked[sel] = m
        return batch.append_column("blocked", pa.array(blocked))
    return fn


def _sidewrite(out_dir: str, tbl: pa.Table, name: str) -> None:
    """Idempotent in-partition write: tmp + atomic rename to a
    deterministic filename, so Ray task retries overwrite, never
    duplicate (TableStore.prepare_partition contract)."""
    import os
    import uuid

    import pyarrow.parquet as pq

    tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex[:8]}")
    pq.write_table(tbl, tmp)
    os.replace(tmp, os.path.join(out_dir, name))


def _robots_split(cfg: CrawlConfig, blocked_dir: str, wave: int):
    """Fused scale-path stage: flag robots, side-write the blocked rows,
    and pass only fetchable rows on — the blocked log never takes a
    separate execution.  Blocked keys enter the seen index in bulk from
    the committed partition afterwards (no per-batch RPCs on the hot
    path).  Deterministic filename from the batch's first url_key
    (batches partition the deduped key space)."""
    flag = _robots_flag(cfg)
    log = _blocked_log_batch(wave)

    def fn(batch: pa.Table) -> pa.Table:
        t = flag(batch)
        blocked = t.filter(t["blocked"])
        if blocked.num_rows:
            blocked = blocked.drop_columns(["blocked"])
            ltbl = log(blocked)
            _sidewrite(blocked_dir, ltbl,
                       f"part-k{ltbl['url_key'][0].as_py()[:16]}.parquet")
        return t.filter(pc.invert(t["blocked"])).drop_columns(["blocked"])

    return fn


def _urlseen_sidewrite(urlseen_dir: str, wave: int):
    """Scale-path pass-through stage writing each batch's urlseen rows
    into the (uncommitted) wave partition."""
    mk = _urlseen_batch(wave)

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            u = mk(batch.select(["url_key", "url", "seq"]))
            smin = pc.min(batch["seq"]).as_py()
            _sidewrite(urlseen_dir, u, f"part-s{smin:015d}.parquet")
        return batch

    return fn


def _partition_rows(part_dir: str) -> int:
    """Driver-side row count of a partition from parquet footers only."""
    import os

    import pyarrow.parquet as pq

    total = 0
    for f in os.listdir(part_dir):
        if f.endswith(".parquet"):
            total += pq.read_metadata(os.path.join(part_dir, f)).num_rows
    return total


def _blocked_counts(part_dir: str) -> tuple[int, int]:
    """Driver-side (robots_blocked, budget_exhausted) row counts of a
    blocked partition.  The budget sidewrites use the distinct 'part-b'
    filename prefix (robots rows are 'part-k'), so the split comes from
    parquet footers only — no column read, no Ray execution."""
    import os

    import pyarrow.parquet as pq

    robots = budget = 0
    for f in os.listdir(part_dir):
        if not f.endswith(".parquet"):
            continue
        n = pq.read_metadata(os.path.join(part_dir, f)).num_rows
        if f.startswith("part-b"):
            budget += n
        else:
            robots += n
    return robots, budget


def _host_counts(files: list[str]) -> dict[str, int]:
    """Per-host admitted row counts from committed fetch partitions —
    one pruned single-column read (thread pool; IO-bound).  Feeds the
    per-host total-budget state; control-sized output (one int per
    host).  At the 10^10 design point this state lives sharded next to
    the seen index; driver-side is exact and cheap at the politeness
    budget's admitted volume."""
    from collections import Counter
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    def one(f: str) -> Counter:
        t = pq.read_table(f, columns=["host"])
        h, c = np.unique(t["host"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return Counter({str(k): int(v) for k, v in zip(h, c)})

    if not files:
        return {}
    tot: Counter = Counter()
    with ThreadPoolExecutor(max_workers=min(16, len(files))) as ex:
        for part in ex.map(one, files):
            tot.update(part)
    return dict(tot)


def _fetch_counts(part_dir: str) -> tuple[int, int]:
    """Driver-side (failed, retried) counts — one pruned two-column read
    straight off the side-written files (thread pool; IO-bound), no Ray
    execution."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    files = [os.path.join(part_dir, f) for f in os.listdir(part_dir)
             if f.endswith(".parquet")]

    def one(f: str) -> tuple[int, int]:
        t = pq.read_table(f, columns=["status", "retry_count"])
        failed = pc.sum(pc.equal(t["status"], "failed")
                        .cast(pa.int64())).as_py() or 0
        retried = pc.sum(pc.greater(t["retry_count"], 0)
                         .cast(pa.int64())).as_py() or 0
        return failed, retried

    if not files:
        return 0, 0
    with ThreadPoolExecutor(max_workers=min(16, len(files))) as ex:
        parts = list(ex.map(one, files))
    return sum(p[0] for p in parts), sum(p[1] for p in parts)


def _finalize_actions(tbl: pa.Table,
                      drop_empty: bool = True) -> pa.Table:
    """Cross-batch first-wins finish: min seed_id per url_key, then
    (by default) drop the rows with no actions.  ``drop_empty=False``
    keeps the EMPTY claims too — the persisted form: a first submission
    WITHOUT actions claims its URL's slot and must keep blocking later
    actioned duplicates across resumes (the reference serves duplicate
    submissions from its cache, endpoints/tasks.py:150-156)."""
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("url_key", "ascending"), ("seed_id", "ascending")]))
    keys = tbl["url_key"].to_numpy(zero_copy_only=False)
    first = np.ones(len(keys), dtype=bool)
    first[1:] = keys[1:] != keys[:-1]
    tbl = tbl.filter(pa.array(first))
    if drop_empty:
        tbl = tbl.filter(pc.not_equal(tbl["actions"], ""))
    return tbl.select(["url_key", "actions"])


@ray.remote(num_returns=2)
def _strip_actions_block(block: pa.Table):
    """One canonicalized frontier block (with actions passthrough) ->
    (block sans actions, per-block first-wins actions partial) — the
    fused cold-start round that spares a second full canonicalize
    execution over the seed list."""
    t = (block if isinstance(block, pa.Table)
         else pa.Table.from_pandas(block, preserve_index=False))
    act = pa.table({
        "seed_id": t["admission_key"],
        "url_key": t["url_key"],
        "actions": t["actions"],
    })
    act = act.take(pc.sort_indices(
        act, sort_keys=[("url_key", "ascending"),
                        ("seed_id", "ascending")]))
    keys = act["url_key"].to_numpy(zero_copy_only=False)
    first = np.ones(len(keys), dtype=bool)
    first[1:] = keys[1:] != keys[:-1]
    return t.drop_columns(["actions"]), act.filter(pa.array(first))


def _read_action_claims(store) -> pa.Table | None:
    """Persisted first-wins action CLAIMS (including empty ones) in
    arrival order — earlier partitions claimed their URLs first, so the
    first occurrence per key across partitions (in wave order) wins.
    None when the store predates claim persistence (fallback: rebuild
    from the caller's seed list, the pre-r5 behavior)."""
    waves = store.committed_waves("actions")
    parts = []
    for w in waves:
        t = store.read_table("actions", waves=[w])
        if t is not None and t.num_rows:
            parts.append(t.select(["url_key", "actions"]))
    if not waves:
        return None
    if not parts:
        return pa.table({"url_key": pa.array([], type=pa.string()),
                         "actions": pa.array([], type=pa.string())})
    tbl = pa.concat_tables(parts, promote_options="default")
    prio = np.concatenate([np.full(p.num_rows, i, dtype=np.int64)
                           for i, p in enumerate(parts)])
    tbl = tbl.append_column("prio", pa.array(prio))
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("url_key", "ascending"), ("prio", "ascending")]))
    keys = tbl["url_key"].to_numpy(zero_copy_only=False)
    first = np.ones(len(keys), dtype=bool)
    first[1:] = keys[1:] != keys[:-1]
    return tbl.filter(pa.array(first)).select(["url_key", "actions"])


def _build_actions_table(seeds, keep_empty: bool = False) -> pa.Table:
    """First-wins (url_key, actions) table for actioned seeds (M6).

    The reference accepts per-URL action scripts at submission
    (``endpoints/tasks.py:96-99``); a duplicate submission is served
    from cache, so the FIRST submission of a URL decides its actions —
    mirrored here by keeping the min-seed_id row per canonical URL
    (including rows with no actions) before dropping the empty ones.
    Mission lists up to ``cfg.actions_broadcast_max`` broadcast via
    ray.put (vectorized index_in probe in the fetcher); above it the
    lookup runs as a hash-partitioned co-group join on url_key per wave
    (``_attach_actions``) so the full mission list is never shipped to
    every worker.
    """
    empty = pa.table({"url_key": pa.array([], type=pa.string()),
                      "actions": pa.array([], type=pa.string())})

    def keyed_firstwins(t: pa.Table) -> pa.Table:
        """(seed_id, url_key, actions) for the valid rows, reduced to
        the min-seed_id row per key — exact as a per-batch partial (the
        global min is among the per-batch minima), so the distributed
        path canonicalizes in the map phase and collects only minima."""
        c = U.canonicalize(t["url"])
        sub = pa.table({
            "seed_id": t["seed_id"],
            "url_key": U.url_key128(c["canonical_url"])[0],
            "actions": t["actions"],
        }).filter(c["valid"])
        sub = sub.take(pc.sort_indices(
            sub, sort_keys=[("url_key", "ascending"),
                            ("seed_id", "ascending")]))
        keys = sub["url_key"].to_numpy(zero_copy_only=False)
        first = np.ones(len(keys), dtype=bool)
        first[1:] = keys[1:] != keys[:-1]
        return sub.filter(pa.array(first))

    if isinstance(seeds, rd.Dataset):
        if "actions" not in seeds.schema().names:
            return empty
        tbl = _collect_control(seeds.map_batches(
            lambda t: keyed_firstwins(
                t.select(["seed_id", "url", "actions"])),
            batch_format="pyarrow"))
    else:
        if "actions" not in seeds.column_names:
            return empty
        tbl = keyed_firstwins(seeds.select(["seed_id", "url", "actions"]))
    if tbl.num_rows == 0:
        return empty
    return _finalize_actions(tbl, drop_empty=not keep_empty)


def _attach_actions(rows_ds: rd.Dataset, actions_ds: rd.Dataset,
                    nparts: int) -> rd.Dataset:
    """Hash-partitioned left-attach of the actions column onto frontier
    rows by url_key — the scale fallback to the actions broadcast
    (VERDICT r2 fix #4).  Implemented as a bucketed co-group (tag both
    sides with hash(url_key) % nparts, union, groupby(bucket), pandas
    left-merge per bucket) because Dataset.join deadlocks under
    CPU-constrained sessions (see textops.dedup_minhash).  One exchange
    per wave, paid only in join mode."""
    import pandas as pd

    from ..state.urlseen import as_key_array, routing_hash

    schema = rows_ds.schema()
    row_cols = list(schema.names)
    row_types = list(schema.types)
    out_order = ["abucket", "aside", "actions_json"] + row_cols

    def tag_rows(t: pa.Table) -> pa.Table:
        keys = as_key_array(t["url_key"])
        cols = {c: t[c] for c in row_cols}
        cols["abucket"] = pa.array(
            (routing_hash(keys) % np.uint64(nparts)).astype(np.int64))
        cols["aside"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        cols["actions_json"] = pa.nulls(t.num_rows, type=pa.string())
        return pa.table(cols).select(out_order)

    def tag_actions(t: pa.Table) -> pa.Table:
        keys = as_key_array(t["url_key"])
        n = t.num_rows
        cols = {c: (t["url_key"] if c == "url_key" else pa.nulls(n, typ))
                for c, typ in zip(row_cols, row_types)}
        cols["abucket"] = pa.array(
            (routing_hash(keys) % np.uint64(nparts)).astype(np.int64))
        cols["aside"] = pa.array(np.ones(n, dtype=np.int8))
        cols["actions_json"] = t["actions"]
        return pa.table(cols).select(out_order)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        acts = g[g["aside"] == 1][["url_key", "actions_json"]]
        rows = g[g["aside"] == 0][row_cols]
        m = rows.merge(acts, on="url_key", how="left")
        # the union's null fillers made numeric columns float in the
        # group frame; restore the frontier dtypes (rows side has no
        # nulls, so the cast is lossless)
        m = m.astype({c: t.to_pandas_dtype()
                      for c, t in zip(row_cols, row_types)
                      if not (pa.types.is_string(t) or pa.types.is_list(t))})
        return m[row_cols + ["actions_json"]]

    both = rows_ds.map_batches(tag_rows, batch_format="pyarrow").union(
        actions_ds.map_batches(tag_actions, batch_format="pyarrow"))
    return both.groupby("abucket").map_groups(merge, batch_format="pandas")


def _split_table(t: pa.Table, chunk_rows: int) -> list[pa.Table]:
    chunk_rows = max(1, chunk_rows)
    return [t.slice(i, chunk_rows) for i in range(0, t.num_rows, chunk_rows)]


def _dedup_fresh_via_shards(frontier_ds: rd.Dataset, shards, wave: int):
    """Scale-path first-wins dedup + cross-wave seen filter in ONE
    exchange through the URL-seen shard actors.

    Every duplicate of a key routes to the same shard (hash routing), so
    each shard holds the complete duplicate set of its key range: a map
    execution stages block-local pack-min combiner output on the shards,
    then each shard computes the global per-key min, drops already-seen
    keys, and returns its fresh rows as one Arrow block
    (state/urlseen.py:flush_fresh).  Replaces groupby().aggregate(),
    whose per-row-Python reduce measured 8.2 s where this path takes
    ~1 s at 680k candidates — and the exchange doubles as the seen
    filter, so the filter costs nothing extra.

    Returns (fresh packed Dataset — one block per shard, sorted within
    blocks — and the fresh row count).  Memory: a shard stages
    O(wave candidates / n_shards) packed rows, bounded by the frontier
    admission budget per wave; size n_seen_shards to the cluster.
    """
    n = len(shards)

    def _push_table(batch: pa.Table, shard_handles) -> int:
        import hashlib

        packed = _pack_firstwins(batch)
        arr, hashes, sid = _route_keys(packed["url_key"], n)
        sk = packed["sortkey"].to_numpy(zero_copy_only=False)
        futs = []
        for s in range(n):
            ix = np.flatnonzero(sid == s)
            if len(ix):
                sub = packed.take(pa.array(ix))
                # Idempotency key = content hash of the sub-batch.  A
                # retry re-stages the same content under the same key;
                # two DIFFERENT batches can share a min url_key (the
                # same duplicated URL), but never the same (url_key,
                # sortkey) content — admission keys are per-row unique.
                tk = hashlib.blake2b(
                    arr[ix].tobytes() + sk[ix].tobytes(),
                    digest_size=16).digest()
                futs.append(shard_handles[s].stage.remote(wave, tk, sub))
        if futs:
            ray.get(futs)
        return batch.num_rows

    # One raw-task round over the frontier's block refs (VERDICT r4
    # "Next" #3: batch the shard RPC round into one submit) — the
    # frontier is materialized at both call sites, so its blocks are
    # concrete refs and the staging needs no Dataset execution.  The
    # map_batches path remains as the fallback for unmaterialized or
    # metadata-less inputs.
    block_refs = None
    try:
        block_refs = [r for b in frontier_ds.iter_internal_ref_bundles()
                      for (r, m) in b.blocks if m.num_rows]
    except Exception:  # pragma: no cover - metadata API unavailable
        block_refs = None
    if block_refs is not None:
        stage_block = ray.remote(
            lambda block, handles: _push_table(
                block if isinstance(block, pa.Table)
                else pa.Table.from_pandas(block, preserve_index=False),
                handles))
        ray.get([stage_block.remote(r, shards) for r in block_refs])
    else:
        def push(batch: pa.Table) -> pa.Table:
            return pa.table({"n": pa.array([_push_table(batch, shards)],
                                           type=pa.int64())})

        frontier_ds.map_batches(push, batch_format="pyarrow").count()
    refs = [s.flush_fresh.remote(wave) for s in shards]
    fresh = rd.from_arrow_refs(refs)
    n_fresh = sum(ray.get([s.last_flush_count.remote() for s in shards]))
    # One block per shard would cap every downstream stage (host
    # shuffle, sort, fetch chain) at n_shards-way parallelism; re-split
    # to the frontier block count (cheap block split, no all-to-all).
    fresh = fresh.repartition(_frontier_blocks())
    return fresh.map_batches(_unpack_firstwins, batch_format="pyarrow"), n_fresh


def _frontier_blocks() -> int:
    """Frontier block count — 2 blocks per cluster CPU (floor 16) so
    control shuffles and the fetch chain keep every core busy with
    headroom for stragglers, while the frontier (metadata, not payload)
    never fragments into hundreds of per-shuffle-taxed tiny blocks."""
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(16, 2 * ncpu)


def _politeness_cols(cfg: CrawlConfig, host_prior: dict[str, int] | None = None,
                     blocked_dir: str | None = None, wave: int = 0):
    """Vectorized politeness columns from a precomputed ``host_rank``
    (scale path): window deferral + virtual fetch time + (when
    ``cfg.max_per_host_total`` is set) the per-host TOTAL budget drop.
    Stateless map — the ranking itself came from the skew-proof sort
    (seq.py: assign_group_rank), so a hot host never concentrates in
    one task (north-rule hot-host skew splitting).  Budget-exhausted
    rows side-write to the blocked partition ('part-b*' files, status
    'budget_exhausted') inside this same execution and are dropped from
    the stream; ``host_prior`` ships serialized-once with the closure
    (control-sized: one int per host seen so far — at the 10^10 design
    point this map lives in the same sharded actors as the seen index,
    keyed by host hash)."""
    cap = cfg.max_per_host_per_wave

    def fn(t: pa.Table) -> pa.Table:
        rank = t["host_rank"].to_numpy(zero_copy_only=False)
        hosts = t["host"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(hosts, return_inverse=True)
        delays = np.array([cfg.crawl_delay_ms(str(h)) for h in uniq],
                          dtype=np.int64)
        t = (t.append_column("deferred", pa.array(rank >= cap))
              .append_column("fetch_vtime", pa.array(rank * delays[inv])))
        if cfg.max_per_host_total is not None and len(rank):
            prior = np.array(
                [(host_prior or {}).get(str(h), 0) for h in uniq],
                dtype=np.int64)[inv]
            exhausted = rank >= np.maximum(
                cfg.max_per_host_total - prior, 0)
            if exhausted.any() and blocked_dir is not None:
                bud = t.filter(pa.array(exhausted))
                ltbl = _blocked_log_batch(wave, "budget_exhausted")(bud)
                _sidewrite(blocked_dir, ltbl,
                           f"part-b{ltbl['url_key'][0].as_py()[:16]}.parquet")
            t = t.filter(pa.array(~exhausted))
        return t
    return fn


def _explode_links(max_depth: int):
    def fn(batch: pa.Table) -> pa.Table:
        links = batch.column("links")
        if isinstance(links, pa.ChunkedArray):
            links = links.combine_chunks()
        flat = pc.list_flatten(links)
        parent = pc.list_parent_indices(links)
        lens = pc.list_value_length(links).to_numpy(zero_copy_only=False)
        # position of each link within its parent list
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        pos = np.arange(len(flat)) - starts
        pkey = batch.column("admission_key").to_numpy(zero_copy_only=False)[
            parent.to_numpy(zero_copy_only=False)
        ]
        pdepth = batch.column("depth").to_numpy(zero_copy_only=False)[
            parent.to_numpy(zero_copy_only=False)
        ]
        child_key = pkey * 64 + pos + 1
        if len(child_key):
            # same 2^55 bound as _canonicalize_batch: keys grow 64x per
            # depth level and the first-wins pack multiplies by 256
            assert child_key.max() < (1 << 55), (
                "admission_key overflow: seed ids too large for "
                "max_depth (need seed * 64^depth < 2^55)")
        host = U.extract_host(flat)
        # path: strip scheme://hostport
        rest = pc.struct_field(
            pc.extract_regex(flat, r"^https?://[^/]*(?P<p>/.*)$"), "p"
        )
        uk, _ = U.url_key128(flat)
        return pa.table(
            {
                "admission_key": pa.array(child_key, type=pa.int64()),
                "url": flat,
                "url_key": uk,
                "host": host,
                "path": rest,
                "depth": pa.array((pdepth + 1).astype(np.int32)),
            }
        )
    return fn


# ---------------------------------------------------------------------------
# the wave loop

@dataclass
class CrawlRun:
    store: TableStore
    waves: int
    next_seq: int

    def docs(self) -> rd.Dataset | None:
        ds = self.store.read_dataset("fetch", columns=["doc_id", "spans", "status"])
        if ds is None:
            return None
        return ds.map_batches(
            lambda t: t.filter(pc.equal(t["status"], "ok")).select(["doc_id", "spans"]),
            batch_format="pyarrow",
        )

    def crawl_log(self) -> rd.Dataset | None:
        parts = []
        fetch = self.store.read_dataset("fetch", columns=LOG_COLS)
        if fetch is not None:
            parts.append(fetch)
        blocked = self.store.read_dataset("blocked", columns=LOG_COLS)
        if blocked is not None:
            parts.append(blocked)
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    def url_status(self) -> rd.Dataset | None:
        """M12 status projector: the per-URL status/artifact view the
        reference serves from /task status + artifact fetch
        (``endpoints/tasks.py:330-386``, ``scripts/fetch.py:78-201``):
        every submitted URL with its terminal state, crawl position and
        artifact references (blob refs match the media spans)."""
        log = self.crawl_log()
        if log is None:
            return None

        def project(t: pa.Table) -> pa.Table:
            ok = pc.equal(t["status"], "ok")
            shot = pc.if_else(ok, pc.binary_join_element_wise(
                pa.scalar("blob://"), t["doc_id"], pa.scalar("/shot.png"), ""),
                pa.scalar(""))
            har = pc.if_else(ok, pc.binary_join_element_wise(
                pa.scalar("blob://"), t["doc_id"], pa.scalar("/har.json"), ""),
                pa.scalar(""))
            return pa.table(
                {
                    "url": t["url"],
                    "url_key": t["url_key"],
                    "status": t["status"],
                    "wave": t["wave"],
                    "seq": t["seq"],
                    "doc_id": t["doc_id"],
                    "n_spans": t["n_spans"],
                    "screenshot_ref": shot,
                    "har_ref": har,
                    "complete": pc.cast(pc.not_equal(t["status"], ""),
                                        pa.bool_()),
                }
            )

        return log.map_batches(project, batch_format="pyarrow")

    def urlseen(self) -> rd.Dataset | None:
        return self.store.read_dataset("urlseen")

    def metrics(self) -> pa.Table | None:
        return self.store.read_table("metrics")


def run_crawl(
    seeds: pa.Table | rd.Dataset,
    cfg: CrawlConfig,
    store_root: str,
    *,
    fetch_concurrency: int | tuple[int, int] = 4,
    fetch_batch_size: int = 256,
    fetcher_mode: str = "task",
    stop_after_wave: int | None = None,
    blob_artifacts: bool = False,
    admit_new_seeds: bool = False,
) -> CrawlRun:
    import os as _os
    import time as _time
    _prof = bool(_os.environ.get("VV8RAY_PROFILE"))
    _t = [_time.time()]

    def _mark(label: str) -> None:
        if _prof:
            now = _time.time()
            print(f"[prof] {label:24s} {now - _t[0]:6.2f}s", flush=True)
            _t[0] = now
    """Run (or resume) the crawl; each wave is one committed partition.

    ``stop_after_wave`` simulates a crash for the resume tests: the run
    stops after committing that wave; a later call with the same
    ``store_root`` resumes from the checkpoint.

    ``fetcher_mode``: 'task' (default) ships a serialized-once Fetcher
    instance into stateless tasks — right when the fetcher state is a
    broadcastable config (this synthetic web; measured 2.7x faster and
    0.71 CPU-scaling vs 0.34, because actor pools pay per-execution
    creation).  'actor' runs the same class as a map_batches actor pool
    — required when the per-worker state is expensive to build or
    unserializable (a real browser session, T1 in SURVEY.md).
    """
    store = TableStore(store_root)
    seen = None  # built below
    seen_spill_dir = (os.path.join(store_root, "seen_spill")
                      if cfg.seen_spill_max_mem_keys else None)
    if isinstance(seeds, pa.Table) and seeds.num_rows > 100_000:
        # large seed lists canonicalize distributed (both for the
        # actions first-wins and the wave-0 frontier) — the driver-side
        # vectorized pass is ~1 s/300k URLs of per-wave-0 floor
        seeds = rd.from_arrow(_split_table(seeds, 65536))
    # S6/S7: optional artifact-byte materialization under <root>/blobs
    # (refs in the spans resolve against this dir; off by default — the
    # blob volume dwarfs the span tables)
    blob_dir = os.path.join(store_root, "blobs") if blob_artifacts else None

    done = store.committed_waves("metrics")
    claims = None  # first-wins action claims INCLUDING empty ones
    if done:
        # resume: action claims come from the STORE (the reference's
        # submission cache persists across worker restarts —
        # endpoints/tasks.py:150-156); rebuilding from the caller's
        # current seed list would lose claims of earlier batches, so a
        # deferred actioned URL would refetch with no actions after a
        # crash or in --follow mode (caught by the r5 admission fuzz).
        claims = _read_action_claims(store)
        if claims is None:  # store predates claim persistence
            claims = _build_actions_table(seeds, keep_empty=True)
        # ---- resume path: restore seen + frontier from the checkpoint
        last = done[-1]
        man = store.read_manifest("metrics", last)
        next_seq = int(man["next_seq"])
        start_wave = last + 1
        seen = get_seen_index(cfg.n_seen_shards, cfg.bloom_bits,
                              seen_spill_dir, cfg.seen_spill_max_mem_keys,
                              front=cfg.seen_front)
        # Restore ONLY waves <= the last *metrics*-committed wave: within a
        # wave, blocked/fetch/urlseen commit before metrics, so a crash in
        # between leaves sub-table partitions for a wave that will be re-run
        # — restoring them would mark that wave's URLs seen and silently
        # drop them on the re-run.  Each shard reads the committed key
        # partitions itself and keeps only its own hash range, so the full
        # key set never materializes in any one process (10^10 design
        # point: O(total / n_shards) per shard).
        key_files = (
            store._data_files(
                "urlseen",
                [w for w in store.committed_waves("urlseen") if w <= last])
            + store._data_files(
                "blocked",
                [w for w in store.committed_waves("blocked") if w <= last]))
        seen.restore_from_parquet(key_files)
        # Per-host total-budget state: recompute from the committed fetch
        # partitions (same restore-only-waves<=last rule as the seen set)
        # — no extra manifest field, exact across mid-wave crashes.
        host_totals: dict[str, int] = (
            _host_counts(store._data_files(
                "fetch",
                [w for w in store.committed_waves("fetch") if w <= last]))
            if cfg.max_per_host_total is not None else {})
        fr = store.read_table("frontier_next", waves=[last])
        frontier = fr if fr is not None and fr.num_rows else None
        if admit_new_seeds:
            # Continuous-admission mode (the reference's always-on queue,
            # vv8_worker/app.py:16-28, as a wave-loop mode): seeds that
            # arrived since the last committed wave join the NEXT wave's
            # candidates alongside the restored frontier.  The caller
            # passes only the NEW tail of its seed source (tail -f
            # semantics — crawl_job --follow tracks the file offset);
            # already-seen URLs among them are dropped by the ordinary
            # wave dedup, counted like any duplicate candidate.
            newf = (_canonicalize_batch(seeds)
                    if isinstance(seeds, pa.Table)
                    else _collect_control(seeds.map_batches(
                        _canonicalize_batch, batch_format="pyarrow")))
            if newf.num_rows:
                parts = ([frontier.select(FRONTIER_COLS)]
                         if frontier is not None else [])
                parts.append(newf.select(FRONTIER_COLS))
                frontier = pa.concat_tables(parts,
                                            promote_options="default")
            # persist the NEW batch's claims (losing to every stored
            # claim — those arrived first) as this resume's partition
            new_claims = _build_actions_table(seeds, keep_empty=True)
            if new_claims.num_rows:
                fresh_mask = ~np.isin(
                    new_claims["url_key"].to_numpy(zero_copy_only=False),
                    claims["url_key"].to_numpy(zero_copy_only=False))
                new_claims = new_claims.filter(pa.array(fresh_mask))
            store.write_table(new_claims, "actions", start_wave)
            claims = pa.concat_tables([claims, new_claims],
                                      promote_options="default")
    else:
        next_seq = 0
        start_wave = 0
        host_totals = {}
        seen = get_seen_index(cfg.n_seen_shards, cfg.bloom_bits,
                              seen_spill_dir, cfg.seen_spill_max_mem_keys,
                              front=cfg.seen_front)
        # The frontier is CONTROL data (urls + keys, no payload): small
        # seed tables canonicalize right on the driver in one vectorized
        # call; Dataset seeds (cluster-scale seed lists) stay distributed.
        if isinstance(seeds, pa.Table):
            claims = _build_actions_table(seeds, keep_empty=True)
            frontier = _canonicalize_batch(seeds)
            if frontier.num_rows:
                frontier = frontier.select(FRONTIER_COLS)
            else:
                frontier = None
        else:
            fr = seeds.map_batches(
                _canonicalize_batch, batch_format="pyarrow"
            ).materialize()
            has_actions = "actions" in seeds.schema().names
            blocks = None
            if has_actions:
                try:
                    blocks = [r for b in fr.iter_internal_ref_bundles()
                              for (r, m) in b.blocks if m.num_rows]
                except Exception:  # pragma: no cover
                    blocks = None
            if has_actions and blocks is not None:
                # fused round: strip the actions column AND reduce the
                # per-block first-wins partials in one task sweep —
                # no second canonicalize execution over the seeds
                outs = [_strip_actions_block.remote(r) for r in blocks]
                parts = ray.get([p for _, p in outs])
                parts = [p for p in parts if p.num_rows]
                claims = (_finalize_actions(pa.concat_tables(parts),
                                            drop_empty=False)
                          if parts else _build_actions_table(
                              pa.table({"url": pa.array([],
                                                        type=pa.string())}),
                              keep_empty=True))
                frontier = (rd.from_arrow_refs([b for b, _ in outs])
                            if blocks else None)
            else:
                claims = _build_actions_table(seeds, keep_empty=True)
                frontier = fr
            if frontier is not None and frontier.count() == 0:
                frontier = None
        # cold start persists the claim table as partition 0 so every
        # later resume sees the original submissions' claims
        store.write_table(claims, "actions", 0)

    atbl = (claims.filter(pc.not_equal(claims["actions"], ""))
            if claims is not None and claims.num_rows
            else pa.table({"url_key": pa.array([], type=pa.string()),
                           "actions": pa.array([], type=pa.string())}))
    join_actions = atbl.num_rows > cfg.actions_broadcast_max
    actions_ref = (ray.put(atbl)
                   if atbl.num_rows and not join_actions else None)
    actions_ds = (rd.from_arrow(_split_table(atbl, 65536)).materialize()
                  if atbl.num_rows and join_actions else None)

    wave = start_wave
    while frontier is not None and wave < cfg.max_waves:
        n_cand = (frontier.num_rows if isinstance(frontier, pa.Table)
                  else frontier.count())
        _mark(f'w{wave} count ({n_cand})')
        small = n_cand <= cfg.small_wave_threshold
        fetch_dir = store.prepare_partition("fetch", wave)
        if small:
            # ---- small-wave path: the control plane (dedup -> seen ->
            # robots -> schedule -> order) runs ON THE DRIVER as one
            # vectorized kernel over the control table — zero Ray
            # executions; the single execution per wave is the fetch.
            ftbl = (frontier if isinstance(frontier, pa.Table)
                    else _collect_control(frontier))
            control = _wave_kernel(cfg, seen.shards, next_seq, wave,
                                   host_totals)(ftbl)
            blocked = control.filter(pc.equal(control["role"], "blocked"))
            budget_tbl = control.filter(pc.equal(control["role"], "budget"))
            deferred_tbl = control.filter(
                pc.equal(control["role"], "deferred")).select(FRONTIER_COLS)
            admitted = control.filter(
                pc.equal(control["role"], "admitted")
            ).drop_columns(["role", "host_rank"])
            n_blocked = blocked.num_rows
            n_budget = budget_tbl.num_rows
            n_deferred = deferred_tbl.num_rows
            n_admitted = admitted.num_rows
            if n_blocked:
                seen.add(blocked["url_key"])
            if n_budget:
                # budget-exhausted URLs are terminal: marked seen (never
                # revisited), logged alongside the robots rows
                seen.add(budget_tbl["url_key"])
            store.write_table(pa.concat_tables(
                [_blocked_log_batch(wave)(blocked),
                 _blocked_log_batch(wave, "budget_exhausted")(budget_tbl)]),
                "blocked", wave)
            if cfg.max_per_host_total is not None and n_admitted:
                hu, hc = np.unique(
                    admitted["host"].to_numpy(zero_copy_only=False),
                    return_counts=True)
                for hh, cc in zip(hu, hc):
                    host_totals[str(hh)] = (
                        host_totals.get(str(hh), 0) + int(cc))
            _mark(f'w{wave} kernel')
            # ONE Ray execution: fetch + span side-write; span payloads
            # go task -> storage, never through the object store.  The
            # control columns stream back to the driver.
            if n_admitted:
                seen.add(admitted["url_key"])
                staged = _add_wave(wave)(admitted)
                ncpu = int(ray.cluster_resources().get("CPU", 8))
                chunk = max(min(fetch_batch_size, 512),
                            -(-n_admitted // (4 * ncpu)))
                chain = rd.from_arrow(_split_table(staged, chunk))
                if actions_ds is not None:
                    chain = _attach_actions(chain, actions_ds,
                                            max(2, min(8, ncpu)))
                if fetcher_mode == "actor":
                    fetched = chain.map_batches(
                        FetchWriter,
                        fn_constructor_args=(cfg, fetch_dir, actions_ref,
                                             blob_dir),
                        batch_format="pyarrow", batch_size=fetch_batch_size,
                        concurrency=fetch_concurrency)
                else:
                    fetched = chain.map_batches(
                        FetchWriter(cfg, fetch_dir, actions_ref, blob_dir),
                        batch_format="pyarrow", batch_size=None)
                ctrl = _collect_control(fetched)
            else:
                ctrl = _add_wave(wave)(admitted).append_column(
                    "doc_id", pa.array([], type=pa.string())).append_column(
                    "status", pa.array([], type=pa.string())).append_column(
                    "links", pa.array([], type=pa.list_(pa.string()))
                ).append_column(
                    "n_spans", pa.array([], type=pa.int32())).append_column(
                    "n_links", pa.array([], type=pa.int32())).append_column(
                    "retry_count", pa.array([], type=pa.int32()))
            store.commit_partition("fetch", wave)
            _mark(f'w{wave} fetch+write')
            n_failed = int(pc.sum(
                pc.equal(ctrl["status"], "failed").cast(pa.int64())
            ).as_py() or 0)
            n_retried = int(pc.sum(
                pc.greater(ctrl["retry_count"], 0).cast(pa.int64())
            ).as_py() or 0)
            store.write_table(
                _urlseen_batch(wave)(ctrl.select(["url_key", "url", "seq"])),
                "urlseen", wave)
            # frontier expansion, all driver-side vectorized
            if wave + 1 < cfg.max_waves and ctrl.num_rows:
                okrows = ctrl.filter(pc.and_(
                    pc.equal(ctrl["status"], "ok"),
                    pc.less(ctrl["depth"], cfg.max_depth),
                )).select(["admission_key", "depth", "links"])
                children = _explode_links(cfg.max_depth)(okrows)
                nxt_tbl = pa.concat_tables([children, deferred_tbl],
                                           promote_options="default")
            else:
                nxt_tbl = deferred_tbl
            n_next = nxt_tbl.num_rows
            store.write_table(nxt_tbl.select(FRONTIER_COLS),
                              "frontier_next", wave)
            nxt = nxt_tbl
            _mark(f'w{wave} links+checkpoint')
        else:
            # ---- scale path: distributed exchanges, identical
            # semantics.  Per wave: dedup+seen (1 execution + shard
            # exchange), politeness groupby with robots fused in front
            # (1; blocked side-written inside it), order sort (2), and
            # the fetch chain (1) — which side-writes spans + urlseen
            # and emits the next frontier's candidates directly.
            frontier_ds = (rd.from_arrow(_split_table(
                frontier, -(-frontier.num_rows // _frontier_blocks())))
                if isinstance(frontier, pa.Table) else frontier)
            blocked_dir = store.prepare_partition("blocked", wave)
            fresh, n_fresh = _dedup_fresh_via_shards(
                frontier_ds, seen.shards, wave)
            _mark(f'w{wave} dedup(scale)')
            # politeness schedule: host shuffle ranks + defers in-group;
            # a hot host's window is cfg.max_per_host_per_wave, so the
            # per-group admitted set is bounded (skew split: the rest
            # re-enters next wave's frontier as deferred rows).  The
            # robots split rides the same execution as the shuffle's map
            # phase.
            # politeness columns fuse into the rank-assignment task
            # round (seq.py post_fn) — one sort execution + two light
            # task rounds replace the former three executions; the
            # budget side-writes land before the barrier inside
            # assign_group_rank, so the blocked commit below stays safe
            sched = assign_group_rank(
                fresh.map_batches(_robots_split(cfg, blocked_dir, wave),
                                  batch_format="pyarrow"),
                "host", ["admission_key", "url"], rank_col="host_rank",
                post_fn=_politeness_cols(cfg, host_totals, blocked_dir,
                                         wave))
            store.commit_partition("blocked", wave)
            n_blocked, n_budget = _blocked_counts(blocked_dir)
            # bulk seen-add of the blocked + budget-exhausted keys from
            # the partition just committed: each shard reads its own hash
            # range — no per-batch actor RPCs inside the shuffle
            # execution.
            seen.restore_from_parquet(store._data_files("blocked", [wave]))
            n_fetchable = n_fresh - n_blocked - n_budget
            _mark(f'w{wave} sched(scale)')
            admitted_ds = sched.map_batches(
                lambda t: t.filter(pc.invert(t["deferred"]))
                           .drop_columns(["deferred", "host_rank"]),
                batch_format="pyarrow")
            deferred_ds = sched.map_batches(
                lambda t: t.filter(t["deferred"]).select(FRONTIER_COLS),
                batch_format="pyarrow")
            ordered, n_admitted = assign_global_seq(
                admitted_ds, ["fetch_vtime", "admission_key", "url"],
                seq_col="seq", start=next_seq, return_count=True)
            n_deferred = n_fetchable - n_admitted
            if _prof:
                print(f"[prof] w{wave} blocks sched={sched.num_blocks()}",
                      flush=True)
            _mark(f'w{wave} ordered(scale)')
            # the fetch chain: admission commit -> fetch (side-writes
            # spans) -> urlseen side-write -> link explosion; its output
            # IS the next frontier's link candidates.
            urlseen_dir = store.prepare_partition("urlseen", wave)
            staged = ordered.map_batches(_add_wave(wave), batch_format="pyarrow")
            if actions_ds is not None:
                ncpu_s = int(ray.cluster_resources().get("CPU", 8))
                staged = _attach_actions(staged, actions_ds,
                                         max(2, min(8, ncpu_s)))
            if fetcher_mode == "actor":
                fetched = staged.map_batches(
                    FetchWriter,
                    fn_constructor_args=(cfg, fetch_dir, actions_ref,
                                         blob_dir),
                    batch_format="pyarrow", batch_size=fetch_batch_size,
                    concurrency=fetch_concurrency)
            else:
                fetched = staged.map_batches(
                    FetchWriter(cfg, fetch_dir, actions_ref, blob_dir),
                    batch_format="pyarrow", batch_size=fetch_batch_size)
            tail = fetched.map_batches(_urlseen_sidewrite(urlseen_dir, wave),
                                       batch_format="pyarrow")
            if wave + 1 < cfg.max_waves:
                children = tail.map_batches(
                    lambda t: t.filter(pc.and_(
                        pc.equal(t["status"], "ok"),
                        pc.less(t["depth"], cfg.max_depth),
                    )).select(["admission_key", "depth", "links"]),
                    batch_format="pyarrow",
                ).map_batches(_explode_links(cfg.max_depth),
                              batch_format="pyarrow")
            else:
                children = tail.map_batches(
                    lambda t: t.select(FRONTIER_COLS).slice(0, 0),
                    batch_format="pyarrow")
            nxt = children.union(deferred_ds).materialize()
            store.commit_partition("fetch", wave)
            store.commit_partition("urlseen", wave)
            _mark(f'w{wave} fetch+write')
            # admission enters the seen index in bulk from the committed
            # urlseen partition (same shard-side hash-range load as
            # resume) — reads of wave k+1 see every add of wave k, and
            # the fetch chain carries zero seen-index RPCs.
            seen.restore_from_parquet(store._data_files("urlseen", [wave]))
            _mark(f'w{wave} seen-load')
            if cfg.max_per_host_total is not None:
                for hh, cc in _host_counts(
                        store._data_files("fetch", [wave])).items():
                    host_totals[hh] = host_totals.get(hh, 0) + cc
            n_failed, n_retried = _fetch_counts(fetch_dir)
            n_next = nxt.count()
            store.write_dataset(nxt, "frontier_next", wave)
            _mark(f'w{wave} links+checkpoint')
        # wave metrics + commit marker
        next_seq += n_admitted
        metrics = pa.table(
            {
                "wave": pa.array([wave], type=pa.int32()),
                "admitted": pa.array([n_admitted], type=pa.int64()),
                "fetched": pa.array([n_admitted - n_failed], type=pa.int64()),
                # fresh = blocked + budget + deferred + admitted, so the
                # dedup drop count falls out without a separate pass:
                "deduped": pa.array(
                    [n_cand - n_blocked - n_budget - n_deferred
                     - n_admitted],
                    type=pa.int64()),
                "robots_blocked": pa.array([n_blocked], type=pa.int64()),
                "deferred": pa.array([n_deferred], type=pa.int64()),
                "failed": pa.array([n_failed], type=pa.int64()),
                "retried": pa.array([n_retried], type=pa.int64()),
                "budget_dropped": pa.array([n_budget], type=pa.int64()),
            }
        )
        store.write_table(metrics, "metrics", wave,
                          lineage={"next_seq": next_seq, "n_candidates": n_cand,
                                   "n_next": n_next})
        _mark(f'w{wave} metrics')
        frontier = nxt if n_next else None
        if stop_after_wave is not None and wave >= stop_after_wave:
            break
        wave += 1

    # Completed-wave count comes from the commit log, which is correct on
    # every exit path (natural termination, stop_after_wave, resume).
    done_waves = store.committed_waves("metrics")
    return CrawlRun(store=store,
                    waves=(done_waves[-1] + 1) if done_waves else 0,
                    next_seq=next_seq)


def _collect_control(ds: rd.Dataset) -> pa.Table:
    """Materialize a small control dataset to one Arrow table (frontier
    checkpoint).  Bounded by the politeness budget, not the data size."""
    tables = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
              for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536)]
    if not tables:
        import pyarrow as _pa
        return _pa.table({c: [] for c in FRONTIER_COLS})
    return pa.concat_tables(tables, promote_options="default")


def _add_wave(wave: int):
    def fn(t: pa.Table) -> pa.Table:
        return t.append_column(
            "wave", pa.array(np.full(t.num_rows, wave, dtype=np.int32)))
    return fn


def _blocked_log_batch(wave: int, status: str = "robots_blocked"):
    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "seq": pa.array(np.full(n, -1, dtype=np.int64)),
                "wave": pa.array(np.full(n, wave, dtype=np.int32)),
                "host": t["host"],
                "url": t["url"],
                "url_key": t["url_key"],
                "doc_id": pa.array([""] * n, type=pa.string()),
                "depth": t["depth"],
                "fetch_vtime": pa.array(np.zeros(n, dtype=np.int64)),
                "status": pa.array([status] * n, type=pa.string()),
                "n_spans": pa.array(np.zeros(n, dtype=np.int32)),
                "n_links": pa.array(np.zeros(n, dtype=np.int32)),
                "retry_count": pa.array(np.zeros(n, dtype=np.int32)),
            }
        )
    return fn


def _urlseen_batch(wave: int):
    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url_key": t["url_key"],
                "url": t["url"],
                "first_wave": pa.array(
                    np.full(t.num_rows, wave, dtype=np.int32)),
                "first_seq": t["seq"],
            }
        )
    return fn


#: revisit-interval multiple of the per-host politeness delay — the
#: change-rate policy of the recrawl scheduler (slow-delay hosts are
#: assumed slow-changing, the standard freshness heuristic).  Calibrated
#: to the reference's 1-URL/s admission timeline: delays of 50-500 ms
#: become revisit intervals of 100 s - 1000 s, the middle of a
#: thousand-URL mission's age range, so the due flag actually splits.
REVISIT_FACTOR = 2000


def recrawl_due(log_ds: rd.Dataset, cfg: CrawlConfig) -> rd.Dataset:
    """Recrawl scheduling (the revisit policy every production frontier
    runs; absent in the reference — its crawls are one-shot missions):
    on the reference's 1-URL/s admission timeline
    (``url_sender.py:45``), a fetched URL's global fetch instant is
    ``seq * admission_delay``; it is DUE for recrawl at the horizon
    (the instant after the last admission) once its age reaches the
    per-host revisit interval ``REVISIT_FACTOR * crawl_delay_ms(host)``
    — pure per-row arithmetic over the crawl log (no shuffle at any
    scale; the horizon is one tiny max aggregate)."""
    adm_ms = int(cfg.admission_delay_s * 1000)
    horizon = log_ds.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "ok")).select(["seq"]),
        batch_format="pyarrow").max("seq") + 1

    def flag(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["status"], "ok"))
        hosts = t["host"].to_numpy(zero_copy_only=False)
        seq = t["seq"].to_numpy(zero_copy_only=False)
        uniq = np.unique(hosts)
        delays = {h: cfg.crawl_delay_ms(str(h)) for h in uniq}
        revisit = np.array([REVISIT_FACTOR * delays[h] for h in hosts],
                           dtype=np.int64)
        age = (np.int64(horizon) - seq) * adm_ms
        return pa.table({
            "url_key": t["url_key"],
            "url": t["url"],
            "host": t["host"],
            "last_seq": t["seq"],
            "age_ms": pa.array(age),
            "revisit_ms": pa.array(revisit),
            "due": pa.array(age >= revisit),
        })

    return log_ds.map_batches(flag, batch_format="pyarrow")
