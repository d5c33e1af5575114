"""The crawl pipeline: URL frontier + fetch scheduler as a Ray Data wave loop.

Reference lifecycle (SURVEY.md §3.1): seed feeder -> validate/dedup ->
Celery queues -> per-URL browser -> artifact bundle -> parse.  Here each
BFS *wave* is one streaming Dataset pipeline; the frontier between waves
is the only materialized control set:

    frontier(w) ──map_batches(canonicalize)──▶ candidates
      ─pack-min combiner + groupby(url_key)───▶ unique       (within-wave dedup, D1)
      ─map_batches(SeenFilter: sharded actors)─▶ new URLs    (cross-wave dedup, T5)
      ─map_batches(robots)────────────────────▶ blocked / fetchable (T7)
      ─map_batches(per-block host-cap prune)──▶ combiner for the skew shuffle
      ─groupby(host).map_groups(rank+defer)───▶ scheduled / deferred (T6 politeness,
                                                 hot-host window split, §4.2-2)
      ─sort+zip-with-index───────────────────▶ global crawl order (O4, §4.3)
      ─map_batches(SeenAdd)───────────────────▶ admission committed
      ─map_batches(Fetcher actor pool)────────▶ interleaved span docs (M5)
      ─write store partition wave=w───────────▶ resumable output (§4.4)
      links read-back (column-pruned) ────────▶ frontier(w+1) ∪ deferred

Determinism contract: see :mod:`..oracle` — the oracle and this pipeline
implement the same pure function of (seeds, politeness budget); pytest
asserts equality of crawl order, URL-seen set, span sequences and
metrics at two parallelism levels.

Scale notes (10^10 design point):
- the only all-to-all exchanges per wave are groupby(url_key),
  groupby(host) and the scheduling sort — all over the *admitted
  frontier* (bounded by the politeness budget), never over span payloads;
- the per-block host-cap prune is the combiner that caps what a hot host
  can ship into the groupby (block-local top-cap ⊇ global top-cap);
- span payloads take exactly one pass driver-free: fetch -> write; links
  and log columns are re-read column-pruned from the written partition;
- every wave commits atomically (manifest) → kill-and-resume never
  refetches or double-counts.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..config import CrawlConfig
from ..functions import urls as U
from ..functions.seq import assign_global_seq
from ..stages.fetcher import Fetcher
from ..state.urlseen import get_seen_index
from ..store import TableStore

FRONTIER_COLS = ["admission_key", "url", "url_key", "host", "path", "depth"]
# Control sets are re-blocked to this count each wave: the frontier is
# metadata (not payload), and letting map stages fragment it into hundreds
# of tiny blocks makes every downstream shuffle pay per-block overhead.
FRONTIER_BLOCKS = 32
LOG_COLS = ["seq", "wave", "host", "url", "url_key", "doc_id", "depth",
            "fetch_vtime", "status", "n_spans", "n_links"]


# ---------------------------------------------------------------------------
# stages

def _canonicalize_batch(batch: pa.Table) -> pa.Table:
    c = U.canonicalize(batch.column("url"))
    keep = c["valid"]
    uk, _ = U.url_key128(c["canonical_url"])
    t = pa.table(
        {
            "admission_key": batch.column("seed_id").cast(pa.int64()),
            "url": c["canonical_url"],
            "url_key": uk,
            "host": c["host"],
            "path": c["path"],
            "depth": pa.array(np.zeros(batch.num_rows, dtype=np.int32)),
        }
    )
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




def _wave_kernel(cfg: CrawlConfig, shards, next_seq: int, wave: int):
    """Small-wave fused control kernel — the whole per-wave control plane
    (dedup -> seen filter -> robots -> politeness schedule -> deferral ->
    crawl order) in ONE map over the single coalesced control block.

    Valid only when the wave's candidates fit one block (the adaptive
    threshold); block-local == global then, so every step is exact.
    Emits the frontier columns plus host_rank / fetch_vtime / seq and a
    ``role`` column: 'blocked' | 'deferred' | 'admitted'.
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
        g = flagged.to_pandas()
        blocked = g[g["blocked"]].drop(columns=["blocked"])
        fetchable = g[~g["blocked"]].drop(columns=["blocked"])
        # 4. politeness schedule + window deferral
        fetchable = fetchable.sort_values(
            ["admission_key", "url"]).reset_index(drop=True)
        rank = fetchable.groupby("host", sort=False).cumcount().to_numpy()
        delays = fetchable["host"].map(cfg.crawl_delay_ms).to_numpy() \
            if len(fetchable) else np.array([], dtype=np.int64)
        fetchable["host_rank"] = rank
        fetchable["fetch_vtime"] = (rank * delays).astype(np.int64)
        deferred = fetchable[rank >= cap]
        admitted = fetchable[rank < cap]
        # 5. crawl order
        admitted = admitted.sort_values(
            ["fetch_vtime", "admission_key", "url"]).reset_index(drop=True)
        admitted["seq"] = next_seq + np.arange(len(admitted), dtype=np.int64)

        def tag(df: pd.DataFrame, role: str, seq=None) -> pd.DataFrame:
            df = df.copy()
            for col, default in (("host_rank", -1), ("fetch_vtime", 0)):
                if col not in df.columns:
                    df[col] = default
            if "seq" not in df.columns:
                df["seq"] = -1
            df["role"] = role
            return df[FRONTIER_COLS + ["host_rank", "fetch_vtime", "seq", "role"]]

        out = pd.concat(
            [tag(blocked, "blocked"), tag(deferred, "deferred"),
             tag(admitted, "admitted")],
            ignore_index=True,
        )
        out["host_rank"] = out["host_rank"].astype(np.int64)
        out["fetch_vtime"] = out["fetch_vtime"].astype(np.int64)
        out["seq"] = out["seq"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return fn


def _route_keys(keys, n_shards: int):
    """(arrow string array | ndarray) -> (S32 array, uint64 hashes, shard ids)."""
    from ..state.urlseen import as_key_array, routing_hash

    arr = as_key_array(keys)
    hashes = routing_hash(arr)
    return arr, hashes, (hashes % np.uint64(n_shards)).astype(np.int64)


def _seen_filter_fn(shards):
    """Stage querying the sharded URL-seen actors (read phase).

    A plain function (stateless task), not an actor pool: the only state
    is the shard handle list, which serializes into the closure — this
    avoids per-wave actor-pool spin-up."""
    n = len(shards)

    def fn(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return batch
        arr, hashes, sid = _route_keys(batch.column("url_key"), n)
        masks = np.zeros(len(arr), dtype=bool)
        futs, idxs = [], []
        for s in range(n):
            ix = np.flatnonzero(sid == s)
            if len(ix):
                futs.append(shards[s].contains.remote(arr[ix], hashes[ix]))
                idxs.append(ix)
        for ix, m in zip(idxs, ray.get(futs)):
            masks[ix] = m
        return batch.filter(pa.array(~masks))

    return fn


def _seen_add_fn(shards):
    """Stage committing admitted/blocked keys (write phase, idempotent)."""
    n = len(shards)

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            arr, hashes, sid = _route_keys(batch.column("url_key"), n)
            futs = []
            for s in range(n):
                ix = np.flatnonzero(sid == s)
                if len(ix):
                    futs.append(shards[s].add.remote(arr[ix], hashes[ix]))
            ray.get(futs)
        return batch

    return fn


def _robots_flag(cfg: CrawlConfig):
    def fn(batch: pa.Table) -> pa.Table:
        hosts = batch.column("host")
        paths = batch.column("path")
        blocked = np.zeros(batch.num_rows, dtype=bool)
        # vectorized per distinct host (robots rules are per-host prefixes)
        hosts_np = hosts.to_numpy(zero_copy_only=False)
        paths_np = paths.to_numpy(zero_copy_only=False)
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


def _host_cap_prune(cap: int):
    """Per-block combiner for the host shuffle: only the `cap` smallest
    (admission_key, url) rows per host in each block can be globally
    admitted this wave; the rest are deferred without shuffling."""
    def fn(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["admission_key", "url"])
        r = df.groupby("host", sort=False).cumcount()
        df["pre_deferred"] = (r >= cap).to_numpy()
        return pa.Table.from_pandas(df, preserve_index=False)
    return fn


def _schedule_group(cfg: CrawlConfig):
    """groupby(host).map_groups: politeness rank + window deferral + vtime."""
    cap = cfg.max_per_host_per_wave

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["admission_key", "url"]).reset_index(drop=True)
        rank = np.arange(len(g))
        g["host_rank"] = rank
        g["deferred"] = rank >= cap
        delay_ms = cfg.crawl_delay_ms(str(g["host"].iloc[0]))
        g["fetch_vtime"] = (rank * delay_ms).astype(np.int64)
        return g
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

    done = store.committed_waves("metrics")
    if done:
        # ---- resume path: restore seen + frontier from the checkpoint
        last = done[-1]
        man = store.read_manifest("metrics", last)
        next_seq = int(man["next_seq"])
        start_wave = last + 1
        seen = get_seen_index(cfg.n_seen_shards, cfg.bloom_bits)
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
        fr = store.read_table("frontier_next", waves=[last])
        frontier = rd.from_arrow(fr) if fr is not None and fr.num_rows else None
    else:
        next_seq = 0
        start_wave = 0
        seen = get_seen_index(cfg.n_seen_shards, cfg.bloom_bits)
        if isinstance(seeds, pa.Table):
            seeds = rd.from_arrow(seeds)
        frontier = seeds.map_batches(
            _canonicalize_batch, batch_format="pyarrow"
        ).repartition(FRONTIER_BLOCKS).materialize()
        if frontier.count() == 0:
            frontier = None

    wave = start_wave
    while frontier is not None and wave < cfg.max_waves:
        n_cand = frontier.count()
        _mark(f'w{wave} count ({n_cand})')
        small = n_cand <= cfg.small_wave_threshold
        if small:
            # ---- small-wave path: the whole control plane is one fused
            # kernel over a single coalesced block (see _wave_kernel).
            control = frontier.repartition(1).map_batches(
                _wave_kernel(cfg, seen.shards, next_seq, wave),
                batch_format="pyarrow",
            ).materialize()
            _mark(f'w{wave} kernel')
            roles = control.map_batches(
                lambda t: t.group_by(["role"]).aggregate(
                    [("role", "count")]).rename_columns(["role", "n"]),
                batch_format="pyarrow").to_pandas()
            rc = roles.groupby("role")["n"].sum()
            n_blocked = int(rc.get("blocked", 0))
            n_deferred = int(rc.get("deferred", 0))
            blocked_log = control.map_batches(
                lambda t: t.filter(pc.equal(t["role"], "blocked")),
                batch_format="pyarrow",
            ).map_batches(_seen_add_fn(seen.shards), batch_format="pyarrow"
            ).map_batches(_blocked_log_batch(wave), batch_format="pyarrow"
            ).materialize()
            store.write_dataset(blocked_log, "blocked", wave)
            _mark(f'w{wave} blocked')
            deferred = control.map_batches(
                lambda t: t.filter(pc.equal(t["role"], "deferred"))
                           .select(FRONTIER_COLS),
                batch_format="pyarrow")
            # spread the admitted rows so the fetch pool parallelizes;
            # materialize BEFORE the actor pool — an unfinished AllToAll
            # upstream of a full-width pool deadlocks on CPU starvation
            # (idle actors hold every CPU the repartition task needs).
            ordered = control.map_batches(
                lambda t: t.filter(pc.equal(t["role"], "admitted"))
                           .drop_columns(["role", "host_rank"]),
                batch_format="pyarrow",
            ).repartition(FRONTIER_BLOCKS).materialize()
            _mark(f'w{wave} spread')
        else:
            # ---- scale path: distributed shuffles (hash-partitioned
            # groupbys + range sort), identical semantics.
            from ray.data.aggregate import Min as _Min

            flagged = (
                frontier.map_batches(_pack_firstwins, batch_format="pyarrow")
                .groupby("url_key", num_partitions=FRONTIER_BLOCKS)
                .aggregate(_Min("sortkey", alias_name="sortkey"),
                           _Min("url", alias_name="url"))
                .map_batches(_unpack_firstwins, batch_format="pyarrow")
                .map_batches(_seen_filter_fn(seen.shards), batch_format="pyarrow")
                .map_batches(_robots_flag(cfg), batch_format="pyarrow")
                .materialize()
            )
            _mark(f'w{wave} flagged(scale)')
            blocked = flagged.map_batches(
                lambda t: t.filter(t["blocked"]), batch_format="pyarrow")
            fetchable = flagged.map_batches(
                lambda t: t.filter(pc.invert(t["blocked"])).drop_columns(["blocked"]),
                batch_format="pyarrow")
            blocked_log = blocked.map_batches(
                _seen_add_fn(seen.shards), batch_format="pyarrow",
            ).map_batches(_blocked_log_batch(wave), batch_format="pyarrow").materialize()
            n_blocked = blocked_log.count()
            store.write_dataset(blocked_log, "blocked", wave)
            # politeness schedule: per-block host-cap combiner + host shuffle
            pruned = fetchable.map_batches(
                _host_cap_prune(cfg.max_per_host_per_wave), batch_format="pyarrow")
            pre_deferred = pruned.map_batches(
                lambda t: t.filter(t["pre_deferred"]).select(FRONTIER_COLS),
                batch_format="pyarrow")
            contend = pruned.map_batches(
                lambda t: t.filter(pc.invert(t["pre_deferred"]))
                           .drop_columns(["pre_deferred"]),
                batch_format="pyarrow")
            sched = contend.groupby("host").map_groups(
                _schedule_group(cfg), batch_format="pandas",
            ).materialize()
            _mark(f'w{wave} sched(scale)')
            admitted = sched.map_batches(
                lambda t: t.filter(pc.invert(t["deferred"]))
                           .drop_columns(["deferred", "host_rank"]),
                batch_format="pyarrow")
            deferred = sched.map_batches(
                lambda t: t.filter(t["deferred"]).select(FRONTIER_COLS),
                batch_format="pyarrow")
            deferred = deferred.union(pre_deferred).materialize()
            n_deferred = deferred.count()
            _mark(f'w{wave} deferred(scale)')
            # global crawl order (range sort + zip-with-index), then
            # re-block: the sort range-packs the control rows into very
            # few blocks (~128MB target), which would starve the fetch
            # actor pool — spread to FRONTIER_BLOCKS and materialize
            # (AllToAll before a full-width pool must not be lazy).
            ordered = assign_global_seq(
                admitted, ["fetch_vtime", "admission_key", "url"],
                seq_col="seq", start=next_seq,
            ).repartition(FRONTIER_BLOCKS).materialize()
            _mark(f'w{wave} ordered(scale)')
        # 7. commit admission to the seen index, then fetch (actor pool)
        committed = ordered.map_batches(
            _seen_add_fn(seen.shards), batch_format="pyarrow")
        staged = committed.map_batches(_add_wave(wave), batch_format="pyarrow")
        if fetcher_mode == "actor":
            fetched = staged.map_batches(
                Fetcher, fn_constructor_args=(cfg,),
                batch_format="pyarrow", batch_size=fetch_batch_size,
                concurrency=fetch_concurrency,
            )
        else:
            fetched = staged.map_batches(
                Fetcher(cfg), batch_format="pyarrow",
                batch_size=fetch_batch_size,
            )
        # 8. single full-data pass: write the wave partition
        store.write_dataset(fetched, "fetch", wave)
        _mark(f'w{wave} fetch+write')
        # 9. ONE column-pruned read-back of the wave partition feeds all
        # derived outputs (status accounting, urlseen, link expansion) —
        # span payloads stay on disk.
        fview = store.read_dataset(
            "fetch", waves=[wave],
            columns=["url_key", "url", "seq", "status",
                     "admission_key", "depth", "links"],
        ).materialize()
        status_parts = fview.map_batches(
            lambda t: t.group_by(["status"]).aggregate(
                [("status", "count")]).rename_columns(["status", "n"]),
            batch_format="pyarrow",
        ).to_pandas()  # partial per-block counts; <= blocks x 3 rows
        status_counts = status_parts.groupby("status")["n"].sum()
        n_admitted = int(status_counts.sum())
        n_failed = int(status_counts.get("failed", 0))
        _mark(f'w{wave} status')
        urlseen_part = fview.map_batches(
            lambda t: _urlseen_batch(wave)(t.select(["url_key", "url", "seq"])),
            batch_format="pyarrow")
        store.write_dataset(urlseen_part, "urlseen", wave)
        _mark(f'w{wave} urlseen')
        # 10. frontier expansion from outlinks
        if wave + 1 < cfg.max_waves:
            links = fview.map_batches(
                lambda t: t.filter(
                    pc.and_(pc.equal(t["status"], "ok"),
                            pc.less(t["depth"], cfg.max_depth))
                ).select(["admission_key", "depth", "links"]),
                batch_format="pyarrow",
            ).map_batches(_explode_links(cfg.max_depth), batch_format="pyarrow")
            nxt = links.union(deferred).repartition(FRONTIER_BLOCKS).materialize()
        else:
            nxt = deferred
        n_next = nxt.count()
        _mark(f'w{wave} links+next')
        store.write_table(_collect_control(nxt), "frontier_next", wave)
        _mark(f'w{wave} checkpoint')
        # 11. wave metrics + commit marker
        next_seq += n_admitted
        metrics = pa.table(
            {
                "wave": pa.array([wave], type=pa.int32()),
                "admitted": pa.array([n_admitted], type=pa.int64()),
                "fetched": pa.array([n_admitted - n_failed], type=pa.int64()),
                # fresh = blocked + deferred + admitted, so the dedup
                # drop count falls out without a separate pass:
                "deduped": pa.array(
                    [n_cand - n_blocked - n_deferred - n_admitted],
                    type=pa.int64()),
                "robots_blocked": pa.array([n_blocked], type=pa.int64()),
                "deferred": pa.array([n_deferred], type=pa.int64()),
                "failed": pa.array([n_failed], type=pa.int64()),
            }
        )
        store.write_table(metrics, "metrics", wave,
                          lineage={"next_seq": next_seq, "n_candidates": n_cand,
                                   "n_next": n_next})
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


def _blocked_log_batch(wave: int):
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
                "status": pa.array(["robots_blocked"] * n, type=pa.string()),
                "n_spans": pa.array(np.zeros(n, dtype=np.int32)),
                "n_links": pa.array(np.zeros(n, dtype=np.int32)),
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
