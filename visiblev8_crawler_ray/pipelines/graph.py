"""Host-graph link analysis over the crawl output.

Link-graph analytics is the classic crawl-prioritization component
(OPIC / PageRank-guided frontier ordering): the reference harness keeps
per-host submission counts for scheduling (`url_sender.py`'s per-host
pacing); this module generalizes that to the full host->host link graph
mined from the crawl's own fetch log.

Scale shape: the HOST graph is orders of magnitude smaller than the URL
space by construction (a 10^10-URL crawl has ~10^7-10^8 hosts), so the
design is: distributed edge ROLLUP (map_batches partial count -> tiny
final groupby, exchange = O(distinct edges per block)), then broadcast
power iteration over the rolled-up edge table.  At sandbox scale the
iteration runs driver-side on numpy; above ``SCALE_LOG_ROWS`` log rows
(or under ``force_scale``) the IMPLEMENTED partitioned path runs the
same integer kernel as a per-partition map over hash-partitioned edges
(:func:`host_edges_ds`) with a scores/labels broadcast per iteration
(`_pagerank_scale` / `_components_scale` / `_bfs_scale`) — bit-parity
with the driver kernels is pinned by tests/test_host_graph.py.

All PageRank arithmetic is FIXED-POINT INT64 (scores in 1e-12 units of
total mass, per-edge integer division by the source's out-weight), so
results are order-independent, parallelism-independent, and bit-exact
against the unrolled SQL twin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..config import CrawlConfig

PR_SCALE = 10**12   # fixed-point unit: score 1e12 == all the mass
PR_DAMP_NUM = 85    # damping factor 0.85 as a ratio
PR_DAMP_DEN = 100
PR_ITERS = 5


def _edge_partial(t: pa.Table, cfg: CrawlConfig) -> pa.Table:
    """Per-block (src_host, dst_host, n_links) rollup of the outlinks
    every successfully fetched page in the block emitted — the shared
    map phase of both the driver-side and the partitioned edge rollup.

    The synthetic web's outlink rule (synth.outlinks) is a pure function
    of (host, page, j): odd j stays on-host, even j targets
    ``src{(page + j) % n_src_hosts}.example`` — so edges are recomputed
    vectorized from the fetch log's (host, url) columns alone, exactly
    as the SQL twin recomputes them from the log export.  Per batch:
    one regex page extract + ``branching`` vectorized dst builds + one
    arrow group count; the exchange is the per-block edge rollup
    (O(distinct host pairs), never O(fetched URLs))."""
    t = t.filter(pc.equal(t["status"], "ok"))
    if t.num_rows == 0:
        return pa.table({"src_host": pa.array([], type=pa.string()),
                         "dst_host": pa.array([], type=pa.string()),
                         "n_links": pa.array([], type=pa.int64())})
    host = t["host"]
    if isinstance(host, pa.ChunkedArray):
        host = host.combine_chunks()
    ext = pc.extract_regex(t["url"], r"/page/(?P<p>\d+)")
    page_str = pc.if_else(pc.is_valid(ext),
                          pc.struct_field(ext, "p"), "0")
    page = pc.cast(page_str, pa.int64()).to_numpy(zero_copy_only=False)
    srcs, dsts = [], []
    for j in range(1, cfg.branching + 1):
        srcs.append(host)
        if j % 2 == 1:
            dsts.append(host)
        else:
            n = (page + j) % cfg.n_src_hosts
            dsts.append(pc.binary_join_element_wise(
                pa.scalar("src"),
                pc.cast(pa.array(n), pa.string()),
                pa.scalar(".example"), ""))
    flat = pa.table({"src_host": pa.concat_arrays(
                         [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                          else a for a in srcs]),
                     "dst_host": pa.concat_arrays(
                         [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                          else a for a in dsts])})
    g = flat.group_by(["src_host", "dst_host"]).aggregate(
        [([], "count_all")])
    return g.rename_columns(["src_host", "dst_host", "n_links"])


def host_edges(log: rd.Dataset, cfg: CrawlConfig) -> pd.DataFrame:
    """(src_host, dst_host, n_links) rollup, collected to the driver —
    the <~10^7-host regime every sandbox-scale caller uses.  The
    distributed map phase is :func:`_edge_partial`; the final combine
    here is a host-pair-sized pandas groupby.  For graphs too large to
    collect, :func:`host_edges_ds` keeps the rollup a Dataset."""
    parts = log.map_batches(lambda t: _edge_partial(t, cfg),
                            batch_format="pyarrow").to_pandas()
    out = (parts.groupby(["src_host", "dst_host"], as_index=False)
           .agg(n_links=("n_links", "sum")))
    out["n_links"] = out["n_links"].astype("int64")
    return out.sort_values(["src_host", "dst_host"]).reset_index(drop=True)


def host_edges_ds(log: rd.Dataset, cfg: CrawlConfig,
                  nparts: int = 32) -> rd.Dataset:
    """Dataset variant of :func:`host_edges` for the partitioned
    iteration paths: per-block partial rollup, then ONE co-partitioned
    shuffle on hash(src_host) with a per-bucket exact combine — every
    edge of a source host lands in one bucket, so each (src, dst) pair
    resolves to exactly one globally-correct row and ``out_weight(src)``
    is computable inside the bucket.  No driver materialization."""
    from ..functions.util import md5_low64

    def bucketed(t: pa.Table) -> pa.Table:
        e = _edge_partial(t, cfg)
        h = md5_low64(e["src_host"]).view(np.uint64)
        return e.append_column(
            "bucket", pa.array((h % np.uint64(nparts)).astype(np.int64)))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["src_host", "dst_host"], as_index=False)
               .agg(n_links=("n_links", "sum")))
        out["n_links"] = out["n_links"].astype("int64")
        return out

    return (log.map_batches(bucketed, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(combine, batch_format="pandas"))


# Above this many crawl-log rows the host graph is assumed too large
# for the fused driver-side iteration and the partitioned path runs
# instead (the log row count is the cheap pre-rollup proxy for the
# host count, which is only known after the rollup).
SCALE_LOG_ROWS = 20_000_000


def _log_is_large(log: rd.Dataset, scale_log_rows: int) -> bool:
    try:
        return log.count() >= scale_log_rows
    except Exception:  # noqa: BLE001 - unsized source: assume large
        return True


def _host_index(edges: rd.Dataset) -> np.ndarray:
    """Sorted distinct host vector from the rolled-up edge Dataset:
    per-block vectorized unique -> one driver np.unique.  The host
    vector IS the module's documented broadcast regime (10^7-10^8
    entries at a 10^10-URL crawl — the same size as the score/label
    vector each iteration broadcasts), so holding it once is the
    design point, not a leak."""

    def uniq(t: pa.Table) -> pa.Table:
        cols = []
        for c in ("src_host", "dst_host"):
            a = t[c]
            cols.append(a.combine_chunks()
                        if isinstance(a, pa.ChunkedArray) else a)
        return pa.table({"h": pc.unique(pa.concat_arrays(cols))})

    chunks = [b["h"].to_numpy(zero_copy_only=False)
              for b in edges.map_batches(uniq, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")]
    chunks = [c for c in chunks if len(c)]
    if not chunks:
        return np.array([], dtype="<U1")
    # '<U' dtype: np.searchsorted stays a C-level vectorized binary
    # search in the per-batch edge mapping below
    return np.unique(np.concatenate(chunks).astype(str))


def _int_edges(edges: rd.Dataset, hosts_ref) -> rd.Dataset:
    """Map the rolled-up string edges to integer host ranks against the
    broadcast sorted host vector (one ``ray.put``, read per task —
    never re-shipped per batch)."""
    import ray

    def to_int(t: pa.Table) -> pa.Table:
        hosts = ray.get(hosts_ref)
        src = np.searchsorted(
            hosts, t["src_host"].to_numpy(zero_copy_only=False)
            .astype(str))
        dst = np.searchsorted(
            hosts, t["dst_host"].to_numpy(zero_copy_only=False)
            .astype(str))
        return pa.table({"src": pa.array(src.astype(np.int64)),
                         "dst": pa.array(dst.astype(np.int64)),
                         "cnt": pc.cast(t["n_links"], pa.int64())})

    return edges.map_batches(to_int, batch_format="pyarrow")


def _pagerank_scale(log: rd.Dataset, cfg: CrawlConfig,
                    iters: int) -> pd.DataFrame:
    """The documented >=10^8-host fallback, implemented: partitioned
    edge rollup (host_edges_ds), per-iteration map over the integer
    edge blocks with the score vector broadcast via ``ray.put``, and a
    two-phase integer combine whose exchange is O(distinct dst per
    block) — bit-identical to the driver kernel because every op is the
    same int64 arithmetic in a different grouping order (sums and mins
    are order-free; the per-edge floor division happens before any
    reordering)."""
    import ray

    from ..functions.util import two_phase_agg

    edges = host_edges_ds(log, cfg)
    hosts = _host_index(edges)
    n = len(hosts)
    if n == 0:
        return pd.DataFrame({"host": [], "score": []})
    hosts_ref = ray.put(hosts)
    ie = _int_edges(edges, hosts_ref).materialize()

    ow = two_phase_agg(
        ie.map_batches(lambda t: t.select(["src", "cnt"]),
                       batch_format="pyarrow"),
        ["src"], [("cnt", "sum")], ["src", "w"]).to_pandas()
    out_w = np.zeros(n, dtype=np.int64)
    out_w[ow["src"].to_numpy(dtype=np.int64)] = \
        ow["w"].to_numpy(dtype=np.int64)
    ow_ref = ray.put(out_w)

    base = ((PR_DAMP_DEN - PR_DAMP_NUM) * (PR_SCALE // n)) // PR_DAMP_DEN
    score = np.full(n, PR_SCALE // n, dtype=np.int64)
    for _ in range(iters):
        s_ref = ray.put(score)

        def contrib(t: pa.Table, _s=s_ref) -> pa.Table:
            s = ray.get(_s)
            w = ray.get(ow_ref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            cnt = t["cnt"].to_numpy(zero_copy_only=False)
            c = s[src] * cnt // w[src]
            ud, inv = np.unique(dst, return_inverse=True)
            agg = np.zeros(len(ud), dtype=np.int64)
            np.add.at(agg, inv, c)
            return pa.table({"dst": pa.array(ud),
                             "c": pa.array(agg)})

        at = two_phase_agg(
            ie.map_batches(contrib, batch_format="pyarrow"),
            ["dst"], [("c", "sum")], ["dst", "c"]).to_pandas()
        agg = np.zeros(n, dtype=np.int64)
        if len(at):
            agg[at["dst"].to_numpy(dtype=np.int64)] = \
                at["c"].to_numpy(dtype=np.int64)
        score = base + (PR_DAMP_NUM * agg) // PR_DAMP_DEN
    return pd.DataFrame({"host": [str(h) for h in hosts],
                         "score": score})


def host_pagerank(log: rd.Dataset, cfg: CrawlConfig,
                  iters: int = PR_ITERS, force_scale: bool = False,
                  scale_log_rows: int = SCALE_LOG_ROWS) -> pd.DataFrame:
    """Fixed-point integer PageRank over the host graph — the iterative
    frontier-prioritization signal (hosts worth crawling deeper).

    score_0(v) = SCALE // n; each iteration:
    ``score'(v) = ((DEN-NUM) * (SCALE // n)) // DEN
                  + (NUM * sum_u score(u) * c(u,v) // w(u)) // DEN``
    with every op on int64 (per-edge floor division by the source's
    out-weight), so the result is independent of summation order and
    bit-exact vs the unrolled SQL twin.  Dangling mass is dropped the
    same way on both sides.

    Below ``scale_log_rows`` crawl-log rows the iteration runs fused on
    the driver (numpy over the collected host-pair edge table); above
    it — or with ``force_scale`` — the partitioned path runs:
    hash-partitioned edge rollup + per-iteration broadcast-scores map
    (:func:`_pagerank_scale`), bit-parity-tested against this kernel."""
    if force_scale or _log_is_large(log, scale_log_rows):
        return _pagerank_scale(log, cfg, iters)
    edges = host_edges(log, cfg)
    hosts = sorted(set(edges["src_host"]) | set(edges["dst_host"]))
    n = len(hosts)
    if n == 0:
        return pd.DataFrame({"host": [], "score": []})
    hidx = {h: i for i, h in enumerate(hosts)}
    src = edges["src_host"].map(hidx).to_numpy()
    dst = edges["dst_host"].map(hidx).to_numpy()
    cnt = edges["n_links"].to_numpy().astype(np.int64)
    out_w = np.zeros(n, dtype=np.int64)
    np.add.at(out_w, src, cnt)
    base = ((PR_DAMP_DEN - PR_DAMP_NUM) * (PR_SCALE // n)) // PR_DAMP_DEN
    score = np.full(n, PR_SCALE // n, dtype=np.int64)
    for _ in range(iters):
        contrib = score[src] * cnt // out_w[src]
        agg = np.zeros(n, dtype=np.int64)
        np.add.at(agg, dst, contrib)
        score = base + (PR_DAMP_NUM * agg) // PR_DAMP_DEN
    return pd.DataFrame({"host": hosts, "score": score})


def host_edges_sql(log_path: str, cfg: CrawlConfig) -> str:
    """DuckDB twin of :func:`host_edges` over the crawl-log export."""
    return f"""
        WITH ok AS (
            SELECT host,
                   CAST(coalesce(nullif(regexp_extract(url,
                        '/page/(\\d+)', 1), ''), '0') AS BIGINT) AS page
            FROM read_parquet('{log_path}') WHERE status = 'ok'),
        links AS (
            SELECT host AS src_host,
                   CASE WHEN u.j % 2 = 1 THEN host
                        ELSE 'src' || CAST((page + u.j) % {cfg.n_src_hosts}
                                           AS VARCHAR) || '.example'
                   END AS dst_host
            FROM ok, UNNEST(generate_series(1, {cfg.branching})) AS u(j))
        SELECT src_host, dst_host, count(*)::BIGINT AS n_links
        FROM links GROUP BY src_host, dst_host
        ORDER BY src_host, dst_host"""


def host_pagerank_sql(log_path: str, cfg: CrawlConfig,
                      iters: int = PR_ITERS) -> str:
    """Generated unrolled-iteration DuckDB twin of :func:`host_pagerank`
    (same fixed-point integer arithmetic; `//` is floor division on
    BIGINT in DuckDB exactly as in numpy for the nonnegative values
    here)."""
    edges_cte = host_edges_sql(log_path, cfg)
    # strip the ORDER BY tail and reuse as a CTE body
    body = edges_cte.rsplit("ORDER BY", 1)[0]
    sql = f"""
        WITH e_raw AS ({body}),
        outw AS (SELECT src_host, sum(n_links)::BIGINT AS w
                 FROM e_raw GROUP BY src_host),
        nodes AS (SELECT DISTINCT host FROM (
            SELECT src_host AS host FROM e_raw
            UNION SELECT dst_host FROM e_raw)),
        nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
        it0 AS (SELECT host, ({PR_SCALE} // nn.n)::BIGINT AS score
                FROM nodes, nn)"""
    base = (f"(({PR_DAMP_DEN - PR_DAMP_NUM} * ({PR_SCALE} // nn.n))"
            f" // {PR_DAMP_DEN})")
    for i in range(1, iters + 1):
        sql += f""",
        it{i} AS (
            SELECT nd.host,
                   CAST({base} + ({PR_DAMP_NUM} * coalesce(c.contrib, 0))
                        // {PR_DAMP_DEN} AS BIGINT) AS score
            FROM nodes nd CROSS JOIN nn
            LEFT JOIN (
                SELECT e.dst_host AS host,
                       CAST(sum(p.score * e.n_links // o.w) AS BIGINT)
                           AS contrib
                FROM it{i - 1} p
                JOIN e_raw e ON e.src_host = p.host
                JOIN outw o ON o.src_host = e.src_host
                GROUP BY e.dst_host) c ON c.host = nd.host)"""
    sql += f"\n        SELECT host, score FROM it{iters} ORDER BY host"
    return sql


def _min_rounds_scale(ie: rd.Dataset, n: int, lab: np.ndarray,
                      rounds: int, inc: int) -> np.ndarray:
    """Shared distributed kernel of the two synchronous min-propagation
    operators (components: ``inc=0``, BFS: ``inc=1``): per round, map
    over the integer edge blocks emitting block-local min candidates
    for both directions of every undirected edge, combine with a
    two-phase min whose exchange is O(distinct touched nodes per
    block), and scatter into the broadcast label vector.  min is
    idempotent and order-free and each round reads only the previous
    round's broadcast vector, so the fixpoint is bit-identical to the
    driver kernel."""
    import ray

    from ..functions.util import two_phase_agg

    for _ in range(rounds):
        l_ref = ray.put(lab)

        def cands(t: pa.Table, _l=l_ref) -> pa.Table:
            lv = ray.get(_l)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            nodes = np.concatenate([dst, src])
            vals = np.concatenate([lv[src] + inc, lv[dst] + inc])
            un, inv = np.unique(nodes, return_inverse=True)
            m = np.full(len(un), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(m, inv, vals)
            return pa.table({"node": pa.array(un), "m": pa.array(m)})

        at = two_phase_agg(
            ie.map_batches(cands, batch_format="pyarrow"),
            ["node"], [("m", "min")], ["node", "m"]).to_pandas()
        upd = lab.copy()
        if len(at):
            idx = at["node"].to_numpy(dtype=np.int64)
            np.minimum.at(upd, idx, at["m"].to_numpy(dtype=np.int64))
        lab = upd
    return lab


CC_ROUNDS = 8  # fixed min-label rounds; converged when >= graph diameter


def _components_scale(log: rd.Dataset, cfg: CrawlConfig,
                      rounds: int) -> pd.DataFrame:
    """Partitioned min-label propagation — the documented host_components
    fallback, via :func:`_min_rounds_scale`."""
    import ray

    edges = host_edges_ds(log, cfg)
    hosts = _host_index(edges)
    n = len(hosts)
    if n == 0:
        return pd.DataFrame({"host": [], "component": [],
                             "n_members": []})
    ie = _int_edges(edges, ray.put(hosts)).materialize()
    lab = _min_rounds_scale(ie, n, np.arange(n, dtype=np.int64),
                            rounds, inc=0)
    out = pd.DataFrame({"host": [str(h) for h in hosts],
                        "component": np.array([str(h) for h in hosts],
                                              dtype=object)[lab]})
    sizes = out.groupby("component")["host"].size().rename("n_members")
    out = out.merge(sizes, on="component")
    out["n_members"] = out["n_members"].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


def host_components(log: rd.Dataset, cfg: CrawlConfig,
                    rounds: int = CC_ROUNDS, force_scale: bool = False,
                    scale_log_rows: int = SCALE_LOG_ROWS) -> pd.DataFrame:
    """Weakly-connected components of the host graph by ``rounds`` of
    synchronous min-label propagation — the crawl-scope partitioner
    (which host clusters a crawl actually explores; components are the
    natural unit for per-tenant sharding and frontier isolation).

    Label_0(v) = v; each round label'(v) = min(label(v), min over
    UNDIRECTED neighbors u of label(u)) — the update is synchronous
    (reads only the previous round), so the result is a pure function
    of the edge set and the round count, independent of edge order and
    parallelism, and bit-equal to the unrolled SQL twin.  A fixed round
    count >= the graph diameter is exact convergence; the operator is
    DEFINED as the ``rounds``-step fixpoint either way (the kmeans /
    pagerank fixed-iteration contract).

    Scale shape: identical to :func:`host_pagerank` — distributed edge
    rollup (exchange O(distinct edges/block)), then the label iteration
    over the host-sized table (10^7-10^8 rows at a 10^10-URL crawl):
    driver numpy below ``scale_log_rows``, the partitioned
    :func:`_components_scale` above it or under ``force_scale``
    (bit-parity-tested, same arithmetic)."""
    if force_scale or _log_is_large(log, scale_log_rows):
        return _components_scale(log, cfg, rounds)
    edges = host_edges(log, cfg)
    hosts = sorted(set(edges["src_host"]) | set(edges["dst_host"]))
    n = len(hosts)
    if n == 0:
        return pd.DataFrame({"host": [], "component": [], "n_members": []})
    hidx = {h: i for i, h in enumerate(hosts)}
    src = edges["src_host"].map(hidx).to_numpy()
    dst = edges["dst_host"].map(hidx).to_numpy()
    # hosts is sorted, so integer rank order == lexicographic order and
    # integer min-propagation == string min-propagation
    lab = np.arange(n, dtype=np.int64)
    for _ in range(rounds):
        upd = lab.copy()
        np.minimum.at(upd, dst, lab[src])   # reads PREVIOUS labels only
        np.minimum.at(upd, src, lab[dst])
        lab = upd
    out = pd.DataFrame({"host": hosts,
                        "component": np.array(hosts, dtype=object)[lab]})
    sizes = out.groupby("component")["host"].size().rename("n_members")
    out = out.merge(sizes, on="component")
    out["n_members"] = out["n_members"].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


def host_components_sql(log_path: str, cfg: CrawlConfig,
                        rounds: int = CC_ROUNDS) -> str:
    """Unrolled DuckDB twin of :func:`host_components`: the same edge
    recomputation as :func:`host_edges_sql`, an undirected neighbor
    list, and ``rounds`` materialized min-label CTE blocks (string
    ``least``/``min`` == the engine's sorted-rank integer min)."""
    body = host_edges_sql(log_path, cfg).rsplit("ORDER BY", 1)[0]
    sql = f"""
        WITH e_raw AS MATERIALIZED ({body}),
        nodes AS MATERIALIZED (SELECT DISTINCT host FROM (
            SELECT src_host AS host FROM e_raw
            UNION SELECT dst_host FROM e_raw)),
        nb AS MATERIALIZED (
            SELECT src_host AS host, dst_host AS nbr FROM e_raw
            UNION ALL SELECT dst_host, src_host FROM e_raw),
        l0 AS MATERIALIZED (SELECT host, host AS lab FROM nodes)"""
    for i in range(1, rounds + 1):
        sql += f""",
        l{i} AS MATERIALIZED (
            SELECT l.host,
                   least(l.lab, coalesce(min(ln.lab), l.lab)) AS lab
            FROM l{i - 1} l
            LEFT JOIN nb ON nb.host = l.host
            LEFT JOIN l{i - 1} ln ON ln.host = nb.nbr
            GROUP BY l.host, l.lab)"""
    sql += f"""
        SELECT host, lab AS component,
               count(*) OVER (PARTITION BY lab) AS n_members
        FROM l{rounds} ORDER BY host"""
    return sql


BFS_ROUNDS = 8      # fixed frontier rounds; exact when >= eccentricity
BFS_INF = 1 << 30   # unreached sentinel inside the iteration


def _bfs_scale(log: rd.Dataset, cfg: CrawlConfig,
               rounds: int) -> pd.DataFrame:
    """Partitioned BFS relaxation — the documented host_bfs fallback,
    via :func:`_min_rounds_scale` with ``inc=1``."""
    import ray

    edges = host_edges_ds(log, cfg)
    hosts = _host_index(edges)
    n = len(hosts)
    if n == 0:
        return pd.DataFrame({"host": [], "dist": []})
    ie = _int_edges(edges, ray.put(hosts)).materialize()
    dist0 = np.full(n, BFS_INF, dtype=np.int64)
    dist0[0] = 0                     # hosts is sorted: rank 0 == min
    dist = _min_rounds_scale(ie, n, dist0, rounds, inc=1)
    out = pd.DataFrame({"host": [str(h) for h in hosts], "dist": dist})
    out["dist"] = out["dist"].where(out["dist"] < BFS_INF).astype("Int64")
    return out.sort_values("host").reset_index(drop=True)


def host_bfs(log: rd.Dataset, cfg: CrawlConfig,
             rounds: int = BFS_ROUNDS, force_scale: bool = False,
             scale_log_rows: int = SCALE_LOG_ROWS) -> pd.DataFrame:
    """Min-hop BFS distances over the (undirected) host graph from the
    lexicographically smallest host — the reachability / blast-radius
    query (how many link hops from an origin to every other host a
    crawl touched), the third fixed-iteration graph operator next to
    pagerank and components.

    Synchronous relaxation: ``dist_0(src) = 0``, else INF; each round
    ``dist'(v) = min(dist(v), 1 + min over neighbors u of dist(u))`` —
    reads only the previous round, so the result is a pure function of
    the edge set and round count (the kmeans/pagerank/components
    fixed-iteration contract; ``rounds`` >= the source eccentricity is
    exact BFS).  Unreached hosts report NULL.

    Scale shape: identical to host_components — distributed edge
    rollup, then the per-round relaxation over the host-sized table
    (driver numpy below ``scale_log_rows``; the partitioned
    :func:`_bfs_scale` above it or under ``force_scale``,
    bit-parity-tested, same arithmetic)."""
    if force_scale or _log_is_large(log, scale_log_rows):
        return _bfs_scale(log, cfg, rounds)
    edges = host_edges(log, cfg)
    hosts = sorted(set(edges["src_host"]) | set(edges["dst_host"]))
    n = len(hosts)
    if n == 0:
        return pd.DataFrame({"host": [], "dist": []})
    hidx = {h: i for i, h in enumerate(hosts)}
    src = edges["src_host"].map(hidx).to_numpy()
    dst = edges["dst_host"].map(hidx).to_numpy()
    dist = np.full(n, BFS_INF, dtype=np.int64)
    dist[0] = 0                      # hosts[0] == min(host)
    for _ in range(rounds):
        upd = dist.copy()
        np.minimum.at(upd, dst, dist[src] + 1)  # previous round only
        np.minimum.at(upd, src, dist[dst] + 1)
        dist = upd
    out = pd.DataFrame({"host": hosts, "dist": dist})
    out["dist"] = out["dist"].where(out["dist"] < BFS_INF).astype("Int64")
    return out.sort_values("host").reset_index(drop=True)


def host_bfs_sql(log_path: str, cfg: CrawlConfig,
                 rounds: int = BFS_ROUNDS) -> str:
    """Unrolled DuckDB twin of :func:`host_bfs`: the shared edge
    recomputation, an undirected neighbor list, and ``rounds``
    materialized relaxation blocks (INF carried as a plain BIGINT
    sentinel, NULLed in the projection)."""
    body = host_edges_sql(log_path, cfg).rsplit("ORDER BY", 1)[0]
    sql = f"""
        WITH e_raw AS MATERIALIZED ({body}),
        nodes AS MATERIALIZED (SELECT DISTINCT host FROM (
            SELECT src_host AS host FROM e_raw
            UNION SELECT dst_host FROM e_raw)),
        nb AS MATERIALIZED (
            SELECT src_host AS host, dst_host AS nbr FROM e_raw
            UNION ALL SELECT dst_host, src_host FROM e_raw),
        d0 AS MATERIALIZED (
            SELECT host,
                   CASE WHEN host = (SELECT min(host) FROM nodes)
                        THEN 0 ELSE {BFS_INF} END AS dist
            FROM nodes)"""
    for i in range(1, rounds + 1):
        sql += f""",
        d{i} AS MATERIALIZED (
            SELECT d.host,
                   least(d.dist,
                         coalesce(min(dn.dist) + 1, d.dist)) AS dist
            FROM d{i - 1} d
            LEFT JOIN nb ON nb.host = d.host
            LEFT JOIN d{i - 1} dn ON dn.host = nb.nbr
            GROUP BY d.host, d.dist)"""
    sql += f"""
        SELECT host,
               CASE WHEN dist < {BFS_INF} THEN dist END AS dist
        FROM d{rounds} ORDER BY host"""
    return sql


def host_triangles(log: rd.Dataset, cfg: CrawlConfig) -> pd.DataFrame:
    """Triangle census of the undirected host link graph — the local
    clustering signal (with the degree table it yields clustering
    coefficients) a crawl-quality analysis reads to spot link farms vs
    organic neighborhoods.

    Undirected simple edges = the symmetrized distinct (src, dst) pairs
    of :func:`host_edges` minus self-loops; one row per triangle
    {a < b < c}.  Scale shape: the distributed part is the edge rollup
    (host_edges' per-block combine over the crawl log); the census then
    runs on the HOST-sized edge table (the module's documented
    host-graph regime — same as the pagerank/components label maps);
    at 10^8 hosts it becomes the standard edge-partitioned
    intersection join keyed on the lower-degree endpoint."""
    e = host_edges(log, cfg)
    if len(e) == 0:
        return pd.DataFrame({"a": pd.Series([], dtype=object),
                             "b": pd.Series([], dtype=object),
                             "c": pd.Series([], dtype=object)})
    und = set()
    for s, d in zip(e["src_host"], e["dst_host"]):
        if s != d:
            und.add((s, d) if s < d else (d, s))
    import collections
    adj = collections.defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    rows = []
    for a, b in sorted(und):
        for c in sorted(adj[a] & adj[b]):
            if c > b:
                rows.append((a, b, c))
    return pd.DataFrame(rows, columns=["a", "b", "c"]) \
        .sort_values(["a", "b", "c"]).reset_index(drop=True)


def host_triangles_sql(log_path: str, cfg: CrawlConfig) -> str:
    body = host_edges_sql(log_path, cfg).rsplit("ORDER BY", 1)[0]
    return f"""
        WITH e_raw AS ({body}),
        und AS (SELECT DISTINCT least(src_host, dst_host) AS a,
                       greatest(src_host, dst_host) AS b
                FROM e_raw WHERE src_host <> dst_host)
        SELECT e1.a AS a, e1.b AS b, e2.b AS c
        FROM und e1
        JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
        ORDER BY 1, 2, 3"""


def host_clustering(log: rd.Dataset, cfg: CrawlConfig) -> pd.DataFrame:
    """Per-host local clustering coefficient over the undirected host
    graph: ``2 x triangles(v) / (deg(v) x (deg(v) - 1))`` — the census
    companion to :func:`host_triangles` (link-farm neighborhoods read
    near 1.0, organic hub hosts near 0).  Exact rationals: triangle
    and degree counts are integers, ONE rounded division per row."""
    from ..functions.util import round_half_away

    tri = host_triangles(log, cfg)
    e = host_edges(log, cfg)
    empty = pd.DataFrame({"host": pd.Series([], dtype=object),
                          "degree": pd.Series([], dtype="int64"),
                          "n_triangles": pd.Series([], dtype="int64"),
                          "clustering": pd.Series([], dtype="float64")})
    if len(e) == 0:
        return empty
    und = set()
    for s, d in zip(e["src_host"], e["dst_host"]):
        if s != d:
            und.add((s, d) if s < d else (d, s))
    import collections
    deg = collections.Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    tcnt = collections.Counter()
    for r in tri.itertuples():
        for v in (r.a, r.b, r.c):
            tcnt[v] += 1
    hosts = sorted(deg)
    d = np.array([deg[h] for h in hosts], dtype=np.int64)
    t = np.array([tcnt.get(h, 0) for h in hosts], dtype=np.int64)
    denom = d * (d - 1)
    cl = round_half_away(
        np.divide(2.0 * t, denom, out=np.zeros(len(d)),
                  where=denom > 0), 6)
    return pd.DataFrame({"host": hosts, "degree": d,
                         "n_triangles": t, "clustering": cl}) \
        .reset_index(drop=True)


def host_clustering_sql(log_path: str, cfg: CrawlConfig) -> str:
    body = host_edges_sql(log_path, cfg).rsplit("ORDER BY", 1)[0]
    return f"""
        WITH e_raw AS ({body}),
        und AS (SELECT DISTINCT least(src_host, dst_host) AS a,
                       greatest(src_host, dst_host) AS b
                FROM e_raw WHERE src_host <> dst_host),
        tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
                FROM und e1
                JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
        tv AS (SELECT v AS host, count(*) AS n_triangles FROM (
                   SELECT a AS v FROM tri
                   UNION ALL SELECT b FROM tri
                   UNION ALL SELECT c FROM tri) GROUP BY v),
        dv AS (SELECT v AS host, count(*) AS degree FROM (
                   SELECT a AS v FROM und
                   UNION ALL SELECT b FROM und) GROUP BY v)
        SELECT dv.host, CAST(dv.degree AS BIGINT) AS degree,
               CAST(coalesce(tv.n_triangles, 0) AS BIGINT)
                   AS n_triangles,
               CASE WHEN dv.degree > 1
                    THEN round(2.0 * coalesce(tv.n_triangles, 0)
                               / (dv.degree * (dv.degree - 1)), 6)
                    ELSE 0.0 END AS clustering
        FROM dv LEFT JOIN tv USING (host)
        ORDER BY host"""
