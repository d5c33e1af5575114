"""Distributed global sequence assignment (zip-with-index).

Ray Data has no `zipWithIndex`; the portable pattern (same as Spark's
RDD.zipWithIndex) is: sort -> per-block (first_key, row_count) summary
-> cumulative offsets on the driver (tiny: one row per block) ->
broadcast the offset map back into a per-block `map_batches` that emits
`offset + arange(n)`.

Requires the sort key to be UNIQUE per row (the caller passes a
tiebreaker column such as the URL) so the first-row key identifies a
block unambiguously even when the sort splits equal keys across blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _key_of(batch: pa.Table, cols: list[str]) -> tuple:
    return tuple(batch.column(c)[0].as_py() for c in cols)


def assign_global_seq(
    ds: rd.Dataset,
    sort_cols: list[str],
    seq_col: str = "seq",
    start: int = 0,
    return_count: bool = False,
) -> rd.Dataset | tuple[rd.Dataset, int]:
    """Return `ds` sorted by `sort_cols` with a dense global index column.

    One extra pass over the sorted blocks to collect (first_key, count);
    the offset map that ships back is O(num_blocks), not O(rows).
    ``return_count=True`` also returns the total row count (free — it is
    the sum of the block summaries), sparing callers a count() pass.
    """
    mat = ds.sort(sort_cols).materialize()

    def block_summary(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({c: batch[c].slice(0, 0) for c in sort_cols} |
                            {"__n": pa.array([], type=pa.int64())})
        head = batch.slice(0, 1)
        return pa.table({c: head[c] for c in sort_cols} |
                        {"__n": pa.array([batch.num_rows], type=pa.int64())})

    summaries = mat.map_batches(
        block_summary, batch_format="pyarrow", batch_size=None
    ).take_all()
    # Blocks are range-partitioned after the sort: ordering the summaries
    # by their (unique) first-row key orders the blocks.  Keys stay native
    # tuples end to end — no string round-tripping of data-derived values.
    order = sorted(summaries, key=lambda r: tuple(r[c] for c in sort_cols))
    offsets: dict[tuple, int] = {}
    acc = start
    for row in order:
        offsets[tuple(row[c] for c in sort_cols)] = acc
        acc += int(row["__n"])
    offsets_ref = ray.put(offsets)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(seq_col, pa.array([], type=pa.int64()))
        off = ray.get(offsets_ref)[_key_of(batch, sort_cols)]
        seq = pa.array(off + np.arange(batch.num_rows, dtype=np.int64))
        return batch.append_column(seq_col, seq)

    out = mat.map_batches(assign, batch_format="pyarrow", batch_size=None)
    if return_count:
        return out, acc - start
    return out


def assign_group_rank(
    ds: rd.Dataset,
    group_col: str,
    order_cols: list[str],
    rank_col: str = "rank",
) -> rd.Dataset:
    """Dense per-group rank (ROW_NUMBER() OVER (PARTITION BY group ORDER
    BY order_cols), 0-based) via ONE range-partitioned sort — never a
    groupby(group).map_groups.

    The groupby form caps reduce parallelism at the number of DISTINCT
    groups and concentrates a hot group into one task (the crawl's
    hot-host skew point); the sort form spreads every group across
    range-partitioned blocks, so parallelism is block-count-bound and a
    hot group costs no more than its row share.  Per-group offsets come
    from control-size block summaries (one row per (block, group)), the
    same zip-with-index machinery as :func:`assign_global_seq`.

    Requires ``[group_col] + order_cols`` to be row-unique (callers pass
    a unique tiebreaker, as for assign_global_seq).
    """
    sort_cols = [group_col] + order_cols
    mat = ds.sort(sort_cols).materialize()

    def block_summary(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {c: batch[c].slice(0, 0) for c in sort_cols}
                | {"__g": batch[group_col].slice(0, 0),
                   "__n": pa.array([], type=pa.int64())})
        head = batch.slice(0, 1)
        # groups are contiguous inside a sorted block: per-group counts
        g = batch.group_by([group_col]).aggregate([([], "count_all")])
        k = g.num_rows
        return pa.table(
            {c: pa.concat_arrays([head[c].combine_chunks()] * k)
             for c in sort_cols}
            | {"__g": g[group_col],
               "__n": g.column(1).cast(pa.int64())})

    summaries = mat.map_batches(
        block_summary, batch_format="pyarrow", batch_size=None
    ).take_all()
    by_block: dict[tuple, list] = {}
    for row in summaries:
        by_block.setdefault(
            tuple(row[c] for c in sort_cols), []).append(row)
    running: dict = {}
    bases: dict[tuple, dict] = {}
    for key in sorted(by_block):
        base = {}
        for row in by_block[key]:
            g = row["__g"]
            base[g] = running.get(g, 0)
            running[g] = base[g] + int(row["__n"])
        bases[key] = base
    bases_ref = ray.put(bases)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(rank_col,
                                       pa.array([], type=pa.int64()))
        base = ray.get(bases_ref)[_key_of(batch, sort_cols)]
        gv = batch[group_col].to_numpy(zero_copy_only=False)
        # contiguous segments: first occurrence index per group value
        uniq, seg_start = np.unique(gv, return_index=True)
        order = np.argsort(seg_start)
        uniq, seg_start = uniq[order], seg_start[order]
        # rank = position within segment + broadcast base
        seg_idx = np.searchsorted(seg_start, np.arange(batch.num_rows),
                                  side="right") - 1
        within = np.arange(batch.num_rows, dtype=np.int64) - seg_start[seg_idx]
        base_arr = np.array([base[u] for u in uniq], dtype=np.int64)
        rank = within + base_arr[seg_idx]
        return batch.append_column(rank_col, pa.array(rank))

    return mat.map_batches(assign, batch_format="pyarrow", batch_size=None)
