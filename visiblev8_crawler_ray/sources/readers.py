"""Seed-source readers (SURVEY.md §2.1 S1-S3, D6).

The reference feeds URLs from newline files (``url_sender.py:52-79``),
Tranco-style CSV ``(rank, domain)`` (``scripts/crawl.py:342-348``) and
LoginGPT JSONL candidate documents (``eval_banks.py:151-166``).  Each
reader returns a Dataset shaped like SEEDS_SCHEMA's (seed_id, url)
core; `read_seed_sources` unions any mix of them ahead of the
canonicalizer (D6: all sources feed the same submit path,
``scripts/crawl.py:336-352``).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def read_url_file(path: str) -> rd.Dataset:
    """S1: newline URL list -> (seed_id, url); blank lines dropped.

    seed_id is the 0-based line position (deterministic: single file is
    read in order; ids assigned per-block with global offsets)."""
    ds = rd.read_text(path)

    # read_text yields one block per file chunk in order; enumerate via
    # the seq assigner keyed on (text) is wrong under duplicates, so use
    # a single coalesced block (seed files are control-sized).
    def number(t: pa.Table) -> pa.Table:
        txt = pc.utf8_trim_whitespace(t["text"])
        keep = pc.not_equal(txt, "")
        t2 = pa.table({"url": txt}).filter(keep)
        return t2.append_column(
            "seed_id", pa.array(np.arange(t2.num_rows, dtype=np.int64)))

    return ds.repartition(1).map_batches(number, batch_format="pyarrow")


def read_tranco_csv(path: str) -> rd.Dataset:
    """S2: CSV (rank, domain) -> (seed_id=rank, url='http://domain')."""
    ds = rd.read_csv(path)

    def to_seed(t: pa.Table) -> pa.Table:
        cols = t.column_names
        rank = t[cols[0]].cast(pa.int64())
        domain = t[cols[1]]
        url = pc.binary_join_element_wise("http://", domain, "")
        return pa.table({"seed_id": rank, "url": url})

    return ds.map_batches(to_seed, batch_format="pyarrow")


def read_candidates_jsonl(path: str) -> rd.Dataset:
    """S3: JSONL candidate docs {id, url, login_page_strategy, ...} ->
    (seed_id, url, strategy)."""
    ds = rd.read_json(path)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "seed_id": t["id"].cast(pa.int64()),
                "url": t["url"],
                "strategy": t["login_page_strategy"]
                if "login_page_strategy" in t.column_names
                else pa.array([""] * t.num_rows, type=pa.string()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def read_sitemap(path: str) -> rd.Dataset:
    """S-family: sitemap-protocol XML (<urlset><url><loc>…) ->
    (seed_id, url, lastmod, priority).

    seed_id is the 0-based <url> position (the sitemap's document
    order).  Parsing is vectorized arrow: one split on '</url>' turns
    the file into per-entry rows, then one RE2 ``extract_regex`` per
    field — no XML library (the sitemap subset is regular; CDATA and
    namespaces beyond the default are out of scope, documented).
    Sitemap files are control-sized (<=50k URLs by protocol), so the
    single-block numbering mirrors read_url_file."""
    ds = rd.read_binary_files(path)

    def parse(t: pa.Table) -> pa.Table:
        tables = []
        for blob in t["bytes"].to_pylist():
            entries = pc.split_pattern(
                pa.array([blob.decode("utf-8", "replace")]), "</url>")
            flat = pc.list_flatten(entries)
            loc = pc.extract_regex(flat, r"<loc>\s*(?P<u>[^<]*?)\s*</loc>")
            keep = pc.is_valid(loc)
            flat = flat.filter(keep)
            urls = pc.struct_field(loc.filter(keep), "u")
            lastmod = pc.struct_field(
                pc.extract_regex(flat, r"<lastmod>\s*(?P<m>[^<]*?)\s*</lastmod>"),
                "m")
            prio = pc.struct_field(
                pc.extract_regex(flat, r"<priority>\s*(?P<p>[^<]*?)\s*</priority>"),
                "p")
            n = len(flat)
            tables.append(pa.table({
                "seed_id": pa.array(np.arange(n, dtype=np.int64)),
                "url": pc.cast(urls, pa.string()),
                "lastmod": pc.fill_null(pc.cast(lastmod, pa.string()), ""),
                "priority": pc.cast(
                    pc.fill_null(pc.cast(prio, pa.string()), "0.5"),
                    pa.float64()),
            }))
        if not tables:
            return pa.table({"seed_id": pa.array([], type=pa.int64()),
                             "url": pa.array([], type=pa.string()),
                             "lastmod": pa.array([], type=pa.string()),
                             "priority": pa.array([], type=pa.float64())})
        return pa.concat_tables(tables)

    return ds.map_batches(parse, batch_format="pyarrow")


def union_seed_sources(*datasets: rd.Dataset) -> rd.Dataset:
    """D6: union all seed sources (columns aligned to seed_id/url)."""
    out = None
    for ds in datasets:
        core = ds.select_columns(["seed_id", "url"])
        out = core if out is None else out.union(core)
    return out


def prefer_candidates(ds: rd.Dataset, preferred_strategy: str = "CRAWLING") -> rd.Dataset:
    """M4/D2: group candidates by URL, prefer rows with the preferred
    strategy, tie-break by min seed_id (eval_banks.py:20-70)."""
    def pack(t: pa.Table) -> pa.Table:
        pref = pc.cast(
            pc.not_equal(t["strategy"], preferred_strategy), pa.int8())
        ids = t["seed_id"].to_numpy(zero_copy_only=False)
        pr = pref.to_numpy(zero_copy_only=False)
        strat = t["strategy"].to_numpy(zero_copy_only=False)
        packed = pa.array(
            [f"{p}|{i:016x}|{s}" for p, i, s in zip(pr, ids, strat)],
            type=pa.string(),
        )
        t2 = pa.table({"url": t["url"], "packed": packed})
        g = t2.group_by(["url"]).aggregate([("packed", "min")])
        return g.rename_columns(["url", "packed"])

    from ray.data.aggregate import Min

    def unpack(t: pa.Table) -> pa.Table:
        pk = t["packed"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "url": t["url"],
                "seed_id": pa.array([int(s[2:18], 16) for s in pk],
                                    type=pa.int64()),
                "strategy": pa.array([s[19:] for s in pk],
                                     type=pa.string()),
            }
        )

    return (
        ds.map_batches(pack, batch_format="pyarrow")
        .groupby("url")
        .aggregate(Min("packed", alias_name="packed"))
        .map_batches(unpack, batch_format="pyarrow")
    )
