"""Resumable table store with per-partition lineage manifests.

The reference persists crawl state across Postgres (submissions ledger),
NFS directories (raw/parsed logs), Mongo GridFS (artifacts) and a pickle
cursor (``url_progress.pkl``, ``url_sender.py:146-200``).  Here every
table is a directory of columnar partitions:

    <root>/<table>/wave=<k>/part-*.parquet     (data)
    <root>/<table>/wave=<k>/_MANIFEST.json     (commit marker + lineage)

A partition EXISTS iff its manifest exists — writes go to a temp dir and
are renamed into place, so readers never see partial output and a rerun
skips committed partitions (the "rerun=False" cache semantics of
``endpoints/tasks.py:150-156`` generalized to partitions).

Storage format: Lance when the ``lance`` package is importable (the
north-rule target), else Parquet with the identical logical schema —
this sandbox ships only Parquet.  All read paths go through
``ray.data`` so the engine streams blocks either way.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

try:  # pragma: no cover - lance absent in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


class TableStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        # finish any compaction interrupted mid-swap BEFORE the first
        # read: a crash can leave 'wave=N.old' (live dir parked) and/or
        # 'wave=N.compact-*' (tmp rewrite) — see compact() for the
        # window-by-window story
        for name in os.listdir(root):
            tdir = os.path.join(root, name)
            if os.path.isdir(tdir):
                self._recover_compaction(tdir)

    @staticmethod
    def _recover_compaction(tdir: str) -> None:
        """Roll an interrupted :meth:`compact` forward or back.

        Crash windows (swap order: write tmp fully -> rename live to
        .old -> rename tmp to live -> remove .old):
        - tmp exists, live intact: rewrite never swapped — drop tmp;
        - .old exists, live missing: crash between the renames — park
          the partition back (tmp, if present, is dropped: recompact);
        - .old exists, live exists: crash before the cleanup — drop .old.
        """
        names = os.listdir(tdir)
        for name in names:
            if name.endswith(".old"):
                live = os.path.join(tdir, name[:-4])
                if not os.path.exists(live):
                    os.rename(os.path.join(tdir, name), live)
                else:
                    shutil.rmtree(os.path.join(tdir, name))
        for name in names:
            if ".compact-" in name and os.path.isdir(os.path.join(tdir, name)):
                shutil.rmtree(os.path.join(tdir, name))

    # -- partition paths ----------------------------------------------------
    def part_dir(self, table: str, wave: int) -> str:
        return os.path.join(self.root, table, f"wave={wave}")

    def manifest_path(self, table: str, wave: int) -> str:
        return os.path.join(self.part_dir(table, wave), "_MANIFEST.json")

    def committed(self, table: str, wave: int) -> bool:
        return os.path.exists(self.manifest_path(table, wave))

    def committed_waves(self, table: str) -> list[int]:
        tdir = os.path.join(self.root, table)
        if not os.path.isdir(tdir):
            return []
        waves = []
        for name in os.listdir(tdir):
            # 'wave=<int>' only: a compaction interrupted mid-swap can
            # leave 'wave=N.old' / 'wave=N.compact-*' siblings (repaired
            # by _recover_compaction, but a CONCURRENT reader in another
            # process must not trip over them)
            if name.startswith("wave=") and name.split("=", 1)[1].isdigit() \
                    and os.path.exists(
                        os.path.join(tdir, name, "_MANIFEST.json")):
                waves.append(int(name.split("=", 1)[1]))
        return sorted(waves)

    # -- writes -------------------------------------------------------------
    def prepare_partition(self, table: str, wave: int) -> str:
        """Open a partition for in-place side-writes from map tasks.

        The manifest is the commit marker, so tasks may write directly
        into the final directory: a crash before :meth:`commit_partition`
        leaves an uncommitted dir that the next run clears here.  Task
        retries overwrite the same deterministic filenames via
        tmp+rename, so at-least-once execution stays idempotent.
        """
        d = self.part_dir(table, wave)
        if os.path.exists(d):
            shutil.rmtree(d)
        os.makedirs(d)
        return d

    def commit_partition(self, table: str, wave: int,
                         lineage: dict | None = None) -> None:
        self._commit(table, wave, lineage)

    def write_dataset(self, ds: rd.Dataset, table: str, wave: int,
                      lineage: dict | None = None) -> None:
        """Write a Dataset as one committed partition (atomic via rename).

        Materialized inputs (the crawl's frontier checkpoints) write via
        ONE raw-task round over their block refs instead of a full
        ``write_parquet`` execution — the same execution-floor shave as
        functions/seq.py; unmaterialized or metadata-less datasets keep
        the write_parquet path."""
        final = self.part_dir(table, wave)
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        if os.path.exists(final):
            shutil.rmtree(final)
        os.makedirs(tmp, exist_ok=True)  # empty datasets write no files
        blocks = None
        try:
            blocks = [r for b in ds.iter_internal_ref_bundles()
                      for (r, m) in b.blocks if m.num_rows]
        except Exception:  # pragma: no cover - unmaterialized input
            blocks = None
        if blocks is not None:
            import ray as _ray

            @_ray.remote
            def _write_block(block, path: str) -> int:
                import pandas as _pd

                if isinstance(block, _pd.DataFrame):
                    block = pa.Table.from_pandas(block,
                                                 preserve_index=False)
                pq.write_table(block, path)
                return block.num_rows

            _ray.get([
                _write_block.remote(
                    r, os.path.join(tmp, f"part-{i:06d}.parquet"))
                for i, r in enumerate(blocks)])
        else:
            ds.write_parquet(tmp)
        os.rename(tmp, final)
        self._commit(table, wave, lineage)

    def write_table(self, tbl: pa.Table, table: str, wave: int,
                    lineage: dict | None = None) -> None:
        """Driver-side write of a small control table (metrics, frontier)."""
        final = self.part_dir(table, wave)
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(tbl, os.path.join(tmp, "part-0.parquet"))
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        self._commit(table, wave, lineage)

    def _commit(self, table: str, wave: int, lineage: dict | None) -> None:
        man = {"table": table, "wave": wave, "committed_at": time.time()}
        man.update(lineage or {})
        tmp = self.manifest_path(table, wave) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.rename(tmp, self.manifest_path(table, wave))

    # -- reads --------------------------------------------------------------
    def _data_files(self, table: str, waves: list[int] | None) -> list[str]:
        if waves is None:
            waves = self.committed_waves(table)
        files: list[str] = []
        for w in waves:
            d = self.part_dir(table, w)
            files.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
        return files

    def read_dataset(self, table: str, waves: list[int] | None = None,
                     columns: list[str] | None = None) -> rd.Dataset | None:
        files = self._data_files(table, waves)
        if not files:
            return None
        # clean read: Ray's write_parquet can embed pandas schema
        # metadata (a nested dict) when a block passed through a pandas
        # stage, which makes hash(pa.Schema) raise and every downstream
        # shuffle reduce lose the schema-dedup fast path
        from .functions.util import read_parquet_clean
        return read_parquet_clean(files, columns=columns)

    def read_table(self, table: str, waves: list[int] | None = None,
                   columns: list[str] | None = None) -> pa.Table | None:
        """Driver-side read of a small control table."""
        files = self._data_files(table, waves)
        if not files:
            return None
        return pa.concat_tables(
            [pq.read_table(f, columns=columns) for f in files]
        )

    def read_manifest(self, table: str, wave: int) -> dict:
        with open(self.manifest_path(table, wave)) as f:
            return json.load(f)

    # -- maintenance ---------------------------------------------------------
    def compact(self, table: str, target_rows: int = 1_000_000,
                waves: list[int] | None = None) -> dict:
        """Small-file compaction: rewrite each committed wave partition
        into ~``target_rows``-row parquet files.

        The crawl's side-writing stages leave one file per task (64+
        per wave); at 100-TB scale a store accumulates millions of
        small files, and every later read pays per-file open cost.
        Compaction is an offline, per-partition maintenance op (the
        Lance/lakehouse ``compact_files`` analog): rows and manifest
        lineage are preserved, only the file layout changes — readers
        never depend on file order (all consumers sort explicitly).

        Crash safety: the rewrite lands in a tmp dir, the live dir is
        parked at ``<dir>.old``, tmp renamed in, then ``.old`` removed.
        A crash between the renames leaves ``.old`` intact; the next
        :meth:`compact` call restores it before doing anything else.
        Returns {wave: (files_before, files_after)}.
        """
        done: dict[int, tuple[int, int]] = {}
        tdir = os.path.join(self.root, table)
        if os.path.isdir(tdir):  # repair any compaction a crash cut short
            self._recover_compaction(tdir)
        for w in (waves if waves is not None else self.committed_waves(table)):
            d = self.part_dir(table, w)
            files = [f for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
            n_rows = sum(pq.read_metadata(os.path.join(d, f)).num_rows
                         for f in files)
            n_out = max(1, -(-n_rows // target_rows))
            if len(files) <= n_out:
                done[w] = (len(files), len(files))
                continue
            ds = self.read_dataset(table, waves=[w])
            tmp = d + f".compact-{uuid.uuid4().hex[:8]}"
            os.makedirs(tmp)
            ds.repartition(n_out).write_parquet(tmp)
            man = self.read_manifest(table, w)
            man["compacted"] = {"files_before": len(files), "rows": n_rows}
            with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
                json.dump(man, f)
            os.rename(d, d + ".old")
            os.rename(tmp, d)
            shutil.rmtree(d + ".old")
            done[w] = (len(files),
                       len([f for f in os.listdir(d) if f.endswith(".parquet")]))
        return done
