"""Invariants for the training-mix curation operators (beyond the
oracle hash-compare in test_queries_vs_duckdb.py, which covers all five
automatically): structural properties that must hold for ANY corpus."""

import numpy as np

from visiblev8_crawler_ray.pipelines import curation as CU

SF = "/root/testdata/sf0.001"


def test_pack_global_offsets_are_contiguous():
    df = CU.pack_global(SF).sort_values("doc_id").reset_index(drop=True)
    start = df["start_offset"].to_numpy()
    n = df["n_tokens"].to_numpy()
    assert start[0] == 0
    # concat layout: each doc starts exactly where the previous ended
    assert (start[1:] == start[:-1] + n[:-1]).all()
    assert (df["pack_id"].to_numpy() == start // 512).all()
    assert (df["offset_in_pack"].to_numpy() == start % 512).all()
    assert (df["spans_boundary"].to_numpy()
            == (start % 512 + n > 512)).all()


def test_pack_global_range_size_invisible():
    a = CU.pack_global(SF, range_docs=128)
    b = CU.pack_global(SF, range_docs=7)  # same layout, different ranges
    assert a.equals(b)


def test_shuffle_order_is_permutation_and_key_sorted():
    df = CU.shuffle_order(SF)
    pos = np.sort(df["shuffle_pos"].to_numpy())
    assert (pos == np.arange(1, len(df) + 1)).all()
    by_pos = df.sort_values("shuffle_pos")
    keys = list(zip(by_pos["shuffle_key"], by_pos["doc_id"]))
    assert keys == sorted(keys)


def test_shuffle_order_seed_changes_permutation():
    a = CU.shuffle_order(SF, seed="s42").set_index("doc_id")["shuffle_pos"]
    b = CU.shuffle_order(SF, seed="s43").set_index("doc_id")["shuffle_pos"]
    b = b.reindex(a.index)
    assert (a.to_numpy() != b.to_numpy()).any()


def test_split_assign_fractions_and_determinism():
    df = CU.split_assign(SF)
    frac = df["split"].value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9
    assert 0.04 < frac.get("val", 0.0) < 0.17
    assert 0.04 < frac.get("test", 0.0) < 0.17
    assert df.equals(CU.split_assign(SF))


def test_iqr_outlier_flags_match_group_fences():
    df = CU.iqr_outliers(SF)
    for _, g in df.groupby("source"):
        q1, q3 = np.percentile(g["n_chars"].to_numpy(), [25.0, 75.0])
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        exp = (g["n_chars"] < round(lo, 4)) | (g["n_chars"] > round(hi, 4))
        assert (g["is_outlier"] == exp).all()


def test_token_budget_sample_is_maximal_prefix():
    budget = 1000
    df = CU.token_budget_sample(SF, budget=budget)
    assert (df["cum_tokens"] <= budget).all()
    # greedy maximality: within each source, the kept set is the longest
    # hash-ordered prefix whose running total fits the budget
    full = CU.token_budget_sample(SF, budget=10**9)  # everything kept
    for src, g in full.groupby("source"):
        g = g.sort_values("cum_tokens")
        k = int((g["cum_tokens"].to_numpy() <= budget).sum())
        kept = df[df["source"] == src]
        assert len(kept) == k
        assert set(kept["doc_id"]) == set(g["doc_id"].head(k))


def test_export_corpus_resumable(ray_session, tmp_path):
    """Committed partitions are skipped byte-for-byte on re-run; a
    partition whose manifest is lost is rebuilt to identical content;
    the exported rows equal the Gopher-keep set with normalized text."""
    import os

    import duckdb

    from visiblev8_crawler_ray.pipelines.curation import export_corpus
    from visiblev8_crawler_ray.store import TableStore

    SF = "/root/testdata/sf0.001"
    out = str(tmp_path / "corpus_out")
    first = export_corpus(SF, out, nparts=4)
    assert not first["skipped"].any()
    total = int(first["n_rows"].sum())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    import __ray_entry__ as R
    want_keep = con.sql(
        "SELECT count(*) FROM (" + R.oracle_sql()["gopher_filter"] + ") "
        "WHERE keep").fetchone()[0]
    assert total == want_keep > 0

    store = TableStore(out)
    mtimes = {}
    for p in range(4):
        d = store.part_dir("corpus", p)
        mtimes[p] = {f: os.path.getmtime(os.path.join(d, f))
                     for f in os.listdir(d)}

    # re-run: everything skipped, no file touched
    second = export_corpus(SF, out, nparts=4)
    assert second["skipped"].all()
    assert second["n_rows"].sum() == total
    for p in range(4):
        d = store.part_dir("corpus", p)
        assert {f: os.path.getmtime(os.path.join(d, f))
                for f in os.listdir(d)} == mtimes[p]

    # crash simulation: lose partition 2's manifest -> only 2 rebuilds
    os.remove(store.manifest_path("corpus", 2))
    third = export_corpus(SF, out, nparts=4)
    assert third.set_index("partition")["skipped"].tolist() == \
        [True, True, False, True]
    assert third["n_rows"].sum() == total
    for p in (0, 1, 3):
        d = store.part_dir("corpus", p)
        assert {f: os.path.getmtime(os.path.join(d, f))
                for f in os.listdir(d)} == mtimes[p]
    # rebuilt CONTENT identical (file names hash per-batch doc_id
    # subsets, which a different block split may regroup — content is
    # the contract, not the grouping)
    rebuilt = store.read_table("corpus", [2]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert int(rebuilt["doc_id"].size) == \
        int(third.set_index("partition").loc[2, "n_rows"])
    assert (rebuilt["doc_id"] % 4 == 2).all()


def test_export_corpus_nparts_mismatch_refused(ray_session, tmp_path):
    """A store committed under nparts=4 must refuse a nparts=8 re-run
    instead of silently skipping mod-8 partitions holding mod-4 data."""
    import pytest as _pytest

    from visiblev8_crawler_ray.pipelines.curation import export_corpus

    SF = "/root/testdata/sf0.001"
    out = str(tmp_path / "corpus_out")
    export_corpus(SF, out, nparts=4)
    with _pytest.raises(ValueError, match="nparts=4"):
        export_corpus(SF, out, nparts=8)
