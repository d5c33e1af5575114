"""Seeded fuzz for the embeddings-only and events-only SQL-gated
operators over RANDOMIZED tables — same gate as the documents fuzz in
test_fuzz_session5.py: bit-exact DuckDB parity must hold on ANY input,
including planted exact duplicates, cosine ties, same-timestamp events
and empty-ish groups."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as R  # noqa: E402

def _ops_touching_only(table: str) -> list[str]:
    """Auto-discover oracle_sql() entries whose SQL references ONLY the
    given table — new single-table ops join the fuzz gate without a
    hand-edit (the documents family's _documents_only_ops idiom)."""
    all_tables = ["documents", "embeddings", " events", "lineitem",
                  " orders", "customer", "supplier", "nation", "region",
                  "read_parquet", "seeds", " part"]
    out = []
    for name, q in R.oracle_sql().items():
        ql = q.lower()
        used = [t for t in all_tables if t in ql]
        if used == [table]:
            out.append(name)
    return sorted(out)


EMB_OPS = _ops_touching_only("embeddings")
EV_OPS = _ops_touching_only(" events")


def test_table_fuzz_lists_track_the_registry():
    """Known members must stay discovered; shrinkage means the
    footprint heuristic broke, not that ops left the registry."""
    assert {"embedding_covariance", "kmeans_step",
            "knn_brute"} <= set(EMB_OPS) and len(EMB_OPS) >= 8
    assert {"sessionize", "events_tumbling_window",
            "funnel_counts"} <= set(EV_OPS) and len(EV_OPS) >= 14


def _norm(df):
    df = pd.DataFrame(df)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _random_embeddings(rng, n=48, dim=64):
    mat = rng.normal(0, 1, (n, dim)).round(4)
    # plant exact duplicates and near-duplicates (scaled copies have
    # cosine 1.0; tiny perturbations sit near the near-dup thresholds)
    mat[7] = mat[3]
    mat[11] = mat[5] * 2.0
    mat[13] = mat[5] + rng.normal(0, 0.01, dim).round(4)
    return pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
        "label": pa.array((np.arange(n) % 4).astype(np.int32)),
    })


def _random_events(rng, n=400):
    base = np.datetime64("2024-01-01T00:00:00")
    # coarse offsets force same-timestamp ties; bursts force session
    # and window boundary cases
    offs = np.sort(rng.integers(0, 5000, n)) * np.timedelta64(37, "s")
    types = np.array(["signup", "login", "purchase", "error", "view"])
    return pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "ts": pa.array((base + offs).astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 12, n).astype(np.int64)),
        "event_type": pa.array(types[rng.integers(0, 5, n)]),
        "value": pa.array(np.round(rng.uniform(0, 300, n), 2)),
        "props": pa.array(
            [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n)]),
    })


def _run(ops, table_name, tbl, tmp_path):
    pq.write_table(tbl, tmp_path / f"{table_name}.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW {table_name} AS SELECT * "
            f"FROM '{tmp_path}/{table_name}.parquet'")
    q, sql = R.queries(), R.oracle_sql()
    for name in ops:
        res = q[name](str(tmp_path))
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        odf = con.sql(sql[name]).df()
        a, b = _norm(df), _norm(odf)
        assert list(a.columns) == list(b.columns), name
        assert len(a) == len(b), (name, len(a), len(b))
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=True, obj=name)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_embeddings_ops_fuzz_vs_duckdb(ray_session, tmp_path, seed):
    rng = np.random.default_rng(200 + seed)
    _run(EMB_OPS, "embeddings", _random_embeddings(rng), tmp_path)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_events_ops_fuzz_vs_duckdb(ray_session, tmp_path, seed):
    rng = np.random.default_rng(300 + seed)
    _run(EV_OPS, "events", _random_events(rng), tmp_path)


REL_OPS = ["anti_join_retry", "bloom_semi_join", "confidence_histogram",
           "customer_orders_full", "customer_value_label", "group_corr",
           "keyset_page",
           "lineitem_rollup", "multi_origin_rollup", "orders_pivot",
           "orders_with_customer", "sample_head", "shipping_priority",
           "top10_customers", "usage_rollup", "zorder_extents",
           "column_profile", "orders_skyline", "basket_pairs",
           "lineitem_unpivot", "small_quantity_revenue",
           "late_priority_counts", "idle_rich_customers",
           "pricing_summary", "customer_order_histogram", "orders_cube",
           "big_order_customers", "part_revenue_share"]


def _random_relational(rng, n_cust=25, n_orders=120, n_lines=300):
    base = np.datetime64("2024-01-01")
    cust = pa.table({
        "c_custkey": pa.array(range(n_cust), type=pa.int64()),
        "c_name": pa.array([f"cust{i}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 5, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-100, 9000, n_cust), 2)),
        "c_mktsegment": pa.array(
            np.array(["AUTO", "BUILDING", "MACH"])[
                rng.integers(0, 3, n_cust)]),
    })
    # some custkeys never order (anti-join) and some orderkeys carry
    # no lineitems (semi-join misses)
    orders = pa.table({
        "o_orderkey": pa.array(range(n_orders), type=pa.int64()),
        "o_custkey": pa.array(
            rng.integers(0, n_cust + 5, n_orders).astype(np.int64)),
        "o_orderstatus": pa.array(
            np.array(["O", "F", "P"])[rng.integers(0, 3, n_orders)]),
        "o_totalprice": pa.array(
            np.round(rng.uniform(0, 600_000, n_orders), 2)),
        "o_orderdate": pa.array(
            (base + rng.integers(0, 300, n_orders)
             * np.timedelta64(1, "D")).astype("datetime64[us]")),
        "o_orderpriority": pa.array(
            np.array(["1-URGENT", "2-HIGH", "3-MEDIUM"])[
                rng.integers(0, 3, n_orders)]),
    })
    lines = pa.table({
        "l_orderkey": pa.array(
            rng.integers(0, n_orders, n_lines).astype(np.int64)),
        "l_partkey": pa.array(rng.integers(0, 50, n_lines).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(0, 10, n_lines).astype(np.int64)),
        "l_linenumber": pa.array(
            rng.integers(1, 7, n_lines).astype(np.int32)),
        "l_quantity": pa.array(rng.integers(1, 50, n_lines).astype(float)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(10, 90_000, n_lines), 2)),
        "l_discount": pa.array(
            np.round(rng.uniform(0, 0.1, n_lines), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_lines), 2)),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_lines)]),
        "l_linestatus": pa.array(
            np.array(["O", "F"])[rng.integers(0, 2, n_lines)]),
        "l_shipdate": pa.array(
            (base + rng.integers(0, 330, n_lines)
             * np.timedelta64(1, "D")).astype("datetime64[us]")),
    })
    return {"customer": cust, "orders": orders, "lineitem": lines}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_relational_ops_fuzz_vs_duckdb(ray_session, tmp_path, seed):
    rng = np.random.default_rng(400 + seed)
    tables = _random_relational(rng)
    con = duckdb.connect()
    for name, tbl in tables.items():
        pq.write_table(tbl, tmp_path / f"{name}.parquet")
        con.sql(f"CREATE VIEW {name} AS SELECT * "
                f"FROM '{tmp_path}/{name}.parquet'")
    q, sql = R.queries(), R.oracle_sql()
    for name in REL_OPS:
        res = q[name](str(tmp_path))
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        odf = con.sql(sql[name]).df()
        a, b = _norm(df), _norm(odf)
        assert list(a.columns) == list(b.columns), name
        assert len(a) == len(b), (name, len(a), len(b))
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=True, obj=name)


@pytest.mark.parametrize("seed", [0, 1])
def test_two_hop_dimension_fuzz_vs_duckdb(ray_session, tmp_path, seed):
    """supplier -> nation -> region two-hop lookup over random dims,
    including a supplier pointing at a missing nation."""
    rng = np.random.default_rng(500 + seed)
    n_sup, n_nat, n_reg = 30, 6, 3
    con = duckdb.connect()
    tables = {
        "supplier": pa.table({
            "s_suppkey": pa.array(range(n_sup), type=pa.int64()),
            "s_name": pa.array([f"sup{i}" for i in range(n_sup)]),
            "s_nationkey": pa.array(
                rng.integers(0, n_nat + 1, n_sup).astype(np.int32)),
            "s_acctbal": pa.array(np.round(rng.uniform(0, 9000, n_sup), 2)),
        }),
        "nation": pa.table({
            "n_nationkey": pa.array(range(n_nat), type=pa.int32()),
            "n_name": pa.array([f"nat{i}" for i in range(n_nat)]),
            # last nation points at a MISSING region (second-hop orphan)
            "n_regionkey": pa.array(np.r_[
                rng.integers(0, n_reg, n_nat - 1), n_reg].astype(np.int32)),
        }),
        "region": pa.table({
            "r_regionkey": pa.array(range(n_reg), type=pa.int32()),
            "r_name": pa.array([f"reg{i}" for i in range(n_reg)]),
        }),
    }
    for name, tbl in tables.items():
        pq.write_table(tbl, tmp_path / f"{name}.parquet")
        con.sql(f"CREATE VIEW {name} AS SELECT * "
                f"FROM '{tmp_path}/{name}.parquet'")
    q, sql = R.queries(), R.oracle_sql()
    res = q["supplier_nation_region"](str(tmp_path))
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    odf = con.sql(sql["supplier_nation_region"]).df()
    a, b = _norm(df), _norm(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), (len(a), len(b))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("seed", [0, 1])
def test_hybrid_search_fuzz_vs_duckdb(ray_session, tmp_path, seed):
    """BM25 + cosine RRF over joint random documents + embeddings."""
    import tests.test_fuzz_session5 as F5

    rng = np.random.default_rng(600 + seed)
    docs = F5._random_corpus(rng, 60)
    # make sure the BM25 query terms appear in some docs
    texts = docs["text"].to_pylist()
    for i in range(0, 60, 7):
        texts[i] = texts[i] + " table scan merge vector"
    docs = docs.set_column(1, "text", pa.array(texts, type=pa.string()))
    emb = _random_embeddings(rng, n=60)
    con = duckdb.connect()
    pq.write_table(docs, tmp_path / "documents.parquet")
    pq.write_table(emb, tmp_path / "embeddings.parquet")
    for name in ["documents", "embeddings"]:
        con.sql(f"CREATE VIEW {name} AS SELECT * "
                f"FROM '{tmp_path}/{name}.parquet'")
    res = R.queries()["hybrid_search"](str(tmp_path))
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    odf = con.sql(R.oracle_sql()["hybrid_search"]).df()
    a, b = _norm(df), _norm(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), (len(a), len(b))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_tpch_composites_fuzz_vs_duckdb(ray_session, tmp_path, seed):
    """Q5/Q14-shape composites over a full random 7-table schema
    (random region membership, FK orphans in custkey/suppkey/partkey,
    date windows inside the generated range so the joins are
    non-trivial)."""
    from visiblev8_crawler_ray.pipelines import analytics as A

    rng = np.random.default_rng(700 + seed)
    tables = _random_relational(rng)
    n_nat, n_sup, n_part = 5, 10, 50
    tables["region"] = pa.table({
        "r_regionkey": pa.array(range(3), type=pa.int32()),
        "r_name": pa.array(["ALPHA", "BETA", "GAMMA"]),
    })
    tables["nation"] = pa.table({
        "n_nationkey": pa.array(range(n_nat), type=pa.int32()),
        "n_name": pa.array([f"NAT{i}" for i in range(n_nat)]),
        "n_regionkey": pa.array(
            rng.integers(0, 3, n_nat).astype(np.int32)),
    })
    tables["supplier"] = pa.table({
        "s_suppkey": pa.array(range(n_sup), type=pa.int64()),
        "s_name": pa.array([f"sup{i}" for i in range(n_sup)]),
        "s_nationkey": pa.array(
            rng.integers(0, n_nat, n_sup).astype(np.int32)),
        # negative balances feed supplier_part_variety's NOT-IN set
        "s_acctbal": pa.array(np.round(rng.uniform(-500, 9000, n_sup), 2)),
    })
    tables["part"] = pa.table({
        "p_partkey": pa.array(range(n_part), type=pa.int64()),
        "p_name": pa.array([f"part{i}" for i in range(n_part)]),
        "p_brand": pa.array([f"B{i % 4}" for i in range(n_part)]),
        "p_type": pa.array(
            np.array(["PROMO", "STANDARD", "ECONOMY"])[
                rng.integers(0, 3, n_part)]),
        "p_size": pa.array(rng.integers(1, 50, n_part).astype(np.int32)),
        "p_retailprice": pa.array(
            np.round(rng.uniform(100, 2000, n_part), 2)),
    })
    con = duckdb.connect()
    for name, tbl in tables.items():
        pq.write_table(tbl, tmp_path / f"{name}.parquet")
        con.sql(f"CREATE VIEW {name} AS SELECT * "
                f"FROM '{tmp_path}/{name}.parquet'")
    fuzz_groups = (("B0", 20, 1.0, 15.0), ("B1", 35, 10.0, 30.0),
                   ("B3", 50, 25.0, 49.0))
    cases = [
        (A.local_supplier_volume(
            str(tmp_path), region="ALPHA",
            date_lo="2024-01-01", date_hi="2024-08-01"),
         A.local_supplier_volume_sql(
             region="ALPHA", date_lo="2024-01-01", date_hi="2024-08-01")),
        (A.disjunctive_revenue(str(tmp_path), groups=fuzz_groups),
         A.disjunctive_revenue_sql(groups=fuzz_groups)),
        (A.nation_market_share(
            str(tmp_path), region="BETA", nation="NAT1",
            date_lo="2024-01-01", date_hi="2024-10-01"),
         A.nation_market_share_sql(
             region="BETA", nation="NAT1",
             date_lo="2024-01-01", date_hi="2024-10-01")),
        (A.promo_revenue_share(
            str(tmp_path), month_lo="2024-02-01", month_hi="2024-07-01"),
         A.promo_revenue_share_sql(
             month_lo="2024-02-01", month_hi="2024-07-01")),
        (A.idle_rich_customers(str(tmp_path), since="2024-06-01"),
         A.idle_rich_customers_sql(since="2024-06-01")),
        (A.late_priority_counts(str(tmp_path), grace_days=30),
         A.late_priority_counts_sql(grace_days=30)),
        (A.pricing_summary(str(tmp_path), cutoff="2024-09-01"),
         A.pricing_summary_sql(cutoff="2024-09-01")),
        (A.min_cost_supplier(str(tmp_path), max_size=25),
         A.min_cost_supplier_sql(max_size=25)),
        (A.sole_return_supplier(str(tmp_path)),
         A.sole_return_supplier_sql()),
        (A.supplier_part_variety(str(tmp_path)),
         A.supplier_part_variety_sql()),
    ]
    for df, sql in cases:
        odf = con.sql(sql).df()
        a, b = _norm(df), _norm(odf)
        assert list(a.columns) == list(b.columns)
        assert len(a) == len(b), (sql[:80], len(a), len(b))
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=True)


@pytest.mark.parametrize("seed", [0, 1])
def test_cogroup_joins_under_hot_key_skew(ray_session, tmp_path, seed):
    """Hot-KEY stress for the bucketed co-group join family: ~40% of
    lineitems land on ONE orderkey and ~40% of orders on ONE custkey.
    _bucket_of cannot split a single key — the guarantee under skew is
    per-BUCKET memory bounded by the hottest key's payload (which the
    per-bucket pandas kernel holds once), and bit-exact results."""
    from visiblev8_crawler_ray.pipelines import analytics as A

    rng = np.random.default_rng(800 + seed)
    tables = _random_relational(rng, n_cust=20, n_orders=100, n_lines=400)
    lines, orders = tables["lineitem"], tables["orders"]
    hot_ok = lines["l_orderkey"].to_numpy(zero_copy_only=False).copy()
    hot_ok[: len(hot_ok) * 2 // 5] = 7          # one order, 160 lineitems
    tables["lineitem"] = lines.set_column(
        0, "l_orderkey", pa.array(hot_ok, type=pa.int64()))
    hot_ck = orders["o_custkey"].to_numpy(zero_copy_only=False).copy()
    hot_ck[: len(hot_ck) * 2 // 5] = 3          # one customer, 40 orders
    tables["orders"] = orders.set_column(
        1, "o_custkey", pa.array(hot_ck, type=pa.int64()))
    # star dims so nation_market_share's co-group runs under the skew
    tables["region"] = pa.table({
        "r_regionkey": pa.array(range(3), type=pa.int32()),
        "r_name": pa.array(["ALPHA", "BETA", "GAMMA"])})
    tables["nation"] = pa.table({
        "n_nationkey": pa.array(range(5), type=pa.int32()),
        "n_name": pa.array([f"NAT{i}" for i in range(5)]),
        "n_regionkey": pa.array(
            rng.integers(0, 3, 5).astype(np.int32))})
    tables["supplier"] = pa.table({
        "s_suppkey": pa.array(range(10), type=pa.int64()),
        "s_name": pa.array([f"sup{i}" for i in range(10)]),
        "s_nationkey": pa.array(rng.integers(0, 5, 10).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-500, 9000, 10), 2))})

    con = duckdb.connect()
    for name, tbl in tables.items():
        pq.write_table(tbl, tmp_path / f"{name}.parquet")
        con.sql(f"CREATE VIEW {name} AS SELECT * "
                f"FROM '{tmp_path}/{name}.parquet'")
    q, sql = R.queries(), R.oracle_sql()
    cases = [(name, q[name](str(tmp_path)), sql[name])
             for name in ["shipping_priority", "late_priority_counts",
                          "customer_orders_full", "orders_with_customer",
                          "small_quantity_revenue", "big_order_customers"]]
    cases.append(("nation_market_share",
                  A.nation_market_share(
                      str(tmp_path), region="ALPHA", nation="NAT2",
                      date_lo="2024-01-01", date_hi="2024-11-01"),
                  A.nation_market_share_sql(
                      region="ALPHA", nation="NAT2",
                      date_lo="2024-01-01", date_hi="2024-11-01")))
    for name, res, osql in cases:
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        odf = con.sql(osql).df()
        a, b = _norm(df), _norm(odf)
        assert list(a.columns) == list(b.columns), name
        assert len(a) == len(b), (name, len(a), len(b))
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=True, obj=name)
