"""Hand-built edge cases for the eleventh-continuation composites
(Q18 / Q2 / Q11 / Q16 / Q21 shapes): predicate boundaries, argmin
tie-breaks, LIMIT determinism and NOT-IN exclusion — each asserted
against hand-derived expectations AND the operator's own DuckDB twin
on the same tiny tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from visiblev8_crawler_ray.pipelines import analytics as A


def _setup(tmp_path, tables):
    con = duckdb.connect()
    for name, tbl in tables.items():
        pq.write_table(tbl, tmp_path / f"{name}.parquet")
        con.sql(f"CREATE VIEW {name} AS SELECT * "
                f"FROM '{tmp_path}/{name}.parquet'")
    return con


def _cmp(df, con, sql):
    odf = con.sql(sql).df()
    a = df.reset_index(drop=True)
    b = odf.reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  check_exact=True)


def test_min_cost_supplier_tie_breaks_to_lowest_suppkey(
        ray_session, tmp_path):
    tables = {
        "part": pa.table({
            "p_partkey": pa.array([1, 2], type=pa.int64()),
            "p_name": pa.array(["alpha", "beta"]),
            "p_size": pa.array([5, 50], type=pa.int32()),  # 2 filtered out
        }),
        "supplier": pa.table({
            "s_suppkey": pa.array([3, 5, 7], type=pa.int64()),
            "s_name": pa.array(["s3", "s5", "s7"]),
        }),
        "lineitem": pa.table({
            "l_partkey": pa.array([1, 1, 1, 2], type=pa.int64()),
            "l_suppkey": pa.array([5, 3, 7, 3], type=pa.int64()),
            "l_extendedprice": pa.array([10.00, 10.00, 12.00, 1.00]),
        }),
    }
    con = _setup(tmp_path, tables)
    df = A.min_cost_supplier(str(tmp_path))
    # tie 10.00 between suppkeys 5 and 3 -> lowest suppkey wins
    assert df.to_dict("records") == [
        {"p_partkey": 1, "p_name": "alpha", "s_suppkey": 3,
         "s_name": "s3", "min_price": 10.00}]
    _cmp(df, con, A.min_cost_supplier_sql())


def test_sole_return_supplier_predicate(ray_session, tmp_path):
    # o1: {s1:R, s2:N} -> credit s1;  o2: {s1:R, s2:R} -> two R supps, no
    # o3: {s1:R} single supplier -> no;  o4: {s2:N, s3:N} -> no R, no
    # o5: {s2: R,R,N dup lines, s3:N} -> distinct collapses -> credit s2
    ok = [1, 1, 2, 2, 3, 4, 4, 5, 5, 5, 5]
    sk = [1, 2, 1, 2, 1, 2, 3, 2, 2, 2, 3]
    rf = ["R", "N", "R", "R", "R", "N", "N", "R", "R", "N", "N"]
    tables = {
        "lineitem": pa.table({
            "l_orderkey": pa.array(ok, type=pa.int64()),
            "l_suppkey": pa.array(sk, type=pa.int64()),
            "l_returnflag": pa.array(rf),
        }),
        "supplier": pa.table({
            "s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
            "s_name": pa.array(["sa", "sb", "sc"]),
        }),
    }
    con = _setup(tmp_path, tables)
    df = A.sole_return_supplier(str(tmp_path))
    assert df.to_dict("records") == [
        {"s_name": "sa", "numwait": 1}, {"s_name": "sb", "numwait": 1}]
    _cmp(df, con, A.sole_return_supplier_sql())


def test_big_order_customers_limit_and_orphan(ray_session, tmp_path):
    base = np.datetime64("2024-01-01", "us")
    tables = {
        "lineitem": pa.table({
            "l_orderkey": pa.array([1, 1, 2, 3, 4, 5], type=pa.int64()),
            "l_quantity": pa.array([80.0, 30.0, 120.0, 150.0, 110.0, 5.0]),
        }),
        "orders": pa.table({
            "o_orderkey": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            # order 3 -> custkey 99 (orphan, must NOT occupy a limit slot)
            "o_custkey": pa.array([10, 11, 99, 12, 10], type=pa.int64()),
            "o_orderdate": pa.array(
                [base + np.timedelta64(d, "D") for d in [3, 1, 0, 2, 4]],
                type=pa.timestamp("us")),
            # equal totalprice: ties fall to orderdate then orderkey
            "o_totalprice": pa.array([500.0, 500.0, 500.0, 500.0, 1.0]),
        }),
        "customer": pa.table({
            "c_custkey": pa.array([10, 11, 12], type=pa.int64()),
            "c_name": pa.array(["c10", "c11", "c12"]),
        }),
    }
    con = _setup(tmp_path, tables)
    df = A.big_order_customers(str(tmp_path), qty_threshold=100, limit=2)
    # qualifying: o1(110) o2(120) o3(150, orphan) o4(110); after the
    # inner join o3 drops; equal price -> date order: o2(d1), o4(d2)
    assert df[["c_name", "o_orderkey", "sum_qty"]].to_dict("records") == [
        {"c_name": "c11", "o_orderkey": 2, "sum_qty": 120},
        {"c_name": "c12", "o_orderkey": 4, "sum_qty": 110}]
    _cmp(df, con, A.big_order_customers_sql(qty_threshold=100, limit=2))


def test_part_revenue_share_strict_boundary(ray_session, tmp_path):
    def li(revs_dollars):
        return pa.table({
            "l_partkey": pa.array(range(len(revs_dollars)),
                                  type=pa.int64()),
            "l_extendedprice": pa.array([float(r) for r in revs_dollars]),
            "l_discount": pa.array([0.0] * len(revs_dollars)),
        })

    # revs (1, 1, 4): part2 rev*n = 12 == mult*total = 12 -> strictly
    # greater fails -> EMPTY result on both engines
    tables = {"lineitem": li([1, 1, 4])}
    con = _setup(tmp_path, tables)
    df = A.part_revenue_share(str(tmp_path), num=2, den=1)
    assert df.empty
    _cmp(df, con, A.part_revenue_share_sql(num=2, den=1))

    # revs (1, 1, 5): 15 > 14 -> only part 2 survives
    pq.write_table(li([1, 1, 5]), tmp_path / "lineitem.parquet")
    df = A.part_revenue_share(str(tmp_path), num=2, den=1)
    assert df["l_partkey"].tolist() == [2]
    assert df["revenue"].tolist() == [5.0]
    _cmp(df, con, A.part_revenue_share_sql(num=2, den=1))


def test_supplier_part_variety_not_in_and_distinct(ray_session, tmp_path):
    tables = {
        "part": pa.table({
            "p_partkey": pa.array([1, 2], type=pa.int64()),
            "p_brand": pa.array(["B1", "B2"]),
            "p_size": pa.array([10, 20], type=pa.int32()),
        }),
        "supplier": pa.table({
            "s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
            "s_acctbal": pa.array([100.0, -5.0, 0.0]),  # 2 excluded
        }),
        "lineitem": pa.table({
            # part1: supp {1,1,2,3} -> distinct {1,3} after NOT IN
            # part2: supp {2} -> empty group vanishes entirely
            "l_partkey": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
            "l_suppkey": pa.array([1, 1, 2, 3, 2], type=pa.int64()),
        }),
    }
    con = _setup(tmp_path, tables)
    df = A.supplier_part_variety(str(tmp_path))
    assert df.to_dict("records") == [
        {"p_brand": "B1", "p_size": 10, "supplier_cnt": 2}]
    _cmp(df, con, A.supplier_part_variety_sql())


def test_two_phase_agg_one_row_per_key_under_many_blocks(ray_session):
    """Regression: two_phase_agg(default final_blocks=1) must emit ONE
    row per key even when every input block holds a single row of the
    same key (final_blocks>1 would split partials by position and
    duplicate keys — the repartition is positional, not hashed)."""
    import ray.data as rd
    from visiblev8_crawler_ray.functions.util import two_phase_agg

    ds = rd.from_items(
        [{"k": i % 3, "v": 1} for i in range(30)], override_num_blocks=30)
    out = two_phase_agg(ds, ["k"], [("v", "sum")], ["k", "s"]).to_pandas()
    assert sorted(out["k"].tolist()) == [0, 1, 2]
    assert out["s"].tolist() == [10, 10, 10]
