"""Ninth-continuation operators: token entropy, grouped correlation /
regression, hard-negative mining, code detection, edit-distance pairs —
hand-checkable semantics beyond the DuckDB-twin gate."""

import math
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from visiblev8_crawler_ray.pipelines import analytics as A  # noqa: E402
from visiblev8_crawler_ray.pipelines import textops as T  # noqa: E402


def _write_docs(tmp_path, texts, sources=None):
    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * n),
        "source": pa.array(sources or ["s0"] * n),
        "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_token_entropy_hand_cases(ray_session, tmp_path):
    sf = _write_docs(tmp_path, [
        "a a a a",      # one token repeated -> entropy exactly 0
        "a b c d",      # uniform over 4 -> ln(4)
        "a a b b",      # uniform over 2 -> ln(2)
        "",             # empty -> all-zero row
    ])
    out = T.token_entropy(sf)
    assert out["n_tokens"].tolist() == [4, 4, 4, 0]
    assert out["n_distinct"].tolist() == [1, 4, 2, 0]
    assert out["entropy_q"].tolist()[0] == 0
    assert out["entropy"].tolist()[3] == 0.0
    assert abs(out["entropy"][1] - math.log(4)) < 1e-5
    assert abs(out["entropy"][2] - math.log(2)) < 1e-5
    # entropy is maximal for the uniform doc
    assert out["entropy"][1] > out["entropy"][2] > out["entropy"][0]


def test_group_corr_hand_cases(ray_session, tmp_path):
    # group A: y = 10x exactly -> corr 1, slope 10, intercept 0
    # group N: y = -10x + 40    -> corr -1, slope -10, intercept 40
    # group R/O (constant x)    -> degenerate: corr/slope 0, icpt avg(y)
    ts = pd.Timestamp("1995-06-01")
    rows = [
        ("A", "F", 1.0, 10.0), ("A", "F", 2.0, 20.0), ("A", "F", 3.0, 30.0),
        ("N", "O", 1.0, 30.0), ("N", "O", 2.0, 20.0), ("N", "O", 3.0, 10.0),
        ("R", "O", 5.0, 7.0), ("R", "O", 5.0, 9.0),
    ]
    t = pa.table({
        "l_returnflag": pa.array([r[0] for r in rows]),
        "l_linestatus": pa.array([r[1] for r in rows]),
        "l_shipdate": pa.array([ts] * len(rows), type=pa.timestamp("us")),
        "l_quantity": pa.array([r[2] for r in rows]),
        "l_extendedprice": pa.array([r[3] for r in rows]),
    })
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = A.group_corr(str(tmp_path)).set_index("l_returnflag")
    # corr is three float ops deep -> 1 +- 1 ulp, exactly like the twin
    assert abs(out.loc["A", "corr_qty_price"] - 1.0) < 1e-12
    assert out.loc["A", "slope_price_qty"] == 10.0
    assert out.loc["A", "intercept_price_qty"] == 0.0
    assert abs(out.loc["N", "corr_qty_price"] + 1.0) < 1e-12
    assert out.loc["N", "slope_price_qty"] == -10.0
    assert out.loc["N", "intercept_price_qty"] == 40.0
    assert out.loc["R", "corr_qty_price"] == 0.0
    assert out.loc["R", "slope_price_qty"] == 0.0
    assert out.loc["R", "intercept_price_qty"] == 8.0
    assert out["ship_year"].tolist() == [1995] * 3


def test_edit_pairs_hand_cases(ray_session):
    import ray.data as rd

    urls = ["abc",    # substitution partner of 'abd'
            "abd",
            "ab",     # deletion partner of abc / abd / acb
            "abcd",   # insertion partner of abc and abd
            "acb",    # transposition of abc -> distance 2, NOT a pair
            "xyz"]    # isolated
    ds = rd.from_arrow(pa.table({"url": pa.array(urls)}))
    out = A.edit_pairs_dataset(ds).to_pandas()
    got = sorted(map(tuple, out[["a", "b"]].to_numpy()))
    assert got == [("ab", "abc"), ("ab", "abd"), ("ab", "acb"),
                   ("abc", "abcd"), ("abc", "abd"), ("abcd", "abd")]
    assert ("abc", "acb") not in got  # transposition = distance 2


def test_edit_pairs_fuzz_vs_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    rng = np.random.default_rng(97)
    alpha = list("ab0/")
    pool = {"".join(rng.choice(alpha, size=rng.integers(1, 9)))
            for _ in range(160)}
    urls = sorted(pool)
    ds = rd.from_arrow(pa.table({"url": pa.array(urls)}))
    out = A.edit_pairs_dataset(ds).to_pandas()
    got = sorted(map(tuple, out[["a", "b"]].to_numpy()))
    con = duckdb.connect()
    con.register("u", pd.DataFrame({"url": urls}))
    exp = con.sql("""
        SELECT x.url AS a, y.url AS b FROM u x JOIN u y
        ON x.url < y.url WHERE levenshtein(x.url, y.url) = 1
        ORDER BY a, b""").fetchall()
    assert got == [tuple(r) for r in exp]
    assert len(got) > 50  # the alphabet is tight enough to make pairs


def test_frame_indexer_roundtrip(tmp_path):
    from visiblev8_crawler_ray.functions.video import encode_frames
    from visiblev8_crawler_ray.pipelines.multimodal import FrameIndexer

    frames = [b"A", b"frame-two", b"", b"zz" * 50]
    payload = encode_frames(frames)
    blob = tmp_path / "d1"
    blob.mkdir()
    (blob / "cap.vid").write_bytes(payload)
    idx = FrameIndexer(str(tmp_path))
    out = idx(pa.table({
        "doc_id": pa.array(["d1"]),
        "media_ref": pa.array(["blob://d1/cap.vid"]),
    })).to_pandas()
    assert out["frame_idx"].tolist() == [0, 1, 2, 3]
    assert out["n_bytes"].tolist() == [len(f) for f in frames]
    # byte_off is 1-based: slicing the container there recovers each frame
    for _, r in out.iterrows():
        lo = int(r["byte_off"]) - 1
        assert payload[lo:lo + int(r["n_bytes"])] == frames[r["frame_idx"]]


def test_skyline_mask_hand_cases():
    # (price, date): 9@2 dominates 5@3; 9@2 vs 9@2 duplicates both stay;
    # 9@5 dominated by 9@2 (same price, earlier date); 12@9 stays (top
    # price); 5@1 stays (earliest date); 4@1 dominated by 5@1.
    price = np.array([9.0, 5.0, 9.0, 9.0, 12.0, 5.0, 4.0])
    date = np.array([2, 3, 2, 5, 9, 1, 1], dtype=np.int64)
    mask = A._skyline_mask(price, date)
    assert mask.tolist() == [True, False, True, False, True, True, False]


def test_orders_skyline_two_phase_invariant(ray_session, tmp_path):
    """Union-of-block-skylines must re-reduce to the exact frontier:
    force many tiny blocks and compare against the single-pass mask."""
    import duckdb
    import pyarrow.parquet as pq2

    rng = np.random.default_rng(11)
    n = 400
    price = np.round(rng.uniform(0, 100, n), 2)
    price[50:60] = price[40]          # planted same-price ties
    days = rng.integers(0, 50, n)
    t = pa.table({
        "o_orderkey": pa.array(range(n), type=pa.int64()),
        "o_custkey": pa.array(np.zeros(n, dtype=np.int64)),
        "o_orderstatus": pa.array(["O"] * n),
        "o_totalprice": pa.array(price),
        "o_orderdate": pa.array(
            (np.datetime64("2024-01-01") + days).astype("datetime64[us]")),
        "o_orderpriority": pa.array(["1-URGENT"] * n),
    })
    pq2.write_table(t, tmp_path / "orders.parquet")
    out = A.orders_skyline(str(tmp_path))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * "
            f"FROM '{tmp_path}/orders.parquet'")
    import __ray_entry__ as R
    exp = con.sql(R.oracle_sql()["orders_skyline"]).df()
    assert out["o_orderkey"].tolist() == exp["o_orderkey"].tolist()


def test_band_pairs_fuzz_vs_duckdb(ray_session, tmp_path):
    """Randomized values with planted exact ties, eps-boundary gaps and
    a dense clique; brute-force DuckDB twin on the same parquet."""
    import duckdb
    import pyarrow.parquet as pq2
    import __ray_entry__ as R

    rng = np.random.default_rng(23)
    n = 600
    val = np.round(rng.uniform(0, 6, n), 3)
    val[10:14] = 1.2345                       # exact-tie clique
    val[20] = 2.0
    val[21] = 2.0 + A.BAND_EPS                # exactly eps apart
    val[22] = np.nextafter(2.0 + A.BAND_EPS, np.inf)  # just outside
    t = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "ts": pa.array(
            (np.datetime64("2024-01-01") +
             rng.integers(0, 10_000, n)).astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 9, n).astype(np.int64)),
        "event_type": pa.array(
            np.array(["x", "y"])[rng.integers(0, 2, n)]),
        "value": pa.array(val),
        "props": pa.array(['{"k": 1}'] * n),
    })
    pq2.write_table(t, tmp_path / "events.parquet")
    out = A.events_band_pairs(str(tmp_path))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM '{tmp_path}/events.parquet'")
    exp = con.sql(R.oracle_sql()["events_band_pairs"]).df()
    assert len(out) == len(exp) and len(out) > 6
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True),
        check_dtype=False, check_exact=True)


def test_skyline_mask_vs_bruteforce_fuzz():
    """Independent check (the SQL twin shares the window formulation):
    O(n^2) dominance scan on random data with planted ties/dups."""
    rng = np.random.default_rng(5)
    for _ in range(20):
        n = int(rng.integers(2, 60))
        price = np.round(rng.uniform(0, 10, n), 1)   # many exact ties
        date = rng.integers(0, 8, n).astype(np.int64)
        mask = A._skyline_mask(price, date)
        for i in range(n):
            dominated = bool(np.any(
                (price >= price[i]) & (date <= date[i])
                & ((price > price[i]) | (date < date[i]))))
            assert mask[i] == (not dominated), (i, price[i], date[i])
