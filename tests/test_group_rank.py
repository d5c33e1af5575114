"""assign_group_rank: dense per-group rank via range-partitioned sort
— vs a pandas reference, including the hot-group (skewed-host) case
the groupby(host) form could not spread."""

import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")
from visiblev8_crawler_ray.functions.seq import assign_group_rank  # noqa: E402


def _run(df, n_blocks=8):
    import ray.data as rd

    t = pa.Table.from_pandas(df, preserve_index=False)
    ds = rd.from_arrow(t).repartition(n_blocks)
    out = assign_group_rank(
        ds, "host", ["admission_key", "url"], rank_col="host_rank"
    ).to_pandas()
    return out.sort_values(["host", "host_rank"]).reset_index(drop=True)


def _expect(df):
    df = df.sort_values(["host", "admission_key", "url"]).reset_index(drop=True)
    df["host_rank"] = df.groupby("host").cumcount().astype(np.int64)
    return df


@pytest.mark.parametrize("seed,skew", [(0, False), (1, False), (2, True)])
def test_group_rank_matches_pandas(seed, skew):
    rng = np.random.default_rng(seed)
    n = 5000
    if skew:
        # one hot host holds ~90% of rows — the case the sort spreads
        hosts = np.where(rng.uniform(size=n) < 0.9, "hot.example.com",
                         rng.choice([f"h{i}.com" for i in range(20)], n))
    else:
        hosts = rng.choice([f"h{i}.com" for i in range(15)], n)
    df = pd.DataFrame({
        "host": hosts,
        "admission_key": rng.permutation(n).astype(np.int64),
        "url": [f"https://x/{i}" for i in range(n)],
    })
    got = _run(df)
    exp = _expect(df)
    pd.testing.assert_frame_equal(
        got[["host", "admission_key", "url", "host_rank"]],
        exp[["host", "admission_key", "url", "host_rank"]])


def test_group_rank_block_count_invariance():
    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame({
        "host": rng.choice(["a.com", "b.com", "c.com"], n),
        "admission_key": rng.permutation(n).astype(np.int64),
        "url": [f"https://x/{i}" for i in range(n)],
    })
    a = _run(df, n_blocks=2)
    b = _run(df, n_blocks=32)
    pd.testing.assert_frame_equal(a, b)
