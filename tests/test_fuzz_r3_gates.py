"""Parameter fuzz for the round-3 SQL gates: the unrolled-Lloyd kmeans
twins and the serialized-hyperplane ann_lsh twin are exercised at
NON-DEFAULT (k, iters, n_queries, threshold) over randomized embedding
corpora — the generated SQL must track the parameters, not just the
fixture defaults the driver gate runs (tests/test_fuzz_tables.py
already auto-fuzzes the defaults)."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")
from visiblev8_crawler_ray.pipelines import embeddings as E  # noqa: E402


def _random_embeddings(rng, n=40, dim=64):
    mat = rng.normal(0, 1, (n, dim)).round(4)
    mat[7] = mat[3]            # exact duplicate -> cosine 1.0
    mat[11] = mat[5] * 2.0     # scaled copy -> cosine 1.0
    mat[13] = mat[5] + rng.normal(0, 0.01, dim).round(4)
    return pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
        "label": pa.array((np.arange(n) % 4).astype(np.int32)),
    })


def _con(tmp_path):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * "
            f"FROM '{tmp_path}/embeddings.parquet'")
    return con


def _norm(df):
    df = pd.DataFrame(df)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _check(got, con, sql, name):
    a = _norm(got.to_pandas() if hasattr(got, "to_pandas") else got)
    b = _norm(con.sql(sql).df())
    assert list(a.columns) == list(b.columns), name
    assert len(a) == len(b), (name, len(a), len(b))
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  check_exact=True, obj=name)


@pytest.mark.parametrize("seed,n_queries,k", [(0, 4, 2), (1, 9, 5)])
def test_ann_lsh_param_fuzz(ray_session, tmp_path, seed, n_queries, k):
    rng = np.random.default_rng(700 + seed)
    pq.write_table(_random_embeddings(rng), tmp_path / "embeddings.parquet")
    got = E.ann_lsh(str(tmp_path), n_queries=n_queries, k=k)
    _check(got, _con(tmp_path), E.ann_lsh_sql(n_queries=n_queries, k=k),
           f"ann_lsh q={n_queries} k={k}")


@pytest.mark.parametrize("seed,n_queries,k,n_lists,n_probe",
                         [(0, 4, 3, 8, 3), (1, 9, 5, 12, 5)])
def test_ann_ivf_param_fuzz(ray_session, tmp_path, seed, n_queries, k,
                            n_lists, n_probe):
    rng = np.random.default_rng(750 + seed)
    pq.write_table(_random_embeddings(rng), tmp_path / "embeddings.parquet")
    got = E.ann_ivf(str(tmp_path), n_queries=n_queries, k=k,
                    n_lists=n_lists, n_probe=n_probe)
    _check(got, _con(tmp_path),
           E.ann_ivf_sql(n_queries=n_queries, k=k, n_lists=n_lists,
                         n_probe=n_probe),
           f"ann_ivf q={n_queries} k={k} L={n_lists} p={n_probe}")


@pytest.mark.parametrize("seed,k,iters", [(0, 3, 1), (1, 6, 3)])
def test_kmeans_clusters_param_fuzz(ray_session, tmp_path, seed, k, iters):
    rng = np.random.default_rng(800 + seed)
    pq.write_table(_random_embeddings(rng), tmp_path / "embeddings.parquet")
    got = E.kmeans_clusters(str(tmp_path), k=k, iters=iters)
    _check(got, _con(tmp_path), E.kmeans_clusters_sql(k=k, iters=iters),
           f"kmeans k={k} iters={iters}")


def test_bpe_scale_path_parity(ray_session):
    """Fused-small vs distributed BPE round loop — identical by
    block-invariance."""
    from visiblev8_crawler_ray.pipelines import textops as T

    sf = "/root/testdata/sf0.001"
    a = T.bpe_merges(sf, n_merges=4)
    b = T.bpe_merges(sf, n_merges=4, force_scale=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_kmeans_scale_path_parity(ray_session, tmp_path):
    """The fused-small driver loop and the distributed sketch merge are
    behaviorally identical (block-invariance of the fixed-point
    contract) — the multi_origin_rollup force_scale pattern."""
    rng = np.random.default_rng(850)
    pq.write_table(_random_embeddings(rng), tmp_path / "embeddings.parquet")
    a = E.kmeans_clusters(str(tmp_path), k=5, iters=3)
    b = E.kmeans_clusters(str(tmp_path), k=5, iters=3, force_scale=True)
    pd.testing.assert_frame_equal(_norm(a), _norm(b), check_exact=True)


@pytest.mark.parametrize("seed,thr,k,iters", [(0, 0.2, 4, 2), (1, 0.5, 5, 1)])
def test_semantic_dedup_kmeans_param_fuzz(ray_session, tmp_path, seed,
                                          thr, k, iters):
    rng = np.random.default_rng(900 + seed)
    pq.write_table(_random_embeddings(rng), tmp_path / "embeddings.parquet")
    got = E.semantic_dedup_kmeans(str(tmp_path), threshold=thr, k=k,
                                  iters=iters)
    _check(got, _con(tmp_path),
           E.semantic_dedup_kmeans_sql(threshold=thr, k=k, iters=iters),
           f"semdedup thr={thr} k={k} iters={iters}")
