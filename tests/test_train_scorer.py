"""The distributed CV training harness (VERDICT r3 #5): vendor-grouped
folds, exact integer Gram stats, shared Cramer solve, histogram AUC +
threshold sweep — gated against a naive single-process reference and
round-tripped through the production Scorer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _naive_reference(k=5):
    """Single-process reference: pandas + direct numpy normal equations
    (np.linalg.solve — an INDEPENDENT solver from the Cramer path)."""
    import duckdb

    from visiblev8_crawler_ray.functions.util import md5_low64, round_half_away
    from visiblev8_crawler_ray.pipelines.classify import (
        TRAIN_LABEL_LANG, TRAIN_RIDGE_LAMBDA, _Z_Q)
    from visiblev8_crawler_ray.pipelines.textops import STOPWORDS, WORD_RE

    df = duckdb.sql(
        f"SELECT text, lang, source FROM '{SF}/documents.parquet'").df()
    import re
    x1 = df["text"].str.count(r"\S+").to_numpy(np.int64)
    x2 = sum(df["text"].str.count(rf"\b{w}\b") for w in STOPWORDS) \
        .to_numpy(np.int64)
    x3 = df["text"].str.len().to_numpy(np.int64)
    y = (df["lang"] == TRAIN_LABEL_LANG).to_numpy(np.int64)
    fold = (md5_low64(pa.array(df["source"])).view(np.uint64)
            % np.uint64(k)).astype(np.int64)
    X = np.stack([np.ones(len(df), np.int64), x1, x2, x3], axis=1)
    rows = []
    for f in sorted(set(fold)):
        tr = fold != f
        G = (X[tr].T @ X[tr]).astype(np.float64) \
            + TRAIN_RIDGE_LAMBDA * np.eye(4)
        b = (X[tr].T @ y[tr]).astype(np.float64)
        w = np.linalg.solve(G, b)
        va = fold == f
        z = X[va].astype(np.float64) @ w
        zq = round_half_away(z * _Z_Q, 0).astype(np.int64)
        yv = y[va]
        order = np.argsort(zq, kind="stable")
        # exact rank AUC with tie correction over sorted scores
        zs, ys = zq[order], yv[order]
        P, N = int(ys.sum()), int(len(ys) - ys.sum())
        uq, inv = np.unique(zs, return_inverse=True)
        pos = np.bincount(inv, weights=ys).astype(np.int64)
        neg = np.bincount(inv, weights=1 - ys).astype(np.int64)
        cnb = np.concatenate(([0], np.cumsum(neg)[:-1]))
        auc = float((pos * (2 * cnb + neg)).sum()) / (2.0 * P * N)
        correct = (P - np.cumsum(pos)) + np.cumsum(neg)
        bi = int(np.argmax(correct))
        rows.append({"fold": int(f), "n_train": int(tr.sum()),
                     "n_val": int(va.sum()), "w": w,
                     "auc": auc, "best_threshold": uq[bi] / _Z_Q,
                     "best_acc": correct[bi] / (P + N)})
    return rows


def test_train_scorer_matches_naive_reference(ray_session):
    from visiblev8_crawler_ray.pipelines.classify import train_scorer

    got = train_scorer(SF)
    ref = _naive_reference()
    assert len(got) == len(ref)
    for r in ref:
        g = got[got["fold"] == r["fold"]].iloc[0]
        assert int(g["n_train"]) == r["n_train"]
        assert int(g["n_val"]) == r["n_val"]
        # independent solver (LAPACK vs shared-Cramer): agree to 1e-9
        w_got = np.array([g["w_bias"], g["w_n_words"],
                          g["w_n_stop"], g["w_n_chars"]])
        assert np.allclose(w_got, r["w"], rtol=0, atol=1e-8)
        assert abs(g["auc"] - r["auc"]) < 1e-5
        assert abs(g["best_threshold"] - r["best_threshold"]) < 2e-6
        assert abs(g["best_acc"] - r["best_acc"]) < 1e-5


def test_train_scorer_artifact_roundtrip(ray_session, tmp_path):
    """The full-data artifact train_scorer writes is loadable by the
    production Scorer and scores the corpus (classify.py:61-98: the
    trained-model -> artifact -> scorer loop, closed end to end)."""
    from visiblev8_crawler_ray.pipelines.classify import Scorer, train_scorer
    from visiblev8_crawler_ray.pipelines.textops import _read_docs

    art = str(tmp_path / "trained_lr.npz")
    train_scorer(SF, artifact_out=art)
    with np.load(art, allow_pickle=False) as a:
        assert list(a["feature_names"]) == ["n_words", "n_stop", "n_chars"]
        assert a["weights"].shape == (3,)
    ds = _read_docs(SF, ["doc_id", "text"])
    out = ds.map_batches(Scorer, fn_constructor_args=(art,),
                         batch_format="pyarrow", batch_size=4096,
                         concurrency=2).to_pandas()
    assert len(out) == 500
    assert set(out["label"]) <= {"behavioral", "benign"}
    assert out["score"].between(0, 1).all()


def test_train_scorer_group_discipline(ray_session):
    """No source (vendor group) may span train and val — the GroupKFold
    invariant: every fold's n_val is a whole-number multiple of the
    per-source doc count and the fold sizes partition the corpus."""
    from visiblev8_crawler_ray.pipelines.classify import train_scorer

    got = train_scorer(SF)
    assert int(got["n_val"].sum()) == 500
    assert all(int(v) % 25 == 0 for v in got["n_val"])  # 25 docs/source
    assert all(int(t) + int(v) == 500
               for t, v in zip(got["n_train"], got["n_val"]))


def test_nested_cv_matches_naive_reference(ray_session):
    """nested_cv's Gram-subtraction grid (one pass for every fold
    combination) equals an independent reference that materializes each
    (outer, inner, lambda) training set and solves with LAPACK."""
    import duckdb

    from visiblev8_crawler_ray.functions.util import md5_low64, round_half_away
    from visiblev8_crawler_ray.pipelines.classify import (
        TRAIN_LABEL_LANG, _Z_Q, nested_cv)
    from visiblev8_crawler_ray.pipelines.textops import STOPWORDS

    K_OUT, K_IN, LAMBDAS = 5, 4, (0.1, 1.0, 10.0)
    got = nested_cv(SF, K_OUT, K_IN, LAMBDAS)

    df = duckdb.sql(
        f"SELECT text, lang, source FROM '{SF}/documents.parquet'").df()
    x1 = df["text"].str.count(r"\S+").to_numpy(np.int64)
    x2 = sum(df["text"].str.count(rf"\b{w}\b") for w in STOPWORDS) \
        .to_numpy(np.int64)
    x3 = df["text"].str.len().to_numpy(np.int64)
    y = (df["lang"] == TRAIN_LABEL_LANG).to_numpy(np.int64)
    X = np.stack([np.ones(len(df)), x1, x2, x3], axis=1).astype(np.float64)
    src = pa.array(df["source"])
    fold = (md5_low64(src).view(np.uint64) % np.uint64(K_OUT)) \
        .astype(np.int64)
    salted = pa.array([s + "#inner" for s in df["source"]])
    inner = (md5_low64(salted).view(np.uint64) % np.uint64(K_IN)) \
        .astype(np.int64)

    def fit(mask, lam):
        G = X[mask].T @ X[mask] + lam * np.eye(4)
        return np.linalg.solve(G, X[mask].T @ y[mask])

    def auc_of(z, yy):
        zq = round_half_away(z * _Z_Q, 0).astype(np.int64)
        uq, inv = np.unique(zq, return_inverse=True)
        pos = np.bincount(inv, weights=yy).astype(np.int64)
        neg = np.bincount(inv, weights=1 - yy).astype(np.int64)
        P, N = int(pos.sum()), int(neg.sum())
        if P == 0 or N == 0:
            return np.nan
        cnb = np.concatenate(([0], np.cumsum(neg)[:-1]))
        return float((pos * (2 * cnb + neg)).sum()) / (2.0 * P * N)

    for _, row in got.iterrows():
        o = int(row["fold"])
        means = []
        for lam in LAMBDAS:
            aucs = []
            for j in range(K_IN):
                tr = (fold != o) & (inner != j)
                va = (fold != o) & (inner == j)
                if not va.any():
                    continue
                a = auc_of(X[va] @ fit(tr, lam), y[va])
                if not np.isnan(a):
                    aucs.append(a)
            means.append(np.sum(aucs) / len(aucs) if aucs else np.nan)
        best = int(np.nanargmax(means))
        assert float(LAMBDAS[best]) == row["best_lambda"], (o, means)
        assert abs(means[best] - row["inner_auc"]) < 1e-5
        va = fold == o
        outer_auc = auc_of(X[va] @ fit(fold != o, LAMBDAS[best]), y[va])
        assert abs(outer_auc - row["outer_auc"]) < 1e-5
        assert int(va.sum()) == int(row["n_val"])
