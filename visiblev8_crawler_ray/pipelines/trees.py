"""Distributed decision-tree / random-forest training over Ray Data.

Re-expresses the reference's tree/forest training subsystem
(``script_classification/heuristics/enhanced_tree_forest.py:612-743``:
DecisionTreeClassifier / RandomForestClassifier with
``class_weight='balanced'``, max_depth/min_samples_leaf stopping, and
the gain-based ``feature_importances_`` analysis at :816) as the
classic histogram-based distributed tree algorithm (the public
XGBoost/LightGBM design): the corpus never leaves its blocks — each
tree LEVEL is ONE streaming ``map_batches`` pass that walks every row
down the current tree (vectorized) and emits per-(leaf, feature, bin)
integer count/pos histograms; the exchange per level is at most
``leaves x features x bins`` small rows (two_phase_agg combiner), and
the greedy split selection runs on the driver over those tiny tables.

Determinism contract: features and labels are integers, histograms are
exact integer sums, and the weighted-Gini gain is ONE shared float64
formula (:func:`gain_formula`) evaluated in the same operation order by
the trainer, the naive single-process reference (tests), and the
generated DuckDB twin of the root split (``tree_root_split``) — so
split choices are bit-reproducible, with ties broken to the lowest
(feature, threshold).

Scale shape at 100 TB: ``max_depth`` passes per tree, each a single
scan; no row-level shuffle ever; forest trees train sequentially but
each pass is fully parallel.  Deterministic ~50% bagging and per-tree
feature subsets come from a splitmix64 hash, not an RNG, so any worker
re-derives membership locally.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.util import round_half_away, two_phase_agg
from .textops import _count_word, _read_docs

#: integer per-doc features: the 10 language-marker word counts (the
#: behavioral-API-count analog of the reference's engineered feature
#: columns) + n_words + n_chars.  Order is the tie-break order.
TREE_MARKERS = ("the", "a", "value", "data", "key", "row",
                "table", "scan", "spark", "batch")
TREE_FEATURES = tuple(f"n_{w}" for w in TREE_MARKERS) + (
    "n_words", "n_chars")
TREE_LABEL_LANG = "en"
N_BINS = 64          # feature values clip into [0, 63]; thresholds 0..62
MIN_GAIN = 1e-12


def features_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(n_rows, F) int64 feature matrix + 0/1 label vector, vectorized
    (one RE2 kernel per marker, shared with the SQL twin)."""
    cols = [_count_word(t["text"], w) for w in TREE_MARKERS]
    cols.append(pc.count_substring_regex(t["text"], r"\S+")
                .to_numpy(zero_copy_only=False).astype(np.int64))
    cols.append(pc.utf8_length(t["text"])
                .to_numpy(zero_copy_only=False).astype(np.int64))
    X = np.stack(cols, axis=1)
    y = pc.equal(t["lang"], TREE_LABEL_LANG) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    return X, y


def gain_formula(wp: float, wn: float, p, m, pl, ml):
    """Weighted-Gini impurity decrease of split (p,m) -> (pl,ml)+(pr,mr),
    elementwise over numpy arrays OR python scalars — the SAME operation
    order everywhere (trainer / naive reference / SQL twin), so the
    float64 result is bit-identical across implementations."""
    def score(pp, mm):
        P = wp * pp
        M = wn * mm
        W = P + M
        return W - ((P * P + M * M) / W)  # == W * (1 - (P^2+M^2)/W^2)

    return score(p, m) - (score(pl, ml) + score(p - pl, m - ml))


def _mix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


class _Tree:
    """Growing tree state (parallel arrays, BFS node ids)."""

    def __init__(self):
        self.feature = [-1]
        self.thr = [-1]
        self.left = [-1]
        self.right = [-1]
        self.parent = [-1]
        self.depth = [0]
        self.n = [0]
        self.npos = [0]

    def walk(self, X: np.ndarray, depth: int) -> np.ndarray:
        """Vectorized leaf id per row after `depth` levels."""
        node = np.zeros(len(X), dtype=np.int64)
        feat = np.asarray(self.feature)
        thr = np.asarray(self.thr)
        left = np.asarray(self.left)
        right = np.asarray(self.right)
        for _ in range(depth):
            f = feat[node]
            internal = f >= 0
            if not internal.any():
                break
            xi = X[np.arange(len(X)), np.maximum(f, 0)]
            go_left = xi <= thr[node]
            node = np.where(internal,
                            np.where(go_left, left[node], right[node]),
                            node)
        return node

    def add_child(self, parent: int, depth: int) -> int:
        nid = len(self.feature)
        self.feature.append(-1)
        self.thr.append(-1)
        self.left.append(-1)
        self.right.append(-1)
        self.parent.append(parent)
        self.depth.append(depth)
        self.n.append(0)
        self.npos.append(0)
        return nid


def _level_histograms(ds: rd.Dataset, tree: _Tree, depth: int,
                      frontier: list[int], F: int,
                      row_sel=None, feat_sel=None) -> pd.DataFrame:
    """ONE streaming pass: (leaf_slot, feature, bin) -> (n, npos).
    ``row_sel(doc_ids)`` optionally masks rows (bagging); ``feat_sel``
    optionally restricts histogrammed features (forest feature
    subsets).  Exchange: at most |frontier| x F x N_BINS rows."""
    slots = {leaf: i for i, leaf in enumerate(frontier)}
    slot_of = np.full(len(tree.feature), -1, dtype=np.int64)
    for leaf, i in slots.items():
        slot_of[leaf] = i
    n_slots = len(frontier)
    feats = np.arange(F) if feat_sel is None else np.asarray(feat_sel)
    nf = len(feats)
    # ship the walk arrays by value (tiny) inside the closure
    feat_a = np.asarray(tree.feature)
    thr_a = np.asarray(tree.thr)
    left_a = np.asarray(tree.left)
    right_a = np.asarray(tree.right)

    def part(t: pa.Table) -> pa.Table:
        X, y = features_matrix(t)
        if row_sel is not None:
            keep = row_sel(t)
            X, y = X[keep], y[keep]
        if len(X) == 0:
            z = np.empty(0, dtype=np.int64)
            return pa.table({"slot": z, "f": z, "bin": z,
                             "n": z, "npos": z})
        node = np.zeros(len(X), dtype=np.int64)
        for _ in range(depth):
            f = feat_a[node]
            internal = f >= 0
            if not internal.any():
                break
            xi = X[np.arange(len(X)), np.maximum(f, 0)]
            go_left = xi <= thr_a[node]
            node = np.where(internal,
                            np.where(go_left, left_a[node], right_a[node]),
                            node)
        slot = slot_of[node]
        act = slot >= 0
        X, y, slot = X[act], y[act], slot[act]
        if len(X) == 0:
            z = np.empty(0, dtype=np.int64)
            return pa.table({"slot": z, "f": z, "bin": z,
                             "n": z, "npos": z})
        bins = np.clip(X[:, feats], 0, N_BINS - 1)
        key = ((slot[:, None] * nf + np.arange(nf)[None, :]) * N_BINS
               + bins).ravel()
        size = n_slots * nf * N_BINS
        cnt = np.bincount(key, minlength=size)
        pos = np.bincount(key, weights=np.repeat(y, nf), minlength=size)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "slot": (nz // (nf * N_BINS)).astype(np.int64),
            "f": feats[(nz // N_BINS) % nf].astype(np.int64),
            "bin": (nz % N_BINS).astype(np.int64),
            "n": cnt[nz].astype(np.int64),
            "npos": pos[nz].astype(np.int64),
        })

    return two_phase_agg(
        ds.map_batches(part, batch_format="pyarrow"),
        ["slot", "f", "bin"], [("n", "sum"), ("npos", "sum")],
        ["slot", "f", "bin", "n", "npos"],
    ).to_pandas()


def _best_split(hist: pd.DataFrame, wp: float, wn: float,
                min_leaf: int, feats: np.ndarray):
    """Best (feature, threshold, gain) from one leaf's histogram rows,
    ties to the lowest (feature, threshold); None if no valid split."""
    # node totals from ONE feature's rows (every feature's histogram
    # sums to the same node population)
    base = hist[hist["f"] == feats[0]]
    n = int(base["n"].sum())
    p = int(base["npos"].sum())
    m = n - p
    best = None
    for f in feats:
        hf = hist[hist["f"] == f]
        if hf.empty:
            continue
        bins = np.zeros(N_BINS, dtype=np.int64)
        poss = np.zeros(N_BINS, dtype=np.int64)
        bins[hf["bin"].to_numpy()] = hf["n"].to_numpy()
        poss[hf["bin"].to_numpy()] = hf["npos"].to_numpy()
        cn = np.cumsum(bins)[:-1]          # left counts for t = 0..62
        cp = np.cumsum(poss)[:-1]
        with np.errstate(invalid="ignore", divide="ignore"):
            g = gain_formula(wp, wn, float(p), float(m),
                             cp.astype(np.float64),
                             (cn - cp).astype(np.float64))
        valid = (cn >= min_leaf) & ((n - cn) >= min_leaf) & (g > MIN_GAIN)
        g = np.where(valid, g, -np.inf)
        if valid.any():
            t = int(np.argmax(g))          # first max = lowest threshold
            if best is None or g[t] > best[2]:
                best = (int(f), t, float(g[t]))
    return best, n, p


def grow_tree(ds: rd.Dataset, max_depth: int = 5, min_leaf: int = 5,
              row_sel=None, feat_sel=None,
              weights: tuple[float, float] | None = None) -> _Tree:
    """Level-wise greedy growth; ``max_depth`` streaming passes."""
    F = len(TREE_FEATURES)
    feats = np.arange(F) if feat_sel is None else np.asarray(feat_sel)
    tree = _Tree()
    # root stats (pass 0 doubles as the depth-0 histogram)
    hist = _level_histograms(ds, tree, 0, [0], F, row_sel, feats)
    root_rows = hist[hist["f"] == feats[0]]
    n0 = int(root_rows["n"].sum())
    p0 = int(root_rows["npos"].sum())
    tree.n[0], tree.npos[0] = n0, p0
    if weights is None:
        # sklearn class_weight='balanced': n / (n_classes * count)
        wp = n0 / (2.0 * p0) if p0 else 0.0
        wn = n0 / (2.0 * (n0 - p0)) if n0 - p0 else 0.0
    else:
        wp, wn = weights
    frontier = [0]
    for depth in range(max_depth):
        if not frontier:
            break
        if depth > 0:
            hist = _level_histograms(ds, tree, depth, frontier, F,
                                     row_sel, feats)
        nxt = []
        for i, leaf in enumerate(frontier):
            h = hist[hist["slot"] == i]
            best, n, p = _best_split(h, wp, wn, min_leaf, feats)
            tree.n[leaf], tree.npos[leaf] = n, p
            if best is None or p == 0 or p == n:
                continue
            f, t, _gain = best
            tree.feature[leaf] = f
            tree.thr[leaf] = t
            lc = tree.add_child(leaf, depth + 1)
            rc = tree.add_child(leaf, depth + 1)
            tree.left[leaf], tree.right[leaf] = lc, rc
            nxt += [lc, rc]
        frontier = nxt
    if frontier:  # fill stats of the last level's leaves
        hist = _level_histograms(ds, tree, max_depth, frontier, F,
                                 row_sel, feats)
        for i, leaf in enumerate(frontier):
            h = hist[(hist["slot"] == i) & (hist["f"] == feats[0])]
            tree.n[leaf] = int(h["n"].sum())
            tree.npos[leaf] = int(h["npos"].sum())
    tree._weights = (wp, wn)  # type: ignore[attr-defined]
    return tree


def _tree_table(tree: _Tree) -> pd.DataFrame:
    wp, wn = tree._weights  # type: ignore[attr-defined]
    rows = []
    for i in range(len(tree.feature)):
        p, n = tree.npos[i], tree.n[i]
        m = n - p
        P, M = wp * p, wn * m
        prob = P / (P + M) if (P + M) > 0 else 0.0
        rows.append({
            "node_id": i, "parent": tree.parent[i], "depth": tree.depth[i],
            "feature": (TREE_FEATURES[tree.feature[i]]
                        if tree.feature[i] >= 0 else ""),
            "threshold": tree.thr[i],
            "left": tree.left[i], "right": tree.right[i],
            "n": n, "n_pos": p,
            "prob": round_half_away(prob, 6),
        })
    return pd.DataFrame(rows)


def train_tree(sf_dir: str, max_depth: int = 5,
               min_leaf: int = 5) -> pd.DataFrame:
    """Distributed DecisionTreeClassifier analog
    (enhanced_tree_forest.py:631-635: max_depth, min_samples_leaf,
    class_weight='balanced'): returns the BFS node table.  Non-SQL-
    expressible (greedy data-dependent structure) — gated against an
    independent single-process reference in tests/test_trees.py plus
    a separability floor (the marker features genuinely predict the
    'en' label on the synthetic corpus)."""
    ds = _read_docs(sf_dir, ["text", "lang"])
    return _tree_table(grow_tree(ds, max_depth, min_leaf))


def train_forest(sf_dir: str, n_trees: int = 3, max_depth: int = 4,
                 min_leaf: int = 5) -> pd.DataFrame:
    """Distributed RandomForestClassifier analog
    (enhanced_tree_forest.py:656-743: n_estimators, max_features='sqrt',
    bagging): deterministic ~50% bagging (splitmix64 of (doc_id, tree)),
    sqrt-feature subsets per tree, and the gain-summed per-(tree,
    feature) importance table — normalized per tree like
    ``feature_importances_`` (:825-830).  Rows-only (same reason as
    train_tree); naive-reference-gated."""
    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])
    F = len(TREE_FEATURES)
    k = max(2, int(np.sqrt(F)))
    rows = []
    for t in range(n_trees):
        order = np.argsort(_mix64(np.arange(F, dtype=np.uint64)
                                  * np.uint64(0x9E3779B97F4A7C15)
                                  ^ np.uint64(t + 1)), kind="stable")
        feats = np.sort(order[:k])

        def row_sel(tbl: pa.Table, _t=t) -> np.ndarray:
            did = tbl["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            h = _mix64(did * np.uint64(0x632BE59BD9B4E019)
                       ^ np.uint64(_t + 1))
            return (h & np.uint64(1)) == 0  # deterministic ~50% bag

        tree = grow_tree(ds, max_depth, min_leaf,
                         row_sel=row_sel, feat_sel=feats)
        wp, wn = tree._weights  # type: ignore[attr-defined]
        imp = np.zeros(F, dtype=np.float64)
        # gain-summed importances need the realized gains: recompute
        # from the stored child stats (exact — same formula)
        for i in range(len(tree.feature)):
            f = tree.feature[i]
            if f < 0:
                continue
            lc, rc = tree.left[i], tree.right[i]
            imp[f] += gain_formula(
                wp, wn, float(tree.npos[i]),
                float(tree.n[i] - tree.npos[i]),
                float(tree.npos[lc]),
                float(tree.n[lc] - tree.npos[lc]))
        tot = imp.sum()
        for f in feats:
            rows.append({
                "tree_id": t,
                "feature": TREE_FEATURES[f],
                "importance": round_half_away(
                    imp[f] / tot if tot > 0 else 0.0, 6),
                "n_splits": int(sum(1 for x in tree.feature if x == f)),
            })
    return pd.DataFrame(rows).sort_values(
        ["tree_id", "feature"]).reset_index(drop=True)


def tree_root_split(sf_dir: str, min_leaf: int = 5) -> pd.DataFrame:
    """The distributed histogram exchange + split selection for the ROOT
    node as a standalone SQL-gated query: per-corpus best (feature,
    threshold) by balanced-weighted Gini gain.  The DuckDB twin
    (:func:`tree_root_split_sql`) recomputes the same integer histograms
    and the same shared gain formula, so the selected split and its
    rounded gain match bit for bit."""
    ds = _read_docs(sf_dir, ["text", "lang"])
    F = len(TREE_FEATURES)
    tree = _Tree()
    hist = _level_histograms(ds, tree, 0, [0], F)
    root = hist[hist["f"] == 0]
    n0, p0 = int(root["n"].sum()), int(root["npos"].sum())
    wp = n0 / (2.0 * p0) if p0 else 0.0
    wn = n0 / (2.0 * (n0 - p0)) if n0 - p0 else 0.0
    best, n, p = _best_split(hist, wp, wn, min_leaf, np.arange(F))
    if best is None:
        return pd.DataFrame({"feature": pd.Series([], dtype=object),
                             "threshold": pd.Series([], dtype="int64"),
                             "gain": pd.Series([], dtype="float64"),
                             "n_left": pd.Series([], dtype="int64"),
                             "n_right": pd.Series([], dtype="int64")})
    f, t, g = best
    hf = hist[hist["f"] == f]
    n_left = int(hf[hf["bin"] <= t]["n"].sum())
    return pd.DataFrame({"feature": [TREE_FEATURES[f]],
                         "threshold": [t],
                         "gain": [float(round_half_away(g, 8))],
                         "n_left": [n_left],
                         "n_right": [n - n_left]})


def tree_root_split_sql(min_leaf: int = 5) -> str:
    """Generated DuckDB twin of :func:`tree_root_split`: per-feature
    UNION ALL histograms, cumulative window sums, and the gain formula
    in the SAME float64 operation order as :func:`gain_formula`."""
    fexpr = {}
    for i, w in enumerate(TREE_MARKERS):
        fexpr[i] = f"len(regexp_extract_all(text, '\\b{w}\\b'))"
    fexpr[len(TREE_MARKERS)] = "len(regexp_extract_all(text, '\\S+'))"
    fexpr[len(TREE_MARKERS) + 1] = "length(text)"
    per_feat = " UNION ALL ".join(
        f"SELECT {i} AS f, least(CAST({e} AS BIGINT), {N_BINS - 1}) AS bin,"
        f" CAST(CASE WHEN lang = '{TREE_LABEL_LANG}' THEN 1 ELSE 0 END"
        f" AS BIGINT) AS y FROM documents"
        for i, e in fexpr.items())
    # score(P, M) = W - (P*P + M*M)/W with W = P + M (gain_formula order)
    score = ("(({P} + {M}) - ((({P} * {P}) + ({M} * {M})) "
             "/ ({P} + {M})))")
    sp = score.format(P="(wp * cp)", M="(wn * (cn - cp))")
    sn = score.format(P="(wp * p)", M="(wn * m)")
    sr = score.format(P="(wp * (p - cp))", M="(wn * (m - (cn - cp)))")
    gain = f"({sn} - ({sp} + {sr}))"
    names = ", ".join(f"'{n}'" for n in TREE_FEATURES)
    return f"""
WITH x AS ({per_feat}),
h AS (SELECT f, bin, count(*) AS n, sum(y) AS npos
      FROM x GROUP BY f, bin),
r AS (SELECT CAST(sum(n) AS BIGINT) AS n0, CAST(sum(npos) AS BIGINT) AS p0
      FROM h WHERE f = 0),
w AS (SELECT n0, p0,
             CASE WHEN p0 > 0 THEN n0 / (2.0 * p0) ELSE 0.0 END AS wp,
             CASE WHEN n0 - p0 > 0 THEN n0 / (2.0 * (n0 - p0))
                  ELSE 0.0 END AS wn
      FROM r),
c AS (SELECT f, bin,
             CAST(sum(n) OVER (PARTITION BY f ORDER BY bin
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cn,
             CAST(sum(npos) OVER (PARTITION BY f ORDER BY bin
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cp
      FROM h),
g AS (SELECT c.f, c.bin, c.cn, c.cp,
             CAST(w.n0 AS DOUBLE) AS nn, CAST(w.p0 AS DOUBLE) AS p,
             CAST(w.n0 - w.p0 AS DOUBLE) AS m, w.wp, w.wn
      FROM c, w
      WHERE c.bin < {N_BINS - 1}
        AND c.cn >= {min_leaf} AND (w.n0 - c.cn) >= {min_leaf})
SELECT [{names}][f + 1] AS feature,
       CAST(bin AS BIGINT) AS threshold,
       round({gain}, 8) AS gain,
       CAST(cn AS BIGINT) AS n_left,
       CAST(nn - cn AS BIGINT) AS n_right
FROM g WHERE {gain} > {MIN_GAIN}
ORDER BY {gain} DESC, f, bin LIMIT 1"""
