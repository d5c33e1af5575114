"""Classification pipeline: feature extraction -> model scoring -> upsert.

Re-expresses the reference's script-classification stage
(``script_classification/vendor_issues/no_split/classify.py``):
vectorized feature extraction (M9, ``classify.py:126-305``), a scorer
holding a model loaded once per actor (T3, ``classify.py:61-98``:
pickle/joblib + batch predict_proba), confidence binning (A5,
``pd.cut`` at ``classify.py:349-353``), the batched results upsert
(S12, ``classify.py:391-433``) and summary rollups (A7).

The "model" is a fixed-weight logistic regression so scores are a pure
function of the inputs and the DuckDB oracle can recompute them exactly
(same formula, same operation order, rounded half-away at 4 decimals).
A real deployment swaps the weights for a loaded artifact without
touching the pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Mean

from ..functions.util import round_half_away
from .textops import STOPWORDS, WORD_RE, _count_word, _read_docs

# logistic weights (deterministic stand-in for the pickled sklearn model)
W_BIAS = -2.0
W_NWORDS = 0.01
W_STOPR = 3.0
W_NCHARS = 0.002


# text-feature registry shared by the fixed-weight and artifact paths
# (each returns float64 per row; names are what artifacts reference)
_TEXT_FEATURES = {
    "n_words": lambda t: pc.count_substring_regex(
        t["text"], WORD_RE).to_numpy(zero_copy_only=False).astype(np.float64),
    "n_stop": lambda t: sum(
        _count_word(t["text"], w) for w in STOPWORDS).astype(np.float64),
    "n_chars": lambda t: pc.utf8_length(
        t["text"]).to_numpy(zero_copy_only=False).astype(np.float64),
    "punct_ratio": lambda t: (
        pc.count_substring_regex(t["text"], r"[.,!?;:]").to_numpy(
            zero_copy_only=False).astype(np.float64)
        / np.maximum(pc.utf8_length(t["text"]).to_numpy(
            zero_copy_only=False).astype(np.float64), 1.0)),
}
_TEXT_FEATURES["stop_ratio"] = lambda t: (
    _TEXT_FEATURES["n_stop"](t) / np.maximum(_TEXT_FEATURES["n_words"](t), 1.0))


class Scorer:
    """T3: model scorer actor — model loaded ONCE per actor/task
    construction, batches scored vectorized (the predict_proba analog;
    reference loads a pickled sklearn model + feature-column list per
    worker, ``classify.py:61-98,322-356``).

    ``artifact_path``: an ``.npz`` holding ``bias`` (float),
    ``weights`` (float64[n]) and ``feature_names`` (str[n]) — the
    linear-model analog of the reference's joblib artifact.  Each
    feature name resolves to a COLUMN of the batch when present (the
    wide-feature path) else to the text-feature registry above.
    Without a path, the fixed default weights apply (score is then a
    pure function DuckDB recomputes exactly — see score_sql_exprs)."""

    ID_COLS = ("doc_id", "script_sha")

    def __init__(self, artifact_path: str | None = None):
        if artifact_path is None:
            self.bias = W_BIAS
            self.weights = (W_NWORDS, W_STOPR, W_NCHARS)
            self.feature_names = ("n_words", "stop_ratio", "n_chars")
        else:
            with np.load(artifact_path, allow_pickle=False) as art:
                self.bias = float(art["bias"])
                self.weights = tuple(art["weights"].astype(np.float64))
                self.feature_names = tuple(str(s) for s in art["feature_names"])
            assert len(self.weights) == len(self.feature_names)

    def _feature(self, batch: pa.Table, name: str) -> np.ndarray:
        if name in batch.column_names:
            return batch[name].to_numpy(zero_copy_only=False).astype(np.float64)
        return _TEXT_FEATURES[name](batch)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # fixed accumulation order (bias, then features in artifact
        # order) so the DuckDB twin reproduces the float64 result bit
        # for bit
        z = np.full(batch.num_rows, self.bias, dtype=np.float64)
        for w, name in zip(self.weights, self.feature_names):
            z = z + w * self._feature(batch, name)
        score = 1.0 / (1.0 + np.exp(-z))
        label = np.where(score > 0.5, "behavioral", "benign")
        conf = np.where(score < 0.25, "low",
               np.where(score < 0.5, "medium",
               np.where(score < 0.75, "high", "very_high")))
        cols = {c: batch[c] for c in self.ID_COLS if c in batch.column_names}
        cols.update(
            score=pa.array(round_half_away(score, 4)),
            label=pa.array(label.astype(object), type=pa.string()),
            confidence=pa.array(conf.astype(object), type=pa.string()),
        )
        return pa.table(cols)


def classify_documents(sf_dir: str) -> pd.DataFrame:
    """M9+T3+A5 over the documents table: per-doc score/label/confidence."""
    # Scorer state is four floats: ship a serialized-once instance into
    # full-width stateless tasks instead of starving the stage with a
    # fixed-size actor pool (an expensive real model load would instead
    # use map_batches(Scorer, concurrency=(2, ncpu)) — see AdblockIndex)
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        Scorer(), batch_format="pyarrow", batch_size=4096
    ).to_pandas()


def classification_summary(sf_dir: str) -> pd.DataFrame:
    """A7: per-label counts + mean score (classify.py:504-530)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    scored = ds.map_batches(
        Scorer(), batch_format="pyarrow", batch_size=4096)
    out = scored.groupby("label").aggregate(
        Count(alias_name="n"), Mean("score", alias_name="avg_score")
    ).to_pandas()
    out["avg_score"] = round_half_away(out["avg_score"], 4)
    return out


def results_upsert(sf_dir: str) -> pd.DataFrame:
    """S12: idempotent latest-wins upsert (INSERT .. ON CONFLICT DO
    UPDATE, classify.py:391-433) — per user, the state at max event
    time (ties: max value)."""
    from ..functions.util import read_parquet_clean
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        last_ts = g["ts"].max()
        v = g.loc[g["ts"] == last_ts, "value"].max()
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "last_ts": [last_ts],
                             "last_value": [float(round_half_away(v, 4))]})

    return ds.groupby("user_id").map_groups(
        latest, batch_format="pandas").to_pandas()


def verified_behavioral_details(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """J4: verified-behavioral detail join (production_classifier.py
    'GET ORIGINAL SCRIPT DETAILS FOR HIGH CONFIDENCE BEHAVIORAL',
    heuristics/production_classifier.py:480-491): results filtered to
    high-confidence behavioral, inner-joined back to the ORIGINALS
    table for their source details, ordered by probability, LIMIT k.

    Scale shape: the ORDER BY .. LIMIT pushes down as per-batch partial
    top-k (tiny partials merge on the driver), and the detail join is a
    broadcast-id probe into a column-pruned documents read — no
    all-to-all join for a k-row result."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    scored = ds.map_batches(Scorer(), batch_format="pyarrow",
                            batch_size=4096)

    def partial_topk(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.equal(t["label"], "behavioral"),
            pc.is_in(t["confidence"],
                     value_set=pa.array(["high", "very_high"]))))
        order = pc.sort_indices(t, sort_keys=[("score", "descending"),
                                              ("doc_id", "ascending")])
        return t.take(order[:k]).select(["doc_id", "score"])

    parts = scored.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    if parts.empty:  # typed-empty (empty to_pandas can drop the schema)
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64"),
                             "source": pd.Series([], dtype="object"),
                             "lang": pd.Series([], dtype="object"),
                             "n_chars": pd.Series([], dtype="int64")})
    top = parts.sort_values(["score", "doc_id"],
                            ascending=[False, True]).head(k)
    ids = set(top["doc_id"])
    details = _read_docs(sf_dir, ["doc_id", "source", "lang", "n_chars"]) \
        .map_batches(lambda t: t.filter(
            pc.is_in(t["doc_id"], value_set=pa.array(sorted(ids)))),
            batch_format="pyarrow").to_pandas()
    out = top.merge(details, on="doc_id", how="inner")
    return out[["doc_id", "score", "source", "lang", "n_chars"]] \
        .sort_values(["score", "doc_id"], ascending=[False, True]) \
        .reset_index(drop=True)


def _artifact(name: str) -> str:
    import os

    return os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "artifacts", name)


def classify_documents_artifact(sf_dir: str) -> pd.DataFrame:
    """T3 with a REAL artifact-loading path: the linear model (bias,
    weights, feature_names) loads from the checked-in npz once per
    actor and scores the documents table — the reference's
    joblib-load + FEATURE_COLUMNS-select + batch predict_proba shape
    (classify.py:61-98,322-356)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        Scorer, fn_constructor_args=(_artifact("doc_quality_lr.npz"),),
        batch_format="pyarrow", batch_size=4096,
        concurrency=(2, max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)),
    ).to_pandas()


def score_features_wide(sf_dir: str, docs=None) -> pd.DataFrame:
    """T3 feeding the M9 wide table: doc_features_wide -> artifact-
    loaded scorer over the named feature COLUMNS (per-script verdicts,
    the production_classifier report input)."""
    from .features import script_features_wide

    if docs is None:
        import __ray_entry__ as _entry  # driver-level crawl cache

        docs = _entry._crawl(sf_dir).docs()
    wide = script_features_wide(docs)
    return wide.map_batches(
        Scorer, fn_constructor_args=(_artifact("script_wide_lr.npz"),),
        batch_format="pyarrow", batch_size=4096,
        concurrency=(2, max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)),
    ).to_pandas().sort_values(["doc_id", "script_sha"]).reset_index(drop=True)


def artifact_score_sql_exprs() -> dict[str, str]:
    """DuckDB twin of the doc_quality_lr artifact scorer: the SQL is
    GENERATED from the same npz the engine loads, so weights cannot
    drift between the two sides."""
    with np.load(_artifact("doc_quality_lr.npz"), allow_pickle=False) as art:
        bias = float(art["bias"])
        weights = [float(w) for w in art["weights"]]
        names = [str(s) for s in art["feature_names"]]
    n_words = f"CAST(len(regexp_extract_all(text, '{WORD_RE}')) AS DOUBLE)"
    n_stop = " + ".join(
        f"len(regexp_extract_all(text, '\\b{w}\\b'))" for w in STOPWORDS)
    n_chars = "CAST(length(text) AS DOUBLE)"
    exprs = {
        "n_words": n_words,
        "n_chars": n_chars,
        "stop_ratio": f"(CAST(({n_stop}) AS DOUBLE) / greatest({n_words}, 1.0))",
        "punct_ratio": (f"(CAST(len(regexp_extract_all(text, '[.,!?;:]')) "
                        f"AS DOUBLE) / greatest({n_chars}, 1.0))"),
    }
    z = str(bias)
    for w, name in zip(weights, names):
        z = f"({z} + {w} * {exprs[name]})"
    score = f"(1.0 / (1.0 + exp(-{z})))"
    label = f"(CASE WHEN {score} > 0.5 THEN 'behavioral' ELSE 'benign' END)"
    conf = (f"(CASE WHEN {score} < 0.25 THEN 'low' "
            f"WHEN {score} < 0.5 THEN 'medium' "
            f"WHEN {score} < 0.75 THEN 'high' ELSE 'very_high' END)")
    return {"score": score, "label": label, "confidence": conf}


def wide_artifact_score_sql_exprs() -> dict[str, str]:
    """DuckDB twin of the script_wide_lr artifact scorer over the wide
    feature COLUMNS — SQL generated from the same npz (weights cannot
    drift), z-accumulation parenthesized in Scorer.__call__'s order so
    the float64 result matches bit for bit."""
    with np.load(_artifact("script_wide_lr.npz"), allow_pickle=False) as art:
        bias = float(art["bias"])
        weights = [float(w) for w in art["weights"]]
        names = [str(s) for s in art["feature_names"]]
    z = str(bias)
    for w, name in zip(weights, names):
        z = f"({z} + {w} * CAST({name} AS DOUBLE))"
    score = f"(1.0 / (1.0 + exp(-{z})))"
    label = f"(CASE WHEN {score} > 0.5 THEN 'behavioral' ELSE 'benign' END)"
    conf = (f"(CASE WHEN {score} < 0.25 THEN 'low' "
            f"WHEN {score} < 0.5 THEN 'medium' "
            f"WHEN {score} < 0.75 THEN 'high' ELSE 'very_high' END)")
    return {"score": score, "label": label, "confidence": conf}


def score_sql_exprs() -> dict[str, str]:
    """DuckDB expressions recomputing the scorer exactly (shared
    constants; same operation order as Scorer.__call__)."""
    n_words = f"CAST(len(regexp_extract_all(text, '{WORD_RE}')) AS DOUBLE)"
    n_stop = " + ".join(
        f"len(regexp_extract_all(text, '\\b{w}\\b'))" for w in STOPWORDS)
    n_chars = "CAST(length(text) AS DOUBLE)"
    stop_ratio = f"(CAST(({n_stop}) AS DOUBLE) / greatest({n_words}, 1.0))"
    z = (f"({W_BIAS} + {W_NWORDS} * {n_words} + {W_STOPR} * {stop_ratio} "
         f"+ {W_NCHARS} * {n_chars})")
    score = f"(1.0 / (1.0 + exp(-{z})))"
    label = f"(CASE WHEN {score} > 0.5 THEN 'behavioral' ELSE 'benign' END)"
    conf = (f"(CASE WHEN {score} < 0.25 THEN 'low' "
            f"WHEN {score} < 0.5 THEN 'medium' "
            f"WHEN {score} < 0.75 THEN 'high' ELSE 'very_high' END)")
    return {"score": score, "label": label, "confidence": conf}


class AdblockIndex:
    """T4: adblock filter-set actor — blocklist COMPILED from an
    easylist-format rules file once per actor (the brave-adblock +
    easylist analog; the reference wires EASYLIST/EASYPRIVACY files into
    a compiled engine, docker-compose.yaml:152-155).

    Supported easylist subset (artifacts/easylist_min.txt is the default
    rules file): ``!`` comments, ``||host^`` domain anchors (match the
    domain AND its subdomains, easylist semantics), leading-``/`` path
    prefixes, and ``@@||host^`` exception rules (unblock).  Matching is
    vectorized: exact-host isin plus a bounded label-strip loop for the
    subdomain walk (hosts have few labels), prefix checks via numpy
    startswith."""

    DEFAULT_RULES = _artifact("easylist_min.txt")

    def __init__(self, rules_path: str | None = None):
        self.hosts: set[str] = set()
        self.except_hosts: set[str] = set()
        self.prefixes: list[str] = []
        for raw in open(rules_path or self.DEFAULT_RULES):
            line = raw.strip()
            if not line or line.startswith("!"):
                continue
            neg = line.startswith("@@")
            if neg:
                line = line[2:]
            if line.startswith("||"):
                host = line[2:].rstrip("^").lower()
                (self.except_hosts if neg else self.hosts).add(host)
            elif line.startswith("/") and not line.startswith("//"):
                if not neg:
                    self.prefixes.append(line)
            # anything else: unsupported easylist syntax, ignored

    def _host_hit(self, hosts: np.ndarray, ruleset: set[str]) -> np.ndarray:
        if not ruleset:
            return np.zeros(len(hosts), dtype=bool)
        rules = list(ruleset)
        hit = np.isin(hosts, rules)
        # easylist domain anchors match subdomains: strip leading labels
        cur = hosts.astype(object)
        for _ in range(8):  # bounded label walk
            has_dot = np.array(["." in h for h in cur], dtype=bool)
            todo = ~hit & has_dot
            if not todo.any():
                break
            cur = np.array([h.partition(".")[2] if t else h
                            for h, t in zip(cur, todo)], dtype=object)
            hit |= todo & np.isin(cur, rules)
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts = batch["host"].to_numpy(zero_copy_only=False)
        paths = batch["path"].to_numpy(zero_copy_only=False).astype(str)
        host_hit = self._host_hit(hosts, self.hosts)
        path_hit = np.zeros(len(paths), dtype=bool)
        for p in self.prefixes:
            path_hit |= np.char.startswith(paths, p)
        blocked = (host_hit | path_hit) & ~self._host_hit(
            hosts, self.except_hosts)
        return batch.append_column("ad_blocked", pa.array(blocked))


def adblock_filter(sf_dir: str, rules_path: str | None = None) -> pd.DataFrame:
    """T4 as a query: derived seeds -> blocked flag per valid URL."""
    from .analytics import seed_canonicalize

    canon = seed_canonicalize(sf_dir)
    valid = canon[canon["valid"]][["seed_id", "canonical_url", "host", "path"]]
    ds = rd.from_pandas(valid)
    out = ds.map_batches(
        AdblockIndex, fn_constructor_args=(rules_path,),
        batch_format="pyarrow", batch_size=4096,
        # autoscaling pool: index built once per actor, width follows load
        concurrency=(2, max(2, int(ray.cluster_resources().get("CPU", 8)) // 2))
    ).to_pandas()
    return out[["seed_id", "canonical_url", "ad_blocked"]]


def robots_decisions(sf_dir: str, rules_path: str | None = None) -> pd.DataFrame:
    """T7's real-format tier as a query: derived seeds -> RFC 9309
    allow/deny + declared crawl delay per valid URL, from a robots.txt
    cache file compiled once per actor (``functions/robots.py``; the
    same rules-file-index shape as :class:`AdblockIndex`).  The oracle
    SQL is GENERATED from the same parsed rules."""
    from ..functions.robots import RobotsIndex, default_corpus
    from .analytics import seed_canonicalize

    canon = seed_canonicalize(sf_dir)
    valid = canon[canon["valid"]][["seed_id", "canonical_url", "host", "path"]]
    ds = rd.from_pandas(valid)
    out = ds.map_batches(
        RobotsIndex, fn_constructor_args=(rules_path or default_corpus(),),
        batch_format="pyarrow", batch_size=4096,
        concurrency=(2, max(2, int(ray.cluster_resources().get("CPU", 8)) // 2))
    ).to_pandas()
    return out[["seed_id", "canonical_url", "allowed", "crawl_delay_ms"]] \
        .sort_values("seed_id").reset_index(drop=True)
