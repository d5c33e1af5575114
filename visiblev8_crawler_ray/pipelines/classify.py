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


class Scorer:
    """T3: model scorer actor — weights 'loaded' once per actor, batches
    scored vectorized (the predict_proba analog)."""

    def __init__(self):
        self.w = (W_BIAS, W_NWORDS, W_STOPR, W_NCHARS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n_words = pc.count_substring_regex(text, WORD_RE).to_numpy(
            zero_copy_only=False).astype(np.float64)
        n_stop = sum(_count_word(text, w) for w in STOPWORDS).astype(np.float64)
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
        stop_ratio = n_stop / np.maximum(n_words, 1.0)
        b, w1, w2, w3 = self.w
        z = b + w1 * n_words + w2 * stop_ratio + w3 * n_chars
        score = 1.0 / (1.0 + np.exp(-z))
        label = np.where(score > 0.5, "behavioral", "benign")
        conf = np.where(score < 0.25, "low",
               np.where(score < 0.5, "medium",
               np.where(score < 0.75, "high", "very_high")))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "score": pa.array(round_half_away(score, 4)),
                "label": pa.array(label.astype(object), type=pa.string()),
                "confidence": pa.array(conf.astype(object), type=pa.string()),
            }
        )


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
    """T4: adblock filter-set actor — 'compiled' blocklist built once per
    actor (the brave-adblock + easylist analog, docker-compose
    ADBLOCK_BINARY/EASYLIST_FILE).  Deterministic rules: a host set plus
    a path prefix."""

    BLOCKED_HOSTS = frozenset({"src3.example", "src7.example", "src11.example"})
    BLOCKED_PATH_PREFIX = "/page/2"

    def __init__(self):
        self.hosts = set(self.BLOCKED_HOSTS)
        self.prefix = self.BLOCKED_PATH_PREFIX

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts = batch["host"].to_numpy(zero_copy_only=False)
        paths = batch["path"].to_numpy(zero_copy_only=False)
        host_hit = np.isin(hosts, list(self.hosts))
        path_hit = np.char.startswith(paths.astype(str), self.prefix)
        return batch.append_column(
            "ad_blocked", pa.array(host_hit | path_hit))


def adblock_filter(sf_dir: str) -> pd.DataFrame:
    """T4 as a query: derived seeds -> blocked flag per valid URL."""
    from .analytics import seed_canonicalize

    canon = seed_canonicalize(sf_dir)
    valid = canon[canon["valid"]][["seed_id", "canonical_url", "host", "path"]]
    ds = rd.from_pandas(valid)
    out = ds.map_batches(
        AdblockIndex, batch_format="pyarrow", batch_size=4096,
        # autoscaling pool: index built once per actor, width follows load
        concurrency=(2, max(2, int(ray.cluster_resources().get("CPU", 8)) // 2))
    ).to_pandas()
    return out[["seed_id", "canonical_url", "ad_blocked"]]
