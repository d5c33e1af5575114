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


#: easylist separator class: `^` matches any char that is NOT
#: letter/digit/_/-/./% — or the end of the address
_SEP_RE = r"(?:[^A-Za-z0-9_\-.%]|$)"


def _pat_to_regex(pat: str) -> str:
    """Easylist pattern -> RE2 regex (shared by the Arrow kernel and the
    DuckDB twin — both are RE2, so semantics cannot drift): ``*`` is a
    wildcard, ``^`` the separator class, everything else literal."""
    out = []
    for ch in pat:
        if ch == "*":
            out.append(".*")
        elif ch == "^":
            out.append(_SEP_RE)
        elif ch in "\\.+?()[]{}|$":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


class _AdblockRule:
    """One parsed network rule: host anchor and/or pattern + options."""

    __slots__ = ("hosts", "path_pat", "url_re", "prefix", "third_party",
                 "dom_inc", "dom_exc", "exception")

    def __init__(self):
        self.hosts: set[str] = set()      # '||host' anchors (grouped)
        self.path_pat: str | None = None  # anchored regex over path
        self.url_re: str | None = None    # /regex/ rule over full URL
        self.prefix: str | None = None    # plain path-prefix fast path
        self.third_party: bool | None = None  # $third-party / $~
        self.dom_inc: tuple[str, ...] = ()    # $domain= includes
        self.dom_exc: tuple[str, ...] = ()    # $domain= ~excludes
        self.exception = False

    def signature(self):
        return (self.path_pat, self.url_re, self.prefix, self.third_party,
                self.dom_inc, self.dom_exc, self.exception)


class AdblockIndex:
    """T4: adblock filter-set actor — blocklist COMPILED from an
    easylist-format rules file once per actor (the brave-adblock +
    easylist analog; the reference wires EASYLIST/EASYPRIVACY files into
    a compiled engine, docker-compose.yaml:152-155).

    Supported easylist syntax (VERDICT r3 #6 closed the option gap):
    ``!`` comments, ``||host^`` domain anchors (match the domain AND its
    subdomains), ``||host/pattern`` anchors with a path pattern,
    leading-``/`` path prefixes, ``/regex/`` full-URL regex rules,
    ``*`` wildcards and separator-``^`` inside patterns, ``@@``
    exception rules, and the ``$`` options ``third-party`` /
    ``~third-party`` and ``domain=a.com|~b.com`` (evaluated against the
    originating page's host — the optional ``page_host`` batch column;
    absent, a request is its own first party, so ``$third-party`` rules
    cannot match).  Rules with any OTHER option are skipped, as adblock
    engines do for unknown options.

    Matching is vectorized and grouped: rules sharing a
    (pattern, options) signature pool their host anchors into ONE
    isin + bounded subdomain-walk pass (the common ``||host^`` bulk of
    a real easylist collapses to a single group), patterns run as RE2
    Arrow kernels over the whole column, and plain prefixes keep the
    numpy startswith fast path."""

    DEFAULT_RULES = _artifact("easylist_min.txt")

    _OPT_RE = __import__("re").compile(r"^[A-Za-z0-9~=|,.\-_]+$")

    def __init__(self, rules_path: str | None = None):
        groups: dict[tuple, _AdblockRule] = {}
        for raw in open(rules_path or self.DEFAULT_RULES):
            line = raw.strip()
            if not line or line.startswith("!") or "##" in line:
                continue  # comments / cosmetic rules
            r = _AdblockRule()
            if line.startswith("@@"):
                r.exception = True
                line = line[2:]
            # split off $options (the last $ with option-grammar tail)
            di = line.rfind("$")
            if di > 0 and self._OPT_RE.match(line[di + 1:]):
                opts, line = line[di + 1:].split(","), line[:di]
                ok = True
                for o in opts:
                    if o == "third-party":
                        r.third_party = True
                    elif o == "~third-party":
                        r.third_party = False
                    elif o.startswith("domain="):
                        doms = o[len("domain="):].split("|")
                        r.dom_inc = tuple(sorted(
                            d.lower() for d in doms if not d.startswith("~")))
                        r.dom_exc = tuple(sorted(
                            d[1:].lower() for d in doms if d.startswith("~")))
                    else:
                        ok = False  # unknown option: skip the rule
                if not ok:
                    continue
            if len(line) > 2 and line.startswith("/") and line.endswith("/"):
                r.url_re = line[1:-1]           # /regex/ rule
                host = None
            elif line.startswith("||"):
                body = line[2:]
                cut = len(body)
                for i, ch in enumerate(body):
                    if ch in "/^*":
                        cut = i
                        break
                host = body[:cut].lower()
                tail = body[cut:]
                if tail:                         # pattern after the host
                    r.path_pat = "^" + _pat_to_regex(tail)
            elif line.startswith("/"):
                if "*" in line or "^" in line:
                    r.path_pat = "^" + _pat_to_regex(line)
                else:
                    r.prefix = line              # plain-prefix fast path
                host = None
            else:
                continue  # unsupported syntax, ignored
            grp = groups.setdefault(r.signature(), r)
            if host:
                grp.hosts.add(host)
        self.groups = [g for g in groups.values()
                       if g.hosts or g.path_pat or g.url_re or g.prefix]

    @staticmethod
    def _host_hit(hosts: np.ndarray, ruleset: set[str]) -> np.ndarray:
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

    @staticmethod
    def _dom_hit(page: np.ndarray, doms: tuple[str, ...]) -> np.ndarray:
        hit = np.isin(page, list(doms))
        ps = page.astype(str)
        for d in doms:
            hit |= np.char.endswith(ps, "." + d)
        return hit

    def _group_mask(self, g: _AdblockRule, hosts, paths_pa, urls_pa,
                    page, tp_mask) -> np.ndarray:
        n = len(hosts)
        if g.hosts:
            m = self._host_hit(hosts, g.hosts)
        else:
            m = np.ones(n, dtype=bool)
        if g.prefix is not None:
            m &= np.char.startswith(paths_pa.to_numpy(
                zero_copy_only=False).astype(str), g.prefix)
        if g.path_pat is not None:
            m &= pc.match_substring_regex(paths_pa, g.path_pat) \
                .to_numpy(zero_copy_only=False)
        if g.url_re is not None:
            m &= pc.match_substring_regex(urls_pa, g.url_re) \
                .to_numpy(zero_copy_only=False)
        if g.third_party is not None:
            m &= tp_mask if g.third_party else ~tp_mask
        if g.dom_inc:
            m &= self._dom_hit(page, g.dom_inc)
        if g.dom_exc:
            m &= ~self._dom_hit(page, g.dom_exc)
        return m

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.urls import etld1

        hosts = batch["host"].to_numpy(zero_copy_only=False)
        paths_pa = batch["path"]
        if isinstance(paths_pa, pa.ChunkedArray):
            paths_pa = paths_pa.combine_chunks()
        urls_pa = batch["canonical_url"] if "canonical_url" in \
            batch.column_names else paths_pa
        if isinstance(urls_pa, pa.ChunkedArray):
            urls_pa = urls_pa.combine_chunks()
        if "page_host" in batch.column_names:
            page = batch["page_host"].to_numpy(zero_copy_only=False)
        else:
            page = hosts  # no page context: request is its own 1st party
        tp_mask = etld1(pa.array(page, type=pa.string())) \
            .to_numpy(zero_copy_only=False) != \
            etld1(pa.array(hosts, type=pa.string())) \
            .to_numpy(zero_copy_only=False)
        n = len(hosts)
        blocked = np.zeros(n, dtype=bool)
        excepted = np.zeros(n, dtype=bool)
        for g in self.groups:
            m = self._group_mask(g, hosts, paths_pa, urls_pa, page, tp_mask)
            if g.exception:
                excepted |= m
            else:
                blocked |= m
        return batch.append_column(
            "ad_blocked", pa.array(blocked & ~excepted))

    # -- generated SQL twin -------------------------------------------------

    def sql_pred(self, host: str, path: str, url: str, page: str) -> str:
        """DuckDB predicate recomputing ad_blocked from the SAME parsed
        rule groups (regexes shared verbatim — both engines are RE2)."""
        from ..functions.urls import etld1_sql_expr

        def esc(s: str) -> str:
            return s.replace("'", "''")

        def group_pred(g: _AdblockRule) -> str:
            parts = []
            if g.hosts:
                parts.append("(" + " OR ".join(
                    f"({host} = '{esc(h)}' OR suffix({host}, '.{esc(h)}'))"
                    for h in sorted(g.hosts)) + ")")
            if g.prefix is not None:
                parts.append(f"starts_with({path}, '{esc(g.prefix)}')")
            if g.path_pat is not None:
                parts.append(f"regexp_matches({path}, '{esc(g.path_pat)}')")
            if g.url_re is not None:
                parts.append(f"regexp_matches({url}, '{esc(g.url_re)}')")
            if g.third_party is not None:
                tp = (f"({etld1_sql_expr(page)} <> {etld1_sql_expr(host)})")
                parts.append(tp if g.third_party else f"(NOT {tp})")
            if g.dom_inc:
                parts.append("(" + " OR ".join(
                    f"({page} = '{esc(d)}' OR suffix({page}, '.{esc(d)}'))"
                    for d in g.dom_inc) + ")")
            for d in g.dom_exc:
                parts.append(f"(NOT ({page} = '{esc(d)}' "
                             f"OR suffix({page}, '.{esc(d)}')))")
            return "(" + " AND ".join(parts) + ")" if parts else "FALSE"

        block = " OR ".join(group_pred(g) for g in self.groups
                            if not g.exception) or "FALSE"
        exc = " OR ".join(group_pred(g) for g in self.groups
                          if g.exception) or "FALSE"
        return f"(({block}) AND NOT ({exc}))"


#: deterministic page-context modulus for the adblock query: the
#: "originating page" of seed s is src(s % 16).example, so the
#: $third-party and $domain= options see a mix of first- and
#: third-party request pairs (SQL twin derives the same page host)
ADBLOCK_PAGE_MOD = 16


def adblock_filter(sf_dir: str, rules_path: str | None = None) -> pd.DataFrame:
    """T4 as a query: derived seeds -> blocked flag per valid URL,
    evaluated against a deterministic originating-page host so the
    $third-party / $domain= option paths are exercised end to end."""
    from .analytics import seed_canonicalize

    canon = seed_canonicalize(sf_dir)
    valid = canon[canon["valid"]][["seed_id", "canonical_url", "host",
                                   "path"]].copy()
    valid["page_host"] = ("src" + (valid["seed_id"] % ADBLOCK_PAGE_MOD)
                          .astype(str) + ".example")
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


# ---------------------------------------------------------------------------
# distributed scorer training (the reference's last subsystem: the
# sklearn CV-training scripts of script_classification/ — vendor-grouped
# splits of heuristics/vendor_grouped.py:198-282 / nested_cv.py:440-530,
# the per-fold AUC + threshold-analysis tables, and the artifact the
# production scorer loads, classify.py:61-98)

#: training feature columns (integer-valued so every sufficient
#: statistic is an EXACT int sum — the usage_rollup/cents convention
#: applied to X'X): bias, n_words, n_stop, n_chars.
TRAIN_FEATURES = ("n_words", "n_stop", "n_chars")
TRAIN_LABEL_LANG = "en"   # y = 1 iff lang == 'en' (deterministic label)
TRAIN_RIDGE_LAMBDA = 1    # integer ridge keeps the Gram integer-exact
_Z_Q = 1e6                # z quantization for the rank/threshold sweep


def _det3(m):
    """3x3 determinant EXPRESSION with a fixed parenthesization.

    ``m`` is a 3x3 nest of operand strings.  The same string is eval'd
    by numpy float64 on the engine side and by DuckDB on the oracle
    side — identical IEEE754 op order, identical result bit for bit."""
    a, b, c = m[0]
    d, e, f = m[1]
    g, h, i = m[2]
    return (f"((({a}*(({e}*{i})-({f}*{h}))) - ({b}*(({d}*{i})-({f}*{g})))) "
            f"+ ({c}*(({d}*{h})-({e}*{g}))))")


def _det4(m):
    """4x4 determinant via first-row cofactor expansion of _det3 minors
    (fixed association order, shared engine/oracle)."""
    def minor(col):
        cols = [c for c in range(4) if c != col]
        return [[m[r][c] for c in cols] for r in (1, 2, 3)]
    d0, d1, d2, d3 = (_det3(minor(c)) for c in range(4))
    return (f"((({m[0][0]}*{d0}) - ({m[0][1]}*{d1})) "
            f"+ (({m[0][2]}*{d2}) - ({m[0][3]}*{d3})))")


def _gram_names():
    """Operand names of the regularized Gram system: g{i}{j} (i<=j,
    0 = bias column) and rhs b{i}."""
    gs = [f"g{i}{j}" for i in range(4) for j in range(i, 4)]
    bs = [f"b{i}" for i in range(4)]
    return gs, bs


def cramer_weight_exprs() -> list[str]:
    """The four ridge-solution weights as Cramer-rule expressions over
    the named Gram sums — ONE expression tree consumed by both the
    numpy trainer and the generated SQL twin (the fixed-point-unrolled
    pattern of the k-means/IVF twins, applied to the normal equations)."""
    g = [[f"g{min(i, j)}{max(i, j)}" for j in range(4)] for i in range(4)]
    b = [f"b{i}" for i in range(4)]
    det = _det4(g)
    out = []
    for j in range(4):
        mj = [[b[i] if c == j else g[i][c] for c in range(4)]
              for i in range(4)]
        out.append(f"({_det4(mj)} / {det})")
    return out


def _eval_exprs(exprs: list[str], env: dict[str, float]) -> list[float]:
    """Evaluate the shared expression strings in float64 (no builtins;
    operands only) — the engine-side twin of DuckDB evaluating the same
    strings as SQL."""
    ns = {k: float(v) for k, v in env.items()}
    return [float(eval(e, {"__builtins__": {}}, ns)) for e in exprs]


def _train_xy(t: pa.Table, k: int):
    """Vectorized (fold, x1..x3, y) for a batch of documents rows."""
    from ..functions.util import md5_low64

    x1 = pc.count_substring_regex(t["text"], WORD_RE) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    x2 = sum(_count_word(t["text"], w) for w in STOPWORDS).astype(np.int64)
    x3 = pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    y = pc.equal(t["lang"], TRAIN_LABEL_LANG) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    fold = (md5_low64(t["source"]).view(np.uint64)
            % np.uint64(k)).astype(np.int64)
    return fold, x1, x2, x3, y


def train_scorer(sf_dir: str, k: int = 5,
                 artifact_out: str | None = None) -> pd.DataFrame:
    """Distributed vendor-grouped k-fold CV of a closed-form ridge
    scorer over the documents table; returns the per-fold evaluation
    table (n_train/n_val, weights, rank AUC, best threshold + accuracy)
    and optionally writes the full-data ``.npz`` artifact that
    :class:`Scorer` loads.

    Mirrors the reference's training subsystem semantics, Ray-Data
    first:

    - **grouped splits**: fold = md5(source) % k, so no source (the
      vendor analog, ``vendor_grouped.py:198-282``) ever spans
      train/val — the GroupKFold discipline of ``nested_cv.py``.
    - **trainer**: ridge normal equations.  Pass 1 streams ONE
      map_batches over the corpus emitting per-(block, fold) integer
      Gram partials (10 upper-triangle entries + 4 RHS + count); the
      exchange is k x 15 int64s — sketch-sized, like the k-means
      trainer.  Train-side Gram for fold f = total - fold_f (no second
      scan).  The 4x4 solve runs per fold on the driver via
      :func:`cramer_weight_exprs` — the SAME expression string the SQL
      twin runs, so weights agree bit for bit (ints are exact in
      float64 below 2^53, asserted).
    - **evaluation**: pass 2 re-derives features, scores each row with
      its OWN fold's weights (k weight vectors broadcast), quantizes z
      at 1e-6 and reduces to a (fold, z_q, y) histogram — the exchange
      is bounded by distinct quantized scores, never corpus-sized.  The
      driver computes tie-corrected rank AUC (Mann-Whitney over the
      histogram, integers until the final division) and sweeps every
      distinct z_q as a candidate threshold (`predict positive iff
      z > t`), reporting the accuracy-max (ties -> lowest threshold) —
      the threshold-analysis table of ``nested_cv.py:525-560``.

    At 100 TB both passes are single streaming scans; only the k x 15
    Gram rows and the score histogram cross the wire.  Honest bound:
    the histogram is keyed by DISTINCT quantized z, which tracks
    distinct feature combinations — far below corpus size but not
    constant; at extreme scale coarsen ``_Z_Q`` (each 10x cut divides
    the exchange by ~10 at the cost of coarser threshold/AUC ties)."""
    ds = _read_docs(sf_dir, ["text", "lang", "source"])
    lam = TRAIN_RIDGE_LAMBDA

    def gram_partial(t: pa.Table) -> pa.Table:
        fold, x1, x2, x3, y = _train_xy(t, k)
        x0 = np.ones(len(x1), dtype=np.int64)
        xs = (x0, x1, x2, x3)
        cols: dict[str, pa.Array] = {"fold": pa.array(np.arange(k))}
        for i in range(4):
            for j in range(i, 4):
                cols[f"g{i}{j}"] = pa.array(
                    np.bincount(fold, weights=(xs[i] * xs[j]).astype(
                        np.float64), minlength=k).astype(np.int64))
            cols[f"b{i}"] = pa.array(
                np.bincount(fold, weights=(xs[i] * y).astype(np.float64),
                            minlength=k).astype(np.int64))
        return pa.table(cols)

    from ..functions.util import two_phase_agg

    gnames, bnames = _gram_names()
    agg_cols = gnames + bnames
    gram = two_phase_agg(
        ds.map_batches(gram_partial, batch_format="pyarrow"),
        ["fold"], [(c, "sum") for c in agg_cols], ["fold"] + agg_cols,
    ).to_pandas().set_index("fold").sort_index()
    # folds with zero val rows aren't folds (few distinct sources can
    # leave md5(source)%k gaps); the SQL twin's GROUP BY never sees
    # them, so drop them here too
    gram = gram[gram["g00"] > 0]
    # float64 holds every Gram sum exactly below 2^53 — assert, don't
    # silently lose bits (the pack-domain convention)
    assert gram[agg_cols].abs().to_numpy().max() < 2 ** 53
    total = gram[agg_cols].sum()

    wexprs = cramer_weight_exprs()

    def solve(row: pd.Series) -> list[float]:
        env = {c: float(row[c]) for c in agg_cols}
        for i in range(4):  # integer ridge on the diagonal
            env[f"g{i}{i}"] += float(lam)
        return _eval_exprs(wexprs, env)

    fold_ids = list(gram.index)
    weights = {f: solve(total - gram.loc[f]) for f in fold_ids}
    n_train = {f: int(total["g00"] - gram.loc[f, "g00"]) for f in fold_ids}

    if artifact_out is not None:
        w_full = solve(total)
        np.savez(artifact_out, bias=np.float64(w_full[0]),
                 weights=np.array(w_full[1:], dtype=np.float64),
                 feature_names=np.array(TRAIN_FEATURES))

    w_arr = np.zeros((k, 4), dtype=np.float64)
    for f in fold_ids:
        w_arr[f] = weights[f]
    w_ref = ray.put(w_arr)

    def score_hist(t: pa.Table) -> pa.Table:
        w = ray.get(w_ref)
        fold, x1, x2, x3, y = _train_xy(t, k)
        wf = w[fold]
        z = (((wf[:, 0] + wf[:, 1] * x1) + wf[:, 2] * x2) + wf[:, 3] * x3)
        zq = round_half_away(z * _Z_Q, 0).astype(np.int64)
        return pa.table({"fold": pa.array(fold), "zq": pa.array(zq),
                         "y": pa.array(y)})

    hist = two_phase_agg(
        ds.map_batches(score_hist, batch_format="pyarrow"),
        ["fold", "zq", "y"], [("y", "count")], ["fold", "zq", "y", "n"],
    ).to_pandas()

    rows = []
    for f in fold_ids:
        h = hist[hist["fold"] == f]
        piv = h.pivot_table(index="zq", columns="y", values="n",
                            aggfunc="sum", fill_value=0)
        zqs = piv.index.to_numpy()
        pos = piv[1].to_numpy(np.int64) if 1 in piv.columns else \
            np.zeros(len(zqs), np.int64)
        neg = piv[0].to_numpy(np.int64) if 0 in piv.columns else \
            np.zeros(len(zqs), np.int64)
        P, N = int(pos.sum()), int(neg.sum())
        cum_neg_below = np.concatenate(([0], np.cumsum(neg)[:-1]))
        u2 = int((pos * (2 * cum_neg_below + neg)).sum())  # = 2*U, exact
        auc = np.nan if P == 0 or N == 0 else \
            float(round_half_away(np.float64(u2) / (2.0 * P * N), 6))
        # threshold sweep: predict 1 iff z > t over every distinct zq
        cum_pos_upto = np.cumsum(pos)
        cum_neg_upto = np.cumsum(neg)
        correct = (P - cum_pos_upto) + cum_neg_upto  # int per candidate
        bi = int(np.argmax(correct))  # first max = lowest threshold
        rows.append({
            "fold": int(f), "n_train": n_train[f], "n_val": P + N,
            "w_bias": round_half_away(weights[f][0], 8),
            "w_n_words": round_half_away(weights[f][1], 8),
            "w_n_stop": round_half_away(weights[f][2], 8),
            "w_n_chars": round_half_away(weights[f][3], 8),
            "auc": auc,
            "best_threshold": round_half_away(zqs[bi] / _Z_Q, 6),
            "best_acc": round_half_away(
                float(correct[bi]) / float(P + N), 6),
        })
    return pd.DataFrame(rows).sort_values("fold").reset_index(drop=True)


def train_scorer_sql(k: int = 5) -> str:
    """DuckDB twin of :func:`train_scorer`, generated from the same
    constants and the same Cramer expression strings — integer Gram
    sums, fold-complement training, identical float64 solve, identical
    z quantization, histogram AUC and threshold sweep as window sums."""
    lam = TRAIN_RIDGE_LAMBDA
    n_stop = " + ".join(
        f"len(regexp_extract_all(text, '\\b{w}\\b'))" for w in STOPWORDS)
    gnames, bnames = _gram_names()
    xs = {0: "CAST(1 AS BIGINT)", 1: "x1", 2: "x2", 3: "x3"}
    gram_sums = ", ".join(
        [f"sum(CAST({xs[i]} * {xs[j]} AS BIGINT)) AS g{i}{j}"
         for i in range(4) for j in range(i, 4)]
        + [f"sum(CAST({xs[i]} * y AS BIGINT)) AS b{i}" for i in range(4)])
    tot_sums = ", ".join(f"sum({c}) AS {c}" for c in gnames + bnames)
    # train side = total - fold, ridge added on the diagonal, cast to
    # DOUBLE before entering the shared Cramer expressions
    tr_cols = []
    for c in gnames + bnames:
        expr = f"(t.{c} - g.{c})"
        if c[0] == "g" and c[1] == c[2]:
            expr = f"({expr} + {lam})"
        tr_cols.append(f"CAST({expr} AS DOUBLE) AS {c}")
    wexprs = cramer_weight_exprs()
    w_cols = ", ".join(f"({e}) AS w{j}" for j, e in enumerate(wexprs))
    return f"""
WITH f AS (
    SELECT md5_number_lower(source) % {k} AS fold,
           CAST(len(regexp_extract_all(text, '{WORD_RE}')) AS BIGINT) AS x1,
           CAST({n_stop} AS BIGINT) AS x2,
           CAST(length(text) AS BIGINT) AS x3,
           CAST(CASE WHEN lang = '{TRAIN_LABEL_LANG}' THEN 1 ELSE 0 END
                AS BIGINT) AS y
    FROM documents),
g AS (SELECT fold, {gram_sums} FROM f GROUP BY fold),
t AS (SELECT {tot_sums} FROM g),
tr AS (SELECT g.fold, {', '.join(tr_cols)} FROM g, t),
w AS (SELECT fold, {w_cols},
             CAST((SELECT sum(g2.g00) FROM g g2) - g00p AS BIGINT) AS n_train
      FROM (SELECT tr.*, (SELECT g3.g00 FROM g g3
                          WHERE g3.fold = tr.fold) AS g00p FROM tr)),
z AS (SELECT f.fold,
             CAST(round((((w.w0 + w.w1 * f.x1) + w.w2 * f.x2)
                         + w.w3 * f.x3) * {_Z_Q}) AS BIGINT) AS zq,
             f.y
      FROM f JOIN w USING (fold)),
h AS (SELECT fold, zq, CAST(sum(y) AS BIGINT) AS pos,
             CAST(count(*) - sum(y) AS BIGINT) AS neg
      FROM z GROUP BY fold, zq),
c AS (SELECT fold, zq, pos, neg,
             CAST(coalesce(sum(neg) OVER (PARTITION BY fold ORDER BY zq
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cnb,
             CAST(sum(pos) OVER (PARTITION BY fold ORDER BY zq
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cpu,
             CAST(sum(neg) OVER (PARTITION BY fold ORDER BY zq
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cnu,
             CAST(sum(pos) OVER (PARTITION BY fold) AS BIGINT) AS tp,
             CAST(sum(neg) OVER (PARTITION BY fold) AS BIGINT) AS tn
      FROM h),
a AS (SELECT fold,
             CASE WHEN min(tp) = 0 OR min(tn) = 0 THEN NULL
                  ELSE round(CAST(sum(pos * (2 * cnb + neg)) AS DOUBLE)
                             / (2.0 * min(tp) * min(tn)), 6) END AS auc,
             CAST(min(tp) + min(tn) AS BIGINT) AS n_val
      FROM c GROUP BY fold),
s AS (SELECT fold, zq, ((tp - cpu) + cnu) AS correct, (tp + tn) AS n,
             row_number() OVER (PARTITION BY fold
                 ORDER BY ((tp - cpu) + cnu) DESC, zq ASC) AS rk
      FROM c)
SELECT w.fold, w.n_train, a.n_val,
       round(w.w0, 8) AS w_bias, round(w.w1, 8) AS w_n_words,
       round(w.w2, 8) AS w_n_stop, round(w.w3, 8) AS w_n_chars,
       a.auc,
       round(s.zq / {_Z_Q}, 6) AS best_threshold,
       round(CAST(s.correct AS DOUBLE) / s.n, 6) AS best_acc
FROM w JOIN a USING (fold) JOIN s USING (fold)
WHERE s.rk = 1
ORDER BY w.fold"""


def _fold_cols(t: pa.Table, k_outer: int, k_inner: int):
    """(outer fold, inner sub-fold) per row — both vendor-grouped
    (functions of source only) and independent (salted second hash)."""
    from ..functions.util import md5_low64

    src = t["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    fold = (md5_low64(src).view(np.uint64)
            % np.uint64(k_outer)).astype(np.int64)
    salted = pc.binary_join_element_wise(src, pa.scalar("#inner"), "")
    inner = (md5_low64(salted).view(np.uint64)
             % np.uint64(k_inner)).astype(np.int64)
    return fold, inner


def nested_cv(sf_dir: str, k_outer: int = 5, k_inner: int = 4,
              lambdas: tuple[float, ...] = (0.1, 1.0, 10.0)
              ) -> pd.DataFrame:
    """Nested cross-validation with an inner ridge-strength grid — the
    ``heuristics/nested_cv.py:440-530`` harness (outer folds for an
    unbiased estimate, inner folds to pick the hyperparameter), vendor-
    grouped at BOTH levels, expressed in two streaming passes:

    - **Pass 1** computes the integer Gram sufficient statistics per
      (outer, inner) CELL — ``k_outer x k_inner x 15`` int64s.  Gram
      additivity then yields EVERY fold combination's normal equations
      by driver-side subtraction, so the entire hyperparameter grid
      (``k_outer x k_inner x |lambdas|`` inner solves + ``k_outer x
      |lambdas|`` outer solves) costs zero extra scans — the trick that
      makes grid search affordable at 100 TB.
    - **Pass 2** scores every row under every role it plays — inner-val
      row of (o != its fold, j = its inner cell) for each lambda, and
      outer-val row of its own fold — and reduces to quantized-score
      histograms; AUCs, the per-outer-fold lambda choice (max mean
      inner AUC, ties to the smaller lambda) and the outer estimate all
      come from those bounded histograms.

    Rows-only (the lambda argmax over float AUCs is not reasonably
    SQL-expressible); gated against an independent single-process
    reference in tests/test_train_scorer.py."""
    from ..functions.util import two_phase_agg

    ds = _read_docs(sf_dir, ["text", "lang", "source"])
    gnames, bnames = _gram_names()
    agg_cols = gnames + bnames
    nc = k_outer * k_inner

    def gram_partial(t: pa.Table) -> pa.Table:
        fold, inner = _fold_cols(t, k_outer, k_inner)
        _f, x1, x2, x3, y = _train_xy(t, k_outer)
        cell = fold * k_inner + inner
        x0 = np.ones(len(x1), dtype=np.int64)
        xs = (x0, x1, x2, x3)
        cols: dict[str, pa.Array] = {"cell": pa.array(np.arange(nc))}
        for i in range(4):
            for j in range(i, 4):
                cols[f"g{i}{j}"] = pa.array(np.bincount(
                    cell, weights=(xs[i] * xs[j]).astype(np.float64),
                    minlength=nc).astype(np.int64))
            cols[f"b{i}"] = pa.array(np.bincount(
                cell, weights=(xs[i] * y).astype(np.float64),
                minlength=nc).astype(np.int64))
        return pa.table(cols)

    cells = two_phase_agg(
        ds.map_batches(gram_partial, batch_format="pyarrow"),
        ["cell"], [(c, "sum") for c in agg_cols], ["cell"] + agg_cols,
    ).to_pandas().set_index("cell").sort_index()
    assert cells[agg_cols].abs().to_numpy().max() < 2 ** 53
    full = np.zeros((nc, len(agg_cols)))
    full[cells.index.to_numpy()] = cells[agg_cols].to_numpy()
    cube = full.reshape(k_outer, k_inner, len(agg_cols))
    total = cube.sum(axis=(0, 1))
    wexprs = cramer_weight_exprs()

    def solve(vec: np.ndarray, lam: float) -> list[float]:
        env = dict(zip(agg_cols, (float(v) for v in vec)))
        for i in range(4):
            env[f"g{i}{i}"] += float(lam)
        return _eval_exprs(wexprs, env)

    # inner weights: train = total - outer o's cells - inner column j
    # of the REMAINING folds; outer weights: train = total - fold o
    w_inner = np.zeros((k_outer, k_inner, len(lambdas), 4))
    w_outer = np.zeros((k_outer, len(lambdas), 4))
    for o in range(k_outer):
        out_tr = total - cube[o].sum(axis=0)
        for li, lam in enumerate(lambdas):
            w_outer[o, li] = solve(out_tr, lam)
        for j in range(k_inner):
            inn_tr = out_tr - (cube[:, j].sum(axis=0) - cube[o, j])
            for li, lam in enumerate(lambdas):
                w_inner[o, j, li] = solve(inn_tr, lam)
    wi_ref = ray.put(w_inner)
    wo_ref = ray.put(w_outer)
    nl = len(lambdas)

    def score_hist(t: pa.Table) -> pa.Table:
        wi, wo = ray.get(wi_ref), ray.get(wo_ref)
        fold, inner = _fold_cols(t, k_outer, k_inner)
        _f, x1, x2, x3, y = _train_xy(t, k_outer)
        n = len(x1)
        X = np.stack([np.ones(n), x1, x2, x3], axis=1).astype(np.float64)
        scopes, os_, ls, js, zqs, ys = [], [], [], [], [], []
        for o in range(k_outer):
            sel_out = fold == o
            sel_in = ~sel_out
            for li in range(nl):
                if sel_out.any():       # outer-val rows of fold o
                    z = X[sel_out] @ wo[o, li]
                    scopes.append(np.ones(int(sel_out.sum()), np.int8))
                    os_.append(np.full(int(sel_out.sum()), o))
                    ls.append(np.full(int(sel_out.sum()), li))
                    js.append(np.full(int(sel_out.sum()), -1))
                    zqs.append(round_half_away(z * _Z_Q, 0)
                               .astype(np.int64))
                    ys.append(y[sel_out])
                if sel_in.any():        # inner-val rows (j = own inner)
                    w = wi[o, inner[sel_in], li]      # (m, 4)
                    z = np.einsum("md,md->m", X[sel_in], w)
                    m = int(sel_in.sum())
                    scopes.append(np.zeros(m, np.int8))
                    os_.append(np.full(m, o))
                    ls.append(np.full(m, li))
                    js.append(inner[sel_in])
                    zqs.append(round_half_away(z * _Z_Q, 0)
                               .astype(np.int64))
                    ys.append(y[sel_in])
        return pa.table({
            "scope": pa.array(np.concatenate(scopes)),
            "o": pa.array(np.concatenate(os_).astype(np.int64)),
            "l": pa.array(np.concatenate(ls).astype(np.int64)),
            "j": pa.array(np.concatenate(js).astype(np.int64)),
            "zq": pa.array(np.concatenate(zqs)),
            "y": pa.array(np.concatenate(ys)),
        })

    hist = two_phase_agg(
        ds.map_batches(score_hist, batch_format="pyarrow"),
        ["scope", "o", "l", "j", "zq", "y"], [("y", "count")],
        ["scope", "o", "l", "j", "zq", "y", "n"],
    ).to_pandas()

    def _auc(h: pd.DataFrame) -> float:
        piv = h.pivot_table(index="zq", columns="y", values="n",
                            aggfunc="sum", fill_value=0)
        pos = piv[1].to_numpy(np.int64) if 1 in piv.columns else \
            np.zeros(len(piv), np.int64)
        neg = piv[0].to_numpy(np.int64) if 0 in piv.columns else \
            np.zeros(len(piv), np.int64)
        P, N = int(pos.sum()), int(neg.sum())
        if P == 0 or N == 0:
            return np.nan
        cnb = np.concatenate(([0], np.cumsum(neg)[:-1]))
        return float((pos * (2 * cnb + neg)).sum()) / (2.0 * P * N)

    rows = []
    folds_present = sorted(
        hist.loc[hist["scope"] == 1, "o"].unique().tolist())
    for o in folds_present:
        means = []
        for li in range(nl):
            sub = hist[(hist["scope"] == 0) & (hist["o"] == o)
                       & (hist["l"] == li)]
            aucs = [a for j in sorted(sub["j"].unique())
                    if not np.isnan(
                        a := _auc(sub[sub["j"] == j]))]
            means.append(float(np.sum(aucs) / len(aucs)) if aucs
                         else np.nan)
        best_li = int(np.nanargmax(means))  # first max = smaller lambda
        outer = hist[(hist["scope"] == 1) & (hist["o"] == o)
                     & (hist["l"] == best_li)]
        n_val = int(outer["n"].sum())
        rows.append({
            "fold": int(o),
            "best_lambda": float(lambdas[best_li]),
            "inner_auc": round_half_away(means[best_li], 6),
            "outer_auc": round_half_away(_auc(outer), 6),
            "n_val": n_val,
        })
    return pd.DataFrame(rows).sort_values("fold").reset_index(drop=True)


def misclassification_report(sf_dir: str) -> pd.DataFrame:
    """Per-source confusion-matrix accounting at the 0.5 operating
    point — the comprehensive-misclassification analysis of
    ``enhanced_tree_forest.py:905-1131`` (FP/FN breakdowns per vendor
    group) over the production scorer's labels, with truth = the
    deterministic language label.

    Scale shape: one streaming scan; the per-(source, cell) counts are
    the standard partial+final combiner (|sources| x 4 keys); derived
    precision/recall/F1 are driver-side arithmetic on exact integer
    counts, mirrored op-for-op by the SQL twin."""
    from ..functions.util import two_phase_agg

    ds = _read_docs(sf_dir, ["doc_id", "text", "lang", "source"])

    def cells(t: pa.Table) -> pa.Table:
        scored = Scorer()(t.select(["doc_id", "text"]))
        pred = pc.equal(scored["label"], "behavioral") \
            .to_numpy(zero_copy_only=False)
        truth = pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False)
        return pa.table({
            "source": t["source"],
            "tp": pa.array((pred & truth).astype(np.int64)),
            "fp": pa.array((pred & ~truth).astype(np.int64)),
            "fn": pa.array((~pred & truth).astype(np.int64)),
            "tn": pa.array((~pred & ~truth).astype(np.int64)),
        })

    out = two_phase_agg(
        ds.map_batches(cells, batch_format="pyarrow"), ["source"],
        [("tp", "sum"), ("fp", "sum"), ("fn", "sum"), ("tn", "sum")],
        ["source", "tp", "fp", "fn", "tn"],
    ).to_pandas()
    tp = out["tp"].to_numpy(np.float64)
    fp = out["fp"].to_numpy(np.float64)
    fn = out["fn"].to_numpy(np.float64)
    prec = tp / np.maximum(tp + fp, 1.0)
    rec = tp / np.maximum(tp + fn, 1.0)
    out["precision"] = round_half_away(prec, 6)
    out["recall"] = round_half_away(rec, 6)
    out["f1"] = round_half_away(
        2.0 * prec * rec / np.maximum(prec + rec, 1e-12), 6)
    return out.sort_values("source").reset_index(drop=True)


def misclassification_report_sql() -> str:
    """Generated twin: the same score expression (score_sql_exprs) and
    the same guarded-division order for precision/recall/F1."""
    sc = score_sql_exprs()
    prec = "(tp / greatest(tp + fp, 1.0))"
    rec = "(tp / greatest(tp + fn, 1.0))"
    return f"""
        WITH s AS (
            SELECT source,
                   ({sc['label']} = 'behavioral') AS pred,
                   (lang = 'en') AS truth
            FROM documents),
        c AS (SELECT source,
                     CAST(sum(CASE WHEN pred AND truth THEN 1 ELSE 0 END)
                          AS BIGINT) AS tp,
                     CAST(sum(CASE WHEN pred AND NOT truth THEN 1 ELSE 0 END)
                          AS BIGINT) AS fp,
                     CAST(sum(CASE WHEN NOT pred AND truth THEN 1 ELSE 0 END)
                          AS BIGINT) AS fn,
                     CAST(sum(CASE WHEN NOT pred AND NOT truth THEN 1 ELSE 0
                              END) AS BIGINT) AS tn
              FROM s GROUP BY source)
        SELECT source, tp, fp, fn, tn,
               round({prec}, 6) AS precision,
               round({rec}, 6) AS recall,
               round(2.0 * {prec} * {rec}
                     / greatest({prec} + {rec}, 1e-12), 6) AS f1
        FROM c ORDER BY source"""


def roc_points(sf_dir: str) -> pd.DataFrame:
    """ROC curve of the production scorer against the language truth —
    the per-threshold TPR/FPR table of the reference's
    model-evaluation analysis (``model_evaluation_analysis.py`` /
    ``nested_cv.py`` roc_curve plots): one row per DISTINCT score
    value, predicting positive at ``score >= threshold``.

    Scale shape: the (score, truth) histogram is the only exchange
    (scores are rounded to 4 decimals, so <= 10^4+1 distinct keys no
    matter the corpus size); cumulative TPR/FPR are a window over that
    bounded table."""
    from ..functions.util import two_phase_agg

    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])

    def hist(t: pa.Table) -> pa.Table:
        scored = Scorer()(t.select(["doc_id", "text"]))
        truth = pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False)
        return pa.table({
            "score": scored["score"],
            "pos": pa.array(truth.astype(np.int64)),
            "neg": pa.array((~truth).astype(np.int64)),
        })

    h = two_phase_agg(
        ds.map_batches(hist, batch_format="pyarrow"), ["score"],
        [("pos", "sum"), ("neg", "sum")], ["score", "pos", "neg"],
    ).to_pandas()
    if h.empty or "score" not in h.columns:
        return pd.DataFrame({
            "threshold": pd.Series([], dtype="float64"),
            "n_pos_ge": pd.Series([], dtype="int64"),
            "n_neg_ge": pd.Series([], dtype="int64"),
            "tpr": pd.Series([], dtype="float64"),
            "fpr": pd.Series([], dtype="float64")})
    h = h.sort_values("score", ascending=False)
    P = max(int(h["pos"].sum()), 1)
    N = max(int(h["neg"].sum()), 1)
    h["n_pos_ge"] = h["pos"].cumsum()
    h["n_neg_ge"] = h["neg"].cumsum()
    h["tpr"] = round_half_away(
        h["n_pos_ge"].to_numpy(np.float64) / float(P), 6)
    h["fpr"] = round_half_away(
        h["n_neg_ge"].to_numpy(np.float64) / float(N), 6)
    return h.rename(columns={"score": "threshold"})[
        ["threshold", "n_pos_ge", "n_neg_ge", "tpr", "fpr"]
    ].reset_index(drop=True)


def roc_points_sql() -> str:
    sc = score_sql_exprs()
    return f"""
        WITH s AS (
            SELECT round({sc['score']}, 4) AS score,
                   CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)
                       AS pos
            FROM documents),
        h AS (SELECT score, sum(pos) AS pos,
                     count(*) - sum(pos) AS neg
              FROM s GROUP BY score),
        t AS (SELECT greatest(sum(pos), 1) AS p, greatest(sum(neg), 1) AS n
              FROM h),
        c AS (SELECT score,
                     CAST(sum(pos) OVER (ORDER BY score DESC
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_pos_ge,
                     CAST(sum(neg) OVER (ORDER BY score DESC
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_neg_ge
              FROM h)
        SELECT score AS threshold, n_pos_ge, n_neg_ge,
               round(CAST(n_pos_ge AS DOUBLE) / CAST(t.p AS DOUBLE), 6)
                   AS tpr,
               round(CAST(n_neg_ge AS DOUBLE) / CAST(t.n AS DOUBLE), 6)
                   AS fpr
        FROM c, t ORDER BY threshold DESC"""


def calibration_bins(sf_dir: str, lo: float = 0.0, hi: float = 1.0,
                     n_bins: int = 10) -> pd.DataFrame:
    """Reliability-diagram table for the production scorer: fixed-width
    score bins over ``[lo, hi)`` with per-bin count, positive count,
    mean score and empirical positive rate — the calibration companion
    to :func:`roc_points` (the reference's evaluation notebooks plot
    exactly this pair).

    Exactness: scores are already rounded to 4 decimals, so binning
    happens in INTEGER ten-thousandths (``score4 // width4``) — no
    float floor at a bin boundary can disagree between engines; means
    and rates are single divisions of exact integer sums.

    Scale shape: same bounded exchange as roc_points — the per-bin
    integer histogram (<= n_bins rows per block)."""
    from ..functions.util import round_half_away, two_phase_agg

    lo4 = int(round(lo * 10000))
    hi4 = int(round(hi * 10000))
    w4 = max(1, (hi4 - lo4) // n_bins)

    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])

    def hist(t: pa.Table) -> pa.Table:
        scored = Scorer()(t.select(["doc_id", "text"]))
        s4 = round_half_away(
            scored["score"].to_numpy(zero_copy_only=False) * 10000.0,
            0).astype(np.int64)
        b = np.clip((s4 - lo4) // w4, 0, n_bins - 1)
        truth = pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False)
        return pa.table({
            "bin": pa.array(b),
            "n": pa.array(np.ones(len(b), np.int64)),
            "n_pos": pa.array(truth.astype(np.int64)),
            "s4": pa.array(s4),
        })

    h = two_phase_agg(
        ds.map_batches(hist, batch_format="pyarrow"), ["bin"],
        [("n", "sum"), ("n_pos", "sum"), ("s4", "sum")],
        ["bin", "n", "n_pos", "s4_sum"],
    ).to_pandas()
    if h.empty or "bin" not in h.columns:
        return pd.DataFrame({"bin": pd.Series([], dtype="int64"),
                             "bin_lo": pd.Series([], dtype="float64"),
                             "n": pd.Series([], dtype="int64"),
                             "n_pos": pd.Series([], dtype="int64"),
                             "mean_score": pd.Series([], dtype="float64"),
                             "frac_pos": pd.Series([], dtype="float64")})
    h = h.sort_values("bin")
    out = pd.DataFrame({
        "bin": h["bin"].astype("int64"),
        "bin_lo": round_half_away(
            (lo4 + h["bin"].to_numpy() * w4) / 10000.0, 4),
        "n": h["n"].astype("int64"),
        "n_pos": h["n_pos"].astype("int64"),
        "mean_score": round_half_away(
            h["s4_sum"].to_numpy(np.float64)
            / h["n"].to_numpy(np.float64) / 10000.0, 6),
        "frac_pos": round_half_away(
            h["n_pos"].to_numpy(np.float64)
            / h["n"].to_numpy(np.float64), 6),
    })
    return out.reset_index(drop=True)


def calibration_bins_sql(lo: float = 0.0, hi: float = 1.0,
                         n_bins: int = 10) -> str:
    sc = score_sql_exprs()
    lo4 = int(round(lo * 10000))
    hi4 = int(round(hi * 10000))
    w4 = max(1, (hi4 - lo4) // n_bins)
    return f"""
        WITH s AS (
            SELECT CAST(round(round({sc['score']}, 4) * 10000) AS BIGINT)
                       AS s4,
                   CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)
                       AS pos
            FROM documents),
        b AS (SELECT least(greatest((s4 - {lo4}) // {w4}, 0),
                           {n_bins - 1}) AS bin, s4, pos FROM s)
        SELECT bin, round(({lo4} + bin * {w4}) / 10000.0, 4) AS bin_lo,
               count(*) AS n, sum(pos) AS n_pos,
               round(CAST(sum(s4) AS DOUBLE) / count(*) / 10000.0, 6)
                   AS mean_score,
               round(CAST(sum(pos) AS DOUBLE) / count(*), 6) AS frac_pos
        FROM b GROUP BY bin ORDER BY bin"""


def pr_points(sf_dir: str) -> pd.DataFrame:
    """Precision-recall curve of the production scorer — the PR
    companion to :func:`roc_points` over the same bounded (score,
    truth) histogram: one row per distinct 4-decimal score,
    predicting positive at ``score >= threshold``; precision =
    TP/(TP+FP), recall = TP/P, both single divisions of exact integer
    cumulative sums (the class-imbalance view ``nested_cv.py``'s
    average-precision analysis reads)."""
    from ..functions.util import round_half_away, two_phase_agg

    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])

    def hist(t: pa.Table) -> pa.Table:
        scored = Scorer()(t.select(["doc_id", "text"]))
        truth = pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False)
        return pa.table({
            "score": scored["score"],
            "pos": pa.array(truth.astype(np.int64)),
            "neg": pa.array((~truth).astype(np.int64)),
        })

    h = two_phase_agg(
        ds.map_batches(hist, batch_format="pyarrow"), ["score"],
        [("pos", "sum"), ("neg", "sum")], ["score", "pos", "neg"],
    ).to_pandas()
    if h.empty or "score" not in h.columns:
        return pd.DataFrame({
            "threshold": pd.Series([], dtype="float64"),
            "n_tp": pd.Series([], dtype="int64"),
            "n_pred_pos": pd.Series([], dtype="int64"),
            "precision": pd.Series([], dtype="float64"),
            "recall": pd.Series([], dtype="float64")})
    h = h.sort_values("score", ascending=False)
    P = max(int(h["pos"].sum()), 1)
    tp = h["pos"].cumsum().to_numpy(np.int64)
    pp = (h["pos"] + h["neg"]).cumsum().to_numpy(np.int64)
    out = pd.DataFrame({
        "threshold": h["score"].to_numpy(),
        "n_tp": tp,
        "n_pred_pos": pp,
        "precision": round_half_away(
            tp.astype(np.float64) / np.maximum(pp, 1), 6),
        "recall": round_half_away(tp.astype(np.float64) / float(P), 6),
    })
    return out.reset_index(drop=True)


def pr_points_sql() -> str:
    sc = score_sql_exprs()
    return f"""
        WITH s AS (
            SELECT round({sc['score']}, 4) AS score,
                   CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)
                       AS pos
            FROM documents),
        h AS (SELECT score, sum(pos) AS pos,
                     count(*) - sum(pos) AS neg
              FROM s GROUP BY score),
        c AS (SELECT score AS threshold,
                     sum(pos) OVER (ORDER BY score DESC
                         ROWS UNBOUNDED PRECEDING) AS n_tp,
                     sum(pos + neg) OVER (ORDER BY score DESC
                         ROWS UNBOUNDED PRECEDING) AS n_pred_pos
              FROM h)
        SELECT threshold, CAST(n_tp AS BIGINT) AS n_tp,
               CAST(n_pred_pos AS BIGINT) AS n_pred_pos,
               round(CAST(n_tp AS DOUBLE)
                     / greatest(n_pred_pos, 1), 6) AS precision,
               round(CAST(n_tp AS DOUBLE)
                     / greatest((SELECT sum(pos) FROM s), 1), 6)
                   AS recall
        FROM c ORDER BY threshold DESC"""


def scorer_eval_summary(sf_dir: str) -> pd.DataFrame:
    """One-row scalar evaluation of the production scorer: ROC-AUC
    (trapezoid over the distinct-score steps) and average precision —
    the two headline numbers of the reference's model-evaluation
    analysis, computed with the INTEGER contract: AUC's numerator is
    sum(dFP x (TP_i + TP_prev)) over the threshold sweep (exact int64)
    with ONE division by 2PN; AP's numerator is
    sum(precision_e6 x dTP) where precision_e6 is the 6-decimal
    precision as an exact integer, with ONE division by 1e6 x P — so
    both engines sum identical integers in any order."""
    from ..functions.util import round_half_away, two_phase_agg

    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])

    def hist(t: pa.Table) -> pa.Table:
        scored = Scorer()(t.select(["doc_id", "text"]))
        truth = pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False)
        return pa.table({
            "score": scored["score"],
            "pos": pa.array(truth.astype(np.int64)),
            "neg": pa.array((~truth).astype(np.int64)),
        })

    h = two_phase_agg(
        ds.map_batches(hist, batch_format="pyarrow"), ["score"],
        [("pos", "sum"), ("neg", "sum")], ["score", "pos", "neg"],
    ).to_pandas()
    if h.empty or "score" not in h.columns:
        return pd.DataFrame({
            "auc": pd.Series([], dtype="float64"),
            "average_precision": pd.Series([], dtype="float64")})
    h = h.sort_values("score", ascending=False)
    P = max(int(h["pos"].sum()), 1)
    N = max(int(h["neg"].sum()), 1)
    tp = h["pos"].cumsum().to_numpy(np.int64)
    fp = h["neg"].cumsum().to_numpy(np.int64)
    dtp = np.diff(np.concatenate(([0], tp)))
    dfp = np.diff(np.concatenate(([0], fp)))
    tp_prev = tp - dtp
    auc_num = int((dfp * (tp + tp_prev)).sum())
    pp = tp + fp
    p6 = round_half_away(
        tp.astype(np.float64) / np.maximum(pp, 1), 6) * 1e6
    p6 = np.rint(p6).astype(np.int64)
    ap_num = int((p6 * dtp).sum())
    return pd.DataFrame({
        "auc": round_half_away(
            np.array([auc_num / (2.0 * P * N)]), 6),
        "average_precision": round_half_away(
            np.array([ap_num / (1e6 * P)]), 6),
    })


def scorer_eval_summary_sql() -> str:
    sc = score_sql_exprs()
    return f"""
        WITH s AS (
            SELECT round({sc['score']}, 4) AS score,
                   CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)
                       AS pos
            FROM documents),
        h AS (SELECT score, sum(pos) AS pos,
                     count(*) - sum(pos) AS neg
              FROM s GROUP BY score),
        c AS (SELECT score,
                     sum(pos) OVER w AS tp, sum(neg) OVER w AS fp,
                     pos AS dtp, neg AS dfp
              FROM h
              WINDOW w AS (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)),
        t AS (SELECT CAST(sum(dfp * (2 * tp - dtp)) AS BIGINT) AS auc_num,
                     CAST(sum(CAST(round(CAST(tp AS DOUBLE)
                              / greatest(tp + fp, 1) * 1000000)
                              AS BIGINT) * dtp) AS BIGINT) AS ap_num
              FROM c),
        pn AS (SELECT greatest(sum(pos), 1) AS p,
                      greatest(count(*) - sum(pos), 1) AS n FROM s)
        SELECT round(CAST(auc_num AS DOUBLE)
                     / (2.0 * (SELECT p FROM pn)
                        * (SELECT n FROM pn)), 6) AS auc,
               round(CAST(ap_num AS DOUBLE)
                     / (1000000.0 * (SELECT p FROM pn)), 6)
                   AS average_precision
        FROM t"""
