"""Vendor-agnostic per-script feature extractor (M9).

Ports the reference classifier's ~35 behavioral/fingerprinting features
(``script_classification/vendor_issues/no_split/classify.py:126-305``)
onto the engine's span data: usage rows explode from the interleaved
docs, every row gets vectorized family flags (arrow ``is_in`` /
``match_substring`` kernels), one arrow group_by per script sums the
flags, and the derived ratios/tiers are computed in numpy over the
aggregate columns — no per-script Python anywhere.

Family semantics over FEATURE_VOCAB (synth.py): behavioral = input-event
APIs (the reference's ``behavioral_source_apis``); fingerprinting =
navigator/screen/canvas/audio probes (``fingerprinting_source_apis``);
sinks = storage/network egress APIs standing in for the reference's
BBSA ``apis_going_to_sink`` — a script "aggregates" when source APIs
co-occur with a sink in the same script.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.util import round_half_away
from ..stages.parse import explode_usage_batch

BEHAVIORAL_PREFIXES = ("MouseEvent.", "KeyboardEvent.", "TouchEvent.",
                       "Element.addEventListener", "EventTarget.dispatchEvent")
FP_PREFIXES = ("Navigator.", "Screen.", "CanvasRenderingContext2D.",
               "HTMLCanvasElement.", "AudioContext.",
               "WebGLRenderingContext.", "Window.navigator")
SINK_APIS = ("Storage.setItem", "XMLHttpRequest.open",
             "XMLHttpRequest.send", "Document.cookie")

# event-family buckets for interaction_diversity
_EVENT_FAMILIES = (
    ("mouse", "MouseEvent"),
    ("keyboard", "KeyboardEvent"),
    ("touch", "TouchEvent"),
)
_COORD_MARKS = ("clientX", "clientY", "screenX", "screenY", "pageX", "pageY")
_TIMING_APIS = ("Performance.now", "Date.getTime")

FEATURE_COLUMNS = [
    "max_api_aggregation_score", "behavioral_api_agg_count",
    "fp_api_agg_count", "total_aggregation_count", "has_aggregation",
    "behavioral_agg_ratio", "fp_agg_ratio", "has_behavioral_aggregation",
    "has_fp_aggregation", "has_both_aggregation_types",
    "behavioral_focus_ratio", "fp_focus_ratio",
    "interaction_diversity", "has_multi_input_types",
    "tracks_coordinates", "tracks_timing", "tracks_device_motion",
    "sophistication_score",
    "uses_navigator_fp", "uses_screen_fp", "uses_canvas_fp", "uses_audio_fp",
    "fp_approach_diversity",
    "collection_intensity", "behavioral_access_ratio",
    "has_data_collection", "collection_method_diversity",
    "tracks_mouse", "tracks_keyboard", "tracks_touch", "tracks_pointer",
    "complexity_tier",
    "is_behavioral_heavy", "is_fp_heavy", "is_balanced_tracker",
]


def _starts_any(feat: pa.Array, prefixes: tuple[str, ...]) -> pa.Array:
    out = None
    for p in prefixes:
        m = pc.starts_with(feat, p)
        out = m if out is None else pc.or_(out, m)
    return out


def _flags_batch(batch: pa.Table) -> pa.Table:
    """usage rows -> per-(doc, script) flag sums (the per-batch combiner)."""
    u = explode_usage_batch(batch)
    feat = u["feature"]
    if isinstance(feat, pa.ChunkedArray):
        feat = feat.combine_chunks()
    cols = {
        "behavioral": _starts_any(feat, BEHAVIORAL_PREFIXES),
        "fp": _starts_any(feat, FP_PREFIXES),
        "sink": pc.is_in(feat, value_set=pa.array(list(SINK_APIS))),
        "coord": _starts_any(feat, tuple(
            f"MouseEvent.{c}" for c in ("clientX", "clientY"))),
        "timing": pc.is_in(feat, value_set=pa.array(list(_TIMING_APIS))),
        "navigator": pc.or_(pc.starts_with(feat, "Navigator."),
                            pc.equal(feat, "Window.navigator")),
        "screen": pc.starts_with(feat, "Screen."),
        "canvas": pc.or_(
            pc.or_(pc.starts_with(feat, "CanvasRenderingContext2D."),
                   pc.starts_with(feat, "HTMLCanvasElement.")),
            pc.starts_with(feat, "WebGLRenderingContext.")),
        "audio": pc.starts_with(feat, "AudioContext."),
        "mouse": pc.starts_with(feat, "MouseEvent"),
        "keyboard": pc.starts_with(feat, "KeyboardEvent"),
        "touch": pc.starts_with(feat, "TouchEvent"),
    }
    t = pa.table({"doc_id": u["doc_id"], "script_sha": u["script_sha"],
                  "one": pa.array(np.ones(u.num_rows, dtype=np.int64)),
                  **{k: pc.cast(v, pa.int64()) for k, v in cols.items()}})
    g = t.group_by(["doc_id", "script_sha"]).aggregate(
        [(c, "sum") for c in ("one", *cols)])
    return g.rename_columns(["doc_id", "script_sha", "n_access",
                             *cols.keys()])


def _derive(df: pd.DataFrame) -> pd.DataFrame:
    """Aggregate columns -> the reference's derived feature set, all
    numpy-vectorized (classify.py:146-283 row loop re-expressed)."""
    b = df["behavioral"].to_numpy(dtype=np.int64)      # behavioral accesses
    f = df["fp"].to_numpy(dtype=np.int64)              # fp accesses
    sinks = df["sink"].to_numpy(dtype=np.int64)
    n_access = df["n_access"].to_numpy(dtype=np.int64)
    total_apis = b + f
    out = pd.DataFrame({"doc_id": df["doc_id"],
                        "script_sha": df["script_sha"]})

    # aggregation: source APIs co-occurring with a sink in the script
    has_sink = sinks > 0
    b_agg = np.where(has_sink, b, 0)
    f_agg = np.where(has_sink, f, 0)
    total_agg = b_agg + f_agg
    out["max_api_aggregation_score"] = np.where(has_sink, total_apis, 0)
    out["behavioral_api_agg_count"] = b_agg
    out["fp_api_agg_count"] = f_agg
    out["total_aggregation_count"] = total_agg
    out["has_aggregation"] = (out["max_api_aggregation_score"] > 0).astype(int)
    safe_agg = np.maximum(total_agg, 1)
    out["behavioral_agg_ratio"] = np.where(total_agg > 0, b_agg / safe_agg, 0.0)
    out["fp_agg_ratio"] = np.where(total_agg > 0, f_agg / safe_agg, 0.0)
    out["has_behavioral_aggregation"] = (b_agg > 0).astype(int)
    out["has_fp_aggregation"] = (f_agg > 0).astype(int)
    out["has_both_aggregation_types"] = ((b_agg > 0) & (f_agg > 0)).astype(int)

    # focus ratios
    safe_total = np.maximum(total_apis, 1)
    out["behavioral_focus_ratio"] = np.where(total_apis > 0, b / safe_total, 0.0)
    out["fp_focus_ratio"] = np.where(total_apis > 0, f / safe_total, 0.0)

    # interaction diversity over event families
    fams = [(df[k].to_numpy(dtype=np.int64) > 0).astype(int)
            for k, _ in _EVENT_FAMILIES]
    diversity = np.sum(fams, axis=0)
    out["interaction_diversity"] = diversity
    out["has_multi_input_types"] = (diversity >= 3).astype(int)

    # sophistication
    out["tracks_coordinates"] = (df["coord"].to_numpy() > 0).astype(int)
    out["tracks_timing"] = (df["timing"].to_numpy() > 0).astype(int)
    out["tracks_device_motion"] = 0  # no DeviceMotion APIs in the vocab
    out["sophistication_score"] = (out["tracks_coordinates"]
                                   + out["tracks_timing"]
                                   + out["tracks_device_motion"])

    # fingerprinting categories
    for col, src in (("uses_navigator_fp", "navigator"),
                     ("uses_screen_fp", "screen"),
                     ("uses_canvas_fp", "canvas"),
                     ("uses_audio_fp", "audio")):
        out[col] = (df[src].to_numpy() > 0).astype(int)
    out["fp_approach_diversity"] = (out["uses_navigator_fp"]
                                    + out["uses_screen_fp"]
                                    + out["uses_canvas_fp"]
                                    + out["uses_audio_fp"])

    # access intensity
    out["collection_intensity"] = n_access / np.maximum(total_apis, 1)
    out["behavioral_access_ratio"] = np.where(
        n_access > 0, b / np.maximum(n_access, 1), 0.0)

    # data flow
    out["has_data_collection"] = (sinks > 0).astype(int)
    out["collection_method_diversity"] = np.minimum(sinks, len(SINK_APIS))

    # binary tracking capabilities
    out["tracks_mouse"] = (df["mouse"].to_numpy() > 0).astype(int)
    out["tracks_keyboard"] = (df["keyboard"].to_numpy() > 0).astype(int)
    out["tracks_touch"] = (df["touch"].to_numpy() > 0).astype(int)
    out["tracks_pointer"] = 0  # no PointerEvent APIs in the vocab

    # complexity tier
    out["complexity_tier"] = np.select(
        [total_apis == 0, total_apis <= 5, total_apis <= 15],
        [0, 1, 2], default=3)

    # balance metrics
    out["is_behavioral_heavy"] = ((b > f) & (b > 5)).astype(int)
    out["is_fp_heavy"] = ((f > b) & (f > 5)).astype(int)
    out["is_balanced_tracker"] = ((np.abs(b - f) <= 3)
                                  & (total_apis > 5)).astype(int)
    for c in ("behavioral_agg_ratio", "fp_agg_ratio",
              "behavioral_focus_ratio", "fp_focus_ratio",
              "collection_intensity", "behavioral_access_ratio"):
        # half-away-from-zero, matching DuckDB round() in the SQL twin
        out[c] = round_half_away(out[c].to_numpy(dtype=np.float64), 6)
    return out


def _sql_starts_any(col: str, prefixes: tuple[str, ...]) -> str:
    return "(" + " OR ".join(
        f"starts_with({col}, '{p}')" for p in prefixes) + ")"


def features_wide_sql(sp: str, hdr: str, usage_kinds: str) -> str:
    """DuckDB twin of ``script_features_wide``, GENERATED from the same
    family constants so predicates cannot drift.  ``sp`` is the
    exploded-spans CTE body (doc_id, kind, text, "offset"), ``hdr`` the
    quoted script-header regex, ``usage_kinds`` the SQL IN-list.

    Mirrors the engine exactly: usage rows bind to the nearest
    preceding script span (forward fill), rows before any script keep
    script_sha = '' (LEFT JOIN), flags sum per (doc_id, script_sha),
    ratios round half-away at 6 (DuckDB round == round_half_away)."""
    f = "feature"
    flags = {
        "b": _sql_starts_any(f, BEHAVIORAL_PREFIXES),
        "f": _sql_starts_any(f, FP_PREFIXES),
        "sinks": f"{f} IN ({', '.join(repr(a) for a in SINK_APIS)})",
        "coord": _sql_starts_any(f, tuple(
            f"MouseEvent.{c}" for c in ("clientX", "clientY"))),
        "timing": f"{f} IN ({', '.join(repr(a) for a in _TIMING_APIS)})",
        "nav": f"(starts_with({f}, 'Navigator.') OR {f} = 'Window.navigator')",
        "scr": f"starts_with({f}, 'Screen.')",
        "canvas": _sql_starts_any(f, ("CanvasRenderingContext2D.",
                                      "HTMLCanvasElement.",
                                      "WebGLRenderingContext.")),
        "audio": f"starts_with({f}, 'AudioContext.')",
        "mouse": f"starts_with({f}, 'MouseEvent')",
        "kb": f"starts_with({f}, 'KeyboardEvent')",
        "touch": f"starts_with({f}, 'TouchEvent')",
    }
    sums = ",\n                   ".join(
        f"sum(CASE WHEN {expr} THEN 1 ELSE 0 END) AS {name}"
        for name, expr in flags.items())
    total = "(a.b + a.f)"
    b_agg = "(CASE WHEN a.sinks > 0 THEN a.b ELSE 0 END)"
    f_agg = "(CASE WHEN a.sinks > 0 THEN a.f ELSE 0 END)"
    t_agg = f"({b_agg} + {f_agg})"
    def bigint(expr: str, name: str) -> str:
        return f"CAST({expr} AS BIGINT) AS {name}"
    def flag(expr: str, name: str) -> str:
        return bigint(f"CASE WHEN {expr} THEN 1 ELSE 0 END", name)
    def ratio(num: str, den: str, guard: str, name: str) -> str:
        return (f"round(CASE WHEN {guard} > 0 THEN CAST({num} AS DOUBLE)"
                f" / greatest({den}, 1) ELSE 0.0 END, 6) AS {name}")
    diversity = ("(CASE WHEN a.mouse > 0 THEN 1 ELSE 0 END"
                 " + CASE WHEN a.kb > 0 THEN 1 ELSE 0 END"
                 " + CASE WHEN a.touch > 0 THEN 1 ELSE 0 END)")
    soph = ("(CASE WHEN a.coord > 0 THEN 1 ELSE 0 END"
            " + CASE WHEN a.timing > 0 THEN 1 ELSE 0 END)")
    fp_div = ("(CASE WHEN a.nav > 0 THEN 1 ELSE 0 END"
              " + CASE WHEN a.scr > 0 THEN 1 ELSE 0 END"
              " + CASE WHEN a.canvas > 0 THEN 1 ELSE 0 END"
              " + CASE WHEN a.audio > 0 THEN 1 ELSE 0 END)")
    derived = ",\n                   ".join([
        bigint(f"CASE WHEN a.sinks > 0 THEN {total} ELSE 0 END",
               "max_api_aggregation_score"),
        bigint(b_agg, "behavioral_api_agg_count"),
        bigint(f_agg, "fp_api_agg_count"),
        bigint(t_agg, "total_aggregation_count"),
        flag(f"a.sinks > 0 AND {total} > 0", "has_aggregation"),
        ratio(b_agg, t_agg, t_agg, "behavioral_agg_ratio"),
        ratio(f_agg, t_agg, t_agg, "fp_agg_ratio"),
        flag(f"{b_agg} > 0", "has_behavioral_aggregation"),
        flag(f"{f_agg} > 0", "has_fp_aggregation"),
        flag(f"{b_agg} > 0 AND {f_agg} > 0", "has_both_aggregation_types"),
        ratio("a.b", total, total, "behavioral_focus_ratio"),
        ratio("a.f", total, total, "fp_focus_ratio"),
        bigint(diversity, "interaction_diversity"),
        flag(f"{diversity} >= 3", "has_multi_input_types"),
        flag("a.coord > 0", "tracks_coordinates"),
        flag("a.timing > 0", "tracks_timing"),
        bigint("0", "tracks_device_motion"),
        bigint(soph, "sophistication_score"),
        flag("a.nav > 0", "uses_navigator_fp"),
        flag("a.scr > 0", "uses_screen_fp"),
        flag("a.canvas > 0", "uses_canvas_fp"),
        flag("a.audio > 0", "uses_audio_fp"),
        bigint(fp_div, "fp_approach_diversity"),
        (f"round(CAST(a.n_access AS DOUBLE) / greatest({total}, 1), 6)"
         " AS collection_intensity"),
        ratio("a.b", "a.n_access", "a.n_access", "behavioral_access_ratio"),
        flag("a.sinks > 0", "has_data_collection"),
        bigint(f"least(a.sinks, {len(SINK_APIS)})",
               "collection_method_diversity"),
        flag("a.mouse > 0", "tracks_mouse"),
        flag("a.kb > 0", "tracks_keyboard"),
        flag("a.touch > 0", "tracks_touch"),
        bigint("0", "tracks_pointer"),
        bigint(f"CASE WHEN {total} = 0 THEN 0 WHEN {total} <= 5 THEN 1 "
               f"WHEN {total} <= 15 THEN 2 ELSE 3 END", "complexity_tier"),
        flag("a.b > a.f AND a.b > 5", "is_behavioral_heavy"),
        flag("a.f > a.b AND a.f > 5", "is_fp_heavy"),
        flag(f"abs(a.b - a.f) <= 3 AND {total} > 5", "is_balanced_tracker"),
    ])
    return f"""
            WITH sp AS {sp},
            scripts AS (
                SELECT doc_id, "offset",
                       substr(sha256(regexp_replace(text, {hdr}, '')),
                              1, 16) AS script_sha
                FROM sp WHERE kind = 'script'),
            bound AS (
                SELECT doc_id, "offset", kind, text,
                       max(CASE WHEN kind = 'script' THEN "offset" END)
                           OVER (PARTITION BY doc_id ORDER BY "offset"
                                 ROWS UNBOUNDED PRECEDING) AS script_off
                FROM sp),
            u AS (
                SELECT bo.doc_id, coalesce(s.script_sha, '') AS script_sha,
                       regexp_replace(bo.text, ':.*$', '') AS feature
                FROM bound bo LEFT JOIN scripts s
                  ON s.doc_id = bo.doc_id AND s."offset" = bo.script_off
                WHERE bo.kind IN {usage_kinds}),
            agg AS (
                SELECT doc_id, script_sha, count(*) AS n_access,
                   {sums}
                FROM u GROUP BY doc_id, script_sha)
            SELECT a.doc_id, a.script_sha,
                   {derived}
            FROM agg a"""


def script_features_wide(docs: rd.Dataset) -> rd.Dataset:
    """Per-script wide feature table (doc_id, script_sha, 35 features).

    Combiner shape: per-batch flag sums (one arrow group_by per batch)
    -> global per-script sum groupby -> vectorized derivation.  Each
    (doc, script) pair lives in one batch (docs are rows), so the
    per-batch group_by is already exact; the map_groups pass only
    derives.
    """
    from ..functions.util import arrow_from_pandas

    flags = docs.map_batches(_flags_batch, batch_format="pyarrow")
    return flags.map_batches(
        lambda t: arrow_from_pandas(_derive(t.to_pandas())),
        batch_format="pyarrow",
    )
