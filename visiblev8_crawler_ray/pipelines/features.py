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
        out[c] = np.round(out[c].to_numpy(dtype=np.float64), 6)
    return out


def script_features_wide(docs: rd.Dataset) -> rd.Dataset:
    """Per-script wide feature table (doc_id, script_sha, 35 features).

    Combiner shape: per-batch flag sums (one arrow group_by per batch)
    -> global per-script sum groupby -> vectorized derivation.  Each
    (doc, script) pair lives in one batch (docs are rows), so the
    per-batch group_by is already exact; the map_groups pass only
    derives.
    """
    flags = docs.map_batches(_flags_batch, batch_format="pyarrow")
    return flags.map_batches(
        lambda t: pa.Table.from_pandas(_derive(t.to_pandas()),
                                       preserve_index=False),
        batch_format="pyarrow",
    )
