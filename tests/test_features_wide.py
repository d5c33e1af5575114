"""script_features_wide must reproduce the reference's derived features
(classify.py:126-305) on hand-computed scripts."""

import pyarrow as pa

import ray.data as rd

from visiblev8_crawler_ray.pipelines.features import script_features_wide


def _doc(doc_id, spans):
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": k, "text": t, "media_ref": "", "offset": i}
            for i, (k, t) in enumerate(spans)
        ],
    }


DOCS = [
    _doc("d1", [
        ("script", "g=static;p=-1;function a(){}"),
        ("get", "MouseEvent.clientX"),        # behavioral + coord + mouse
        ("get", "KeyboardEvent.key"),         # behavioral + keyboard
        ("get", "Navigator.userAgent"),       # fp navigator
        ("call", "HTMLCanvasElement.toDataURL"),  # fp canvas
        ("call", "Storage.setItem"),          # sink
        ("get", "Performance.now"),           # timing (neither b nor fp)
    ]),
    _doc("d2", [
        ("script", "g=static;p=-1;function b(){}"),
        ("get", "Screen.width"),              # fp only, no sink
    ]),
]


def _table():
    return pa.table({
        "doc_id": pa.array([d["doc_id"] for d in DOCS]),
        "spans": pa.array(
            [d["spans"] for d in DOCS],
            type=pa.list_(pa.struct(
                [("kind", pa.string()), ("text", pa.string()),
                 ("media_ref", pa.string()), ("offset", pa.int32())]))),
    })


def test_features_hand_computed(ray_session):
    out = script_features_wide(rd.from_arrow(_table())).to_pandas()
    out = out.set_index("doc_id")
    s1 = out.loc["d1"]
    # d1: behavioral=2 (mouse,kbd), fp=2 (nav,canvas), sink=1, accesses=6
    assert s1["behavioral_api_agg_count"] == 2
    assert s1["fp_api_agg_count"] == 2
    assert s1["has_aggregation"] == 1
    assert s1["has_both_aggregation_types"] == 1
    assert abs(s1["behavioral_focus_ratio"] - 0.5) < 1e-9
    assert s1["interaction_diversity"] == 2      # mouse + keyboard
    assert s1["has_multi_input_types"] == 0
    assert s1["tracks_coordinates"] == 1
    assert s1["tracks_timing"] == 1
    assert s1["sophistication_score"] == 2
    assert s1["uses_navigator_fp"] == 1
    assert s1["uses_canvas_fp"] == 1
    assert s1["uses_screen_fp"] == 0
    assert s1["fp_approach_diversity"] == 2
    assert s1["has_data_collection"] == 1
    assert s1["tracks_mouse"] == 1 and s1["tracks_touch"] == 0
    assert s1["complexity_tier"] == 1            # total_apis = 4 <= 5
    # collection_intensity = 6 accesses / 4 source apis
    assert abs(s1["collection_intensity"] - 1.5) < 1e-9

    s2 = out.loc["d2"]
    assert s2["has_aggregation"] == 0
    assert s2["fp_focus_ratio"] == 1.0
    assert s2["uses_screen_fp"] == 1
    assert s2["complexity_tier"] == 1
    assert s2["is_behavioral_heavy"] == 0 and s2["is_fp_heavy"] == 0


def test_artifact_scorer_matches_hand_computed():
    """T3 artifact path: npz (bias, weights, feature_names) loaded once,
    features resolved as batch COLUMNS, score equal to the hand-computed
    logistic — and ID columns pass through."""
    import numpy as np
    import pyarrow as pa

    from visiblev8_crawler_ray.pipelines.classify import Scorer, _artifact

    sc = Scorer(_artifact("script_wide_lr.npz"))
    batch = pa.table({
        "doc_id": ["d1", "d2"],
        "script_sha": ["s1", "s2"],
        "sophistication_score": pa.array([2.0, 0.0]),
        "interaction_diversity": pa.array([3, 0]),
        "fp_approach_diversity": pa.array([1, 0]),
        "has_aggregation": pa.array([1, 0]),
        "collection_method_diversity": pa.array([2, 0]),
    })
    out = sc(batch).to_pandas()
    z1 = -3.0 + 0.9 * 2.0 + 0.4 * 3 + 0.35 * 1 + 1.2 * 1 + 0.05 * 2
    want1 = round(1.0 / (1.0 + np.exp(-z1)), 4)
    assert out.loc[0, "score"] == want1
    assert out.loc[0, "label"] == ("behavioral" if want1 > 0.5 else "benign")
    z2 = -3.0
    want2 = round(1.0 / (1.0 + np.exp(-z2)), 4)
    assert out.loc[1, "score"] == want2 and out.loc[1, "label"] == "benign"
    assert list(out.columns) == ["doc_id", "script_sha", "score", "label",
                                 "confidence"]
