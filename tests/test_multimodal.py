"""Multimodal plumbing tests: the mapInPandas batch shape, schema, and
deterministic stub features are real even though the codec is stubbed."""

from __future__ import annotations

import pytest


def test_extract_features_stub(spark):
    from pedri_analysis_spark.operators.multimodal import (
        extract_features,
        synthetic_media,
    )

    media = synthetic_media(spark, 32)
    feats = extract_features(media, dim=8)
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 32
    assert feats.schema["feature"].dataType.simpleString() == "array<float>"
    assert all(len(r.feature) == 8 for r in rows.values())
    assert rows[0].n_bytes == len(b"payload-0")
    # deterministic: same payload -> same feature
    again = {r.media_id: r for r in extract_features(media, dim=8).collect()}
    assert [float(x) for x in rows[5].feature] == [float(x) for x in again[5].feature]


def test_extract_features_real_decode_raises(spark):
    from pedri_analysis_spark.operators.multimodal import (
        extract_features,
        synthetic_media,
    )
    from py4j.protocol import Py4JJavaError

    media = synthetic_media(spark, 4)
    with pytest.raises(Exception) as exc:
        extract_features(media, decode_stub=False).collect()
    assert "NotImplementedError" in str(exc.value) or "real media decode" in str(exc.value)


def test_feature_composes_with_similarity(spark):
    """The extracted features feed the similarity operators directly."""
    from pedri_analysis_spark.operators.multimodal import (
        extract_features,
        synthetic_media,
    )
    from pedri_analysis_spark.operators.similarity import cosine_topk

    # dim > len("payload-x") so the id digits land in the feature and
    # features are distinct per id
    feats = extract_features(synthetic_media(spark, 16), dim=12).withColumnRenamed(
        "feature", "embedding"
    ).withColumnRenamed("media_id", "vec_id")
    query = feats.filter("vec_id = 3")
    top = cosine_topk(feats, query, k=3).collect()
    assert len(top) == 3
    assert top[0].vec_id == 3 and top[0].sim == 1.0  # self-similarity


def test_resize_plan_aspect_fit_rules(spark):
    """Pin the stub fit rule: never upscale; longer edge -> target; short
    edge floor-scales but never hits 0; ties give a square."""
    from pedri_analysis_spark.operators.multimodal import resize_plan

    rows = [
        (1, "image/png", 64, 48),      # already inside the box: untouched
        (2, "image/png", 256, 64),     # wide: 128 x 32
        (3, "image/png", 64, 256),     # tall: 32 x 128
        (4, "image/png", 300, 300),    # square tie: 128 x 128
        (5, "image/png", 10000, 2),    # extreme aspect: short edge clamps to 1
        (6, "image/png", 128, 128),    # exactly at target: untouched
    ]
    media = spark.createDataFrame(
        rows, "media_id long, mime string, width int, height int"
    )
    got = {
        r["media_id"]: (r["out_w"], r["out_h"], r["out_bytes"])
        for r in resize_plan(media, target=128).collect()
    }
    assert got[1] == (64, 48, 64 * 48 * 3)
    assert got[2] == (128, 32, 128 * 32 * 3)
    assert got[3] == (32, 128, 32 * 128 * 3)
    assert got[4] == (128, 128, 128 * 128 * 3)
    assert got[5] == (128, 1, 128 * 3)
    assert got[6] == (128, 128, 128 * 128 * 3)


def test_resize_plan_real_decode_path_gated(spark):
    from pedri_analysis_spark.operators.multimodal import resize_plan, synthetic_media

    import pytest as _pytest

    with _pytest.raises(Exception, match="NotImplementedError|decode_stub"):
        resize_plan(synthetic_media(spark, 4), decode_stub=False).collect()
