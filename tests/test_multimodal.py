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
