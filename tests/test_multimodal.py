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


def _wav_bytes(samples, framerate: int = 8000) -> bytes:
    """Real RIFF/WAV payload (mono, 16-bit PCM) via the stdlib codec."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_extract_features_real_audio_decode(spark):
    """The REAL kernel decodes WAV via the stdlib codec — no external
    library needed, so this path runs (not skips) in this container.
    RMS of silence is 0; RMS of a constant-amplitude square wave is
    amplitude/full-scale exactly."""
    from pedri_analysis_spark.operators.multimodal import extract_features

    silence = _wav_bytes([0] * 800)
    square = _wav_bytes([16384, -16384] * 400)  # RMS = 16384/32768 = 0.5
    media = spark.createDataFrame(
        [(0, "audio/wav", bytearray(silence), 0, 0), (1, "audio/wav", bytearray(square), 0, 0)],
        "media_id long, mime string, payload binary, width int, height int",
    )
    rows = {
        r.media_id: r for r in extract_features(media, dim=4, decode_stub=False).collect()
    }
    assert [float(x) for x in rows[0].feature] == [0.0, 0.0, 0.0, 0.0]
    assert [float(x) for x in rows[1].feature] == [0.5, 0.5, 0.5, 0.5]
    assert rows[1].n_bytes == len(square)


def test_extract_features_real_image_decode(spark):
    """Real image decode (Pillow import-gated): a half-black/half-white
    image yields a grayscale histogram with 0.5 mass in the first and
    last bins. Skips when Pillow is absent (the import gate's job)."""
    Image = pytest.importorskip("PIL.Image")
    import io as _io

    from pedri_analysis_spark.operators.multimodal import extract_features

    img = Image.new("L", (16, 16))
    img.paste(255, (0, 0, 16, 8))
    buf = _io.BytesIO()
    img.save(buf, format="PNG")
    media = spark.createDataFrame(
        [(7, "image/png", bytearray(buf.getvalue()), 16, 16)],
        "media_id long, mime string, payload binary, width int, height int",
    )
    (row,) = extract_features(media, dim=4, decode_stub=False).collect()
    feats = [float(x) for x in row.feature]
    assert feats[0] == 0.5 and feats[3] == 0.5 and feats[1] == 0.0 and feats[2] == 0.0


def test_extract_features_real_decode_image_gate_and_mime_policy(spark):
    """Without Pillow the image path must fail with the pointed import-gate
    message (not a bare ImportError deep in PIL); an unsupported mime must
    fail with the explicit decode-policy ValueError either way."""
    from pedri_analysis_spark.operators.multimodal import (
        extract_features,
        synthetic_media,
    )

    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False

    # synthetic payloads are not real PNGs: absent codec → gate message;
    # present codec → PIL's cannot-identify decode error
    media = synthetic_media(spark, 4).filter("mime = 'image/png'")
    with pytest.raises(Exception) as exc:
        extract_features(media, decode_stub=False).collect()
    if not has_pil:
        assert "Pillow is not installed" in str(exc.value)

    video = spark.createDataFrame(
        [(0, "video/mp4", bytearray(b"x"), 0, 0)],
        "media_id long, mime string, payload binary, width int, height int",
    )
    with pytest.raises(Exception, match="no real decoder for mime"):
        extract_features(video, decode_stub=False).collect()


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
    """Absent Pillow, the real resize kernel fails with the pointed
    import-gate message; with Pillow it decodes, so fake payloads raise a
    decode error instead."""
    from pedri_analysis_spark.operators.multimodal import resize_plan, synthetic_media

    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False

    with pytest.raises(Exception) as exc:
        resize_plan(synthetic_media(spark, 4), decode_stub=False).collect()
    if not has_pil:
        assert "Pillow is not installed" in str(exc.value)


def test_resize_plan_real_decode(spark):
    """Real resample (Pillow import-gated, skips when absent): decoded
    dimensions drive the fit rule and out_bytes is the TRUE RGB24 buffer
    size of the resampled image."""
    Image = pytest.importorskip("PIL.Image")
    import io as _io

    from pedri_analysis_spark.operators.multimodal import resize_plan

    def png(w, h):
        buf = _io.BytesIO()
        Image.new("RGB", (w, h), (10, 20, 30)).save(buf, format="PNG")
        return bytearray(buf.getvalue())

    media = spark.createDataFrame(
        # metadata width/height deliberately WRONG (0) — the real kernel
        # must use the decoded geometry, not the metadata
        [(1, "image/png", png(256, 64), 0, 0), (2, "image/png", png(64, 48), 0, 0)],
        "media_id long, mime string, payload binary, width int, height int",
    )
    got = {
        r.media_id: (r.in_w, r.in_h, r.out_w, r.out_h, r.out_bytes)
        for r in resize_plan(media, target=128, decode_stub=False).collect()
    }
    assert got[1] == (256, 64, 128, 32, 128 * 32 * 3)
    assert got[2] == (64, 48, 64, 48, 64 * 48 * 3)
