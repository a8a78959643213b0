"""Structured Streaming smoke: the SAME windowed-aggregation builders run
under readStream (file source → memory sink) and must produce the same
rows the batch plan produces. Also exercises the watermarked stream-stream
interval join (the counter-press streaming analogue, SURVEY J5/§2.8)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    # The streaming file source REQUIRES an explicit schema, and
    # EVENTS_TABLE_SCHEMA declares ts as TimestampNTZ — valid only for the
    # microsecond parquet encoding. A nanos regeneration would fail these
    # reads with a generic parquet error, so probe the footer and fail with
    # a pointed message instead (ADVICE r5 / schema.py:105 note).
    from pedri_analysis_spark.sources.tables import parquet_ts_unit

    src = os.path.join(SF_DIR, "events.parquet")
    unit = parquet_ts_unit(src, "ts")
    assert unit == "us", (
        f"events.ts on-disk encoding is {unit!r}, but EVENTS_TABLE_SCHEMA "
        "declares TimestampNTZ (valid only for 'us'). The testdata was "
        "regenerated with a different precision: flip schema.EVENTS_TABLE_SCHEMA "
        "ts to LongType (nanosAsLong path) or regenerate as timestamp[us]."
    )
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(src, d / "events.parquet")
    return str(d)


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_streaming_tumbling_equals_batch(spark, stream_dir):
    from pedri_analysis_spark.schema import EVENTS_TABLE_SCHEMA
    from pedri_analysis_spark.sources.tables import ensure_session_conf
    from pedri_analysis_spark.streaming.windows import (
        tumbling_counts,
        with_event_time,
        with_watermark,
    )

    ensure_session_conf(spark)
    batch_df = with_event_time(spark.read.schema(EVENTS_TABLE_SCHEMA).parquet(stream_dir))
    expected = _canon(tumbling_counts(batch_df).collect())

    stream = (
        spark.readStream.schema(EVENTS_TABLE_SCHEMA).parquet(stream_dir)
    )
    agg = tumbling_counts(with_watermark(with_event_time(stream), "1 hour"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = _canon(spark.sql("SELECT * FROM tumbling_out").collect())
    finally:
        q.stop()
    assert got == expected
    assert len(got) > 0


def test_streaming_interval_join(spark, stream_dir):
    from pedri_analysis_spark.schema import EVENTS_TABLE_SCHEMA
    from pedri_analysis_spark.streaming.windows import with_event_time

    def side(df, kind, alias):
        return (
            with_event_time(df)
            .filter(F.col("event_type") == kind)
            .select(
                F.col("event_id").alias(f"{alias}_id"),
                F.col("user_id").alias("user_id"),
                F.col("event_time").alias(f"{alias}_time"),
            )
        )

    # batch expectation using identical logic
    b = spark.read.schema(EVENTS_TABLE_SCHEMA).parquet(stream_dir)
    b_err, b_clk = side(b, "error", "err"), side(b, "click", "clk").withColumnRenamed("user_id", "c_user")
    expected = _canon(
        b_err.join(
            b_clk,
            (b_err.user_id == b_clk.c_user)
            & (b_clk.clk_time >= b_err.err_time)
            & (b_clk.clk_time <= b_err.err_time + F.expr("INTERVAL 3600 SECONDS")),
        )
        .select("err_id", "clk_id")
        .collect()
    )

    s = spark.readStream.schema(EVENTS_TABLE_SCHEMA).parquet(stream_dir)
    errs = side(s, "error", "err").withWatermark("err_time", "2 hours")
    clks = (
        side(s, "click", "clk")
        .withColumnRenamed("user_id", "c_user")
        .withWatermark("clk_time", "2 hours")
    )
    joined = errs.join(
        clks,
        (errs.user_id == clks.c_user)
        & (clks.clk_time >= errs.err_time)
        & (clks.clk_time <= errs.err_time + F.expr("INTERVAL 3600 SECONDS")),
    )
    q = (
        joined.select("err_id", "clk_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = _canon(spark.sql("SELECT * FROM ij_out").collect())
    finally:
        q.stop()
    assert got == expected
    assert len(got) > 0


def test_streaming_dedup_within_watermark_equals_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark through a real readStream must keep
    exactly the rows plain dropDuplicates keeps in batch."""
    from pedri_analysis_spark.schema import EVENTS_TABLE_SCHEMA
    from pedri_analysis_spark.sources.tables import ensure_session_conf
    from pedri_analysis_spark.streaming.windows import (
        dedup_within_watermark,
        with_event_time,
        with_watermark,
    )

    ensure_session_conf(spark)
    d = str(tmp_path / "replayed")
    base = spark.read.schema(EVENTS_TABLE_SCHEMA).parquet(
        os.path.join(SF_DIR, "events.parquet")
    )
    base.unionByName(base.filter(F.col("event_id") % 13 == 0)).write.parquet(d)

    batch = with_event_time(spark.read.schema(EVENTS_TABLE_SCHEMA).parquet(d))
    expected = _canon(
        dedup_within_watermark(batch).groupBy("event_type").count().collect()
    )

    stream = with_watermark(
        with_event_time(spark.readStream.schema(EVENTS_TABLE_SCHEMA).parquet(d)),
        "1 hour",
    )
    deduped = dedup_within_watermark(stream).select("event_id", "event_type")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = _canon(
            spark.sql(
                "SELECT event_type, count(*) FROM dedup_out GROUP BY event_type"
            ).collect()
        )
    finally:
        q.stop()
    assert got == expected and len(got) > 0


def test_stream_static_enrichment_join(spark, stream_dir):
    """Stream-static join: a streaming event feed enriched against a
    static (broadcastable) dimension must produce exactly the batch
    join's rows. No watermark is required — the static side is not
    stateful; at scale the dim broadcasts to every micro-batch."""
    from pedri_analysis_spark.schema import EVENTS_TABLE_SCHEMA

    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("error", "ops")],
        "event_type string, category string",
    )

    batch = (
        spark.read.schema(EVENTS_TABLE_SCHEMA)
        .parquet(stream_dir)
        .join(F.broadcast(dim), "event_type")
        .groupBy("category")
        .count()
    )
    expected = _canon(batch.collect())

    stream = (
        spark.readStream.schema(EVENTS_TABLE_SCHEMA)
        .parquet(stream_dir)
        .join(F.broadcast(dim), "event_type")
        .select("event_id", "category")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = _canon(
            spark.sql(
                "SELECT category, count(*) FROM enrich_out GROUP BY category"
            ).collect()
        )
    finally:
        q.stop()
    assert got == expected and len(got) > 0


def test_streaming_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Stop/restart recovery: a windowed aggregation restarted from its
    checkpoint must not double-count data processed before the stop —
    the run resumes from committed offsets and the final counts equal
    one batch pass over everything."""
    import shutil

    from pedri_analysis_spark.schema import EVENTS_TABLE_SCHEMA
    from pedri_analysis_spark.sources.tables import ensure_session_conf
    from pedri_analysis_spark.streaming.windows import with_event_time

    ensure_session_conf(spark)
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    base = spark.read.schema(EVENTS_TABLE_SCHEMA).parquet(
        os.path.join(SF_DIR, "events.parquet")
    )
    first = base.filter(F.col("event_id") % 2 == 0)
    second = base.filter(F.col("event_id") % 2 == 1)
    first.write.parquet(str(src / "batch1"))

    def start():
        stream = with_event_time(
            spark.readStream.schema(EVENTS_TABLE_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        ).select("event_id", "event_type")
        return (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    second.write.parquet(str(src / "batch2"))
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out)
    assert got.count() == base.count()  # nothing dropped, nothing doubled
    assert got.select("event_id").distinct().count() == base.count()


def test_native_session_window_matches_lag_gap_formulation(spark, stream_dir):
    """Spark's native session_window (the streaming-scale path: merging
    keyed state, watermark eviction) must produce the same sessions as
    the batch lag-gap + running-sum formulation the oracle checks —
    compared as (user_id, session_start, n_events) sets, batch-native
    first, then the same native plan through a real readStream."""
    from pedri_analysis_spark.schema import EVENTS_TABLE_SCHEMA
    from pedri_analysis_spark.sources.tables import ensure_session_conf
    from pedri_analysis_spark.streaming.windows import (
        sessionize_batch,
        with_event_time,
    )

    ensure_session_conf(spark)
    gap_min = 30
    base = with_event_time(
        spark.read.schema(EVENTS_TABLE_SCHEMA).parquet(stream_dir)
    ).withColumn("ts_us", F.unix_micros(F.col("event_time")))

    lag_gap = {
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in sessionize_batch(base, gap_minutes=gap_min).collect()
    }

    def native(df):
        return df.groupBy(
            F.session_window("event_time", f"{gap_min} minutes"), "user_id"
        ).agg(F.count(F.lit(1)).alias("n_events"))

    batch_native = {
        (r["user_id"], r["session_window"]["start"], r["n_events"])
        for r in native(base).withColumn(
            "session_window",
            F.struct(
                F.unix_micros("session_window.start").alias("start"),
                F.unix_micros("session_window.end").alias("end"),
            ),
        ).collect()
    }
    got_batch = {(u, s, n) for (u, s, n) in batch_native}
    assert got_batch == lag_gap and len(lag_gap) > 0

    stream = with_event_time(
        spark.readStream.schema(EVENTS_TABLE_SCHEMA).parquet(stream_dir)
    ).withWatermark("event_time", "1 hour")
    q = (
        native(stream)
        .select(
            F.unix_micros("session_window.start").alias("start"),
            "user_id",
            "n_events",
        )
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got_stream = {
            (r["user_id"], r["start"], r["n_events"])
            for r in spark.sql("SELECT * FROM sess_out").collect()
        }
    finally:
        q.stop()
    assert got_stream == lag_gap


def test_foreach_batch_idempotent_sink_exactly_once(spark, tmp_path):
    """The foreachBatch parquet sink commits each batch once: replaying
    the same batch_id (Spark's at-least-once failure contract) is a
    no-op, and the committed output equals the batch input exactly."""
    import shutil as _shutil

    from pedri_analysis_spark.schema import EVENTS_TABLE_SCHEMA
    from pedri_analysis_spark.sources.tables import ensure_session_conf
    from pedri_analysis_spark.streaming.windows import (
        foreach_batch_idempotent_parquet,
    )

    ensure_session_conf(spark)
    src = tmp_path / "src"
    src.mkdir()
    _shutil.copy("/root/testdata/sf0.001/events.parquet", src / "events.parquet")
    out = tmp_path / "out"
    out.mkdir()

    writer = foreach_batch_idempotent_parquet(str(out))
    stream = spark.readStream.schema(EVENTS_TABLE_SCHEMA).parquet(str(src))
    q = (
        stream.writeStream.foreachBatch(writer)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = spark.read.schema(EVENTS_TABLE_SCHEMA).parquet(str(src))
    committed = spark.read.parquet(str(out / "batch_id=0"))
    assert committed.count() == batch.count()

    # Simulate Spark's failure-replay: same batch_id, same data — the
    # sink must not duplicate (marker short-circuits), and a partial
    # uncommitted directory must be overwritten on a genuine retry.
    writer(batch, 0)
    assert spark.read.parquet(str(out / "batch_id=0")).count() == batch.count()

    (out / "batch_id=1").mkdir()  # crashed attempt: dir without marker
    (out / "batch_id=1" / "junk").write_text("partial")
    writer(batch.limit(10), 1)
    assert spark.read.parquet(str(out / "batch_id=1")).count() == 10
    assert (out / "_SUCCESS.1").exists()


def test_stream_stream_left_outer_interval_join(spark, tmp_path):
    """Stream-stream LEFT OUTER interval join semantics: an unmatched
    left row emits with nulls only AFTER the watermark passes the end of
    its match interval (here: advanced by a later file in a second
    micro-batch), and a row whose interval the watermark has not passed
    when the query stops is never emitted — the state-expiry contract
    production jobs must plan around."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pedri_analysis_spark.streaming.windows import interval_join_stream

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write(path, rows):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] for r in rows], pa.timestamp("us")
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(tbl, path)

    src = tmp_path / "src"
    src.mkdir()
    # batch 1: user 1's error matches its click; user 2's error has no
    # click — unmatched until the watermark proves it can't match.
    write(
        str(src / "a.parquet"),
        [
            (1, t0, 1, "error"),
            (2, t0 + dt.timedelta(minutes=10), 1, "click"),
            (3, t0, 2, "error"),
        ],
    )
    # batch 2: far-future rows on BOTH sides advance both watermarks past
    # user 2's [t0, t0+1h] interval; user 5's error interval is NOT
    # passed, so it must stay buffered (never emitted).
    t_late = t0 + dt.timedelta(hours=10)
    write(
        str(src / "b.parquet"),
        [
            (4, t_late, 5, "error"),
            (5, t_late, 6, "click"),
        ],
    )

    from pedri_analysis_spark.schema import EVENTS_TABLE_SCHEMA

    s = (
        spark.readStream.schema(EVENTS_TABLE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    errs = (
        s.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            "user_id",
            F.col("ts").cast("timestamp").alias("err_time"),
        )
        .withWatermark("err_time", "30 minutes")
    )
    clks = (
        s.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("clk_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").cast("timestamp").alias("clk_time"),
        )
        .withWatermark("clk_time", "30 minutes")
    )
    joined = interval_join_stream(
        errs.withColumnRenamed("user_id", "key"),
        clks.withColumnRenamed("c_user", "key"),
        "key",
        "err_time",
        "clk_time",
        0,
        3600,
        how="left_outer",
    )
    q = (
        joined.select("err_id", "clk_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("oj_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in spark.sql("SELECT * FROM oj_out").collect()}
    finally:
        q.stop()
    assert got == {(1, 2), (3, None)}, got
