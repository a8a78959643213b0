"""Cross-validate the watermark_late_dups BATCH audit (draft_r13) against
REAL Structured Streaming behavior: replay the same events through
``dropDuplicatesWithinWatermark`` in time-ordered micro-batches and check
the audit's claimed inequality — every streaming-leaked duplicate has a
gap > watermark from its key's FIRST occurrence, so the streaming leak
count is bounded by the audit's n_past_watermark total.

Why the bound holds (and what the test pins): a repeat leaks only if its
key's state was evicted, i.e. the watermark passed the last EMITTED
occurrence + delay; with time-ordered arrival the watermark never exceeds
the repeat's own event time, so repeat_time − last_emitted > delay, and
since first ≤ last_emitted, repeat_time − first > delay — exactly the
rows the batch audit counts."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"
N_CHUNKS = 10
WM = "10 minutes"


def test_watermark_late_dups_bounds_real_streaming_leakage(spark, tmp_path):
    from pyspark.sql import functions as F

    from pedri_analysis_spark.plans import draft_r13 as d
    from pedri_analysis_spark.plans.relational import events_us
    from pedri_analysis_spark.sources.tables import ensure_session_conf
    from pedri_analysis_spark.streaming.windows import dedup_within_watermark

    ensure_session_conf(spark)

    # ---- the batch audit's upper bound, on the same fixture
    audit = d.QUERIES["watermark_late_dups"](spark, SF_DIR).collect()
    upper = sum(r["n_past_watermark"] for r in audit)
    n_raw = sum(r["n_events"] for r in audit)

    # ---- time-ordered chunked replay source (one file per micro-batch;
    # zero-padded names keep the file-source listing in event-time order)
    rows = (
        events_us(spark, SF_DIR)
        .select("user_id", "event_type", "ts_us")
        .orderBy("ts_us", "user_id", "event_type")
        .collect()
    )
    assert len(rows) == n_raw
    n_keys = len({(r["user_id"], r["event_type"]) for r in rows})
    src = tmp_path / "replay"
    src.mkdir()
    per = (len(rows) + N_CHUNKS - 1) // N_CHUNKS
    for i in range(N_CHUNKS):
        chunk = rows[i * per : (i + 1) * per]
        if not chunk:
            break
        tbl = pa.table(
            {
                "user_id": pa.array([r["user_id"] for r in chunk], pa.int64()),
                "event_type": pa.array([r["event_type"] for r in chunk]),
                "ts_us": pa.array([r["ts_us"] for r in chunk], pa.int64()),
            }
        )
        pq.write_table(tbl, src / f"chunk-{i:03d}.parquet")

    stream = (
        spark.readStream.schema("user_id long, event_type string, ts_us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
        .withWatermark("event_time", WM)
    )
    deduped = dedup_within_watermark(
        stream, keys=("user_id", "event_type"), time_col="event_time"
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_leak_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT count(*) AS n FROM wm_leak_out").collect()[0]["n"]

    # dedup emits at least one row per key and never more than the input
    assert n_keys <= out <= n_raw
    leaked = out - n_keys
    # THE claim under test: real streaming leakage never exceeds the
    # batch audit's past-watermark repeat count
    assert 0 <= leaked <= upper
    # and with a months-long fixture replayed against a 10-minute
    # watermark, eviction genuinely happens — the bound is not vacuous
    # (leaked == 0 would mean the stream never dropped state)
    assert leaked > 0
    assert upper > 0
