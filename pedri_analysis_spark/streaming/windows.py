"""Event-time windowed aggregation operators.

The reference is pure batch (SURVEY §2.8), but two of its computations are
inherently event-time-stateful (the 5-second counter-press window, the
first/last-event minutes span), and the driver's ``events`` table is the
general-engine surface for time windowing.  These builders produce the
SAME logical plan for a batch DataFrame or a streaming one — in streaming
mode add ``with_watermark`` so state can be evicted.

Event time enters either as a parquet ``timestamp[us]`` (read as
TIMESTAMP_NTZ; with the session TZ pinned to UTC the cast to TIMESTAMP
is an identity) or — for nanosecond parquet, which Spark 4 can only read
via ``nanosAsLong`` — as epoch-nanos BIGINT converted with
``timestamp_micros(ts div 1000)`` (the same integer truncation the
DuckDB oracle applies reading ns→µs).  ``with_event_time`` dispatches on
the actual dtype so both encodings yield the same event time.

Scale: windowed aggregation shuffles on (window, keys); watermarks bound
state size; sliding windows multiply rows by width/slide (use the
``expand`` the planner emits, never a self-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_event_time(df: DataFrame, ts: str = "ts", out: str = "event_time") -> DataFrame:
    """Add an ``out`` TIMESTAMP column from ``ts``:
    TIMESTAMP/TIMESTAMP_NTZ → identity cast (UTC session TZ), BIGINT →
    treated as epoch-NANOS (the ``nanosAsLong`` legacy read path — the
    only integer encoding this engine's sources produce).  Any other
    dtype raises: silently guessing a unit for, say, an epoch-millis
    int would bucket every window around 1970 with no error anywhere."""
    from pyspark.sql import types as T

    ts_type = df.schema[ts].dataType
    if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        return df.withColumn(out, F.col(ts).cast("timestamp"))
    if isinstance(ts_type, T.LongType):
        return df.withColumn(out, F.timestamp_micros(F.expr(f"{ts} div 1000")))
    raise TypeError(
        f"{ts!r} has dtype {ts_type.simpleString()}; expected timestamp, "
        "timestamp_ntz, or bigint epoch-nanos (nanosAsLong read path)"
    )


def with_watermark(df: DataFrame, delay: str = "10 minutes", col: str = "event_time") -> DataFrame:
    """Streaming only: bound state retention for late data."""
    return df.withWatermark(col, delay)


def tumbling_counts(
    df: DataFrame,
    width: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
    time_col: str = "event_time",
) -> DataFrame:
    """Tumbling-window count + sum(value): ``groupBy(window(...), keys)``.

    Works unchanged under ``readStream`` (append mode once a watermark is
    set)."""
    return (
        df.groupBy(F.window(time_col, width), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            *keys,
            "n",
            "total_value",
        )
    )


def sliding_sums(
    df: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    time_col: str = "event_time",
) -> DataFrame:
    """Sliding-window aggregate: each event lands in width/slide windows
    (planner emits an Expand, not a join)."""
    return (
        df.groupBy(F.window(time_col, width, slide))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "n",
            "total_value",
        )
    )


def sessionize_batch(
    df: DataFrame,
    gap_minutes: int = 30,
    key: str = "user_id",
    ts_us_col: str = "ts_us",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Batch sessionization: lag-gap flag + running sum ⇒ session ids, then
    per-session rollup (the classic two-window formulation; the streaming
    analogue is ``session_window``/``applyInPandasWithState``).
    ``tiebreak_col`` totally orders same-timestamp rows so session
    boundaries are deterministic.

    Scale: one shuffle on the key; both windows share the same sort."""
    from pyspark.sql import Window as W

    w = W.partitionBy(key).orderBy(ts_us_col, tiebreak_col)
    gap_us = gap_minutes * 60 * 1_000_000
    flagged = df.withColumn(
        "new_session",
        (
            F.col(ts_us_col) - F.lag(ts_us_col).over(w) > gap_us
        ).cast("int"),
    ).withColumn(
        # the frame always contains the current row and the summed flag is
        # never NULL after the inner coalesce, so no outer fallback needed
        "session_seq",
        F.sum(F.coalesce("new_session", F.lit(0))).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return flagged.groupBy(key, "session_seq").agg(
        F.min(ts_us_col).alias("session_start_us"),
        F.max(ts_us_col).alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    lower_s: float,
    upper_s: float,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream (or batch) event-time interval join:
    right.time ∈ [left.time + lower, left.time + upper], same key —
    the streaming formulation of the counter-press join (SURVEY J5).
    In streaming both sides must carry watermarks; the time-range
    condition lets Spark bound the buffered state.

    ``how='left_outer'`` emits unmatched left rows with nulls — but in
    streaming only once the watermark passes the end of a row's match
    interval (the engine must prove no future right row can match before
    it can emit the null), so outer results trail the watermark delay.
    A left row still inside the state store when the query stops is
    never emitted — pinned by
    tests/test_streaming.py::test_stream_stream_left_outer_interval_join."""
    # fixed-point formatting: Python renders 1e-05 in scientific notation,
    # which Spark's INTERVAL literal parser rejects.  Guard against bounds
    # below the formatter's µs resolution — 1e-7 would silently become
    # INTERVAL 0.000000 SECONDS and change the join window with no error
    # (the same silent-unit class with_event_time's docstring warns about).
    for bound_name, bound in (("lower_s", lower_s), ("upper_s", upper_s)):
        if bound != round(bound, 6):
            raise ValueError(
                f"{bound_name}={bound!r} is not representable at the microsecond "
                "precision of Spark INTERVAL literals; pass a multiple of 1e-6 s"
            )
    cond = (
        (left[key] == right[key])
        & (right[right_time] >= left[left_time] + F.expr(f"INTERVAL {lower_s:.6f} SECONDS"))
        & (right[right_time] <= left[left_time] + F.expr(f"INTERVAL {upper_s:.6f} SECONDS"))
    )
    return left.join(right, cond, how)


def dedup_within_watermark(
    df: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    time_col: str = "event_time",
) -> DataFrame:
    """At-least-once delivery dedup: keep one row per key.

    Batch: plain ``dropDuplicates``. Streaming: the caller sets a
    watermark first and this becomes ``dropDuplicatesWithinWatermark`` —
    keyed state holds each key only until the watermark passes it, so
    state is bounded by (key arrival rate × watermark), not by stream
    length. Exactly the Spark-native replacement for the reference's
    seen-set dedup (FileIndex-style) under continuous ingestion."""
    if df.isStreaming:
        return df.dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))


def foreach_batch_idempotent_parquet(out_dir: str):
    """An exactly-once parquet sink for ``writeStream.foreachBatch``.

    Structured Streaming's foreachBatch contract is at-least-once: after
    a failure, the LAST batch may be re-executed with the SAME
    ``batch_id``.  The sink makes the replay a no-op by writing each
    micro-batch under ``batch_id=<n>/`` exactly once, committing with a
    ``_SUCCESS.<n>`` marker: a re-invocation that finds the marker
    returns without writing, so downstream readers never see duplicate
    rows (the standard idempotent-MERGE pattern expressed on plain
    parquet — on a table format you would MERGE on batch_id instead).

    Scale: the marker check is one driver-side metadata call per batch;
    the write itself is the normal distributed parquet job.  Partial
    writes from a crash before the marker land in a directory
    ``mode("overwrite")`` replaces on retry, so readers that filter on
    committed batch ids (or list via the markers) observe exactly-once
    output.  Marker I/O goes through the Hadoop FileSystem of the
    batch's own session, so the sink works on any supported URI
    (s3a://, hdfs://, file:/) — driver-local ``os.path`` would
    silently break exactly-once on object stores."""

    def write(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        marker = jvm.org.apache.hadoop.fs.Path(out_dir, f"_SUCCESS.{batch_id}")
        fs = marker.getFileSystem(hconf)
        if fs.exists(marker):
            return  # replayed batch: already committed, do nothing
        # mode("overwrite") replaces any partial directory from a crash
        df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
        fs.create(marker, True).close()

    return write
