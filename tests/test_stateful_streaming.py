"""Custom stateful streaming operator smoke: running per-user counters via
applyInPandasWithState (SURVEY §2.8: the custom-stateful-operator surface),
driven by a file-source stream to completion."""

from __future__ import annotations

import os
import shutil

import pytest


def test_apply_in_pandas_with_state_running_counts(spark, tmp_path):
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from pedri_analysis_spark.schema import EVENTS_TABLE_SCHEMA
    from pedri_analysis_spark.sources.tables import ensure_session_conf

    ensure_session_conf(spark)
    src = tmp_path / "stream_src"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "events.parquet")

    # batch expectation
    batch = spark.read.schema(EVENTS_TABLE_SCHEMA).parquet(str(src))
    expected = {
        (r.user_id, r.n): None
        for r in batch.groupBy("user_id").count().withColumnRenamed("count", "n").collect()
    }

    def running(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [total]})

    stream = spark.readStream.schema(EVENTS_TABLE_SCHEMA).parquet(str(src))
    counted = stream.groupBy("user_id").applyInPandasWithState(
        running,
        outputStructType="user_id long, n long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        counted.writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.n): None
            for r in spark.sql(
                "SELECT user_id, max(n) AS n FROM state_out GROUP BY user_id"
            ).collect()
        }
    finally:
        q.stop()
    assert got == expected
