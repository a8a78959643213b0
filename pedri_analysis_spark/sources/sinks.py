"""Sinks (SURVEY §2.1 S5-S7): CSV stat tables, JSON summaries, text lists.

The reference writes single ordered files (csv.DictWriter /
json.dump); distributed writes produce one file per partition, so the
single-file contract is met with ``coalesce(1)`` — correct for the tiny
aggregate outputs these sinks serve (per-match tables, season summaries).
Never coalesce(1) a large dataset: for bulk output use
``write.partitionBy(...).parquet`` (provided here as ``write_partitioned``).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame


def write_csv_single(df: DataFrame, path: str, order_by: list[str] | None = None) -> str:
    """One ordered, headered CSV file (reference S5:
    core/pedri_analysis.py:637-661). Returns the final file path."""
    if order_by:
        df = df.orderBy(*order_by)
    tmp = path + ".spark-tmp"
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    shutil.move(part, path)
    shutil.rmtree(tmp)
    return path


def write_json_summary(df: DataFrame, path: str) -> str:
    """One-row-summary JSON object (reference S6:
    core/pedri_analysis_extended.py:641-652): collect the single row on
    the driver and dump it — the correct move for a 1-row aggregate."""
    rows = df.collect()
    payload = rows[0].asDict(recursive=True) if len(rows) == 1 else [
        r.asDict(recursive=True) for r in rows
    ]
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, default=str)
    return path


def write_text_list(df: DataFrame, path: str, column: str) -> str:
    """Sorted one-value-per-line text file (reference S7:
    find_pedri_matches_in_events.py:71-74)."""
    tmp = path + ".spark-tmp"
    (
        df.select(df[column].cast("string").alias("value"))
        .distinct()
        .orderBy("value")
        .coalesce(1)
        .write.mode("overwrite")
        .text(tmp)
    )
    part = glob.glob(os.path.join(tmp, "part-*"))
    part = [p for p in part if not p.endswith(".crc")][0]
    shutil.move(part, path)
    shutil.rmtree(tmp)
    return path


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> str:
    """Bulk parquet output partitioned for downstream pruning — the sink
    for anything that does NOT fit the single-file contract."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    return path


def backfill_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> str:
    """Idempotent BACKFILL into an existing partitioned dataset: dynamic
    partition overwrite replaces ONLY the partitions present in ``df``
    and leaves every other partition's files untouched (static overwrite
    mode would truncate the whole table — the classic backfill footgun).

    The mode is set per-write via the DataFrameWriter option, not a
    session conf, so concurrent writers with different intents cannot
    race on global state.  Re-running the same backfill converges to the
    same bytes (deterministic input -> safe to retry).  At 100 TB this
    is the daily-pipeline repair primitive: recompute one day, slot it
    in, never touch the other 3 000 days.

    Scale note: requires the write to be partition-pruned upstream
    (recompute ONLY the target partitions); the sink itself shuffles
    nothing."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    return path


def write_jsonl_sharded(df: DataFrame, path: str) -> str:
    """Training-export sink: JSON-Lines shards (one JSON object per line,
    one file per partition — the interchange format LLM data pipelines
    feed to tokenizer/packing stages). This is Spark's native distributed
    json writer: no coalesce, shard count = partition count, so it scales
    to any corpus; pair with ``repartition(n)`` upstream to size shards.
    Returns the directory path."""
    df.write.mode("overwrite").json(path)
    return path
