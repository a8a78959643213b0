"""StatsBomb-style event-stream sources.

One JSON array file per match, ``.../events/<match_id>.json``.  Key
ingestion rules carried over from the reference:

- ``match_id`` ALWAYS derives from the filename digits, never from file
  content (reference core/pedri_analysis.py:221-227,236; README "match_id
  zawsze z nazwy pliku").  Spark: ``regexp_extract(input_file_name())``.
- Tolerant parse: malformed files are skipped with a warning, not fatal
  (reference core/pedri_analysis.py:303-311).  Spark: PERMISSIVE mode +
  corrupt-record column; a non-array/corrupt file yields rows whose
  corrupt column is set, which we drop.
- Explicit schema (schema.EVENT_SCHEMA): inference over thousands of
  files is a second full scan and non-deterministic; an absent field reads
  as NULL, preserving the reference's ``safe_get`` semantics.

Scale: one file = one-or-more Spark file splits; the glob recurses and
dedups natively in the FileIndex (reference's manual two-glob dedup,
core/pedri_analysis.py:314-322, is subsumed). Filter-by-player pushes into
the scan; nested-schema pruning keeps untouched struct branches unread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pedri_analysis_spark.schema import EVENT_SCHEMA
from pedri_analysis_spark.sources.tables import ensure_session_conf

CORRUPT_COL = "_corrupt_record"


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """Read event JSON (array-per-file) into one row per event, with
    ``match_id`` (from filename) and ``source_file`` columns appended
    (traceability column per reference core/pedri_analysis.py:298)."""
    ensure_session_conf(spark)
    df = (
        spark.read.schema(EVENT_SCHEMA)
        .option("multiLine", True)
        # DROPMALFORMED: a malformed file contributes zero rows — the
        # reference's warn-and-skip (core/pedri_analysis.py:303-311).
        .option("mode", "DROPMALFORMED")
        .option("recursiveFileLookup", True)
        .json(path)
    )
    return (
        # A well-formed but non-array file (top-level object) parses as one
        # all-null row — the reference rejects non-list[dict] files, so drop
        # rows that carry no event identity at all.
        df.filter(F.col("id").isNotNull() | F.col("type.name").isNotNull())
        .withColumn("source_file", F.input_file_name())
        .withColumn(
            "match_id",
            F.regexp_extract(
                F.element_at(F.split(F.input_file_name(), "/"), -1), r"(\d+)", 1
            ).cast("long"),
        )
    )


def read_profile(spark: SparkSession, path: str) -> DataFrame:
    """Profile side table: match_id -> {team, minutes, position} with the
    reference's key normalization (any of match_id|id|matchId|match) and
    defaults (reference core/pedri_analysis_extended.py:40-58).

    Small dimension — broadcast it at the join site."""
    ensure_session_conf(spark)
    raw = spark.read.option("multiLine", True).json(path)
    cols = set(raw.columns)

    def opt(name: str) -> F.Column:
        return F.col(name) if name in cols else F.lit(None)

    return raw.select(
        F.coalesce(*[opt(k).cast("long") for k in ("match_id", "id", "matchId", "match")]).alias(
            "match_id"
        ),
        F.coalesce(opt("team_name"), opt("team"), F.lit("Unknown")).alias("team"),
        F.coalesce(opt("minutes").cast("double"), F.lit(90.0)).alias("minutes"),
        F.coalesce(opt("position"), F.lit("Unknown")).alias("position"),
    )
