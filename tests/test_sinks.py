"""Sink round-trip tests (SURVEY S5-S7)."""

from __future__ import annotations

import csv
import glob
import json
import os


def test_csv_single(spark, tmp_path):
    from pedri_analysis_spark.sources.sinks import write_csv_single

    df = spark.createDataFrame(
        [(3, "c"), (1, "a"), (2, "b")], ["match_id", "name"]
    )
    out = write_csv_single(df, str(tmp_path / "stats.csv"), order_by=["match_id"])
    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert [r["match_id"] for r in rows] == ["1", "2", "3"]
    assert rows[0]["name"] == "a"


def test_json_summary(spark, tmp_path):
    from pedri_analysis_spark.sources.sinks import write_json_summary

    df = spark.createDataFrame([(49, 3088.5)], ["matches", "total_minutes"])
    out = write_json_summary(df, str(tmp_path / "summary.json"))
    with open(out) as f:
        data = json.load(f)
    assert data == {"matches": 49, "total_minutes": 3088.5}


def test_text_list(spark, tmp_path):
    from pedri_analysis_spark.sources.sinks import write_text_list

    df = spark.createDataFrame([(7,), (3,), (7,), (10,)], ["match_id"])
    out = write_text_list(df, str(tmp_path / "ids.txt"), "match_id")
    lines = open(out).read().split()
    assert lines == ["10", "3", "7"]  # string-sorted, distinct


def test_partitioned_parquet_prunes(spark, tmp_path):
    from pedri_analysis_spark.sources.sinks import write_partitioned

    df = spark.createDataFrame(
        [(1, "en"), (2, "de"), (3, "en")], ["doc_id", "lang"]
    )
    out = write_partitioned(df, str(tmp_path / "docs"), ["lang"])
    assert os.path.isdir(os.path.join(out, "lang=en"))
    back = spark.read.parquet(out).filter("lang = 'en'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan  # partition pruning active
    assert back.count() == 2


def test_write_jsonl_sharded_roundtrip(spark, tmp_path):
    import json as _json

    from pedri_analysis_spark.sources.sinks import write_jsonl_sharded

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    out = write_jsonl_sharded(df.repartition(3), str(tmp_path / "export"))
    files = glob.glob(os.path.join(out, "part-*"))
    assert len(files) == 3  # shard count = partition count
    rows = []
    for f in files:
        with open(f) as fh:
            for line in fh:
                rows.append(_json.loads(line))  # every line is standalone JSON
    assert len(rows) == df.count()
    assert {r["doc_id"] for r in rows} == {
        r.doc_id for r in df.select("doc_id").collect()
    }
