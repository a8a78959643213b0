"""Materialized Z-order layout: prove the data-skipping claim on REAL
parquet footers, not just the manifest's prediction.

The layout writer produces one file per non-empty aligned Morton square;
a stats-based reader (Delta/Iceberg file skipping, Spark row-group
pruning) scans only files whose footer min/max rectangle contains the
predicate. We replay that file-listing decision from the actual footers
and assert a point predicate on EITHER interleaved column prunes >90% of
files — and that a single-column-sorted layout does NOT deliver that on
the other column (the reason Z-order exists)."""

from __future__ import annotations

import glob
import os

import pytest

SF = "/root/testdata/sf0.01"
# power of 4 => every bucket is an aligned square of the 256x256 quantile
# grid (16x16 cells for 256 buckets), the geometry the >90% bound needs
N_BUCKETS = 256


def _files(out_dir: str) -> list[str]:
    return glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True)


def _stats_range(path: str, column: str):
    """(min, max) for ``column`` across the file's row groups — the exact
    metadata a footer-stats reader prunes with."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    mins, maxs = [], []
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            if col.path_in_schema == column and col.statistics is not None:
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
    assert mins, f"no footer stats for {column} in {path}"
    return min(mins), max(maxs)


def _files_scanned(out_dir: str, column: str, value) -> tuple[int, int]:
    """(matching, total): how many files a stats-based reader must scan
    for ``column = value``."""
    files = _files(out_dir)
    hit = 0
    for f in files:
        lo, hi = _stats_range(f, column)
        if lo <= value <= hi:
            hit += 1
    return hit, len(files)


def _median_probes():
    """Median o_custkey / o_orderdate of the ACTUAL data, so the point
    probes are guaranteed in-range (an out-of-range probe would match 0
    files everywhere and make the skip assertions vacuous)."""
    import pyarrow.parquet as pq

    pdf = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).to_pandas()
    return (
        int(pdf["o_custkey"].quantile(0.5, interpolation="nearest")),
        pdf["o_orderdate"].quantile(0.5, interpolation="nearest"),
    )


@pytest.fixture(scope="module")
def zorder_dir(spark, tmp_path_factory):
    from pedri_analysis_spark.plans.layout_queries import write_zorder_layout

    out = str(tmp_path_factory.mktemp("zorder") / "orders_z")
    write_zorder_layout(spark, SF, out, n_buckets=N_BUCKETS)
    return out


def test_zorder_one_file_per_bucket(zorder_dir):
    files = _files(zorder_dir)
    # one file per NON-EMPTY bucket; sf0.01 orders are sparse on the
    # 65536-cell grid so some buckets may be empty, but the layout must
    # actually fan out (not collapse into a handful of files)
    assert len(files) > N_BUCKETS // 2
    buckets = {f.split("z_bucket=")[1].split(os.sep)[0] for f in files}
    assert len(buckets) == len(files)  # exactly one file per bucket


def test_zorder_point_predicate_skips_files_both_dims(spark, zorder_dir):
    """The materialized claim: a point predicate on EITHER z-ordered
    column overlaps the footer min/max of <10% of files."""
    from pyspark.sql import functions as F

    probe_ck, probe_date = _median_probes()

    hit_ck, total = _files_scanned(zorder_dir, "o_custkey", probe_ck)
    hit_dt, _ = _files_scanned(zorder_dir, "o_orderdate", probe_date)
    assert hit_ck / total < 0.10, f"custkey point scans {hit_ck}/{total} files"
    assert hit_dt / total < 0.10, f"orderdate point scans {hit_dt}/{total} files"

    # and the layout is lossless: the pruned read returns the same rows
    # the unpartitioned table does
    o = spark.read.parquet(f"{SF}/orders.parquet")
    expect = o.filter(F.col("o_custkey") == probe_ck).count()
    got = (
        spark.read.parquet(zorder_dir)
        .filter(F.col("o_custkey") == probe_ck)
        .count()
    )
    assert got == expect and expect > 0


def test_single_sort_layout_cannot_skip_other_dim(spark, tmp_path, zorder_dir):
    """Why Z-order and not a plain sort: range-layout on o_custkey alone
    leaves o_orderdate scattered, so a date point predicate scans nearly
    every file — while the z-ordered layout scans <10% (asserted above)."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "orders_singlesort")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    o.repartitionByRange(64, "o_custkey").write.mode("overwrite").parquet(out)

    _, probe_date = _median_probes()
    hit_dt, total = _files_scanned(out, "o_orderdate", probe_date)
    assert hit_dt / total > 0.5, (
        f"expected the single-sort layout to be unable to skip on the "
        f"other dimension, but it scanned only {hit_dt}/{total}"
    )


def test_zorder_files_are_sorted_within_file(spark, zorder_dir):
    """The write path's documented guarantee: rows inside each file are
    z-sorted so row-group stats nest.  Regression for the planned-write
    trap: partitionBy stacks a required Sort[z_bucket] and
    EliminateSorts DROPS a bare sortWithinPartitions('z') under it —
    the sort must lead with the bucket to survive."""
    import pyarrow.parquet as pq

    files = _files(zorder_dir)
    assert files
    for f in files:
        assert "z" in pq.read_schema(f).names
        zs = [row["z"] for row in pq.read_table(f, columns=["z"]).to_pylist()]
        assert zs == sorted(zs), f"{f} not z-sorted"
