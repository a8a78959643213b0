"""Data-layout queries: multi-dimensional clustering for scan pruning.

Parquet/Delta/Iceberg data skipping works off per-file min/max column
stats, but a single-column sort only localizes ONE predicate column. The
Z-order (Morton) curve interleaves the bits of several quantized sort
keys so that rows close on the curve are close in EVERY dimension — each
written file then covers a small hyper-rectangle of the key space and a
selective predicate on ANY of the interleaved columns prunes most files
(the Delta Lake ``OPTIMIZE ... ZORDER BY`` / Iceberg sort-order
technique; no reference counterpart — this is beyond-reference
scale-engineering surface).

The whole computation is integer arithmetic (quantize → interleave →
bucket), generated once per dialect from the same Python template, so
the DuckDB oracle runs the byte-identical formula.

Scale: quantization bounds come from a 1-row global aggregate
(broadcast); the z-key is a narrow per-row map; the per-bucket rollup is
one shuffle. The real write path is ``repartitionByRange(z)`` + per-file
stats — the manifest here measures what that layout buys: how small a
rectangle of (custkey × orderdate) each bucket actually covers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pedri_analysis_spark.plans.relational import QueryFn
from pedri_analysis_spark.functions import textexpr as tx
from pedri_analysis_spark.sources.tables import load_table

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


Z_BITS = 8  # per-dimension quantization (16-bit z-key)
Z_BUCKETS = 64  # simulated files: z div (2^16 / 64)


def _idiv(dialect: str, a: str, b: str) -> str:
    return f"({a}) div ({b})" if dialect == "spark" else f"(({a}) // ({b}))"


def _quantize(dialect: str, col: str, lo: str, hi: str) -> str:
    """Map col into [0, 2^Z_BITS) over its [lo, hi] data range — pure
    integer math so both engines land every row in the same cell."""
    span = f"(({hi}) - ({lo}) + 1)"
    scaled = f"((({col}) - ({lo})) * {1 << Z_BITS})"
    q = _idiv(dialect, scaled, span)
    return f"least({q}, {(1 << Z_BITS) - 1})"


def _interleave(dialect: str, qx: str, qy: str) -> str:
    """Morton interleave: bit i of qx -> bit 2i, bit i of qy -> bit 2i+1.
    Emitted as a sum of div/mod terms — identical integer semantics in
    Spark SQL and DuckDB (no reliance on shift-operator parity)."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({_idiv(dialect, qx, 1 << i)}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({_idiv(dialect, qy, 1 << i)}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def _epoch_day(dialect: str, col: str) -> str:
    return tx.epoch_day(tx.SPARK if dialect == "spark" else tx.DUCK, col)


def _zorder_sql(dialect: str) -> str:
    day = _epoch_day(dialect, "o_orderdate")
    qx = _quantize(dialect, "o_custkey", "b.min_ck", "b.max_ck")
    qy = _quantize(dialect, day, "b.min_day", "b.max_day")
    z = _interleave(dialect, "qx", "qy")
    bucket = _idiv(dialect, "z", (1 << (2 * Z_BITS)) // Z_BUCKETS)
    cast_big = "CAST({} AS BIGINT)" if dialect == "spark" else "({})::BIGINT"
    return f"""
    WITH b AS (
      SELECT min(o_custkey) AS min_ck, max(o_custkey) AS max_ck,
             min({_epoch_day(dialect, 'o_orderdate')}) AS min_day,
             max({_epoch_day(dialect, 'o_orderdate')}) AS max_day
      FROM orders
    ),
    q AS (
      SELECT {qx} AS qx, {qy} AS qy
      FROM orders, b
    ),
    zed AS (
      SELECT qx, qy, {z} AS z FROM q
    )
    SELECT {bucket} AS z_bucket,
           {cast_big.format('count(*)')} AS n_orders,
           {cast_big.format('min(qx)')} AS min_qx,
           {cast_big.format('max(qx)')} AS max_qx,
           {cast_big.format('min(qy)')} AS min_qy,
           {cast_big.format('max(qy)')} AS max_qy,
           {cast_big.format('(max(qx) - min(qx) + 1) * (max(qy) - min(qy) + 1)')}
               AS covered_cells
    FROM zed
    GROUP BY 1
    """


def zorder_keyed_orders(
    spark: SparkSession, sf_dir: str, n_buckets: int = Z_BUCKETS
) -> DataFrame:
    """orders with (qx, qy, z, z_bucket) layout keys — the shared frame
    behind both the manifest query and the materialized write path.

    ``n_buckets`` must divide ``4**Z_BITS``; when it is a power of 4 each
    bucket is an ALIGNED square of the (qx, qy) grid (a block of
    ``4**Z_BITS / n_buckets`` consecutive Morton codes), which is what
    bounds every file's min/max rectangle."""
    if (1 << (2 * Z_BITS)) % n_buckets:
        raise ValueError(
            f"n_buckets={n_buckets} must divide 4**Z_BITS={1 << (2 * Z_BITS)}: "
            "a non-divisor silently yields n_buckets+1 unaligned buckets "
            "and voids the min/max-rectangle guarantee"
        )
    o = load_table(spark, "orders", sf_dir).select("o_custkey", "o_orderdate")
    bounds = F.broadcast(
        o.agg(
            F.min("o_custkey").alias("min_ck"),
            F.max("o_custkey").alias("max_ck"),
            F.expr(f"min({_epoch_day('spark', 'o_orderdate')})").alias("min_day"),
            F.expr(f"max({_epoch_day('spark', 'o_orderdate')})").alias("max_day"),
        )
    )
    day = _epoch_day("spark", "o_orderdate")
    q = o.crossJoin(bounds).select(
        "o_custkey",
        "o_orderdate",
        F.expr(_quantize("spark", "o_custkey", "min_ck", "max_ck")).alias("qx"),
        F.expr(_quantize("spark", day, "min_day", "max_day")).alias("qy"),
    )
    zed = q.withColumn("z", F.expr(_interleave("spark", "qx", "qy")))
    bucket = F.expr(_idiv("spark", "z", (1 << (2 * Z_BITS)) // n_buckets))
    return zed.withColumn("z_bucket", bucket)


def write_zorder_layout(
    spark: SparkSession, sf_dir: str, out_dir: str, n_buckets: int = Z_BUCKETS
) -> str:
    """MATERIALIZE the z-ordered layout: one parquet file per non-empty
    z-bucket (hash-colocate each bucket, then ``partitionBy`` so every
    bucket value lands in exactly one file in its own directory), rows
    sorted by z within the file so row-group stats nest the same way.

    This is the write path the manifest query predicts: each file's
    parquet footer min/max on (o_custkey, o_orderdate) covers one aligned
    Morton square, so a stats-based reader (Delta/Iceberg-style file
    skipping, or Spark's own row-group pruning) scans only the files
    whose rectangle contains the predicate — verified against real
    footers in tests/test_layout.py."""
    zed = zorder_keyed_orders(spark, sf_dir, n_buckets)
    (
        zed.repartition(n_buckets, "z_bucket")
        # (z_bucket, z), not plain (z): partitionBy makes the planner
        # stack its own required Sort[z_bucket] on the write, and
        # EliminateSorts would DROP a bare Sort[z] under it — silently
        # writing unsorted files.  With the bucket as the sort prefix the
        # writer's requirement is already satisfied and the z ordering
        # survives into the files (pinned by test_layout's
        # intra-file-sorted assertion).
        .sortWithinPartitions("z_bucket", "z")
        .write.partitionBy("z_bucket")
        .mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


@_register("zorder_layout_orders", _zorder_sql("duck"))
def q_zorder_layout_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout manifest over orders(o_custkey, o_orderdate): rows
    are quantized to an 8-bit grid per dimension, Morton-interleaved into
    a 16-bit z-key, and grouped into 64 curve-contiguous buckets (the
    simulated files). Per bucket the manifest reports the (custkey × day)
    rectangle the bucket actually covers — ``covered_cells`` ≪ the 65 536
    total cells is the data-skipping win: a point predicate on EITHER
    column overlaps only a handful of buckets' min/max ranges.

    Scale: 1-row bounds aggregate broadcast into a narrow integer map,
    then one shuffle on z_bucket. The real write path is
    :func:`write_zorder_layout`, whose per-file footer stats this rollup
    predicts exactly (proven in tests/test_layout.py)."""
    return (
        zorder_keyed_orders(spark, sf_dir, Z_BUCKETS)
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("qx").cast("bigint").alias("min_qx"),
            F.max("qx").cast("bigint").alias("max_qx"),
            F.min("qy").cast("bigint").alias("min_qy"),
            F.max("qy").cast("bigint").alias("max_qy"),
            (
                (F.max("qx") - F.min("qx") + 1) * (F.max("qy") - F.min("qy") + 1)
            )
            .cast("bigint")
            .alias("covered_cells"),
        )
    )


# ---------------------------------------------------------------------------
# Bucketed tables: the shuffle-free co-located join
# ---------------------------------------------------------------------------

JOIN_BUCKETS = 16

# Spec marker written beside _SUCCESS at publish time.  Re-registration
# trusts catalog-style bucket metadata ONLY when this file's recorded
# (bucket count, key, sort key, schema) exactly match what the current
# code would write — Spark elides the Exchange/Sort purely on catalog
# DDL, so registering a dir written under a DIFFERENT bucketing would
# silently return wrong join results (rows hashed under the old spec
# never meet their partners).
BUCKET_SPEC_MARKER = "_BUCKET_SPEC.json"


def _bucket_tag(sf_dir: str) -> str:
    import re as _re

    return _re.sub(r"[^0-9A-Za-z]", "_", os.path.basename(os.path.normpath(sf_dir)))


def _bucket_spec(key: str, n_buckets: int, schema) -> dict:
    return {
        "n_buckets": n_buckets,
        "bucket_by": key,
        "sort_by": key,
        "schema": schema.simpleString(),
        "format": "parquet",
    }


def ensure_bucketed_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int = JOIN_BUCKETS
) -> tuple[str, str]:
    """Materialize orders and customer as BUCKETED catalog tables,
    bucketed AND sorted on the join key (custkey), once per scale
    factor (reused across calls/sessions via the warehouse dir).

    Bucketing is Spark's persisted co-partitioning: both tables
    pre-hash into the same number of buckets on the join key at write
    time, so every later equi-join on that key reads bucket i against
    bucket i with NO Exchange and (sorted buckets) no Sort — the
    repeated-join workhorse at 100 TB, where the fact-table shuffle is
    the single largest cost of a star join and bucketing amortizes it
    to zero across every downstream query (pinned by
    tests/test_bucketing.py's no-Exchange plan assertion).

    Cross-session protocol (the in-memory catalog dies with the
    session; the warehouse dir does not):

    * WRITE goes to a process-unique STAGING dir (a temp managed
      table), gets the spec marker stamped beside _SUCCESS, and is
      published into the final path with one atomic os.rename — a
      sibling process can never observe (or rmtree) a half-written
      final dir, and if two processes race, exactly one rename wins
      and the loser discards its staging copy.
    * RE-REGISTRATION as an EXTERNAL bucketed table happens ONLY when
      _SUCCESS and the spec marker are both present and the marker
      matches the current (n_buckets, key, sort, schema) exactly; any
      mismatch (changed JOIN_BUCKETS/cols, foreign parquet dir
      squatting on the path, pre-marker legacy dir) is rewritten
      rather than trusted — catalog bucket DDL over wrong-hashed files
      would silently drop join matches."""
    import json as _json
    import shutil

    tag = _bucket_tag(sf_dir)
    specs = [
        (f"bkt_orders_{tag}", "orders", "o_custkey",
         ["o_orderkey", "o_custkey", "o_totalprice"]),
        (f"bkt_customer_{tag}", "customer", "c_custkey",
         ["c_custkey", "c_mktsegment"]),
    ]
    for tbl, src, key, cols in specs:
        if spark.catalog.tableExists(tbl):
            continue
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        wh_path = wh.removeprefix("file:")
        on_disk = os.path.join(wh_path, tbl.lower())
        frame = load_table(spark, src, sf_dir).select(*cols)
        want = _bucket_spec(key, n_buckets, frame.schema)

        def _register_external() -> None:
            col_ddl = ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in frame.schema.fields
            )
            spark.sql(
                f"CREATE TABLE {tbl} ({col_ddl}) USING PARQUET "
                f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                f"INTO {n_buckets} BUCKETS "
                f"LOCATION 'file:{os.path.abspath(on_disk)}'"
            )

        def _spec_matches() -> bool:
            marker = os.path.join(on_disk, BUCKET_SPEC_MARKER)
            if not os.path.isfile(os.path.join(on_disk, "_SUCCESS")):
                return False
            if not os.path.isfile(marker):
                return False
            try:
                with open(marker) as f:
                    return _json.load(f) == want
            except (OSError, ValueError):
                return False

        if _spec_matches():
            _register_external()
            continue
        # Stale/mismatched/incomplete leftover on the final path: safe to
        # remove — a sibling's in-flight write lives in its own staging
        # dir, never here, so nothing mid-flight can be clobbered.
        if os.path.isdir(on_disk):
            shutil.rmtree(on_disk)
        stg_tbl = f"{tbl}__stg{os.getpid()}"
        stg_dir = os.path.join(wh_path, stg_tbl.lower())
        spark.sql(f"DROP TABLE IF EXISTS {stg_tbl}")
        if os.path.isdir(stg_dir):
            shutil.rmtree(stg_dir)
        (
            frame.repartition(n_buckets, key)
            .write.bucketBy(n_buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(stg_tbl)
        )
        with open(os.path.join(stg_dir, BUCKET_SPEC_MARKER), "w") as f:
            _json.dump(want, f, sort_keys=True)
        renamed = True
        try:
            os.rename(stg_dir, on_disk)  # atomic publish
        except OSError:
            # USUALLY a sibling process published first — but rename can
            # also fail for unrelated reasons (permissions, partial
            # cleanup), so the winner's dir is re-validated below before
            # anything is registered over it (r9 ADVICE fix).
            renamed = False
            shutil.rmtree(stg_dir, ignore_errors=True)
        # Retire the staging catalog entry (its dir has been renamed away;
        # dropping the managed entry only removes metadata) and expose the
        # published dir under the real name as an EXTERNAL table so later
        # sessions and this one plan identically.
        spark.sql(f"DROP TABLE IF EXISTS {stg_tbl}")
        if not renamed and not _spec_matches():
            # Not the sibling-won race: whatever sits at the final path is
            # missing/incomplete/mismatched. Registering it would silently
            # serve wrong (possibly empty) join results — fail loudly.
            raise RuntimeError(
                f"bucketed-table publish failed for {tbl}: rename to "
                f"{on_disk} failed and the path does not hold a valid "
                f"published table (_SUCCESS + matching {BUCKET_SPEC_MARKER})"
            )
        _register_external()
    return specs[0][0], specs[1][0]


def bucketed_join_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-located orders⋈customer frame both the registered query
    and the plan test consume."""
    orders_tbl, cust_tbl = ensure_bucketed_tables(spark, sf_dir)
    o = spark.table(orders_tbl)
    c = spark.table(cust_tbl)
    return o.join(c, o["o_custkey"] == c["c_custkey"])


@_register(
    "bucketed_join_segment_revenue",
    """
    SELECT c_mktsegment,
           count(*)::BIGINT AS n_orders,
           CAST(sum(o_totalprice::DECIMAL(12,2)) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_bucketed_join_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per market segment through PRE-BUCKETED tables: orders
    and customer are written once as 16-bucket catalog tables hashed
    and sorted on custkey, so the both-sides-big equi-join plans with
    zero Exchange on either side — the persisted co-partitioning that
    removes the fact-table shuffle from every repeated star join.  (At
    small SF the planner correctly prefers a broadcast join instead;
    the no-Exchange SMJ shape is pinned with broadcast disabled in
    tests/test_bucketing.py.)

    Scale: the one-time bucketed write costs a single shuffle per
    table; every subsequent join on the bucket key is then map-local
    (bucket i ⋈ bucket i).  At 100 TB the bucket count scales to
    O(thousands) and the same plan holds; the only remaining exchange
    in this query is the 5-group segment rollup after map-side
    combine.  Oracle runs the identical join/aggregate over the raw
    parquet views — materialization must not change results."""
    j = bucketed_join_frame(spark, sf_dir)
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Compaction planning (Delta OPTIMIZE-style small-file coalesce)
# ---------------------------------------------------------------------------

COMPACT_TARGET_FILES = 16


@_register(
    "compaction_plan_orders",
    f"""
    WITH manifest AS ({_zorder_sql("duck")}),
    tot AS (SELECT sum(n_orders)::BIGINT AS total_rows FROM manifest),
    sized AS (
      SELECT m.z_bucket, m.n_orders,
             ((t.total_rows + {COMPACT_TARGET_FILES - 1})
               // {COMPACT_TARGET_FILES})::BIGINT AS target,
             coalesce(sum(m.n_orders) OVER (
               ORDER BY m.z_bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0)::BIGINT AS cum_before
      FROM manifest m, tot t
    )
    SELECT (cum_before // target)::BIGINT AS merge_group,
           count(*)::BIGINT AS n_files,
           sum(n_orders)::BIGINT AS total_rows,
           min(z_bucket)::BIGINT AS min_bucket,
           max(z_bucket)::BIGINT AS max_bucket
    FROM sized
    GROUP BY 1
    ORDER BY merge_group
    """,
)
def q_compaction_plan_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan over the z-order layout: coalesce the
    64 bucket files into ~{COMPACT_TARGET_FILES} target files by
    walking the buckets IN CURVE ORDER and cutting at a row-count
    budget (exclusive prefix sum div target) — the Delta
    ``OPTIMIZE``-style maintenance op.  Curve-ordered coalescing is the
    point: merging z-contiguous buckets preserves the clustering the
    layout paid for, so the compacted files keep their small min/max
    rectangles (a bin-packing merge would destroy them).

    Scale: the plan operates on the FILE MANIFEST (one row per file —
    64 here, O(100k) on a real table), never the data; the
    unpartitioned prefix-sum window is over that bounded manifest
    frame.  Everything is integer arithmetic; the oracle reuses the
    z-order manifest SQL so both sides plan over identical input."""
    manifest = (
        zorder_keyed_orders(spark, sf_dir, Z_BUCKETS)
        .groupBy("z_bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    from pyspark.sql import Window as W

    cum_before = F.coalesce(
        F.sum("n_orders").over(
            W.orderBy("z_bucket").rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    sized = manifest.select(
        "z_bucket",
        "n_orders",
        F.expr(
            f"CAST((sum(n_orders) OVER () + {COMPACT_TARGET_FILES - 1})"
            f" div {COMPACT_TARGET_FILES} AS BIGINT)"
        ).alias("target"),
        cum_before.cast("bigint").alias("cum_before"),
    )
    return (
        sized.select(
            F.expr("CAST(cum_before div target AS BIGINT)").alias("merge_group"),
            "n_orders",
            "z_bucket",
        )
        .groupBy("merge_group")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("n_orders").cast("bigint").alias("total_rows"),
            F.min("z_bucket").cast("bigint").alias("min_bucket"),
            F.max("z_bucket").cast("bigint").alias("max_bucket"),
        )
        .orderBy("merge_group")
    )
