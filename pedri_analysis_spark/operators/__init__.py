import os
import re
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame

# Analyzed-plan node types through which a scan's split count passes
# unchanged to the frame's partitioning. Anything else (Aggregate, Join,
# Repartition, Union, Generate, Window, ...) changes or multiplies the
# partitioning, so the file-based estimate below would be wrong — those
# frames fall back to the exact probe.
_SCAN_SHAPED_NODES = frozenset({"Project", "Filter", "Relation", "SubqueryAlias"})
_NODE_RE = re.compile(r"^[\s:+-]*'?([A-Za-z]+)")


def _size_bytes(text: str) -> int:
    """Parse a Spark size conf value ("128MB", "4194304", "134217728b")."""
    s = text.strip().lower()
    mult = 1
    for suffix, m in (
        ("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30), ("tb", 1 << 40),
        ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40),
        ("b", 1),
    ):
        if s.endswith(suffix):
            s = s[: -len(suffix)]
            mult = m
            break
    return int(s) * mult


def _estimated_scan_splits(df: DataFrame) -> int | None:
    """Estimate the scan partition count of a file-sourced frame WITHOUT
    physical planning, by replaying Spark's split-packing arithmetic
    (FilePartition.maxSplitBytes + the size-descending greedy packing)
    over the source files' on-disk sizes.  ``df.inputFiles()`` needs only
    the analyzed plan (the file index is already built by the read), so
    this skips the optimizer/planner/RDD conversion the old
    ``df.rdd.getNumPartitions()`` probe paid on every call — driver time
    spent deciding how to save executor time (r15 verdict item 8).

    Returns None (caller falls back to the exact probe) when the frame
    has no file source or any file is not locally stat-able (e.g. a real
    cluster's hdfs:// / s3:// paths, where the exact probe's planning
    cost is the correct price for an exact answer).
    """
    try:
        tree = df._jdf.queryExecution().analyzed().treeString()
        for line in tree.splitlines():
            m = _NODE_RE.match(line)
            if m and m.group(1) not in _SCAN_SHAPED_NODES:
                return None  # not scan-shaped: partitioning != file splits
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — non-file plans, analysis quirks
        return None
    if not files:
        return None
    sizes = []
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            return None
        try:
            sizes.append(os.stat(unquote(parsed.path)).st_size)
        except OSError:
            return None
    sess = df.sparkSession
    conf = sess.conf
    dp = sess.sparkContext.defaultParallelism
    max_pb = _size_bytes(conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    open_cost = _size_bytes(conf.get("spark.sql.files.openCostInBytes", "4MB"))
    min_pn = int(
        conf.get(
            "spark.sql.files.minPartitionNum",
            conf.get("spark.sql.leafNodeDefaultParallelism", str(dp)),
        )
    )
    total = sum(sizes) + open_cost * len(sizes)
    max_split = min(max_pb, max(open_cost, total // max(1, min_pn)))
    chunks: list[int] = []
    for s in sizes:
        while s > max_split:
            chunks.append(max_split)
            s -= max_split
        chunks.append(s)  # parquet: remainder split still emitted
    chunks.sort(reverse=True)
    n, cur = 0, 0
    for c in chunks:
        padded = c + open_cost
        if cur and cur + padded > max_split:
            n += 1
            cur = 0
        cur += padded
    return n + (1 if cur else 0)


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the session's parallelism when the input arrives
    in fewer partitions (a single small parquet file reads as one split,
    serializing CPU-heavy per-row work onto one core). At cluster scale
    inputs arrive in many splits and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    n = _estimated_scan_splits(df)
    if n is None:
        n = df.rdd.getNumPartitions()  # exact probe: pays physical planning
    if n < target:
        return df.repartition(target)
    return df
