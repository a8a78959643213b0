from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the session's parallelism when the input arrives
    in fewer partitions (a single small parquet file reads as one split,
    serializing CPU-heavy per-row work onto one core). At cluster scale
    inputs arrive in many splits and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
