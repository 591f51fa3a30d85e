"""Small plan-shaping utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the input has fewer partitions than the cluster can
    use in parallel.

    Heavy per-row expression work (minhash signatures, simhash bit sums,
    shingle explosion) is compute-bound, and a small parquet input arrives
    as a single partition under ``spark.sql.files.maxPartitionBytes`` — one
    task, zero parallelism. At production scale the scan naturally has
    thousands of splits and this is a no-op (the condition never triggers),
    so the extra shuffle is only ever paid on inputs small enough for it to
    be trivially cheap.
    """
    if df.isStreaming:
        # no .rdd on streaming plans; micro-batch partitioning comes from
        # the source (maxFilesPerTrigger / topic partitions) — pass through
        # so the stateless doc operators (chunking, sampling, text) compose
        # with readStream unchanged
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
