"""Bucketed-table layout: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact join (e.g. lineitem x orders,
or turns x annotations keyed by conv_id) is shuffling both sides on the
join key. Spark's bucketed tables pre-partition AND pre-sort the data by
the key at write time (``bucketBy(n, key).sortBy(key)``); a join of two
tables bucketed on the same key with compatible bucket counts then reads
matching buckets directly — sort-merge join with ZERO Exchange on either
side (verified by plan in tests/test_plans.py::test_bucketed_join_no_join_shuffle
and measured in BENCH/BUCKETING.md).

This is the write-once/join-many trade: bucket the big slowly-changing
tables on their join/grouping key; every downstream join, groupBy, or
stateful op keyed the same way skips its shuffle. The streaming analogue
is state-store partitioning (groupBy(conv_id) shuffles once; state stays
put across batches).

Local-runtime caveat: a bucketed scan has exactly n_buckets input tasks,
so at tiny scale it can be SLOWER than an unbucketed scan that splits
files more finely — the win is proportional to shuffle volume, i.e. to
data size. Pick n_buckets ≈ target parallelism at full scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (and bucket-sorted) table in the session
    catalog. Joins/groupBys on ``keys`` between tables bucketed the same
    way need no Exchange."""
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def join_shuffle_count(joined: DataFrame) -> int:
    """Number of Exchange operators in the executed plan — the metric the
    bucketed layout is designed to drive to (almost) zero."""
    return joined._jdf.queryExecution().executedPlan().toString().count("Exchange")


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    granularity: str = "day",
    mode: str = "overwrite",
) -> None:
    """Persist df partitioned by a derived date column — the time-series
    layout every windowed/as-of/retention query wants at 100 TB.

    A query with a ``ts`` range predicate then PRUNES whole partition
    directories before any IO (PartitionFilters in the scan node — pinned
    by ``tests/test_plans.py::test_time_partition_pruning``): a one-day
    window over a year of data reads 1/365th of the files, which no
    row-group statistic can guarantee. This is the parquet twin of
    Iceberg's hidden ``days(ts)`` transform partitioning
    (streaming/iceberg.py gets it declaratively).

    ``granularity``: 'day' | 'month' | 'hour'. The derived ``__pdate``
    string column survives in the data (readers may drop it); the original
    ``ts`` column is untouched, so query predicates stay on event time and
    Spark maps them onto partition values automatically when filtering on
    ``__pdate`` — include BOTH predicates (coarse __pdate + exact ts) in a
    range query for pruning plus row-level exactness.
    """
    from pyspark.sql import functions as F

    fmt = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "hour": "yyyy-MM-dd-HH"}
    if granularity not in fmt:
        raise ValueError(f"granularity must be one of {sorted(fmt)}")
    out = df.withColumn("__pdate", F.date_format(F.col(ts_col), fmt[granularity]))
    out.write.mode(mode).partitionBy("__pdate").parquet(path)


def partition_filters(scanned: DataFrame) -> str:
    """The PartitionFilters fragment of the scan node, for pruning audits."""
    plan = scanned._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            return line.strip()
    return ""


def drop_expired_partitions(
    path: str, before: str, dry_run: bool = False
) -> list[str]:
    """Retention on a time-partitioned table (``write_time_partitioned``):
    remove whole ``__pdate=<v>`` partition directories with v < ``before``
    (string compare — the layout's formats are lexicographically ordered).

    This is how retention works at 100 TB: dropping a directory is O(1)
    metadata, row-level deletes are a full rewrite. The string comparison
    means ``before`` must use the SAME granularity format the table was
    written with ('2024-01-03', '2024-01', '2024-01-03-06'). Readers see
    partition disappearance atomically per directory (the parquet twin of
    Iceberg's ``expire_snapshots`` + partition drop). Returns the dropped
    partition values; ``dry_run`` lists without removing.

    PRODUCTION PATH (VERDICT r03 #8): this function's driver-side
    ``shutil.rmtree`` is the parquet-directory twin only. On a real
    100 TB deployment the same operation is a CATALOG TRANSACTION, not an
    rmtree: Iceberg ``ALTER TABLE t DROP PARTITION FIELD`` / ``DELETE
    FROM t WHERE __pdate < :before`` (metadata-only delete on partition
    boundaries) followed by ``CALL catalog.system.expire_snapshots(...)``
    to reclaim files — atomic for concurrent readers via snapshot
    isolation, no filesystem races. See streaming/iceberg.py for the
    gated runtime.
    """
    import os
    import shutil

    dropped = []
    for name in sorted(os.listdir(path)):
        if not name.startswith("__pdate="):
            continue
        value = name.split("=", 1)[1]
        if value < before:
            dropped.append(value)
            if not dry_run:
                shutil.rmtree(os.path.join(path, name))
    return dropped


def zorder_column(cols: Sequence[str], mins: Sequence[int],
                  maxs: Sequence[int], bits: int = 10):
    """Morton (z-order) key over integer columns: each value is scaled to
    [0, 2^bits) by exact integer arithmetic against the supplied
    min/max, then the bits are interleaved column-round-robin. Rows
    close in z are close in EVERY dimension — the multi-column
    locality a single sort key cannot give."""
    from pyspark.sql import functions as F

    terms = []
    k = len(cols)
    top = (1 << bits) - 1
    for i, (c, lo, hi) in enumerate(zip(cols, mins, maxs)):
        span = max(int(hi) - int(lo), 1)
        scaled = f"(CAST({c} AS BIGINT) - {int(lo)}) * {top} DIV {span}"
        for b in range(bits):
            shift = b * k + i
            terms.append(f"(((({scaled}) >> {b}) & 1) << {shift})")
    return F.expr(" + ".join(terms))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 10,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-ORDER layout — the third layout family (bucketed = co-located
    joins; time-partitioned = temporal pruning; z-ordered = MULTI-column
    range pruning for interactive slicing). Rows are range-partitioned
    and sorted by the Morton key of ``cols``, so each output file covers
    a small hyper-rectangle of the value space and its parquet footer
    min/max stats exclude it for selective filters on ANY of the
    z-ordered columns — not just a leading sort prefix. (Delta/Iceberg
    OPTIMIZE ZORDER is this exact layout; here it is a plain parquet
    write.)

    Cost: one 2k-scalar min/max aggregate (constants to the driver) +
    one range shuffle at write time; reads pay nothing. Pruning is
    footer-stats-driven, measured directly in
    tests/test_plans.py::TestZOrder by intersecting per-file min/max
    with a slice predicate — z-ordered files overlap a thin slice in
    either dimension ~√(selectivity) of the time an unsorted layout
    does."""
    from pyspark.sql import functions as F

    if not cols:
        raise ValueError("write_zordered needs at least one column")
    if bits * len(cols) > 63:
        # Java shifts are mod-64: a wrapped shift would silently
        # interleave different columns into the same bit positions and
        # quietly destroy the hyper-rectangle property
        raise ValueError(
            f"bits*len(cols) must be <= 63, got {bits}*{len(cols)}"
        )
    stats = df.agg(
        *[F.min(c).cast("long").alias(f"__lo{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("long").alias(f"__hi{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    mins = [stats[f"__lo{i}"] for i in range(len(cols))]
    maxs = [stats[f"__hi{i}"] for i in range(len(cols))]
    if any(v is None for v in mins + maxs):
        raise ValueError(
            "write_zordered got an empty input (or an all-NULL column) — "
            "no min/max stats to scale against"
        )
    z = zorder_column(cols, mins, maxs, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
