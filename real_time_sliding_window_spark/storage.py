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
