"""Interval / as-of joins over event streams.

The reference has no joins (SURVEY.md §2 Table B); the north rule mandates a
stateful stream-stream join of user turns against tool-call turns. The batch
form here is a plain range-predicate join Catalyst can optimize (broadcast
when one side is small, sort-merge otherwise; AQE splits skewed partitions).
The streaming form lives in streaming/pipeline.py (watermarks both sides).
"""

from __future__ import annotations

from datetime import timedelta
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType

from real_time_sliding_window_spark.config import interval_str


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    horizon: timedelta,
    how: str = "inner",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join rows where right.ts in [left.ts, left.ts + horizon], equi on keys.

    Column names are prefixed to avoid collisions. The equi-keys keep this a
    hash/sort-merge join (shuffle on keys) rather than a cross product; the
    range predicate is applied post-match, so skewed keys are the thing to
    watch (AQE skew-join handles the join case).
    """
    lcols = [F.col(f"l.{c}").alias(c if c in keys else f"{left_prefix}{c}") for c in left.columns]
    rcols = [
        F.col(f"r.{c}").alias(f"{right_prefix}{c}")
        for c in right.columns
        if c not in keys
    ]
    cond = F.expr(
        " AND ".join(
            [f"l.{k} = r.{k}" for k in keys]
            + [
                f"r.{right_ts} >= l.{left_ts}",
                f"r.{right_ts} <= l.{left_ts} + interval {interval_str(horizon)}",
            ]
        )
    )
    return left.alias("l").join(right.alias("r"), on=cond, how=how).select(*lcols, *rcols)


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    horizon: timedelta | None = None,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """As-of join: each left row matched to the LATEST right row with
    ``right.ts <= left.ts`` (optionally within ``horizon``), per key.
    ``tiebreakers`` (right-side columns, compared descending) make the
    equal-timestamp case deterministic — required for oracle parity.

    Implementation: bounded interval equi-join (keys + time range — a hash
    join, never a cross product) followed by a rank-1 pick per left row.
    The window's rank-limit pushdown (WindowGroupLimit) keeps only the top
    candidate per left row before the final shuffle. An unbounded as-of
    (no horizon) would make the interval join's state/row count unbounded —
    at scale always pass a horizon (the same reasoning that makes the
    stream-stream join's watermark bound its state).

    DuckDB's native ASOF JOIN is the oracle twin (__spark_entry__).
    """
    if horizon is None:
        horizon = timedelta(days=36500)
    # Surrogate row id on the left BEFORE the join: the rank-1 window must
    # partition by left ROW identity, not by left column values — two
    # identical left rows (legal input) each keep their own match, and the
    # partitioning never depends on column-name conventions. The id must
    # also be DETERMINISTIC under stage retry (ADVICE r02):
    # monotonically_increasing_id depends on partition-internal row order,
    # so a recomputed lineage after executor loss could renumber rows and
    # the __lid window would drop/duplicate matches. Instead: xxhash64 of
    # every left column + a per-duplicate row_number within the hash. Byte-
    # identical rows are interchangeable, so rn swaps among them cannot
    # change the output; distinct rows only share an id on a 2^-64 hash
    # collision. Costs one extra exchange on the left — the union strategy
    # (as_of_join_union) avoids it and is the preferred shape at scale.
    from pyspark.sql.window import Window as _W

    # MapType is unhashable (HASH_MAP_TYPE) — hash map-containing columns
    # through to_json instead (deterministic per row value), so rows
    # differing only in a map column still get distinct hashes and the
    # rn-over-ties step only ever permutes byte-identical rows
    def _contains_map(dt) -> bool:
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, StructType):
            return any(_contains_map(f.dataType) for f in dt.fields)
        if isinstance(dt, ArrayType):
            return _contains_map(dt.elementType)
        return False

    # xxhash64 SKIPS null inputs (the running hash is unchanged by a null
    # column), so null-permutations of each other — (NULL,'a') vs
    # ('a',NULL) — would collide with probability 1 and the rn
    # disambiguator would permute NON-identical rows under retry (ADVICE
    # r03). Interleave a null-indicator per column so only byte-identical
    # rows (same values AND same null pattern) can share __lh.
    hash_cols = []
    for f in left.schema.fields:
        hash_cols.append(F.isnull(F.col(f.name)))
        hash_cols.append(
            F.to_json(F.col(f.name))
            if _contains_map(f.dataType)
            else F.col(f.name)
        )
    tagged = left.withColumn(
        "__lh", F.xxhash64(*hash_cols)
    ).withColumn(
        "__lid",
        F.struct(
            F.col("__lh"),
            F.row_number().over(_W.partitionBy("__lh").orderBy("__lh")),
        ),
    ).drop("__lh")
    lcols = [
        F.col(f"l.{c}").alias(c if c in keys else f"{left_prefix}{c}")
        for c in left.columns
    ]
    rcols = [
        F.col(f"r.{c}").alias(f"{right_prefix}{c}")
        for c in right.columns
        if c not in keys
    ]
    cond = F.expr(
        " AND ".join(
            [f"l.{k} = r.{k}" for k in keys]
            + [
                f"r.{right_ts} <= l.{left_ts}",
                f"r.{right_ts} >= l.{left_ts} - interval {interval_str(horizon)}",
            ]
        )
    )
    joined = tagged.alias("l").join(right.alias("r"), on=cond, how="inner").select(
        F.col("l.__lid").alias("__lid"), *lcols, *rcols
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("__lid").orderBy(
        F.col(f"{right_prefix}{right_ts}").desc(),
        *[F.col(f"{right_prefix}{c}").desc() for c in tiebreakers],
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__lid")
    )


def as_of_join_union(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    horizon: timedelta | None = None,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """As-of join via union + last-value carry — same contract and output
    schema as :func:`as_of_join`, different physical strategy.

    The interval-join + rank plan materializes one row per (left row,
    right row in horizon): with dense right sides and wide horizons the
    candidate volume is |left| × rights-per-horizon — quadratic-ish
    (measured: BENCH/JOINS.md). This plan is the classic merge_asof
    algorithm: tag and UNION both sides, sort per key by (ts, side,
    tiebreakers) with rights ordered before lefts at equal ts, and carry
    the last non-null right payload down with ``last(..., ignoreNulls)``
    over a running frame — exactly one shuffle and one sort of
    |left| + |right| rows, no candidate blow-up, identical results
    (pinned by test + the same driver oracle).

    The horizon is applied post-carry (drop matches older than
    left.ts − horizon) — it bounds nothing here, so unlike
    :func:`as_of_join` an unbounded as-of costs the same as a bounded one.
    """
    rstruct = F.struct(*[F.col(c) for c in right.columns if c not in keys])
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(rstruct.alias("x")).schema["x"].dataType
        ).alias("__r"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__tb_{c}")
          for c in tiebreakers],
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("x")
            ).schema["x"].dataType
        ).alias("__l"),
        rstruct.alias("__r"),
        *[F.col(c).alias(f"__tb_{c}") for c in tiebreakers],
    )
    from pyspark.sql.window import Window

    # rights sort BEFORE lefts at equal ts (inclusive right.ts <= left.ts);
    # among equal-ts rights, ascending tiebreakers so last() picks the max —
    # the same winner as as_of_join's descending rank-1
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__ts").asc(),
            F.col("__is_left").asc(),
            *[F.col(f"__tb_{c}").asc_nulls_first() for c in tiebreakers],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )
    if horizon is not None:
        carried = carried.filter(
            F.col(f"__match.{right_ts}")
            >= F.col("__ts") - F.expr(f"interval {interval_str(horizon)}")
        )
    else:
        carried = carried.filter(F.col("__match").isNotNull())
    return carried.select(
        *[
            F.col(f"__l.{c}").alias(c if c in keys else f"{left_prefix}{c}")
            for c in left.columns
        ],
        *[
            F.col(f"__match.{c}").alias(f"{right_prefix}{c}")
            for c in right.columns
            if c not in keys
        ],
    )


def user_tool_join(
    transcripts: DataFrame,
    horizon: timedelta = timedelta(seconds=10),
    how: str = "leftOuter",
) -> DataFrame:
    """North-rule join: each user turn matched to tool turns in
    [user.ts, user.ts + horizon] within the same conversation (F7)."""
    user = transcripts.filter(F.col("role") == "user").select(
        "conv_id",
        F.col("turn_idx").alias("user_turn_idx"),
        F.col("text").alias("user_text"),
        F.col("ts").alias("user_ts"),
    )
    tool = transcripts.filter(F.col("role") == "tool").select(
        "conv_id",
        F.col("turn_idx").alias("tool_turn_idx"),
        F.col("tool").alias("tool_name"),
        F.col("ts").alias("tool_ts"),
    )
    cond = (
        (user["conv_id"] == tool["conv_id"])
        & (tool["tool_ts"] >= user["user_ts"])
        & (tool["tool_ts"] <= user["user_ts"] + F.expr(f"interval {interval_str(horizon)}"))
    )
    joined = user.join(tool, on=cond, how=how)
    return joined.select(
        user["conv_id"],
        "user_turn_idx",
        "user_text",
        "user_ts",
        "tool_turn_idx",
        "tool_name",
        "tool_ts",
    )
