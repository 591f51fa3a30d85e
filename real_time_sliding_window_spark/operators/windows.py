"""Tumbling / sliding / session window operators and the on-demand view.

Spark-first rebuild of the reference's window semantics (SURVEY.md §2
Table A):

- bucket assignment (A4) is ``F.window(ts, length[, slide])`` — O(1)
  arithmetic per row inside whole-stage codegen, no scheduler;
- per-bucket metadata (A12/A15) is ``count/min/max`` aggregates with
  map-side partial aggregation;
- ordered content retrieval (A8/A13, the per-turn-text-equality invariant)
  is ``sort_array(collect_list(struct(ts, order, payload...)))`` *inside the
  group* — sorting N small arrays, never a global sort;
- the on-demand bucketed view (A8) is a range filter (predicate pushdown /
  partition pruning does the file skipping the reference's
  ``filterListForTimestampRange`` did by hand) + tumbling bucketing + a
  left join against a generated bucket spine so empty buckets appear, as the
  reference's view guarantees (OnDemandBucketedWindow.kt:104-121).

Boundary parity (SURVEY.md §1.2 note (b)): reference buckets are inclusive
``[start, start + len − 1ns]`` with the next bucket starting 1 ns later;
Spark windows are half-open ``[start, start + len)``. At µs timestamp
resolution these partitions are identical, which tests/test_windows.py
asserts on exact-boundary rows.

All functions are generic over (ts column, key columns, payload columns) so
the same operators serve the transcript schema and the driver's ``events``
table.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_sliding_window_spark.config import ViewArgs, interval_str


def _content_col(ts_col: str, order_cols: Sequence[str], payload_cols: Sequence[str]) -> Column:
    """Array of payload structs in stable (ts, *order_cols) order.

    Struct comparison is lexicographic by field position, so placing ts and
    the tiebreakers first makes sort_array produce the reference's stable
    ordering (reference comparator OnDemandBucketedWindow.kt:56-57,
    generalized to (ts, turn_idx) per SURVEY.md §1.2 note (c)).
    """
    fields = [F.col(ts_col).alias("__ts")]
    fields += [F.col(c).alias(f"__o_{c}") for c in order_cols]
    fields += [F.col(c) for c in payload_cols]
    return F.sort_array(F.collect_list(F.struct(*fields)))


def _std_aggs(ts_col: str) -> list[Column]:
    return [
        F.count(F.lit(1)).alias("n_rows"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
    ]


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    length: timedelta,
    slide: timedelta | None = None,
    keys: Sequence[str] = (),
    extra_aggs: Sequence[Column] = (),
    content_payload: Sequence[str] | None = None,
    order_cols: Sequence[str] = (),
    origin: datetime | None = None,
) -> DataFrame:
    """Tumbling (slide=None) or sliding window aggregation.

    Returns window_start, window_end, *keys, n_rows, first_ts, last_ts
    [, content] [, extra aggs]. The plan is a single hash aggregation with
    partial (map-side) combine; no extra shuffle beyond the group-by.

    ``origin`` shifts bucket boundaries so they align to that instant
    instead of the Unix epoch (F.window's startTime offset) — required by
    the on-demand view, whose buckets start at the caller's ``start``.
    """
    slide_td = slide if slide is not None else length
    if origin is not None:
        offset_us = round(
            (origin - datetime(1970, 1, 1)).total_seconds() * 1e6
        ) % round(slide_td.total_seconds() * 1e6)
        win = F.window(
            ts_col,
            interval_str(length),
            interval_str(slide_td),
            f"{offset_us} microseconds",
        )
    elif slide is None:
        win = F.window(ts_col, interval_str(length))
    else:
        win = F.window(ts_col, interval_str(length), interval_str(slide))
    aggs = _std_aggs(ts_col)
    if content_payload is not None:
        aggs.append(_content_col(ts_col, order_cols, content_payload).alias("content"))
    aggs.extend(extra_aggs)
    out = df.groupBy(win.alias("window"), *[F.col(k) for k in keys]).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[F.col(k) for k in keys],
        *[c for c in out.columns if c != "window" and c not in keys],
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: timedelta | Column,
    keys: Sequence[str] = (),
    extra_aggs: Sequence[Column] = (),
    content_payload: Sequence[str] | None = None,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Session window aggregation via built-in F.session_window.

    session start = first event ts, session end = max over the session of
    (event ts + that event's gap) (Spark semantics; the DuckDB oracle
    replicates this with a gap-based island computation — see
    __spark_entry__.oracle_sql). ``gap`` may be a Column (interval string
    per row) for DYNAMIC gaps — e.g. role-dependent inactivity timeouts;
    an event joins the session while its ts is <= the running
    max(prior ts + prior gap) (inclusive merge, verified cross-engine).
    """
    win = F.session_window(
        ts_col, gap if isinstance(gap, Column) else interval_str(gap)
    )
    aggs = _std_aggs(ts_col)
    if content_payload is not None:
        aggs.append(_content_col(ts_col, order_cols, content_payload).alias("content"))
    aggs.extend(extra_aggs)
    out = df.groupBy(win.alias("session"), *[F.col(k) for k in keys]).agg(*aggs)
    return out.select(
        F.col("session.start").alias("session_start"),
        F.col("session.end").alias("session_end"),
        *[F.col(k) for k in keys],
        *[c for c in out.columns if c != "session" and c not in keys],
    )


def bucket_spine(
    spark: SparkSession, args: ViewArgs
) -> DataFrame:
    """Tiny DataFrame of the view's bucket boundaries [start, end).

    n_buckets rows — broadcast-sized by construction; used so empty buckets
    appear in the on-demand view exactly as the reference returns empty
    Bucket objects (OnDemandBucketedWindow.kt:104-121).
    """
    bucket_us = round(args.resolved_bucket.total_seconds() * 1e6)
    start_lit = F.lit(args.resolved_start)
    return spark.range(args.n_buckets).select(
        F.timestamp_micros(
            F.unix_micros(start_lit) + F.col("id") * F.lit(bucket_us)
        ).alias("bucket_start"),
        F.timestamp_micros(
            F.unix_micros(start_lit) + (F.col("id") + 1) * F.lit(bucket_us)
        ).alias("bucket_end"),
    )


def on_demand_view(
    df: DataFrame,
    args: ViewArgs,
    ts_col: str = "ts",
    keys: Sequence[str] = (),
    content_payload: Sequence[str] | None = None,
    order_cols: Sequence[str] = (),
    extra_aggs: Sequence[Column] = (),
) -> DataFrame:
    """On-demand tumbling-bucketed view (reference A8) as a batch query.

    Pipeline: range filter (pushed to the scan) → tumbling bucket agg →
    right join onto the bucket spine so every bucket in [start, start+length)
    exists even when empty (empty buckets carry n_rows=0 and null metadata).
    When ``keys`` are given, empty buckets are only materialized per existing
    key (cross-joining the spine with all keys would be a scale hazard).
    """
    spark = df.sparkSession
    lo, hi = args.resolved_start, args.resolved_end
    filtered = df.filter((F.col(ts_col) >= F.lit(lo)) & (F.col(ts_col) < F.lit(hi)))
    agg = windowed_agg(
        filtered,
        ts_col,
        args.resolved_bucket,
        keys=keys,
        extra_aggs=extra_aggs,
        content_payload=content_payload,
        order_cols=order_cols,
        origin=lo,
    )
    spine = bucket_spine(spark, args)
    if keys:
        key_spine = spine.crossJoin(filtered.select(*keys).distinct())
        join_on = ["bucket_start"] + list(keys)
        left = key_spine
    else:
        join_on = ["bucket_start"]
        left = spine
    agg = agg.withColumnRenamed("window_start", "bucket_start").withColumnRenamed(
        "window_end", "window_end_drop"
    )
    out = left.join(F.broadcast(agg) if not keys else agg, on=join_on, how="left")
    out = out.drop("window_end_drop")
    return out.withColumn("n_rows", F.coalesce(F.col("n_rows"), F.lit(0)))


def cascading_rollup(
    df: DataFrame,
    ts_col: str,
    levels: Sequence[timedelta],
    keys: Sequence[str] = (),
    sum_cols: Sequence[str] = (),
) -> list[DataFrame]:
    """Hypertable-style multi-resolution rollup: each coarser level is
    re-aggregated FROM the next finer level's partials, never from raw rows.

    At 100 TB this is the continuous-aggregate pattern: the 1-minute level
    reads the corpus once; 1-hour reads the (thousands-of-times smaller)
    1-minute table; 1-day reads 1-hour. Requires every level to divide the
    next (validated) and algebraic aggregates only (count/min/max/sum —
    exactly re-aggregable; content/holistic aggs belong on the finest level
    only). Returns one DataFrame per level, finest first, each with
    window_start/window_end/keys/n_rows/first_ts/last_ts[/sum_*].
    """
    for fine, coarse in zip(levels, levels[1:]):
        if round(coarse.total_seconds() * 1e6) % round(fine.total_seconds() * 1e6):
            raise ValueError(f"level {coarse} is not a multiple of {fine}")
    out: list[DataFrame] = []
    base = windowed_agg(
        df,
        ts_col,
        levels[0],
        keys=keys,
        extra_aggs=[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
    )
    out.append(base)
    prev = base
    for lv in levels[1:]:
        win = F.window("window_start", interval_str(lv))
        agg = prev.groupBy(win.alias("window"), *[F.col(k) for k in keys]).agg(
            F.sum("n_rows").alias("n_rows"),
            F.min("first_ts").alias("first_ts"),
            F.max("last_ts").alias("last_ts"),
            *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        )
        prev = agg.select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[F.col(k) for k in keys],
            *[c for c in agg.columns if c != "window" and c not in keys],
        )
        out.append(prev)
    return out


def top_k_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per key via a ranked analytic window (sort/limit Table B
    category). The physical plan is a single shuffle on ``keys`` followed by
    a per-partition sort — Spark 3.5+/4.x inserts a WindowGroupLimit
    (rank-limit pushdown) so each map task keeps only k rows per key before
    the shuffle; no global sort, no driver collection."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def approx_group_percentiles(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str],
    percentiles: Sequence[float] = (0.5, 0.95),
    accuracy: int = 10000,
) -> DataFrame:
    """The 100 TB percentile path (VERDICT r02 #2): `approx_percentile`
    (Greenwald-Khanna sketch) instead of exact `percentile`.

    Why: exact `percentile` is an ImperativeAggregate that buffers EVERY
    group value in executor memory — one hot group at 100× data is an OOM,
    the one scale-killer plan left in round 2. The GK sketch is bounded
    (O(accuracy·log n) per group), MERGEABLE — so it flows through partial
    (map-side) aggregation like any algebraic agg and never concentrates a
    group's raw values anywhere — and its rank error is ≤ n/accuracy.

    Output: one row per key group with `p_<pct>` columns (double) and
    `n_rows`. Measured value error vs exact at sf0.1 and a 10× synthetic
    blow-up: BENCH/PERCENTILES.md (max relative error ~1e-4 at
    accuracy=10000). The `value_percentiles_approx` driver query gates the
    error bound through the oracle hash (booleans flip on degradation).
    """
    aggs = [
        F.expr(
            f"approx_percentile({value_col}, {p}, {accuracy})"
        ).cast("double").alias(f"p_{str(p).replace('.', '_')}")
        for p in percentiles
    ]
    return df.groupBy(*keys).agg(*aggs, F.count(F.lit(1)).alias("n_rows"))


def ordered_turns(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    order_cols: Sequence[str] = ("turn_idx",),
) -> DataFrame:
    """Stable per-key ordering with an analytic row_number (batch verification
    helper — reference ordering invariant, SURVEY.md §5.5)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(ts_col, *order_cols)
    return df.withColumn("turn_rank", F.row_number().over(w))


def slice_ratio(length: timedelta, slide: timedelta) -> tuple[int, int, int]:
    """The slicing multiple-alignment contract, single-sourced for the
    batch operator AND streaming/pipeline.sliced_sliding_stream (a
    future two-level-slice relaxation must change both twins at once).
    Returns (ratio, slide_us, length_us); raises unless length is a
    positive integer multiple of slide."""
    len_us = round(length.total_seconds() * 1e6)
    sl_us = round(slide.total_seconds() * 1e6)
    if sl_us <= 0 or len_us % sl_us != 0:
        raise ValueError(
            f"length must be a positive integer multiple of slide "
            f"(got {length} / {slide})"
        )
    return len_us // sl_us, sl_us, len_us


def sliced_sliding_agg(
    df: DataFrame,
    ts_col: str,
    length: timedelta,
    slide: timedelta,
    keys: Sequence[str] = (),
    sum_exprs: dict[str, Column] | None = None,
) -> DataFrame:
    """Sliding aggregation by STREAM SLICING (panes): per-slice partials
    combined per window, instead of assigning every row to all
    ``length/slide`` overlapping windows.

    Spark's native ``F.window(ts, length, slide)`` multiplies each input
    row by the overlap factor BEFORE the partial aggregate — at a 1h/1m
    window that is 60× the scan volume entering the aggregation. The
    slicing literature (Li et al., "No Pane, No Gain", SIGMOD Record
    2005; Traub et al., "Efficient Window Aggregation with General
    Stream Slicing", EDBT 2019) cuts this to 1×: aggregate each
    non-overlapping ``slide``-sized slice ONCE, then combine the
    ``length/slide`` slices of each window — the combine runs on the
    slice-count-sized partial table, not the corpus. Same two-shuffle
    plan shape (slice agg rides the partial+final combine; window
    combine is an agg over slices), output IDENTICAL to the native
    operator (the driver query shares the native oracle).

    Restricted, by construction, to slice-decomposable (algebraic)
    aggregates: n_rows, first_ts, last_ts, and the ``sum_exprs``
    ({output_alias: pre-agg Column}); holistic aggregates (exact
    percentiles, ordered content) cannot ride panes — use
    ``windowed_agg`` or the mergeable-sketch path for those.

    ``length`` must be an integer multiple of ``slide`` (the general
    non-multiple case needs Traub's two-level slice model — not needed
    by the reference's bucket semantics, which are multiple-aligned)."""
    ratio, sl_us, len_us = slice_ratio(length, slide)
    sum_exprs = sum_exprs or {}
    slice_win = F.window(ts_col, interval_str(slide))
    partial = df.groupBy(slice_win.alias("slice"), *keys).agg(
        F.count(F.lit(1)).alias("__pn"),
        F.min(ts_col).alias("__pfirst"),
        F.max(ts_col).alias("__plast"),
        *[F.sum(c).alias(f"__ps_{a}") for a, c in sum_exprs.items()],
    )
    k = F.explode(F.sequence(F.lit(0), F.lit(int(ratio - 1)))).alias("__k")
    exploded = partial.select("*", k).select(
        (
            F.col("slice.start")
            - F.col("__k") * F.expr(f"INTERVAL {sl_us} MICROSECONDS")
        ).alias("window_start"),
        *keys,
        "__pn",
        "__pfirst",
        "__plast",
        *[f"__ps_{a}" for a in sum_exprs],
    )
    out = exploded.groupBy("window_start", *keys).agg(
        F.sum("__pn").alias("n_rows"),
        F.min("__pfirst").alias("first_ts"),
        F.max("__plast").alias("last_ts"),
        *[F.sum(f"__ps_{a}").alias(a) for a in sum_exprs],
    )
    return out.select(
        "window_start",
        (
            F.col("window_start") + F.expr(f"INTERVAL {len_us} MICROSECONDS")
        ).alias("window_end"),
        *keys,
        "n_rows",
        "first_ts",
        "last_ts",
        *sum_exprs.keys(),
    )
