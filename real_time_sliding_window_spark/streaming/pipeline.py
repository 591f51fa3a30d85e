"""Structured Streaming pipelines: windowed aggregation + stream-stream join.

The reference's scheduler-driven bucket rotation (A4/A5) maps to Structured
Streaming's trigger + watermark machinery: a window group is finalized and
emitted (append mode) when the watermark passes window end — the analogue of
``currentBucketEnd`` firing, with late rows dropped instead of racing a lock
(reference tolerates a rotate-mid-add race, ``BucketData.kt:54-57``).

Everything here is the built-in engine: no custom state, no UDFs — the
entire aggregation runs JVM-side in whole-stage codegen with partial
aggregation before the shuffle.
"""

from __future__ import annotations

from datetime import timedelta
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from real_time_sliding_window_spark.config import WindowSpec, interval_str


def windowed_stream(
    stream: DataFrame,
    spec: WindowSpec,
    ts_col: str = "ts",
    keys: Sequence[str] = (),
    extra_aggs: Sequence[Column] = (),
    content_payload: Sequence[str] | None = None,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Streaming windowed aggregation per WindowSpec (tumbling/sliding/session).

    Emits one row per closed window (append output mode downstream):
    window_start, window_end, *keys, n_rows, first_ts, last_ts[, content].
    """
    wm = stream.withWatermark(ts_col, spec.watermark_interval)
    if spec.kind == "session":
        win = F.session_window(ts_col, spec.gap_interval)
    elif spec.kind == "sliding":
        win = F.window(ts_col, spec.length_interval, spec.slide_interval)
    else:
        win = F.window(ts_col, spec.length_interval)

    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
    ]
    if content_payload is not None:
        fields = [F.col(ts_col).alias("__ts")]
        fields += [F.col(c).alias(f"__o_{c}") for c in order_cols]
        fields += [F.col(c) for c in content_payload]
        aggs.append(F.sort_array(F.collect_list(F.struct(*fields))).alias("content"))
    aggs.extend(extra_aggs)

    out = wm.groupBy(win.alias("window"), *[F.col(k) for k in keys]).agg(*aggs)
    # session windows surface as session_start/session_end, matching the
    # batch operator (operators/windows.py::session_agg)
    prefix = "session" if spec.kind == "session" else "window"
    return out.select(
        F.col("window.start").alias(f"{prefix}_start"),
        F.col("window.end").alias(f"{prefix}_end"),
        *[F.col(k) for k in keys],
        *[c for c in out.columns if c != "window" and c not in keys],
    )


def deduped_stream(
    stream: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    ts_col: str = "ts",
    watermark_delay: timedelta = timedelta(seconds=30),
) -> DataFrame:
    """Idempotent-ingest guard: drop redelivered rows by identity key.

    ``dropDuplicatesWithinWatermark`` keeps dedup state only within the
    watermark horizon (bounded state — the skip-list Set semantics of the
    reference, OnDemandBucketedWindow.kt:53-58, with an explicit TTL). Use
    upstream of windowed aggs when the source is at-least-once; the ring
    buffer (operators/stateful.py) already dedups internally and emits DUP
    rows instead of silently dropping.
    """
    wm = stream.withWatermark(ts_col, interval_str(watermark_delay))
    return wm.dropDuplicatesWithinWatermark(list(keys))


_INTERVAL_UNIT_S = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def _interval_seconds(interval: str) -> int:
    """Parse 'N second(s)/minute(s)/hour(s)/day(s)' to whole seconds."""
    import re

    m = re.fullmatch(r"\s*(\d+)\s+(second|minute|hour|day)s?\s*", interval)
    if not m:
        raise ValueError(
            f"unsupported interval {interval!r}: use 'N second|minute|hour|day'"
        )
    return int(m.group(1)) * _INTERVAL_UNIT_S[m.group(2)]


def pivoted_stream(
    stream: DataFrame,
    type_col: str,
    types: Sequence[str],
    ts_col: str = "ts",
    window_length: str = "1 day",
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Streaming twin of the batch pivot query (VERDICT r02 #10).

    ``.pivot()`` is rejected on streaming DataFrames, but Catalyst lowers a
    batch pivot to conditional aggregates anyway — so the streaming twin IS
    that lowered form, written out: one ``count(CASE WHEN type = t)`` per
    pivot value, single pass, map-side partials, append-mode emit when the
    watermark closes the window. Column contract matches
    ``q_events_type_pivot`` (window_start, n_<type>...).
    """
    wm = stream.withWatermark(ts_col, watermark_delay)
    aggs = [
        F.count(F.when(F.col(type_col) == t, 1)).alias(f"n_{t}")
        for t in types
    ]
    out = wm.groupBy(F.window(ts_col, window_length).alias("w")).agg(*aggs)
    return out.select(F.col("w.start").alias("window_start"), *[
        F.col(f"n_{t}") for t in types
    ])


def percentile_stream(
    stream: DataFrame,
    value_col: str,
    percentiles: Sequence[float] = (0.5, 0.95),
    keys: Sequence[str] = (),
    ts_col: str = "ts",
    window_length: str = "1 day",
    watermark_delay: str = "1 minute",
    accuracy: int = 10000,
) -> DataFrame:
    """Streaming twin of the percentile queries (VERDICT r02 #10 family).

    Exact ``percentile()`` cannot stream (holistic — it would buffer every
    group value in state forever); the GK sketch CAN, because it is
    mergeable: each micro-batch folds its rows into the windowed sketch
    state, state size stays O(accuracy·log n) per group, and the final
    quantiles emit when the watermark closes the window. The same
    accuracy/regime semantics as the batch operator
    (``operators/windows.py::approx_group_percentiles``): exact discrete
    order statistics while group n ≤ accuracy, rank error ≤ n/accuracy
    beyond (BENCH/PERCENTILES.md). Column contract matches the batch
    operator (window_start, *keys, p_<pct>..., n_rows).
    """
    wm = stream.withWatermark(ts_col, watermark_delay)
    p_names = [f"p_{str(p).replace('.', '_')}" for p in percentiles]
    aggs = [
        F.expr(
            f"approx_percentile({value_col}, {p}, {accuracy})"
        ).cast("double").alias(name)
        for p, name in zip(percentiles, p_names)
    ]
    out = wm.groupBy(
        F.window(ts_col, window_length).alias("__w"),
        *[F.col(k) for k in keys],
    ).agg(*aggs, F.count(F.lit(1)).alias("n_rows"))
    return out.select(
        F.col("__w.start").alias("window_start"),
        *[F.col(k) for k in keys],
        *p_names,
        "n_rows",
    )


def distinct_per_window_stream(
    stream: DataFrame,
    distinct_col: str,
    keys: Sequence[str] = (),
    ts_col: str = "ts",
    window_length: str = "1 hour",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Streaming twin of exact count(DISTINCT x) per window (VERDICT r02
    #10) — streaming aggs reject count_distinct, so stage it: assign the
    window bucket, ``dropDuplicatesWithinWatermark`` on (bucket, keys, x)
    — dedup state is bounded by the watermark horizon, and the surviving
    row count per (bucket, keys) IS the distinct count — then a plain
    streaming windowed count over the survivors. Exact (not
    approx_count_distinct), two bounded-state stateful operators back to
    back. Column contract matches ``q_distinct_users_per_day``
    (window_start, *keys, n_users).

    EXACTNESS PRECONDITION (enforced): ``watermark_delay >=
    window_length``. ``dropDuplicatesWithinWatermark`` only guarantees
    dedup for rows whose event times are within the delay of each other;
    two same-key rows in one window can be up to window_length apart, so a
    shorter delay lets dedup state expire mid-window and re-admits the key
    — a silent overcount. The bound is also the state-size story: dedup
    state ≈ one row per distinct (window, keys, x) in the open horizon.

    The dedup bucket is PLAIN integer arithmetic (epoch-aligned, exactly
    ``F.window``'s tumbling assignment), not the window struct: the struct
    carries the event-time marker, and an event-time column inside the
    dedup key defeats the duplicate comparison (measured: in-batch dups
    survive) besides colliding with ``ts`` as a second event-time column.
    """
    secs = _interval_seconds(window_length)
    if _interval_seconds(watermark_delay) < secs:
        raise ValueError(
            f"watermark_delay ({watermark_delay!r}) must be >= window_length "
            f"({window_length!r}): dedup state would expire mid-window and "
            "re-admit keys, overcounting distincts"
        )
    wm = stream.withWatermark(ts_col, watermark_delay)
    bucketed = wm.withColumn(
        "__b", (F.floor(F.unix_timestamp(ts_col) / secs) * secs).cast("long")
    )
    deduped = bucketed.dropDuplicatesWithinWatermark(
        ["__b", *keys, distinct_col]
    )
    out = deduped.groupBy(
        F.window(ts_col, window_length).alias("__w"),
        *[F.col(k) for k in keys],
    ).agg(F.count(F.lit(1)).alias("n_users"))
    return out.select(
        F.col("__w.start").alias("window_start"),
        *[F.col(k) for k in keys],
        "n_users",
    )


def enriched_stream(
    stream: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    how: str = "left",
    broadcast: bool | None = None,
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch hash-joins against
    the (re-evaluated per batch) static DataFrame — no state, no watermark
    needed; the streaming side never shuffles for the join when the dim
    broadcasts. The standard pattern for decorating turns with
    slowly-changing metadata (tool registry, user segments).

    ``broadcast``: True forces the broadcast hint (caller asserts the dim
    fits in executor memory); False forbids it; None (default) lets
    AQE/autoBroadcastJoinThreshold decide from the dim's actual size — the
    safe default, since force-broadcasting a large dim every micro-batch
    is a driver/executor OOM at scale (ADVICE r02)."""
    if broadcast is True:
        dim = F.broadcast(dim)
    elif broadcast is False:
        dim = dim.hint("shuffle_hash")
    return stream.join(dim, on=list(keys), how=how)


def user_tool_stream_join(
    transcripts: DataFrame,
    horizon: timedelta = timedelta(seconds=10),
    watermark_delay: timedelta = timedelta(seconds=2),
    how: str = "leftOuter",
) -> DataFrame:
    """North-rule stateful stream-stream join (F7): each user turn joined to
    tool turns of the same conversation within [user.ts, user.ts + horizon].

    Both sides carry watermarks; the time-range predicate bounds join state
    so Spark can discard user state past (watermark − horizon) and tool
    state past the watermark — built-in state cleanup, no custom operator.
    Outer-join results for unmatched user turns emit once the watermark
    passes the horizon.
    """
    wm_iv = interval_str(watermark_delay)
    user = (
        transcripts.filter(F.col("role") == "user")
        .select(
            F.col("conv_id").alias("u_conv_id"),
            F.col("turn_idx").alias("user_turn_idx"),
            F.col("text").alias("user_text"),
            F.col("ts").alias("user_ts"),
        )
        .withWatermark("user_ts", wm_iv)
    )
    tool = (
        transcripts.filter(F.col("role") == "tool")
        .select(
            F.col("conv_id").alias("t_conv_id"),
            F.col("turn_idx").alias("tool_turn_idx"),
            F.col("tool").alias("tool_name"),
            F.col("ts").alias("tool_ts"),
        )
        .withWatermark("tool_ts", wm_iv)
    )
    cond = F.expr(
        "u_conv_id = t_conv_id AND "
        "tool_ts >= user_ts AND "
        f"tool_ts <= user_ts + interval {interval_str(horizon)}"
    )
    joined = user.join(tool, on=cond, how=how)
    return joined.select(
        F.col("u_conv_id").alias("conv_id"),
        "user_turn_idx",
        "user_text",
        "user_ts",
        "tool_turn_idx",
        "tool_name",
        "tool_ts",
    )


def sliced_sliding_stream(
    stream: DataFrame,
    ts_col: str,
    length: timedelta,
    slide: timedelta,
    keys: Sequence[str] = (),
    sum_exprs: dict[str, Column] | None = None,
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """Streaming twin of ``operators/windows.py::sliced_sliding_agg`` —
    stream slicing via Spark 4's CHAINED stateful aggregations (the
    multiple-stateful-operators capability, 3.4+): stage 1 aggregates
    tumbling ``slide``-sized slices, stage 2 re-windows the slice struct
    into the sliding windows and combines partials. Each input row
    crosses the first (corpus-sized) shuffle ONCE; only slice partials —
    corpus-size-independent — enter the overlap-factor explode, exactly
    the batch operator's asymptotics but with both stages watermark-
    driven and append-final. Same algebraic-aggregates restriction;
    drained output equals the batch operator row-for-row (pytest gate).
    """
    from real_time_sliding_window_spark.operators.windows import slice_ratio

    slice_ratio(length, slide)  # shared multiple-alignment contract
    sum_exprs = sum_exprs or {}
    wm = stream.withWatermark(ts_col, watermark_delay)
    slices = wm.groupBy(
        F.window(ts_col, interval_str(slide)).alias("slice"),
        *[F.col(k) for k in keys],
    ).agg(
        F.count(F.lit(1)).alias("__pn"),
        F.min(ts_col).alias("__pfirst"),
        F.max(ts_col).alias("__plast"),
        *[F.sum(c).alias(f"__ps_{a}") for a, c in sum_exprs.items()],
    )
    wins = slices.groupBy(
        F.window(
            F.col("slice"), interval_str(length), interval_str(slide)
        ).alias("window"),
        *[F.col(k) for k in keys],
    ).agg(
        F.sum("__pn").alias("n_rows"),
        F.min("__pfirst").alias("first_ts"),
        F.max("__plast").alias("last_ts"),
        *[F.sum(f"__ps_{a}").alias(a) for a in sum_exprs],
    )
    return wins.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[F.col(k) for k in keys],
        "n_rows",
        "first_ts",
        "last_ts",
        *sum_exprs.keys(),
    )
