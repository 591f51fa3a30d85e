"""Skew handling: salted two-level aggregation for hot conversation keys.

AQE's skew-join splitting covers joins but NOT stateful/grouping operators
(SURVEY.md §4.3): one conversation with 10^7 turns still lands on one task
in a plain ``groupBy(conv_id)``. The standard fix is a salted two-level
aggregation:

  level 1: group by (conv_id, window, salt = pmod(hash(turn_idx), K)) —
           partial results spread over K tasks;
  level 2: group by (conv_id, window) — combine K partials.

Counts/min/max/sum recombine exactly; ordered content recombines by
flattening the K sorted slices and sorting once more (each slice is tiny
relative to the window, and struct sort keys make the merge stable).

Correctness is salt-invariant (tests/test_scale_ops.py F8); BENCH compares
runtimes hot-key vs salted.
"""

from __future__ import annotations

from datetime import timedelta
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_sliding_window_spark.config import interval_str


def salted_windowed_agg(
    df: DataFrame,
    ts_col: str,
    length: timedelta,
    keys: Sequence[str] = ("conv_id",),
    salt_col: str = "turn_idx",
    n_salts: int = 16,
    content_payload: Sequence[str] | None = None,
    order_cols: Sequence[str] = ("turn_idx",),
    merge_content: bool = True,
) -> DataFrame:
    """Tumbling window aggregation with two-level salting on hot keys.

    Where salting actually matters (measured, BENCH/SKEW.md): ALGEBRAIC
    aggregates (count/min/max/sum) are already skew-immune — Catalyst's
    partial aggregation combines them map-side, so the hot key's reducer
    only merges one tiny partial per map task. The skew pain is HOLISTIC
    aggregates (collect_list content): every row of the hot window ships to
    and sorts on one reducer. Salting parallelizes that collect+sort across
    n_salts reducers; the level-2 merge re-sorts the concatenated shards in
    one task, which is cheap compared to the level-1 work but still O(hot
    window) in one place.

    ``merge_content=False`` is the extreme-skew mode: return one row PER
    (window, keys, shard) with its sorted content slice and skip the
    single-task merge entirely — at 10^7-turn windows the merged array is
    gigabytes in ONE output row, which no plan should materialize. Shards
    are hash(salt_col)-disjoint, NOT range-disjoint, so concatenating them
    in shard order does not yield the global ordering — reassemble
    losslessly by k-way merge-sorting the (already sorted) shards, or by
    flattening and re-sorting, or feed directly into shard-wise downstream
    processing.
    """
    win = F.window(ts_col, interval_str(length))
    salt = F.pmod(F.hash(F.col(salt_col)), F.lit(n_salts)).alias("__salt")

    partial_aggs = [
        F.count(F.lit(1)).alias("__n"),
        F.min(ts_col).alias("__min_ts"),
        F.max(ts_col).alias("__max_ts"),
    ]
    if content_payload is not None:
        fields = [F.col(ts_col).alias("__ts")]
        fields += [F.col(c).alias(f"__o_{c}") for c in order_cols]
        fields += [F.col(c) for c in content_payload]
        partial_aggs.append(
            F.sort_array(F.collect_list(F.struct(*fields))).alias("__content")
        )

    partial = df.groupBy(win.alias("window"), *keys, salt).agg(*partial_aggs)

    if content_payload is not None and not merge_content:
        return partial.select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            F.col("__salt").alias("shard"),
            F.col("__n").alias("n_rows"),
            F.col("__min_ts").alias("first_ts"),
            F.col("__max_ts").alias("last_ts"),
            F.col("__content").alias("content"),
        )

    final_aggs = [
        F.sum("__n").alias("n_rows"),
        F.min("__min_ts").alias("first_ts"),
        F.max("__max_ts").alias("last_ts"),
    ]
    if content_payload is not None:
        final_aggs.append(
            F.sort_array(F.flatten(F.collect_list("__content"))).alias("content")
        )
    out = partial.groupBy("window", *keys).agg(*final_aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *[c for c in out.columns if c != "window" and c not in keys],
    )
