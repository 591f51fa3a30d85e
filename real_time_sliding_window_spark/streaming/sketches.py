"""Incremental distinct-count index — mergeable HLL sketches through the
exactly-once sink (r4).

The suite's distinct operators are EXACT (`dropDuplicatesWithinWatermark`,
windowed distinct, `distinct_user_types`): right for correctness gates,
but an exact per-key distinct over 10^12 turns keeps every key's value
set in state. The 100 TB answer is the mergeable-sketch pattern Spark 4
ships natively (DataSketches HLL: `hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate`): each micro-batch appends ONE fixed-size sketch
row per group to the index table, and the query side unions sketches —
state per (group × batch) is O(2^lgk) bytes regardless of cardinality.

The contract, pinned by ``TestDistinctSketchIndex`` and stated at the
precision DataSketches actually guarantees (both stronger claims were
TRIED and measured false — kept documented so nobody re-promises them):

- cross-batch repeats dedup by construction (a value seen in ten
  batches counts once) — this is the property exact streaming distinct
  pays unbounded state for;
- the estimate is DETERMINISTIC for a given index (re-running the
  query, or rebuilding the same batches, reproduces it bit-for-bit);
- any batch cut estimates within the standard HLL error
  (~1.04/√2^lgk ≈ 1.6% at the lgk=12 default) of the true distinct.
  The exact estimate value CAN shift by a fraction of a percent with
  merge history (measured: 601 vs 597 vs 596 on 600 true): direct
  builds keep the more accurate HIP estimator which unions cannot
  preserve, and the union gadget's mode promotions (coupon list → set
  → dense HLL) depend on the grouping of inputs. Register content is
  order-insensitive; the ESTIMATOR CHOICE is not.

No DuckDB oracle — DuckDB's approx_count_distinct is a different HLL
implementation with no cross-engine register parity.

Same incremental-index shape as ``retrieval.run_postings_index`` and
``neardup_guard``: per-batch rows through the exactly-once sink
(redelivery-idempotent), aggregation at query time. Unlike postings, a
value MAY arrive in many batches — HLL union dedups across batches by
construction, so this index needs NO upstream exact dedup.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_distinct_index(
    stream: DataFrame,
    sink,
    checkpoint: str,
    key_cols: Sequence[str],
    value_col: str,
    lgk: int = 12,
):
    """Drain the stream, appending one (keys..., sketch) row per group
    per micro-batch to ``sink``. The sketch aggregation runs INSIDE
    foreachBatch (batch-local, like the postings index) — cross-batch
    merging happens losslessly at query time, so no streaming state is
    held at all."""

    def _body(batch: DataFrame, batch_id: int) -> None:
        sink.write_batch(
            batch.groupBy(*key_cols).agg(
                F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias(
                    "sketch"
                )
            ),
            batch_id,
        )

    q = (
        stream.writeStream.foreachBatch(_body)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .queryName("distinct-sketch-index")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def distinct_estimates(
    index: DataFrame,
    key_cols: Sequence[str],
    since_batch: int | None = None,
) -> DataFrame:
    """Query side: union each group's per-batch sketches and estimate.
    One partial+final aggregate over fixed-size binary values — the
    shuffle moves sketches, never value sets.

    LOG-GROWTH / RETENTION (VERDICT r04 #3): the index grows one row per
    group per batch forever. ``since_batch`` prunes the union to batches
    >= that id — pass an index read with
    ``sink.read_committed(spark, with_batch_id=True)`` so the batch_id
    column exists (row-group stats prune the scan). Semantics are the
    sliding-retention ones: the estimate covers values first seen in the
    KEPT batches (a value seen only before the horizon is forgotten —
    sketches union values, they cannot subtract). For permanent
    retention, periodically rewrite each group's prefix as ONE unioned
    sketch row (``hll_union_agg`` then re-append under the oldest kept
    batch_id) — merge-history shifts the estimate sub-percent (module
    docstring) but keeps the log bounded."""
    if since_batch is not None:
        if "batch_id" not in index.columns:
            raise ValueError(
                "since_batch needs an index read with with_batch_id=True"
            )
        index = index.filter(F.col("batch_id") >= since_batch)
    return index.groupBy(*key_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "approx_distinct"
        )
    )


def run_cm_index(
    stream: DataFrame,
    sink,
    checkpoint: str,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
):
    """Incremental FREQUENCY index — per-batch count-min sketches
    (operators/cm_sketch.py) through the exactly-once sink. Each
    micro-batch appends its batch-local sketch rows (≤ depth×width of
    them); because integer matrices ADD, ``cm_totals`` over the
    accumulated index is BIT-identical to a batch sketch of the whole
    corpus — the lossless Gramian-index property, not the HLL estimator
    caveat. Redelivered batches dedup via the sink's commit marker.

    Unlike the postings index there is NO append-only-unique-id
    contract: a key may arrive in any number of batches — counts are
    meant to accumulate."""
    from ..operators.cm_sketch import cm_sketch

    def _body(batch: DataFrame, batch_id: int) -> None:
        sink.write_batch(
            cm_sketch(
                batch, key_col, depth=depth, width=width,
                weight_col=weight_col,
            ),
            batch_id,
        )

    q = (
        stream.writeStream.foreachBatch(_body)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .queryName("cm-frequency-index")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def cm_totals(index: DataFrame, since_batch: int | None = None) -> DataFrame:
    """Query side of the frequency index: pointwise-sum the per-batch
    sketch rows into the current matrix (ready for
    ``cm_sketch.cm_estimate``). One sketch-sized hash agg.

    LOG-GROWTH / RETENTION: the index grows ≤ depth×width rows per
    batch. ``since_batch`` gives sliding retention (estimates cover kept
    batches only — exact subtraction of expired batches is valid for CM,
    unlike HLL, precisely because the matrix is additive); for permanent
    retention compact by rewriting the prefix as one summed sketch under
    the oldest kept batch_id — BIT-lossless here, no estimator shift."""
    if since_batch is not None:
        if "batch_id" not in index.columns:
            raise ValueError(
                "since_batch needs an index read with with_batch_id=True"
            )
        index = index.filter(F.col("batch_id") >= since_batch)
    return index.groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))
