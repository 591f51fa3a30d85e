"""N-stage sequence funnel (batch) — the generalized "A followed by B
followed by C within W" pattern over per-key event streams (r5).

Semantics (the greedy earliest chain, the rule every funnel-analytics
engine uses): ``s_1`` = the key's minimum ``us`` among stage-1 events;
``s_i`` = minimum ``us`` among stage-i events with ``us > s_{i-1}``
(strict); the conversion window then cuts the chain — stage i counts
only while ``s_i ≤ s_1 + window``. The chain is monotone, so the cut is
a suffix: once one stage misses the window, all later ones do.

Lowering: k chained RUNNING-MIN expressions over ONE (key)-partitioned
(us, seq) sort — a single Sort+Exchange total, then one hash agg. The
naive plan is k per-key aggregates with k−1 re-joins (2k−1 shuffles).
Correctness of the running form, by induction over stages (the stage-1
argument is ``__spark_entry__.q_funnel_click_error``'s): define
``run_i(r)`` = min ``us`` among stage-i rows BEFORE row r (in (us, seq)
order) whose own ``run_{i-1} < us``. A stage-(i+1) row r satisfies the
global rule ``s_i < r.us`` iff it satisfies ``run_i(r) < r.us``:

- if ``s_i < r.us``, the witness stage-i row w (``w.us = s_i``)
  precedes r in the order (smaller us), and w itself qualified
  (``run_{i-1}(w) < w.us`` by the induction hypothesis applied at w),
  so ``run_i(r) ≤ s_i``; prefix minima never undercut the global
  minimum over qualifying rows, so ``run_i(r) = s_i < r.us``;
- conversely ``run_i(r) < r.us`` exhibits a qualifying stage-i row
  below ``r.us``, so ``s_i ≤ run_i(r) < r.us``.

Each ``withColumn`` is a Project over the SAME window spec, so Catalyst
plans one Window operator chain sharing one Sort+Exchange (plan-guarded
in tests).

Streaming twin: ``streaming/cep.py::sequence_funnel_stream`` (same rule,
watermark-final, randomized-parity-gated against this operator).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sequence_funnel(
    df: DataFrame,
    key_col: str,
    type_col: str,
    stages: Sequence[str],
    window_us: int,
    us_col: str = "us",
    seq_col: str = "seq",
) -> DataFrame:
    """Per-key stage timestamps for the greedy chain, window-cut.

    Output: ``(key_col, stage_1_us .. stage_k_us, stages_reached)`` —
    one row per key that has at least one stage-1 event inside nothing
    (stage 1 has no predecessor constraint); ``stage_i_us`` is NULL from
    the first stage that missed (no qualifying event, or landed past
    ``s_1 + window_us``); ``stages_reached`` counts the non-null prefix.
    ``us_col`` must be int64 event-time (exact micros — see
    ``__spark_entry__._us``); ``seq_col`` breaks equal-``us`` ties in
    the sort (the stable (ts, turn_idx) order), though the match rule
    itself is strict in ``us``."""
    if len(stages) < 1:
        raise ValueError("need at least one stage")
    if window_us <= 0:
        raise ValueError(f"window_us must be positive, got {window_us}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(us_col, seq_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cur = df.select(key_col, us_col, seq_col, type_col)
    run_cols: list[str] = []
    for i, stage in enumerate(stages):
        run = f"__run{i}"
        qualifies: Column = F.col(type_col) == stage
        if i > 0:
            qualifies = qualifies & (
                F.col(run_cols[-1]).isNotNull()
                & (F.col(us_col) > F.col(run_cols[-1]))
            )
        cur = cur.withColumn(
            run, F.min(F.when(qualifies, F.col(us_col))).over(w)
        )
        run_cols.append(run)

    aggs = []
    for i, stage in enumerate(stages):
        if i == 0:
            expr = F.min(
                F.when(F.col(type_col) == stage, F.col(us_col))
            )
        else:
            expr = F.min(
                F.when(
                    (F.col(type_col) == stage)
                    & F.col(run_cols[i - 1]).isNotNull()
                    & (F.col(us_col) > F.col(run_cols[i - 1])),
                    F.col(us_col),
                )
            )
        aggs.append(expr.alias(f"__s{i}"))
    per_key = cur.groupBy(key_col).agg(*aggs).filter(
        F.col("__s0").isNotNull()
    )

    # window cut: stage i survives only while s_i <= s_1 + window (the
    # chain is monotone, so nulling is a suffix); a null predecessor
    # nulls everything after it
    out_cols: list[Column] = [F.col(key_col)]
    valid = F.col("__s0").isNotNull()
    for i in range(len(stages)):
        if i > 0:
            valid = (
                valid
                & F.col(f"__s{i}").isNotNull()
                & (F.col(f"__s{i}") <= F.col("__s0") + F.lit(window_us))
            )
        out_cols.append(
            F.when(valid, F.col(f"__s{i}")).alias(f"stage_{i + 1}_us")
        )
    reached = None
    for i in range(len(stages)):
        c = F.when(F.col(f"stage_{i + 1}_us").isNotNull(), 1).otherwise(0)
        reached = c if reached is None else reached + c
    return per_key.select(*out_cols).withColumn(
        "stages_reached", reached.cast("int")
    )
