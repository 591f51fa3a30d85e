"""Bounded-state frequent-items (heavy hitters) per group — Misra-Gries
over unbounded streams (r4).

Exact per-group item counts over an unbounded stream need state
proportional to the distinct-item count; the standard scale answer is
the Misra-Gries summary: m counters per group, with the MERGE rule of
Agarwal et al. ("Mergeability of Summaries", PODS'12) — pointwise-sum
two summaries, subtract the (m+1)-th largest counter from every counter,
drop non-positives. That rule makes per-micro-batch folding EXACTLY a
summary merge, so the streamed result carries the classic guarantees,
pinned by ``TestHeavyHitters``:

- UNDER-estimates only: ``est <= true`` for every item;
- per-group error bound carried IN the state: ``true <= est + err``
  where ``err`` is the total decrement applied (emitted per row), and
  ``err <= N / (m + 1)`` with N the group's total weight;
- every item with true frequency > N/(m+1) is guaranteed tracked.

applyInPandasWithState keyed by the group column, numpy body (exact
value_counts per batch, then one vectorized merge) — the same zero
per-row-Python discipline as the ring buffer. State per group is O(m)
regardless of stream length; NoTimeout (summaries never expire — compose
with the ring's maxDuration upstream if windowed hitters are wanted).
Each invocation emits the group's full current summary (append rows
tagged with a monotonically increasing ``version``): consumers read the
latest version per group, the historical versions are the evolution log.

Reference anchor: no counterpart in the reference (its windows store
every item); this is north-rule scale surface, the frequency twin of
streaming/sketches.py's distinct-count index.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

HH_OUTPUT_SCHEMA = StructType(
    [
        StructField("group", StringType(), False),
        StructField("item", StringType(), False),
        StructField("est_count", LongType(), False),
        StructField("err_bound", LongType(), False),
        StructField("n_total", LongType(), False),
        StructField("version", LongType(), False),
    ]
)

HH_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(StringType()), True),
        StructField("counts", ArrayType(LongType()), True),
        StructField("err", LongType(), True),
        StructField("n_total", LongType(), True),
        StructField("version", LongType(), True),
    ]
)


def make_heavy_hitters_fn(m: int):
    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (grp,) = key
        if state.exists:
            s = state.get
            items = np.asarray(s[0], dtype=object)
            counts = np.asarray(s[1], dtype=np.int64)
            err, n_total, version = int(s[2]), int(s[3]), int(s[4])
        else:
            items = np.empty(0, dtype=object)
            counts = np.empty(0, dtype=np.int64)
            err = n_total = version = 0

        chunks = list(pdfs)
        batch = (
            chunks[0]
            if len(chunks) == 1
            else pd.concat(chunks, ignore_index=True)
        )
        vc = batch["item"].value_counts()
        b_items = vc.index.to_numpy(dtype=object)
        b_counts = vc.to_numpy(dtype=np.int64)
        n_total += int(b_counts.sum())

        # pointwise sum of the two summaries (batch counts are an exact
        # summary of the batch — zero error)
        all_items = np.concatenate([items, b_items])
        all_counts = np.concatenate([counts, b_counts])
        # collapse duplicates (an item tracked in state AND in the batch)
        ser = pd.Series(all_counts).groupby(
            pd.Series(all_items), sort=False
        ).sum()
        items = ser.index.to_numpy(dtype=object)
        counts = ser.to_numpy(dtype=np.int64)

        if len(counts) > m:
            # Agarwal et al. merge: subtract the (m+1)-th largest from
            # all, drop non-positives — at most m survive
            kth = np.partition(counts, -(m + 1))[-(m + 1)]
            err += int(kth)
            counts = counts - kth
            keep = counts > 0
            items, counts = items[keep], counts[keep]

        version += 1
        state.update(
            (items.tolist(), counts.tolist(), err, n_total, version)
        )
        order = np.lexsort((items.astype(str), -counts))
        yield pd.DataFrame(
            {
                "group": grp,
                "item": items[order],
                "est_count": counts[order],
                "err_bound": err,
                "n_total": n_total,
                "version": version,
            }
        )

    return fn


def heavy_hitters_stream(
    stream: DataFrame,
    group_col: str,
    item_col: str,
    m: int = 64,
) -> DataFrame:
    """Wire the Misra-Gries summary onto a stream: one shuffle on
    ``group_col`` feeds the stateful op; each micro-batch emits the
    group's refreshed summary rows.

    LOG-GROWTH CONTRACT (VERDICT r04 #3): with an append sink the output
    is a VERSION LOG — up to m rows per group per micro-batch, growing
    without bound over the stream's life; the current summary is only
    the max-version slice. ``latest_summaries`` is the bounded reader
    (O(m × groups) rows out); when the log itself gets long, compact it
    by rewriting ``latest_summaries`` output and truncating, exactly the
    lease-guarded pattern of ``streaming/live_view.py`` compaction."""
    from pyspark.sql import functions as F

    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    packed = stream.select(
        F.col(group_col).cast("string").alias("group"),
        F.col(item_col).cast("string").alias("item"),
    )
    return packed.groupBy("group").applyInPandasWithState(
        make_heavy_hitters_fn(m),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_summaries(log: DataFrame) -> DataFrame:
    """The bounded query surface over a ``heavy_hitters_stream`` version
    log: exactly the CURRENT summary rows per group (max ``version``),
    same schema as the log. One window-max per group partition — no
    global window, no join; the log's unbounded length never reaches the
    consumer. Use this (or a compacted rewrite of its output) instead of
    hand-rolling the max-version dance."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("group")
    return (
        log.withColumn("__maxv", F.max("version").over(w))
        .filter(F.col("version") == F.col("__maxv"))
        .drop("__maxv")
    )
