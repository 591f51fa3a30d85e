"""Per-conversation stateful ring buffer — the engine's custom operator core.

Generalizes the reference's two eviction mechanisms (SURVEY.md §2 A5-A7)
into one event-time stateful operator implemented with
``applyInPandasWithState`` (PySpark's flatMapGroupsWithState), keyed by
``conv_id``:

- **maxDuration** (the on-demand window's age expiry,
  ``OnDemandBucketedWindow.kt:161-191``: cutoff = now − length): rows whose
  ``ts`` fall behind ``watermark − max_duration`` are evicted; the watermark
  plays the reference's wall-clock "now".
- **maxData** (the fixed window's capacity eviction,
  ``FixedTumblingBucketedWindow.kt:170-179``: evict oldest bucket at
  capacity, firing ``NonCurrentBucketRemoving`` *before* removal): when the
  buffer exceeds ``max_data`` turns, the oldest rows are evicted
  oldest-first.

Observable output replaces the reference's observer callbacks
(``GenericSubject.kt:37-41``) with action rows:

- ``ADD``    — a turn accepted into the buffer (onAdd);
- ``DUP``    — a redelivered ``(conv_id, turn_idx)`` ignored (the skip-list
  Set dedup semantics, ``OnDemandBucketedWindow.kt:53-58``, made explicit);
- ``EVICT`` / reason ``capacity`` — count eviction, oldest-first
  (removal-order invariant, ``FixedTumblingBucketedWindowTest.kt:442-490``);
- ``EVICT`` / reason ``age`` — maxDuration expiry (also fired on event-time
  timeout when no new data arrives for the key).

State is held as parallel arrays (Arrow-friendly flat struct of lists); the
pandas body is fully vectorized — no per-row Python in the hot path
(input_hint mandate). Scale notes: state size is bounded by
``max_data`` × row width (or watermark horizon × rate for pure timed mode);
one shuffle on ``conv_id`` feeds the operator; the RocksDB state store
(configured in session.py) keeps large state off-heap.
"""

from __future__ import annotations

from datetime import timedelta
from typing import Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("action", StringType(), False),
        StructField("reason", StringType(), True),
        StructField("turn_idx", IntegerType(), True),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
        StructField("buffer_size", IntegerType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("ts_us", ArrayType(LongType()), True),
        StructField("turn_idx", ArrayType(IntegerType()), True),
        StructField("role", ArrayType(StringType()), True),
        StructField("text", ArrayType(StringType()), True),
        StructField("tool", ArrayType(StringType()), True),
    ]
)


def _ts_to_us(series: pd.Series) -> pd.Series:
    """Robust datetime64[any-unit] -> int64 microseconds (pandas 2 may hand
    Arrow batches over as datetime64[us] or [ns] depending on the path)."""
    return series.astype("datetime64[us]").astype("int64")


def _buffer_frame(state_tuple) -> pd.DataFrame:
    ts_us, turn_idx, role, text, tool = state_tuple
    return pd.DataFrame(
        {
            "ts_us": np.asarray(ts_us, dtype=np.int64),
            "turn_idx": np.asarray(turn_idx, dtype=np.int32),
            "role": role,
            "text": text,
            "tool": tool,
        }
    )


def _out_rows(conv_id: str, pdf: pd.DataFrame, action: str, reason, size: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "action": action,
            "reason": reason,
            "turn_idx": pdf["turn_idx"].astype("int32"),
            "role": pdf["role"],
            "text": pdf["text"],
            "tool": pdf["tool"],
            "ts": pd.to_datetime(pdf["ts_us"], unit="us"),
            "buffer_size": np.int32(size),
        }
    )


def make_ring_buffer_fn(max_duration: timedelta | None, max_data: int | None):
    """Build the applyInPandasWithState body (a closure over the spec)."""
    max_dur_us = (
        round(max_duration.total_seconds() * 1e6) if max_duration is not None else None
    )

    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        buf = (
            _buffer_frame(state.get)
            if state.exists
            else _buffer_frame(([], [], [], [], []))
        )
        outputs: list[pd.DataFrame] = []

        if not state.hasTimedOut:
            batch = pd.concat(list(pdfs), ignore_index=True)
            batch = batch.sort_values(["ts", "turn_idx"], kind="mergesort")
            # Set-dedup on row identity (conv_id, turn_idx)
            dup_mask = batch["turn_idx"].isin(buf["turn_idx"]).to_numpy() | (
                batch["turn_idx"].duplicated(keep="first").to_numpy()
            )
            dups = batch[dup_mask]
            fresh = batch[~dup_mask]
            if len(dups):
                d = dups.assign(ts_us=_ts_to_us(dups["ts"]))
                outputs.append(_out_rows(conv_id, d, "DUP", None, len(buf)))
            if len(fresh):
                add = pd.DataFrame(
                    {
                        "ts_us": _ts_to_us(fresh["ts"]),
                        "turn_idx": fresh["turn_idx"].astype("int32"),
                        "role": fresh["role"],
                        "text": fresh["text"],
                        "tool": fresh["tool"],
                    }
                )
                buf = pd.concat([buf, add], ignore_index=True)
                buf = buf.sort_values(["ts_us", "turn_idx"], kind="mergesort").reset_index(
                    drop=True
                )
                outputs.append(_out_rows(conv_id, add, "ADD", None, len(buf)))

        # --- age eviction: cutoff = watermark − max_duration -------------
        wm_us = state.getCurrentWatermarkMs() * 1000
        if max_dur_us is not None and wm_us > 0:
            cutoff = wm_us - max_dur_us
            aged = buf["ts_us"] < cutoff
            if aged.any():
                evicted = buf[aged]
                outputs.append(
                    _out_rows(conv_id, evicted, "EVICT", "age", int((~aged).sum()))
                )
                buf = buf[~aged].reset_index(drop=True)

        # --- capacity eviction: oldest-first beyond max_data -------------
        if max_data is not None and len(buf) > max_data:
            n_evict = len(buf) - max_data
            evicted = buf.iloc[:n_evict]
            outputs.append(
                _out_rows(conv_id, evicted, "EVICT", "capacity", max_data)
            )
            buf = buf.iloc[n_evict:].reset_index(drop=True)

        if len(buf) == 0:
            state.remove()
        else:
            state.update(
                (
                    buf["ts_us"].tolist(),
                    buf["turn_idx"].tolist(),
                    buf["role"].tolist(),
                    buf["text"].tolist(),
                    buf["tool"].tolist(),
                )
            )
            if max_dur_us is not None:
                # wake when the oldest row expires (must be > watermark)
                expire_ms = (int(buf["ts_us"].iloc[0]) + max_dur_us) // 1000
                state.setTimeoutTimestamp(max(expire_ms, state.getCurrentWatermarkMs() + 1))

        if outputs:
            yield pd.concat(outputs, ignore_index=True)

    return fn


def ring_buffer_stream(
    transcripts: DataFrame,
    watermark_delay: timedelta,
    max_duration: timedelta | None = None,
    max_data: int | None = None,
) -> DataFrame:
    """Wire the stateful ring buffer onto a (streaming) transcript DataFrame.

    One shuffle (groupBy conv_id) feeds the stateful operator; watermark
    drives both age eviction and the event-time timeout. For skewed
    conv_ids see operators/skew.py (stateful-op skew is not fixed by AQE —
    SURVEY.md §4.3).
    """
    from real_time_sliding_window_spark.config import interval_str

    wm = transcripts.withWatermark("ts", interval_str(watermark_delay))
    fn = make_ring_buffer_fn(max_duration, max_data)
    return wm.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout
        if max_duration is not None
        else GroupStateTimeout.NoTimeout,
    )
