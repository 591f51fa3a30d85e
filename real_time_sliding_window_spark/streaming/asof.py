"""Stream-stream AS-OF (temporal) join — a capability Spark lacks natively.

Structured Streaming's built-in stream-stream join supports time-RANGE
conditions (``user_tool_stream_join``) but not "latest right at or before
the left's timestamp" — the as-of semantics the batch operators
(`operators/joins.py::as_of_join` / `as_of_join_union`) implement, and the
join Flink ships as a temporal join. This module closes the gap with one
``applyInPandasWithState`` operator over the UNIONED two-sided stream:

- both sides are packed to a common (key, side, ts, payload-json) schema
  and unioned, so ONE shuffle keys the operator (same discipline as the
  ring buffer);
- per key, rights are buffered within the horizon; each left row is held
  until the event-time watermark passes its timestamp — at that moment no
  right row at-or-before it can still arrive (rights behind the watermark
  are dropped at the source), so the match emitted is FINAL. Append-mode
  exactness, no retractions needed.
- state is bounded: rights older than ``watermark − horizon`` can no
  longer match any pending left (pending lefts all have ts ≥ watermark)
  and are discarded; lefts leave state as they emit. An event-time timer
  wakes the key when the watermark passes its oldest pending left even if
  no new rows arrive.

Determinism: the match rule is identical to the batch operator — latest
right with ``l_ts − horizon ≤ r_ts ≤ l_ts``, ties broken by the packed
payload string descending (caller should put a tiebreaker column first in
the payload struct) — so the streamed output is gated against the SAME
batch oracle in tests.

Payloads ride as JSON strings (``to_json(struct(...))``) so the state
schema stays fixed for any caller schema; unpack with ``from_json``.
"""

from __future__ import annotations

from datetime import timedelta
from typing import Iterator, Sequence, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from real_time_sliding_window_spark.config import interval_str

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("left_ts", TimestampType(), False),
        StructField("left_json", StringType(), False),
        StructField("right_ts", TimestampType(), True),
        StructField("right_json", StringType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("l_ts", ArrayType(LongType()), True),
        StructField("l_pay", ArrayType(StringType()), True),
        StructField("r_ts", ArrayType(LongType()), True),
        StructField("r_pay", ArrayType(StringType()), True),
    ]
)

_EMPTY_I64 = np.empty(0, dtype=np.int64)
_EMPTY_OBJ = np.empty(0, dtype=object)


def _asof_fn(horizon_us: int):
    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            s = state.get
            l_ts = np.asarray(s[0], dtype=np.int64)
            l_pay = np.asarray(s[1], dtype=object)
            r_ts = np.asarray(s[2], dtype=np.int64)
            r_pay = np.asarray(s[3], dtype=object)
        else:
            l_ts, r_ts = _EMPTY_I64, _EMPTY_I64
            l_pay = r_pay = _EMPTY_OBJ

        if not state.hasTimedOut:
            chunks = list(pdfs)
            batch = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            )
            ts = batch["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
            side = batch["side"].to_numpy(dtype=object)
            pay = batch["payload"].to_numpy(dtype=object)
            is_l = side == "L"
            l_ts = np.concatenate([l_ts, ts[is_l]])
            l_pay = np.concatenate([l_pay, pay[is_l]])
            r_ts = np.concatenate([r_ts, ts[~is_l]])
            r_pay = np.concatenate([r_pay, pay[~is_l]])

        # keep right buffer sorted by (ts, payload) — payload desc would
        # need a reverse pass; sort asc and pick the LAST candidate, then
        # resolve ties by max payload among equal-ts candidates
        order = np.lexsort((r_pay.astype(str), r_ts))
        r_ts, r_pay = r_ts[order], r_pay[order]

        wm_us = state.getCurrentWatermarkMs() * 1000
        emit = l_ts < wm_us  # final: no right <= l_ts can still arrive
        out = None
        if emit.any():
            e_ts, e_pay = l_ts[emit], l_pay[emit]
            eorder = np.argsort(e_ts, kind="stable")
            e_ts, e_pay = e_ts[eorder], e_pay[eorder]
            m_ts = np.full(len(e_ts), np.nan)  # float µs; NaN -> NaT
            m_pay = np.empty(len(e_ts), dtype=object)
            for i, lt in enumerate(e_ts):
                hi = int(np.searchsorted(r_ts, lt, side="right"))
                lo = int(np.searchsorted(r_ts, lt - horizon_us, side="left"))
                if hi > lo:
                    cand_ts = r_ts[lo:hi]
                    best_ts = cand_ts[-1]
                    tlo = int(np.searchsorted(cand_ts, best_ts, side="left"))
                    # equal-ts ties: max payload string (tiebreaker-first
                    # payload struct makes this the batch operator's rule)
                    block = r_pay[lo:hi][tlo:]
                    m_ts[i] = float(best_ts)
                    m_pay[i] = max(block.astype(str))
                else:
                    m_pay[i] = None
            out = pd.DataFrame(
                {
                    "key": k,
                    "left_ts": pd.to_datetime(e_ts, unit="us"),
                    "left_json": e_pay,
                    "right_ts": pd.to_datetime(m_ts, unit="us"),
                    "right_json": m_pay,
                }
            )
            l_ts, l_pay = l_ts[~emit], l_pay[~emit]

        # rights older than wm - horizon cannot match any PENDING left
        # (pending lefts all have ts >= wm)
        if wm_us > 0 and len(r_ts):
            keep = r_ts >= wm_us - horizon_us
            r_ts, r_pay = r_ts[keep], r_pay[keep]

        if len(l_ts) == 0 and len(r_ts) == 0:
            state.remove()
        else:
            state.update(
                (l_ts.tolist(), l_pay.tolist(), r_ts.tolist(), r_pay.tolist())
            )
            if len(l_ts):
                # wake when the watermark passes the oldest pending left
                wake_ms = int(l_ts.min()) // 1000 + 1
                state.setTimeoutTimestamp(
                    max(wake_ms, state.getCurrentWatermarkMs() + 1)
                )

        if out is not None:
            yield out

    return fn


def as_of_stream_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    horizon: timedelta = timedelta(hours=1),
    watermark_delay: timedelta = timedelta(seconds=30),
    left_payload: Sequence[str] = (),
    right_payload: Sequence[str] = (),
) -> DataFrame:
    """Streaming as-of join (see module docstring).

    ``left_payload`` / ``right_payload``: columns packed into the json
    payloads (put the tiebreaker column FIRST in right_payload — equal-ts
    ties resolve by payload string descending, matching the batch
    operator's tiebreakers-descending rule for a single tiebreaker).
    Output: (key, left_ts, left_json, right_ts, right_json); unpack with
    ``from_json``. Both inputs must share the key columns.
    """
    if not keys:
        raise ValueError("as_of_stream_join requires at least one key column")
    wm = interval_str(watermark_delay)

    def pack(df: DataFrame, side: str, ts_col: str, payload: Sequence[str]):
        return df.select(
            F.concat_ws("\x1f", *[F.col(k) for k in keys]).alias("key"),
            F.lit(side).alias("side"),
            F.col(ts_col).alias("ts"),
            F.to_json(F.struct(*[F.col(c) for c in payload])).alias("payload"),
        )

    unioned = (
        pack(left, "L", left_ts, left_payload)
        .unionByName(pack(right, "R", right_ts, right_payload))
        .withWatermark("ts", wm)
    )
    horizon_us = round(horizon.total_seconds() * 1e6)
    return unioned.groupBy("key").applyInPandasWithState(
        _asof_fn(horizon_us),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
