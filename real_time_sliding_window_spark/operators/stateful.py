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
from pyspark.sql import functions as F
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


_EMPTY_I64 = np.empty(0, dtype=np.int64)
_EMPTY_I32 = np.empty(0, dtype=np.int32)
_EMPTY_OBJ = np.empty(0, dtype=object)


def make_ring_buffer_fn(
    max_duration: timedelta | None,
    max_data: int | None,
    session_gap: timedelta | None = None,
):
    """Build the applyInPandasWithState body (a closure over the spec).

    The body is pure numpy array algebra — no per-row Python and, just as
    important at 10^4-10^5 groups per micro-batch, no pandas DataFrame
    construction per group except the single output frame: with many small
    conversation groups the per-group constant factor IS the throughput.

    ``session_gap`` (VERDICT r03 #4) adds the one window kind the stateful
    op didn't speak: per-conversation SESSION-CLOSE semantics matching
    ``operators/windows.session_agg`` exactly — a turn joins the open
    session while ``ts <= prev_ts + gap`` (inclusive merge), the session
    closes once the WATERMARK passes ``last_ts + gap`` (so an in-delay
    late turn can still bridge two would-be sessions, just like the
    session_window agg), and closing emits every member turn as
    ``EVICT``/reason ``session`` followed by ONE ``SESSION_END`` marker
    row (``ts`` = session end = last_ts + gap, ``buffer_size`` = member
    count, null turn columns) — the reference's callback surface
    (GenericSubject.kt:37-41) for gap-closed conversations. An
    EventTimeTimeout timer wakes the key at the open session's
    ``last_ts + gap`` so closure fires even when no new turn ever
    arrives; the timer is RE-ARMED on every keep-state invocation
    (EventTimeTimeout registrations do not persist across invocations).
    Composes with maxDuration / maxData, which keep evicting inside the
    open session (eviction order per invocation: session close, then
    age, then capacity).
    """
    max_dur_us = (
        round(max_duration.total_seconds() * 1e6) if max_duration is not None else None
    )
    gap_us = (
        round(session_gap.total_seconds() * 1e6)
        if session_gap is not None
        else None
    )

    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.exists:
            s = state.get
            b_ts = np.asarray(s[0], dtype=np.int64)
            b_ti = np.asarray(s[1], dtype=np.int32)
            b_role = np.asarray(s[2], dtype=object)
            b_text = np.asarray(s[3], dtype=object)
            b_tool = np.asarray(s[4], dtype=object)
        else:
            b_ts, b_ti = _EMPTY_I64, _EMPTY_I32
            b_role = b_text = b_tool = _EMPTY_OBJ

        # output accumulators: (action, reason, ts, ti, role, text, tool, size)
        parts: list[tuple] = []

        if not state.hasTimedOut:
            chunks = list(pdfs)
            batch = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            n_ts = batch["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
            n_ti = batch["turn_idx"].to_numpy().astype(np.int32, copy=False)
            n_role = batch["role"].to_numpy(dtype=object)
            n_text = batch["text"].to_numpy(dtype=object)
            n_tool = batch["tool"].to_numpy(dtype=object)
            order = np.lexsort((n_ti, n_ts))  # stable (ts, turn_idx)
            n_ts, n_ti = n_ts[order], n_ti[order]
            n_role, n_text, n_tool = n_role[order], n_text[order], n_tool[order]

            # Set-dedup on row identity (conv_id, turn_idx): against state
            # and within the batch (first occurrence in (ts, turn_idx) order
            # wins — the skip-list Set semantics made explicit).
            dup = np.isin(n_ti, b_ti)
            _, first_pos = np.unique(n_ti, return_index=True)
            intra = np.ones(len(n_ti), dtype=bool)
            intra[first_pos] = False
            dup |= intra
            if dup.any():
                parts.append(
                    ("DUP", None, n_ts[dup], n_ti[dup], n_role[dup],
                     n_text[dup], n_tool[dup], len(b_ts))
                )
            if not dup.all():
                keep = ~dup
                f_ts, f_ti = n_ts[keep], n_ti[keep]
                f_role, f_text, f_tool = n_role[keep], n_text[keep], n_tool[keep]
                b_ts = np.concatenate([b_ts, f_ts])
                b_ti = np.concatenate([b_ti, f_ti])
                b_role = np.concatenate([b_role, f_role])
                b_text = np.concatenate([b_text, f_text])
                b_tool = np.concatenate([b_tool, f_tool])
                order = np.lexsort((b_ti, b_ts))
                b_ts, b_ti = b_ts[order], b_ti[order]
                b_role, b_text, b_tool = b_role[order], b_text[order], b_tool[order]
                parts.append(
                    ("ADD", None, f_ts, f_ti, f_role, f_text, f_tool, len(b_ts))
                )

        wm_us = state.getCurrentWatermarkMs() * 1000

        # --- session close: watermark passed last_ts + gap ---------------
        if gap_us is not None and wm_us > 0 and len(b_ts):
            # session end indices on the (ts, turn_idx)-sorted buffer:
            # a new session starts where the inter-turn gap EXCEEDS the
            # session gap (inclusive merge, matching session_agg)
            bounds = np.flatnonzero(np.diff(b_ts) > gap_us)
            ends = np.append(bounds, len(b_ts) - 1)
            # sessions close in ts order, so closed is a prefix: every
            # session whose end (last_ts + gap) is STRICTLY below the
            # watermark is final — merge is inclusive (a turn at exactly
            # last_ts + gap extends the session) and rows with ts >= wm
            # are still admissible, so wm == end is not yet closeable
            n_closed = int(
                np.searchsorted(b_ts[ends] + gap_us, wm_us, side="left")
            )
            if n_closed:
                starts = np.concatenate(([0], ends[:-1] + 1))
                cut = int(ends[n_closed - 1]) + 1
                remaining = len(b_ts) - cut
                for si in range(n_closed):
                    lo, hi = int(starts[si]), int(ends[si]) + 1
                    parts.append(
                        ("EVICT", "session", b_ts[lo:hi], b_ti[lo:hi],
                         b_role[lo:hi], b_text[lo:hi], b_tool[lo:hi],
                         remaining)
                    )
                    parts.append(
                        ("SESSION_END", None,
                         np.array([int(b_ts[hi - 1]) + gap_us],
                                  dtype=np.int64),
                         np.array([None], dtype=object),
                         np.array([None], dtype=object),
                         np.array([None], dtype=object),
                         np.array([None], dtype=object),
                         hi - lo)
                    )
                b_ts, b_ti = b_ts[cut:], b_ti[cut:]
                b_role, b_text, b_tool = (
                    b_role[cut:], b_text[cut:], b_tool[cut:]
                )

        # --- age eviction: cutoff = watermark − max_duration -------------
        if max_dur_us is not None and wm_us > 0 and len(b_ts):
            cutoff = wm_us - max_dur_us
            n_aged = int(np.searchsorted(b_ts, cutoff, side="left"))
            if n_aged:
                parts.append(
                    ("EVICT", "age", b_ts[:n_aged], b_ti[:n_aged],
                     b_role[:n_aged], b_text[:n_aged], b_tool[:n_aged],
                     len(b_ts) - n_aged)
                )
                b_ts, b_ti = b_ts[n_aged:], b_ti[n_aged:]
                b_role, b_text, b_tool = (
                    b_role[n_aged:], b_text[n_aged:], b_tool[n_aged:]
                )

        # --- capacity eviction: oldest-first beyond max_data -------------
        if max_data is not None and len(b_ts) > max_data:
            k = len(b_ts) - max_data
            parts.append(
                ("EVICT", "capacity", b_ts[:k], b_ti[:k],
                 b_role[:k], b_text[:k], b_tool[:k], max_data)
            )
            b_ts, b_ti = b_ts[k:], b_ti[k:]
            b_role, b_text, b_tool = b_role[k:], b_text[k:], b_tool[k:]

        if len(b_ts) == 0:
            state.remove()
        else:
            state.update(
                (b_ts.tolist(), b_ti.tolist(), b_role.tolist(),
                 b_text.tolist(), b_tool.tolist())
            )
            # earliest pending wake: age expiry of the oldest row and/or
            # the open session's close boundary (must be > watermark)
            wakes_us = []
            if max_dur_us is not None:
                wakes_us.append(int(b_ts[0]) + max_dur_us)
            if gap_us is not None:
                # FIRST unclosed session's end on the post-eviction buffer
                nb = np.flatnonzero(np.diff(b_ts) > gap_us)
                wakes_us.append(
                    int(b_ts[nb[0]] if len(nb) else b_ts[-1]) + gap_us
                )
            if wakes_us:
                state.setTimeoutTimestamp(
                    max(min(wakes_us) // 1000,
                        state.getCurrentWatermarkMs() + 1)
                )

        if parts:
            n_out = sum(len(p[2]) for p in parts)
            action = np.empty(n_out, dtype=object)
            reason = np.empty(n_out, dtype=object)
            size = np.empty(n_out, dtype=np.int32)
            at = 0
            for p in parts:
                m = len(p[2])
                action[at:at + m] = p[0]
                reason[at:at + m] = p[1]
                size[at:at + m] = p[7]
                at += m
            yield pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "action": action,
                    "reason": reason,
                    "turn_idx": np.concatenate([p[3] for p in parts]),
                    "role": np.concatenate([p[4] for p in parts]),
                    "text": np.concatenate([p[5] for p in parts]),
                    "tool": np.concatenate([p[6] for p in parts]),
                    "ts": np.concatenate([p[2] for p in parts]).astype(
                        "datetime64[us]"
                    ),
                    "buffer_size": size,
                }
            )

    return fn


def ring_buffer_stream(
    transcripts: DataFrame,
    watermark_delay: timedelta,
    max_duration: timedelta | None = None,
    max_data: int | None = None,
    session_gap: timedelta | None = None,
) -> DataFrame:
    """Wire the stateful ring buffer onto a (streaming) transcript DataFrame.

    One shuffle (groupBy conv_id) feeds the stateful operator; watermark
    drives age eviction, session close (``session_gap`` — see
    make_ring_buffer_fn) and the event-time timeout. For skewed conv_ids
    see operators/skew.py (stateful-op skew is not fixed by AQE —
    SURVEY.md §4.3). Session-gap mode requires the unsharded operator:
    per-shard gap computation would see a subsample of the conversation
    and split sessions a full view would merge.
    """
    from real_time_sliding_window_spark.config import interval_str

    wm = transcripts.withWatermark("ts", interval_str(watermark_delay))
    fn = make_ring_buffer_fn(max_duration, max_data, session_gap)
    return wm.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout
        if max_duration is not None or session_gap is not None
        else GroupStateTimeout.NoTimeout,
    )


def sharded_ring_buffer_stream(
    transcripts: DataFrame,
    watermark_delay: timedelta,
    max_duration: timedelta | None = None,
    max_data: int | None = None,
    n_shards: int = 8,
    session_gap: timedelta | None = None,
) -> DataFrame:
    """Hot-conversation mitigation (VERDICT r02 #7): sub-key salting with
    per-shard ring buffers.

    ``ring_buffer_stream`` routes ALL turns of one conv_id through one
    state task per micro-batch — correct, but a single 10^6-turn
    conversation caps at single-task throughput (measured ceiling in
    BENCH/SKEW.md). This variant shards the group key to
    (conv_id, hash(turn_idx) % n_shards), so a hot conversation spreads
    over n_shards parallel state tasks.

    Semantics vs the unsharded operator, stated precisely:

    - **dedup (DUP rows): EXACT** — a given (conv_id, turn_idx) always
      hashes to the same shard, so redeliveries meet their original.
    - **age eviction (maxDuration): EXACT** — the cutoff is
      watermark − max_duration, identical in every shard; the union of
      shard buffers equals the unsharded buffer.
    - **capacity eviction (maxData): APPROXIMATE** — the global
      oldest-first ring becomes shard-local oldest-first with per-shard
      capacity ceil(max_data / n_shards). Because turn_idx hashing sends a
      near-uniform sample of the stream to each shard, shard-local oldest
      ≈ global oldest; total buffered rows are ≤ n_shards·ceil(max_data /
      n_shards) (≤ max_data + n_shards − 1). Exact capacity semantics
      require the unsharded operator.
    - ``buffer_size`` reports the SHARD's buffer size, not the
      conversation's; ``shard`` is exposed so callers can sum.

    - **session close (session_gap): UNSUPPORTED — raises** (VERDICT
      r04 #5). Each shard sees a ~1/n_shards subsample of the
      conversation, so a shard's last-seen ts UNDER-estimates the
      conversation's and shard-local closure (wm > shard_last + gap)
      fires while the conversation is still active — false SESSION_END
      events with partial content. An exact design needs a second
      per-conv_id merge stage closing on max over shards of last_ts,
      with all shards releasing content coordinately; until that stage
      exists the operator refuses rather than emitting wrong boundaries.
      A hot conversation needing session semantics uses the unsharded
      ``ring_buffer_stream`` (session bookkeeping is O(1) per turn — the
      single-task ceiling applies to content volume, BENCH/SKEW.md).

    Use when one conversation's turn rate exceeds one core's state
    throughput; otherwise prefer ``ring_buffer_stream``.
    """
    from real_time_sliding_window_spark.config import interval_str

    if session_gap is not None:
        raise ValueError(
            "session_gap is not supported with sharding: a shard-local "
            "last-ts under-estimates the conversation's and would close "
            "sessions early (false SESSION_END with partial content). "
            "Use ring_buffer_stream for session-gap semantics."
        )
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    per_shard_cap = (
        -(-max_data // n_shards) if max_data is not None else None
    )
    wm = transcripts.withWatermark("ts", interval_str(watermark_delay))
    sharded = wm.withColumn(
        "shard", F.pmod(F.xxhash64("turn_idx"), F.lit(n_shards)).cast("int")
    )
    fn = make_ring_buffer_fn(max_duration, per_shard_cap)
    out_fields = [StructField("shard", IntegerType())] + list(OUTPUT_SCHEMA)
    return sharded.groupBy("conv_id", "shard").applyInPandasWithState(
        _with_shard_key(fn),
        outputStructType=StructType(out_fields),
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout
        if max_duration is not None
        else GroupStateTimeout.NoTimeout,
    )


def _with_shard_key(fn):
    """Adapt the 1-key ring body to a (conv_id, shard) key: run it on the
    conv_id and prepend the shard column to each yielded frame."""

    def wrapped(key, pdfs, state):
        conv_id, shard = key
        for frame in fn((conv_id,), pdfs, state):
            frame.insert(0, "shard", np.full(len(frame), shard, dtype=np.int32))
            yield frame

    return wrapped


def ring_state_from_actions(actions: DataFrame) -> DataFrame:
    """Reconstruct each conversation's CURRENT buffer from the emitted
    ADD/DUP/EVICT action log — event-sourcing replay.

    The action rows are a complete state history: a turn is in the buffer
    iff it was ADDed and never EVICTed (DUPs never changed state), so the
    live contents are one left-anti join over the log — the ring-buffer
    analogue of the reference's ``currentBucket`` getter (the windowed
    twin is streaming/live_view.py), computable from any sink that kept
    the log, with no access to the state store. Output: one row per
    buffered turn, ordered by the buffer's (ts, turn_idx) invariant via
    ``turn_rank``.
    """
    from pyspark.sql.window import Window as SqlWindow

    adds = actions.filter(F.col("action") == "ADD").select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    evicts = actions.filter(F.col("action") == "EVICT").select(
        "conv_id", "turn_idx"
    )
    live = adds.join(evicts, ["conv_id", "turn_idx"], "left_anti")
    w = SqlWindow.partitionBy("conv_id").orderBy("ts", "turn_idx")
    return live.withColumn("turn_rank", F.row_number().over(w))
