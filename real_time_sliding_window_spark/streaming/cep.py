"""Streaming CEP (complex-event-processing) operators — watermark-final
transition pairs, conversion-window funnels (2-stage and N-stage
rounds), and maximal-run (Kleene A+) emission via ``runs_stream``, whose
islands-minus-open-tail relation to the batch query is stated in its
docstring (r5).

The batch entry queries ``event_transitions`` and ``funnel_click_error``
answer turn-taking questions AFTER the fact; these are their streaming
twins — the pattern-detection surface Flink ships as CEP / temporal
pattern matching, built on the suite's proven stateful discipline
(``streaming/asof.py``): one shuffle on the key, per-key numpy state,
watermark-FINAL append emission (no retractions), ALWAYS-re-armed
event-time timers so idle keys still finalize.

``transitions_stream`` — emits every consecutive (from_type → to_type)
pair per key under the stable (ts, seq) order. A pair is emitted exactly
once, when the watermark passes its LATER event (at that point no event
can still arrive between the two — anything earlier is late and dropped
at the source). Pairs bridge micro-batches: the last finalized event is
kept as the bridge, so cross-batch pairs match the batch ``lead()``
exactly (pinned by randomized parity tests). State per key: the bridge
event + the unfinalized tail (watermark-horizon-bounded, the ring's
bound). ``max_idle`` is an EVENT-TIME session rule: pairs spanning a gap
larger than it are suppressed — by event time, never by arrival batching
— which is also what makes bridge REAPING sound (a bridge older than
``watermark − max_idle`` can never pair again: any future event sits at
``ts ≥ watermark``, so its gap already exceeds the rule). Without
``max_idle`` the semantics equal batch ``lead()`` (pairs across any gap)
and bridges live as long as the key.

``funnel_stream`` — per key, the first ``first_type`` event and the
first ``then_type`` event STRICTLY after it within a CONVERSION WINDOW.
The window is what makes streaming finality possible at all: with an
unbounded funnel (the batch query's semantics) a conversion can arrive
arbitrarily late and no append-mode row is ever final. A key's row
emits exactly once, when the watermark passes ``first + window`` (every
qualifying conversion is behind the watermark by then), and the key's
state collapses to a TOMBSTONE — one-shot means later ``first_type``
events must never restart the key, and a tombstone is the only way to
guarantee that independent of how events were batched into triggers
(an emitted-then-removed key would resurrect on its next event). State:
(pending tail + 2 longs) per un-emitted key, one tombstone row per
emitted key; rolling (restarting) funnels are ``sequence_funnel_stream``
rounds. Batch-equivalence: with ``window`` ≥ the stream's span the
emitted rows equal the batch funnel query exactly (the parity gate in
tests).
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
)

from real_time_sliding_window_spark.config import interval_str

TRANSITIONS_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("from_type", StringType(), False),
        StructField("to_type", StringType(), False),
        StructField("from_us", LongType(), False),
        StructField("to_us", LongType(), False),
    ]
)

_TRANSITIONS_STATE_SCHEMA = StructType(
    [
        StructField("us", ArrayType(LongType()), True),
        StructField("seq", ArrayType(LongType()), True),
        StructField("typ", ArrayType(StringType()), True),
        StructField("bridge_us", LongType(), True),
        StructField("bridge_typ", StringType(), True),
    ]
)

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("first_us", LongType(), False),
        StructField("then_us", LongType(), True),
        StructField("latency_us", LongType(), True),
    ]
)

_FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("us", ArrayType(LongType()), True),
        StructField("seq", ArrayType(LongType()), True),
        StructField("typ", ArrayType(StringType()), True),
        StructField("first_us", LongType(), True),
        StructField("then_us", LongType(), True),
    ]
)

_EMPTY_I64 = np.empty(0, dtype=np.int64)
_EMPTY_OBJ = np.empty(0, dtype=object)


def _pack(
    stream: DataFrame,
    key_col: str,
    type_col: str,
    ts_col: str,
    seq_col: str,
    watermark_delay: timedelta,
) -> DataFrame:
    """Shared operator prelude: watermark + the (key, ts, seq, typ)
    normalization + NULL-key filter. One definition so the four CEP
    operators (transitions, funnel, sequence funnel, runs) cannot drift
    apart on key-null policy or seq handling."""
    wm = interval_str(watermark_delay)
    return (
        stream.withWatermark(ts_col, wm)
        .select(
            F.col(key_col).cast("string").alias("key"),
            F.col(ts_col).alias("ts"),
            F.col(seq_col).cast("long").alias("seq"),
            F.col(type_col).cast("string").alias("typ"),
        )
        .filter(F.col("key").isNotNull())
    )


def _merge_batch(pdfs, us, seq, typ, timed_out):
    """Append this invocation's rows (if any) to the pending arrays."""
    if timed_out:
        return us, seq, typ
    chunks = list(pdfs)
    if not chunks:
        return us, seq, typ
    batch = chunks[0] if len(chunks) == 1 else pd.concat(
        chunks, ignore_index=True
    )
    b_us = batch["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    b_seq = batch["seq"].to_numpy(dtype=np.int64)
    b_typ = batch["typ"].to_numpy(dtype=object)
    return (
        np.concatenate([us, b_us]),
        np.concatenate([seq, b_seq]),
        np.concatenate([typ, b_typ]),
    )


def _transitions_fn(max_idle_us: int | None):
    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            s = state.get
            us = np.asarray(s[0], dtype=np.int64)
            seq = np.asarray(s[1], dtype=np.int64)
            typ = np.asarray(s[2], dtype=object)
            bridge_us = s[3] if s[3] is not None else None
            bridge_typ = s[4]
        else:
            us, seq, typ = _EMPTY_I64, _EMPTY_I64, _EMPTY_OBJ
            bridge_us = bridge_typ = None

        us, seq, typ = _merge_batch(pdfs, us, seq, typ, state.hasTimedOut)

        wm_us = state.getCurrentWatermarkMs() * 1000
        order = np.lexsort((seq, us))
        us, seq, typ = us[order], seq[order], typ[order]
        final = us < wm_us

        out = None
        if final.any():
            f_us, f_typ = us[final], typ[final]
            # chain: bridge (if any) -> finalized events, consecutive pairs
            if bridge_us is not None:
                c_us = np.concatenate([[bridge_us], f_us])
                c_typ = np.concatenate([[bridge_typ], f_typ])
            else:
                c_us, c_typ = f_us, f_typ
            if len(c_us) >= 2:
                out = pd.DataFrame(
                    {
                        "key": k,
                        "from_type": c_typ[:-1],
                        "to_type": c_typ[1:],
                        "from_us": c_us[:-1],
                        "to_us": c_us[1:],
                    }
                )
                if max_idle_us is not None:
                    # EVENT-TIME session rule: a pair spanning a gap
                    # larger than max_idle is suppressed regardless of
                    # which micro-batches carried the two events —
                    # output must not depend on arrival batching
                    out = out[out.to_us - out.from_us <= max_idle_us]
                    if out.empty:
                        out = None
            bridge_us = int(f_us[-1])
            bridge_typ = f_typ[-1]
            us, seq, typ = us[~final], seq[~final], typ[~final]

        idle_reaped = (
            max_idle_us is not None
            and len(us) == 0
            and bridge_us is not None
            and wm_us - bridge_us > max_idle_us
        )
        if idle_reaped or (len(us) == 0 and bridge_us is None):
            state.remove()
        else:
            state.update(
                (us.tolist(), seq.tolist(), typ.tolist(),
                 bridge_us, bridge_typ)
            )
            # re-arm EVERY invocation (timer registrations don't persist):
            # wake when the watermark passes the oldest pending event, or
            # for bridge-only keys with an idle horizon, at reap time
            if len(us):
                wake_ms = int(us.min()) // 1000 + 1
                state.setTimeoutTimestamp(
                    max(wake_ms, state.getCurrentWatermarkMs() + 1)
                )
            elif max_idle_us is not None:
                wake_ms = (bridge_us + max_idle_us) // 1000 + 1
                state.setTimeoutTimestamp(
                    max(wake_ms, state.getCurrentWatermarkMs() + 1)
                )

        if out is not None:
            yield out

    return fn


def transitions_stream(
    stream: DataFrame,
    key_col: str,
    type_col: str,
    ts_col: str = "ts",
    seq_col: str = "event_id",
    watermark_delay: timedelta = timedelta(seconds=30),
    max_idle: timedelta | None = None,
) -> DataFrame:
    """Streaming transition pairs (module docstring). Output one row per
    consecutive (from → to) event pair per key, emitted exactly once
    when the later event is behind the watermark. ``seq_col`` breaks
    equal-timestamp ties (the reference's (ts, turn_idx) stable order);
    aggregate downstream for the transition matrix."""
    max_idle_us = (
        int(max_idle.total_seconds() * 1_000_000)
        if max_idle is not None
        else None
    )
    packed = _pack(stream, key_col, type_col, ts_col, seq_col, watermark_delay)
    return packed.groupBy("key").applyInPandasWithState(
        _transitions_fn(max_idle_us),
        outputStructType=TRANSITIONS_OUTPUT_SCHEMA,
        stateStructType=_TRANSITIONS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


_FUNNEL_DONE = -1  # tombstone sentinel in the first_us state slot


def _funnel_fn(first_type: str, then_type: str, window_us: int):
    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            s = state.get
            if s[3] == _FUNNEL_DONE:
                # TOMBSTONE: this key already emitted its one row. Drain
                # and discard the batch — without this marker, events
                # pending at emission time (or arriving after) would
                # restart the funnel, making the output depend on how
                # events were batched into triggers. One-shot semantics
                # on an unbounded stream costs one tombstone row per
                # emitted key, forever (state ∝ keys, the transitions
                # bridge bound); rolling funnels are
                # sequence_funnel_stream's job.
                list(pdfs)
                state.update(([], [], [], _FUNNEL_DONE, None))
                return
            us = np.asarray(s[0], dtype=np.int64)
            seq = np.asarray(s[1], dtype=np.int64)
            typ = np.asarray(s[2], dtype=object)
            first_us = s[3] if s[3] is not None else None
            then_us = s[4]
        else:
            us, seq, typ = _EMPTY_I64, _EMPTY_I64, _EMPTY_OBJ
            first_us = then_us = None

        us, seq, typ = _merge_batch(pdfs, us, seq, typ, state.hasTimedOut)

        wm_us = state.getCurrentWatermarkMs() * 1000
        order = np.lexsort((seq, us))
        us, seq, typ = us[order], seq[order], typ[order]
        final = us < wm_us
        if final.any():
            # fold finalized events in order into the (first, then) pair
            for u, t in zip(us[final], typ[final]):
                u = int(u)
                if t == first_type and (first_us is None or u < first_us):
                    first_us = u
                    # a NEW earlier first invalidates a conversion that
                    # is no longer inside (first, first+window]... it
                    # cannot: events fold in ts order, so first_us only
                    # decreases before any conversion at higher ts is
                    # seen; window re-check below keeps it honest anyway
                    if then_us is not None and (
                        then_us <= first_us
                        or then_us > first_us + window_us
                    ):
                        then_us = None
                elif (
                    t == then_type
                    and first_us is not None
                    and then_us is None
                    and first_us < u <= first_us + window_us
                ):
                    then_us = u
            us, seq, typ = us[~final], seq[~final], typ[~final]

        out = None
        if first_us is not None and wm_us > first_us + window_us:
            # window closed: no qualifying conversion can still arrive
            # (it would be <= first+window < wm — late, dropped at source)
            out = pd.DataFrame(
                {
                    "key": [k],
                    "first_us": [first_us],
                    "then_us": [then_us],
                    "latency_us": [
                        then_us - first_us if then_us is not None else None
                    ],
                }
            )
            # tombstone, never remove: see the state.exists branch
            state.update(([], [], [], _FUNNEL_DONE, None))
        elif len(us) == 0 and first_us is None:
            state.remove()
        else:
            state.update(
                (us.tolist(), seq.tolist(), typ.tolist(), first_us, then_us)
            )
            # wake at whichever finalization comes first: oldest pending
            # event, or the funnel window closing
            wakes = []
            if len(us):
                wakes.append(int(us.min()) // 1000 + 1)
            if first_us is not None:
                wakes.append((first_us + window_us) // 1000 + 1)
            state.setTimeoutTimestamp(
                max(min(wakes), state.getCurrentWatermarkMs() + 1)
            )

        if out is not None:
            yield out

    return fn


SEQUENCE_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("stage_us", ArrayType(LongType()), False),
        StructField("stages_reached", LongType(), False),
    ]
)

_SEQUENCE_STATE_SCHEMA = StructType(
    [
        StructField("us", ArrayType(LongType()), True),
        StructField("seq", ArrayType(LongType()), True),
        StructField("typ", ArrayType(StringType()), True),
        StructField("matched", ArrayType(LongType()), True),
    ]
)


def _sequence_fn(stages: tuple, window_us: int):
    k = len(stages)

    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (kk,) = key
        if state.exists:
            s = state.get
            us = np.asarray(s[0], dtype=np.int64)
            seq = np.asarray(s[1], dtype=np.int64)
            typ = np.asarray(s[2], dtype=object)
            matched = list(s[3]) if s[3] is not None else []
        else:
            us, seq, typ = _EMPTY_I64, _EMPTY_I64, _EMPTY_OBJ
            matched = []

        us, seq, typ = _merge_batch(pdfs, us, seq, typ, state.hasTimedOut)

        wm_us = state.getCurrentWatermarkMs() * 1000
        order = np.lexsort((seq, us))
        us, seq, typ = us[order], seq[order], typ[order]
        final = us < wm_us
        rounds: list[list[int]] = []
        if final.any():
            # event-time-deterministic ROUND state machine: a round
            # closes when it completes, or when an event lands past its
            # stage-1 window — and that same event may then open the
            # next round. Round boundaries depend only on event times,
            # never on how events were batched.
            for u, t in zip(us[final], typ[final]):
                u = int(u)
                if matched and len(matched) < k and (
                    u > matched[0] + window_us
                ):
                    rounds.append(matched)
                    matched = []
                if t == stages[len(matched)]:
                    if not matched:
                        matched.append(u)  # ts-ordered fold: first == min
                    elif (
                        u > matched[-1]
                        and u <= matched[0] + window_us
                    ):
                        matched.append(u)
                    if len(matched) == k:
                        # full match: built from FINAL events and the
                        # greedy chain never revises — emits immediately
                        rounds.append(matched)
                        matched = []
            us, seq, typ = us[~final], seq[~final], typ[~final]

        # the open round closes by WATERMARK once its window is shut
        # (no event can still arrive inside it)
        if matched and wm_us > matched[0] + window_us:
            rounds.append(matched)
            matched = []

        out = None
        if rounds:
            out = pd.DataFrame(
                {
                    "key": kk,
                    "stage_us": rounds,
                    "stages_reached": [len(r) for r in rounds],
                }
            )

        if len(us) == 0 and len(matched) == 0:
            state.remove()
        else:
            state.update((us.tolist(), seq.tolist(), typ.tolist(), matched))
            wakes = []
            if len(us):
                wakes.append(int(us.min()) // 1000 + 1)
            if matched:
                wakes.append((matched[0] + window_us) // 1000 + 1)
            state.setTimeoutTimestamp(
                max(min(wakes), state.getCurrentWatermarkMs() + 1)
            )

        if out is not None:
            yield out

    return fn


def sequence_funnel_stream(
    stream: DataFrame,
    key_col: str,
    type_col: str,
    stages: Sequence[str],
    window: timedelta,
    ts_col: str = "ts",
    seq_col: str = "event_id",
    watermark_delay: timedelta = timedelta(seconds=30),
) -> DataFrame:
    """N-stage streaming sequence funnel — the generalized Flink-CEP
    "followed-by" chain, same greedy-earliest-within-window rule as the
    batch ``operators/funnel.py::sequence_funnel``. The stream emits
    ROUNDS: the key's event sequence is partitioned greedily — a round
    closes when it completes (emitting EARLY: its events are final and
    the greedy chain never revises) or when an event lands past its
    stage-1 window, in which case that event may open the next round.
    Round boundaries are functions of EVENT TIMES only, never arrival
    batching (the transitions max_idle lesson). The FIRST round per key
    equals the batch operator exactly (randomized parity gate); later
    rounds are the streaming extra — rolling funnels a batch recompute
    would need windowed re-runs to see. State: pending tail + the open
    round's ≤ k timestamps; keys leave state whenever both are empty."""
    if len(stages) < 1:
        raise ValueError("need at least one stage")
    if window <= timedelta(0):
        raise ValueError(f"window must be positive, got {window}")
    window_us = int(window.total_seconds() * 1_000_000)
    packed = _pack(stream, key_col, type_col, ts_col, seq_col, watermark_delay)
    return packed.groupBy("key").applyInPandasWithState(
        _sequence_fn(tuple(stages), window_us),
        outputStructType=SEQUENCE_OUTPUT_SCHEMA,
        stateStructType=_SEQUENCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def funnel_stream(
    stream: DataFrame,
    key_col: str,
    type_col: str,
    first_type: str,
    then_type: str,
    window: timedelta,
    ts_col: str = "ts",
    seq_col: str = "event_id",
    watermark_delay: timedelta = timedelta(seconds=30),
) -> DataFrame:
    """Streaming conversion funnel (module docstring). Emits ONE final
    row per key that ever saw ``first_type``: (key, first_us, then_us,
    latency_us) with nulls when no ``then_type`` landed strictly inside
    ``(first, first + window]``. Keys without a ``first_type`` event
    never emit (they exit state as their tail finalizes)."""
    if window <= timedelta(0):
        raise ValueError(f"window must be positive, got {window}")
    window_us = int(window.total_seconds() * 1_000_000)
    packed = _pack(stream, key_col, type_col, ts_col, seq_col, watermark_delay)
    return packed.groupBy("key").applyInPandasWithState(
        _funnel_fn(first_type, then_type, window_us),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


RUNS_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("run_type", StringType(), False),
        StructField("run_len", LongType(), False),
        StructField("start_us", LongType(), False),
        StructField("end_us", LongType(), False),
    ]
)

_RUNS_STATE_SCHEMA = StructType(
    [
        StructField("us", ArrayType(LongType()), True),
        StructField("seq", ArrayType(LongType()), True),
        StructField("typ", ArrayType(StringType()), True),
        StructField("run_typ", StringType(), True),
        StructField("run_len", LongType(), True),
        StructField("run_start", LongType(), True),
        StructField("run_last", LongType(), True),
    ]
)


def _runs_fn(max_idle_us: int | None):
    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            s = state.get
            us = np.asarray(s[0], dtype=np.int64)
            seq = np.asarray(s[1], dtype=np.int64)
            typ = np.asarray(s[2], dtype=object)
            run = (
                [s[3], int(s[4]), int(s[5]), int(s[6])]
                if s[3] is not None
                else None
            )
        else:
            us, seq, typ = _EMPTY_I64, _EMPTY_I64, _EMPTY_OBJ
            run = None

        us, seq, typ = _merge_batch(pdfs, us, seq, typ, state.hasTimedOut)

        wm_us = state.getCurrentWatermarkMs() * 1000
        order = np.lexsort((seq, us))
        us, seq, typ = us[order], seq[order], typ[order]
        final = us < wm_us
        closed: list[list] = []
        if final.any():
            for u, t in zip(us[final], typ[final]):
                u = int(u)
                if run is not None and (
                    t != run[0]
                    or (
                        max_idle_us is not None
                        and u - run[3] > max_idle_us
                    )
                ):
                    closed.append(run)
                    run = None
                if run is None:
                    run = [t, 1, u, u]
                else:
                    run[1] += 1
                    run[3] = u
            us, seq, typ = us[~final], seq[~final], typ[~final]

        # idle rule closes the OPEN run by watermark too — by event
        # time (gap from the run's last event), never arrival batching
        if (
            run is not None
            and max_idle_us is not None
            and wm_us - run[3] > max_idle_us
        ):
            closed.append(run)
            run = None

        out = None
        if closed:
            out = pd.DataFrame(
                {
                    "key": k,
                    "run_type": [r[0] for r in closed],
                    "run_len": [r[1] for r in closed],
                    "start_us": [r[2] for r in closed],
                    "end_us": [r[3] for r in closed],
                }
            )

        if len(us) == 0 and run is None:
            state.remove()
        else:
            state.update(
                (
                    us.tolist(), seq.tolist(), typ.tolist(),
                    run[0] if run else None,
                    run[1] if run else None,
                    run[2] if run else None,
                    run[3] if run else None,
                )
            )
            wakes = []
            if len(us):
                wakes.append(int(us.min()) // 1000 + 1)
            if run is not None and max_idle_us is not None:
                wakes.append((run[3] + max_idle_us) // 1000 + 1)
            if wakes:
                state.setTimeoutTimestamp(
                    max(min(wakes), state.getCurrentWatermarkMs() + 1)
                )

        if out is not None:
            yield out

    return fn


def runs_stream(
    stream: DataFrame,
    key_col: str,
    type_col: str,
    ts_col: str = "ts",
    seq_col: str = "event_id",
    watermark_delay: timedelta = timedelta(seconds=30),
    max_idle: timedelta | None = None,
) -> DataFrame:
    """Maximal-run (Kleene A+) emission — the streaming twin of the
    batch gaps-and-islands query (`q_longest_runs_events`): one row per
    MAXIMAL same-type run per key, emitted exactly once when a
    different-type event finalizes after it (the run provably cannot
    extend — any further same-type event would sit behind the breaker
    in the stable order). ``max_idle`` additionally splits runs at
    event-time gaps larger than it AND closes idle open runs by
    watermark — gap rules are always event-time, never arrival batching
    (the transitions doctrine). The LAST run of a key without
    ``max_idle`` never closes (no terminator can arrive-proof it); so
    drained output == batch islands minus each key's open tail run —
    the exact relation the parity test pins. State per key: the open
    run's 4 scalars + the watermark tail."""
    max_idle_us = (
        int(max_idle.total_seconds() * 1_000_000)
        if max_idle is not None
        else None
    )
    packed = _pack(stream, key_col, type_col, ts_col, seq_col, watermark_delay)
    return packed.groupBy("key").applyInPandasWithState(
        _runs_fn(max_idle_us),
        outputStructType=RUNS_OUTPUT_SCHEMA,
        stateStructType=_RUNS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
