"""Model-based property test for the ring-buffer state function.

Drives ``make_ring_buffer_fn`` directly (no Spark) with a fake GroupState
against a straightforward Python reference model, over Hypothesis-generated
multi-batch delivery schedules with duplicates and out-of-order arrivals.
Invariants checked per batch and at the end:

- buffer always sorted by (ts, turn_idx), never exceeds max_data;
- set semantics: a (conv_id, turn_idx) identity is ADDed exactly once,
  redeliveries emit DUP;
- age eviction removes exactly the rows with ts < watermark − max_duration,
  capacity eviction removes oldest-first;
- every input row is accounted for: ADD + DUP == delivered rows;
- EVICT rows appear in eviction order (oldest first).

This is the pytest analogue of the reference's reflection-based state
inspection (TestReflection.kt:21-30) — but against a model, not examples.
"""

from __future__ import annotations

from datetime import timedelta

import numpy as np
import pandas as pd
import pytest

from hypothesis import given, settings, strategies as st

from real_time_sliding_window_spark.operators.stateful import make_ring_buffer_fn

US = 1_000_000


class FakeState:
    """Minimal stand-in for pyspark GroupState (the subset the fn uses)."""

    def __init__(self, watermark_ms: int):
        self._value = None
        self._wm_ms = watermark_ms
        self.hasTimedOut = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        assert self._value is not None
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None

    def getCurrentWatermarkMs(self):
        return self._wm_ms

    def setTimeoutTimestamp(self, ms):
        self.timeout_set = ms


def batch_df(turns):
    """turns: list of (turn_idx, ts_us). role/text/tool derived."""
    return pd.DataFrame(
        {
            "conv_id": "c1",
            "turn_idx": np.array([t for t, _ in turns], dtype=np.int32),
            "role": "user",
            "text": [f"t{t}" for t, _ in turns],
            "tool": None,
            "ts": pd.to_datetime([us for _, us in turns], unit="us"),
        }
    )


@st.composite
def schedules(draw):
    """A multi-batch delivery schedule of (turn_idx, ts) with dups/ooo."""
    n_turns = draw(st.integers(2, 24))
    # each turn's event time: seconds, may collide (same-ts ordering path)
    ts_s = [draw(st.integers(0, 30)) for _ in range(n_turns)]
    deliveries = list(range(n_turns)) + draw(
        st.lists(st.integers(0, n_turns - 1), max_size=8)  # redeliveries
    )
    deliveries = draw(st.permutations(deliveries))
    n_batches = draw(st.integers(1, 4))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(0, len(deliveries)),
                min_size=n_batches - 1,
                max_size=n_batches - 1,
            )
        )
    )
    batches = []
    lo = 0
    for c in cuts + [len(deliveries)]:
        batches.append(deliveries[lo:c])
        lo = c
    return ts_s, batches


@settings(max_examples=60, deadline=None)
@given(
    sched=schedules(),
    max_data=st.one_of(st.none(), st.integers(1, 8)),
    max_dur_s=st.one_of(st.none(), st.integers(1, 20)),
)
def test_ring_buffer_fn_matches_model(sched, max_data, max_dur_s):
    ts_s, batches = sched
    fn = make_ring_buffer_fn(
        timedelta(seconds=max_dur_s) if max_dur_s is not None else None,
        max_data,
    )

    state = FakeState(watermark_ms=0)
    model: list[tuple[int, int]] = []  # (ts_us, turn_idx), sorted
    n_add = n_dup = 0
    max_seen_ts = 0

    for batch in batches:
        if not batch:
            continue
        turns = [(t, ts_s[t] * US) for t in batch]
        max_seen_ts = max([max_seen_ts] + [us for _, us in turns])
        # watermark: max event time seen in PREVIOUS batches minus 5s
        wm_ms = max(0, (max_seen_ts - 5 * US) // 1000)
        state._wm_ms = wm_ms

        out = list(fn(("c1",), iter([batch_df(turns)]), state))
        out = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
            columns=["action", "reason", "turn_idx", "ts"]
        )

        # ---- model update ----
        # Set semantics match the reference skip-list: dedup is against the
        # CURRENT buffer — an identity that was evicted can be re-added
        # (ingest idempotence is deduped_stream's job, upstream).
        adds = []
        dups = []
        current = {t for _, t in model}
        for t, us in sorted(turns, key=lambda x: (x[1], x[0])):
            if t in current:
                dups.append(t)
            else:
                current.add(t)
                adds.append((us, t))
        model = sorted(model + adds)
        evicted_age = []
        if max_dur_s is not None and wm_ms > 0:
            cutoff = wm_ms * 1000 - max_dur_s * US
            evicted_age = [e for e in model if e[0] < cutoff]
            model = [e for e in model if e[0] >= cutoff]
        evicted_cap = []
        if max_data is not None and len(model) > max_data:
            k = len(model) - max_data
            evicted_cap = model[:k]
            model = model[k:]

        # ---- compare ----
        got_add = out[out.action == "ADD"]
        got_dup = out[out.action == "DUP"]
        got_ev_age = out[(out.action == "EVICT") & (out.reason == "age")]
        got_ev_cap = out[(out.action == "EVICT") & (out.reason == "capacity")]
        assert sorted(got_add.turn_idx) == sorted(t for _, t in adds)
        assert sorted(got_dup.turn_idx) == sorted(dups)
        assert list(got_ev_age.turn_idx) == [t for _, t in evicted_age]
        assert list(got_ev_cap.turn_idx) == [t for _, t in evicted_cap]
        n_add += len(got_add)
        n_dup += len(got_dup)

        # state invariant: buffer == model, sorted by (ts, turn_idx)
        if model:
            assert state.exists
            s_ts, s_ti = state.get[0], state.get[1]
            assert list(zip(s_ts, s_ti)) == model
            if max_data is not None:
                assert len(s_ts) <= max_data
        else:
            assert not state.exists

    delivered = sum(len(b) for b in batches)
    assert n_add + n_dup == delivered


def test_timeout_invocation_evicts_aged():
    """hasTimedOut path: age eviction fires with no new data."""
    fn = make_ring_buffer_fn(timedelta(seconds=5), None)
    state = FakeState(watermark_ms=0)
    # seed state via a normal batch
    list(fn(("c1",), iter([batch_df([(0, 0), (1, 2 * US)])]), state))
    assert state.exists
    # timeout: watermark far ahead => everything aged out
    state.hasTimedOut = True
    state._wm_ms = 60_000
    out = pd.concat(list(fn(("c1",), iter([]), state)), ignore_index=True)
    assert (out.action == "EVICT").all() and (out.reason == "age").all()
    assert list(out.turn_idx) == [0, 1]
    assert not state.exists
