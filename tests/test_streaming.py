"""Structured Streaming tests: watermark semantics, stateful ring buffer,
stream-stream join, exactly-once sink (FIXTURES.md F2/F3/F5/F6/F7).

Batch control: each FileFeed.push() is one parquet drop;
maxFilesPerTrigger=1 + availableNow makes every drop its own micro-batch,
so the watermark advances between drops — the deterministic-scheduler
analogue of the reference's TestRunOnlyNTimesTaskScheduler (SURVEY.md §5).
"""

from __future__ import annotations

from datetime import timedelta

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from real_time_sliding_window_spark import synth
from real_time_sliding_window_spark.config import WindowSpec
from real_time_sliding_window_spark.operators.stateful import ring_buffer_stream
from real_time_sliding_window_spark.sources.streams import FileFeed
from real_time_sliding_window_spark.streaming.pipeline import (
    deduped_stream,
    user_tool_stream_join,
    windowed_stream,
)
from real_time_sliding_window_spark.streaming.sink import (
    ExactlyOnceParquetSink,
    run_to_sink,
)

T0 = synth.T0
SEC = timedelta(seconds=1)


def rows(*specs) -> pd.DataFrame:
    """specs: (conv_id, turn_idx, role, text, tool, sec_offset)"""
    data = [
        {
            "conv_id": c,
            "turn_idx": i,
            "role": r,
            "text": t,
            "tool": tl,
            "ts": T0 + off * SEC if not isinstance(off, timedelta) else T0 + off,
        }
        for (c, i, r, t, tl, off) in specs
    ]
    pdf = pd.DataFrame(data)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


def drive(spark, tmp_path, result_fn, pushes, name, schema=None):
    """Build feed, push files one at a time, run availableNow per push,
    return (sink, per-run committed row snapshots). ``schema``: feed rows
    of a non-transcript shape (e.g. events)."""
    feed = FileFeed(spark, str(tmp_path / f"{name}_in"))
    sink = ExactlyOnceParquetSink(str(tmp_path / f"{name}_out"))
    ckpt = str(tmp_path / f"{name}_ckpt")
    snapshots = []
    for push in pushes:
        feed.push(spark.createDataFrame(push, schema=schema) if schema else push)
        result = result_fn(feed.stream(schema) if schema else feed.stream())
        run_to_sink(result, sink, ckpt, query_name=name)
        try:
            snapshots.append(sink.read_committed(spark).toPandas())
        except FileNotFoundError:
            snapshots.append(pd.DataFrame())
    return sink, snapshots


# ---------------------------------------------------------------------------
# Streaming tumbling window + late-data drop (F6)
# ---------------------------------------------------------------------------

class TestStreamingWindow:
    def test_emit_on_watermark_and_late_drop(self, spark, tmp_path):
        spec = WindowSpec(name="wlate", length="2 seconds", watermark_delay="2 seconds")

        def pipe(stream):
            return windowed_stream(
                stream, spec, keys=["conv_id"],
                content_payload=["text"], order_cols=["turn_idx"],
            ).withColumn("content_str",
                         F.array_join(F.transform("content", lambda x: x["text"]), ","),
                         ).drop("content")

        early = rows(
            ("c1", 0, "user", "w0-a", None, 0),
            ("c1", 1, "user", "w0-b", None, 1),
            ("c1", 2, "user", "w1-a", None, 2),
        )
        # advances watermark to 10-2=8s: window [0,2) and [2,4) close
        advance = rows(("c2", 0, "user", "adv", None, 10))
        # late beyond watermark (ts=1s << wm=8s): silently dropped
        late = rows(("c1", 3, "user", "late", None, 1))
        # advance further so any (wrongly accepted) late window would emit
        advance2 = rows(("c2", 1, "user", "adv2", None, 20))

        sink, snaps = drive(spark, tmp_path, pipe, [early, advance, late, advance2], "wlate")
        final = snaps[-1]
        c1 = final[final.conv_id == "c1"].sort_values("window_start")
        assert list(c1["content_str"]) == ["w0-a,w0-b", "w1-a"]
        assert list(c1["n_rows"]) == [2, 1]
        # the late row never surfaced anywhere
        assert not final["content_str"].str.contains("late").any()

    def test_within_delay_included(self, spark, tmp_path):
        spec = WindowSpec(name="wok", length="2 seconds", watermark_delay="10 seconds")

        def pipe(stream):
            return windowed_stream(stream, spec, keys=["conv_id"])

        early = rows(("c1", 0, "user", "a", None, 0))
        newer = rows(("c1", 1, "user", "b", None, 5))
        # ts=1s is late vs max_ts=5s but within the 10s delay => included
        late_ok = rows(("c1", 2, "user", "c", None, 1))
        closer = rows(("c2", 0, "user", "adv", None, 30))
        _, snaps = drive(spark, tmp_path, pipe, [early, newer, late_ok, closer], "wok")
        final = snaps[-1]
        w0 = final[(final.conv_id == "c1")
                   & (final.window_start == T0)]
        assert len(w0) == 1 and w0.iloc[0]["n_rows"] == 2  # both ts=0s and ts=1s


    def test_dropduplicates_within_watermark(self, spark, tmp_path):
        """Redelivered (conv_id, turn_idx) within the watermark horizon is
        dropped; the first delivery survives."""

        def pipe(stream):
            return deduped_stream(
                stream, watermark_delay=timedelta(seconds=30)
            )

        first = rows(("c1", 0, "user", "orig", None, 0),
                     ("c1", 1, "user", "second", None, 1))
        redeliver = rows(("c1", 0, "user", "orig", None, 0))   # same identity
        fresh = rows(("c1", 2, "user", "third", None, 2))
        _, snaps = drive(spark, tmp_path, pipe,
                         [first, redeliver, fresh], "ddwm")
        final = snaps[-1]
        assert sorted(final.turn_idx) == [0, 1, 2]
        assert len(final) == 3  # the redelivery added nothing

    def test_streaming_session_window(self, spark, tmp_path):
        """Session windows close when the watermark passes last_ts + gap."""
        spec = WindowSpec(
            name="sess-s", kind="session", gap="2 seconds",
            watermark_delay="1 second",
        )

        def pipe(stream):
            return windowed_stream(stream, spec, keys=["conv_id"])

        s1 = rows(("c1", 0, "user", "a", None, 0), ("c1", 1, "user", "b", None, 1))
        adv1 = rows(("c2", 0, "user", "adv", None, 10))   # wm -> 9: session 1 closes
        s2 = rows(("c1", 2, "user", "c", None, 10))
        adv2 = rows(("c2", 1, "user", "adv", None, 20))   # wm -> 19: session 2 closes
        _, snaps = drive(spark, tmp_path, pipe, [s1, adv1, s2, adv2], "sess_s")
        c1 = snaps[-1][snaps[-1].conv_id == "c1"].sort_values("session_start")
        assert list(c1["n_rows"]) == [2, 1]
        assert c1.iloc[0]["session_start"] == T0
        assert c1.iloc[0]["session_end"] == T0 + 3 * SEC   # last ts (1s) + 2s gap
        assert c1.iloc[1]["session_start"] == T0 + 10 * SEC
        assert c1.iloc[1]["session_end"] == T0 + 12 * SEC

    def test_streaming_sliding_window(self, spark, tmp_path):
        """Sliding 2s/1s: each row lands in two overlapping windows."""
        spec = WindowSpec(
            name="slide-s", kind="sliding", length="2 seconds",
            slide="1 second", watermark_delay="1 second",
        )

        def pipe(stream):
            return windowed_stream(stream, spec, keys=["conv_id"])

        data = rows(("c1", 0, "user", "a", None, 0), ("c1", 1, "user", "b", None, 1))
        adv = rows(("c2", 0, "user", "adv", None, 30))
        _, snaps = drive(spark, tmp_path, pipe, [data, adv], "slide_s")
        c1 = snaps[-1][snaps[-1].conv_id == "c1"].sort_values("window_start")
        # windows [-1,1): {a}, [0,2): {a,b}, [1,3): {b}
        assert list(c1["n_rows"]) == [1, 2, 1]
        assert list(c1["window_start"]) == [T0 - SEC, T0, T0 + SEC]


# ---------------------------------------------------------------------------
# Stateful ring buffer (F2, F3, F5)
# ---------------------------------------------------------------------------

class TestRingBuffer:
    def test_capacity_eviction_order(self, spark, tmp_path):
        """F3 count variant: maxData=4, 6 turns => EVICT 0 then 1."""

        def pipe(stream):
            return ring_buffer_stream(stream, timedelta(0), max_data=4)

        pushes = [
            rows(*[("c1", i, "user", f"t{i}", None, i) for i in range(4)]),
            rows(("c1", 4, "user", "t4", None, 4)),
            rows(("c1", 5, "user", "t5", None, 5)),
        ]
        sink, snaps = drive(spark, tmp_path, pipe, pushes, "cap")
        after4, after5, after6 = snaps
        assert (after4["action"] == "ADD").all() and len(after4) == 4
        ev5 = after5[after5.action == "EVICT"]
        assert list(ev5.turn_idx) == [0] and list(ev5.reason) == ["capacity"]
        ev6 = snaps[2][snaps[2].action == "EVICT"].sort_values("turn_idx")
        assert list(ev6.turn_idx) == [0, 1]
        # removal order across batches: EVICT(0) committed before EVICT(1)
        lineage = sink.lineage()
        assert len(lineage) >= 3
        # final buffer: ADDs minus EVICTs = turns 2..5
        final = snaps[2]
        added = set(final[final.action == "ADD"].turn_idx)
        evicted = set(final[final.action == "EVICT"].turn_idx)
        assert sorted(added - evicted) == [2, 3, 4, 5]

    def test_age_expiry(self, spark, tmp_path):
        """F2: window length 3s; turns at now-5..now-1; survivors ts>=now-3."""
        now_off = 6  # "now" = T0+6s

        def pipe(stream):
            return ring_buffer_stream(
                stream, timedelta(0), max_duration=timedelta(seconds=3)
            )

        f2 = synth.f2_expiry_rows(T0 + now_off * SEC)
        advance = rows(("cadv", 0, "user", "adv", None, now_off))
        _, snaps = drive(spark, tmp_path, pipe, [f2, advance], "age")
        final = snaps[-1]
        ev = final[(final.action == "EVICT") & (final.conv_id == "c1")]
        assert set(ev.reason) == {"age"}
        assert sorted(ev.text) == ["1", "1", "2", "2"]  # d=5,4 per role
        added = final[(final.action == "ADD") & (final.conv_id == "c1")]
        survivors = added[~added.turn_idx.isin(ev.turn_idx)]
        assert sorted(survivors.text) == ["3", "3", "4", "4", "5", "5"]
        assert (survivors.groupby("role").size() == 3).all()

    def test_age_expiry_nothing_old(self, spark, tmp_path):
        """F2 variant B: nothing older than window => no eviction."""

        def pipe(stream):
            return ring_buffer_stream(
                stream, timedelta(0), max_duration=timedelta(seconds=30)
            )

        f2 = synth.f2_expiry_rows(T0 + 6 * SEC)
        advance = rows(("cadv", 0, "user", "adv", None, 6))
        _, snaps = drive(spark, tmp_path, pipe, [f2, advance], "noev")
        final = snaps[-1]
        assert (final[final.conv_id == "c1"].action == "ADD").all()

    def test_dedup_redelivery(self, spark, tmp_path):
        """F5: redelivered (conv_id, turn_idx) => DUP, not double-ADD."""

        def pipe(stream):
            return ring_buffer_stream(stream, timedelta(0), max_data=10)

        first = rows(("c1", 0, "user", "a", None, 0), ("c1", 1, "user", "b", None, 1))
        redeliver = rows(("c1", 1, "user", "b", None, 1))
        _, snaps = drive(spark, tmp_path, pipe, [first, redeliver], "dup")
        final = snaps[-1]
        assert len(final[final.action == "ADD"]) == 2
        dup = final[final.action == "DUP"]
        assert list(dup.turn_idx) == [1]

    def test_stable_order_same_ts(self, spark, tmp_path):
        """F5: identical ts, different turn_idx => (ts, turn_idx) order."""

        def pipe(stream):
            return ring_buffer_stream(stream, timedelta(0), max_data=2)

        same_ts = rows(
            ("c1", 1, "user", "second", None, 0),
            ("c1", 0, "user", "first", None, 0),
            ("c1", 2, "user", "third", None, 0),
        )
        _, snaps = drive(spark, tmp_path, pipe, [same_ts], "ord")
        final = snaps[-1]
        ev = final[final.action == "EVICT"]
        # capacity 2 over 3 same-ts rows: lowest turn_idx evicted first
        assert list(ev.turn_idx) == [0]

    def test_session_close_matches_session_agg(self, spark, tmp_path):
        """VERDICT r03 #4: session-gap ring mode — closed-session
        boundaries (start = min member ts, end = SESSION_END ts, n =
        SESSION_END buffer_size) must equal operators/windows.session_agg
        on the same corpus, inclusive-merge boundary included (turn at
        exactly last_ts + gap extends the session)."""
        from real_time_sliding_window_spark.operators.windows import (
            session_agg,
        )

        gap = timedelta(seconds=5)

        def pipe(stream):
            return ring_buffer_stream(stream, timedelta(0), session_gap=gap)

        corpus = rows(
            # c1: session A {0,2,4}, B {20,21}, C {40}
            ("c1", 0, "user", "a", None, 0),
            ("c1", 1, "assistant", "b", None, 2),
            ("c1", 2, "user", "c", None, 4),
            ("c1", 3, "user", "d", None, 20),
            ("c1", 4, "assistant", "e", None, 21),
            ("c1", 5, "user", "f", None, 40),
            # c2: inclusive boundary — 9 == 4 + gap merges: one session
            ("c2", 0, "user", "g", None, 4),
            ("c2", 1, "user", "h", None, 9),
        )
        closer = rows(("cadv", 0, "user", "zz", None, 100))
        _, snaps = drive(spark, tmp_path, pipe, [corpus, closer], "sess")
        final = snaps[-1]
        final = final[final.conv_id != "cadv"]

        ends = final[final.action == "SESSION_END"].sort_values("ts")
        evs = final[final.action == "EVICT"]
        assert set(evs.reason) == {"session"}
        # every ADD was eventually session-evicted (wm=100 closes all)
        assert len(evs) == len(final[final.action == "ADD"]) == 8
        assert ends.turn_idx.isnull().all()

        got = [
            (e.conv_id, e.ts, int(e.buffer_size))
            for _, e in ends.iterrows()
        ]
        batch = session_agg(
            spark.createDataFrame(corpus), "ts", gap, keys=["conv_id"]
        ).toPandas()
        want = sorted(
            (r.conv_id, r.session_end, int(r.n_rows))
            for r in batch.itertuples()
        )
        assert sorted(got) == want
        # starts: min EVICT ts per (conv, session_end) == batch first_ts
        start_of = {
            (r.conv_id, r.session_end): r.first_ts for r in batch.itertuples()
        }
        for _, e in ends.iterrows():
            mem = evs[(evs.conv_id == e.conv_id)
                      & (evs.ts >= start_of[(e.conv_id, e.ts)])
                      & (evs.ts <= e.ts - gap)]
            assert int(e.buffer_size) == len(mem)
            assert mem.ts.min() == start_of[(e.conv_id, e.ts)]

    def test_session_closes_via_timer_without_new_turns(
        self, spark, tmp_path
    ):
        """A conversation that goes quiet must close via the re-armed
        EventTimeTimeout when OTHER keys advance the watermark — no new
        turn for the key ever arrives. Also: no premature close while
        wm <= session end (a bridging turn can still arrive)."""
        gap = timedelta(seconds=5)

        def pipe(stream):
            return ring_buffer_stream(stream, timedelta(0), session_gap=gap)

        first = rows(("c1", 0, "user", "a", None, 0),
                     ("c1", 1, "user", "b", None, 4))
        # wm -> 8 < session end (4+5=9): NOT closeable yet
        # (NB: a row at ts == wm is dropped by Spark's late filter —
        # equality counts as late — so the bridge must stay > wm)
        probe = rows(("cx", 0, "user", "p", None, 8))
        # bridging turn at exactly last_ts + gap merges (inclusive) and
        # extends the session to 9 + 5 = 14
        bridge = rows(("c1", 2, "user", "c", None, 9))
        closer = rows(("cy", 0, "user", "q", None, 60))
        _, snaps = drive(
            spark, tmp_path, pipe, [first, probe, bridge, closer], "sesst"
        )
        after_probe = snaps[1]
        assert not (after_probe[after_probe.conv_id == "c1"]
                    .action == "SESSION_END").any()
        final = snaps[-1]
        c1_ends = final[(final.conv_id == "c1")
                        & (final.action == "SESSION_END")]
        # ONE session: bridge merged; end = 9s + 5s = 14s; 3 members
        assert len(c1_ends) == 1
        assert c1_ends.ts.iloc[0] == T0 + 14 * SEC
        assert int(c1_ends.buffer_size.iloc[0]) == 3
        evs = final[(final.conv_id == "c1") & (final.action == "EVICT")]
        assert len(evs) == 3 and set(evs.reason) == {"session"}


# ---------------------------------------------------------------------------
# Stream-stream join (F7)
# ---------------------------------------------------------------------------

class TestShardedRingBuffer:
    """VERDICT r02 #7: hot-conversation mitigation — per-shard buffers.
    Contract: dedup + age eviction EXACT vs the unsharded op; capacity
    shard-local with total <= n_shards*ceil(max_data/n_shards)."""

    @staticmethod
    def _pipe(n_shards, **kw):
        from real_time_sliding_window_spark.operators.stateful import (
            sharded_ring_buffer_stream,
        )

        return lambda stream: sharded_ring_buffer_stream(
            stream, timedelta(0), n_shards=n_shards, **kw
        )

    def test_session_gap_refused_with_sharding(self, spark):
        """VERDICT r04 #5: shard-local last-ts under-estimates the
        conversation's, so session closure would fire early — the
        operator must refuse session_gap rather than emit false
        SESSION_END boundaries."""
        import pytest as _pytest

        from real_time_sliding_window_spark.operators.stateful import (
            sharded_ring_buffer_stream,
        )

        stream = (
            spark.readStream.format("rate").option("rowsPerSecond", 1)
            .load()
            .selectExpr("'c' as conv_id", "CAST(value AS INT) as turn_idx",
                        "'u' as role", "'t' as text",
                        "CAST(NULL AS STRING) as props", "timestamp as ts")
        )
        with _pytest.raises(ValueError, match="session_gap.*shard"):
            sharded_ring_buffer_stream(
                stream, timedelta(0), n_shards=4,
                session_gap=timedelta(seconds=5),
            )

    def test_age_and_dedup_match_unsharded(self, spark, tmp_path):
        """Same pushes through plain vs sharded(3): the (action, reason,
        turn_idx) row sets are identical for age eviction and DUPs."""
        f2 = synth.f2_expiry_rows(T0 + 6 * SEC)
        redeliver = f2.iloc[:2]
        advance = rows(("cadv", 0, "user", "adv", None, 6))
        pushes = [f2, redeliver, advance]

        def plain(stream):
            return ring_buffer_stream(
                stream, timedelta(0), max_duration=timedelta(seconds=3)
            )

        _, psnaps = drive(spark, tmp_path, plain, pushes, "shref")
        _, ssnaps = drive(
            spark, tmp_path,
            self._pipe(3, max_duration=timedelta(seconds=3)),
            pushes, "shrd",
        )
        key = lambda df: sorted(
            map(tuple, df[["conv_id", "action", "reason", "turn_idx"]]
                .fillna("").itertuples(index=False))
        )
        assert key(ssnaps[-1]) == key(psnaps[-1])

    def test_capacity_bound_and_one_shard_exact(self, spark, tmp_path):
        ten = rows(*[("c1", i, "user", f"t{i}", None, i) for i in range(10)])

        # n_shards=2, max_data=4: per-shard cap 2, total kept <= 4
        _, snaps = drive(
            spark, tmp_path, self._pipe(2, max_data=4), [ten], "shcap"
        )
        final = snaps[-1]
        assert len(final[final.action == "ADD"]) == 10
        kept = (
            set(final[final.action == "ADD"].turn_idx)
            - set(final[final.action == "EVICT"].turn_idx)
        )
        assert len(kept) <= 4
        # each shard kept its own newest-2 (shard-local oldest-first evict)
        for _, g in final.groupby("shard"):
            g_kept = set(g[g.action == "ADD"].turn_idx) - set(
                g[g.action == "EVICT"].turn_idx
            )
            g_ev = set(g[g.action == "EVICT"].turn_idx)
            assert all(k > e for k in g_kept for e in g_ev)

        # n_shards=1 == the plain operator, row for row
        def plain(stream):
            return ring_buffer_stream(stream, timedelta(0), max_data=4)

        _, p = drive(spark, tmp_path, plain, [ten], "shone")
        _, s = drive(spark, tmp_path, self._pipe(1, max_data=4), [ten], "shone1")
        cols = ["conv_id", "action", "reason", "turn_idx", "buffer_size"]
        key = lambda df: sorted(
            map(tuple, df[cols].fillna("").itertuples(index=False))
        )
        assert key(s[-1]) == key(p[-1])


class TestStreamJoin:
    def test_user_tool_interval_join(self, spark, tmp_path):
        def pipe(stream):
            return user_tool_stream_join(
                stream,
                horizon=timedelta(seconds=10),
                watermark_delay=timedelta(seconds=2),
                how="inner",
            )

        data = rows(
            # conv with 1 matching tool turn
            ("c1", 0, "user", "q1", None, 0),
            ("c1", 1, "tool", "r1", "search", 3),
            # conv with 3 matching tool turns
            ("c2", 0, "user", "q2", None, 0),
            ("c2", 1, "tool", "r2a", "code", 1),
            ("c2", 2, "tool", "r2b", "code", 5),
            ("c2", 3, "tool", "r2c", "code", 9),
            # tool turn outside the interval (must not join)
            ("c3", 0, "user", "q3", None, 0),
            ("c3", 1, "tool", "r3", "calc", 15),
            # conv with no tool turn
            ("c4", 0, "user", "q4", None, 0),
        )
        advance = rows(("c9", 0, "user", "adv", None, 60))
        _, snaps = drive(spark, tmp_path, pipe, [data, advance], "join")
        final = snaps[-1]
        by_conv = final.groupby("conv_id").size().to_dict()
        assert by_conv == {"c1": 1, "c2": 3}

    def test_late_tool_turn_dropped(self, spark, tmp_path):
        def pipe(stream):
            return user_tool_stream_join(
                stream,
                horizon=timedelta(seconds=10),
                watermark_delay=timedelta(seconds=2),
                how="inner",
            )

        users = rows(("c1", 0, "user", "q", None, 0))
        # the join's global watermark is min(user side, tool side): both
        # sides must advance, or the tool side pins the watermark at 0
        advance = rows(
            ("c9", 0, "user", "adv", None, 60),
            ("c9", 1, "tool", "adv", "calc", 60),
        )
        # tool turn inside the interval but arriving after watermark passed
        late_tool = rows(("c1", 1, "tool", "r", "search", 5))
        advance2 = rows(
            ("c9", 2, "user", "adv2", None, 120),
            ("c9", 3, "tool", "adv2", "calc", 120),
        )
        _, snaps = drive(
            spark, tmp_path, pipe, [users, advance, late_tool, advance2], "latejoin"
        )
        final = snaps[-1]
        assert len(final[final.conv_id == "c1"]) == 0


# ---------------------------------------------------------------------------
# Exactly-once sink + checkpoint resume
# ---------------------------------------------------------------------------

class TestExactlyOnce:
    def test_batch_redelivery_noop(self, spark, tmp_path):
        sink = ExactlyOnceParquetSink(str(tmp_path / "sink"))
        df = synth.to_spark(spark, rows(("c1", 0, "user", "a", None, 0)))
        sink.write_batch(df, 0)
        sink.write_batch(df, 0)  # redelivery
        out = sink.read_committed(spark).toPandas()
        assert len(out) == 1
        assert sink.lineage()[0]["rows"] == 1

    def test_torn_write_recovery(self, spark, tmp_path):
        import os
        import shutil

        sink = ExactlyOnceParquetSink(str(tmp_path / "sink2"))
        df = synth.to_spark(spark, rows(("c1", 0, "user", "a", None, 0)))
        sink.write_batch(df, 0)
        # simulate crash between data write and commit marker
        os.remove(sink._commit_marker(0))
        sink.write_batch(df, 0)  # retry rewrites cleanly
        out = sink.read_committed(spark).toPandas()
        assert len(out) == 1

    def test_resume_from_checkpoint_identical_output(self, spark, tmp_path):
        """Incremental runs with a persistent checkpoint produce exactly the
        rows a single fresh run produces (deterministic resume)."""
        spec = WindowSpec(name="res", length="2 seconds", watermark_delay="0 seconds")

        def pipe(stream):
            return windowed_stream(stream, spec, keys=["conv_id"])

        pushes = [
            rows(("c1", 0, "user", "a", None, 0), ("c1", 1, "user", "b", None, 1)),
            rows(("c1", 2, "user", "c", None, 3)),
            rows(("c1", 3, "user", "d", None, 9)),
        ]
        _, snaps_inc = drive(spark, tmp_path, pipe, pushes, "inc")

        # fresh single run over the same input
        feed = FileFeed(spark, str(tmp_path / "fresh_in"))
        for p in pushes:
            feed.push(p)
        sink2 = ExactlyOnceParquetSink(str(tmp_path / "fresh_out"))
        run_to_sink(pipe(feed.stream()), sink2, str(tmp_path / "fresh_ckpt"), "fresh")
        fresh = sink2.read_committed(spark).toPandas()

        inc = snaps_inc[-1]
        cols = ["window_start", "conv_id", "n_rows"]
        a = inc[cols].sort_values(cols).reset_index(drop=True)
        b = fresh[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestIcebergGating:
    def test_unavailable_raises_actionable_error(self, spark, tmp_path):
        """No Iceberg jar in this sandbox: the production-path API must
        refuse clearly (and point at the parquet twin), never half-write."""
        from real_time_sliding_window_spark.streaming import iceberg

        assert iceberg.iceberg_available(spark) is False
        src_dir = tmp_path / "ice_in"
        src_dir.mkdir()
        stream = spark.readStream.schema(synth.TRANSCRIPT_SCHEMA).parquet(
            str(src_dir)
        )
        with pytest.raises(RuntimeError, match="ExactlyOnceParquetSink"):
            iceberg.write_stream_to_iceberg(stream, "rtsw.db.t", str(tmp_path / "ck"))

    def test_tws_v2_gated_without_protobuf(self, spark, tmp_path):
        """transformWithStateInPandas path: refuse clearly when the protobuf
        runtime its state server needs is absent (this sandbox), pointing at
        the applyInPandasWithState engine."""
        from real_time_sliding_window_spark.operators import stateful_tws

        if stateful_tws.tws_available():
            pytest.skip("protobuf present — gate not exercised")
        src = tmp_path / "tws_in"
        src.mkdir()
        stream = spark.readStream.schema(synth.TRANSCRIPT_SCHEMA).parquet(str(src))
        with pytest.raises(RuntimeError, match="ring_buffer_stream"):
            stateful_tws.ring_buffer_stream_v2(stream, timedelta(seconds=1))


class TestRoleGauges:
    def test_observed_per_role_counts(self, spark, tmp_path):
        """Per-class item-count gauges (reference BucketedWindow.kt:32-33 /
        Metrics.kt:108-137): with_role_gauges plants observe() counters on
        the streaming plan; the lineage listener accumulates them per batch
        and the totals equal the true per-role input counts."""
        from real_time_sliding_window_spark.streaming import lineage
        from real_time_sliding_window_spark.streaming.lineage import with_role_gauges

        listener = lineage.attach(spark)
        try:
            feed = FileFeed(spark, str(tmp_path / "gauge_in"))
            sink = ExactlyOnceParquetSink(str(tmp_path / "gauge_out"))
            feed.push(rows(
                ("c1", 0, "user", "a", None, 0),
                ("c1", 1, "assistant", "b", None, 1),
                ("c1", 2, "tool", "c", "search", 2),
                ("c1", 3, "user", "d", None, 3),
                ("c2", 0, "user", "e", None, 0),
            ))
            gauged = with_role_gauges(feed.stream())
            run_to_sink(gauged, sink, str(tmp_path / "gauge_ckpt"), query_name="gauges")
            # listener delivery is async — poll briefly for the progress event
            import time

            deadline = time.monotonic() + 15
            totals = listener.role_gauge_totals()
            while not totals and time.monotonic() < deadline:
                time.sleep(0.2)
                totals = listener.role_gauge_totals()
            assert totals.get("n_total") == 5
            assert totals.get("n_user") == 3
            assert totals.get("n_assistant") == 1
            assert totals.get("n_tool") == 1
        finally:
            spark.streams.removeListener(listener)


class TestLiveWindowView:
    def test_current_bucket_visible_mid_stream(self, spark, tmp_path):
        """The open window is readable BEFORE the watermark closes it, with
        running counts that grow push by push (reference currentBucket,
        FixedTumblingBucketedWindowTest.kt:287-291), and closed windows
        remain readable via buckets()."""
        from real_time_sliding_window_spark.streaming.live_view import LiveWindowView

        feed = FileFeed(spark, str(tmp_path / "lv_in"))
        view = LiveWindowView(str(tmp_path / "lv_store"))
        spec = WindowSpec(
            name="lv", length="60 seconds", watermark_delay="30 seconds"
        )
        ckpt = str(tmp_path / "lv_ckpt")

        def run_push(pdf):
            feed.push(pdf)
            q = view.start(
                feed.stream(), spec, ckpt, keys=["conv_id"], query_name="lv"
            )
            q.awaitTermination()

        # push 1: two turns in the 00:00-01:00 window -> visible, n=2
        run_push(rows(("c1", 0, "user", "a", None, 0),
                      ("c1", 1, "assistant", "b", None, 5)))
        cur = view.current_bucket(
            spark, T0 + 10 * SEC, keys=["conv_id"]
        ).toPandas()
        assert len(cur) == 1 and cur.iloc[0]["n_rows"] == 2

        # push 2: one more turn, same window -> running count updates to 3
        # (the watermark (max_ts - 30s) is still inside the window: OPEN)
        run_push(rows(("c1", 2, "tool", "c", "search", 20)))
        cur = view.current_bucket(
            spark, T0 + 10 * SEC, keys=["conv_id"]
        ).toPandas()
        assert len(cur) == 1 and cur.iloc[0]["n_rows"] == 3

        # push 3: a turn two windows later closes window 1; both windows
        # stay readable, window 1's final state intact
        run_push(rows(("c1", 3, "user", "d", None, 150)))
        allw = view.buckets(spark, keys=["conv_id"]).toPandas()
        assert len(allw) == 2
        first = allw[allw["n_rows"] == 3]
        assert len(first) == 1
        cur2 = view.current_bucket(
            spark, T0 + 150 * SEC, keys=["conv_id"]
        ).toPandas()
        assert len(cur2) == 1 and cur2.iloc[0]["n_rows"] == 1
        # nonCurrentBuckets getter: only the closed first window
        closed = view.non_current_buckets(
            spark, T0 + 150 * SEC, keys=["conv_id"]
        ).toPandas()
        assert len(closed) == 1 and closed.iloc[0]["n_rows"] == 3


class TestKafkaGating:
    def test_unavailable_raises_actionable_error(self, spark):
        """No Kafka connector in this sandbox: the production source must
        refuse clearly, pointing at the FileFeed twin."""
        from real_time_sliding_window_spark.sources import kafka

        assert kafka.kafka_available(spark) is False
        with pytest.raises(RuntimeError, match="FileFeed"):
            kafka.transcript_kafka_stream(spark, "broker:9092", "turns")

    def test_payload_roundtrip(self, spark):
        """to_kafka_payload (key=conv_id, value=JSON) composed with the
        source's from_json parse is lossless — the (de)serialization
        contract is testable without a broker."""
        from real_time_sliding_window_spark.sources.kafka import to_kafka_payload

        df = synth.to_spark(spark, rows(
            ("c1", 0, "user", "hello", None, 0),
            ("c2", 1, "tool", "result", "search", 5),
        ))
        payload = to_kafka_payload(df)
        back = payload.select(
            F.from_json(F.col("value"), synth.TRANSCRIPT_SCHEMA).alias("t"), "key"
        ).select("t.*", "key").toPandas().sort_values("conv_id")
        assert list(back["key"]) == list(back["conv_id"]) == ["c1", "c2"]
        assert list(back["turn_idx"]) == [0, 1]
        assert list(back["tool"].fillna("-")) == ["-", "search"]
        assert list(back["ts"]) == [T0, T0 + 5 * SEC]


class TestStreamStaticJoin:
    def test_enriched_stream_broadcast_dim(self, spark, tmp_path):
        """Stream-static enrichment: tool turns decorated from a static
        registry; unmatched tools keep NULL metadata (left join), and the
        static side is broadcast — the streaming side never shuffles."""
        from real_time_sliding_window_spark.streaming.pipeline import enriched_stream

        dim = spark.createDataFrame(
            pd.DataFrame({"tool": ["search", "calc"],
                          "tool_category": ["retrieval", "math"]})
        )

        def pipe(stream):
            return enriched_stream(
                stream.filter(F.col("role") == "tool"), dim, keys=["tool"]
            ).select("conv_id", "turn_idx", "tool", "tool_category")

        pushes = [rows(
            ("c1", 0, "tool", "a", "search", 0),
            ("c1", 1, "tool", "b", "calc", 1),
            ("c1", 2, "tool", "c", "unknown_tool", 2),
            ("c1", 3, "user", "d", None, 3),
        )]
        _, snaps = drive(spark, tmp_path, pipe, pushes, "enrich")
        final = snaps[-1].sort_values("turn_idx")
        assert list(final["turn_idx"]) == [0, 1, 2]
        assert list(final["tool_category"].fillna("-")) == [
            "retrieval", "math", "-"
        ]


class TestLiveViewCompaction:
    def test_compact_preserves_state_and_stream_resumes(self, spark, tmp_path):
        """Compaction folds every delta into the OLDEST batch id; state
        reads identically, and — critically — the resumed stream's next
        epoch id does not collide with the snapshot (a max_id+1 snapshot
        would be silently skipped by the sink's idempotence check)."""
        import os

        from real_time_sliding_window_spark.streaming.live_view import LiveWindowView

        feed = FileFeed(spark, str(tmp_path / "cp_in"))
        view = LiveWindowView(str(tmp_path / "cp_store"))
        spec = WindowSpec(
            name="cp", length="60 seconds", watermark_delay="30 seconds"
        )
        ckpt = str(tmp_path / "cp_ckpt")

        def run_push(pdf):
            feed.push(pdf)
            q = view.start(
                feed.stream(), spec, ckpt, keys=["conv_id"], query_name="cp"
            )
            q.awaitTermination()

        run_push(rows(("c1", 0, "user", "a", None, 0)))
        run_push(rows(("c1", 1, "user", "b", None, 5)))
        run_push(rows(("c2", 0, "user", "c", None, 70)))
        before = view.buckets(spark, keys=["conv_id"]).toPandas()
        # >= 2: availableNow may add a watermark-advance epoch per push,
        # so 3 pushes yield up to 6 deltas — all but one fold away
        folded = view.compact(spark, keys=["conv_id"])
        assert folded >= 2
        after = view.buckets(spark, keys=["conv_id"]).toPandas()
        key = lambda p: sorted(
            map(tuple, p[["conv_id", "window_start", "n_rows"]].itertuples(index=False))
        )
        assert key(before) == key(after)
        assert len(os.listdir(view.delta_dir)) == 1  # one snapshot delta

        # the stream resumes from the same checkpoint: its next epoch (3)
        # must land (would be skipped if the snapshot had taken id 3)
        run_push(rows(("c1", 2, "user", "d", None, 10)))
        final = view.buckets(spark, keys=["conv_id"]).toPandas()
        c1w0 = final[(final.conv_id == "c1")]
        assert sorted(c1w0["n_rows"]) == [3]  # running count updated to 3


class TestLiveViewCompactionLease:
    @staticmethod
    def _two_delta_view(spark, tmp_path):
        from real_time_sliding_window_spark.streaming.live_view import LiveWindowView

        view = LiveWindowView(str(tmp_path / "lease_store"))
        mk = lambda n: spark.createDataFrame(pd.DataFrame({
            "window_start": [T0], "window_end": [T0 + 60 * SEC],
            "conv_id": ["c1"], "n_rows": [n],
        }))
        view.write_batch(mk(1), 0)
        view.write_batch(mk(2), 1)
        return view

    def test_lease_blocks_readers_and_stale_is_stolen(self, spark, tmp_path):
        """VERDICT r02 #6: reading mid-compaction could see a torn view —
        a held lease makes buckets() raise a retryable error, a second
        compactor refuses, and a CRASHED compactor's stale lease is stolen
        so the re-run completes the fold."""
        import os

        view = self._two_delta_view(spark, tmp_path)
        with open(view._lock_path(), "w") as f:
            f.write("{}")
        with pytest.raises(RuntimeError, match="compaction in progress"):
            view.buckets(spark, keys=["conv_id"])
        with pytest.raises(RuntimeError, match="lease held"):
            view.compact(spark, keys=["conv_id"])
        # crash-resume: the holder died long ago (ancient mtime) — steal
        os.utime(view._lock_path(), (1, 1))
        assert view.compact(spark, keys=["conv_id"]) == 1
        assert not os.path.exists(view._lock_path())
        out = view.buckets(spark, keys=["conv_id"]).toPandas()
        assert len(out) == 1 and out.iloc[0]["n_rows"] == 2  # newest wins

    def test_init_gc_removes_only_stale_tmp_dirs(self, spark, tmp_path):
        """A crashed compaction's _tmp_snap_* dir must not survive forever;
        a CONCURRENT writer's seconds-old tmp dir must survive the GC."""
        import os

        from real_time_sliding_window_spark.streaming.live_view import LiveWindowView

        view = self._two_delta_view(spark, tmp_path)
        stale = os.path.join(view.root, "_tmp_snap_deadbeef")
        fresh = os.path.join(view.root, "_tmp_12_cafe")
        os.makedirs(stale)
        os.makedirs(fresh)
        os.utime(stale, (1, 1))
        LiveWindowView(view.root)  # re-init runs the GC
        assert not os.path.exists(stale)
        assert os.path.exists(fresh)


EVENT_SCHEMA = "user_id string, event_type string, ts timestamp"


def event_rows(*specs) -> pd.DataFrame:
    """specs: (user_id, event_type, sec_offset)"""
    return pd.DataFrame(
        [
            {"user_id": u, "event_type": t, "ts": T0 + off * SEC}
            for (u, t, off) in specs
        ]
    )


class TestStreamingTwins:
    """VERDICT r02 #10: batch-only queries events_type_pivot and
    distinct_users_per_day get streaming twins over the same column
    contract — same drive pattern as the role-gauge twin."""

    def test_pivoted_stream_matches_batch_pivot(self, spark, tmp_path):
        from real_time_sliding_window_spark.streaming.pipeline import pivoted_stream

        types = ["click", "view", "purchase"]

        def pipe(stream):
            return pivoted_stream(
                stream, "event_type", types,
                window_length="2 seconds", watermark_delay="1 second",
            )

        batch1 = event_rows(
            ("u1", "click", 0), ("u2", "view", 0), ("u1", "click", 1),
            ("u3", "purchase", 2), ("u1", "view", 3),
        )
        closer = event_rows(("u9", "click", 30))
        sink, snaps = drive(spark, tmp_path, pipe, [batch1, closer], "pivtwin",
                            schema=EVENT_SCHEMA)
        final = snaps[-1].sort_values("window_start").reset_index(drop=True)
        # batch reference: the same conditional aggregate over the same rows
        ref = (
            spark.createDataFrame(pd.concat([batch1, closer]))
            .groupBy(F.window("ts", "2 seconds").alias("w"))
            .pivot("event_type", types)
            .agg(F.count(F.lit(1)))
            .select(
                F.col("w.start").alias("window_start"),
                *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
            )
            .toPandas()
        )
        # streaming emits only watermark-closed windows — restrict batch ref
        ref = (
            ref[ref.window_start.isin(set(final.window_start))]
            .sort_values("window_start").reset_index(drop=True)
        )
        assert len(final) == 2  # both 2s windows of batch1 closed
        for t in types:
            assert list(final[f"n_{t}"]) == list(ref[f"n_{t}"])

    def test_distinct_stream_is_exact_and_dedups_redelivery(self, spark, tmp_path):
        from real_time_sliding_window_spark.streaming.pipeline import (
            distinct_per_window_stream,
        )

        def pipe(stream):
            return distinct_per_window_stream(
                stream, "user_id", keys=["event_type"],
                window_length="2 seconds", watermark_delay="5 seconds",
            )

        batch1 = event_rows(
            ("u1", "click", 0), ("u1", "click", 1),   # same user twice
            ("u2", "click", 0), ("u1", "view", 1),
        )
        batch2 = event_rows(("u1", "click", 1))       # redelivered duplicate
        closer = event_rows(("u9", "click", 30))
        _, snaps = drive(
            spark, tmp_path, pipe, [batch1, batch2, closer], "disttwin",
            schema=EVENT_SCHEMA,
        )
        final = snaps[-1]
        w0 = final[final.window_start == T0]
        got = dict(zip(w0.event_type, w0.n_users))
        # u1 counted ONCE per (window, type) despite 3 click arrivals
        assert got == {"click": 2, "view": 1}

    def test_percentile_stream_matches_batch_sketch(self, spark, tmp_path):
        """Windowed GK-sketch percentiles stream (mergeable state — exact
        `percentile` cannot); in the exact regime the closed window's
        values equal the batch operator's on the same rows."""
        from real_time_sliding_window_spark.operators.windows import (
            approx_group_percentiles,
        )
        from real_time_sliding_window_spark.streaming.pipeline import (
            percentile_stream,
        )

        schema = "user_id string, event_type string, v long, ts timestamp"
        batch1 = pd.DataFrame(
            [
                {"user_id": "u1", "event_type": "click", "v": i,
                 "ts": T0 + (i % 2) * SEC}
                for i in range(100)
            ]
        )
        closer = pd.DataFrame(
            [{"user_id": "u9", "event_type": "click", "v": 1,
              "ts": T0 + 60 * SEC}]
        )

        def pipe(stream):
            return percentile_stream(
                stream, "v", (0.5, 0.95), keys=["event_type"],
                window_length="2 seconds", watermark_delay="1 second",
            )

        _, snaps = drive(
            spark, tmp_path, pipe, [batch1, closer], "pcttwin", schema=schema
        )
        final = snaps[-1]
        w0 = final[final.window_start == T0].iloc[0]
        ref = approx_group_percentiles(
            spark.createDataFrame(batch1, schema=schema),
            "v", ["event_type"], (0.5, 0.95),
        ).toPandas().iloc[0]
        assert w0["p_0_5"] == ref["p_0_5"]
        assert w0["p_0_95"] == ref["p_0_95"]
        assert w0["n_rows"] == 100

    def test_unpivot_streams_stateless(self, spark, tmp_path):
        """Unpivot (Expand) is stateless — the batch melt expression runs
        on a stream unchanged, one output row per (row, unpivoted col)."""

        def pipe(stream):
            wide = stream.select(
                "user_id", "ts",
                F.lit(1).alias("n_click"), F.lit(2).alias("n_view"),
            )
            return wide.unpivot(
                ["user_id", "ts"], ["n_click", "n_view"], "metric", "value"
            )

        batch = event_rows(("u1", "click", 0), ("u2", "view", 1))
        _, snaps = drive(
            spark, tmp_path, pipe, [batch], "unpivtwin", schema=EVENT_SCHEMA
        )
        final = snaps[-1]
        assert len(final) == 4  # 2 rows x 2 metrics
        assert sorted(final.metric.unique()) == ["n_click", "n_view"]
        assert sorted(final[final.metric == "n_click"].value) == [1, 1]


class TestLiveViewIdempotence:
    def test_write_batch_redelivery_noop(self, spark, tmp_path):
        """A redelivered live-view batch id is a no-op (commit-marker
        dedup) — the same exactly-once contract as the append sink."""
        from real_time_sliding_window_spark.streaming.live_view import LiveWindowView

        view = LiveWindowView(str(tmp_path / "idem_store"))
        df1 = spark.createDataFrame(pd.DataFrame({
            "window_start": [T0], "window_end": [T0 + 60 * SEC],
            "conv_id": ["c1"], "n_rows": [2],
        }))
        df2 = spark.createDataFrame(pd.DataFrame({
            "window_start": [T0], "window_end": [T0 + 60 * SEC],
            "conv_id": ["c1"], "n_rows": [99],   # would differ if applied
        }))
        view.write_batch(df1, 0)
        view.write_batch(df2, 0)   # redelivery: must be skipped
        got = view.buckets(spark, keys=["conv_id"]).toPandas()
        assert len(got) == 1 and got.iloc[0]["n_rows"] == 2


class TestStatelessDocOpsOnStreams:
    def test_chunking_composes_with_readstream(self, spark, tmp_path):
        """The stateless training-data ops are batch/stream-unified: the
        same chunk_documents call runs on a readStream plan (no .rdd
        touch, no stateful operator) and yields the same chunks."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from real_time_sliding_window_spark.operators.chunking import chunk_documents

        src = tmp_path / "docs_in"
        src.mkdir()
        pdf = pd.DataFrame({
            "doc_id": [0, 1],
            "text": [" ".join(f"w{i}" for i in range(40)), "tiny doc"],
        })
        pq.write_table(pa.Table.from_pandas(pdf), str(src / "d0.parquet"))
        stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
        sink = ExactlyOnceParquetSink(str(tmp_path / "docs_out"))
        run_to_sink(
            chunk_documents(stream, chunk_tokens=16, stride=16),
            sink, str(tmp_path / "docs_ckpt"), query_name="chunk_stream",
        )
        got = sink.read_committed(spark).toPandas()
        batch = chunk_documents(
            spark.createDataFrame(pdf), chunk_tokens=16, stride=16
        ).toPandas()
        k = lambda p: sorted(map(tuple, p[["doc_id", "chunk_idx", "chunk_text"]]
                                 .itertuples(index=False)))
        assert k(got) == k(batch)


class TestRingReplay:
    def test_state_replay_matches_live_buffer(self, spark, tmp_path):
        """Event-sourcing: replaying the emitted ADD/DUP/EVICT log
        reconstructs exactly the turns the ring buffer currently holds
        (capacity 2 -> the two newest turns per conversation)."""
        from real_time_sliding_window_spark.operators.stateful import (
            ring_state_from_actions,
        )

        def pipe(stream):
            return ring_buffer_stream(
                stream, timedelta(seconds=30), max_data=2
            )

        pushes = [
            rows(("c1", 0, "user", "a", None, 0), ("c1", 1, "user", "b", None, 1)),
            rows(("c1", 2, "user", "c", None, 2)),       # evicts turn 0
            # turn 0 re-delivered after its eviction: whether the engine
            # DUPs it or re-adds-and-re-evicts it, replay must agree
            rows(("c1", 0, "user", "a", None, 0)),
            rows(("c2", 0, "user", "x", None, 5)),
        ]
        sink, _ = drive(spark, tmp_path, pipe, pushes, "replay")
        log = sink.read_committed(spark)
        state = ring_state_from_actions(log).toPandas()
        c1 = state[state.conv_id == "c1"].sort_values("turn_rank")
        assert list(c1["turn_idx"]) == [1, 2]   # capacity 2: newest two
        assert list(c1["turn_rank"]) == [1, 2]
        c2 = state[state.conv_id == "c2"]
        assert list(c2["turn_idx"]) == [0]


class TestStreamingTwinValidation:
    def test_distinct_stream_rejects_short_watermark(self, spark):
        """Exactness precondition: watermark_delay < window_length would
        let dedup state expire mid-window and overcount (code-review r03)."""
        from real_time_sliding_window_spark.streaming.pipeline import (
            distinct_per_window_stream,
        )

        stream = (
            spark.readStream.format("rate").option("rowsPerSecond", 1).load()
            .selectExpr("'u' as user_id", "'t' as event_type",
                        "timestamp as ts")
        )
        with pytest.raises(ValueError, match="watermark_delay"):
            distinct_per_window_stream(
                stream, "user_id", keys=["event_type"],
                window_length="1 day", watermark_delay="1 minute",
            )


class TestStreamingPostings:
    def test_incremental_index_equals_batch_postings(self, spark, tmp_path):
        """Incremental retrieval index: per-batch postings increments
        through the exactly-once sink (with a redelivered batch proving
        idempotence) accumulate to EXACTLY the batch postings() of the
        full corpus, and scoring the accumulated index reproduces batch
        tfidf_topk."""
        from real_time_sliding_window_spark.operators.retrieval import (
            postings,
            run_postings_index,
            score_postings,
            tfidf_topk,
        )

        schema = "doc_id long, text string"
        b1 = pd.DataFrame({"doc_id": [0, 1],
                           "text": ["apple banana", "apple apple"]})
        b2 = pd.DataFrame({"doc_id": [2], "text": ["cherry apple"]})

        feed = FileFeed(spark, str(tmp_path / "pidx_in"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "pidx_out"))
        ckpt = str(tmp_path / "pidx_ckpt")
        for push in (b1, b2):
            feed.push(spark.createDataFrame(push, schema=schema))
            run_postings_index(feed.stream(schema), sink, ckpt)
        # rerun with no new files: replayed/empty trigger must not change
        # the committed index (exactly-once manifest)
        run_postings_index(feed.stream(schema), sink, ckpt)
        idx = sink.read_committed(spark)
        full = spark.createDataFrame(pd.concat([b1, b2]), schema=schema)
        batch_post = postings(full).toPandas()
        got = idx.toPandas()[batch_post.columns.tolist()]
        key = lambda p: sorted(map(tuple, p.itertuples(index=False)))
        assert key(got) == key(batch_post)

        # scoring the accumulated index == batch tfidf_topk on the corpus
        q = [("q", "apple cherry")]
        from_idx = score_postings(idx, n_docs=3, queries=q, k=5).toPandas()
        from_batch = tfidf_topk(full, q, k=5).toPandas()
        assert key(from_idx) == key(from_batch)


class TestNearDupIngestGuard:
    """VERDICT r03 #2: streaming near-dup rejection AT INGEST — an
    accumulating simhash band index through the exactly-once sink."""

    SCHEMA = "doc_id string, text string"
    UNIQ = {
        "a": "the quick brown fox jumps over the lazy dog near the river",
        "b": "spark structured streaming maintains state across micro "
             "batch boundaries with watermarks",
        "c": "connected components converge after logarithmically many "
             "rounds of minimum propagation",
        "d": "parquet column chunks compress runs of similar values into "
             "compact dictionary pages",
    }

    def _run(self, spark, tmp_path, pushes, name, **kw):
        from real_time_sliding_window_spark.streaming.neardup_guard import (
            run_neardup_ingest,
        )

        feed = FileFeed(spark, str(tmp_path / f"{name}_in"))
        idx = ExactlyOnceParquetSink(str(tmp_path / f"{name}_idx"))
        acc = ExactlyOnceParquetSink(str(tmp_path / f"{name}_acc"))
        ckpt = str(tmp_path / f"{name}_ckpt")
        for push in pushes:
            feed.push(spark.createDataFrame(push, schema=self.SCHEMA))
            run_neardup_ingest(
                feed.stream(self.SCHEMA), idx, ckpt, accept_sink=acc, **kw
            )
        return feed, idx, acc, ckpt

    def test_single_batch_equals_batch_survivors(self, spark, tmp_path):
        """Whole corpus in ONE batch == batch simhash pairs -> CC ->
        min-id survivors (the guard's stated equivalence)."""
        from real_time_sliding_window_spark.operators.dedup import (
            connected_components,
            simhash_neardup_pairs,
        )

        U = self.UNIQ
        corpus = pd.DataFrame({
            "doc_id": ["d0", "d1", "d2", "d3", "d4"],
            "text": [U["a"], U["a"], U["b"], U["b"], U["c"]],
        })
        _, idx, acc, _ = self._run(spark, tmp_path, [corpus], "one")
        got = sorted(set(acc.read_committed(spark).toPandas().doc_id))

        full = spark.createDataFrame(corpus, schema=self.SCHEMA)
        pairs = simhash_neardup_pairs(full, max_bucket=None)
        comp = connected_components(
            pairs.select("doc_a", "doc_b"), full.select("doc_id"), "doc_id"
        ).toPandas()
        want = sorted(comp[comp.doc_id == comp.cluster_id].doc_id)
        assert got == want == ["d0", "d2", "d4"]
        # index holds exactly the accepted docs' band rows (4 each)
        bands = idx.read_committed(spark).toPandas()
        assert sorted(set(bands.doc_id)) == want
        assert (bands.groupby("doc_id").size() == 4).all()

    def test_multi_batch_greedy_and_redelivery(self, spark, tmp_path):
        """Cross-batch greedy rejection, hamming-0 re-ingest rejection,
        and exactly-once re-run stability."""
        from real_time_sliding_window_spark.streaming.neardup_guard import (
            run_neardup_ingest,
        )

        U = self.UNIQ
        b1 = pd.DataFrame({"doc_id": ["d0", "d1", "d2"],
                           "text": [U["a"], U["a"], U["b"]]})
        b2 = pd.DataFrame({"doc_id": ["d3", "d4"],
                           "text": [U["a"], U["c"]]})   # d3 dup of accepted d0
        b3 = pd.DataFrame({"doc_id": ["d5"], "text": [U["c"]]})  # dup of d4
        feed, idx, acc, ckpt = self._run(
            spark, tmp_path, [b1, b2, b3], "multi"
        )
        accepted = sorted(set(acc.read_committed(spark).toPandas().doc_id))
        assert accepted == ["d0", "d2", "d4"]
        # re-run with no new files: committed sets unchanged
        n_idx = len(idx.read_committed(spark).toPandas())
        run_neardup_ingest(feed.stream(self.SCHEMA), idx, ckpt,
                           accept_sink=acc)
        assert len(idx.read_committed(spark).toPandas()) == n_idx
        assert sorted(set(
            acc.read_committed(spark).toPandas().doc_id
        )) == ["d0", "d2", "d4"]

    def test_accepted_set_pairwise_non_neardup(self, spark, tmp_path):
        """Invariant: no two ACCEPTED docs are near-dups of each other,
        regardless of batching."""
        from real_time_sliding_window_spark.operators.dedup import (
            simhash_neardup_pairs,
        )

        U = self.UNIQ
        b1 = pd.DataFrame({"doc_id": ["a0", "a1"],
                           "text": [U["a"], U["b"]]})
        b2 = pd.DataFrame({"doc_id": ["a2", "a3"],
                           "text": [U["b"], U["d"]]})
        _, _, acc, _ = self._run(spark, tmp_path, [b1, b2], "inv")
        accepted = acc.read_committed(spark)
        n_pairs = simhash_neardup_pairs(
            accepted, max_bucket=None
        ).count()
        assert n_pairs == 0
        assert sorted(set(accepted.toPandas().doc_id)) == ["a0", "a1", "a3"]

    def test_embedding_guard_greedy_and_equivalence(self, spark, tmp_path):
        """Embedding-mode (semantic) ingest guard: single-batch input ==
        batch embedding_neardup_pairs + CC min-id survivors; a later
        re-ingest of an accepted vector (cosine 1) is rejected; bigint
        vec_ids survive the typed semi-join."""
        import numpy as np

        from real_time_sliding_window_spark.operators.dedup import (
            connected_components,
            embedding_neardup_pairs,
        )
        from real_time_sliding_window_spark.streaming.neardup_guard import (
            run_embedding_ingest,
        )

        rng = np.random.default_rng(11)
        vecs = rng.normal(size=(8, 16)).astype(np.float32)
        vecs[1] = vecs[0] + 0.01   # near-dup pair (0, 1)
        vecs[4] = vecs[3] * 1.02   # near-dup pair (3, 4)
        schema = "vec_id long, embedding array<float>"

        def pdf(ids, rows_):
            return pd.DataFrame(
                {"vec_id": ids,
                 "embedding": [list(map(float, r)) for r in rows_]}
            )

        b1 = pdf(range(8), vecs)
        b2 = pdf([100, 101], [vecs[0], rng.normal(size=16)])  # 100 ~ acc 0

        feed = FileFeed(spark, str(tmp_path / "eg_in"))
        idx = ExactlyOnceParquetSink(str(tmp_path / "eg_idx"))
        acc = ExactlyOnceParquetSink(str(tmp_path / "eg_acc"))
        ckpt = str(tmp_path / "eg_ckpt")
        for push in (b1, b2):
            feed.push(spark.createDataFrame(push, schema=schema))
            run_embedding_ingest(
                feed.stream(schema), idx, ckpt, accept_sink=acc,
                min_cosine=0.95,
            )

        accepted = sorted(acc.read_committed(spark).toPandas().vec_id)
        # batch-side survivors of b1 alone
        full = spark.createDataFrame(b1, schema=schema)
        pairs = embedding_neardup_pairs(
            full, min_cosine=0.95, multiprobe=True
        )
        comp = connected_components(
            pairs.select(
                F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
            ),
            full.select(F.col("vec_id").alias("doc_id")),
            "doc_id",
        ).toPandas()
        want_b1 = sorted(
            int(v) for v in comp[comp.doc_id == comp.cluster_id].doc_id
        )
        # batch 2: 100 rejected (cosine 1 vs accepted 0), 101 accepted
        assert accepted == want_b1 + [101]
        assert 1 not in accepted and 4 not in accepted and 100 not in accepted
        # accepted rows keep the caller's bigint id type
        assert acc.read_committed(spark).schema["vec_id"].dataType.typeName() == "long"

    def test_retry_shortcircuit_replays_committed_decision(self, spark,
                                                           tmp_path):
        """Advice r4: a foreachBatch RETRY of a batch whose index write
        committed (crash between index commit and accept/checkpoint
        commit) replays the RECORDED decision — the committed index rows
        — instead of recomputing against an index that now contains this
        very batch. Pinned by simulating the crash: wipe the checkpoint
        and the accept sink's commit, re-run, require the original
        accepted set and an unchanged index."""
        import shutil

        from real_time_sliding_window_spark.streaming.neardup_guard import (
            run_neardup_ingest,
        )

        U = self.UNIQ
        b1 = pd.DataFrame({"doc_id": ["d0", "d1", "d2"],
                           "text": [U["a"], U["a"], U["b"]]})
        feed = FileFeed(spark, str(tmp_path / "rt_in"))
        idx = ExactlyOnceParquetSink(str(tmp_path / "rt_idx"))
        acc = ExactlyOnceParquetSink(str(tmp_path / "rt_acc"))
        ckpt = str(tmp_path / "rt_ckpt")
        feed.push(spark.createDataFrame(b1, schema=self.SCHEMA))
        run_neardup_ingest(feed.stream(self.SCHEMA), idx, ckpt,
                           accept_sink=acc)
        orig = sorted(set(acc.read_committed(spark).toPandas().doc_id))
        assert orig == ["d0", "d2"]
        n_idx = len(idx.read_committed(spark).toPandas())

        # crash simulation: index committed; accept + checkpoint lost
        shutil.rmtree(ckpt)
        shutil.rmtree(acc.root)
        acc2 = ExactlyOnceParquetSink(str(tmp_path / "rt_acc"))
        run_neardup_ingest(feed.stream(self.SCHEMA), idx, ckpt,
                           accept_sink=acc2)
        assert sorted(set(
            acc2.read_committed(spark).toPandas().doc_id
        )) == orig
        assert len(idx.read_committed(spark).toPandas()) == n_idx

    def test_same_id_cross_batch_redelivery_rejected(self, spark,
                                                     tmp_path):
        """Advice r4: an at-least-once source redelivering a doc in a
        LATER batch under its ORIGINAL doc_id must be caught as a
        hamming-0 near-dup of its accepted original — no duplicate rows
        in the accept sink, no duplicate band rows in the index."""
        U = self.UNIQ
        b1 = pd.DataFrame({"doc_id": ["x1", "x2"],
                           "text": [U["a"], U["b"]]})
        b2 = pd.DataFrame({"doc_id": ["x1"], "text": [U["a"]]})  # same id!
        _, idx, acc, _ = self._run(spark, tmp_path, [b1, b2], "sameid")
        accepted = acc.read_committed(spark).toPandas()
        assert sorted(accepted.doc_id) == ["x1", "x2"]  # exactly once
        bands = idx.read_committed(spark).toPandas()
        assert len(bands) == 8  # 2 docs x 4 bands, batch 2 added none

    def test_embedding_retry_transitive_cluster(self, spark, tmp_path):
        """Advice r4's exact divergence scenario, pinned: a transitive
        within-batch cluster A~B, B~R, A!~R (min-id keeps only A). A
        naive retry recompute against an index holding A's rows rejects
        B but lets R survive (R no longer meets B) — accepting {A, R}.
        The short-circuit must reproduce {A}."""
        import shutil

        import numpy as np

        from real_time_sliding_window_spark.streaming.neardup_guard import (
            run_embedding_ingest,
        )

        # unit vectors at 0 / 25 / 50 degrees in a 16-dim plane:
        # cos(A,B) = cos(B,R) = cos(25°) ≈ .906 >= .86; cos(A,R) ≈ .643 < .86
        def rot(deg):
            v = np.zeros(16, dtype=np.float64)
            v[0] = np.cos(np.radians(deg))
            v[1] = np.sin(np.radians(deg))
            return list(v)

        schema = "vec_id long, embedding array<float>"
        b1 = pd.DataFrame(
            {"vec_id": [0, 1, 2],
             "embedding": [rot(0), rot(25), rot(50)]}
        )
        feed = FileFeed(spark, str(tmp_path / "tr_in"))
        idx = ExactlyOnceParquetSink(str(tmp_path / "tr_idx"))
        acc = ExactlyOnceParquetSink(str(tmp_path / "tr_acc"))
        ckpt = str(tmp_path / "tr_ckpt")
        # n_planes=1: flip-1-bit multiprobe covers the whole bucket space,
        # so EVERY pair is a candidate and the exact cosine filter alone
        # decides — the transitive structure is guaranteed, not luck
        kw = dict(accept_sink=acc, min_cosine=0.86, n_planes=1)
        feed.push(spark.createDataFrame(b1, schema=schema))
        run_embedding_ingest(feed.stream(schema), idx, ckpt, **kw)
        # construction check: the cluster resolved transitively to {0}
        # (if (1,2) had not been a candidate pair, 2 would survive)
        assert sorted(acc.read_committed(spark).toPandas().vec_id) == [0]

        # crash between index commit and accept/checkpoint commit
        shutil.rmtree(ckpt)
        shutil.rmtree(acc.root)
        acc2 = ExactlyOnceParquetSink(str(tmp_path / "tr_acc"))
        kw["accept_sink"] = acc2
        run_embedding_ingest(feed.stream(schema), idx, ckpt, **kw)
        got = sorted(acc2.read_committed(spark).toPandas().vec_id)
        assert got == [0]  # NOT [0, 2]
        assert sorted(set(
            idx.read_committed(spark).toPandas().vec_id
        )) == ["0"]

    def test_bucketed_index_sink_parity(self, spark, tmp_path):
        """The BucketedIndexSink (production no-index-shuffle layout)
        produces decision-identical results to the parquet sink across
        multi-batch greedy ingest, including exactly-once re-runs."""
        from real_time_sliding_window_spark.streaming.neardup_guard import (
            run_neardup_ingest,
        )
        from real_time_sliding_window_spark.streaming.sink import (
            BucketedIndexSink,
        )

        U = self.UNIQ
        b1 = pd.DataFrame({"doc_id": ["d0", "d1", "d2"],
                           "text": [U["a"], U["a"], U["b"]]})
        b2 = pd.DataFrame({"doc_id": ["d3", "d4"],
                           "text": [U["a"], U["c"]]})
        b3 = pd.DataFrame({"doc_id": ["d5"], "text": [U["c"]]})
        feed = FileFeed(spark, str(tmp_path / "bk_in"))
        idx = BucketedIndexSink(
            str(tmp_path / "bk_idx"), "bk_idx_table",
            keys=["band_idx", "band_val"], n_buckets=4,
        )
        acc = ExactlyOnceParquetSink(str(tmp_path / "bk_acc"))
        ckpt = str(tmp_path / "bk_ckpt")
        try:
            for push in (b1, b2, b3):
                feed.push(spark.createDataFrame(push, schema=self.SCHEMA))
                run_neardup_ingest(feed.stream(self.SCHEMA), idx, ckpt,
                                   accept_sink=acc)
            accepted = sorted(set(
                acc.read_committed(spark).toPandas().doc_id
            ))
            assert accepted == ["d0", "d2", "d4"]  # == parquet-sink run
            idx_rows = idx.read_committed(spark).toPandas()
            assert sorted(set(idx_rows.doc_id)) == accepted
            assert (idx_rows.groupby("doc_id").size() == 4).all()
            # re-run with no new files: exactly-once no-op
            run_neardup_ingest(feed.stream(self.SCHEMA), idx, ckpt,
                               accept_sink=acc)
            assert len(idx.read_committed(spark).toPandas()) == len(idx_rows)
        finally:
            spark.sql("DROP TABLE IF EXISTS bk_idx_table")

    def test_bucketed_index_sink_compaction(self, spark, tmp_path):
        """r5: compact() rewrites the accumulated index as ONE
        n_buckets-file generation — rows identical (batch_id preserved,
        so read_batch/retry replay still work), file count reset, and
        subsequent guard batches append to the new generation."""
        import glob

        from real_time_sliding_window_spark.streaming.neardup_guard import (
            run_neardup_ingest,
        )
        from real_time_sliding_window_spark.streaming.sink import (
            BucketedIndexSink,
        )

        U = self.UNIQ
        b1 = pd.DataFrame({"doc_id": ["d0", "d1", "d2"],
                           "text": [U["a"], U["a"], U["b"]]})
        b2 = pd.DataFrame({"doc_id": ["d3", "d4"],
                           "text": [U["a"], U["c"]]})
        b3 = pd.DataFrame({"doc_id": ["d5"], "text": [U["d"]]})
        feed = FileFeed(spark, str(tmp_path / "cp_in"))
        idx = BucketedIndexSink(
            str(tmp_path / "cp_idx"), "cp_idx_table",
            keys=["band_idx", "band_val"], n_buckets=4,
        )
        acc = ExactlyOnceParquetSink(str(tmp_path / "cp_acc"))
        ckpt = str(tmp_path / "cp_ckpt")
        try:
            for push in (b1, b2):
                feed.push(spark.createDataFrame(push, schema=self.SCHEMA))
                run_neardup_ingest(feed.stream(self.SCHEMA), idx, ckpt,
                                   accept_sink=acc)
            key = lambda df: sorted(
                map(tuple, df.toPandas().itertuples(index=False))
            )
            before = key(idx.read_committed(spark, with_batch_id=True))
            gen = idx.compact(spark)
            assert gen == 1
            # rows identical, batch_id preserved, per-batch readback works
            assert key(
                idx.read_committed(spark, with_batch_id=True)
            ) == before
            assert idx.read_batch(spark, 1).select(
                "doc_id"
            ).distinct().count() == 1  # batch 1 accepted only d4
            # one generation's worth of files
            files = glob.glob(
                str(tmp_path / "cp_idx" / "data_g1" / "*.parquet")
            )
            assert 0 < len(files) <= 4
            # the guard keeps working against the compacted generation
            feed.push(spark.createDataFrame(b3, schema=self.SCHEMA))
            run_neardup_ingest(feed.stream(self.SCHEMA), idx, ckpt,
                               accept_sink=acc)
            accepted = sorted(set(
                acc.read_committed(spark).toPandas().doc_id
            ))
            assert accepted == ["d0", "d2", "d4", "d5"]
            assert len(idx.committed_batches()) == 3
        finally:
            spark.sql("DROP TABLE IF EXISTS cp_idx_table")
            spark.sql("DROP TABLE IF EXISTS cp_idx_table_g1")

    def test_compact_heals_torn_retry_duplicates(self, spark, tmp_path):
        """Advice r5: a crash between the table append and the marker
        rename, followed by a retry's second append, duplicates one
        batch's rows under the same batch_id. Presence-based probes are
        unaffected, but row-COUNTING read_committed consumers (the
        guards' occupancy fallback) would over-count — compact() now
        distinct()s the accumulated rows, restoring exact counts while
        preserving batch_id readback."""
        from pyspark.sql import functions as SF

        from real_time_sliding_window_spark.streaming.sink import (
            BucketedIndexSink,
        )

        idx = BucketedIndexSink(
            str(tmp_path / "tr_idx"), "tr_idx_table",
            keys=["band_idx", "band_val"], n_buckets=2,
        )
        rows = spark.createDataFrame(
            pd.DataFrame({
                "doc_id": ["d0", "d1"],
                "band_idx": [0, 0],
                "band_val": [7, 9],
            })
        )
        try:
            # torn retry: first append lands in the table but the crash
            # happens before the marker rename ...
            idx._write(
                rows.withColumn("batch_id", SF.lit(0)),
                idx.table, idx.data_dir,
            )
            # ... and the retry re-appends the same batch and commits
            idx.write_batch(rows, 0)
            torn = idx.read_committed(spark, with_batch_id=True)
            assert torn.count() == 4  # duplicated — the advice's hazard
            assert idx.compact(spark) == 1
            healed = idx.read_committed(spark, with_batch_id=True)
            assert healed.count() == 2
            assert sorted(
                map(tuple, healed.toPandas().itertuples(index=False))
            ) == [("d0", 0, 7, 0), ("d1", 0, 9, 0)]
            assert idx.read_batch(spark, 0).count() == 2
        finally:
            spark.sql("DROP TABLE IF EXISTS tr_idx_table")
            spark.sql("DROP TABLE IF EXISTS tr_idx_table_g1")

    def test_occupancy_increment_log_parity_and_backfill(self, spark,
                                                         tmp_path):
        """r5: with occupancy_sink wired, the hot-bucket cap computed
        from summed increments must make IDENTICAL decisions to the
        index-re-agg path in a regime where the cap bites (5 clones >
        max_bucket=3 -> bands hot -> candidates skipped -> all clones
        accepted; a 6th clone in batch 2 still meets a hot bucket); the
        increment sums equal the index's per-bucket occupancy; and a
        crash between index and occupancy commit is healed by the retry
        backfill."""
        import os
        import shutil

        from real_time_sliding_window_spark.streaming.neardup_guard import (
            run_neardup_ingest,
        )

        U = self.UNIQ
        b1 = pd.DataFrame({
            "doc_id": [f"x{i}" for i in range(5)] + ["y0"],
            "text": [U["a"]] * 5 + [U["b"]],
        })
        b2 = pd.DataFrame({"doc_id": ["x9", "z0"],
                           "text": [U["a"], U["c"]]})

        def run(name, with_occ):
            feed = FileFeed(spark, str(tmp_path / f"{name}_in"))
            idx = ExactlyOnceParquetSink(str(tmp_path / f"{name}_idx"))
            acc = ExactlyOnceParquetSink(str(tmp_path / f"{name}_acc"))
            occ = (ExactlyOnceParquetSink(str(tmp_path / f"{name}_occ"))
                   if with_occ else None)
            ckpt = str(tmp_path / f"{name}_ckpt")
            for push in (b1, b2):
                feed.push(spark.createDataFrame(push, schema=self.SCHEMA))
                run_neardup_ingest(
                    feed.stream(self.SCHEMA), idx, ckpt, accept_sink=acc,
                    max_bucket=3, occupancy_sink=occ,
                )
            return idx, acc, occ, ckpt

        idx_a, acc_a, _, _ = run("oa", with_occ=False)
        idx_b, acc_b, occ_b, ckpt_b = run("ob", with_occ=True)
        want = sorted(set(acc_a.read_committed(spark).toPandas().doc_id))
        got = sorted(set(acc_b.read_committed(spark).toPandas().doc_id))
        assert got == want
        # the cap bit: all clones survived (hot buckets skip candidates)
        assert set(f"x{i}" for i in range(5)) | {"x9"} <= set(got)

        def occ_sums(occ):
            return (
                occ.read_committed(spark).toPandas()
                .groupby(["band_idx", "band_val"]).n.sum().to_dict()
            )

        def idx_counts(idx):
            pdf = idx.read_committed(spark).toPandas()
            return pdf.groupby(["band_idx", "band_val"]).size().to_dict()

        assert occ_sums(occ_b) == idx_counts(idx_b)

        # crash between index commit and occupancy commit on batch 1:
        # drop occupancy's batch-1 commit, then drive the RETRY (same
        # rows, same batch id — the foreachBatch redelivery shape)
        # through the module-level body; the short-circuit must backfill
        # the increments from the committed index rows
        from real_time_sliding_window_spark.streaming.neardup_guard import (
            ingest_text_batch,
        )

        os.remove(os.path.join(occ_b.commit_dir, "1.json"))
        shutil.rmtree(os.path.join(occ_b.data_dir, "batch_id=1"))
        assert occ_sums(occ_b) != idx_counts(idx_b)  # crash state visible
        ingest_text_batch(
            spark, spark.createDataFrame(b2, schema=self.SCHEMA), 1,
            idx_b, accept_sink=acc_b, max_bucket=3, occupancy_sink=occ_b,
        )
        assert occ_sums(occ_b) == idx_counts(idx_b)
        assert sorted(set(
            acc_b.read_committed(spark).toPandas().doc_id
        )) == want

    def test_embedding_occupancy_log_parity(self, spark, tmp_path):
        """r5: the embedding guard's occupancy increment log makes
        identical decisions to the index-re-agg path in a clone-heavy
        capped regime, and its sums equal the index's per-bucket
        occupancy."""
        import numpy as np

        from real_time_sliding_window_spark.streaming.neardup_guard import (
            run_embedding_ingest,
        )

        rng = np.random.default_rng(23)
        base = rng.normal(size=16)
        other = rng.normal(size=16)
        schema = "vec_id long, embedding array<float>"
        b1 = pd.DataFrame({
            "vec_id": list(range(5)) + [50],
            "embedding": [list(map(float, base))] * 5
            + [list(map(float, other))],
        })
        b2 = pd.DataFrame({
            "vec_id": [9, 60],
            "embedding": [list(map(float, base)),
                          list(map(float, rng.normal(size=16)))],
        })

        def run(name, with_occ):
            feed = FileFeed(spark, str(tmp_path / f"{name}_in"))
            idx = ExactlyOnceParquetSink(str(tmp_path / f"{name}_idx"))
            acc = ExactlyOnceParquetSink(str(tmp_path / f"{name}_acc"))
            occ = (ExactlyOnceParquetSink(str(tmp_path / f"{name}_occ"))
                   if with_occ else None)
            ckpt = str(tmp_path / f"{name}_ckpt")
            for push in (b1, b2):
                feed.push(spark.createDataFrame(push, schema=schema))
                run_embedding_ingest(
                    feed.stream(schema), idx, ckpt, accept_sink=acc,
                    min_cosine=0.9, n_planes=4, max_bucket=3,
                    occupancy_sink=occ,
                )
            return idx, acc, occ

        _, acc_a, _ = run("va", with_occ=False)
        idx_b, acc_b, occ_b = run("vb", with_occ=True)
        want = sorted(acc_a.read_committed(spark).toPandas().vec_id)
        got = sorted(acc_b.read_committed(spark).toPandas().vec_id)
        assert got == want
        # the cap bit: the clones survived via hot-bucket candidate skip
        assert set(range(5)) | {9} <= set(got)
        occ_sums = (
            occ_b.read_committed(spark).toPandas()
            .groupby("bucket").n.sum().to_dict()
        )
        idx_counts = (
            idx_b.read_committed(spark).toPandas()
            .groupby("bucket").size().to_dict()
        )
        assert occ_sums == idx_counts

    def test_numeric_min_id_not_lexicographic(self, spark, tmp_path):
        """Review r4: bigint doc_ids must resolve clusters by NUMERIC
        min (min(9,10)=9), not string min ('10'<'9') — the guard keeps
        the caller's id type end to end now."""
        from real_time_sliding_window_spark.streaming.neardup_guard import (
            run_neardup_ingest,
        )

        schema = "doc_id long, text string"
        b1 = pd.DataFrame({"doc_id": [10, 9],
                           "text": [self.UNIQ["a"], self.UNIQ["a"]]})
        feed = FileFeed(spark, str(tmp_path / "nid_in"))
        idx = ExactlyOnceParquetSink(str(tmp_path / "nid_idx"))
        acc = ExactlyOnceParquetSink(str(tmp_path / "nid_acc"))
        feed.push(spark.createDataFrame(b1, schema=schema))
        run_neardup_ingest(
            feed.stream(schema), idx, str(tmp_path / "nid_ckpt"),
            accept_sink=acc,
        )
        accepted = acc.read_committed(spark).toPandas()
        assert list(accepted.doc_id) == [9]
        assert accepted.doc_id.dtype.kind == "i"  # caller's bigint kept

    def test_hot_banded_doc_survives_cap(self, spark):
        """Review r4: max_bucket caps candidate generation, never the
        acceptance universe — docs whose every band is hot must still be
        accepted (they just meet no candidates), not silently dropped."""
        from real_time_sliding_window_spark.operators.dedup import (
            simhash_bands,
        )
        from real_time_sliding_window_spark.streaming.neardup_guard import (
            _accepted_ids,
        )

        # 30 docs with IDENTICAL simhash -> every band bucket holds 30
        rows = [(f"d{i:02d}", 0) for i in range(30)]
        bands = simhash_bands(spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "simhash"]),
            schema="doc_id string, simhash long",
        ))
        acc = sorted(_accepted_ids(bands, None, 3, 8).toPandas().doc_id)
        # no candidates generated (all buckets hot) -> ALL accepted;
        # the pre-review draft dropped every doc here
        assert acc == sorted(f"d{i:02d}" for i in range(30))

    def test_cross_batch_chain_is_greedy(self, spark):
        """The documented divergence: A~B, B~C, A!~C with C in a later
        batch — batch CC keeps {A}; greedy ingest keeps {A, C}. Driven
        through the decision core with crafted fingerprints (simhash
        text -> exact hamming relations are not constructible)."""
        from real_time_sliding_window_spark.operators.dedup import (
            simhash_bands,
        )
        from real_time_sliding_window_spark.streaming.neardup_guard import (
            _accepted_ids,
        )

        def fp(rows_):
            return spark.createDataFrame(
                pd.DataFrame(rows_, columns=["doc_id", "simhash"]),
                schema="doc_id string, simhash long",
            )

        # A=0b000000, B=0b000111 (h(A,B)=3), C=0b111111 (h(B,C)=3,
        # h(A,C)=6 > 3); all share bands 1-3 (zeros) so all are candidates
        batch1 = simhash_bands(fp([("A", 0), ("B", 7)]))
        acc1 = _accepted_ids(batch1, None, 3, None).toPandas()
        assert sorted(acc1.doc_id) == ["A"]
        index = batch1.join(
            spark.createDataFrame(pd.DataFrame({"doc_id": acc1.doc_id})),
            "doc_id",
        )
        batch2 = simhash_bands(fp([("C", 63)]))
        acc2 = _accepted_ids(batch2, index, 3, None).toPandas()
        assert sorted(acc2.doc_id) == ["C"]  # greedy: B was never accepted


class TestHeavyHitters:
    def test_misra_gries_guarantees_over_batches(self, spark, tmp_path):
        """r4: streamed Misra-Gries summary (m=8) over 3 micro-batches
        of skewed items must satisfy the classic guarantees vs exact
        counts: under-estimate only, true <= est + err, err <= N/(m+1),
        and every item above the N/(m+1) frequency line is tracked."""
        import numpy as np

        from real_time_sliding_window_spark.operators.heavy_hitters import (
            heavy_hitters_stream,
        )

        m = 8
        rng = np.random.default_rng(5)
        zipf = [f"i{min(int(v), 40)}" for v in rng.zipf(1.4, 3000)]
        batches = [
            pd.DataFrame({
                "grp": ["g1"] * 800 + ["g2"] * 200,
                "item": zipf[k * 1000: k * 1000 + 800]
                + zipf[k * 1000 + 800: (k + 1) * 1000],
            })
            for k in range(3)
        ]
        schema = "grp string, item string"

        def pipe(stream):
            return heavy_hitters_stream(stream, "grp", "item", m=m)

        _, snaps = drive(
            spark, tmp_path, pipe, batches, "hh", schema=schema
        )
        final = snaps[-1]
        latest = final[final.version == final.groupby("group")
                       .version.transform("max")]

        exact = (
            pd.concat(batches)
            .groupby(["grp", "item"]).size().to_dict()
        )
        n_by_grp = pd.concat(batches).groupby("grp").size().to_dict()
        for grp in ("g1", "g2"):
            rows = latest[latest.group == grp]
            n = n_by_grp[grp]
            assert int(rows.n_total.iloc[0]) == n
            err = int(rows.err_bound.iloc[0])
            assert err <= n / (m + 1)
            assert len(rows) <= m
            for r in rows.itertuples():
                true = exact.get((grp, r.item), 0)
                assert r.est_count <= true <= r.est_count + err
            # completeness: anything above the frequency line is tracked
            tracked = set(rows.item)
            for (g, item), true in exact.items():
                if g == grp and true > n / (m + 1):
                    assert item in tracked, (item, true, n / (m + 1))


    def test_latest_summaries_bounded_reader(self, spark, tmp_path):
        """VERDICT r04 #3: the version log grows m rows/group/batch;
        latest_summaries must return exactly the CURRENT summary per
        group after multi-batch evolution — max version only, schema
        unchanged, groups with different version counts handled."""
        from real_time_sliding_window_spark.operators.heavy_hitters import (
            heavy_hitters_stream,
            latest_summaries,
        )

        batches = [
            pd.DataFrame({"grp": ["g1"] * 4 + ["g2"] * 2,
                          "item": ["a", "a", "b", "c", "x", "y"]}),
            pd.DataFrame({"grp": ["g1"] * 3,
                          "item": ["a", "b", "b"]}),   # g2 absent: stays v1
            pd.DataFrame({"grp": ["g1"] * 2 + ["g2"] * 1,
                          "item": ["d", "a", "x"]}),
        ]
        schema = "grp string, item string"
        sink, _ = drive(
            spark, tmp_path, lambda s: heavy_hitters_stream(s, "grp",
                                                            "item", m=8),
            batches, "hhl", schema=schema,
        )
        log = sink.read_committed(spark)
        got = latest_summaries(log).toPandas()
        assert list(got.columns) == list(log.columns)
        # g1 evolved to version 3, g2 only to version 2
        assert set(got[got.group == "g1"].version) == {3}
        assert set(got[got.group == "g2"].version) == {2}
        # the latest slice carries the full-stream totals and counts
        g1 = got[got.group == "g1"].set_index("item").est_count.to_dict()
        assert g1 == {"a": 4, "b": 3, "c": 1, "d": 1}  # m=8: exact
        assert int(got[got.group == "g1"].n_total.iloc[0]) == 9
        g2 = got[got.group == "g2"].set_index("item").est_count.to_dict()
        assert g2 == {"x": 2, "y": 1}
        # and the log is strictly bigger than the latest view
        assert len(log.toPandas()) > len(got)


class TestDistinctSketchIndex:
    def test_incremental_union_equals_single_pass_and_truth(
        self, spark, tmp_path
    ):
        """r4: cross-batch repeats dedup by construction, redelivered
        triggers are idempotent, the estimate is deterministic for a
        given index, and EVERY batch cut (incremental, regrouped,
        single-pass) lands within HLL error of the truth — while the
        exact estimate value shifts sub-percent with merge history
        (HIP-vs-union estimator + mode promotion; see sketches.py for
        why the stronger equalities are deliberately NOT claimed)."""
        from real_time_sliding_window_spark.streaming.sketches import (
            distinct_estimates,
            run_distinct_index,
        )

        schema = "grp string, user_id long"
        # group a: 600 distinct users spread over 3 batches WITH overlap
        # (users 0-299 / 200-449 / 400-599); group b: 50 distinct
        b1 = pd.DataFrame({"grp": ["a"] * 300 + ["b"] * 50,
                           "user_id": list(range(300)) + list(range(50))})
        b2 = pd.DataFrame({"grp": ["a"] * 250,
                           "user_id": list(range(200, 450))})
        b3 = pd.DataFrame({"grp": ["a"] * 200 + ["b"] * 50,
                           "user_id": list(range(400, 600))
                           + list(range(50))})

        feed = FileFeed(spark, str(tmp_path / "hll_in"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "hll_idx"))
        ckpt = str(tmp_path / "hll_ckpt")
        for push in (b1, b2, b3):
            feed.push(spark.createDataFrame(push, schema=schema))
            run_distinct_index(
                feed.stream(schema), sink, ckpt, ["grp"], "user_id"
            )
        # re-run with no new data: index unchanged (exactly-once)
        n_rows = sink.read_committed(spark).count()
        run_distinct_index(feed.stream(schema), sink, ckpt, ["grp"],
                           "user_id")
        assert sink.read_committed(spark).count() == n_rows

        got = {
            r.grp: int(r.approx_distinct)
            for r in distinct_estimates(
                sink.read_committed(spark), ["grp"]
            ).collect()
        }
        full = spark.createDataFrame(
            pd.concat([b1, b2, b3]), schema=schema
        )
        single = {
            r.grp: int(r.est)
            for r in full.groupBy("grp").agg(
                F.hll_sketch_estimate(
                    F.hll_sketch_agg("user_id", F.lit(12))
                ).alias("est")
            ).collect()
        }
        # batch-cut insensitivity: union of {b1}, {b2}, {b3} sketches ==
        # union of a re-grouped index ({b1 ∪ b2} sketch + {b3} sketch)
        regrouped = spark.createDataFrame(
            pd.concat([b1, b2]), schema=schema
        ).groupBy("grp").agg(
            F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch")
        ).unionByName(
            spark.createDataFrame(b3, schema=schema).groupBy("grp").agg(
                F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch")
            )
        )
        got_regrouped = {
            r.grp: int(r.approx_distinct)
            for r in distinct_estimates(regrouped, ["grp"]).collect()
        }
        # determinism for a given index: re-query reproduces exactly
        again = {
            r.grp: int(r.approx_distinct)
            for r in distinct_estimates(
                sink.read_committed(spark), ["grp"]
            ).collect()
        }
        assert got == again
        # every cut within HLL error of truth; cuts agree sub-percent
        for grp, truth in (("a", 600), ("b", 50)):
            for est in (got[grp], got_regrouped[grp], single[grp]):
                assert abs(est - truth) / truth < 0.05
            assert abs(got[grp] - got_regrouped[grp]) / truth < 0.02
            assert abs(got[grp] - single[grp]) / truth < 0.02

    def test_since_batch_retention_pruning(self, spark, tmp_path):
        """VERDICT r04 #3: distinct_estimates(since_batch=k) unions only
        the kept batches (sliding retention) — values seen solely before
        the horizon are forgotten; requires a with_batch_id read and
        raises without one."""
        import pytest as _pytest

        from real_time_sliding_window_spark.streaming.sketches import (
            distinct_estimates,
            run_distinct_index,
        )

        schema = "grp string, user_id long"
        # disjoint 100-user blocks per batch -> exact expectations
        pushes = [
            pd.DataFrame({"grp": ["a"] * 100,
                          "user_id": list(range(k * 100, (k + 1) * 100))})
            for k in range(3)
        ]
        feed = FileFeed(spark, str(tmp_path / "ret_in"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "ret_idx"))
        ckpt = str(tmp_path / "ret_ckpt")
        for push in pushes:
            feed.push(spark.createDataFrame(push, schema=schema))
            run_distinct_index(
                feed.stream(schema), sink, ckpt, ["grp"], "user_id"
            )
        idx = sink.read_committed(spark, with_batch_id=True)
        full = distinct_estimates(idx, ["grp"]).collect()[0]
        kept = distinct_estimates(idx, ["grp"], since_batch=1).collect()[0]
        assert abs(int(full.approx_distinct) - 300) / 300 < 0.05
        assert abs(int(kept.approx_distinct) - 200) / 200 < 0.05
        with _pytest.raises(ValueError, match="with_batch_id"):
            distinct_estimates(
                sink.read_committed(spark), ["grp"], since_batch=1
            )


class TestAsOfStreamJoin:
    def test_matches_batch_asof_with_ties_and_horizon(self, spark, tmp_path):
        """Streaming as-of == batch as_of_join on the same rows: latest
        right <= left_ts within the horizon, equal-ts tie to the higher
        tiebreaker, no-match lefts emitted with nulls, append-mode final."""
        import json

        from real_time_sliding_window_spark.operators.joins import as_of_join
        from real_time_sliding_window_spark.streaming.asof import (
            as_of_stream_join,
        )

        l_schema = "user string, pid long, ts timestamp"
        r_schema = "user string, cid long, ts timestamp"
        lrows = pd.DataFrame({
            "user": ["u1", "u1", "u2"],
            "pid": [100, 101, 102],
            "ts": [T0 + 10 * SEC, T0 + 30 * SEC, T0 + 10 * SEC],
        })
        rrows = pd.DataFrame({
            "user": ["u1", "u1", "u1", "u1", "u2"],
            "cid": [1, 2, 3, 4, 5],
            "ts": [T0 + 3 * SEC, T0 + 7 * SEC, T0 + 7 * SEC,
                   T0 + 12 * SEC, T0 + 40 * SEC],
        })
        closer_l = pd.DataFrame(
            {"user": ["zz"], "pid": [999], "ts": [T0 + 120 * SEC]}
        )

        lfeed = FileFeed(spark, str(tmp_path / "asof_l"))
        rfeed = FileFeed(spark, str(tmp_path / "asof_r"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "asof_out"))
        ckpt = str(tmp_path / "asof_ckpt")

        def run():
            res = as_of_stream_join(
                lfeed.stream(l_schema), rfeed.stream(r_schema),
                keys=["user"], horizon=timedelta(seconds=20),
                watermark_delay=timedelta(seconds=2),
                left_payload=["pid"], right_payload=["cid"],
                right_tiebreaker="cid",
            )
            run_to_sink(res, sink, ckpt, query_name="asofstream")

        # rights first, then lefts, then the watermark closer
        rfeed.push(spark.createDataFrame(rrows, schema=r_schema))
        lfeed.push(spark.createDataFrame(lrows, schema=l_schema))
        run()
        lfeed.push(spark.createDataFrame(closer_l, schema=l_schema))
        run()

        from real_time_sliding_window_spark.streaming.asof import unpack_asof

        typed = unpack_asof(
            sink.read_committed(spark), "user string", "pid long", "cid long"
        ).toPandas()
        typed = typed[typed.user != "zz"]
        assert list(typed.columns) == ["user", "left_ts", "pid",
                                       "right_ts", "cid"]
        got = sink.read_committed(spark).toPandas()
        got = got[~got.key.str.contains("zz")]
        pid = got.left_json.map(lambda s: json.loads(s)["pid"])
        cid = got.right_json.map(
            lambda s: json.loads(s)["cid"] if isinstance(s, str) else None
        )
        stream_match = {
            int(p): (int(c) if pd.notna(c) else None)
            for p, c in zip(pid, cid)
        }

        batch = as_of_join(
            spark.createDataFrame(lrows, schema=l_schema),
            spark.createDataFrame(rrows, schema=r_schema),
            keys=["user"], left_ts="ts", right_ts="ts",
            horizon=timedelta(seconds=20), tiebreakers=["cid"],
        ).toPandas()
        batch_match = dict(zip(batch.l_pid, batch.r_cid))

        # pid 100 -> tie at ts=7 resolves to cid 3; pid 101 -> cid 4;
        # pid 102 (u2): no click at-or-before -> null row still emitted
        assert stream_match == {100: 3, 101: 4, 102: None}
        assert {p: c for p, c in stream_match.items() if c is not None} == \
            batch_match

    def test_nan_and_null_tiebreakers_match_batch(self, spark, tmp_path):
        """ADVICE r4: at equal right ts, a literal NaN tiebreaker must WIN
        (Spark desc ranks NaN above every number) while a NULL tiebreaker
        must LOSE (desc = nulls last) — in BOTH engines. The pandas float64
        path can't tell them apart, so pack() maps null/NaN JVM-side."""
        import json

        from real_time_sliding_window_spark.operators.joins import as_of_join
        from real_time_sliding_window_spark.streaming.asof import (
            as_of_stream_join,
        )

        l_schema = "user string, pid long, ts timestamp"
        r_schema = "user string, cid long, tb double, ts timestamp"
        lrows = pd.DataFrame({
            "user": ["a", "b"],
            "pid": [1, 2],
            "ts": [T0 + 10 * SEC, T0 + 10 * SEC],
        })
        # key a: ties at ts=7 with tb {5.0, NaN, null} -> NaN (cid 12) wins
        # key b: ties at ts=7 with tb {5.0, null}      -> 5.0 (cid 21) wins
        # (built from tuples, NOT pandas: a pandas float64 column folds
        # None into NaN before Spark ever sees the null)
        ts7 = T0 + 7 * SEC
        rrows = [
            ("a", 11, 5.0, ts7),
            ("a", 12, float("nan"), ts7),
            ("a", 13, None, ts7),
            ("b", 21, 5.0, ts7),
            ("b", 22, None, ts7),
        ]
        closer = pd.DataFrame(
            {"user": ["zz"], "pid": [9], "ts": [T0 + 120 * SEC]}
        )

        lfeed = FileFeed(spark, str(tmp_path / "nan_l"))
        rfeed = FileFeed(spark, str(tmp_path / "nan_r"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "nan_out"))
        ckpt = str(tmp_path / "nan_ckpt")

        def run():
            res = as_of_stream_join(
                lfeed.stream(l_schema), rfeed.stream(r_schema),
                keys=["user"], horizon=timedelta(seconds=20),
                watermark_delay=timedelta(seconds=2),
                left_payload=["pid"], right_payload=["cid"],
                right_tiebreaker="tb",
            )
            run_to_sink(res, sink, ckpt, query_name="nanasof")

        rfeed.push(spark.createDataFrame(rrows, schema=r_schema))
        lfeed.push(spark.createDataFrame(lrows, schema=l_schema))
        run()
        lfeed.push(spark.createDataFrame(closer, schema=l_schema))
        run()

        got = sink.read_committed(spark).toPandas()
        got = got[~got.key.str.contains("zz")]
        stream_match = {
            json.loads(l)["pid"]: (
                json.loads(r)["cid"] if isinstance(r, str) else None
            )
            for l, r in zip(got.left_json, got.right_json)
        }

        batch = as_of_join(
            spark.createDataFrame(lrows, schema=l_schema),
            spark.createDataFrame(rrows, schema=r_schema),
            keys=["user"], left_ts="ts", right_ts="ts",
            horizon=timedelta(seconds=20), tiebreakers=["tb"],
        ).toPandas()
        batch_match = dict(zip(batch.l_pid, batch.r_cid))

        assert stream_match == {1: 12, 2: 21}
        assert stream_match == {
            int(p): int(c) for p, c in batch_match.items()
        }

    def test_randomized_parity_with_batch(self, spark, tmp_path):
        """200 seeded random events over 10 keys with heavy ts ties, pushed
        in 3 ts-ordered batches: the streamed output must equal the batch
        as_of_join row set exactly, multi-digit tiebreakers included
        (numeric-descending tie rule)."""
        import json

        import numpy as np

        from real_time_sliding_window_spark.operators.joins import as_of_join
        from real_time_sliding_window_spark.streaming.asof import (
            as_of_stream_join,
        )

        rng = np.random.default_rng(42)
        n_l, n_r = 80, 120
        lrows = pd.DataFrame({
            "user": [f"u{rng.integers(0, 10)}" for _ in range(n_l)],
            "pid": range(n_l),
            "ts": [T0 + int(rng.integers(0, 60)) * SEC for _ in range(n_l)],
        })
        rrows = pd.DataFrame({
            "user": [f"u{rng.integers(0, 10)}" for _ in range(n_r)],
            "cid": [int(rng.integers(0, 1000)) for _ in range(n_r)],
            "ts": [T0 + int(rng.integers(0, 60)) * SEC for _ in range(n_r)],
        })
        closer = pd.DataFrame(
            {"user": ["zz"], "pid": [9999], "ts": [T0 + 600 * SEC]}
        )
        l_schema = "user string, pid long, ts timestamp"
        r_schema = "user string, cid long, ts timestamp"

        lfeed = FileFeed(spark, str(tmp_path / "rasof_l"))
        rfeed = FileFeed(spark, str(tmp_path / "rasof_r"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "rasof_out"))
        ckpt = str(tmp_path / "rasof_ckpt")

        def run():
            res = as_of_stream_join(
                lfeed.stream(l_schema), rfeed.stream(r_schema),
                keys=["user"], horizon=timedelta(seconds=15),
                watermark_delay=timedelta(seconds=0),
                left_payload=["pid"], right_payload=["cid"],
                right_tiebreaker="cid",
            )
            run_to_sink(res, sink, ckpt, query_name="rasof")

        # ts-ordered batches so the watermark only moves forward and no
        # input is watermark-dropped (parity needs identical effective rows)
        lrows_s = lrows.sort_values("ts").reset_index(drop=True)
        rrows_s = rrows.sort_values("ts").reset_index(drop=True)
        cuts = [(0, 20), (20, 40), (40, 61)]
        for lo, hi in cuts:
            lpart = lrows_s[(lrows_s.ts >= T0 + lo * SEC)
                            & (lrows_s.ts < T0 + hi * SEC)]
            rpart = rrows_s[(rrows_s.ts >= T0 + lo * SEC)
                            & (rrows_s.ts < T0 + hi * SEC)]
            lfeed.push(spark.createDataFrame(lpart, schema=l_schema))
            rfeed.push(spark.createDataFrame(rpart, schema=r_schema))
            run()
        lfeed.push(spark.createDataFrame(closer, schema=l_schema))
        run()

        got = sink.read_committed(spark).toPandas()
        got = got[got.key != "zz"]
        stream_rows = sorted(
            (json.loads(l)["pid"],
             json.loads(r)["cid"] if isinstance(r, str) else None)
            for l, r in zip(got.left_json, got.right_json)
        )

        batch = as_of_join(
            spark.createDataFrame(lrows, schema=l_schema),
            spark.createDataFrame(rrows, schema=r_schema),
            keys=["user"], left_ts="ts", right_ts="ts",
            horizon=timedelta(seconds=15), tiebreakers=["cid"],
        ).toPandas()
        matched = dict(zip(batch.l_pid, batch.r_cid))
        batch_rows = sorted(
            (pid, int(matched[pid]) if pid in matched else None)
            for pid in lrows.pid
        )
        assert stream_rows == batch_rows

    def test_right_only_keys_are_reaped(self, spark, tmp_path):
        """A key that only ever receives RIGHT rows must not hold state
        forever: the always-re-armed timer reaps its buffer once the
        watermark passes oldest_right + horizon (code-review r03)."""
        from real_time_sliding_window_spark.streaming.asof import (
            as_of_stream_join,
        )

        l_schema = "user string, pid long, ts timestamp"
        r_schema = "user string, cid long, ts timestamp"
        lfeed = FileFeed(spark, str(tmp_path / "reap_l"))
        rfeed = FileFeed(spark, str(tmp_path / "reap_r"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "reap_out"))
        ckpt = str(tmp_path / "reap_ckpt")

        def run():
            res = as_of_stream_join(
                lfeed.stream(l_schema), rfeed.stream(r_schema),
                keys=["user"], horizon=timedelta(seconds=10),
                watermark_delay=timedelta(seconds=0),
                left_payload=["pid"], right_payload=["cid"],
                right_tiebreaker="cid",
            )
            q = res.writeStream.foreachBatch(sink.foreach_batch()) \
                .outputMode("append").option("checkpointLocation", ckpt) \
                .trigger(availableNow=True).start()
            q.awaitTermination()
            return q

        # uA: rights only; uZ: one left that will emit
        rfeed.push(spark.createDataFrame(
            pd.DataFrame({"user": ["uA", "uA"], "cid": [1, 2],
                          "ts": [T0, T0 + 2 * SEC]}), schema=r_schema))
        lfeed.push(spark.createDataFrame(
            pd.DataFrame({"user": ["uZ"], "pid": [1], "ts": [T0 + 5 * SEC]}),
            schema=l_schema))
        run()
        # watermark far past uA's rights + horizon AND uZ's left
        lfeed.push(spark.createDataFrame(
            pd.DataFrame({"user": ["zz"], "pid": [9], "ts": [T0 + 300 * SEC]}),
            schema=l_schema))
        run()
        # one more empty-ish advance so timers fire with the new watermark
        lfeed.push(spark.createDataFrame(
            pd.DataFrame({"user": ["zz2"], "pid": [10],
                          "ts": [T0 + 600 * SEC]}), schema=l_schema))
        q = run()
        n_state = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        # only the final closer key may still be pending; uA (right-only)
        # and uZ (emitted) must be gone
        assert n_state <= 1, f"state not reaped: {n_state} keys remain"

    def test_null_tiebreaker_loses_ties_matching_batch(self, spark, tmp_path):
        """ADVICE r03: a NULL right_tiebreaker became NaN in the float64
        tiebreak array, and np.lexsort sorts NaN LAST — the null right
        used to WIN ties at equal ts. The batch rule is desc-nulls-last
        (null = weakest), so both rights at ts=7 must resolve to the
        numeric cid, not the null one."""
        import json

        from real_time_sliding_window_spark.operators.joins import as_of_join
        from real_time_sliding_window_spark.streaming.asof import (
            as_of_stream_join,
        )

        l_schema = "user string, pid long, ts timestamp"
        r_schema = "user string, cid long, tb double, ts timestamp"
        lrows = pd.DataFrame({
            "user": ["u1"], "pid": [100], "ts": [T0 + 10 * SEC],
        })
        # two rights at the SAME ts: tb NULL vs tb 5.0 — 5.0 must win
        rrows = pd.DataFrame({
            "user": ["u1", "u1"],
            "cid": [1, 2],
            "tb": [None, 5.0],
            "ts": [T0 + 7 * SEC, T0 + 7 * SEC],
        })
        closer = pd.DataFrame(
            {"user": ["zz"], "pid": [999], "ts": [T0 + 120 * SEC]}
        )

        lfeed = FileFeed(spark, str(tmp_path / "ntb_l"))
        rfeed = FileFeed(spark, str(tmp_path / "ntb_r"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "ntb_out"))
        ckpt = str(tmp_path / "ntb_ckpt")

        def run():
            res = as_of_stream_join(
                lfeed.stream(l_schema), rfeed.stream(r_schema),
                keys=["user"], horizon=timedelta(seconds=20),
                watermark_delay=timedelta(seconds=0),
                left_payload=["pid"], right_payload=["cid"],
                right_tiebreaker="tb",
            )
            run_to_sink(res, sink, ckpt, query_name="ntbasof")

        rfeed.push(spark.createDataFrame(rrows, schema=r_schema))
        lfeed.push(spark.createDataFrame(lrows, schema=l_schema))
        run()
        lfeed.push(spark.createDataFrame(closer, schema=l_schema))
        run()

        got = sink.read_committed(spark).toPandas()
        got = got[~got.key.str.contains("zz")]
        assert len(got) == 1
        assert json.loads(got.right_json.iloc[0])["cid"] == 2

        batch = as_of_join(
            spark.createDataFrame(lrows, schema=l_schema),
            spark.createDataFrame(rrows, schema=r_schema),
            keys=["user"], left_ts="ts", right_ts="ts",
            horizon=timedelta(seconds=20), tiebreakers=["tb"],
        ).toPandas()
        assert int(batch.r_cid.iloc[0]) == 2


class TestBm25OverIndex:
    def test_bm25_over_accumulated_index_equals_batch(self, spark, tmp_path):
        """BM25 needs doc-length and corpus stats on top of df — all
        derivable from the postings table alone, so scoring the
        ACCUMULATED incremental index must reproduce batch bm25_topk on
        the full corpus exactly."""
        from real_time_sliding_window_spark.operators.retrieval import (
            bm25_score_postings,
            bm25_topk,
            run_postings_index,
        )

        schema = "doc_id long, text string"
        b1 = pd.DataFrame({"doc_id": [0, 1],
                           "text": ["apple banana", "apple apple"]})
        b2 = pd.DataFrame({"doc_id": [2],
                           "text": ["cherry apple plum plum plum"]})

        feed = FileFeed(spark, str(tmp_path / "bmidx_in"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "bmidx_out"))
        ckpt = str(tmp_path / "bmidx_ckpt")
        for push in (b1, b2):
            feed.push(spark.createDataFrame(push, schema=schema))
            run_postings_index(feed.stream(schema), sink, ckpt)
        idx = sink.read_committed(spark)
        full = spark.createDataFrame(pd.concat([b1, b2]), schema=schema)

        q = [("q", "apple plum")]
        key = lambda p: sorted(map(tuple, p.itertuples(index=False)))
        from_idx = bm25_score_postings(idx, q, k=5).toPandas()
        from_batch = bm25_topk(full, q, k=5).toPandas()
        assert key(from_idx) == key(from_batch)


class TestGramIndex:
    """r5: incremental Gramian index — exact integer partials per batch
    through the exactly-once sink; totals are BIT-IDENTICAL to the batch
    Gramian (integers add), so incremental PCA == full refit."""

    def test_incremental_equals_batch_and_pca_refit(self, spark, tmp_path):
        import numpy as np

        from real_time_sliding_window_spark.operators import linalg
        from real_time_sliding_window_spark.streaming.moments import (
            gram_totals,
            run_gram_index,
        )

        rng = np.random.default_rng(11)
        x = rng.normal(size=(90, 8))
        schema = "vec_id long, embedding array<double>"
        mk = lambda lo, hi: spark.createDataFrame(
            [(i, [float(v) for v in x[i]]) for i in range(lo, hi)], schema
        )

        feed = FileFeed(spark, str(tmp_path / "gram_in"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "gram_idx"))
        ckpt = str(tmp_path / "gram_ckpt")
        for lo, hi in ((0, 30), (30, 75), (75, 90)):
            feed.push(mk(lo, hi))
            run_gram_index(
                feed.stream(schema), sink, ckpt, dim=8
            )
        # replayed empty trigger: exactly-once manifest keeps totals fixed
        run_gram_index(feed.stream(schema), sink, ckpt, dim=8)

        idx = sink.read_committed(spark)
        # 3 committed batches x 45 rows (36 triangle + 8 sums + 1 count)
        assert idx.count() == 3 * 45
        totals = {
            (r["i"], r["j"]): r["dot"] for r in gram_totals(idx).collect()
        }
        batch = {
            (r["i"], r["j"]): r["dot"]
            for r in linalg.gram_matrix(mk(0, 90), dim=8).collect()
        }
        assert totals == batch  # exact integer equality
        # incremental PCA == full refit, bit-for-bit (same constants in)
        ci, ei, mi = linalg.pca_from_gram_rows(
            gram_totals(idx).collect(), k=3, dim=8
        )
        cf, ef, mf = linalg.pca_fit(mk(0, 90), k=3, dim=8)
        assert np.array_equal(ci, cf) and np.array_equal(ei, ef)
        assert np.array_equal(mi, mf)


class TestCmIndex:
    """streaming/sketches.py::run_cm_index — the frequency twin of the
    distinct index: per-batch CM sketches are EXACTLY additive, so the
    accumulated index is bit-identical to a batch sketch (the lossless
    Gramian property, deliberately stronger than the HLL caveat)."""

    def test_incremental_equals_batch_exactly(self, spark, tmp_path):
        from real_time_sliding_window_spark.operators.cm_sketch import (
            cm_estimate,
            cm_sketch,
        )
        from real_time_sliding_window_spark.streaming.sketches import (
            cm_totals,
            run_cm_index,
        )

        schema = "item string"
        pushes = [
            pd.DataFrame({"item": ["a"] * 30 + ["b"] * 5 + ["c"] * 1}),
            pd.DataFrame({"item": ["a"] * 20 + ["d"] * 8}),
            pd.DataFrame({"item": ["b"] * 15 + ["a"] * 10}),
        ]
        feed = FileFeed(spark, str(tmp_path / "cm_in"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "cm_idx"))
        ckpt = str(tmp_path / "cm_ckpt")
        for push in pushes:
            feed.push(spark.createDataFrame(push, schema=schema))
            run_cm_index(
                feed.stream(schema), sink, ckpt, "item", depth=4, width=64
            )
        # exactly-once: re-trigger with no new data leaves the index alone
        n = sink.read_committed(spark).count()
        run_cm_index(
            feed.stream(schema), sink, ckpt, "item", depth=4, width=64
        )
        assert sink.read_committed(spark).count() == n

        totals = cm_totals(sink.read_committed(spark))
        whole = cm_sketch(
            spark.createDataFrame(pd.concat(pushes), schema=schema),
            "item",
            depth=4,
            width=64,
        )
        assert (
            totals.exceptAll(whole).count() == 0
            and whole.exceptAll(totals).count() == 0
        )
        est = {
            r.item: r.est_count
            for r in cm_estimate(
                totals,
                spark.createDataFrame(
                    pd.DataFrame({"item": list("abcd")}), schema=schema
                ),
                "item",
                depth=4,
                width=64,
            ).collect()
        }
        for k, t in {"a": 60, "b": 20, "c": 1, "d": 8}.items():
            assert est[k] >= t

    def test_since_batch_retention_exact_subtraction(self, spark, tmp_path):
        """CM retention is EXACT: dropping expired batches from the sum
        yields precisely the sketch of the kept batches (additive
        matrices subtract; HLL cannot). Also pins the with_batch_id
        requirement."""
        from real_time_sliding_window_spark.operators.cm_sketch import (
            cm_sketch,
        )
        from real_time_sliding_window_spark.streaming.sketches import (
            cm_totals,
            run_cm_index,
        )

        schema = "item string"
        pushes = [
            pd.DataFrame({"item": ["x"] * 10}),
            pd.DataFrame({"item": ["x"] * 3 + ["y"] * 4}),
        ]
        feed = FileFeed(spark, str(tmp_path / "cmr_in"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "cmr_idx"))
        ckpt = str(tmp_path / "cmr_ckpt")
        for push in pushes:
            feed.push(spark.createDataFrame(push, schema=schema))
            run_cm_index(
                feed.stream(schema), sink, ckpt, "item", depth=4, width=64
            )
        kept = cm_totals(
            sink.read_committed(spark, with_batch_id=True), since_batch=1
        )
        only_b2 = cm_sketch(
            spark.createDataFrame(pushes[1], schema=schema),
            "item",
            depth=4,
            width=64,
        )
        assert (
            kept.exceptAll(only_b2).count() == 0
            and only_b2.exceptAll(kept).count() == 0
        )
        with pytest.raises(ValueError, match="with_batch_id"):
            cm_totals(sink.read_committed(spark), since_batch=1)


class TestCepStream:
    """streaming/cep.py — transition pairs and the conversion funnel:
    watermark-final append emission gated against the batch twins."""

    def _push_contiguous(self, spark, feed, events: pd.DataFrame, n_batches):
        """Split a random event set into contiguous time ranges (shuffled
        WITHIN each batch — cross-batch order is what the watermark
        guarantees; intra-batch disorder is the operator's job)."""
        ev = events.sort_values("ts", kind="stable").reset_index(drop=True)
        cuts = np.array_split(np.arange(len(ev)), n_batches)
        rng = np.random.default_rng(7)
        out = []
        for idx in cuts:
            b = ev.iloc[idx].sample(frac=1.0, random_state=int(rng.integers(1e9)))
            out.append(b)
        schema = "key string, event_id long, event_type string, ts timestamp"
        for b in out:
            feed.push(spark.createDataFrame(b, schema=schema))
        return schema

    def _random_events(self, n=240, n_keys=6, seed=11):
        rng = np.random.default_rng(seed)
        return pd.DataFrame(
            {
                "key": [f"k{rng.integers(n_keys)}" for _ in range(n)],
                "event_id": range(n),
                "event_type": rng.choice(
                    ["click", "error", "view"], size=n
                ),
                # integer-second offsets WITH collisions (ties exercise
                # the (ts, seq) stable order)
                "ts": [T0 + int(s) * SEC for s in rng.integers(0, 120, n)],
            }
        )

    def test_transitions_match_batch_lead_randomized(self, spark, tmp_path):
        from real_time_sliding_window_spark.streaming.cep import (
            transitions_stream,
        )

        events = self._random_events()
        feed = FileFeed(spark, str(tmp_path / "tr_in"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "tr_out"))
        ckpt = str(tmp_path / "tr_ckpt")
        schema = self._push_contiguous(spark, feed, events, 3)

        def run():
            res = transitions_stream(
                feed.stream(schema), "key", "event_type",
                seq_col="event_id",
                watermark_delay=timedelta(seconds=1),
            )
            run_to_sink(res, sink, ckpt, query_name="cep-transitions")

        run()
        closer = pd.DataFrame(
            {"key": ["zz"], "event_id": [10**6], "event_type": ["view"],
             "ts": [T0 + 10_000 * SEC]}
        )
        feed.push(spark.createDataFrame(closer, schema=schema))
        run()

        got = sink.read_committed(spark).toPandas()
        got = got[got.key != "zz"]
        static = spark.createDataFrame(events, schema=schema)
        from pyspark.sql.window import Window

        w = Window.partitionBy("key").orderBy("ts", "event_id")
        exp = (
            static.select(
                "key",
                F.col("event_type").alias("from_type"),
                F.lead("event_type").over(w).alias("to_type"),
                F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias(
                    "from_us"
                ),
                F.lead(
                    F.unix_micros(F.col("ts").cast("timestamp_ltz"))
                ).over(w).alias("to_us"),
            )
            .filter(F.col("to_type").isNotNull())
            .toPandas()
        )
        key = ["key", "from_type", "to_type", "from_us", "to_us"]
        g = got[key].sort_values(key).reset_index(drop=True)
        e = exp[key].sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, e)

    def test_transitions_bridge_and_idle_reap(self, spark, tmp_path):
        """Cross-batch pairs ride the bridge; with max_idle the bridge is
        reaped, so a long-idle key starts a FRESH chain (no pair spanning
        the gap) — the documented divergence from batch lead()."""
        from real_time_sliding_window_spark.streaming.cep import (
            transitions_stream,
        )

        schema = "key string, event_id long, event_type string, ts timestamp"
        b1 = pd.DataFrame(
            {"key": ["a", "a"], "event_id": [0, 1],
             "event_type": ["click", "view"],
             "ts": [T0, T0 + 5 * SEC]}
        )
        b2 = pd.DataFrame(  # 500 s after b1 — far past max_idle=60s
            {"key": ["a", "zz"], "event_id": [2, 99],
             "event_type": ["error", "view"],
             "ts": [T0 + 500 * SEC, T0 + 505 * SEC]}
        )
        closer = pd.DataFrame(
            {"key": ["zz"], "event_id": [100], "event_type": ["view"],
             "ts": [T0 + 5000 * SEC]}
        )

        for max_idle, expect_gap_pair in (
            (None, True),
            (timedelta(seconds=60), False),
        ):
            tag = "noidle" if max_idle is None else "idle"
            feed = FileFeed(spark, str(tmp_path / f"br_in_{tag}"))
            sink = ExactlyOnceParquetSink(str(tmp_path / f"br_out_{tag}"))
            ckpt = str(tmp_path / f"br_ckpt_{tag}")

            def run():
                res = transitions_stream(
                    feed.stream(schema), "key", "event_type",
                    seq_col="event_id",
                    watermark_delay=timedelta(seconds=1),
                    max_idle=max_idle,
                )
                run_to_sink(res, sink, ckpt, query_name=f"cep-br-{tag}")

            for push in (b1, b2):
                feed.push(spark.createDataFrame(push, schema=schema))
                run()
            feed.push(spark.createDataFrame(closer, schema=schema))
            run()

            got = sink.read_committed(spark).toPandas()
            got = got[got.key == "a"]
            pairs = set(
                zip(got.from_type, got.to_type)
            )
            assert ("click", "view") in pairs  # within-batch pair always
            assert (("view", "error") in pairs) == expect_gap_pair

    def test_funnel_matches_batch_with_wide_window(self, spark, tmp_path):
        from real_time_sliding_window_spark.streaming.cep import (
            funnel_stream,
        )

        events = self._random_events(seed=23)
        feed = FileFeed(spark, str(tmp_path / "fn_in"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "fn_out"))
        ckpt = str(tmp_path / "fn_ckpt")
        schema = self._push_contiguous(spark, feed, events, 3)

        def run():
            res = funnel_stream(
                feed.stream(schema), "key", "event_type",
                first_type="click", then_type="error",
                window=timedelta(days=1),
                seq_col="event_id",
                watermark_delay=timedelta(seconds=1),
            )
            run_to_sink(res, sink, ckpt, query_name="cep-funnel")

        run()
        # closer far enough to shut every key's 1-day window
        closer = pd.DataFrame(
            {"key": ["zz"], "event_id": [10**6], "event_type": ["view"],
             "ts": [T0 + timedelta(days=3)]}
        )
        feed.push(spark.createDataFrame(closer, schema=schema))
        run()

        got = sink.read_committed(spark).toPandas()
        got = got[got.key != "zz"].set_index("key")

        # batch twin of the unbounded funnel (window >> span)
        static = events
        exp = {}
        us = static.ts.map(
            lambda t: int(pd.Timestamp(t).value // 1000)
        )
        static = static.assign(us=us)
        for k, grp in static.groupby("key"):
            clicks = grp[grp.event_type == "click"]
            if clicks.empty:
                continue
            fc = int(clicks.us.min())
            errs = grp[(grp.event_type == "error") & (grp.us > fc)]
            exp[k] = (fc, int(errs.us.min()) if len(errs) else None)
        assert set(got.index) == set(exp)
        for k, (fc, fe) in exp.items():
            assert got.loc[k, "first_us"] == fc
            if fe is None:
                assert pd.isna(got.loc[k, "then_us"])
            else:
                assert got.loc[k, "then_us"] == fe
                assert got.loc[k, "latency_us"] == fe - fc

    def test_funnel_window_and_once_semantics(self, spark, tmp_path):
        """Conversion outside the window -> null; at exactly
        first+window -> counts; at ts == first -> excluded (strict);
        each key emits exactly once and leaves state."""
        from real_time_sliding_window_spark.streaming.cep import (
            funnel_stream,
        )

        schema = "key string, event_id long, event_type string, ts timestamp"
        rows = pd.DataFrame(
            {
                "key": ["in_w", "in_w", "edge", "edge", "late", "late",
                        "same", "same"],
                "event_id": range(8),
                "event_type": ["click", "error"] * 4,
                "ts": [
                    T0, T0 + 5 * SEC,            # inside window
                    T0, T0 + 30 * SEC,           # exactly first+window
                    T0, T0 + 31 * SEC,           # one past the window
                    T0, T0,                      # error AT the click ts
                ],
            }
        )
        closer = pd.DataFrame(
            {"key": ["zz"], "event_id": [99], "event_type": ["view"],
             "ts": [T0 + 5000 * SEC]}
        )
        feed = FileFeed(spark, str(tmp_path / "fw_in"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "fw_out"))
        ckpt = str(tmp_path / "fw_ckpt")

        def run():
            res = funnel_stream(
                feed.stream(schema), "key", "event_type",
                first_type="click", then_type="error",
                window=timedelta(seconds=30),
                seq_col="event_id",
                watermark_delay=timedelta(seconds=1),
            )
            run_to_sink(res, sink, ckpt, query_name="cep-fwin")

        feed.push(spark.createDataFrame(rows, schema=schema))
        run()
        feed.push(spark.createDataFrame(closer, schema=schema))
        run()
        n_after_close = sink.read_committed(spark).count()
        # extra drain with a fresh closer: no re-emission (state removed)
        feed.push(spark.createDataFrame(
            closer.assign(event_id=[100], ts=[T0 + 6000 * SEC]),
            schema=schema))
        run()
        assert sink.read_committed(spark).count() == n_after_close

        got = sink.read_committed(spark).toPandas().set_index("key")
        t0us = int(pd.Timestamp(T0).value // 1000)
        assert got.loc["in_w", "then_us"] == t0us + 5_000_000
        assert got.loc["edge", "then_us"] == t0us + 30_000_000
        assert pd.isna(got.loc["late", "then_us"])
        assert pd.isna(got.loc["same", "then_us"])


class TestSequenceFunnelStream:
    """streaming/cep.py::sequence_funnel_stream — randomized parity vs
    the batch operator, early-emit on full match, one-shot per key."""

    def test_matches_batch_operator_randomized(self, spark, tmp_path):
        from real_time_sliding_window_spark.operators.funnel import (
            sequence_funnel,
        )
        from real_time_sliding_window_spark.streaming.cep import (
            sequence_funnel_stream,
        )

        rng = np.random.default_rng(41)
        n = 300
        events = pd.DataFrame(
            {
                "key": [f"k{rng.integers(10)}" for _ in range(n)],
                "event_id": range(n),
                "event_type": rng.choice(
                    ["click", "view", "purchase"], size=n,
                    p=[0.5, 0.35, 0.15],
                ),
                "ts": [T0 + int(s) * SEC for s in rng.integers(0, 100, n)],
            }
        )
        schema = "key string, event_id long, event_type string, ts timestamp"
        stages = ["click", "view", "purchase"]
        window = timedelta(seconds=40)

        feed = FileFeed(spark, str(tmp_path / "sq_in"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "sq_out"))
        ckpt = str(tmp_path / "sq_ckpt")
        ev = events.sort_values("ts", kind="stable").reset_index(drop=True)
        for idx in np.array_split(np.arange(n), 3):
            b = ev.iloc[idx].sample(frac=1.0, random_state=5)
            feed.push(spark.createDataFrame(b, schema=schema))

        def run():
            res = sequence_funnel_stream(
                feed.stream(schema), "key", "event_type", stages, window,
                seq_col="event_id",
                watermark_delay=timedelta(seconds=1),
            )
            run_to_sink(res, sink, ckpt, query_name="cep-seq")

        run()
        closer = pd.DataFrame(
            {"key": ["zz"], "event_id": [10**6], "event_type": ["view"],
             "ts": [T0 + 100_000 * SEC]}
        )
        feed.push(spark.createDataFrame(closer, schema=schema))
        run()

        got = sink.read_committed(spark).toPandas()
        got = got[got.key != "zz"]
        # stream emits ROUNDS; round 1 (earliest stage-1 ts per key) is
        # the batch operator's chain
        got["s1"] = got.stage_us.map(lambda a: a[0])
        first = got.sort_values("s1").groupby("key").first()

        static = spark.createDataFrame(events, schema=schema).select(
            "key",
            F.col("event_id").alias("seq"),
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("us"),
        )
        exp = sequence_funnel(
            static, "key", "event_type", stages,
            int(window.total_seconds() * 1_000_000),
        ).toPandas().set_index("key")

        assert set(first.index) == set(exp.index)
        for k in exp.index:
            chain = [
                int(exp.loc[k, f"stage_{i + 1}_us"])
                for i in range(3)
                if not pd.isna(exp.loc[k, f"stage_{i + 1}_us"])
            ]
            assert list(first.loc[k, "stage_us"]) == chain, k
            assert first.loc[k, "stages_reached"] == len(chain)
        # later rounds never start before the previous closes (equality
        # allowed: after a FULL match, a same-us later-seq stage-1 event
        # may open the next round — stage 1 has no strict-> constraint)
        for k, grp in got.groupby("key"):
            chains = sorted(grp.stage_us, key=lambda a: a[0])
            for a, b in zip(chains, chains[1:]):
                assert b[0] >= a[-1]

    def test_full_match_emits_early_and_once(self, spark, tmp_path):
        """A completed chain emits as soon as its events are final —
        BEFORE the stage-1 window closes — and never re-emits."""
        from real_time_sliding_window_spark.streaming.cep import (
            sequence_funnel_stream,
        )

        schema = "key string, event_id long, event_type string, ts timestamp"
        b1 = pd.DataFrame(
            {
                "key": ["a", "a", "a", "mover"],
                "event_id": [0, 1, 2, 3],
                "event_type": ["click", "view", "purchase", "view"],
                "ts": [T0, T0 + 2 * SEC, T0 + 4 * SEC, T0 + 30 * SEC],
            }
        )
        feed = FileFeed(spark, str(tmp_path / "se_in"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "se_out"))
        ckpt = str(tmp_path / "se_ckpt")

        def run():
            res = sequence_funnel_stream(
                feed.stream(schema), "key", "event_type",
                ["click", "view", "purchase"],
                window=timedelta(days=365),  # window NEVER closes in-test
                seq_col="event_id",
                watermark_delay=timedelta(seconds=1),
            )
            run_to_sink(res, sink, ckpt, query_name="cep-early")

        feed.push(spark.createDataFrame(b1, schema=schema))
        run()
        # the mover row put the watermark past a's chain: full match out
        got = sink.read_committed(spark).toPandas()
        got = got[got.key == "a"]
        assert len(got) == 1 and got.iloc[0].stages_reached == 3

        # more a-events later: no second emission (state was removed)
        b2 = pd.DataFrame(
            {"key": ["a", "zz"], "event_id": [10, 11],
             "event_type": ["click", "view"],
             "ts": [T0 + 60 * SEC, T0 + 120 * SEC]}
        )
        feed.push(spark.createDataFrame(b2, schema=schema))
        run()
        closer = pd.DataFrame(
            {"key": ["zz"], "event_id": [12], "event_type": ["view"],
             "ts": [T0 + timedelta(days=400)]}
        )
        feed.push(spark.createDataFrame(closer, schema=schema))
        run()
        got = sink.read_committed(spark).toPandas()
        a_rows = got[got.key == "a"]
        # the original chain emitted once; the post-removal click@60s
        # starts a FRESH one-shot funnel that later emits stage-1-only
        assert len(a_rows) == 2
        assert sorted(a_rows.stages_reached) == [1, 3]


class TestIvfAnnIndex:
    """streaming/ann_index.py — incremental IVF index: accumulated index
    row-identical to a batch build, queries equal the batch ANN answer
    exactly, exactly-once replay."""

    def test_incremental_equals_batch_ann(self, spark, tmp_path):
        from real_time_sliding_window_spark.operators.similarity import (
            ivf_kmeans_topk,
            kmeans_centroids,
        )
        from real_time_sliding_window_spark.streaming.ann_index import (
            ivf_index_topk,
            run_ivf_index,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).cache()
        cents = kmeans_centroids(emb, n_centroids=8, n_iter=3)
        n = emb.count()

        # 3 disjoint batches by vec_id stripe (append-only unique ids)
        feed = FileFeed(spark, str(tmp_path / "ivf_in"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "ivf_idx"))
        ckpt = str(tmp_path / "ivf_ckpt")
        schema = "vec_id long, embedding array<float>, label int"
        for i in range(3):
            feed.push(emb.filter(F.col("vec_id") % 3 == i))
            run_ivf_index(
                feed.stream(schema), sink, ckpt, cents, spill=2
            )
        n_rows = sink.read_committed(spark).count()
        run_ivf_index(feed.stream(schema), sink, ckpt, cents, spill=2)
        assert sink.read_committed(spark).count() == n_rows  # exactly-once
        assert n_rows >= n  # spill=2 assigns most vectors twice

        query_ids = [0, 7, 23, 55]
        queries = emb.filter(F.col("vec_id").isin(query_ids))
        got = ivf_index_topk(
            sink.read_committed(spark), queries, cents,
            k=3, n_probe=2, spill=2,
        ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
        exp = ivf_kmeans_topk(
            emb, query_ids, k=3, n_probe=2, centroids=cents, spill=2
        ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["query_id", "neighbor_id", "rank"]],
            exp[["query_id", "neighbor_id", "rank"]],
        )

    def test_spill_validation(self, spark, tmp_path):
        from real_time_sliding_window_spark.streaming.ann_index import (
            run_ivf_index,
        )

        with pytest.raises(ValueError):
            run_ivf_index(None, None, "x", [[0]], spill=0)


class TestFunnelTombstone:
    """Review fix: a key that emitted its funnel row must NEVER emit
    again — even when new first_type events arrive afterwards — so the
    output cannot depend on how events were batched into triggers."""

    def test_no_restart_after_emission(self, spark, tmp_path):
        from real_time_sliding_window_spark.streaming.cep import (
            funnel_stream,
        )

        schema = "key string, event_id long, event_type string, ts timestamp"
        b1 = pd.DataFrame(
            {"key": ["a", "zz"], "event_id": [0, 1],
             "event_type": ["click", "view"],
             "ts": [T0, T0 + 60 * SEC]}
        )
        # a second click for 'a' long after its window closed
        b2 = pd.DataFrame(
            {"key": ["a", "zz"], "event_id": [2, 3],
             "event_type": ["click", "view"],
             "ts": [T0 + 300 * SEC, T0 + 600 * SEC]}
        )
        feed = FileFeed(spark, str(tmp_path / "tomb_in"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "tomb_out"))
        ckpt = str(tmp_path / "tomb_ckpt")

        def run():
            res = funnel_stream(
                feed.stream(schema), "key", "event_type",
                first_type="click", then_type="error",
                window=timedelta(seconds=30),
                seq_col="event_id",
                watermark_delay=timedelta(seconds=1),
            )
            run_to_sink(res, sink, ckpt, query_name="cep-tomb")

        feed.push(spark.createDataFrame(b1, schema=schema))
        run()  # watermark 59s: a's window (30s) closed -> row emitted
        got = sink.read_committed(spark).toPandas()
        assert len(got[got.key == "a"]) == 1
        feed.push(spark.createDataFrame(b2, schema=schema))
        run()  # the new click must hit the tombstone, not restart
        got = sink.read_committed(spark).toPandas()
        assert len(got[got.key == "a"]) == 1


class TestSlicedSlidingStream:
    """pipeline.sliced_sliding_stream — chained stateful aggs: drained
    output equals the batch native sliding operator row-for-row."""

    def test_equals_batch_native(self, spark, tmp_path):
        from real_time_sliding_window_spark.operators.windows import (
            windowed_agg,
        )
        from real_time_sliding_window_spark.streaming.pipeline import (
            sliced_sliding_stream,
        )

        rng = np.random.default_rng(83)
        n = 2000
        events = pd.DataFrame(
            {
                "user_id": rng.integers(0, 20, n),
                "v": rng.integers(0, 100, n),
                "ts": [T0 + int(s) * SEC for s in rng.integers(0, 7200, n)],
            }
        )
        schema = "user_id long, v long, ts timestamp"
        feed = FileFeed(spark, str(tmp_path / "sls_in"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "sls_out"))
        ckpt = str(tmp_path / "sls_ckpt")
        ev = events.sort_values("ts", kind="stable").reset_index(drop=True)
        for idx in np.array_split(np.arange(n), 3):
            feed.push(spark.createDataFrame(ev.iloc[idx], schema=schema))
        closer = pd.DataFrame(
            {"user_id": [99], "v": [0],
             "ts": [T0 + timedelta(days=2)]}
        )
        feed.push(spark.createDataFrame(closer, schema=schema))

        def run():
            res = sliced_sliding_stream(
                feed.stream(schema), "ts",
                timedelta(minutes=60), timedelta(minutes=15),
                sum_exprs={"sum_v": F.col("v")},
                watermark_delay="1 second",
            )
            run_to_sink(res, sink, ckpt, query_name="sls")

        run()
        got = sink.read_committed(spark).toPandas()
        batch = windowed_agg(
            spark.createDataFrame(events, schema=schema),
            "ts", timedelta(minutes=60), slide=timedelta(minutes=15),
            extra_aggs=[F.sum("v").alias("sum_v")],
        ).toPandas()
        # drop the closer's windows from the batch side? the closer row
        # is NOT in the batch input, and its own windows never finalize
        # in the stream (watermark stops at its ts) — both sides cover
        # exactly the 2000 real events
        cols = ["window_start", "n_rows", "first_ts", "last_ts", "sum_v"]
        g = got[cols].sort_values("window_start").reset_index(drop=True)
        b = batch[cols].sort_values("window_start").reset_index(drop=True)
        pd.testing.assert_frame_equal(g, b)

    def test_validation(self, spark, tmp_path):
        from real_time_sliding_window_spark.streaming.pipeline import (
            sliced_sliding_stream,
        )

        feed = FileFeed(spark, str(tmp_path / "slsv_in"))
        schema = "user_id long, v long, ts timestamp"
        with pytest.raises(ValueError, match="integer multiple"):
            sliced_sliding_stream(
                feed.stream(schema), "ts",
                timedelta(minutes=45), timedelta(minutes=10),
            )


class TestRunsStream:
    """streaming/cep.py::runs_stream — closed runs equal the batch
    islands computation minus each key's open tail run."""

    def test_matches_batch_islands_randomized(self, spark, tmp_path):
        from real_time_sliding_window_spark.streaming.cep import runs_stream

        rng = np.random.default_rng(97)
        n = 300
        events = pd.DataFrame(
            {
                "key": [f"k{rng.integers(8)}" for _ in range(n)],
                "event_id": range(n),
                "event_type": rng.choice(["a", "b"], size=n, p=[0.7, 0.3]),
                "ts": [T0 + int(s) * SEC for s in rng.integers(0, 120, n)],
            }
        )
        schema = "key string, event_id long, event_type string, ts timestamp"
        feed = FileFeed(spark, str(tmp_path / "rs_in"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "rs_out"))
        ckpt = str(tmp_path / "rs_ckpt")
        ev = events.sort_values("ts", kind="stable").reset_index(drop=True)
        for idx in np.array_split(np.arange(n), 3):
            feed.push(spark.createDataFrame(
                ev.iloc[idx].sample(frac=1.0, random_state=3), schema=schema
            ))
        feed.push(spark.createDataFrame(
            pd.DataFrame({"key": ["zz"], "event_id": [10**6],
                          "event_type": ["a"],
                          "ts": [T0 + 10_000 * SEC]}),
            schema=schema,
        ))

        def run():
            res = runs_stream(
                feed.stream(schema), "key", "event_type",
                seq_col="event_id",
                watermark_delay=timedelta(seconds=1),
            )
            run_to_sink(res, sink, ckpt, query_name="runs")

        run()
        got = sink.read_committed(spark).toPandas()
        got = got[got.key != "zz"]

        # batch islands reference (pandas): maximal runs per key in
        # (ts, event_id) order; the stream emits all but the tail run
        exp_closed = []
        us = events.ts.map(lambda t: int(pd.Timestamp(t).value // 1000))
        static = events.assign(us=us).sort_values(
            ["key", "us", "event_id"], kind="stable"
        )
        for k, g in static.groupby("key"):
            runs = []
            cur = None
            for _, row in g.iterrows():
                if cur is not None and row.event_type == cur[0]:
                    cur[1] += 1
                    cur[3] = row.us
                else:
                    if cur is not None:
                        runs.append(cur)
                    cur = [row.event_type, 1, row.us, row.us]
            runs.append(cur)
            for r in runs[:-1]:  # tail run stays open in the stream
                exp_closed.append((k, r[0], r[1], r[2], r[3]))
        key = ["key", "run_type", "run_len", "start_us", "end_us"]
        g = got[key].sort_values(key).reset_index(drop=True)
        e = pd.DataFrame(exp_closed, columns=key).sort_values(
            key
        ).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, e)

    def test_max_idle_splits_and_closes(self, spark, tmp_path):
        from real_time_sliding_window_spark.streaming.cep import runs_stream

        schema = "key string, event_id long, event_type string, ts timestamp"
        rows = pd.DataFrame(
            {
                "key": ["a"] * 3 + ["zz"],
                "event_id": range(4),
                "event_type": ["x", "x", "x", "x"],
                # gap of 200 s inside an all-x run -> split at the gap
                "ts": [T0, T0 + 5 * SEC, T0 + 205 * SEC,
                       T0 + 1000 * SEC],
            }
        )
        feed = FileFeed(spark, str(tmp_path / "ri_in"))
        sink = ExactlyOnceParquetSink(str(tmp_path / "ri_out"))
        ckpt = str(tmp_path / "ri_ckpt")

        def run():
            res = runs_stream(
                feed.stream(schema), "key", "event_type",
                seq_col="event_id",
                watermark_delay=timedelta(seconds=1),
                max_idle=timedelta(seconds=60),
            )
            run_to_sink(res, sink, ckpt, query_name="runs-idle")

        feed.push(spark.createDataFrame(rows, schema=schema))
        run()
        got = sink.read_committed(spark).toPandas()
        a = got[got.key == "a"].sort_values("start_us")
        # the 200 s gap split the run; the idle rule also closed the
        # second run (wm 999 s >> 205+60)
        assert list(a.run_len) == [2, 1]
        assert list(a.end_us)[0] < list(a.start_us)[1]
