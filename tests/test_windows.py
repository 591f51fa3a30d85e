"""Batch window operator tests — F1 golden scenario + boundary parity.

Golden scenario: reference OnDemandBucketedWindowTest.kt:199-334 ("invoked
for a subset of the window"): query start=now-4s length=3s bucket=1s over
the F1 rows => exactly 3 buckets containing texts "2","3","4", 2 rows per
role per bucket, every ts within the bucket bounds.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F

from real_time_sliding_window_spark import synth
from real_time_sliding_window_spark.config import ViewArgs
from real_time_sliding_window_spark.operators import windows as W

NOW = synth.T0 + timedelta(seconds=6)
WIN = timedelta(seconds=5)


@pytest.fixture(scope="module")
def f1_df(spark):
    return synth.to_spark(spark, synth.f1_window_content_rows(NOW)).cache()


def _view(df, **kw):
    args = ViewArgs(now=NOW, window_length=WIN, **kw)
    return (
        W.on_demand_view(
            df,
            args,
            ts_col="ts",
            content_payload=["role", "text", "turn_idx"],
            order_cols=["turn_idx"],
        )
        .orderBy("bucket_start")
        .collect()
    )


def test_golden_three_buckets(f1_df):
    rows = _view(
        f1_df,
        start=NOW - timedelta(seconds=4),
        length=timedelta(seconds=3),
        bucket_length=timedelta(seconds=1),
    )
    assert len(rows) == 3
    for i, (row, expected_text) in enumerate(zip(rows, ["2", "3", "4"])):
        start = NOW - timedelta(seconds=4 - i)
        assert row["bucket_start"] == start
        assert row["bucket_end"] == start + timedelta(seconds=1)
        assert row["n_rows"] == 4  # 2 per role per bucket
        texts = [e["text"] for e in row["content"]]
        roles = [e["role"] for e in row["content"]]
        assert texts == [expected_text] * 4
        assert roles.count("user") == 2 and roles.count("tool") == 2
        # every ts within the bucket (half-open == reference inclusive at µs)
        for e in row["content"]:
            assert start <= e["__ts"] < start + timedelta(seconds=1)
        # stable (ts, turn_idx) ordering
        order_keys = [(e["__ts"], e["__o_turn_idx"]) for e in row["content"]]
        assert order_keys == sorted(order_keys)


def test_defaults_single_bucket_whole_window(f1_df):
    rows = _view(f1_df)
    assert len(rows) == 1
    assert rows[0]["bucket_start"] == NOW - WIN
    assert rows[0]["bucket_end"] == NOW
    assert rows[0]["n_rows"] == 20
    texts = sorted({e["text"] for e in rows[0]["content"]})
    assert texts == ["1", "2", "3", "4", "5"]


def test_start_only_single_bucket(f1_df):
    rows = _view(f1_df, start=NOW - timedelta(seconds=3))
    assert len(rows) == 1
    assert rows[0]["bucket_start"] == NOW - timedelta(seconds=3)
    assert rows[0]["bucket_end"] == NOW
    texts = sorted({e["text"] for e in rows[0]["content"]})
    assert texts == ["3", "4", "5"]


def test_empty_window_returns_empty_buckets(spark):
    # reference OnDemandBucketedWindowTest.kt:431-477
    empty = synth.to_spark(spark, synth.f1_window_content_rows(NOW).iloc[0:0])
    args = ViewArgs(
        now=NOW,
        window_length=WIN,
        start=NOW - timedelta(seconds=4),
        length=timedelta(seconds=3),
        bucket_length=timedelta(seconds=1),
    )
    rows = (
        W.on_demand_view(empty, args, ts_col="ts")
        .orderBy("bucket_start")
        .collect()
    )
    assert len(rows) == 3
    for i, row in enumerate(rows):
        assert row["bucket_start"] == NOW - timedelta(seconds=4 - i)
        assert row["n_rows"] == 0
        assert row["first_ts"] is None


def test_boundary_parity(spark):
    """A row exactly at a bucket end belongs to the NEXT bucket in both the
    reference model (next bucket starts at end+1ns, and a row at `end` which
    is start+len lands there) and Spark's half-open window."""
    import pandas as pd

    t0 = synth.T0
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"] * 3,
            "turn_idx": pd.array([0, 1, 2], dtype="int32"),
            "role": ["user"] * 3,
            "text": ["at-start", "just-inside", "at-end"],
            "tool": [None] * 3,
            "ts": [
                t0,
                t0 + timedelta(seconds=1) - timedelta(microseconds=1),
                t0 + timedelta(seconds=1),
            ],
        }
    )
    df = synth.to_spark(spark, pdf)
    out = (
        W.windowed_agg(df, "ts", timedelta(seconds=1), content_payload=["text"])
        .orderBy("window_start")
        .collect()
    )
    assert len(out) == 2
    assert [e["text"] for e in out[0]["content"]] == ["at-start", "just-inside"]
    assert [e["text"] for e in out[1]["content"]] == ["at-end"]


def test_sliding_window_counts(spark):
    df = synth.to_spark(spark, synth.f1_window_content_rows(NOW))
    out = W.windowed_agg(
        df, "ts", timedelta(seconds=2), slide=timedelta(seconds=1)
    ).orderBy("window_start")
    rows = out.collect()
    # each row belongs to exactly length/slide = 2 sliding windows
    assert sum(r["n_rows"] for r in rows) == 2 * 20


def test_session_window(spark):
    import pandas as pd

    t0 = synth.T0
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"] * 4,
            "turn_idx": pd.array([0, 1, 2, 3], dtype="int32"),
            "role": ["user"] * 4,
            "text": ["a", "b", "c", "d"],
            "tool": [None] * 4,
            "ts": [
                t0,
                t0 + timedelta(seconds=1),
                # gap > 5s => new session
                t0 + timedelta(seconds=10),
                t0 + timedelta(seconds=11),
            ],
        }
    )
    df = synth.to_spark(spark, pdf)
    rows = (
        W.session_agg(df, "ts", timedelta(seconds=5), keys=["conv_id"])
        .orderBy("session_start")
        .collect()
    )
    assert len(rows) == 2
    assert rows[0]["session_start"] == t0
    assert rows[0]["session_end"] == t0 + timedelta(seconds=6)  # last + gap
    assert rows[0]["n_rows"] == 2
    assert rows[1]["session_start"] == t0 + timedelta(seconds=10)
    assert rows[1]["n_rows"] == 2


def test_top_k_per_key(spark):
    from pyspark.sql import functions as F

    df = synth.to_spark(spark, synth.f1_window_content_rows(NOW))
    top = W.top_k_per_key(
        df,
        keys=["conv_id", "role"],
        order_by=[F.col("ts").desc(), F.col("turn_idx").desc()],
        k=2,
    )
    pdf = top.toPandas()
    # k rows per (conv_id, role) group, ranks 1..k
    for _, g in pdf.groupby(["conv_id", "role"]):
        assert sorted(g["rank"]) == [1, 2]
        # the kept rows are the latest by (ts, turn_idx)
        full = df.toPandas()
        sel = full[(full.conv_id == g.iloc[0].conv_id) & (full.role == g.iloc[0].role)]
        expect = sel.sort_values(["ts", "turn_idx"], ascending=False).head(2)
        assert set(g["turn_idx"]) == set(expect["turn_idx"])


def test_ordered_turns_rank(spark):
    df = synth.to_spark(spark, synth.f1_window_content_rows(NOW))
    ranked = W.ordered_turns(df, keys=["conv_id"]).collect()
    by_rank = sorted(ranked, key=lambda r: r["turn_rank"])
    keys = [(r["ts"], r["turn_idx"]) for r in by_rank]
    assert keys == sorted(keys)


def test_as_of_join_latest_tiebreak_and_horizon(spark):
    import pandas as pd
    from datetime import timedelta as td

    from real_time_sliding_window_spark.operators.joins import as_of_join

    T = NOW
    left = spark.createDataFrame(pd.DataFrame({
        "user": ["u1", "u1", "u2"],
        "pid": [100, 101, 102],
        "ts": [T + td(seconds=10), T + td(seconds=30), T + td(seconds=10)],
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "user": ["u1", "u1", "u1", "u1", "u2"],
        "cid": [1, 2, 3, 4, 5],
        # for u1: clicks at 3s, 7s, 7s (tie), 12s; u2: click at 40s (after)
        "ts": [T + td(seconds=3), T + td(seconds=7), T + td(seconds=7),
               T + td(seconds=12), T + td(seconds=40)],
    }))
    out = as_of_join(
        left, right, keys=["user"], left_ts="ts", right_ts="ts",
        horizon=td(seconds=20), tiebreakers=["cid"],
    ).toPandas().set_index("l_pid")
    # pid 100 (t=10): latest click <=10 is the 7s tie -> higher cid (3) wins
    assert out.loc[100, "r_cid"] == 3
    # pid 101 (t=30): latest click is 12s, within the 20s horizon -> cid 4
    assert out.loc[101, "r_cid"] == 4
    # pid 102 (u2, t=10): only click is at 40s (future) -> no match
    assert 102 not in out.index
    # tighter horizon drops pid 101 (12s click is 18s before the purchase)
    tight = as_of_join(
        left, right, keys=["user"], left_ts="ts", right_ts="ts",
        horizon=td(seconds=15), tiebreakers=["cid"],
    ).toPandas()
    assert set(tight["l_pid"]) == {100}


def test_as_of_join_duplicate_left_rows_and_empty_prefix(spark):
    """Each left ROW gets its own match: two byte-identical left rows must
    yield two output rows (the rank window partitions on row identity, not
    on left column values), and a degenerate left_prefix='' must not sweep
    right-side columns into the partitioning (ADVICE r01)."""
    import pandas as pd
    from datetime import timedelta as td

    from real_time_sliding_window_spark.operators.joins import as_of_join

    T = NOW
    left = spark.createDataFrame(pd.DataFrame({
        "user": ["u1", "u1"],          # identical duplicate rows
        "ts": [T + td(seconds=10)] * 2,
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "user": ["u1", "u1"],
        "cid": [1, 2],
        "ts": [T + td(seconds=3), T + td(seconds=7)],
    }))
    out = as_of_join(
        left, right, keys=["user"], left_ts="ts", right_ts="ts",
        horizon=td(seconds=20), tiebreakers=["cid"],
    ).toPandas()
    assert len(out) == 2                      # one match PER left row
    assert list(out["r_cid"]) == [2, 2]       # both latest (7s, cid 2)

    out2 = as_of_join(
        left, right, keys=["user"], left_ts="ts", right_ts="ts",
        horizon=td(seconds=20), tiebreakers=["cid"], left_prefix="",
    ).toPandas()
    assert len(out2) == 2
    assert list(out2["r_cid"]) == [2, 2]


def test_cascading_rollup_matches_direct(spark):
    from real_time_sliding_window_spark import synth as S

    df = S.to_spark(spark, S.transcripts_pandas(200, mean_turns=12))
    levels = W.cascading_rollup(
        df, "ts",
        [timedelta(minutes=5), timedelta(minutes=15), timedelta(hours=1)],
        keys=["role"],
    )
    direct = W.windowed_agg(df, "ts", timedelta(hours=1), keys=["role"])
    a = levels[-1].toPandas().sort_values(["window_start", "role"]).reset_index(drop=True)
    b = direct.toPandas().sort_values(["window_start", "role"]).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(a[b.columns], b)


def test_session_agg_dynamic_gap(spark):
    """Per-row gap: a click keeps the session alive 30 min, a view 5 min;
    an event merges while its ts <= running max(prior ts + prior gap), and
    session_end = max(ts + own gap) (verified against the DuckDB oracle in
    the session_events_dynamic driver query)."""
    import pandas as pd
    from pyspark.sql import functions as F

    T = NOW
    df = spark.createDataFrame(pd.DataFrame({
        "u": ["a"] * 4,
        "t": ["click", "view", "click", "view"],
        "ts": [T, T + timedelta(minutes=5), T + timedelta(minutes=14),
               T + timedelta(minutes=50)],
    }))
    gap = F.when(F.col("t") == "click", F.lit("30 minutes")).otherwise(
        F.lit("5 minutes")
    )
    out = (
        W.session_agg(df, "ts", gap, keys=["u"])
        .toPandas()
        .sort_values("session_start")
    )
    # view@5m (own reach 10m) still merges via click@0's 30m reach; the
    # view@50m is beyond click@14m's reach (44m) -> second session
    assert list(out["n_rows"]) == [3, 1]
    assert out.iloc[0]["session_end"] == T + timedelta(minutes=44)
    assert out.iloc[1]["session_end"] == T + timedelta(minutes=55)


def test_as_of_join_union_equals_interval_plan(spark):
    """The union/last-value-carry as-of strategy is result-identical to
    the interval-join + rank plan — bounded and unbounded horizons,
    duplicate left rows, equal-ts ties included."""
    import pandas as pd
    from datetime import timedelta as td

    from real_time_sliding_window_spark.operators.joins import (
        as_of_join,
        as_of_join_union,
    )

    T = NOW
    left = spark.createDataFrame(pd.DataFrame({
        "user": ["u1", "u1", "u1", "u2", "u2"],
        "pid": [100, 101, 101, 102, 103],     # 101 duplicated on purpose
        "ts": [T + td(seconds=s) for s in (10, 30, 30, 10, 7)],
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "user": ["u1", "u1", "u1", "u1", "u2"],
        "cid": [1, 2, 3, 4, 5],
        "ts": [T + td(seconds=s) for s in (3, 7, 7, 12, 7)],  # tie at 7s
    }))
    key = lambda p: sorted(map(tuple, p[sorted(p.columns)].itertuples(index=False)))
    for horizon in (td(seconds=20), None):
        a = as_of_join(left, right, keys=["user"], left_ts="ts", right_ts="ts",
                       horizon=horizon, tiebreakers=["cid"]).toPandas()
        b = as_of_join_union(left, right, keys=["user"], left_ts="ts",
                             right_ts="ts", horizon=horizon,
                             tiebreakers=["cid"]).toPandas()
        assert sorted(a.columns) == sorted(b.columns)
        assert key(a) == key(b)
    # the u2 lid=103 row at ts=7 matches the right row at exactly ts=7
    # (inclusive as-of) under both plans
    ub = as_of_join_union(left, right, keys=["user"], left_ts="ts",
                          right_ts="ts", tiebreakers=["cid"]).toPandas()
    assert ub.set_index("l_pid").loc[103, "r_cid"] == 5


def test_as_of_join_map_column_left(spark):
    """A MapType column on the left is legal input: the identity hash
    routes it through to_json (xxhash64 rejects maps), and rows differing
    only in the map still join independently (code-review r03)."""
    import pandas as pd
    from datetime import timedelta as td

    from pyspark.sql import functions as F

    from real_time_sliding_window_spark.operators.joins import as_of_join

    T = NOW
    left = spark.createDataFrame(pd.DataFrame({
        "user": ["u1", "u1"],
        "pid": [1, 1],
        "ts": [T + td(seconds=10)] * 2,
    })).withColumn(
        "meta",
        F.when(F.col("pid") >= 0, F.create_map(F.lit("k"), F.lit("v"))),
    )
    right = spark.createDataFrame(pd.DataFrame({
        "user": ["u1"], "cid": [7], "ts": [T + td(seconds=3)],
    }))
    out = as_of_join(
        left, right, keys=["user"], left_ts="ts", right_ts="ts",
        horizon=td(seconds=20), tiebreakers=["cid"],
    ).toPandas()
    assert len(out) == 2 and list(out.r_cid) == [7, 7]


def test_ensure_parallelism_join_derived_frame(spark):
    """Join-derived plans carry wildly inflated size stats (no CBO); the
    estimate alone would skip the repartition and leave the hot interpreted
    stage single-partition — the fallback exact check must catch it
    (code-review r03)."""
    from real_time_sliding_window_spark.util import ensure_parallelism

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import pyspark.sql.functions as F

    joined = df.join(
        df.select("doc_id", F.col("n_chars").alias("nc2")), "doc_id"
    )
    # tiny corpus: AQE coalesces the join output to very few partitions
    out = ensure_parallelism(joined)
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism


class TestSlicedSliding:
    """sliced_sliding_agg == windowed_agg (native window explode) at
    several overlap ratios, plus the multiple-alignment contract."""

    @pytest.mark.parametrize(
        "length,slide",
        [
            (timedelta(hours=1), timedelta(minutes=15)),
            (timedelta(minutes=50), timedelta(minutes=10)),
            (timedelta(minutes=10), timedelta(minutes=10)),  # ratio 1
        ],
    )
    def test_equals_native_operator(self, spark, length, slide):
        ev = spark.read.parquet(
            "/root/testdata/sf0.001/events.parquet"
        )
        cents = F.round(F.col("value") * 100).cast("long")
        native = W.windowed_agg(
            ev, "ts", length, slide=slide,
            extra_aggs=[F.sum(cents).alias("sum_value_cents")],
        )
        sliced = W.sliced_sliding_agg(
            ev, "ts", length, slide,
            sum_exprs={"sum_value_cents": cents},
        )
        cols = sorted(native.columns)
        assert sorted(sliced.columns) == cols
        n = native.select(*cols)
        s = sliced.select(*cols)
        assert n.exceptAll(s).count() == 0 and s.exceptAll(n).count() == 0

    def test_keys_and_validation(self, spark):
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        native = W.windowed_agg(
            ev, "ts", timedelta(hours=2), slide=timedelta(minutes=30),
            keys=["event_type"],
        )
        sliced = W.sliced_sliding_agg(
            ev, "ts", timedelta(hours=2), timedelta(minutes=30),
            keys=["event_type"],
        )
        cols = sorted(native.columns)
        n = native.select(*cols)
        s = sliced.select(*cols)
        assert n.exceptAll(s).count() == 0 and s.exceptAll(n).count() == 0
        with pytest.raises(ValueError, match="integer multiple"):
            W.sliced_sliding_agg(
                ev, "ts", timedelta(minutes=45), timedelta(minutes=10)
            )
