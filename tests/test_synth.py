"""Generator determinism & schema tests (FIXTURES.md §1)."""

from __future__ import annotations

from datetime import timedelta

import pandas as pd

from real_time_sliding_window_spark import synth


def test_pandas_generator_deterministic():
    a = synth.transcripts_pandas(50, mean_turns=8)
    b = synth.transcripts_pandas(50, mean_turns=8)
    pd.testing.assert_frame_equal(a, b)
    assert a["conv_id"].nunique() == 50
    assert set(a["role"].unique()) <= {"user", "assistant", "tool"}
    # text encodes identity
    row = a.iloc[10]
    assert row["text"] == f"{row['conv_id']}-t{row['turn_idx']}"
    # monotone ts per conversation
    g = a.groupby("conv_id")["ts"]
    assert (g.apply(lambda s: s.is_monotonic_increasing)).all()
    # tool set only on tool rows
    assert a.loc[a.role == "tool", "tool"].notna().all()
    assert a.loc[a.role != "tool", "tool"].isna().all()


def test_distributed_generator_matches_pandas(spark):
    n = 120
    local = synth.transcripts_pandas(n)
    dist = (
        synth.transcripts_df(spark, n, slice_size=17)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    local = local.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    dist = dist.reset_index(drop=True)
    assert len(local) == len(dist)
    assert list(local["text"]) == list(dist["text"])
    assert list(local["ts"]) == list(dist["ts"])


def test_distributed_generator_partitioning_invariant(spark):
    """Same output at different parallelism — the scaling-run precondition."""
    a = synth.transcripts_df(spark, 60, slice_size=7).orderBy("conv_id", "turn_idx").toPandas()
    b = synth.transcripts_df(spark, 60, slice_size=60).orderBy("conv_id", "turn_idx").toPandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_f1_fixture_shape():
    pdf = synth.f1_window_content_rows()
    # 5 offsets x 2 roles x 2 turns = 20 rows, texts 1..5
    assert len(pdf) == 20
    assert sorted(pdf["text"].unique()) == ["1", "2", "3", "4", "5"]
    assert (pdf.groupby("text").size() == 4).all()


def test_f8_skew_fixture():
    pdf = synth.f8_skew_rows(hot_turns=100, n_cold=10, cold_turns=5)
    counts = pdf.groupby("conv_id").size()
    assert counts["hot000"] == 100
    assert counts.drop("hot000").max() <= 11
