"""Deterministic synthetic conversation-transcript generator.

Implements FIXTURES.md §1 exactly: seed=42, ``T0 = 2026-01-01T00:00:00Z``,
``conv_id = f"c{i:06d}"``, ``text = f"{conv_id}-t{turn_idx}"`` (unique per
turn so per-turn text equality checks are unambiguous), ``ts = T0 +
conv_offset + turn_idx * step``, monotone non-decreasing per conversation.

Generation is vectorized with numpy and handed to Spark through Arrow
(``spark.createDataFrame(pandas)``), never via a per-row Python loop. For
bench-scale data we generate *in parallel on executors* via ``mapInPandas``
over a range of conversation ids — each task synthesizes its own slice
deterministically from (seed, conv_id), so the output is identical at any
parallelism level (the property the N-vs-4N scaling run depends on).

The transcript schema is the engine's fixed input schema
(BASELINE.json input_hint):
    conv_id string, turn_idx int32, role string, text string,
    tool string (nullable), ts timestamp(µs)
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

T0 = datetime(2026, 1, 1, 0, 0, 0)  # naive UTC (session timezone is UTC)
SEED = 42

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), False),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(["search", "code", "browse", "calc"])


def _conv_slice(
    conv_lo: int,
    conv_hi: int,
    mean_turns: int,
    step: timedelta,
    conv_spread: timedelta,
    text_rep: int = 1,
) -> pd.DataFrame:
    """Deterministic transcript rows for conversations [conv_lo, conv_hi).

    Every quantity is a pure function of (SEED, conv index) so any
    partitioning of the id range yields byte-identical union output.
    """
    n = conv_hi - conv_lo
    if n <= 0:
        return pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype="string"),
                "turn_idx": pd.Series([], dtype="int32"),
                "role": pd.Series([], dtype="string"),
                "text": pd.Series([], dtype="string"),
                "tool": pd.Series([], dtype="object"),
                "ts": pd.Series([], dtype="datetime64[us]"),
            }
        )
    ids = np.arange(conv_lo, conv_hi, dtype=np.uint64)
    # stateless per-conversation randomness: splitmix-style hash of the id,
    # independent of slicing/partitioning
    with np.errstate(over="ignore"):
        h = ids * np.uint64(0x9E3779B97F4A7C15)
    u1 = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    turns = np.maximum(1, (u1 * (2 * mean_turns)).astype(np.int64) + 1)

    total = int(turns.sum())
    conv_rep = np.repeat(ids, turns)
    # turn_idx: 0..turns-1 within each conversation
    starts = np.concatenate(([0], np.cumsum(turns)[:-1]))
    turn_idx = (np.arange(total, dtype=np.int64) - np.repeat(starts, turns)).astype(np.int32)

    # conversation start offset: hashed uniform over conv_spread
    with np.errstate(over="ignore"):
        h2 = (ids * np.uint64(0xBF58476D1CE4E5B9)) ^ np.uint64(SEED)
    u2 = (h2 >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    conv_off_us = (u2 * conv_spread.total_seconds() * 1e6).astype(np.int64)
    step_us = int(step.total_seconds() * 1e6)
    ts_us = np.repeat(conv_off_us, turns) + turn_idx.astype(np.int64) * step_us
    ts = pd.to_datetime(np.datetime64(T0, "us") + ts_us.astype("timedelta64[us]"))

    # role cycle: user, assistant, (tool on every 3rd), deterministic
    role = ROLES[turn_idx % 3]
    conv_id = pd.Series(conv_rep).map(lambda i: f"c{i:06d}").astype("string")
    text = conv_id.str.cat(pd.Series(turn_idx).astype(str), sep="-t")
    if text_rep > 1:
        # realistic turn lengths for bench corpora: repeat the unique base
        # token (still fully deterministic, still unique per (conv, turn))
        text = text.str.cat((" " + text).str.repeat(text_rep - 1))
    tool = pd.Series(np.where(role == "tool", TOOLS[turn_idx % len(TOOLS)], None))

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": pd.Series(turn_idx, dtype="int32"),
            "role": pd.Series(role, dtype="string"),
            "text": text,
            "tool": tool,
            "ts": ts,
        }
    )


def transcripts_pandas(
    n_convs: int,
    mean_turns: int = 10,
    step: timedelta = timedelta(seconds=30),
    conv_spread: timedelta = timedelta(hours=1),
    text_rep: int = 1,
) -> pd.DataFrame:
    """Small-scale generator for pytest fixtures (driver-side, vectorized)."""
    return _conv_slice(0, n_convs, mean_turns, step, conv_spread, text_rep)


def transcripts_df(
    spark: SparkSession,
    n_convs: int,
    mean_turns: int = 10,
    step: timedelta = timedelta(seconds=30),
    conv_spread: timedelta = timedelta(hours=1),
    slice_size: int = 5000,
    text_rep: int = 1,
) -> DataFrame:
    """Executor-parallel deterministic generator.

    ``spark.range`` partitions the conversation-id space; each task
    synthesizes its own conversations with the stateless per-id scheme, so
    output is independent of partitioning — the 100 TB-scale pattern for
    synthetic load (no driver materialization, no shuffle).
    """
    n_slices = max(1, (n_convs + slice_size - 1) // slice_size)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for s in pdf["id"].to_numpy():
                lo = int(s) * slice_size
                hi = min(lo + slice_size, n_convs)
                yield _conv_slice(lo, hi, mean_turns, step, conv_spread, text_rep)

    return (
        spark.range(0, n_slices, 1, min(n_slices, 256))
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Scenario fixtures (FIXTURES.md §2) — small, driver-side, exact.
# ---------------------------------------------------------------------------

def f1_window_content_rows(now: datetime | None = None) -> pd.DataFrame:
    """F1 golden scenario (reference OnDemandBucketedWindowTest.kt:199-334).

    One conversation c1, 'now' = T0+6s, window length 5 s. For each offset
    d in {5,4,3,2,1} seconds before now, per role in (user, tool): one turn
    at now-d and one at now-d+1s-1µs, text = str(6-d).
    """
    now = now or (T0 + timedelta(seconds=6))
    rows = []
    turn = 0
    for d in (5, 4, 3, 2, 1):
        base = now - timedelta(seconds=d)
        for role in ("user", "tool"):
            for off in (timedelta(0), timedelta(seconds=1) - timedelta(microseconds=1)):
                rows.append(
                    {
                        "conv_id": "c1",
                        "turn_idx": turn,
                        "role": role,
                        "text": str(6 - d),
                        "tool": "search" if role == "tool" else None,
                        "ts": base + off,
                    }
                )
                turn += 1
    pdf = pd.DataFrame(rows)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


def f2_expiry_rows(now: datetime | None = None) -> pd.DataFrame:
    """F2 maxDuration expiry (reference OnDemandBucketedWindowTest.kt:480-620).

    Turns at now-5s..now-1s, one per role (user, tool) per second,
    texts '1'..'5'. Window length 3 s => only ts >= now-3s survive.
    """
    now = now or (T0 + timedelta(seconds=6))
    rows = []
    turn = 0
    for d in (5, 4, 3, 2, 1):
        for role in ("user", "tool"):
            rows.append(
                {
                    "conv_id": "c1",
                    "turn_idx": turn,
                    "role": role,
                    "text": str(6 - d),
                    "tool": "calc" if role == "tool" else None,
                    "ts": now - timedelta(seconds=d),
                }
            )
            turn += 1
    pdf = pd.DataFrame(rows)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


def f8_skew_rows(hot_turns: int = 10_000, n_cold: int = 1_000, cold_turns: int = 10) -> pd.DataFrame:
    """F8 skew fixture: one hot conversation + many cold ones, same total."""
    hot = pd.DataFrame(
        {
            "conv_id": "hot000",
            "turn_idx": np.arange(hot_turns, dtype=np.int32),
            "role": ROLES[np.arange(hot_turns) % 3],
            "text": [f"hot000-t{i}" for i in range(hot_turns)],
            "tool": None,
            "ts": pd.to_datetime(
                np.datetime64(T0, "us")
                + (np.arange(hot_turns) * 1_000_000).astype("timedelta64[us]")
            ),
        }
    )
    cold = transcripts_pandas(n_cold, mean_turns=cold_turns)
    return pd.concat([hot, cold], ignore_index=True)


def to_spark(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """Arrow-path conversion with the canonical transcript schema."""
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
