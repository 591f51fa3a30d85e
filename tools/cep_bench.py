"""CEP operator throughput — transitions_stream + sequence_funnel_stream
drains over the synthetic transcript corpus (r5).

Same harness discipline as streaming_scale_bench.py: availableNow drain
through a counting foreachBatch, turns/s = corpus rows / best wall,
state rows from the final progress (bounded-state check: transitions
keep one bridge + the watermark tail per conv; the sequence funnel keeps
the open round + tail per conv, and completed convs LEAVE state). Reps
with best-of because host contention is one-sided.

Run:  python tools/cep_bench.py [--mults 1 10] [--reps 2]
Paste into BENCH/BASELINE.md (CEP section).
"""

from __future__ import annotations

import argparse
import os
import sys
from datetime import timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_sliding_window_spark.session import get_spark
from real_time_sliding_window_spark.streaming.cep import (
    funnel_stream,
    sequence_funnel_stream,
    transitions_stream,
)
from real_time_sliding_window_spark.synth import TRANSCRIPT_SCHEMA

from streaming_scale_bench import corpus, drain  # noqa: E402


def _src(spark, path):
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", "32")
        .parquet(path)
    )


def transitions_job(spark, path):
    return transitions_stream(
        _src(spark, path), "conv_id", "role",
        seq_col="turn_idx",
        watermark_delay=timedelta(seconds=30),
        max_idle=timedelta(minutes=30),
    )


def funnel_job(spark, path):
    return funnel_stream(
        _src(spark, path), "conv_id", "role",
        first_type="user", then_type="tool",
        window=timedelta(minutes=10),
        seq_col="turn_idx",
        watermark_delay=timedelta(seconds=30),
    )


def sequence_job(spark, path):
    return sequence_funnel_stream(
        _src(spark, path), "conv_id", "role",
        stages=["user", "assistant", "tool"],
        window=timedelta(minutes=10),
        seq_col="turn_idx",
        watermark_delay=timedelta(seconds=30),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", type=int, nargs="*", default=[1])
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    spark = get_spark(app_name="cep-bench")
    spark.sparkContext.setLogLevel("ERROR")
    jobs = (
        (transitions_job, "transitions"),
        (funnel_job, "funnel"),
        (sequence_job, "seq_funnel"),
    )
    try:
        for mult in args.mults:
            path, total = corpus(spark, 20000 * mult)
            for job, jname in jobs:
                reps, state_rows = [], -1
                for r in range(args.reps):
                    dt, sr = drain(
                        spark, job(spark, path), f"cep_{jname}_{mult}_{r}"
                    )
                    reps.append(dt)
                    state_rows = max(state_rows, sr)
                best = min(reps)
                print(
                    f"{jname:12s} mult={mult} turns={total} "
                    f"best_wall_s={best:.1f} "
                    f"turns_per_sec={int(total / best)} "
                    f"state_rows={state_rows} "
                    f"reps={[round(x, 1) for x in reps]}",
                    flush=True,
                )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
