"""Streaming 10x scale evidence — ring buffer + stream-stream as-of
(VERDICT r04 next-round #6).

The r4 sf1 sweep covered the 56 batch queries; the streaming family had
only sf0.1-scale rows, so "state bounded, throughput flat per-core at
10x conversations" was extrapolated. This harness measures it: the
bench.py drain jobs (ring buffer, as-of join) run on the 1x and 10x
synthetic conversation corpora (same turn distribution, same watermark),
reporting turns/s AND the state-store row count at drain end
(stateOperators.numRowsTotal from the final progress).

Expected shape, stated before measuring: state rows grow ~linearly with
conversation count (one ring buffer / one as-of key per conv — bounded
per key, never with stream length); drain turns/s stays within host
noise of flat (state work is O(rows) with per-key constants amortized).
A super-linear wall or state curve is a defect.

Host-noise protocol (BENCH/BASELINE.md): contention is one-sided, so
each level runs `--reps` times (default 2) and the BEST drain is the
estimate; per-rep numbers are printed.

Run:  python tools/streaming_scale_bench.py [--mults 1 10] [--reps 2]
Paste the tables into BENCH/SCALE10X.md (streaming section).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time
from datetime import timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from real_time_sliding_window_spark.operators.stateful import (
    ring_buffer_stream,
)
from real_time_sliding_window_spark.session import get_spark
from real_time_sliding_window_spark.streaming.asof import as_of_stream_join
from real_time_sliding_window_spark.synth import TRANSCRIPT_SCHEMA, transcripts_df

BASE_CONVS = int(os.environ.get("RTSW_BENCH_CONVS", "20000"))
MEAN_TURNS = int(os.environ.get("RTSW_BENCH_TURNS", "25"))
_TMP: list[str] = []


def corpus(spark, n_convs: int) -> tuple[str, int]:
    path = os.path.join(
        tempfile.gettempdir(), f"rtsw_ssb_corpus_{n_convs}_{MEAN_TURNS}"
    )
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        if os.path.exists(path):
            shutil.rmtree(path)
        df = transcripts_df(spark, n_convs, mean_turns=MEAN_TURNS)
        df.repartition(32).write.mode("overwrite").parquet(path)
        open(marker, "w").close()
    return path, spark.read.parquet(path).count()


def drain(spark, result_df, name: str) -> tuple[float, int]:
    """availableNow drain; returns (wall_s, state_rows_total)."""
    ckpt = tempfile.mkdtemp(prefix=f"rtsw_ssb_{name}_")
    _TMP.append(ckpt)
    t0 = time.monotonic()
    q = (
        result_df.writeStream.foreachBatch(lambda df, bid: df.count())
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dt = time.monotonic() - t0
    state_rows = -1
    prog = q.lastProgress
    if prog and prog.get("stateOperators"):
        state_rows = sum(
            op.get("numRowsTotal", 0) for op in prog["stateOperators"]
        )
    return dt, state_rows


def ring_job(spark, path):
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", "32")
        .parquet(path)
    )
    return ring_buffer_stream(
        src, timedelta(seconds=30),
        max_duration=timedelta(minutes=10), max_data=64,
    )


def asof_job(spark, path):
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", "32")
        .parquet(path)
    )
    left = src.filter(F.col("role") == "user").select(
        "conv_id", "turn_idx", "ts"
    )
    right = src.filter(F.col("role") != "user").select(
        "conv_id", "turn_idx", "ts"
    )
    return as_of_stream_join(
        left, right, keys=["conv_id"],
        horizon=timedelta(minutes=5),
        watermark_delay=timedelta(seconds=30),
        left_payload=["turn_idx"], right_payload=["turn_idx"],
        right_tiebreaker="turn_idx",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", type=int, nargs="*", default=[1, 10])
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    spark = get_spark(app_name="streaming-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        rows = []
        for mult in args.mults:
            n_convs = BASE_CONVS * mult
            path, total = corpus(spark, n_convs)
            for job, jname in ((ring_job, "ring"), (asof_job, "asof")):
                reps = []
                state_rows = -1
                for r in range(args.reps):
                    dt, sr = drain(
                        spark, job(spark, path), f"{jname}_{mult}_{r}"
                    )
                    reps.append(dt)
                    state_rows = max(state_rows, sr)
                best = min(reps)
                rows.append({
                    "job": jname,
                    "mult": mult,
                    "convs": n_convs,
                    "turns": total,
                    "best_wall_s": round(best, 1),
                    "turns_per_sec": round(total / best),
                    "state_rows": state_rows,
                    "per_rep_s": "/".join(f"{d:.1f}" for d in reps),
                })
                print(f"done {jname} x{mult}: {rows[-1]}", file=sys.stderr)
        cols = list(rows[0])
        print("| " + " | ".join(cols) + " |")
        print("|" + "|".join("---" for _ in cols) + "|")
        for r in rows:
            print("| " + " | ".join(str(r[c]) for c in cols) + " |")
    finally:
        spark.stop()
        for d in _TMP:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
