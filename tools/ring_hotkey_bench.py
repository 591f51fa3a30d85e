"""Ring-buffer hot-conversation ceiling + sharded mitigation (VERDICT r02 #7).

The stateful ring buffer routes every turn of a conv_id through ONE state
task per micro-batch — by semantics, not by accident (global oldest-first
capacity eviction needs the whole conversation in one place). skew.py
measures the window-agg skew path; this harness measures the stateful-op
path: what happens when a single conversation carries 10^6 turns.

Jobs (1M rows each, identical row shape, max_data=64, one availableNow
drain batch, noop-style parquet-free sink, untimed warmup first):

- uniform : 16 convs x 62,500 turns — the parallel upper bound (16 groups
            spread over the cores).
- hot     : 1 conv x 1,000,000 turns through `ring_buffer_stream` — the
            single-task ceiling (everything serializes through one state
            task regardless of core count).
- sharded : the same hot corpus through `sharded_ring_buffer_stream`
            (n_shards=16): dedup + age eviction exact, capacity shard-local
            (see operators/stateful.py docstring for the precise contract).

Run:  python tools/ring_hotkey_bench.py    (markdown row to stdout;
paste into BENCH/SKEW.md)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from datetime import timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_sliding_window_spark.operators.stateful import (
    ring_buffer_stream,
    sharded_ring_buffer_stream,
)
from real_time_sliding_window_spark.session import get_spark
from real_time_sliding_window_spark.synth import TRANSCRIPT_SCHEMA

CORES = int(os.environ.get("RTSW_HOTKEY_CPUS", "16"))
N_ROWS = int(os.environ.get("RTSW_HOTKEY_ROWS", "1000000"))


def corpus(spark, path: str, n_convs: int, n_rows: int) -> str:
    """n_rows turns spread over n_convs conversations, written as parquet."""
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    per_conv = n_rows // n_convs
    df = (
        spark.range(0, n_rows, 1, 64)
        .select(
            F.concat(F.lit("c"), (F.col("id") % n_convs)).alias("conv_id"),
            (F.col("id") / n_convs).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.concat(F.lit("turn text payload "), F.col("id")).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.timestamp_seconds(
                F.lit(1735689600) + (F.col("id") / n_convs) / 10.0
            ).alias("ts"),
        )
    )
    df.write.mode("overwrite").parquet(path)
    return path


def run(spark, path: str, pipe, name: str) -> float:
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", "128")
        .parquet(path)
    )
    ckpt = tempfile.mkdtemp(prefix=f"hotkey_{name}_")
    t0 = time.monotonic()
    q = (
        pipe(src)
        .writeStream.foreachBatch(
            lambda d, b: d.write.format("noop").mode("overwrite").save()
        )
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dt = time.monotonic() - t0
    shutil.rmtree(ckpt, ignore_errors=True)
    return dt


def main() -> None:
    spark = get_spark(
        app_name="ring-hotkey-bench",
        master=f"local[{CORES}]",
        shuffle_partitions=CORES,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.gettempdir()
    uni = corpus(spark, os.path.join(tmp, f"rtsw_hk_uni_{N_ROWS}"), 16, N_ROWS)
    hot = corpus(spark, os.path.join(tmp, f"rtsw_hk_hot_{N_ROWS}"), 1, N_ROWS)
    warm = corpus(spark, os.path.join(tmp, "rtsw_hk_warm"), 4, 20000)

    plain = lambda s: ring_buffer_stream(s, timedelta(0), max_data=64)
    sharded = lambda s: sharded_ring_buffer_stream(
        s, timedelta(0), max_data=64, n_shards=16
    )

    run(spark, warm, plain, "warm")          # workers + JIT, untimed
    run(spark, warm, sharded, "warm_sh")

    jobs = [
        ("uniform 16 convs, plain", uni, plain),
        ("hot 1 conv, plain (single-task ceiling)", hot, plain),
        ("hot 1 conv, sharded n=16", hot, sharded),
    ]
    print(f"| job ({N_ROWS:,} rows, local[{CORES}], max_data=64) | sec | turns/s |")
    print("|---|---|---|")
    for label, path, pipe in jobs:
        dt = min(run(spark, path, pipe, label[:6]) for _ in range(2))
        print(f"| {label} | {dt:.1f} | {round(N_ROWS / dt):,} |")
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
