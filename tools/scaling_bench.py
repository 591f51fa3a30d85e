#!/usr/bin/env python
"""Two-cluster-size scaling evidence: the same streaming job at local[8]
(N) and local[32] (4N) over the identical corpus + watermark settings.

The north rule's two-cluster-size criterion can't use a real cluster in
this sandbox, so parallelism level stands in for executor count: each run
is its own JVM (subprocess) with shuffle partitions = cores, identical
input files and watermark. Efficiency = (tps_4N / tps_N) / 4.

Usage:
    python tools/scaling_bench.py              # full run, writes BENCH/BASELINE.md
    python tools/scaling_bench.py --run-one 8  # child mode: one JSON line
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CONVS = int(os.environ.get("RTSW_SCALE_CONVS", "20000"))
MEAN_TURNS = int(os.environ.get("RTSW_SCALE_TURNS", "25"))
LEVELS = (8, 32)


def run_one(cpus: int) -> None:
    import shutil
    import tempfile
    from datetime import timedelta

    from real_time_sliding_window_spark.config import WindowSpec
    from real_time_sliding_window_spark.operators.stateful import ring_buffer_stream
    from real_time_sliding_window_spark.session import get_spark
    from real_time_sliding_window_spark.streaming.pipeline import windowed_stream
    from real_time_sliding_window_spark.synth import TRANSCRIPT_SCHEMA, transcripts_df

    spark = get_spark(
        app_name=f"rtsw-scale-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = os.path.join(
        tempfile.gettempdir(), f"rtsw_bench_corpus_{N_CONVS}_{MEAN_TURNS}"
    )
    marker = os.path.join(corpus, "_DONE")
    if not os.path.exists(marker):
        if os.path.exists(corpus):
            shutil.rmtree(corpus)
        transcripts_df(spark, N_CONVS, mean_turns=MEAN_TURNS).repartition(
            64
        ).write.mode("overwrite").parquet(corpus)
        open(marker, "w").close()
    total_rows = spark.read.parquet(corpus).count()

    def src():
        return (
            spark.readStream.schema(TRANSCRIPT_SCHEMA)
            .option("maxFilesPerTrigger", "16")
            .parquet(corpus)
        )

    def run(df, name):
        ckpt = tempfile.mkdtemp(prefix=f"sc_{name}_{cpus}_")
        t0 = time.monotonic()
        q = (
            df.writeStream.foreachBatch(lambda d, b: d.write.format("noop").mode("overwrite").save())
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.monotonic() - t0
        shutil.rmtree(ckpt, ignore_errors=True)
        return dt

    spec = WindowSpec(name=f"sc{cpus}", length="60 seconds", watermark_delay="30 seconds")
    dt_win = run(windowed_stream(src(), spec, keys=["conv_id"]), "win")
    dt_ring = run(
        ring_buffer_stream(
            src(), timedelta(seconds=30),
            max_duration=timedelta(minutes=10), max_data=64,
        ),
        "ring",
    )
    print(
        json.dumps(
            {
                "cpus": cpus,
                "rows": total_rows,
                "window_tps": round(total_rows / dt_win),
                "ring_tps": round(total_rows / dt_ring),
                "window_sec": round(dt_win, 2),
                "ring_sec": round(dt_ring, 2),
            }
        )
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--run-one":
        run_one(int(sys.argv[2]))
        return

    results = {}
    for cpus in LEVELS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run-one", str(cpus)],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line)

    n, x4 = results[LEVELS[0]], results[LEVELS[1]]
    eff_win = (x4["window_tps"] / n["window_tps"]) / (LEVELS[1] / LEVELS[0])
    eff_ring = (x4["ring_tps"] / n["ring_tps"]) / (LEVELS[1] / LEVELS[0])
    summary = {
        "levels": LEVELS,
        "results": results,
        "scaling_efficiency_window": round(eff_win, 3),
        "scaling_efficiency_ring": round(eff_ring, 3),
    }
    print(json.dumps(summary))
    _write_baseline_md(summary)


def _write_baseline_md(s: dict) -> None:
    n, x4 = s["results"][8], s["results"][32]
    md = f"""# BENCH/BASELINE.md — measured performance baseline

**Reference numbers:** none exist — the reference publishes no benchmarks
(see /root/repo/BASELINE.md). These are this engine's own measured numbers,
which future rounds must match or beat.

## Streaming throughput & N→4N scaling (north-rule gate: efficiency ≥ 0.8)

Same corpus ({n["rows"]:,} transcript turns, deterministic seed=42), same
watermark (30 s), same job, two parallelism levels as the sandbox proxy for
two cluster sizes (local[8] = N, local[32] = 4N; one JVM each, shuffle
partitions = cores):

| job | local[8] turns/s | local[32] turns/s | scaling efficiency |
|---|---|---|---|
| tumbling window agg (JVM codegen) | {n["window_tps"]:,} | {x4["window_tps"]:,} | **{s["scaling_efficiency_window"]}** |
| stateful ring buffer (applyInPandasWithState) | {n["ring_tps"]:,} | {x4["ring_tps"]:,} | **{s["scaling_efficiency_ring"]}** |

Raw: local[8] window {n["window_sec"]} s / ring {n["ring_sec"]} s;
local[32] window {x4["window_sec"]} s / ring {x4["ring_sec"]} s.

Method: `python tools/scaling_bench.py` (subprocess per level, availableNow
drain of the parquet-backed stream, noop-write sink so sink IO doesn't mask
compute scaling). Efficiency = (tps_4N / tps_N) / 4.

## Per-round per-query numbers

`bench.py` prints the per-query batch timings at sf0.1 plus the streaming
turns/sec — recorded by the driver as BENCH_r{{N}}.json; compare across
rounds against this file.

## Latency

Under availableNow batch semantics the emit-latency analogue is batch
duration (p50/p99 reported by bench.py's `streaming` block). Wall-clock
p99 window-emit latency would need a live processing-time trigger; the
bounded sandbox run uses drain semantics instead.
"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(md)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
