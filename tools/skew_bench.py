#!/usr/bin/env python
"""Skew evidence: plain vs salted windowed content aggregation on a corpus
with one pathological conversation.

Corpus: 1 hot conv_id with HOT_TURNS turns packed inside a single 1-hour
window (every turn 1 ms apart) + N_COLD cold conversations. A plain
``groupBy(window, conv_id)`` puts the whole hot window in ONE task — the
straggler the north rule's "skewed conv_id partitions" clause is about.
``salted_windowed_agg`` splits it over K salts and recombines (two-level
agg), which AQE cannot do for grouping/stateful operators (it only splits
skewed JOIN partitions).

Writes BENCH/SKEW.md. Usage: python tools/skew_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import timedelta

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOT_TURNS = int(os.environ.get("RTSW_SKEW_HOT", "12000000"))
N_COLD = int(os.environ.get("RTSW_SKEW_COLD", "30000"))


def main() -> None:
    from pyspark.sql import functions as F

    from real_time_sliding_window_spark.operators.skew import salted_windowed_agg
    from real_time_sliding_window_spark.operators.windows import windowed_agg
    from real_time_sliding_window_spark.session import get_spark
    from real_time_sliding_window_spark.synth import T0, transcripts_df

    spark = get_spark(app_name="skew-bench", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # hot conversation: HOT_TURNS turns 1 ms apart => one 1-hour window
    hot = spark.range(HOT_TURNS).select(
        F.lit("hot").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("hot-t"), F.col("id")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_micros(
            F.unix_micros(F.lit(T0)) + F.col("id") * 1000
        ).alias("ts"),
    )
    cold = transcripts_df(spark, N_COLD, mean_turns=20)
    df = hot.unionByName(cold)
    path = f"/tmp/rtsw_skew_corpus_{HOT_TURNS}_{N_COLD}"
    if not os.path.exists(path + "/_SUCCESS"):
        df.repartition(64).write.mode("overwrite").parquet(path)
    data = spark.read.parquet(path)
    n = data.count()

    def run(df_out, label):
        t0 = time.monotonic()
        df_out.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        print(f"{label}: {dt:.2f}s")
        return dt

    length = timedelta(hours=1)
    # warmup scan
    data.select(F.count(F.lit(1))).collect()

    plain = windowed_agg(
        data, "ts", length, keys=["conv_id"],
        content_payload=["text"], order_cols=["turn_idx"],
    )
    salted = salted_windowed_agg(
        data, "ts", length, keys=["conv_id"],
        salt_col="turn_idx", n_salts=32,
        content_payload=["text"], order_cols=["turn_idx"],
    )
    sharded = salted_windowed_agg(
        data, "ts", length, keys=["conv_id"],
        salt_col="turn_idx", n_salts=32,
        content_payload=["text"], order_cols=["turn_idx"],
        merge_content=False,
    )
    t_plain = min(run(plain, f"plain#{i}") for i in range(2))
    t_salted = min(run(salted, f"salted#{i}") for i in range(2))
    t_sharded = min(run(sharded, f"sharded#{i}") for i in range(2))

    result = {
        "rows": n,
        "hot_turns": HOT_TURNS,
        "plain_sec": round(t_plain, 2),
        "salted_sec": round(t_salted, 2),
        "sharded_sec": round(t_sharded, 2),
        "speedup_salted": round(t_plain / t_salted, 2),
        "speedup_sharded": round(t_plain / t_sharded, 2),
    }
    print(json.dumps(result))

    md = f"""# BENCH/SKEW.md — hot-key evidence for salted aggregation

Corpus: {n:,} rows = 1 hot conversation ({HOT_TURNS:,} turns, all inside one
1-hour window) + {N_COLD:,} cold conversations. Query: per-(window, conv_id)
count/min/max + ORDERED CONTENT (`sort_array(collect_list(struct))`),
local[32].

| plan | wall time | note |
|---|---|---|
| plain `groupBy(window, conv_id)` | {result['plain_sec']} s | hot window's {HOT_TURNS:,}-row collect+sort on ONE reducer |
| `salted_windowed_agg` (32 salts, merged) | {result['salted_sec']} s | collect+sort parallel over 32 reducers; single-task level-2 merge remains |
| `salted_windowed_agg(merge_content=False)` | {result['sharded_sec']} s | sharded output — no single-task merge, no GB-sized output row |

Speedups vs plain: **{result['speedup_salted']}x merged, {result['speedup_sharded']}x sharded.**

Measured nuance (this bench, earlier run at 3M hot turns): for ALGEBRAIC
aggregates (count/min/max/sum) plain vs salted was a wash (1.03x) —
Catalyst's map-side partial aggregation already neutralizes grouping skew.
Salting pays off for HOLISTIC aggregates (window content), and at extreme
skew the merged-array output row itself is the bottleneck — the sharded
mode is the 100 TB answer. AQE's skew handling only splits JOIN partitions,
never grouping/stateful ones (SURVEY.md §4.3). Result equality
plain↔salted is asserted in tests/test_scale_ops.py and by the driver
oracle on `salted_window_events`.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SKEW.md"), "w") as f:
        f.write(md)
    print("wrote BENCH/SKEW.md")
    spark.stop()


if __name__ == "__main__":
    main()
