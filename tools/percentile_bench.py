"""Approx-vs-exact percentile measurement in the GENUINELY approximate
regime (group n >> accuracy), where the driver gate's exact-mode hash
match can't see (VERDICT r02 #2).

Blows the sf0.1 events table up ×10 and ×30 (deterministic value spread so
order statistics stay distinct), then per (event_type, percentile):
- exact `percentile` (the ImperativeAggregate that buffers whole groups)
- `approx_percentile` at accuracy 10000 (GK sketch, bounded memory)
and reports wall time for each plus the worst value-relative and
rank-relative error. GK's contract is rank error ≤ n/accuracy; the value
error follows the local density.

Usage: python tools/percentile_bench.py [sf_dir]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from real_time_sliding_window_spark import get_spark  # noqa: E402

PS = [0.5, 0.95, 0.99]
ACC = 10000


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    base = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("cents", F.round(F.col("value") * 100).cast("long"))
        .select("event_type", "cents")
    )
    print("| blow-up | group n | exact s | approx s | max value rel err | max rank rel err |")
    print("|---|---|---|---|---|---|")
    for mult in (10, 30):
        df = (
            base.crossJoin(spark.range(mult).select(F.col("id").alias("rep")))
            .withColumn(
                "cents",
                F.col("cents") * 100 + (F.col("rep") * 37 + F.col("cents")) % 100,
            )
            .localCheckpoint(eager=True)
        )
        t0 = time.time()
        exact = (
            df.groupBy("event_type")
            .agg(
                *[
                    F.expr(f"percentile(cents, {p})").alias(f"e{i}")
                    for i, p in enumerate(PS)
                ],
                F.count(F.lit(1)).alias("n"),
            )
            .toPandas()
        )
        t_exact = time.time() - t0
        t0 = time.time()
        approx = (
            df.groupBy("event_type")
            .agg(
                *[
                    F.expr(f"approx_percentile(cents, {p}, {ACC})").alias(f"a{i}")
                    for i, p in enumerate(PS)
                ]
            )
            .toPandas()
        )
        t_approx = time.time() - t0
        m = exact.merge(approx, on="event_type")
        max_vrel, max_rrel = 0.0, 0.0
        # rank error: |CDF(approx) - p| measured on the actual data
        for i, p in enumerate(PS):
            for _, row in m.iterrows():
                e, a = float(row[f"e{i}"]), float(row[f"a{i}"])
                max_vrel = max(max_vrel, abs(a - e) / max(abs(e), 1))
                cdf = (
                    df.filter(
                        (F.col("event_type") == row.event_type)
                        & (F.col("cents") <= a)
                    ).count()
                    / row.n
                )
                max_rrel = max(max_rrel, abs(cdf - p))
        n = int(m.n.iloc[0])
        print(
            f"| ×{mult} | {n} | {t_exact:.1f} | {t_approx:.1f} "
            f"| {max_vrel:.2e} | {max_rrel:.2e} (bound {n/ACC/n:.0e}·n→{1/ACC:.0e}) |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
