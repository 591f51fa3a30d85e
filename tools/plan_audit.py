#!/usr/bin/env python
"""CLI for the physical-plan audit (library core:
real_time_sliding_window_spark/plans/audit.py; commentary: PLANS.md).

Usage: python tools/plan_audit.py [sf_dir] [query ...] [--full]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--full"]
    full = "--full" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as E
    from real_time_sliding_window_spark.plans.audit import formatted_plan, scorecard
    from real_time_sliding_window_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        if full:
            print(formatted_plan(df))
        c = scorecard(df)
        flags = " ".join(
            k
            for k in ("pushed_filters", "codegen", "broadcast_join",
                      "smj", "window_group_limit", "partial_agg")
            if c[k]
        )
        print(f"{name:28s} exchanges={c['exchanges']:<2d} "
              f"scan_cols<={c['scan_cols']:<2d} {flags}")
    spark.stop()


if __name__ == "__main__":
    main()
