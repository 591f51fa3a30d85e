#!/usr/bin/env python
"""Physical-plan audit for the headline queries — the ".explain and iterate"
loop made repeatable.

For each query in ``__spark_entry__.queries()`` this prints the formatted
physical plan plus a one-line scorecard of the plan properties that matter
at 100 TB:

- **PushedFilters** — predicates reached the parquet scan (no full-table
  read before the filter);
- **ReadSchema width** — column pruning reached the scan;
- **WholeStageCodegen** — the expression pipeline is JVM-compiled, not
  interpreted (and not row-at-a-time Python);
- **BroadcastHashJoin vs SortMergeJoin** — small sides broadcast; big
  equi-joins shuffle once;
- **WindowGroupLimit** — rank-limit pushdown for top-k;
- **partial aggregation** — HashAggregate appears in both partial and final
  form around the exchange;
- **Exchange count** — shuffles in the plan (fewer is better; AQE may
  coalesce at runtime).

Usage: python tools/plan_audit.py [sf_dir] [query ...] [--full]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit(name: str, df, full: bool) -> dict:
    qe = df._jdf.queryExecution()
    plan = qe.explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    checks = {
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "codegen": "WholeStageCodegen" in plan,
        "broadcast_join": "BroadcastHashJoin" in plan,
        "smj": "SortMergeJoin" in plan,
        "window_group_limit": "WindowGroupLimit" in plan,
        "partial_agg": len(re.findall(r"HashAggregate", plan)) >= 2,
        "exchanges": len(re.findall(r"\bExchange\b|\(Exchange", plan))
        or plan.count("Exchange"),
    }
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    checks["scan_cols"] = max((len(s.split(",")) for s in schemas), default=0)
    if full:
        print(plan)
    return checks


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--full"]
    full = "--full" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as E
    from real_time_sliding_window_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        c = audit(name, df, full)
        flags = " ".join(
            k
            for k, v in c.items()
            if v is True and k in ("pushed_filters", "codegen", "broadcast_join",
                                   "smj", "window_group_limit", "partial_agg")
        )
        print(f"{name:28s} exchanges={c['exchanges']:<2d} "
              f"scan_cols<={c['scan_cols']:<2d} {flags}")
    spark.stop()


if __name__ == "__main__":
    main()
