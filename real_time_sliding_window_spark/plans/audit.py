"""Physical-plan introspection: the ".explain and iterate" loop as code.

``scorecard(df)`` condenses a DataFrame's formatted physical plan into the
plan properties that matter at 100 TB (see PLANS.md for the why):

- ``pushed_filters`` — predicates reached the parquet scan;
- ``scan_cols``      — widest ReadSchema (column pruning reached the scan);
- ``codegen``        — WholeStageCodegen spans exist (JVM-compiled exprs);
- ``broadcast_join`` / ``smj`` — join strategies chosen;
- ``window_group_limit`` — rank-limit pushdown for top-k;
- ``partial_agg``    — map-side combine before the shuffle;
- ``exchanges``      — shuffle count (AQE may coalesce at runtime).

Used by tools/plan_audit.py across every driver query, and available to
tests for asserting plan shape (not just results).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def scorecard(df: DataFrame) -> dict:
    plan = formatted_plan(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "codegen": "WholeStageCodegen" in plan,
        "broadcast_join": "BroadcastHashJoin" in plan,
        "smj": "SortMergeJoin" in plan,
        "window_group_limit": "WindowGroupLimit" in plan,
        "partial_agg": len(re.findall(r"HashAggregate", plan)) >= 2,
        "exchanges": plan.count("Exchange"),
        "scan_cols": max((len(s.split(",")) for s in schemas), default=0),
    }
