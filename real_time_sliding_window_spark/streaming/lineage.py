"""Streaming metrics & lineage — the reference's Micrometer pipeline (A16)
re-expressed on StreamingQueryListener + the sink's per-batch manifests.

The reference rendered gauges/timers per window (Metrics.kt:108-137); here
every micro-batch's progress JSON (rows in/out, state rows, batch duration,
watermark) is captured to a list and can be persisted as a metrics table.
Per-partition lineage comes from the exactly-once sink's commit manifests
(sink.py) — together they satisfy the north rule's "per-partition lineage
and metrics" requirement. The 110%-of-bucket-duration WARN
(FixedTumblingBucketedWindow.kt:140-147) maps to `slow_batches`.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class LineageListener(StreamingQueryListener):
    def __init__(self, slow_batch_ms: float | None = None):
        self.progress: list[dict] = []
        self.slow_batch_ms = slow_batch_ms
        self.slow_batches: list[dict] = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = json.loads(event.progress.json)
        rec = {
            "query": p.get("name"),
            "batch_id": p.get("batchId"),
            "num_input_rows": p.get("numInputRows"),
            "processed_rows_per_sec": p.get("processedRowsPerSecond"),
            "batch_duration_ms": p.get("batchDuration"),
            "watermark": p.get("eventTime", {}).get("watermark"),
            "state_rows": sum(
                s.get("numRowsTotal", 0) for s in p.get("stateOperators", [])
            ),
            "state_updated": sum(
                s.get("numRowsUpdated", 0) for s in p.get("stateOperators", [])
            ),
        }
        self.progress.append(rec)
        if self.slow_batch_ms and (rec["batch_duration_ms"] or 0) > self.slow_batch_ms:
            self.slow_batches.append(rec)

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass

    # -- reporting ---------------------------------------------------------
    def totals(self) -> dict:
        return {
            "batches": len(self.progress),
            "input_rows": sum(r["num_input_rows"] or 0 for r in self.progress),
            "max_state_rows": max(
                (r["state_rows"] for r in self.progress), default=0
            ),
        }

    def to_df(self, spark: SparkSession):
        import pandas as pd

        return spark.createDataFrame(pd.DataFrame(self.progress))


def attach(spark: SparkSession, slow_batch_ms: float | None = None) -> LineageListener:
    listener = LineageListener(slow_batch_ms)
    spark.streams.addListener(listener)
    return listener
