"""Streaming sources.

The reference ingests via ``addData`` on the caller thread (A1-A3); here a
row "is added" by arriving from a source. Production path is an Iceberg /
Kafka stream; in this sandbox (no Iceberg runtime jar, no network) the
equivalents are:

- ``file_feed``: a directory of parquet drops read with ``readStream`` —
  each ``push`` is a micro-batch's worth of arrivals, giving tests full
  control over batch boundaries and watermark advancement (the pytest
  analogue of the reference's latch-gated TestRunOnlyNTimesTaskScheduler,
  SURVEY.md §5);
- ``rate_stream``: the built-in rate-micro-batch source mapped onto the
  transcript schema for throughput benchmarking (deterministic content via
  the same stateless per-id hash as synth.py, computed with JVM-side
  column expressions — no Python in the row path).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_sliding_window_spark.synth import T0, TRANSCRIPT_SCHEMA


class FileFeed:
    """Parquet-drop streaming source with explicit batch control."""

    def __init__(self, spark: SparkSession, directory: str):
        self.spark = spark
        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        self._n = 0

    def push(self, df_or_pdf) -> None:
        """Drop one file of rows into the feed (one future micro-batch)."""
        import pandas as pd

        if isinstance(df_or_pdf, pd.DataFrame):
            df = self.spark.createDataFrame(df_or_pdf, schema=TRANSCRIPT_SCHEMA)
        else:
            df = df_or_pdf
        # write to a temp dir then move files in, so readStream never sees
        # partial files (atomic-visibility contract of file sources)
        tmp = os.path.join(self.dir, f"_tmp_{uuid.uuid4().hex}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        for name in os.listdir(tmp):
            if name.endswith(".parquet"):
                os.rename(
                    os.path.join(tmp, name),
                    os.path.join(self.dir, f"drop_{self._n:05d}_{name}"),
                )
        self._n += 1

    def stream(self, schema=TRANSCRIPT_SCHEMA) -> DataFrame:
        return (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(self.dir)
        )


def rate_stream(
    spark: SparkSession,
    rows_per_second: int,
    n_convs: int = 10_000,
    turns_per_conv: int = 50,
) -> DataFrame:
    """Deterministic transcript stream from the rate source (bench feed).

    Maps the monotone rate ``value`` onto (conv_id, turn_idx) round-robin;
    all columns are Catalyst expressions (codegen), so the source itself
    can saturate millions of rows/sec — the pipeline under test is the
    bottleneck, not the feed.
    """
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    v = F.col("value")
    conv = (v % n_convs).cast("long")
    turn = ((v / n_convs).cast("long") % turns_per_conv).cast("int")
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")), (turn % 3) + 1
    )
    return rate.select(
        F.format_string("c%06d", conv).alias("conv_id"),
        turn.alias("turn_idx"),
        role.alias("role"),
        F.format_string("c%06d-t%d", conv, turn).alias("text"),
        F.when(role == "tool", F.lit("search")).alias("tool"),
        F.col("timestamp").alias("ts"),
    )
