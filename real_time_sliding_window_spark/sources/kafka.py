"""Kafka production source — the stream the file feed stands in for.

The reference ingests via caller-thread ``addData`` (A1-A3,
`BucketedWindow.kt:51-58`); the production-scale equivalent of "a firehose
of addData calls" is a Kafka topic of transcript turns. The connector
(``org.apache.spark:spark-sql-kafka-0-10_2.13``) is a separate artifact not
bundled with Spark and this sandbox has no network, so — exactly like
streaming/iceberg.py — every entry point gates on the class being present
and degrades to an actionable error; tests pin the gate. On a cluster with
the package on the classpath this is the drop-in source; the rest of the
engine is source-agnostic (everything downstream consumes the same
transcript-schema DataFrame the FileFeed produces).

Design notes for scale:
- value parsing is ``from_json`` with the fixed transcript schema —
  JVM-side, whole-stage codegen, no Python in the row path;
- ``minPartitions`` can oversplit Kafka partitions when topic partitions
  < executor cores (Kafka partition count, not Spark, is the default
  parallelism ceiling of a Kafka stage);
- offsets ride the checkpoint: with the idempotent sink (sink.py /
  iceberg.py) the pipeline is end-to-end exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_sliding_window_spark.synth import TRANSCRIPT_SCHEMA

CONNECTOR_CLASS = "org.apache.spark.sql.kafka010.KafkaSourceProvider"
PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13"


def kafka_available(spark: SparkSession) -> bool:
    """True iff the Kafka connector is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(CONNECTOR_CLASS)
        return True
    except Exception:
        return False


def _require(spark: SparkSession) -> None:
    if not kafka_available(spark):
        raise RuntimeError(
            "Kafka connector not on the classpath. Launch with\n"
            f"  spark-submit --packages {PACKAGE}:<spark-version> ...\n"
            "In this sandbox use sources.streams.FileFeed (same transcript "
            "schema, explicit batch control) or rate_stream for throughput."
        )


def transcript_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    min_partitions: int | None = None,
) -> DataFrame:
    """readStream from a Kafka topic of JSON transcript turns.

    Output schema = TRANSCRIPT_SCHEMA (+ kafka_timestamp for ingest-lag
    monitoring); event time stays the payload ``ts``, so watermarks and
    window semantics are identical to every other source.
    """
    _require(spark)
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if min_partitions is not None:
        reader = reader.option("minPartitions", str(min_partitions))
    raw = reader.load()
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), TRANSCRIPT_SCHEMA).alias("t"),
        F.col("timestamp").alias("kafka_timestamp"),
    )
    return parsed.select("t.*", "kafka_timestamp")


def to_kafka_payload(df: DataFrame) -> DataFrame:
    """Inverse mapping for a Kafka SINK: (key, value) JSON rows keyed by
    conv_id so a conversation's turns stay in one partition (per-key
    ordering — the property the ring buffer's (ts, turn_idx) merge relies
    on for mostly-in-order arrival)."""
    return df.select(
        F.col("conv_id").cast("string").alias("key"),
        F.to_json(F.struct(*TRANSCRIPT_SCHEMA.fieldNames())).alias("value"),
    )


def write_stream_to_kafka(
    result: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
):
    """Start an append-mode Kafka sink (STARTS the query, like
    iceberg.write_stream_to_iceberg). At-least-once: Kafka has no
    transactional dedup keyed on epochId — downstream consumers dedup on
    (conv_id, turn_idx) (pipeline.deduped_stream) for effective
    exactly-once."""
    _require(result.sparkSession)
    return (
        to_kafka_payload(result)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


__all__ = [
    "kafka_available",
    "transcript_kafka_stream",
    "to_kafka_payload",
    "write_stream_to_kafka",
    "CONNECTOR_CLASS",
    "PACKAGE",
]
