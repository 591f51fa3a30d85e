"""Measure the stream-stream as-of join's JSON payload tax (VERDICT r03 #5).

`streaming/asof.py` packs payloads as ``to_json(struct(...))`` per row on
the way in and ``from_json`` on the way out, so the state schema stays
fixed for any caller schema. The rationale is sound; this harness puts a
NUMBER on the cost at realistic turn width so the shape is kept (or
changed) on evidence, not taste:

1. **End-to-end drain** of `as_of_stream_join` over the bench transcript
   corpus with (a) a narrow payload (turn_idx only — the shape
   bench.py's asof row measures) and (b) a realistic wide payload
   (turn_idx, role, tool + text padded to ~400 chars). The delta is the
   all-in cost of wide JSON payloads riding through pack → Arrow →
   numpy state → unpack.
2. **Pack-tax isolation** (batch, same rows): wall time of a full pass
   evaluating ``xxhash64(to_json(struct(cols)))`` vs
   ``xxhash64(struct(cols))`` — the marginal cost of the JSON
   serialization itself, separated from the stateful machinery, plus
   ``from_json`` vs a direct struct read for the unpack side.

Run: python tools/asof_payload_bench.py [n_convs] [mean_turns]
Paste the table into BENCH/JOINS.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from datetime import timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_sliding_window_spark.session import get_spark
from real_time_sliding_window_spark.streaming.asof import as_of_stream_join
from real_time_sliding_window_spark.synth import TRANSCRIPT_SCHEMA, transcripts_df

PAD = 400


def _corpus(spark, n_convs: int, mean_turns: int) -> tuple[str, int]:
    path = os.path.join(
        tempfile.gettempdir(), f"rtsw_asofpay_{n_convs}_{mean_turns}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df = transcripts_df(spark, n_convs, mean_turns=mean_turns).withColumn(
            "text", F.rpad(F.col("text"), PAD, "x")
        )
        df.repartition(32).write.mode("overwrite").parquet(path)
    return path, spark.read.parquet(path).count()


def drain(spark, path: str, wide: bool) -> float:
    src = (
        spark.readStream.schema(
            TRANSCRIPT_SCHEMA
        ).option("maxFilesPerTrigger", "32").parquet(path)
    )
    left = src.filter(F.col("role") == "user")
    right = src.filter(F.col("role") != "user")
    payload = (
        ["turn_idx", "role", "text", "tool"] if wide else ["turn_idx"]
    )
    res = as_of_stream_join(
        left.select("conv_id", "ts", *payload),
        right.select("conv_id", "ts", *payload),
        keys=["conv_id"],
        horizon=timedelta(minutes=5),
        watermark_delay=timedelta(seconds=30),
        left_payload=payload,
        right_payload=payload,
        right_tiebreaker="turn_idx",
    )
    ckpt = tempfile.mkdtemp(prefix="rtsw_asofpay_ck_")
    t0 = time.monotonic()
    q = (
        res.writeStream.foreachBatch(lambda df, bid: df.count())
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return time.monotonic() - t0


def pack_tax(spark, path: str) -> dict[str, float]:
    df = spark.read.parquet(path)
    cols = ["turn_idx", "role", "text", "tool"]
    out = {}

    def t(label, col):
        t0 = time.monotonic()
        df.select(F.xxhash64(col).alias("h")).agg(F.expr("bit_xor(h)")).collect()
        out[label] = round(time.monotonic() - t0, 2)

    t("struct_pass_sec", F.struct(*cols))
    t("to_json_pack_sec", F.to_json(F.struct(*cols)))
    packed = df.select(
        F.to_json(F.struct(*cols)).alias("j")
    ).localCheckpoint(eager=True)
    schema = ", ".join(
        f"{c} {'int' if c == 'turn_idx' else 'string'}" for c in cols
    )
    t0 = time.monotonic()
    packed.select(
        F.xxhash64(F.from_json("j", schema).getField("text")).alias("h")
    ).agg(F.expr("bit_xor(h)")).collect()
    out["from_json_unpack_sec"] = round(time.monotonic() - t0, 2)
    return out


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    mean_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    spark = get_spark(
        app_name="asof-payload-bench", master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    path, n = _corpus(spark, n_convs, mean_turns)
    print(f"corpus: {n} turns, text padded to {PAD} chars")

    for wide in (False, True):
        label = "wide(4 cols, 400-char text)" if wide else "narrow(turn_idx)"
        # warmup + 2 measured runs, best-of (one-sided tenancy noise)
        drain(spark, path, wide)
        best = min(drain(spark, path, wide) for _ in range(2))
        print(f"asof drain {label}: {best:.2f}s  {round(n / best)} turns/s")

    for k, v in pack_tax(spark, path).items():
        print(f"pack tax {k}: {v}")
    spark.stop()


if __name__ == "__main__":
    main()
