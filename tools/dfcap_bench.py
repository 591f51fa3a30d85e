"""Measure the ngram-jaccard df-cap on a stopword-heavy corpus.

The hazard (VERDICT r01 #1): the inverted-index self-join generates
df·(df−1)/2 candidate rows per shingle — boilerplate shared by all n docs
makes candidate generation O(n²) regardless of how few real near-dups
exist. This harness builds exactly that corpus: every doc carries the same
boilerplate sentence (shared shingles with df = n) plus a mostly-unique
tail (a small fraction are true near-dups), then measures candidate-pair
count and wall time cap-free vs df-capped at increasing n.

Expected shape: cap-free candidates grow ~n² (the boilerplate term);
capped candidates grow ~linearly (only true near-dup pairs + rare-shingle
collisions). Run:  python tools/dfcap_bench.py [sizes...]
Writes a markdown table to stdout; paste into BENCH/DFCAP.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F

from real_time_sliding_window_spark.functions import columns as C
from real_time_sliding_window_spark.operators import dedup
from real_time_sliding_window_spark.session import get_spark
from real_time_sliding_window_spark.util import ensure_parallelism

BOILER = (
    "this document is provided as is without warranty of any kind either "
    "express or implied including but not limited to the implied warranties"
)


def corpus(spark, n: int):
    """n docs: identical boilerplate + unique tail; every 20th doc is a
    near-dup of its predecessor (same tail, one word changed)."""
    rows = []
    for i in range(n):
        if i % 20 == 19:
            tail = f"payload item {i - 1} value alpha beta gamma delta CHANGED"
        else:
            tail = f"payload item {i} value alpha beta gamma delta epsilon"
        rows.append({"doc_id": i, "text": f"{BOILER} {tail}"})
    return spark.createDataFrame(pd.DataFrame(rows)).repartition(16).cache()


def candidate_count(df, max_df):
    """Rows the candidate self-join materializes (pre-verify, pre-distinct)."""
    words = ensure_parallelism(
        df.select("doc_id", F.split("text", " ").alias("__w"))
    )
    base = words.select(
        "doc_id", F.array_distinct(C.shingles_from_words("__w", 3)).alias("__sh")
    )
    index = base.select("doc_id", F.explode("__sh").alias("shingle"))
    if max_df is not None:
        rare = (
            index.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("shingle")
        )
        index = index.join(rare, "shingle")
    return (
        index.alias("a")
        .join(
            index.alias("b"),
            on=[
                F.col("a.shingle") == F.col("b.shingle"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .count()
    )


def run_mode(df, max_df):
    t0 = time.monotonic()
    n_pairs = dedup.ngram_jaccard_pairs(
        df, min_jaccard=0.5, max_df=max_df
    ).count()
    dt = time.monotonic() - t0
    return n_pairs, round(dt, 2)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [2000, 4000, 8000]
    spark = get_spark(app_name="dfcap-bench", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    print("| n docs | mode | candidate join rows | result pairs | sec |")
    print("|---|---|---|---|---|")
    for n in sizes:
        df = corpus(spark, n)
        df.count()
        for label, cap in (("cap-free", None), ("max_df=64", 64)):
            if cap is None and n > 8000:
                print(f"| {n} | {label} | (skipped — quadratic) | | |")
                continue
            cands = candidate_count(df, cap)
            pairs, dt = run_mode(df, cap)
            print(f"| {n} | {label} | {cands:,} | {pairs} | {dt} |")
        df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
