"""Candidate-volume evidence for the simhash banding widening.

Isolates the banding variable: compute the SAME 60-bit fingerprints for a
corpus, then count the candidate pairs (band-join rows, pre-hamming-filter,
post-distinct) under

  - old scheme: 4 bands x 8 bits  (256 keys/band   — round-1 layout)
  - new scheme: 4 bands x 15 bits (32,768 keys/band — round-2 layout)

at increasing corpus sizes (sf0.1 documents tiled with perturbed copies so
fingerprints stay realistic but the corpus grows). A banded self-join's
expected volume is Σ_buckets n_b² / 2 — key space × 128 should cut
candidates by ~two orders of magnitude, and the growth exponent (log2 of
the ratio per corpus doubling) shows whether the scheme is saturating
(exponent → 2 means the band keys stopped discriminating).

Run: python tools/simhash_bench.py   (writes the BENCH/SIMHASH.md table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_sliding_window_spark.operators.dedup import simhash_fingerprints
from real_time_sliding_window_spark.session import get_spark


def tiled_corpus(spark, tiles: int):
    """sf0.1 documents tiled `tiles` times; copy k gets token 'vKK' appended
    so fingerprints are near-but-not-identical across tiles."""
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    parts = [
        base.select(
            (F.col("doc_id") + F.lit(k * 1_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" variant token v{k}")).alias("text"),
        )
        for k in range(tiles)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def candidates(fp, band_bits: int, n_bands: int = 4):
    mask = (1 << band_bits) - 1
    bands = fp.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.expr(
                            f"(shiftright(simhash, {band_bits * b}) & {mask}L)"
                        ).alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_val")
    return (
        bands.alias("a")
        .join(
            bands.alias("b"),
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
        .count()
    )


def main():
    spark = get_spark(app_name="simhash-bench", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    print("| n docs | old 8-bit bands: pairs | sec | new 15-bit bands: pairs | sec |")
    print("|---|---|---|---|---|")
    for tiles in (1, 2, 4, 8):
        df = tiled_corpus(spark, tiles)
        fp = (
            simhashes := simhash_fingerprints(df).select("doc_id", "simhash")
        ).localCheckpoint(eager=True)
        n = fp.count()
        row = [f"| {n} "]
        for bits in (8, 15):
            t0 = time.monotonic()
            c = candidates(fp, bits)
            dt = round(time.monotonic() - t0, 2)
            row.append(f"| {c:,} | {dt} ")
        print("".join(row) + "|")
    spark.stop()


if __name__ == "__main__":
    main()
