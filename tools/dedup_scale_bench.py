"""10x scale-stress of the dedup family (VERDICT r02 #4).

Round 2 established the *mechanism* that bounds candidate volume (ngram
max_df split-index, simhash bucket-occupancy cap, minhash banding) with
corpus-shape micro-benches. This harness supplies the missing *growth
curves*: the same three candidate generators measured at sf0.1-equivalent
(5k docs), sf0.3 (15k) and sf1 (50k), reporting candidate-pair volume and
wall time so the growth exponent is visible, plus a convergence check of
`neardup_clusters` at the 10x point.

Corpus model (stated assumption, mirrored from how web corpora actually
grow): vocabulary grows with corpus size (Heaps' law) — new sources bring
new tokens, so the df of a TAIL shingle does not scale with n; only HEAD
/boilerplate shingles do, and those are exactly what the caps exclude.
Synthetically: tile the sf0.1 documents, salting each word of tile k with
probability 1/2 (deterministic in (word, position, tile)). Cross-tile
shingle collisions then need all three words unsalted in both tiles
(~1/64 of positions), so tiles share a head of common shingles while ~7/8
of shingle mass is tile-local — df grows slowly, D (distinct shingles)
grows ~linearly. Planted near-dup pairs WITHIN a tile survive salting
(same words at same positions salt identically), so true-pair density is
constant per tile and the honest null hypothesis for candidate growth is
LINEAR.

Run:  python tools/dedup_scale_bench.py [mults...]   (default 1 3 10)
Writes a markdown table to stdout; paste into BENCH/DFCAP.md / SIMHASH.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_sliding_window_spark.functions import columns as C
from real_time_sliding_window_spark.operators import dedup
from real_time_sliding_window_spark.session import get_spark
from real_time_sliding_window_spark.util import ensure_parallelism

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scaled_corpus(spark, mult: int):
    """sf0.1 documents tiled `mult` times with per-tile word salting."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    parts = [base]
    for k in range(1, mult):
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(k * 1_000_000)).alias("doc_id"),
                # salt must be purely [a-z0-9] so the salted word stays ONE
                # token under the tokenizer (an '_x3' suffix would split
                # into the original word + a shared 'x3' token, silently
                # making every cross-tile copy a simhash near-dup)
                F.array_join(
                    F.expr(
                        "transform(split(text, ' '), (w, i) -> "
                        f"if((xxhash64(w, i, {k}) & 1) = 0, w, "
                        f"concat(w, 'q{k}q')))"
                    ),
                    " ",
                ).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    # materialize: the salting transform() is interpreted (CodegenFallback)
    # and must not re-run inside every measured plan
    return ensure_parallelism(out).localCheckpoint(eager=True)


def ngram_candidates(df, max_df: int):
    """Rows the rare-shingle self-join materializes (pre-verify)."""
    words = df.select("doc_id", F.split("text", " ").alias("__w"))
    index = words.select(
        "doc_id",
        F.explode(
            F.array_distinct(C.shingles_from_words("__w", 3))
        ).alias("shingle"),
    ).localCheckpoint(eager=True)
    rare = (
        index.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= max_df)
        .select("shingle")
    )
    rare_index = index.join(rare, "shingle")
    return (
        rare_index.alias("a")
        .join(
            rare_index.alias("b"),
            on=[
                F.col("a.shingle") == F.col("b.shingle"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .count()
    )


def simhash_candidates(fp, max_bucket: int):
    """Band-join pairs (post-distinct, pre-hamming) with the occupancy cap
    applied — mirrors simhash_neardup_pairs' candidate stage."""
    bb, mask = C.SIMHASH_BAND_BITS, C.SIMHASH_BAND_MASK
    bands = fp.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.expr(
                            f"(shiftright(simhash, {bb * b}) & {mask}L)"
                        ).alias("band_val"),
                    )
                    for b in range(C.SIMHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_val")
    cool = (
        bands.groupBy("band_idx", "band_val")
        .agg(F.count(F.lit(1)).alias("__occ"))
        .filter(F.col("__occ") <= max_bucket)
        .select("band_idx", "band_val")
    )
    bands = bands.join(cool, ["band_idx", "band_val"])
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
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )


def minhash_candidates(df):
    """LSH band-bucket pairs (post-distinct) — minhash_lsh_pairs' stage 1."""
    words = df.select("doc_id", F.split("text", " ").alias("__w"))
    shd = words.select(
        "doc_id", F.array_distinct(C.shingles_from_words("__w", 3)).alias("__shd")
    )
    par = df.sparkSession.sparkContext.defaultParallelism
    hashed = shd.select(
        "doc_id", C.hash_shingles28("__shd").alias("__h")
    ).repartition(par, "doc_id")
    banded = hashed.select(
        "doc_id",
        F.posexplode(C.int_minhash_band_keys("__h", 12, 4, 3)).alias(
            "band_idx", "band_key"
        ),
    )
    return (
        banded.alias("a")
        .join(
            banded.alias("b"),
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_key") == F.col("b.band_key"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )


def timed(fn):
    t0 = time.monotonic()
    out = fn()
    return out, round(time.monotonic() - t0, 2)


def main():
    mults = [int(a) for a in sys.argv[1:]] or [1, 3, 10]
    spark = get_spark(
        app_name="dedup-scale-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("| n docs | op | candidates | result pairs | sec |")
    print("|---|---|---|---|---|")
    last_df = None
    for mult in mults:
        df = scaled_corpus(spark, mult)
        n = df.count()
        last_df = df

        cands, _ = timed(lambda: ngram_candidates(df, 128))
        pairs, dt = timed(
            lambda: dedup.ngram_jaccard_pairs(df, min_jaccard=0.5, max_df=128).count()
        )
        print(f"| {n:,} | ngram max_df=128 | {cands:,} | {pairs:,} | {dt} |")

        fp = (
            dedup.simhash_fingerprints(df)
            .select("doc_id", "simhash")
            .localCheckpoint(eager=True)
        )
        fp.count()
        cands, _ = timed(lambda: simhash_candidates(fp, 1024))
        pairs, dt = timed(
            lambda: dedup.simhash_neardup_pairs(df, max_hamming=3).count()
        )
        print(f"| {n:,} | simhash cap=1024 | {cands:,} | {pairs:,} | {dt} |")

        cands, _ = timed(lambda: minhash_candidates(df))
        pairs, dt = timed(
            lambda: dedup.minhash_lsh_pairs(df, min_jaccard=0.2).count()
        )
        print(f"| {n:,} | minhash 4x3 bands | {cands:,} | {pairs:,} | {dt} |")
        sys.stdout.flush()

    # clustering still green at the largest point
    t0 = time.monotonic()
    n_docs = dedup.neardup_clusters(last_df, min_jaccard=0.5, max_df=128).count()
    dt = round(time.monotonic() - t0, 2)
    print(f"\nneardup_clusters @ {last_df.count():,} docs: "
          f"{n_docs:,} rows, converged, {dt}s")
    spark.stop()


if __name__ == "__main__":
    main()
