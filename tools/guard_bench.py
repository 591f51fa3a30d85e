"""Ingest-guard scale bench (VERDICT r04 "what's wrong" #2 + next-round #7).

Round 4 benched the text guard at 1,250-doc micro-batches, where the
~6.5 s/batch constant dominates and the docs/s number reads as a (wrong)
per-doc cost. This harness measures the two things that actually matter
at corpus scale:

1. BULK BATCH — one micro-batch of `mult`x tiled sf0.1 documents
   (default 10x = 50k docs) through `run_neardup_ingest` into an EMPTY
   BucketedIndexSink: the guard's realistic ingest rate when batches are
   sized like a production trigger, amortizing the per-batch constant.

2. PROBE GROWTH (text) — pre-populate the index with `mult` tiles of
   accepted docs, then ingest ONE fresh 5k-doc tile and time that batch
   alone, at index size 1x vs `mult`x, for BOTH sink layouts
   (BucketedIndexSink vs directory-per-batch ExactlyOnceParquetSink).
   The bucketed layout's probe has zero index-side Exchange (plan-pinned
   in test_plans.py); this shows the wall-clock consequence and the
   growth factor of the per-batch cost in index size (≈ linear index
   READ is the floor; the r4 layout also re-SHUFFLED that read).

3. PROBE GROWTH (embedding) — same two-phase shape for
   `run_embedding_ingest` over tiled sf0.1 embeddings (sign-pattern
   tiling preserves within-tile cosines exactly, gen_sf1.py doctrine) at
   index 1x vs `mult`x with the SCALE10X occupancy doctrine applied
   (n_planes ~ log2(n), max_bucket cap) — VERDICT r04 #7: the streaming
   guard's index∪batch occupancy path measured, not extrapolated.

Corpus model: per-tile half-word salting / per-tile sign patterns (see
tools/dedup_scale_bench.py and tools/gen_sf1.py for why cross-tile
copies are NOT near-dups and true-pair density is constant per tile).

Run:  python tools/guard_bench.py [--mult 10] [--scenario bulk|text|emb|all]
Prints one markdown table per scenario; paste into BENCH/GUARD.md.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_sliding_window_spark.session import get_spark
from real_time_sliding_window_spark.streaming.neardup_guard import (
    run_embedding_ingest,
    run_neardup_ingest,
)
from real_time_sliding_window_spark.streaming.sink import (
    BucketedIndexSink,
    ExactlyOnceParquetSink,
)
from real_time_sliding_window_spark.util import ensure_parallelism

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_TMP: list[str] = []


def _tmp(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=f"rtsw_gb_{prefix}_")
    _TMP.append(d)
    return d


def doc_tile(spark, k: int):
    """Tile k of the salted document corpus (tile 0 = the base corpus)."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    if k == 0:
        return base
    return base.select(
        F.concat(F.lit(f"t{k}-"), "doc_id").alias("doc_id"),
        F.array_join(
            F.expr(
                "transform(split(text, ' '), (w, i) -> "
                f"if((xxhash64(w, i, {k}) & 1) = 0, w, concat(w, 'q{k}q')))"
            ),
            " ",
        ).alias("text"),
    )


def emb_tile(spark, k: int):
    """Tile k of the sign-pattern embedding corpus (s_j^2 = 1 keeps all
    within-tile cosines exact — gen_sf1.py doctrine)."""
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    if k == 0:
        return base
    return base.select(
        (F.col("vec_id") + F.lit(k * 1_000_000)).alias("vec_id"),
        F.expr(
            "transform(embedding, (v, j) -> "
            f"v * cast(1 - 2 * (xxhash64(j, {k}) & 1) as float))"
        ).alias("embedding"),
    )


def _feed_files(spark, frames, src: str) -> None:
    """One parquet file per frame = one micro-batch each under
    maxFilesPerTrigger=1."""
    for i, df in enumerate(frames):
        tmp = os.path.join(src, f"_tmp{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        for name in os.listdir(tmp):
            if name.endswith(".parquet"):
                os.rename(
                    os.path.join(tmp, name),
                    os.path.join(src, f"drop_{i:03d}_{name}"),
                )
        shutil.rmtree(tmp)


def bench_bulk(spark, mult: int) -> dict:
    """Scenario 1: one `mult`x-corpus batch into an empty bucketed index."""
    parts = [doc_tile(spark, k) for k in range(mult)]
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionAll(p)
    corpus = ensure_parallelism(corpus).localCheckpoint(eager=True)
    n = corpus.count()

    src = _tmp("bulk_src")
    corpus.write.mode("overwrite").parquet(src)  # one trigger: all files
    idx = BucketedIndexSink(
        _tmp("bulk_idx"), "gb_bulk_idx", ["band_idx", "band_val"],
        n_buckets=32,
    )
    stream = spark.readStream.schema("doc_id string, text string").parquet(src)
    t0 = time.monotonic()
    run_neardup_ingest(stream, idx, _tmp("bulk_ck"), max_bucket=1024)
    dt = time.monotonic() - t0
    accepted = idx.read_committed(spark).select("doc_id").distinct().count()
    spark.sql("DROP TABLE IF EXISTS gb_bulk_idx")
    return {
        "docs": n,
        "batches": len(idx.committed_batches()),
        "wall_s": round(dt, 2),
        "docs_per_sec": round(n / dt),
        "accepted": accepted,
    }


def bench_text_growth(spark, mult: int) -> list[dict]:
    """Scenario 2: fresh-tile probe wall at index size 1x vs `mult`x,
    both sink layouts."""
    rows = []
    fresh = doc_tile(spark, 99).localCheckpoint(eager=True)
    n_fresh = fresh.count()
    for layout in ("bucketed", "dirs"):
        for m in (1, mult):
            src = _tmp(f"tg_{layout}_{m}_src")
            ck = _tmp(f"tg_{layout}_{m}_ck")
            if layout == "bucketed":
                tbl = f"gb_tg_{m}"
                idx = BucketedIndexSink(
                    _tmp(f"tg_{layout}_{m}_idx"), tbl,
                    ["band_idx", "band_val"], n_buckets=32,
                )
            else:
                idx = ExactlyOnceParquetSink(
                    _tmp(f"tg_{layout}_{m}_idx"), track_lineage=False
                )
            # phase 1: pre-populate index with m tiles (one batch each)
            _feed_files(spark, [doc_tile(spark, k) for k in range(m)], src)
            stream = (
                spark.readStream.schema("doc_id string, text string")
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
            )
            run_neardup_ingest(stream, idx, ck, max_bucket=1024)
            idx_rows = idx.read_committed(spark).count()
            # phase 2: ONE fresh batch, timed alone
            _feed_files(spark, [fresh], src)
            stream = (
                spark.readStream.schema("doc_id string, text string")
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
            )
            t0 = time.monotonic()
            run_neardup_ingest(stream, idx, ck, max_bucket=1024)
            dt = time.monotonic() - t0
            rows.append({
                "layout": layout,
                "index_tiles": m,
                "index_rows": idx_rows,
                "probe_docs": n_fresh,
                "probe_wall_s": round(dt, 2),
            })
            if layout == "bucketed":
                spark.sql(f"DROP TABLE IF EXISTS gb_tg_{m}")
    return rows


def bench_emb_growth(spark, mult: int) -> list[dict]:
    """Scenario 3: embedding-guard fresh-batch wall at index 1x vs
    `mult`x (occupancy doctrine: n_planes ~ log2(n), hot-bucket cap)."""
    rows = []
    fresh = emb_tile(spark, 99).localCheckpoint(eager=True)
    n_fresh = fresh.count()
    schema = "vec_id long, embedding array<float>"
    for m in (1, mult):
        n_total = 2000 * (m + 1)
        n_planes = max(8, int(n_total).bit_length())  # ~log2(n)
        src = _tmp(f"eg_{m}_src")
        ck = _tmp(f"eg_{m}_ck")
        idx = ExactlyOnceParquetSink(
            _tmp(f"eg_{m}_idx"), track_lineage=False
        )
        _feed_files(spark, [emb_tile(spark, k) for k in range(m)], src)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        run_embedding_ingest(
            stream, idx, ck, min_cosine=0.9, n_planes=n_planes,
            max_bucket=256,
        )
        idx_rows = idx.read_committed(spark).count()
        _feed_files(spark, [fresh], src)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        t0 = time.monotonic()
        run_embedding_ingest(
            stream, idx, ck, min_cosine=0.9, n_planes=n_planes,
            max_bucket=256,
        )
        dt = time.monotonic() - t0
        rows.append({
            "index_tiles": m,
            "index_rows": idx_rows,
            "n_planes": n_planes,
            "probe_vecs": n_fresh,
            "probe_wall_s": round(dt, 2),
        })
    return rows


def bench_occupancy(spark, sizes=(200_000, 2_000_000)) -> list[dict]:
    """Scenario 4 (r5): the occupancy increment log vs the O(index)
    re-aggregation, measured where the index term is visible. The index
    is pre-populated DIRECTLY with synthetic band rows (no guard runs —
    the module-level ingest_text_batch makes single-batch timing
    possible), then ONE 5k-doc batch is timed with max_bucket set, with
    and without the increment log."""
    from real_time_sliding_window_spark.operators.dedup import simhash_bands
    from real_time_sliding_window_spark.streaming.neardup_guard import (
        ingest_text_batch,
    )

    rows = []
    batch = doc_tile(spark, 0).localCheckpoint(eager=True)
    for n_rows in sizes:
        n_docs = n_rows // 4
        fp = spark.range(n_docs).select(
            F.concat(F.lit("syn"), F.col("id")).alias("doc_id"),
            F.xxhash64("id").bitwiseAND(F.lit((1 << 60) - 1)).alias(
                "simhash"
            ),
        )
        bands = simhash_bands(fp).localCheckpoint(eager=True)
        idx = ExactlyOnceParquetSink(_tmp(f"occ_{n_rows}_idx"),
                                     track_lineage=False)
        occ = ExactlyOnceParquetSink(_tmp(f"occ_{n_rows}_occ"),
                                     track_lineage=False)
        idx.write_batch(bands, 0)
        occ.write_batch(
            bands.groupBy("band_idx", "band_val").agg(
                F.count(F.lit(1)).alias("n")
            ),
            0,
        )
        def _undo_batch1():
            # remove batch 1 so each rep decides against the same index
            for sink in (idx, occ):
                m = os.path.join(sink.commit_dir, "1.json")
                d = os.path.join(sink.data_dir, "batch_id=1")
                if os.path.exists(m):
                    os.remove(m)
                if os.path.exists(d):
                    shutil.rmtree(d)

        for use_occ in (False, True):
            walls = []
            for rep in range(2):
                t0 = time.monotonic()
                ingest_text_batch(
                    spark, batch, 1, idx, max_bucket=1024,
                    occupancy_sink=occ if use_occ else None,
                )
                walls.append(time.monotonic() - t0)
                _undo_batch1()
            rows.append({
                "index_rows": n_rows,
                "occupancy_log": use_occ,
                "probe_docs": batch.count(),
                "best_wall_s": round(min(walls), 2),
                "per_rep_s": "/".join(f"{w:.2f}" for w in walls),
            })
    return rows


def _table(rows: list[dict]) -> str:
    cols = list(rows[0])
    out = ["| " + " | ".join(cols) + " |",
           "|" + "|".join("---" for _ in cols) + "|"]
    for r in rows:
        out.append("| " + " | ".join(str(r[c]) for c in cols) + " |")
    return "\n".join(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--scenario", default="all",
                    choices=["bulk", "text", "emb", "occ", "all"])
    args = ap.parse_args()
    spark = get_spark(app_name="guard-bench")
    try:
        if args.scenario in ("bulk", "all"):
            print(f"\n## bulk batch ({args.mult}x corpus, empty index)\n")
            print(_table([bench_bulk(spark, args.mult)]))
        if args.scenario in ("text", "all"):
            print(f"\n## text probe growth (index 1x vs {args.mult}x)\n")
            print(_table(bench_text_growth(spark, args.mult)))
        if args.scenario in ("emb", "all"):
            print(f"\n## embedding probe growth (index 1x vs {args.mult}x)\n")
            print(_table(bench_emb_growth(spark, args.mult)))
        if args.scenario in ("occ", "all"):
            print("\n## occupancy log vs index re-agg (one timed batch)\n")
            print(_table(bench_occupancy(spark)))
    finally:
        spark.stop()
        for d in _TMP:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
