"""Similarity search over embedding columns.

Two paths, per the scale doctrine:

- **brute-force top-k** (the correctness baseline): broadcast the (small)
  query set against the full corpus; cosine on quantized int64 vectors so
  results are bit-identical to the DuckDB oracle; top-k via a per-query
  window — the shuffle is only |queries| × |corpus| similarity rows, and at
  scale you'd pre-filter by norm bounds or sketch buckets first.
- **IVF-style bucketed top-k** (the scale path): assign every vector to a
  coarse bucket (sign sketch — same per-row math as dedup's LSH), search
  only the query's bucket (+ optional neighbor probes). Recall < 1 by
  construction; the benchmark compares its overlap against brute force.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from real_time_sliding_window_spark.functions import columns as C
from real_time_sliding_window_spark.util import ensure_parallelism


def _quantized(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    emb = ensure_parallelism(emb)
    return emb.select(F.col(id_col).alias("vec_id"), C.quantize(vec_col).alias("qv"))


def cosine_topk(
    emb: DataFrame,
    query_ids,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors (cosine, quantized) for the given query ids.

    Output: (query_id, neighbor_id, cosine, rank), rank 1..k by
    (cosine desc, neighbor_id) — fully deterministic.
    """
    q = _quantized(emb, id_col, vec_col)
    queries = q.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    pairs = F.broadcast(queries).crossJoin(q).filter(
        F.col("query_id") != F.col("vec_id")
    )
    cos = C.int_dot("q_qv", "qv").cast("double") / (
        C.int_norm("q_qv") * C.int_norm("qv")
    )
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    emb: DataFrame,
    query_ids,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: search only vectors in the query's sign-sketch
    bucket — plus, with ``multiprobe``, the n_planes flip-1-bit neighbor
    buckets. Same output schema as cosine_topk (rank within the probed set).

    Scale/recall knobs (VERDICT r01 #3): ``n_planes`` sets the bucket count
    (2^n_planes — more planes = smaller buckets = less work but lower
    recall per probe); ``multiprobe`` compensates by also probing every
    bucket at hamming distance 1 from the query's (the sketch bits most
    likely to disagree between true neighbors are single flips), searching
    (n_planes+1)/2^n_planes of the corpus instead of 1/2^n_planes. The
    probe fan-out is an exploded broadcast of the (small) query set — the
    corpus is scanned once, hash-joined on its single bucket key. Measured
    recall@k vs the exact baseline: `recall_at_k` / the ann_recall driver
    query (BENCH/ANN.md).
    """
    q = _quantized(emb, id_col, vec_col)
    bucketed = q.withColumn("bucket", C.sign_sketch("qv", n_planes))
    queries = bucketed.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("bucket").alias("q_bucket"),
    )
    if multiprobe:
        probes = [F.col("q_bucket")] + [
            F.col("q_bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
        ]
        queries = queries.select(
            "query_id",
            "q_qv",
            F.explode(F.array(*probes)).alias("q_bucket"),
        )
    pairs = F.broadcast(queries).join(
        bucketed, on=[F.col("q_bucket") == F.col("bucket")]
    ).filter(F.col("query_id") != F.col("vec_id"))
    cos = C.int_dot("q_qv", "qv").cast("double") / (
        C.int_norm("q_qv") * C.int_norm("qv")
    )
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def recall_at_k(
    emb: DataFrame,
    query_ids,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    multiprobe: bool = True,
) -> DataFrame:
    """Per-query recall@k of ivf_topk against the exact cosine_topk baseline.

    Output: (query_id, hits, recall) with recall = |ivf ∩ exact| / k — the
    shippability metric for the approximate path (an ANN operator with
    unmeasured recall is not a pipeline component). Both sides use the same
    quantized cosine, so the comparison is exact."""
    exact = cosine_topk(emb, query_ids, k, id_col, vec_col).select(
        "query_id", "neighbor_id"
    )
    approx = ivf_topk(
        emb, query_ids, k, id_col, vec_col, n_planes, multiprobe
    ).select("query_id", "neighbor_id")
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    all_q = exact.select("query_id").distinct()
    return all_q.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
        (F.coalesce(F.col("hits"), F.lit(0)) / F.lit(k)).cast("double").alias("recall"),
    )
