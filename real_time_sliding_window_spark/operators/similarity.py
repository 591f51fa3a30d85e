"""Similarity search over embedding columns.

Three paths, per the scale doctrine:

- **brute-force top-k** (the correctness baseline): broadcast the (small)
  query set against the full corpus; cosine on quantized int64 vectors so
  results are bit-identical to the DuckDB oracle; top-k via a per-query
  window — the shuffle is only |queries| × |corpus| similarity rows, and at
  scale you'd pre-filter by norm bounds or sketch buckets first.
- **IVF-style bucketed top-k** (sign-sketch LSH): assign every vector to a
  coarse bucket (same per-row math as dedup's LSH), search only the
  query's bucket (+ flip-1-bit probes). Near-dup regimes only — measured
  recall collapses on unstructured embeddings (BENCH/ANN.md).
- **IVF with a LEARNED coarse quantizer** (integer k-means): Voronoi cells
  adapt to the actual density, so recall holds on general distributions.
  All k-means math is exact int64 → the quantizer is deterministic and
  cross-engine reproducible (the driver oracle replays the full Lloyd's
  iteration as a DuckDB recursive CTE and the value-hash gate passes).
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


def _assign_udf(centroids, n_probe: int = 1):
    """Vectorized nearest-centroid assignment (exact int64 math).

    Returns a pandas UDF mapping a quantized vector column to its nearest
    centroid id (``n_probe == 1``, int) or its ``n_probe`` nearest centroid
    ids (array<int>, by (distance, cid) ascending). Exactness: scores are
    −2·v·c + |c|² in int64 (same argmin as squared L2 — |v|² is constant
    per row), numpy integer matmul is exact, and argmin/stable argsort
    break ties toward the LOWEST cid — the same tie rule as the DuckDB
    oracle's min_by(cid, dist*K + cid). The JVM-side alternative (k
    interpreted `aggregate` lambdas per row) is 10-50× slower — this is
    the sanctioned Arrow-vectorized escape, not a row-at-a-time UDF.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cmat = np.asarray(centroids, dtype=np.int64)
    cnorm = (cmat * cmat).sum(axis=1)

    # plain-function + explicit wrap: `from __future__ import annotations`
    # stringifies type hints, which pandas_udf's inference can't resolve
    if n_probe == 1:
        def assign(qv):
            mat = np.stack(qv.to_numpy()).astype(np.int64, copy=False)
            scores = mat @ (-2 * cmat.T) + cnorm[None, :]
            return pd.Series(scores.argmin(axis=1).astype(np.int32))

        return pandas_udf(assign, "int")

    def probe(qv):
        mat = np.stack(qv.to_numpy()).astype(np.int64, copy=False)
        scores = mat @ (-2 * cmat.T) + cnorm[None, :]
        near = np.argsort(scores, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(near.astype(np.int32)))

    return pandas_udf(probe, "array<int>")


def _kmeans_rounds(q: DataFrame, n_centroids: int, n_iter: int,
                   require_convergence: bool) -> list[list[int]]:
    """Lloyd's iteration over a materialized quantized-vector DataFrame.

    All arithmetic is int64 so every round is deterministic and
    cross-engine exact (see kmeans_centroids). Each round is one corpus
    pass: Arrow-vectorized assignment, then posexplode + map-side partial
    sum per (cid, dim) — the collect is k×d aggregate rows (centroid
    literals for the next round's broadcast closure), never data rows, so
    plan depth stays constant across rounds (no lineage growth, nothing to
    checkpoint)."""
    seeds = (
        q.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(n_centroids)
        .collect()
    )
    cents = [list(r.qv) for r in seeds]
    for _ in range(n_iter):
        assigned = q.withColumn("cid", _assign_udf(cents)("qv"))
        rows = (
            assigned.select("cid", F.posexplode("qv").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("c"))
            .select(
                "cid",
                "pos",
                F.floor(F.col("s").cast("double") / F.col("c"))
                .cast("long")
                .alias("m"),
            )
            .collect()
        )
        nxt = [list(c) for c in cents]  # empty cluster keeps its centroid
        for r in rows:
            nxt[r.cid][r.pos] = r.m
        if nxt == cents:
            return cents  # exact fixpoint: further rounds are identity
        cents = nxt
    if require_convergence:
        raise RuntimeError(
            f"k-means did not reach a fixpoint in {n_iter} rounds "
            f"(k={n_centroids}); raise n_iter — a half-trained quantizer "
            "silently degrades recall."
        )
    return cents


def _probe_score_rank(
    assigned: DataFrame,
    queries: DataFrame,
    centroids: list[list[int]],
    k: int,
    n_probe: int,
    dedup: bool,
) -> DataFrame:
    """Shared IVF query tail — used by BOTH ivf_kmeans_topk (batch) and
    streaming/ann_index.ivf_index_topk, whose pinned guarantee is that
    index queries return EXACTLY the batch answer: one definition means
    the probe explode, the int-cosine, the spill dedup, and the
    (cosine desc, neighbor_id asc) tie-break can never drift apart.
    ``assigned``: (cid, vec_id, qv) rows; ``queries``: (vec_id, qv)."""
    probe_col = (
        _assign_udf(centroids)("qv")
        if n_probe == 1
        else F.explode(_assign_udf(centroids, n_probe)("qv"))
    )
    qs = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        probe_col.alias("cid"),
    )
    pairs = F.broadcast(qs).join(assigned, "cid").filter(
        F.col("query_id") != F.col("vec_id")
    )
    cos = C.int_dot("q_qv", "qv").cast("double") / (
        C.int_norm("q_qv") * C.int_norm("qv")
    )
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
    )
    if dedup:
        # a neighbor assigned to several probed cells appears once per
        # cell — dedup before ranking or top-k would repeat it
        scored = scored.dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def kmeans_centroids(
    emb: DataFrame,
    n_centroids: int = 8,
    n_iter: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    require_convergence: bool = False,
) -> list[list[int]]:
    """Learned coarse quantizer: integer k-means over quantized vectors.

    Why integers: float k-means is order-dependent (summation order changes
    the means), so no two engines — or two runs over different partition
    layouts — agree. Here every step is exact int64: quantize(×1000),
    squared-L2 argmin with ties to the lowest cid, per-dimension
    floor(sum/count) update. The same corpus always yields the SAME
    centroids, on Spark, numpy, or DuckDB (the driver oracle replays the
    whole iteration as a recursive CTE and the hash gate passes).

    Seeding is content-addressed (first k vectors by md5(vec_id) order) —
    deterministic without an RNG, stable under ingest order and
    partitioning, and effectively a uniform random draw from the corpus.

    Early exit on an exact fixpoint is parity-safe: once update(C) == C,
    every further round is the identity, so stopping early equals running
    all ``n_iter`` rounds (which is what the oracle does).

    At 100 TB: train on a content-addressed hash sample
    (sampling.hash_bucket) — centroid quality needs ~1000·k vectors, not
    the corpus — then assign the full corpus in the one pass ivf does
    anyway. Each training round is one map pass + a k×d-row aggregate.
    """
    q = _quantized(emb, id_col, vec_col).localCheckpoint(eager=True)
    return _kmeans_rounds(q, n_centroids, n_iter, require_convergence)


def ivf_kmeans_topk(
    emb: DataFrame,
    query_ids,
    k: int = 3,
    n_centroids: int = 8,
    n_iter: int = 4,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[int]] | None = None,
    spill: int = 1,
) -> DataFrame:
    """IVF top-k with a LEARNED coarse quantizer (k-means centroids), the
    general-distribution ANN path sign-sketch LSH cannot be (measured LSH
    boundary: recall 0.142 @ 3.5 % scan on unstructured embeddings,
    BENCH/ANN.md r02). Same output schema as cosine_topk/ivf_topk:
    (query_id, neighbor_id, cosine, rank).

    Plan shape: corpus pass assigns each vector to its nearest centroid
    (one Arrow-vectorized map, no shuffle); queries explode to their
    ``n_probe`` nearest centroids and broadcast; the join is a hash join on
    cid, so the corpus fraction scanned ≈ n_probe/n_centroids (cluster-size
    weighted). recall/scan tradeoff is measured in BENCH/ANN.md — the
    learned quantizer reaches the recall sign-sketch buckets cannot,
    because Voronoi cells adapt to the actual density instead of slicing
    the sphere with fixed hyperplanes.

    ``centroids``: pass a pre-trained quantizer (from kmeans_centroids) to
    skip training — production reuses one quantizer across queries/batches.

    ``spill``: assign each CORPUS vector to its ``spill`` nearest cells
    (overlapping cells — the standard IVF recall fixer for points near
    Voronoi boundaries, where the true neighbor of a boundary query lives
    in the adjacent cell). Index size and scan cost grow ×spill; recall at
    a fixed scan budget improves because boundary losses dominate misses
    (measured frontier in BENCH/ANN.md). At 100 TB spill multiplies
    storage — keep it ≤ 3 and prefer raising n_probe first when the index
    is disk-bound.
    """
    q = _quantized(emb, id_col, vec_col).localCheckpoint(eager=True)
    if centroids is None:
        centroids = _kmeans_rounds(q, n_centroids, n_iter, False)
    assign_col = (
        _assign_udf(centroids)("qv")
        if spill == 1
        else F.explode(_assign_udf(centroids, spill)("qv"))
    )
    assigned = q.withColumn("cid", assign_col).select("cid", "vec_id", "qv")
    queries = q.filter(F.col("vec_id").isin(list(query_ids))).select(
        "vec_id", "qv"
    )
    return _probe_score_rank(
        assigned, queries, centroids, k, n_probe, dedup=spill > 1
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


def knn_graph(
    emb: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    multiprobe: bool = True,
    max_bucket: int | None = None,
    mutual: bool = False,
) -> DataFrame:
    """Approximate k-NN graph over the WHOLE corpus: every vector gets its
    top-k cosine neighbors among its LSH-bucket candidates (sign-sketch
    buckets + flip-1-bit multi-probe — the same candidate generator as
    dedup.embedding_neardup_pairs, so its measured recall curves and the
    max_bucket occupancy doctrine carry over unchanged).

    This is ivf_topk with EVERY vector as a query — which is exactly why
    it cannot reuse ivf_topk's plan: broadcasting an all-rows "query set"
    is a broadcast of the corpus. Here both sides stay distributed and
    the probe join is a plain shuffled equi-join on the bucket key; scoring
    is exact quantized-int cosine, then one row_number window per source.
    An EXACT graph is inherently all-pairs (O(n²)) and has no place at
    100 TB; candidate volume here is linear: (n_planes+1)·n·occupancy,
    bounded by ``max_bucket`` when buckets run hot (set it ∝ corpus
    growth, or raise n_planes with log2(n) — BENCH/SCALE10X.md doctrine).

    ``mutual=True`` keeps only edges whose reverse edge is also in the
    graph (the mutual-kNN graph used for clustering/visualization
    pruning) — one extra self-join on the (src, dst) edge key.

    Output: (src, dst, cosine, rank), rank 1..k per src by (cosine desc,
    dst) — deterministic; a vector in an empty probe neighborhood simply
    emits fewer than k edges.
    """
    q = _quantized(emb, id_col, vec_col)
    b = q.withColumn("bucket", C.sign_sketch("qv", n_planes))
    right = b
    if max_bucket is not None:
        # cap the join-TARGET side only; every vector still probes OUT
        # (embedding_neardup_pairs doctrine: never filter the id universe)
        from real_time_sliding_window_spark.operators.dedup import cool_buckets

        right = b.join(cool_buckets(b, ["bucket"], max_bucket), "bucket")
    left = b
    if multiprobe:
        probes = [F.col("bucket")] + [
            F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
        ]
        left = b.select(
            "vec_id", "qv", F.explode(F.array(*probes)).alias("bucket")
        )
    pairs = (
        left.alias("a")
        .join(
            right.alias("b"),
            on=[
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.vec_id") != F.col("b.vec_id"),
            ],
        )
        .select(
            F.col("a.vec_id").alias("src"),
            F.col("b.vec_id").alias("dst"),
            (
                C.int_dot("a.qv", "b.qv").cast("double")
                / (C.int_norm("a.qv") * C.int_norm("b.qv"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.col("cosine").desc(), F.col("dst").asc())
    edges = pairs.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    if mutual:
        rev = edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
        edges = edges.join(rev, ["src", "dst"], "left_semi")
    return edges
