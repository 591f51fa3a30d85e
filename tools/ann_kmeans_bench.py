"""Recall/scan measurement for the learned-centroid (k-means) IVF path.

VERDICT r02 #1: sign-sketch LSH recall collapses on unstructured
embeddings (0.142 @ 3.5 % scanned) because fixed hyperplanes ignore the
data distribution. This harness measures the REAL Spark operators
(`ivf_kmeans_topk` vs `ivf_topk` vs exact `cosine_topk`) on three corpus
regimes at sf0.1 scale:

- **uniform**: the sf0.1 embeddings as-is (random directions — the
  information-theoretic worst case: neighbors barely closer than random
  points, recall/scan bounded for ANY partition index).
- **structured**: deterministic 50-cluster mixture (seeded numpy) — the
  regime real text/image embedding collections occupy.
- **planted**: sf0.1 embeddings + 5 perturbed copies per query at
  cosine ≈ 0.95 (near-dup regime, LSH's designed case).

Reported per config: recall@10 over 50 queries and the realized scan
fraction (probed cell sizes / corpus / queries).

Usage: python tools/ann_kmeans_bench.py [sf_dir]; prints markdown rows
for BENCH/ANN.md.
"""
from __future__ import annotations

import sys

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from real_time_sliding_window_spark import get_spark  # noqa: E402
from real_time_sliding_window_spark.operators import similarity as S  # noqa: E402

K_AT = 10
N_QUERIES = 50


def recall_and_scan(spark, emb, cfgs):
    queries = list(range(N_QUERIES))
    n = emb.count()
    exact = (
        S.cosine_topk(emb, queries, k=K_AT)
        .select("query_id", "neighbor_id")
        .toPandas()
    )
    exact_sets = exact.groupby("query_id")["neighbor_id"].apply(set)
    rows = []
    q = S._quantized(emb, "vec_id", "embedding").localCheckpoint(eager=True)
    for cfg in cfgs:
        if cfg["method"] == "kmeans":
            n_cent, n_probe, spill = cfg["K"], cfg["probe"], cfg["spill"]
            cents = S.kmeans_centroids(emb, n_centroids=n_cent, n_iter=8)
            approx = (
                S.ivf_kmeans_topk(
                    emb, queries, k=K_AT, n_probe=n_probe,
                    centroids=cents, spill=spill,
                )
                .select("query_id", "neighbor_id")
                .toPandas()
            )
            # realized scan: per query, union of probed cells' spill sizes
            assign_col = (
                S._assign_udf(cents)("qv") if spill == 1
                else F.explode(S._assign_udf(cents, spill)("qv"))
            )
            sizes = {
                r.cid: r.c
                for r in q.withColumn("cid", assign_col)
                .groupBy("cid").agg(F.count(F.lit(1)).alias("c")).collect()
            }
            probe_col = (
                S._assign_udf(cents)("qv") if n_probe == 1
                else F.explode(S._assign_udf(cents, n_probe)("qv"))
            )
            probed = (
                q.filter(F.col("vec_id").isin(queries))
                .select(F.col("vec_id").alias("qid"), probe_col.alias("cid"))
                .collect()
            )
            per_q: dict[int, int] = {}
            for r in probed:
                per_q[r.qid] = per_q.get(r.qid, 0) + sizes.get(r.cid, 0)
            scan = sum(per_q.values()) / (len(per_q) * n)
            tag = f"kmeans K={n_cent} spill={spill} probe={n_probe}"
        else:
            n_planes = cfg["planes"]
            approx = (
                S.ivf_topk(emb, queries, k=K_AT, n_planes=n_planes,
                           multiprobe=True)
                .select("query_id", "neighbor_id")
                .toPandas()
            )
            scan = (n_planes + 1) / (1 << n_planes)
            tag = f"lsh planes={n_planes} multiprobe"
        hits = sum(
            len(set(g) & exact_sets.get(qid, set()))
            for qid, g in approx.groupby("query_id")["neighbor_id"]
        )
        recall = hits / (N_QUERIES * K_AT)
        rows.append((tag, recall, scan))
    return rows


def structured_corpus(spark, n=2000, dim=64, n_clusters=50, noise=0.6):
    """Deterministic clustered corpus (seeded RNG): what real embedding
    collections look like — cluster-structured with within-cluster
    member-member cosine ≈ 1/(1+noise²) ≈ 0.74. The noise DIRECTION is
    normalized so `noise` is the actual perturbation magnitude relative to
    the unit center (a raw N(0, I_d) draw has norm ≈ √d and would swamp
    the center, degenerating back to uniform)."""
    rng = np.random.default_rng(12345)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.integers(0, n_clusters, n)
    g = rng.standard_normal((n, dim))
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    vecs = centers[lab] + noise * g
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    pdf = pd.DataFrame({
        "vec_id": range(n),
        "embedding": [v.astype(np.float32) for v in vecs],
        "label": lab.astype("int32"),
    })
    return spark.createDataFrame(pdf)


def planted_corpus(spark, emb_pdf, n_queries=N_QUERIES, copies=5, eps=0.22):
    """sf embeddings + `copies` perturbed near-dups per query at
    cosine ≈ 0.95 (matches the r02 planted protocol)."""
    rng = np.random.default_rng(7)
    base = [np.asarray(v, np.float64) for v in emb_pdf.embedding]
    rows = list(zip(emb_pdf.vec_id.tolist(), base))
    nxt = max(emb_pdf.vec_id) + 1
    for qid in range(n_queries):
        v = base[qid] / np.linalg.norm(base[qid])
        for _ in range(copies):
            p = v + eps * rng.standard_normal(len(v))
            p /= np.linalg.norm(p)
            rows.append((nxt, p))
            nxt += 1
    pdf = pd.DataFrame({
        "vec_id": [r[0] for r in rows],
        "embedding": [np.asarray(r[1], np.float32) for r in rows],
    })
    return spark.createDataFrame(pdf)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    uniform = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb_pdf = uniform.toPandas()

    km_cfgs = [
        {"method": "kmeans", "K": 64, "spill": 1, "probe": 3},
        {"method": "kmeans", "K": 512, "spill": 3, "probe": 5},
        {"method": "kmeans", "K": 640, "spill": 3, "probe": 6},
        {"method": "lsh", "planes": 8},
    ]
    for name, corpus in [
        ("uniform", uniform),
        ("structured", structured_corpus(spark)),
        ("planted", planted_corpus(spark, emb_pdf)),
    ]:
        print(f"\n### {name} corpus, recall@{K_AT} over {N_QUERIES} queries")
        print("| config | recall | scan frac |")
        print("|---|---|---|")
        for tag, recall, scan in recall_and_scan(spark, corpus, km_cfgs):
            print(f"| {tag} | {recall:.3f} | {scan * 100:.1f} % |")
    spark.stop()


if __name__ == "__main__":
    main()
