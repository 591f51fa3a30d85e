"""Incremental ANN (IVF) index — vector ingest through the exactly-once
sink, queries over the accumulated index (r5).

The batch ANN path (similarity.py::ivf_kmeans_topk) re-assigns the whole
corpus per call; at ingest-heavy scale the assignment should happen ONCE
per vector, when it arrives. This module is the streaming sibling, the
same incremental-index shape as postings / Gramian / CM / near-dup
guard:

- ``run_ivf_index``: per micro-batch, quantize (×1000 int64 — the
  engine-parity doctrine) and assign each vector to its ``spill``
  nearest learned centroids (one Arrow-vectorized map, NO shuffle —
  assignment is embarrassingly parallel), appending
  ``(cid, vec_id, qv)`` rows through the exactly-once sink. The
  quantizer is trained once (kmeans_centroids — content-addressed,
  deterministic) and shared across batches; retraining would silently
  re-shape Voronoi cells mid-index, so it is a parameter, not a
  side effect.
- ``ivf_index_topk``: the ivf_kmeans_topk probe plan pointed at the
  index table instead of a freshly-assigned corpus — queries explode to
  their ``n_probe`` cells and broadcast; the join stays a hash join on
  cid touching ≈ n_probe/n_centroids of the index.

Because per-row assignment is a pure function of (vector, centroids),
the accumulated index is row-identical to a batch build over the same
corpus, and queries return EXACTLY the batch answer — pinned in pytest
(the lossless-index property; sibling of the Gramian equality, not the
HLL estimator caveat). Contract: append-only unique vec_ids (same as
the postings index) — a redelivered BATCH dedups via the sink's commit
marker, but the same vec_id pushed in two different batches indexes
twice (rank lists then repeat it; near-dup ingest should dedup
upstream, e.g. neardup_guard / deduped_stream).

Bucketing note: at production scale write the index through
``BucketedIndexSink`` bucketed on ``cid`` so the probe join prunes
files instead of shuffling the index — the same layout upgrade measured
for the near-dup guard (BENCH/GUARD.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_sliding_window_spark.operators.similarity import (
    _assign_udf,
    _probe_score_rank,
    _quantized,
)


def run_ivf_index(
    stream: DataFrame,
    sink,
    checkpoint: str,
    centroids: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    spill: int = 1,
):
    """Drain the vector stream, appending assigned ``(cid, vec_id, qv)``
    rows per micro-batch (module docstring)."""
    if spill < 1:
        raise ValueError(f"spill must be >= 1, got {spill}")

    def _body(batch: DataFrame, batch_id: int) -> None:
        q = _quantized(batch, id_col, vec_col)
        assign_col = (
            _assign_udf(centroids)("qv")
            if spill == 1
            else F.explode(_assign_udf(centroids, spill)("qv"))
        )
        sink.write_batch(
            q.withColumn("cid", assign_col).select("cid", "vec_id", "qv"),
            batch_id,
        )

    q = (
        stream.writeStream.foreachBatch(_body)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .queryName("ivf-ann-index")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def ivf_index_topk(
    index: DataFrame,
    queries: DataFrame,
    centroids: list[list[int]],
    k: int = 3,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    spill: int = 1,
) -> DataFrame:
    """Top-k over the accumulated index: same output schema and same
    ranking rule as ``ivf_kmeans_topk`` — (query_id, neighbor_id,
    cosine, rank), cosine exact from the stored quantized vectors,
    self-matches excluded. ``spill`` must match the value the index was
    built with (it only controls the duplicate-candidate dedup here).
    The whole query tail is similarity._probe_score_rank — the SAME
    code object the batch path runs, which is what makes the
    exactly-the-batch-answer guarantee structural rather than a
    copy-paste discipline."""
    q = _quantized(queries, id_col, vec_col)
    return _probe_score_rank(
        index, q.select("vec_id", "qv"), centroids, k, n_probe,
        dedup=spill > 1,
    )
