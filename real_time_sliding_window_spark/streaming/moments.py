"""Incremental second-moment (Gramian) index — exact integer partials
through the exactly-once sink (r5).

The HLL index (streaming/sketches.py) trades exactness for a fixed-size
mergeable summary; Gramians need no such trade: they are ALREADY a
fixed-size summary and they are EXACTLY additive — for disjoint corpora
``gram(A ∪ B) = gram(A) + gram(B)`` pointwise in int64. So the
incremental index is lossless: each micro-batch appends its
d(d+1)/2 + d + 1 integer partial rows (operators/linalg.py::gram_matrix
run batch-locally inside foreachBatch — no streaming state at all), and
the query side sums. PCA over a growing embedding corpus becomes
``pca_from_gram_rows(sum of partials)`` — bit-identical to refitting
over the full corpus, without ever rescanning historical vectors.

Contracts (same shape as retrieval.run_postings_index):

- redelivered BATCHES are dropped by the sink's exactly-once marker, so
  crash/retry never double-counts;
- the same vec_id arriving in two DIFFERENT batches double-counts —
  the index assumes append-only unique ids; run it downstream of
  `deduped_stream` or the ingest guards, like the postings index;
- retention/rewrite: any prefix of batches may be compacted into one
  summed partial (gram_totals over that prefix, re-appended) with NO
  loss — exact integers, unlike the HLL estimator-choice caveat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_sliding_window_spark.operators.linalg import gram_matrix


def run_gram_index(
    stream: DataFrame,
    sink,
    checkpoint: str,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
):
    """Drain the stream, appending one batch-local Gramian partial
    (i, j, dot) per micro-batch to ``sink``."""

    def _body(batch: DataFrame, batch_id: int) -> None:
        sink.write_batch(
            gram_matrix(batch, vec_col=vec_col, dim=dim, scale=scale),
            batch_id,
        )

    q = (
        stream.writeStream.foreachBatch(_body)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .queryName("gram-index")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def gram_totals(index: DataFrame) -> DataFrame:
    """Query side: sum the per-batch partials to the corpus Gramian —
    one constants-sized agg (rows ∝ batches·d², never corpus size).
    Feed ``.collect()`` of this to ``linalg.pca_from_gram_rows``."""
    return index.groupBy("i", "j").agg(F.sum("dot").alias("dot"))
