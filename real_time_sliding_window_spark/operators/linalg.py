"""Distributed linear algebra over embedding columns.

The 100 TB pattern for second-moment statistics is the same one the
learned IVF quantizer uses (similarity.py::kmeans_centroids): reduce the
corpus to a FIXED-SIZE exact summary inside the plan, collect only those
constants to the driver, do the O(d^3) step there (d is 64, not 10^9),
and broadcast the result back as a map-side expression. Nothing
data-sized ever crosses the driver boundary.

- ``gram_matrix`` — one-pass ``X^T X`` (plus column sums and row count)
  over QUANTIZED int64 vectors: per-partition numpy partials through
  Arrow ``mapInPandas`` (the map-side combine), then one tiny (i, j)
  sum agg — shuffle volume is ``partitions x d(d+1)/2`` rows, independent
  of corpus size. All math is exact int64, so the result is
  bit-identical to the DuckDB oracle's naive per-element replay.
- ``pca_fit`` — covariance from the Gramian constants
  (``C = G/n - mu mu^T``), driver-side ``numpy.linalg.eigh`` on the
  d x d matrix, deterministic sign convention.
- ``pca_project`` — broadcast the (d x k) component matrix back and
  project every vector with one vectorized pandas UDF (Arrow batches,
  no per-row Python).

int64 headroom: |q| <= scale * max|x|; a partition's partial dot is
bounded by rows_per_partition * (scale * max|x|)^2 — at scale=1000,
unit-normalized vectors and 10^7 rows per partition the partial stays
< 10^13, nine bits under the int64 edge; the final sum adds log2(n_parts)
bits. State the bound, don't discover it in production.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_sliding_window_spark.functions import columns as C
from real_time_sliding_window_spark.util import ensure_parallelism


def gram_matrix(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
) -> DataFrame:
    """Exact quantized second-moment summary of an embedding corpus.

    Output rows (all exact int64, 1-based indices):
      - ``(i, j, dot)`` for every upper-triangle pair ``i <= j``:
        ``sum_rows q_i * q_j`` (d(d+1)/2 rows);
      - ``(i, 0, sum_i)`` column sums, encoded at j=0;
      - ``(0, 0, n)`` the row count.

    Everything downstream of the quantize expression is integer, so the
    summary is reproducible bit-for-bit across engines, partitionings
    and retries — the property that lets an incremental pipeline MERGE
    summaries from independent increments (Gramians add).
    """
    q = ensure_parallelism(
        emb.select(C.quantize(vec_col, scale=scale).alias("qv"))
    )

    def partial(batches):
        g = np.zeros((dim, dim), dtype=np.int64)
        s = np.zeros(dim, dtype=np.int64)
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf["qv"].tolist(), dtype=np.int64)
            g += x.T @ x
            s += x.sum(axis=0)
            n += len(x)
        iu, ju = np.triu_indices(dim)
        out = pd.DataFrame(
            {
                "i": np.concatenate([iu + 1, np.arange(1, dim + 1), [0]]),
                "j": np.concatenate([ju + 1, np.zeros(dim, dtype=np.int64), [0]]),
                "dot": np.concatenate([g[iu, ju], s, [n]]),
            }
        )
        yield out.astype({"i": "int64", "j": "int64", "dot": "int64"})

    partials = q.mapInPandas(partial, "i long, j long, dot long")
    return partials.groupBy("i", "j").agg(F.sum("dot").alias("dot"))


def pca_fit(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA from the Gramian constants: returns (components (d x k),
    explained_variance (k,), mean (d,)) in the ORIGINAL float units.

    Collects exactly d(d+1)/2 + d + 1 integer rows — the k-means
    centroid discipline: constants, never data. Eigen decomposition is
    driver-side LAPACK on the d x d covariance; components carry a
    deterministic sign convention (largest-|coordinate| entry positive)
    so runs are comparable even though eigenvectors are sign-ambiguous.
    """
    rows = gram_matrix(emb, id_col, vec_col, dim=dim, scale=scale).collect()
    return pca_from_gram_rows(rows, k=k, dim=dim, scale=scale)


def pca_from_gram_rows(
    rows, k: int = 8, dim: int = 64, scale: int = 1000
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """PCA from already-collected Gramian rows (the ``gram_matrix``
    output shape, or summed partials from the incremental index —
    integer Gramians ADD, so the two are bit-identical inputs)."""
    g = np.zeros((dim, dim), dtype=np.float64)
    s = np.zeros(dim, dtype=np.float64)
    n = 0
    for r in rows:
        if r["i"] == 0:
            n = int(r["dot"])
        elif r["j"] == 0:
            s[r["i"] - 1] = float(r["dot"])
        else:
            g[r["i"] - 1, r["j"] - 1] = float(r["dot"])
            g[r["j"] - 1, r["i"] - 1] = float(r["dot"])
    if n < 2:
        raise ValueError(f"pca_fit: need >= 2 vectors, got {n}")
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order]
    evals = evals[order]
    # sign convention: make the largest-magnitude coordinate positive
    flip = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(comps.shape[1])])
    flip[flip == 0] = 1.0
    comps = comps * flip
    # eigenvectors are unit-norm in any scaling; eigenvalues and mean
    # convert from quantized to original float units
    return comps, evals / float(scale * scale), mu / float(scale)


def pca_project(
    emb: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project every vector onto the fitted components:
    ``z = (x - mean) @ components`` — one vectorized Arrow pandas UDF,
    the component matrix rides the closure as a broadcast-sized constant
    (d x k doubles). Output: (id_col, pca array<double>)."""
    from pyspark.sql.functions import pandas_udf

    w = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)

    def make():
        def proj(v: pd.Series) -> pd.Series:
            x = np.array(v.tolist(), dtype=np.float64)
            z = (x - mu) @ w
            return pd.Series(list(z))

        return pandas_udf(proj, "array<double>")

    return emb.select(F.col(id_col), make()(F.col(vec_col)).alias("pca"))
