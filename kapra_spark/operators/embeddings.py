"""Distributed PCA over an embedding column (dimensionality reduction
for the similarity/ANN stack).

Published method (Pearson 1901 / Hotelling 1933; the one-pass
moment-accumulation form is standard): PCA needs only the Gram matrix
X^T X, the column sum, and the row count — all SUMS, so they
distribute as map-side partials with a tiny fixed-size merge:

1. **One corpus pass** (`moment_sums`): each Arrow batch emits one
   partial (n, sum_vec[d], xtx[d*d]) row; partials are exploded to
   (idx, value) and summed with a hash aggregate. The shuffle carries
   O(batches * d^2) scalars — for d=64 that is 4 KB per batch — and
   the corpus vectors themselves never shuffle. At 10^9+ rows this is
   the same plan shape at any scale; only d matters.
2. **Driver eigendecomposition** (`pca_train`): covariance
   (XtX - n*mean*mean^T)/(n-1) is d x d (64x64 here) — metadata-sized
   at any corpus size. `numpy.linalg.eigh`, top-k components, signs
   canonicalized (largest-|coef| element positive) so results are
   deterministic and independent of LAPACK sign freedom.
3. **Projection** (`pca_project`): narrow mapInPandas matmul with the
   (k x d) component matrix in the closure — zero shuffle, the same
   Arrow-batch matmul shape as the LSH/IVF paths in similarity.py.

Float caveat, stated: partial sums reduce in partition order, so
covariance entries can differ across runs by ~1e-12 relative; all
driver-facing checks use tolerances, never exact float equality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MOMENT_SCHEMA = T.StructType([
    T.StructField("idx", T.IntegerType(), False),
    T.StructField("val", T.DoubleType(), False),
])


def moment_sums(df: DataFrame, vec_col: str = "embedding",
                dim: int | None = None) -> tuple[int, np.ndarray, np.ndarray]:
    """One pass over the corpus -> (n, sum_vec[d], xtx[d, d]).
    Layout of the summed index space: 0 = count, 1..d = column sums,
    d+1.. = row-major X^T X."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    d = dim

    def fn(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            if pdf[vec_col].isnull().any():
                raise ValueError(
                    f"moment_sums: null {vec_col!r} vector in input batch")
            x = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            part = np.concatenate(
                [[float(len(x))], x.sum(axis=0), (x.T @ x).ravel()])
            yield pd.DataFrame({"idx": np.arange(part.size, dtype=np.int32),
                                "val": part})

    sums = (df.select(vec_col).mapInPandas(fn, _MOMENT_SCHEMA)
            .groupBy("idx").agg(F.sum("val").alias("val"))
            .collect())
    flat = np.zeros(1 + d + d * d)
    for r in sums:
        flat[r["idx"]] = r["val"]
    n = int(round(flat[0]))
    return n, flat[1:1 + d], flat[1 + d:].reshape(d, d)


def pca_train(df: DataFrame, vec_col: str = "embedding",
              k: int = 8) -> dict:
    """Fit PCA: returns {mean[d], components[k, d] (rows orthonormal,
    variance-descending), explained_variance[k], total_variance, n}."""
    n, s, xtx = moment_sums(df, vec_col)
    if n < 2:
        raise ValueError(f"PCA needs >= 2 rows, got {n}")
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)      # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T               # (k, d)
    # canonical sign: largest-|coef| element of each component > 0
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {"mean": mean, "components": comps,
            "explained_variance": np.maximum(evals[order], 0.0),
            "total_variance": float(np.maximum(evals, 0.0).sum()),
            "n": n}


def pca_project(df: DataFrame, model: dict,
                vec_col: str = "embedding",
                out_col: str = "pca") -> DataFrame:
    """Project embeddings onto the fitted components: narrow
    mapInPandas matmul, all other columns passed through."""
    mean = model["mean"].astype(np.float64)
    comps = model["components"].astype(np.float64)   # (k, d)
    cols = df.columns
    schema = T.StructType(df.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.FloatType()), False)])

    def fn(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            if pdf[vec_col].isnull().any():
                raise ValueError(
                    f"pca_project: null {vec_col!r} vector in input batch")
            x = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            proj = (x - mean) @ comps.T
            out = pdf[cols].copy()
            out[out_col] = list(proj.astype(np.float32))
            yield out

    return df.mapInPandas(fn, schema)
