"""Embedding-matrix preprocessing: covariance, PCA, whitening.

The standard preprocessing in front of large-scale embedding pipelines
(IVF/PQ ANN indexing, SemDeDup-style clustering): estimate the corpus
covariance, rotate onto principal axes, and rescale so components have
unit variance — decorrelated inputs make k-means cells rounder and
quantizers more accurate (Jegou et al. 2011 apply exactly this before
product quantization).

100 TB shape: the covariance is a one-pass partial aggregate — each Arrow
batch contributes its local ``(n, Σx, ΣxᵀX)`` via ``mapInPandas`` (numpy
does the dim×dim outer-product sum batch-locally, so nothing row-sized
ever shuffles), the partials reduce in Spark with a (cell-index → sum)
hash aggregate whose key space is dim + dim² cells, and only the summed
dim×dim grid reaches the driver. The eigendecomposition is a driver-side
``numpy.linalg.eigh`` of a dim×dim matrix (dim ≤ a few thousand — never
data-sized), and the projection back over the rows is one more Arrow map
with the k×dim matrix captured in the closure (broadcast-tiny).

No counterpart exists in the reference (its ML step is a driver-side
sklearn fit, ``airflow/dags/realestate_pipeline.py:207-229``); this is
north-star similarity-search scope (SURVEY.md §7.3 phase 7).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["embedding_moments", "pca_whiten"]


#: hard ceiling on the embedding dimension: the dim×dim covariance grid
#: must fit comfortably in a single shuffle partition and one driver
#: fetch of ``dim`` array rows (4096² doubles = 128 MiB — the matrix
#: itself, which any eigendecomposition consumer must hold anyway).
#: Dim-bounded, never data-bounded; beyond this, use randomized sketching.
MAX_MOMENTS_DIM = 4096


def embedding_moments(df: DataFrame, vec_col: str, dim: int):
    """(n, mean, covariance) of an ``array<float/double>`` column.

    Returns ``(n: int, mean: numpy (dim,), cov: numpy (dim, dim))`` with
    the unbiased (n-1) covariance. Rows whose vector is NULL or of the
    wrong length are ignored. Covariance cells are rounded to 12 decimals
    (matching the decimal(38,12) partial reduce) so downstream
    eigendecompositions are stable run-to-run and the q_emb_cov round-to-6
    oracle sits ~3 orders of magnitude clear of any rounding boundary.

    Driver-fetch shape (round 9, r7 directive #3): the per-cell decimal
    reduce still keys on dim + dim² scalar cells (order-insensitive exact
    sums — executor-side, distributed), but the cells are RE-PACKED
    executor-side into one array row per matrix row before collect: the
    driver receives ``dim + 2`` rows each carrying a dim-length (or
    shorter) array, never dim² scalar rows (the old shape collected 16.7M
    rows at dim=4096; this collects 4098).
    """
    import numpy as np

    if not 1 <= dim <= MAX_MOMENTS_DIM:
        raise ValueError(
            f"embedding_moments: dim must be in [1, {MAX_MOMENTS_DIM}] "
            f"(got {dim}); the dim x dim covariance grid is driver-"
            "materialized by design — sketch or slice larger embeddings"
        )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # accumulate across the WHOLE partition and emit ONE cell set:
        # emitting per Arrow batch would put (dim² + dim + 1) shuffle rows
        # on the wire per ~10k-row batch (16.7M rows/batch at dim=4096);
        # per-partition accumulation divides shuffle volume by the
        # batches-per-partition factor. Batch matmuls accumulate into one
        # float64 grid in deterministic batch order (parquet row order is
        # stable), so the result is run-to-run identical and the decimal
        # reduce downstream stays order-insensitive across partitions.
        s = np.zeros(dim)
        ss = np.zeros((dim, dim))
        n_part = 0
        for pdf in batches:
            vecs = [
                v
                for v in pdf[vec_col]
                if v is not None and len(v) == dim
            ]
            if not vecs:
                continue
            x = np.asarray([np.asarray(v, dtype="float64") for v in vecs])
            s += x.sum(axis=0)
            ss += x.T @ x  # dim×dim, partition-local — never shuffled per row
            n_part += len(vecs)
        if not n_part:
            return
        idx = list(range(dim)) + [
            dim + i * dim + j for i in range(dim) for j in range(dim)
        ]
        yield pd.DataFrame(
            {
                "cell": idx + [-1],
                "val": list(s) + list(ss.ravel()) + [float(n_part)],
            }
        )

    cells = (
        df.select(vec_col)
        .mapInPandas(partials, schema="cell long, val double")
        # deterministic reduce: per-cell decimal sum (order-insensitive,
        # exact). 12 fractional digits (not the engine-default 6): the
        # per-partial truncation is the ONLY cross-run/cross-engine error
        # source in the grid, and 5e-13/partial keeps the q_emb_cov
        # round-to-6 oracle ~100x clear of any rounding boundary
        .groupBy("cell")
        .agg(F.sum(F.col("val").cast("decimal(38,12)")).alias("v"))
    )
    # re-pack executor-side: row index i = -2 (count) / -1 (sum vector) /
    # 0..dim-1 (ss matrix row i); within a row, cells sort by column index
    # j so the collected array is position-aligned
    packed = (
        cells.select(
            F.when(F.col("cell") == -1, F.lit(-2))
            .when(F.col("cell") < dim, F.lit(-1))
            .otherwise(F.expr(f"(cell - {dim}) div {dim}"))
            .alias("i"),
            F.when(F.col("cell") == -1, F.lit(0))
            .when(F.col("cell") < dim, F.col("cell"))
            .otherwise((F.col("cell") - dim) % dim)
            .alias("j"),
            F.col("v").cast("double").alias("v"),
        )
        .groupBy("i")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "v"))),
                lambda e: e["v"],
            ).alias("row")
        )
    )
    got = {int(r["i"]): list(r["row"]) for r in packed.collect()}
    n = int(got.get(-2, [0.0])[0])
    if n < 2:
        raise ValueError(f"embedding_moments: need >=2 vectors, got {n}")
    s = np.asarray(got[-1])
    ss = np.asarray([got[i] for i in range(dim)])
    if s.shape != (dim,) or ss.shape != (dim, dim):
        raise AssertionError(
            f"embedding_moments: packed grid incomplete (s {s.shape}, "
            f"ss {ss.shape}) — cell rows lost in re-pack"
        )
    mean = s / n
    cov = (ss - np.outer(s, s) / n) / (n - 1)
    return n, mean, np.round(cov, 12)


def pca_whiten(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int,
    eps: float = 1e-9,
    moments: tuple | None = None,
) -> DataFrame:
    """Project embeddings onto their top-``k`` principal axes and rescale
    to unit variance (PCA whitening): ``w = diag(1/sqrt(λ+eps)) · Vᵀ ·
    (x - μ)``. Returns ``(id_col, whitened: array<double> length k)``,
    components ordered by DESCENDING eigenvalue.

    Sign convention (eigenvectors are sign-ambiguous): each axis is
    flipped so its largest-|loading| coordinate is positive, making the
    output reproducible across runs and platforms. The projection matrix
    is k×dim — closure-captured (broadcast-tiny); the data never shuffles.
    """
    import numpy as np

    if not 1 <= k <= dim:
        raise ValueError(f"k must be in [1, {dim}]: {k}")
    # callers that already ran embedding_moments (e.g. to inspect the
    # eigen-spectrum) pass it in and skip the second full scan
    _, mean, cov = (
        moments if moments is not None else embedding_moments(df, vec_col, dim)
    )
    lam, vec = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(lam)[::-1][:k]
    lam_k = lam[order]
    v_k = vec[:, order]  # dim×k
    # deterministic sign: largest-|loading| coordinate positive per axis
    for j in range(k):
        i = int(np.argmax(np.abs(v_k[:, j])))
        if v_k[i, j] < 0:
            v_k[:, j] = -v_k[:, j]
    w = (v_k / np.sqrt(np.maximum(lam_k, 0.0) + eps)).T  # k×dim
    mu = mean.copy()

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = pdf[
                pdf[vec_col].map(
                    lambda v: v is not None and len(v) == dim
                )
            ]
            if keep.empty:
                continue
            x = np.asarray(
                [np.asarray(v, dtype="float64") for v in keep[vec_col]]
            )
            y = (x - mu) @ w.T  # rows×k
            yield pd.DataFrame(
                {id_col: keep[id_col].values, "whitened": list(map(list, y))}
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, vec_col).mapInPandas(
        project, schema=f"{id_col} {id_type}, whitened array<double>"
    )
