"""Distributed PCA for embedding compression: train a small orthonormal
basis driver-side on a deterministic sample (the IVF-coarse-quantizer
build discipline — ``similarity.ivf_centroids``), then project and
measure reconstruction error fully distributed, as Column expressions.

Why this shape at 100 TB: the model is tiny (``m x d`` floats — like
IVF centroids or PQ codebooks it ships to executors as literals), while
everything touching data — projection, per-group error profiles,
component variances — stays a single scan with JVM-side arithmetic. A
full distributed eigendecomposition is unnecessary for the curation
uses this serves (embedding whitening/compression before ANN indexing,
low-rank quality profiling per domain): the covariance of a bounded
uniform-by-id sample converges at O(1/sqrt(n)) and the basis is an
artifact to persist, not a per-query computation.

Key identity used throughout (components orthonormal, so no
reconstruction arrays materialize): for centered ``y = x - mean`` and
projections ``p_i = y . c_i``,

    ``||x - recon||^2 = ||y||^2 - sum_i p_i^2``

— reconstruction error without reconstructing, one extra dot per row.

Determinism/oracle scope: the basis comes from one numpy call
(:func:`pca_core`) on the id-ordered sample, with eigenvector sign
canonicalized (largest-|entry| coordinate made positive), so the query
path and an oracle generator derive bit-identical literals; per-row
dots evaluate as sequential left-to-right array folds in BOTH engines
(``F.aggregate`` here, ``list_dot_product`` there). Floats enter only
through the dots and group means — the accepted rounded-twin class.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _dot


def pca_core(vectors: Sequence[Sequence[float]], m: int):
    """(mean, components[m][d], explained_variance_ratio[m]) from a
    plain eigendecomposition of the population covariance — returned as
    ``(mean, components, eigenvalues, evr)``. Components are orthonormal
    rows, eigenvalue-descending, each sign-flipped so its
    largest-|entry| coordinate (first on ties) is positive — the
    canonicalization that makes the basis a deterministic artifact."""
    x = np.asarray(vectors, dtype=np.float64)
    n, d = x.shape
    if not 1 <= m <= d:
        raise ValueError(f"m must be in [1, {d}], got {m}")
    mean = x.mean(axis=0)
    y = x - mean
    cov = (y.T @ y) / n
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:m]
    comps = []
    for j in order:
        c = v[:, j]
        pivot = int(np.argmax(np.abs(c)))
        if c[pivot] < 0:
            c = -c
        comps.append([float(t) for t in c])
    total = float(w.sum())
    evr = [float(w[j]) / total if total > 0 else 0.0 for j in order]
    return [float(t) for t in mean], comps, [float(w[j]) for j in order], evr


def pca_fit(
    df: DataFrame,
    m: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 2048,
):
    """Train on the first ``sample_size`` rows by id — the bounded
    deterministic collect shared with the IVF/PQ trainers. Returns
    ``(mean, components, eigenvalues, evr)``."""
    rows = df.orderBy(id_col).limit(sample_size).select(vec_col).collect()
    return pca_core([[float(t) for t in r[0]] for r in rows], m)


def _centered_dot(vec: Column, mean: list[float], comp: list[float]) -> Column:
    """(x - mean) . comp as one sequential fold: fold x . comp on the
    data side, subtract the constant mean . comp (exact same float in
    both engines: it's a Python-computed literal)."""
    const = float(np.dot(np.asarray(mean), np.asarray(comp)))
    return _dot(vec, F.array(*[F.lit(float(t)) for t in comp])) - F.lit(const)


def project(
    df: DataFrame,
    mean: list[float],
    comps: list[list[float]],
    vec_col: str = "embedding",
    out_prefix: str = "p",
) -> DataFrame:
    """Adds one column per component: ``p0..p{m-1}`` — the compressed
    representation. Pure Column folds; no Python in the scan."""
    out = df
    for i, c in enumerate(comps):
        out = out.withColumn(
            f"{out_prefix}{i}", _centered_dot(F.col(vec_col), mean, c)
        )
    return out


def reconstruction_error(
    df: DataFrame,
    mean: list[float],
    comps: list[list[float]],
    vec_col: str = "embedding",
    err_col: str = "err",
) -> DataFrame:
    """Adds ``err`` = squared reconstruction error of the m-component
    compression, via the orthonormal-basis identity (module doc)."""
    if not comps:
        raise ValueError("comps must be non-empty (pca_core enforces m >= 1)")
    vec = F.col(vec_col)
    mean_arr = F.array(*[F.lit(float(t)) for t in mean])
    # ||x - mean||^2 expanded to x.x - 2 x.mean + mean.mean: two folds
    # over the row instead of a re-evaluated centered zip (interpreted
    # HOFs re-run shared subexpressions per element), and the exact
    # formula the SQL twin states with list_dot_product
    mm = float(np.dot(np.asarray(mean), np.asarray(mean)))
    centered_norm2 = (
        _dot(vec, vec) - F.lit(2.0) * _dot(vec, mean_arr) + F.lit(mm)
    )
    proj2 = None
    for c in comps:
        p = _centered_dot(vec, mean, c)
        proj2 = p * p if proj2 is None else proj2 + p * p
    return df.withColumn(err_col, centered_norm2 - proj2)


def mean_sql(mean: list[float]) -> str:
    return "[" + ", ".join(repr(float(t)) for t in mean) + "]::DOUBLE[]"


def comp_sql(comp: list[float]) -> str:
    return "[" + ", ".join(repr(float(t)) for t in comp) + "]::DOUBLE[]"
