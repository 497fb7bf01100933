"""Distributed Lloyd k-means over the FULL corpus — exact fixed-point sums.

The IVF coarse quantizer (``similarity.ivf_centroids``) trains
driver-side on a bounded sample, which is the right build for an ANN
index.  Corpus *clustering* — domain discovery, mixture balancing,
cluster-aware splits — wants centroids fitted on every vector, and at
100 TB that training loop must itself be distributed: per Lloyd
iteration, one scan (assignment, Arrow-batched) plus one aggregation
whose map-side combine collapses each partition to at most ``k`` rows
of ``(count, dim integer sums)`` before any network movement.  The
driver only ever holds k×(dim+1) numbers per iteration.

What makes DISTRIBUTED training value-checkable is fixed-point
arithmetic: components quantize to ``floor(x * 2^20)`` BIGINTs
(:func:`quantize_col`), so per-cluster sums are exact int64 — invariant
to partitioning and summation order — and each centroid coordinate is
``int_sum / (n * 2^20)``: one deterministic double division
(:func:`centroids_from_sums`).  The per-row assignment
(:func:`assign_rows`) uses only fixed-dim row-wise numpy reductions, so
its output is independent of batch composition.  The oracle generator
(`plans/queries._kmeans_oracle_sql`) therefore recomputes the SAME
iterations single-process and must land bitwise-identical centroids —
unlike the shared-artifact ANN twins, that is an INDEPENDENT replay of
the training itself, so the distributed aggregation is value-checked,
not just the probe around it.

Bounds: |x| <= ~1 for normalized embeddings -> |q| <= 2^20; an int64
sum overflows only past ~2^43 same-cluster rows (8 trillion), and the
quantization error (< 2^-20 per coordinate) is ~1e-6 — far below any
clustering-relevant distance at unit scale.

Beyond-reference operator: the reference has no clustering surface
(its nearest analog is row-level transforms, src/parquet_import.py).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1 << 20


def quantize_col(vec_col: Column | str) -> Column:
    """array<double> -> array<long> of ``floor(x * 2^20)``.

    floor (not round) because its semantics are identical in Spark,
    numpy, and DuckDB for all doubles including negatives; round() sits
    on half-boundaries engines break differently (see the
    quality-classifier rationale)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        v, lambda x: F.floor(x * F.lit(float(QUANT_SCALE))).cast("long")
    )


def assign_rows(xq, centroids: Sequence[Sequence[float]]):
    """(assignments, distances²) for quantized rows against a centroid
    matrix — THE shared arithmetic between the Spark executors and the
    oracle generator, so the iteration trajectory is bitwise identical.

    Only per-row fixed-dim reductions (``sum(axis=1)`` over dim, loop
    over k): the result for a row never depends on which other rows
    share its Arrow batch, which is what makes the distributed
    assignment partition-invariant. Ties break to the first (lowest)
    centroid index — numpy argmin semantics, mirrored in the oracle as
    ``ORDER BY d2, cid``."""
    x = np.asarray(xq, dtype=np.float64) / float(QUANT_SCALE)
    c = np.asarray(centroids, dtype=np.float64)
    d2 = np.empty((x.shape[0], c.shape[0]), dtype=np.float64)
    for j in range(c.shape[0]):
        diff = x - c[j]
        d2[:, j] = (diff * diff).sum(axis=1)
    a = d2.argmin(axis=1)
    return a, d2[np.arange(len(a)), a]


def centroids_from_sums(
    prev: list[list[float]], stats: dict[int, tuple[int, list[int]]]
) -> list[list[float]]:
    """New centroid floats from exact integer cluster sums: coordinate =
    ``int_sum / (n * 2^20)`` as ONE double division over Python ints —
    the single place the fixed-point world re-enters floats, shared by
    the driver loop and the oracle generator. Clusters that lost every
    member keep their previous centroid (deterministic, replayable)."""
    out = [list(c) for c in prev]
    for cid, (n, sums) in stats.items():
        if n > 0:
            denom = n * QUANT_SCALE
            out[cid] = [s / denom for s in sums]
    return out


def _init_from_quantized(q: DataFrame, k: int) -> list[list[float]]:
    """Seeds from an (id, q) quantized frame: the k rows whose
    md5(id-as-string) sorts first — an order-stable, engine-portable
    pick (the oracle generator replays it with hashlib over the same
    decimal strings). Collects k rows — bounded regardless of corpus
    size — and reads the CALLER'S frame, so a persisted fit pipeline
    pays no extra corpus scan for initialization."""
    rows = (
        q.orderBy(F.md5(F.col("id").cast("string")), "id")
        .limit(k)
        .collect()
    )
    return [[qi / float(QUANT_SCALE) for qi in r["q"]] for r in rows]


def init_centroids_md5(
    df: DataFrame, vec_col: str, id_col: str, k: int
) -> list[list[float]]:
    """Standalone seed pick from a raw corpus (quantizes a projection
    first); :func:`kmeans_fit` uses the internal form on its already-
    persisted quantized frame instead of re-scanning the corpus."""
    return _init_from_quantized(
        df.select(
            F.col(id_col).alias("id"), quantize_col(vec_col).alias("q")
        ),
        k,
    )


def _cluster_udf(centroids: Sequence[Sequence[float]]):
    cents = [list(map(float, c)) for c in centroids]

    @F.pandas_udf("int")
    def f(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype="int32")
        a, _ = assign_rows(np.array(s.tolist(), dtype=np.int64), cents)
        return pd.Series(a, dtype="int32")

    return f


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iter: int = 4,
) -> list[list[float]]:
    """Lloyd iterations as Spark jobs; returns the final centroid matrix.

    Per iteration: assignment (Arrow-batched pandas UDF over the cached
    quantized frame) feeds ``groupBy(cluster).agg(count, dim integer
    sums)`` — map-side combine makes the shuffle k rows per partition —
    and the k-row result is collected to fold into the next centroids.
    Total driver traffic: n_iter * k * (dim+1) longs."""
    q = df.select(
        F.col(id_col).alias("id"), quantize_col(vec_col).alias("q")
    ).persist()
    try:
        head = q.select(F.size("q").alias("d")).head()
        if head is None:
            raise ValueError("kmeans_fit needs a non-empty corpus")
        dim = int(head["d"])
        cents = _init_from_quantized(q, k)
        sum_cols = [
            F.sum(F.element_at("q", i + 1)).alias(f"s{i}") for i in range(dim)
        ]
        for _ in range(n_iter):
            assigned = q.withColumn("cluster", _cluster_udf(cents)("q"))
            stat_rows = (
                assigned.groupBy("cluster")
                .agg(F.count(F.lit(1)).alias("n"), *sum_cols)
                .collect()
            )
            stats = {
                int(r["cluster"]): (
                    int(r["n"]),
                    [int(r[f"s{i}"]) for i in range(dim)],
                )
                for r in stat_rows
            }
            cents = centroids_from_sums(cents, stats)
        return cents
    finally:
        q.unpersist()


def kmeans_assign(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cluster, dist2) for every row — one Arrow-batched pass using
    the same :func:`assign_rows` arithmetic as training. ``cluster`` is
    a plain column: write the corpus partitioned by it and downstream
    per-domain reads become partition pruning."""
    cents = [list(map(float, c)) for c in centroids]
    src = df.select(
        F.col(id_col).alias("id"), quantize_col(vec_col).alias("q")
    )
    # carry the caller's id TYPE through: a hardcoded "id long" made any
    # non-long id (string doc ids) die in the Arrow worker with
    # ArrowInvalid even though id_col is a parameter
    id_dt = src.schema["id"].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a, d2 = assign_rows(
                np.array(pdf["q"].tolist(), dtype=np.int64), cents
            )
            yield pd.DataFrame(
                {"id": pdf["id"], "cluster": a.astype("int32"), "dist2": d2}
            )

    return src.mapInPandas(
        run, schema=f"id {id_dt}, cluster int, dist2 double"
    )
