"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single narrow projection over the
corpus (dot product via ``zip_with``/``aggregate``, JVM-side, no Python)
followed by a top-k. At 100 TB the scan parallelizes perfectly (no
shuffle until the final k-row reduction; Spark's ``orderBy().limit(k)``
plans as TakeOrderedAndProject = per-partition top-k then a k-sized
driver merge, not a global sort).

Scale path: random-hyperplane LSH bucketing — assign each vector to a
bucket by the sign pattern of ``n_planes`` fixed hyperplanes, search only
the query's bucket (optionally with multi-probe). Buckets are a plain
column, so the bucketed corpus can be written out partitioned/bucketed by
it and pruned at scan time.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_scores(
    df: DataFrame,
    query_vec: Sequence[float] | Column,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    score_col: str = "cos_sim",
) -> DataFrame:
    """(id, cosine(vec, query)) for every row. ``query_vec`` may be a
    Python sequence (inlined as a literal array — no driver round trip per
    row) or a Column (e.g. from a broadcast one-row cross join)."""
    if isinstance(query_vec, Column):
        q = query_vec
        qnorm = _norm(q)
    else:
        q = F.array(*[F.lit(float(v)) for v in query_vec])
        qnorm = F.lit(math.sqrt(sum(float(v) * float(v) for v in query_vec)))
    v = F.col(vec_col)
    denom = _norm(v) * qnorm
    score = F.when(denom > 0, _dot(v, q) / denom).otherwise(F.lit(0.0))
    return df.select(F.col(id_col), score.alias(score_col))


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float] | Column,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine. orderBy+limit => TakeOrderedAndProject
    (per-partition heap + driver merge of k rows, no global shuffle)."""
    scores = cosine_scores(df, query_vec, vec_col, id_col)
    return scores.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def hyperplane_bucket(
    vec_col: Column | str,
    planes: Sequence[Sequence[float]],
) -> Column:
    """Sign-pattern bucket id for random-hyperplane LSH: bit i set iff
    dot(vec, plane_i) >= 0. Planes are fixed literals (seeded driver-side)
    so the bucketing is deterministic and usable as a partition column."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(v, p) >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return bucket


def make_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (pure-Python LCG, no numpy
    dependency at the executors; generated once driver-side)."""
    state = seed & 0x7FFFFFFF or 1
    planes: list[list[float]] = []
    for _ in range(n_planes):
        plane = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            plane.append(state / float(1 << 31) * 2.0 - 1.0)
        planes.append(plane)
    return planes


def lsh_bucketed_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: search only buckets within ``multiprobe_hamming``
    of the query's bucket. With 8 planes + 1-probe that's 9/256 of the
    corpus scanned — the recall/cost dial a 100 TB ANN deployment needs.
    The bucket filter is a plain predicate, so a corpus pre-partitioned by
    bucket gets partition pruning at the source."""
    dim = len(query_vec)
    planes = make_planes(dim, n_planes)

    def bucket_of(vec: Sequence[float]) -> int:
        b = 0
        for i, plane in enumerate(planes):
            if sum(float(x) * float(y) for x, y in zip(vec, plane)) >= 0:
                b |= 1 << i
        return b

    qb = bucket_of(query_vec)
    probe = [
        b
        for b in range(1 << n_planes)
        if bin(b ^ qb).count("1") <= multiprobe_hamming
    ]
    bucketed = df.withColumn("__bucket", hyperplane_bucket(vec_col, planes))
    pruned = bucketed.filter(F.col("__bucket").isin(probe)).drop("__bucket")
    return brute_force_topk(pruned, query_vec, k, vec_col, id_col)
