"""Distributed fixed-point k-means (operators/clustering.py): partition
invariance of the exact-integer training path, the empty-cluster rule,
blob-separation correctness, and bitwise parity between the distributed
fit and the oracle generator's single-process replay."""

from __future__ import annotations

import numpy as np

from neynar_parquet_importer_spark.operators import clustering as clu

VEC_SCHEMA = "vec_id long, embedding array<double>"


def _blobs(n_per: int = 30, dim: int = 8, seed: int = 3):
    """Two well-separated blobs around +0.8 and -0.8 per coordinate."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_per):
        rows.append((i, [0.8 + 0.05 * float(v) for v in rng.randn(dim)]))
    for i in range(n_per):
        rows.append(
            (n_per + i, [-0.8 + 0.05 * float(v) for v in rng.randn(dim)])
        )
    return rows


def test_fit_is_partition_invariant(spark):
    """The whole point of the fixed-point design: integer cluster sums are
    order- and partitioning-invariant, so the trained centroids must be
    BITWISE identical however the corpus is split."""
    rows = _blobs()
    df1 = spark.createDataFrame(rows, VEC_SCHEMA).repartition(1)
    df7 = spark.createDataFrame(rows, VEC_SCHEMA).repartition(7)
    c1 = clu.kmeans_fit(df1, k=3, n_iter=3)
    c7 = clu.kmeans_fit(df7, k=3, n_iter=3)
    assert c1 == c7


def test_assign_separates_planted_blobs(spark):
    df = spark.createDataFrame(_blobs(), VEC_SCHEMA)
    cents = clu.kmeans_fit(df, k=2, n_iter=4)
    out = clu.kmeans_assign(df, cents).collect()
    by_cluster: dict[int, set[int]] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["id"])
    assert len(by_cluster) == 2
    blob_a = set(range(30))
    groups = sorted(by_cluster.values(), key=min)
    assert groups[0] == blob_a
    assert groups[1] == set(range(30, 60))
    # every row is near its own centroid: dist2 far below the ~2.56*dim
    # squared separation of the blob centers
    assert all(r["dist2"] < 1.0 for r in out)


def test_empty_cluster_keeps_previous_centroid(spark):
    """All vectors identical: both init seeds coincide, every row assigns
    to the first index (numpy argmin tie rule), and the starved cluster
    must keep its previous centroid — the deterministic, replayable rule
    the oracle generator mirrors."""
    rows = [(i, [0.5, -0.25]) for i in range(5)]
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    cents = clu.kmeans_fit(df, k=2, n_iter=2)
    assert cents[0] == cents[1]
    q = int(np.floor(0.5 * clu.QUANT_SCALE))
    assert cents[1][0] == q / clu.QUANT_SCALE  # the untouched init seed


def test_fit_matches_single_process_replay(spark):
    """Distributed fit == independent numpy replay, bitwise — the
    training-level check the registered oracle twins build on."""
    from neynar_parquet_importer_spark.plans.queries import (
        _kmeans_replay_centroids,
    )

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    spark_cents = clu.kmeans_fit(emb, k=8, n_iter=4)
    replay_cents, dim = _kmeans_replay_centroids(sf, k=8, n_iter=4)
    assert dim == 64
    assert spark_cents == replay_cents


def test_quantization_floor_semantics(spark):
    """floor (not round): negatives go DOWN on every engine; the quantized
    stream is what both training paths consume, so pin it."""
    df = spark.createDataFrame(
        [(0, [-0.5, 0.5, -1e-7, 0.0])], VEC_SCHEMA
    )
    q = df.select(clu.quantize_col("embedding").alias("q")).head()["q"]
    s = clu.QUANT_SCALE
    assert q == [-s // 2, s // 2, -1, 0]
