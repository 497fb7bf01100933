"""IVF-partitioned corpus layout: the at-rest form of the coarse
quantizer. write_ivf_partitioned cuts one ivf_cell=<i>/ directory per
cell; ivf_topk_partitioned's probe filter must prune at FILE LISTING
(PartitionFilters in the scan node), and results must equal the
in-memory ivf_topk on the same corpus + centroids."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(19)
    centers = rng.randn(8, 16)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.vstack([c + 0.07 * rng.randn(60, 16) for c in centers])
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()
    df.count()
    yield df
    df.unpersist()


def test_partitioned_layout_and_equivalence(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "corpus")
    cents = sim.ivf_centroids(corpus, n_centroids=8)
    sim.write_ivf_partitioned(corpus, path, cents)

    dirs = [d for d in os.listdir(path) if d.startswith("ivf_cell=")]
    assert 1 <= len(dirs) <= 8
    back = spark.read.parquet(path)
    assert back.count() == corpus.count()

    qv = [r[0] for r in corpus.filter(F.col("vec_id") == 0)
          .select("embedding").collect()][0]
    got = sim.ivf_topk_partitioned(
        spark, path, qv, k=10, centroids=cents, nprobe=3
    )
    want = sim.ivf_topk(
        corpus, qv, k=10, centroids=cents, nprobe=3
    )
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]


def test_partitioned_probe_prunes_at_listing(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "corpus")
    cents = sim.ivf_centroids(corpus, n_centroids=8)
    sim.write_ivf_partitioned(corpus, path, cents)
    qv = [r[0] for r in corpus.filter(F.col("vec_id") == 1)
          .select("embedding").collect()][0]
    df = sim.ivf_topk_partitioned(
        spark, path, qv, k=5, centroids=cents, nprobe=2
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the probe is a PARTITION filter — pruning happens before any
    # footer or data page is read
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:200]
    assert "ivf_cell" in seg


def test_partitioned_requires_centroids(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "corpus")
    cents = sim.ivf_centroids(corpus, n_centroids=8)
    sim.write_ivf_partitioned(corpus, path, cents)
    with pytest.raises(ValueError, match="centroids are layout"):
        sim.ivf_topk_partitioned(spark, path, [0.0] * 16, k=5)
