"""PCA compression: numpy-replay of the trained basis, orthonormality,
sign canonicalization, the orthonormal reconstruction-error identity
against brute-force reconstruction, and full-rank exactness. Cross-
engine parity is the ``pca_label_compression`` /
``pca_component_variance`` artifact-oracle twins."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.catalog import load_table
from neynar_parquet_importer_spark.operators import pca

SF = "/root/testdata/sf0.001"


def _toy(n=200, d=8, seed=7):
    rng = np.random.RandomState(seed)
    # anisotropic: two strong directions so the top-2 basis is meaningful
    base = rng.randn(n, d) * np.array([5, 3] + [0.5] * (d - 2))
    return base + rng.randn(d) * 2


def test_core_matches_numpy_svd():
    x = _toy()
    mean, comps, eigs, evr = pca.pca_core(x.tolist(), 2)
    assert np.allclose(mean, x.mean(axis=0))
    y = x - x.mean(axis=0)
    u, s, vt = np.linalg.svd(y, full_matrices=False)
    for i in range(2):
        # same subspace: |cos| between bases = 1
        assert abs(float(np.dot(comps[i], vt[i]))) == pytest.approx(1.0, abs=1e-9)
        assert eigs[i] == pytest.approx(s[i] ** 2 / len(x), rel=1e-9)
    assert 0 < evr[1] <= evr[0] < 1


def test_components_orthonormal_and_sign_canonical():
    x = _toy()
    _, comps, _, _ = pca.pca_core(x.tolist(), 4)
    c = np.array(comps)
    assert np.allclose(c @ c.T, np.eye(4), atol=1e-12)
    for row in c:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_error_identity_matches_brute_force(spark):
    """||x - recon||^2 via the orthonormal identity equals the explicit
    reconstruction residual."""
    x = _toy(n=50)
    mean, comps, _, _ = pca.pca_core(x.tolist(), 3)
    df = spark.createDataFrame(
        [(i, [float(t) for t in row]) for i, row in enumerate(x)],
        ["vec_id", "embedding"],
    )
    got = {
        r["vec_id"]: r["err"]
        for r in pca.reconstruction_error(df, mean, comps).collect()
    }
    c = np.array(comps)
    for i, row in enumerate(x):
        y = row - np.array(mean)
        p = c @ y
        recon = np.array(mean) + c.T @ p
        assert got[i] == pytest.approx(float(np.sum((row - recon) ** 2)), abs=1e-8)


def test_full_rank_error_is_zero(spark):
    x = _toy(n=40, d=4)
    mean, comps, _, evr = pca.pca_core(x.tolist(), 4)
    df = spark.createDataFrame(
        [(i, [float(t) for t in row]) for i, row in enumerate(x)],
        ["vec_id", "embedding"],
    )
    errs = [
        r["err"] for r in pca.reconstruction_error(df, mean, comps).collect()
    ]
    assert max(abs(e) for e in errs) < 1e-8
    assert sum(evr) == pytest.approx(1.0, abs=1e-12)


def test_projection_matches_numpy(spark):
    emb = load_table(spark, SF, "embeddings")
    mean, comps, _, _ = pca.pca_fit(emb, 2, sample_size=256)
    rows = emb.orderBy("vec_id").limit(10).collect()
    pr = {
        r["vec_id"]: (r["p0"], r["p1"])
        for r in pca.project(emb, mean, comps)
        .orderBy("vec_id")
        .limit(10)
        .collect()
    }
    c = np.array(comps)
    for r in rows:
        y = np.array([float(t) for t in r["embedding"]]) - np.array(mean)
        exp = c @ y
        assert pr[r["vec_id"]][0] == pytest.approx(float(exp[0]), abs=1e-9)
        assert pr[r["vec_id"]][1] == pytest.approx(float(exp[1]), abs=1e-9)


def test_no_python_udf_in_scan(spark):
    emb = load_table(spark, SF, "embeddings")
    mean, comps, _, _ = pca.pca_fit(emb, 2, sample_size=128)
    plan = (
        pca.reconstruction_error(emb, mean, comps)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_m_bounds():
    x = _toy(n=20, d=4)
    with pytest.raises(ValueError):
        pca.pca_core(x.tolist(), 0)
    with pytest.raises(ValueError):
        pca.pca_core(x.tolist(), 5)


def test_reconstruction_error_rejects_empty_comps(spark):
    """Direct misuse with comps=[] raises a clear ValueError instead of
    the opaque Column-minus-None TypeError (round-7 advisor finding)."""
    df = spark.createDataFrame([([1.0, 2.0],)], ["embedding"])
    with pytest.raises(ValueError, match="comps"):
        pca.reconstruction_error(df, [0.0, 0.0], [])
