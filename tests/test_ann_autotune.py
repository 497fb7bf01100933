"""Recall-targeted ANN auto-tuning (similarity.tune_topk_index) and the
rerank refinement dials it turns (pq_topk(rerank=R), sq8_topk(rerank=R)).

Regime rationale (r6 verdict #1): on a structureless corpus top-k recall
tracks scanned fraction — no closed-form rule can fix that. On a
CLUSTERED corpus (the regime real embedding models produce) a small
probe set covers the true neighborhood, and the tuning rule's job is to
find the cheapest knob that proves it. These tests pin both: the tuner
must hit the target on a clustered toy corpus with a sub-full scan, and
the rerank dial must be monotone where it matters.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def clustered(spark):
    """600 vectors, 12 tight unit-sphere clusters of 50 (intra-cos ~0.95,
    inter-cos ~0) — k=10 neighborhoods live inside one cluster."""
    rng = np.random.RandomState(7)
    n_clusters, dim, per = 12, 16, 50
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.vstack([c + 0.05 * rng.randn(per, dim) for c in centers])
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.mark.parametrize("fam", ["lsh", "ivf", "pq", "sq8"])
def test_tuner_hits_target_on_clustered_corpus(clustered, fam):
    out = sim.tune_topk_index(
        clustered, fam, k=10, target_recall=0.8, n_val_queries=4
    )
    assert out["met"], out
    assert out["recall"] >= 0.8
    # the point of an index: the chosen setting scans well under the
    # whole corpus (LSH/IVF: probed fraction; PQ/SQ8: float reads)
    assert out["scan_frac"] < 0.5
    # the ladder stops at the first passing rung — every earlier rung
    # failed the target, so the choice is minimal by construction
    assert [r["recall"] >= 0.8 for r in out["ladder"]].count(True) <= 1
    assert out["ladder"][-1]["value"] == out["chosen"]


def test_tuner_reports_honest_miss(spark):
    """A corpus with NO structure and a near-zero scan budget: the tuner
    must return met=False with the best rung, not a fake pass."""
    rng = np.random.RandomState(3)
    vecs = rng.randn(400, 16)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    out = sim.tune_topk_index(
        df, "lsh", k=10, target_recall=0.99, n_val_queries=3,
        n_planes=8, ladder=[0],
    )
    assert not out["met"]
    assert out["chosen"] == 0
    assert out["recall"] < 0.99


def test_pq_rerank_recovers_exact_topk(clustered):
    """With a wide-enough shortlist the PQ+rerank result IS the exact
    top-k: quantization error only reorders inside the shortlist, and
    the exact pass fixes that."""
    qv = [r[0] for r in clustered.filter(F.col("vec_id") == 0)
          .select("embedding").collect()][0]
    exact = [r[0] for r in sim.brute_force_topk(clustered, qv, k=10)
             .select("vec_id").collect()]
    books = sim.pq_codebooks(clustered, n_sub=8)
    plain = {r[0] for r in sim.pq_topk(clustered, qv, k=10, codebooks=books)
             .select("vec_id").collect()}
    reranked = [r[0] for r in
                sim.pq_topk(clustered, qv, k=10, codebooks=books, rerank=200)
                .select("vec_id").collect()]
    assert reranked == exact          # exact order, not just the set
    assert len(plain & set(exact)) <= len(set(reranked) & set(exact))
    with pytest.raises(ValueError, match="rerank"):
        sim.pq_topk(clustered, qv, k=10, codebooks=books, rerank=5)


def test_sq8_int_rerank_shortlist(clustered):
    """sq8_topk(rerank=R>k) returns the exact-best k of the top-R code
    shortlist, ordered by exact score; rerank=True keeps the historical
    shape (the k ADC winners, exact-scored)."""
    qdf = clustered.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    qv = [r[0] for r in qdf.collect()][0]
    exact = [r[0] for r in sim.brute_force_topk(clustered, qv, k=10)
             .select("vec_id").collect()]
    wide = sim.sq8_topk(clustered, qdf, k=10, rerank=100).collect()
    assert [r["vec_id"] for r in wide] == exact or {
        r["vec_id"] for r in wide
    } == set(exact)
    # exact_cos_raw is descending (ties broken by id upstream)
    scores = [r["exact_cos_raw"] for r in wide]
    assert scores == sorted(scores, reverse=True)
    legacy = sim.sq8_topk(clustered, qdf, k=10, rerank=True).collect()
    assert len(legacy) == 10
    assert {c for c in ("sq_cos_raw", "exact_cos_raw")} <= set(
        legacy[0].asDict()
    )
    with pytest.raises(ValueError, match="rerank"):
        sim.sq8_topk(clustered, qdf, k=10, rerank=3)


def test_ivf_knn_join_matches_exact_on_clustered(clustered):
    """Batch IVF retrieval on the clustered corpus: with enough probes
    the result IS the exact knn_join; with few probes recall stays high
    because neighborhoods live inside one cell."""
    queries = clustered.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = sim.ivf_centroids(clustered, n_centroids=12)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.knn_join(clustered, queries, k=10).collect()
    }
    full = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_knn_join(
            clustered, queries, k=10, centroids=cents, nprobe=12
        ).collect()
    }
    assert full == exact  # all cells probed -> exact
    few = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_knn_join(
            clustered, queries, k=10, centroids=cents, nprobe=2
        ).collect()
    }
    assert len(few & exact) / len(exact) >= 0.8


def test_ivf_knn_join_plan_probes_broadcast(clustered):
    """The probe frame (|Q| * nprobe rows) must broadcast into the cell
    join — the corpus side never shuffles on the join key."""
    queries = clustered.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = sim.ivf_centroids(clustered, n_centroids=12)
    df = sim.ivf_knn_join(clustered, queries, k=5, centroids=cents, nprobe=3)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ivf_ladder_tracks_precomputed_centroid_count(clustered):
    """Precomputed centroids with a count different from the
    n_centroids default: the ladder ceiling and every recorded
    scan_frac must derive from the ACTUAL cell count (len(centroids)),
    not the parameter — otherwise the evidence artifact overstates the
    scanned fraction and the tuner can stop below a full probe."""
    cents = sim.ivf_centroids(clustered, n_centroids=4)
    out = sim.tune_topk_index(
        clustered, "ivf", k=10, target_recall=1.01,  # unreachable: walk all
        n_val_queries=3, centroids=cents,
    )
    values = [r["value"] for r in out["ladder"]]
    assert max(values) == 4  # ceiling == len(centroids)
    for r in out["ladder"]:
        assert r["scan_frac"] == pytest.approx(r["value"] / 4)
