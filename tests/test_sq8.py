"""SQ8 scalar quantization: code range, reconstruction error bound,
top-k recall vs the exact scan, and constant-dimension degeneracy.

Cross-engine value parity is covered by the static
``embedding_sq8_topk`` oracle twin; these pin the numeric contracts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from neynar_parquet_importer_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def qdf(emb):
    return F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    )


def test_codes_are_bytes_of_corpus_dim(emb):
    dim = len(emb.select("embedding").head()[0])
    codes = sim.sq8_compress(emb)
    bad = codes.filter(
        (F.size("sq_code") != dim)
        | F.exists("sq_code", lambda c: (c < 0) | (c > 255))
    ).count()
    assert bad == 0


def test_reconstruction_error_within_one_step(emb):
    """|x - dequant(x)| <= (mx - mn)/255 per dimension, everywhere."""
    deq = sim.sq8_dequantized(emb).crossJoin(
        F.broadcast(sim.sq8_params(emb))
    )
    err_ok = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.arrays_zip("sq_deq", "mns", "mxs"),
            lambda x, z: (
                F.abs(x - z["sq_deq"])
                <= (z["mxs"] - z["mns"]) / 255.0 + F.lit(1e-12)
            ).cast("int"),
        ),
        F.lit(True),
        lambda acc, ok: acc & (ok == 1),
    )
    assert deq.filter(~err_ok).count() == 0


def test_sq8_topk_recall_vs_exact(emb, qdf):
    """8-bit quantization barely moves a cosine: top-20 recall vs the
    exact scan should be near-perfect on the real corpus."""
    approx = sim.sq8_topk(emb, qdf, k=20, rerank=False)
    got = {r["vec_id"] for r in approx.collect()}
    qvec = emb.filter("vec_id = 0").select("embedding").head()[0]
    exact = sim.cosine_scores(emb, list(qvec))
    want = {
        r["vec_id"]
        for r in exact.orderBy(F.desc("cos_sim"), "vec_id").limit(20).collect()
    }
    recall = len(got & want) / 20
    assert recall >= 0.9, f"SQ8 top-20 recall {recall} < 0.9"


def test_rerank_exposes_quantization_error(emb, qdf):
    out = sim.sq8_topk(emb, qdf, k=10, rerank=True)
    rows = out.collect()
    assert len(rows) == 10
    assert set(out.columns) == {"vec_id", "sq_cos_raw", "exact_cos_raw"}
    for r in rows:
        assert abs(r["sq_cos_raw"] - r["exact_cos_raw"]) < 0.05


def test_constant_dimension_degenerates_to_min(spark):
    """A dimension with mx == mn reconstructs exactly to that value and
    never divides by zero."""
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.5, float(i)]) for i in range(4)]
    )
    deq = sim.sq8_dequantized(df)
    vals = {tuple(r["sq_deq"]) for r in deq.collect()}
    assert all(v[0] == 1.5 for v in vals)
    assert {v[1] for v in vals} == {0.0, 1.0, 2.0, 3.0}
