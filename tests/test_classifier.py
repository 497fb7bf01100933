"""Hashed linear classifier: weight-table join semantics (pruned models,
custom weights), exact integer scoring, and the broadcast plan shape.
Cross-engine parity is the ``quality_classifier_scores`` oracle twin.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from neynar_parquet_importer_spark.operators import classifier as clf

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_pseudo_weights_are_bounded_and_deterministic(spark):
    w = clf.pseudo_weights(spark, 256)
    rows = {r["bucket"]: r["w_milli"] for r in w.collect()}
    assert len(rows) == 256
    assert all(-1000 <= v <= 1000 for v in rows.values())
    again = {r["bucket"]: r["w_milli"] for r in clf.pseudo_weights(spark, 256).collect()}
    assert rows == again


def test_known_weights_score_exactly(spark):
    """A hand-built corpus + full weight table: the logit is the exact
    mean milli-weight — no float tolerance needed."""
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b"), Row(doc_id=2, text="a a a")]
    )
    # resolve each token's bucket through the same operator
    tok_df = spark.createDataFrame([Row(doc_id=0, text="a"), Row(doc_id=1, text="b")])
    tb = {r["doc_id"]: r["bucket"] for r in clf.token_buckets(tok_df, "text", "doc_id", 64).collect()}
    weights = spark.createDataFrame(
        [Row(bucket=tb[0], w_milli=500), Row(bucket=tb[1], w_milli=-100)]
    )
    out = {
        r["doc_id"]: (r["n_terms"], r["w_milli_sum"], r["logit"])
        for r in clf.classify(docs, weights, "text", "doc_id", 64).collect()
    }
    assert out[1] == (2, 400, 400 / 2000.0)
    assert out[2] == (3, 1500, 1500 / 3000.0)


def test_pruned_model_counts_missing_buckets_as_zero(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="x y z")])
    empty = spark.createDataFrame([], "bucket long, w_milli long")
    out = clf.classify(docs, empty, "text", "doc_id", 64).collect()[0]
    assert (out["n_terms"], out["w_milli_sum"], out["logit"]) == (3, 0, 0.0)


def test_real_corpus_scores_every_doc(spark, docs):
    w = clf.pseudo_weights(spark, 4096)
    out = clf.classify(docs, w, "text", "doc_id", 4096)
    assert out.count() == docs.count()
    # logit always equals the exact ratio
    bad = out.filter(
        F.abs(F.col("logit") - F.col("w_milli_sum") / (1000.0 * F.col("n_terms")))
        > 1e-15
    ).count()
    assert bad == 0


def test_weight_join_broadcasts(spark, docs):
    w = clf.pseudo_weights(spark, 4096)
    plan = (
        clf.classify(docs, w, "text", "doc_id", 4096)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
