"""Count-min sketch: one-sided estimate guarantee, merge-by-addition
equivalence, weighted builds, sizing math, and the broadcast probe
plan. Cross-engine parity is the ``heavy_hitters_cms`` oracle twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.catalog import load_table
from neynar_parquet_importer_spark.operators import cms

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events")


def test_estimate_never_undercounts(spark, events):
    """est >= true for EVERY key, even on a tiny saturated sketch."""
    truth = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("t"))
    for width in (16, 256):
        sk = cms.cms_build(events, "user_id", width=width, depth=3)
        est = cms.cms_estimate(truth, sk, "user_id", width=width, depth=3)
        assert est.filter(F.col("est_count") < F.col("t")).count() == 0


def test_wide_sketch_is_exact_here(spark, events):
    """With width >> #keys the collision probability is tiny: every
    estimate equals the true count on this corpus."""
    truth = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("t"))
    sk = cms.cms_build(events, "user_id", width=1 << 14, depth=4)
    est = cms.cms_estimate(truth, sk, "user_id", width=1 << 14, depth=4)
    assert est.filter(F.col("est_count") != F.col("t")).count() == 0


def test_merge_equals_single_build(spark, events):
    """Sketch(day1) + Sketch(day2) == Sketch(day1 U day2), cell for cell."""
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    merged = cms.cms_merge(
        cms.cms_build(a, "user_id", width=128, depth=3),
        cms.cms_build(b, "user_id", width=128, depth=3),
    )
    whole = cms.cms_build(events, "user_id", width=128, depth=3)
    got = {(r["row"], r["col"]): r["cnt"] for r in merged.collect()}
    want = {(r["row"], r["col"]): r["cnt"] for r in whole.collect()}
    assert got == want


def test_weighted_build_counts_weights(spark):
    df = spark.createDataFrame(
        [("k1", 10), ("k1", 5), ("k2", 7)], "k string, w long"
    )
    sk = cms.cms_build(df, "k", width=64, depth=2, weight_col="w")
    est = cms.cms_estimate(
        df.select("k").distinct(), sk, "k", width=64, depth=2
    )
    out = {r["k"]: r["est_count"] for r in est.collect()}
    assert out["k1"] >= 15 and out["k2"] >= 7


def test_shape_for_math():
    w, d = cms.cms_shape_for(0.001, 0.01)
    assert w == 2719 and d == 5
    with pytest.raises(ValueError):
        cms.cms_shape_for(0.0, 0.5)


def test_probe_join_broadcasts(spark, events):
    sk = cms.cms_build(events, "user_id", width=256, depth=4)
    keys = events.select("user_id").distinct()
    plan = (
        cms.cms_estimate(keys, sk, "user_id", width=256, depth=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
