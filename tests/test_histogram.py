"""Fixed-bin histogram: bin clamping, quantile selection rule, the
one-bin-width error bound vs exact sorted quantiles, grid audit.
Cross-engine parity is the ``event_value_quantile_hist`` oracle twin."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators import histogram as hg

LO, W, NB = 0.0, 10.0, 8  # grid [0, 80) in 8 bins


@pytest.fixture(scope="module")
def values(spark):
    data = [("a", v) for v in [1.0, 5.0, 15.0, 15.5, 42.0, 77.0]] + [
        ("b", -3.0),   # clamps into bin 0
        ("b", 99.0),   # clamps into bin 7
        ("b", None),   # dropped
        ("b", 35.0),
    ]
    return spark.createDataFrame(data, "g string, v double")


def test_build_bins_and_clamping(spark, values):
    hist = hg.histogram_build(values, ["g"], "v", LO, W, NB)
    got = {(r.g, r.bin): r.cnt for r in hist.collect()}
    assert got == {
        ("a", 0): 2,
        ("a", 1): 2,
        ("a", 4): 1,
        ("a", 7): 1,
        ("b", 0): 1,
        ("b", 3): 1,
        ("b", 7): 1,
    }


def test_quantile_selection_rule(spark, values):
    hist = hg.histogram_build(values, ["g"], "v", LO, W, NB)
    q = hg.histogram_quantiles(hist, ["g"], [0.5, 1.0], LO, W)
    got = {(r.g, r.p): (r.rank, r.n_total, r.bin, r.q_upper) for r in q.collect()}
    # group a: n=6; p=.5 -> rank 3 -> cum [2,4,..] -> bin 1, edge 20
    assert got[("a", 0.5)] == (3, 6, 1, 20.0)
    # p=1.0 -> rank 6 -> last occupied bin
    assert got[("a", 1.0)] == (6, 6, 7, 80.0)
    assert got[("b", 0.5)] == (2, 3, 3, 40.0)


def test_error_bound_vs_exact(spark):
    """For in-range data the q_upper estimate is >= the true quantile
    and within one bin width of it, for every group and probability."""
    import random

    rnd = random.Random(7)
    data = [
        (g, round(rnd.uniform(0.0, 79.99), 3))
        for g in ("x", "y")
        for _ in range(500)
    ]
    df = spark.createDataFrame(data, "g string, v double")
    hist = hg.histogram_build(df, ["g"], "v", LO, W, NB)
    probs = [0.5, 0.9, 0.99]
    q = {
        (r.g, r.p): r.q_upper
        for r in hg.histogram_quantiles(hist, ["g"], probs, LO, W).collect()
    }
    by_g = {"x": sorted(v for g, v in data if g == "x"),
            "y": sorted(v for g, v in data if g == "y")}
    for g, vs in by_g.items():
        for p in probs:
            true_q = vs[math.ceil(p * len(vs)) - 1]
            est = q[(g, p)]
            assert est >= true_q
            assert est - true_q <= W


def test_profile_flags_out_of_range_mass(spark, values):
    prof = {
        r.g: (r.n_values, r.n_below, r.n_above)
        for r in hg.histogram_profile(values, ["g"], "v", LO, 80.0).collect()
    }
    assert prof["a"] == (6, 0, 0)
    assert prof["b"] == (3, 1, 1)  # NULL dropped, -3 below, 99 above


def test_no_single_partition_window(spark, values):
    hist = hg.histogram_build(values, ["g"], "v", LO, W, NB)
    q = hg.histogram_quantiles(hist, ["g"], [0.5], LO, W)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
