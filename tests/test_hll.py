"""HyperLogLog: lossless merge, accuracy within the theoretical band,
pure-Python register replay (independent of both Spark and DuckDB), the
exactness of the harmonic sum, and the bounded-shuffle plan shape.
Cross-engine parity is the ``hll_distinct_users`` /
``hll_register_union`` oracle twins."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.catalog import load_table
from neynar_parquet_importer_spark.operators import hll

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events")


def _py_registers(keys, p):
    """Reference replay with hashlib only — no Spark, no DuckDB."""
    m = 1 << p
    regs: dict[int, int] = {}
    for k in keys:
        d = hashlib.md5(str(k).encode()).hexdigest()
        h1, h2 = int(d[:8], 16), int(d[8:16], 16)
        bucket = h1 % m
        rho = 33 if h2 == 0 else 33 - h2.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def test_registers_match_hashlib_replay(spark, events):
    """Every (bucket, register) equals the two's-complement-free replay
    from Python's md5 — the same discipline that pins md5_signed64."""
    keys = [r[0] for r in events.select("user_id").distinct().collect()]
    expected = _py_registers(keys, p=8)
    got = {
        (r["bucket"], r["register"])
        for r in hll.hll_registers(events, "user_id", p=8).collect()
    }
    assert got == set(expected.items())


def test_merge_is_lossless(spark, events):
    """Union of per-type sketches == sketch of the union, register for
    register — the property that makes per-source/day persistence safe."""
    per_type = hll.hll_registers(events, "user_id", ["event_type"], p=10)
    merged = hll.hll_merge(per_type, [])
    direct = hll.hll_registers(events, "user_id", [], p=10)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_estimate_within_error_band(spark):
    """5000 distinct keys at p=10: |est/true - 1| within 5 standard
    errors (5 * 1.04/sqrt(1024) ~ 16%); the observed corpus lands far
    inside, but the asserted bound is the theoretical one so the test
    doesn't encode one hash family's luck."""
    n = 5000
    df = spark.range(n).select(F.col("id").alias("k"))
    regs = hll.hll_registers(df, "k", p=10)
    est = hll.hll_estimate(regs, p=10).collect()[0]["estimate"]
    assert abs(est / n - 1) < 5 * 1.04 / math.sqrt(1024)


def test_small_range_correction_is_linear_counting(spark):
    """With n << m the estimator must take the m*ln(m/V) branch: for a
    single key, V = m-1 and the estimate is 1024*ln(1024/1023) ~ 1.0005."""
    df = spark.range(1).select(F.col("id").alias("k"))
    est = hll.hll_estimate(hll.hll_registers(df, "k", p=10), p=10).collect()[0][
        "estimate"
    ]
    assert est == round(1024 * math.log(1024 / 1023), 4)


def test_harmonic_sum_is_order_exact():
    """The module's exactness claim: any partial sum of m <= 2^10 terms
    2^-M (M <= 33) fits 43 mantissa bits, so double addition never
    rounds. Worst case: 1023 ones + one 2^-33."""
    vals = [1.0] * 1023 + [2.0**-33]
    fwd = sum(vals)
    rev = sum(reversed(vals))
    assert fwd == rev == 1023 + 2.0**-33


def test_null_keys_are_ignored(spark):
    """NULL keys must not materialize a NULL-bucket row (it would count
    in n_present and bias the estimate); semantics match countDistinct."""
    df = spark.createDataFrame(
        [(1,), (2,), (None,), (None,)], "k long"
    )
    regs = hll.hll_registers(df, "k", p=10)
    assert regs.filter(F.col("bucket").isNull()).count() == 0
    assert regs.count() == 2
    clean = hll.hll_registers(df.filter(F.col("k").isNotNull()), "k", p=10)
    assert sorted(map(tuple, regs.collect())) == sorted(
        map(tuple, clean.collect())
    )


def test_p_bounds_enforced(spark, events):
    with pytest.raises(ValueError):
        hll.hll_registers(events, "user_id", p=11)
    with pytest.raises(ValueError):
        hll.hll_estimate(events, p=3)


def test_register_build_is_single_bounded_aggregate(spark, events):
    """Plan shape: one hash-aggregate pair (partial + final) around one
    shuffle — no join, no expand, nothing proportional to distinct-key
    cardinality crosses the wire."""
    plan = (
        hll.hll_registers(events, "user_id", ["event_type"], p=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_registers_match_replay_property(spark):
    """Hypothesis: for random key sets and precisions, the distributed
    register table equals the hashlib-only replay — the md5 discipline
    holds over the whole input space, not one corpus."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        keys=st.lists(
            st.integers(min_value=-(2**40), max_value=2**40),
            min_size=1,
            max_size=60,
        ),
        p=st.integers(min_value=4, max_value=10),
    )
    def check(keys, p):
        df = spark.createDataFrame([(k,) for k in keys], "k long")
        got = {
            (r.bucket, r.register)
            for r in hll.hll_registers(df, "k", p=p).collect()
        }
        assert got == set(_py_registers(set(keys), p).items())

    check()
