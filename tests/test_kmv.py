"""KMV sketches: hashlib replay of the sketch members, exactness below
k, estimate accuracy within the theoretical band, union-sketch
mergeability, the presence-flag invariant behind the Jaccard estimator,
and NULL handling. Cross-engine parity is the
``kmv_distinct_buyers_per_segment`` / ``kmv_returnflag_part_overlap``
oracle twins."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.catalog import load_table
from neynar_parquet_importer_spark.operators import kmv

SF = "/root/testdata/sf0.001"


def _py_hash(key, seed="kmv"):
    """Signed-64 replay of kmv_hash with hashlib only."""
    d = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()
    hi, lo = int(d[:8], 16), int(d[8:16], 16)
    if hi >= 2**31:
        hi -= 2**32
    return hi * 2**32 + lo


def _py_sketch(keys, k, seed="kmv"):
    hs = sorted({_py_hash(x, seed) for x in keys})
    return hs[:k]


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events")


def test_sketch_matches_hashlib_replay(spark, events):
    """Every (hv, rn) row equals the pure-Python k-min replay."""
    keys = [r[0] for r in events.select("user_id").distinct().collect()]
    expected = _py_sketch(keys, k=32)
    got = sorted(
        (r["rn"], r["hv"])
        for r in kmv.kmv_sketch(events, "user_id", k=32).collect()
    )
    assert got == [(i + 1, h) for i, h in enumerate(expected)]


def test_exact_below_k(spark):
    """A set smaller than k reports its exact size as the estimate."""
    df = spark.range(10).select(F.col("id").alias("key"))
    est = kmv.kmv_estimate(kmv.kmv_sketch(df, "key", k=64), k=64).collect()
    assert len(est) == 1
    assert est[0]["n_sketch"] == 10
    assert est[0]["est"] == 10.0


def test_estimate_within_error_band(spark):
    """(k-1)/F_k lands within 4 standard errors (1/sqrt(k-2)) of the
    true cardinality — the Beyer et al. bound, generous multiplier so
    the fixed corpus can't flake."""
    n, k = 5000, 128
    df = spark.range(n).select(F.col("id").alias("key"))
    est = kmv.kmv_estimate(kmv.kmv_sketch(df, "key", k=k), k=k).collect()[0]
    rse = 1.0 / math.sqrt(k - 2)
    assert abs(est["est"] - n) / n < 4 * rse


def test_union_sketch_mergeable(spark):
    """k smallest of (sketch_A ∪ sketch_B) == k smallest of (A ∪ B):
    the property that lets per-day/source sketches answer union
    questions without revisiting the data."""
    a = spark.range(0, 3000).select(F.col("id").alias("key"))
    b = spark.range(2000, 5000).select(F.col("id").alias("key"))
    k = 64
    sk_a = {r["hv"] for r in kmv.kmv_sketch(a, "key", k=k).collect()}
    sk_b = {r["hv"] for r in kmv.kmv_sketch(b, "key", k=k).collect()}
    direct = [
        r["hv"]
        for r in kmv.kmv_sketch(a.union(b), "key", k=k)
        .orderBy("rn")
        .collect()
    ]
    assert sorted(sk_a | sk_b)[:k] == direct


def test_pair_overlap_flags_and_jaccard(spark):
    """Presence flags inside the union sketch are exact (rank-in-subset
    <= rank-in-union), so the Jaccard estimate approaches the true value
    as k grows — verified against the constructed overlap."""
    n, shift, k = 4000, 3000, 256
    rows = [(("A", i)) for i in range(n)] + [
        ("B", i) for i in range(shift, shift + n)
    ]
    df = spark.createDataFrame(rows, ["g", "key"])
    sk = kmv.kmv_sketch(df, "key", ["g"], k=k)
    ov = kmv.kmv_pair_overlap(sk, "g", k=k).collect()[0]
    true_j = (n - shift) / (n + shift)  # 1000 / 7000
    rse = 1.0 / math.sqrt(k - 2)
    assert ov["g1"] == "A" and ov["g2"] == "B"
    assert ov["n_union_sketch"] == k
    assert abs(ov["jaccard_est"] - true_j) < 4 * rse
    assert abs(ov["union_est"] - (n + shift)) / (n + shift) < 4 * rse


def test_pair_overlap_exact_when_small(spark):
    """Below k the union sketch IS the union: jaccard_est and the
    intersection estimate are exact."""
    rows = [("A", i) for i in range(30)] + [("B", i) for i in range(20, 50)]
    df = spark.createDataFrame(rows, ["g", "key"])
    sk = kmv.kmv_sketch(df, "key", ["g"], k=128)
    ov = kmv.kmv_pair_overlap(sk, "g", k=128).collect()[0]
    assert ov["n_union_sketch"] == 50
    assert ov["n_both"] == 10
    assert ov["jaccard_est"] == pytest.approx(10 / 50)
    assert ov["union_est"] == 50.0
    assert ov["intersection_est"] == pytest.approx(10.0)


def test_null_keys_ignored(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (None,), (2,)], ["key"]
    )
    est = kmv.kmv_estimate(kmv.kmv_sketch(df, "key", k=8), k=8).collect()[0]
    assert est["n_sketch"] == 2


def test_sketch_is_bounded_after_filter(spark, events):
    """The sketch frame never exceeds n_groups x k rows — the bounded
    shuffle contract."""
    sk = kmv.kmv_sketch(events, "user_id", ["event_type"], k=16)
    counts = sk.groupBy("event_type").count().collect()
    assert all(r["count"] <= 16 for r in counts)


def test_null_key_hashes_to_null(spark):
    """kmv_hash must propagate NULL keys to NULL hashes (matching the
    '||'-built DuckDB twin), not silently hash the seed alone — the
    round-7 advisor finding on concat_ws NULL-skipping."""
    df = spark.createDataFrame([("a",), (None,)], ["key"])
    rows = df.select(
        F.col("key"), kmv.kmv_hash("key").alias("hv")
    ).collect()
    by_key = {r["key"]: r["hv"] for r in rows}
    assert by_key["a"] == _py_hash("a")
    assert by_key[None] is None
