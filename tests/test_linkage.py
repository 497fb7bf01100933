"""Blocked fuzzy linkage: planted-edit recovery, block-cap discipline,
length pre-filter losslessness, best-match determinism. Cross-engine
parity is the ``fuzzy_customer_linkage`` / ``linkage_self_match_rate``
oracle twins."""

from __future__ import annotations

import pytest

from neynar_parquet_importer_spark.operators import linkage as lk


@pytest.fixture(scope="module")
def sides(spark):
    clean = spark.createDataFrame(
        [
            (1, "B1", "alpha"),
            (2, "B1", "alphq"),   # 1 edit from 'alpha'
            (3, "B2", "alpha"),   # same text, other block
            (4, "B1", "gamma"),
        ],
        "rid long, blk string, name string",
    )
    dirty = spark.createDataFrame(
        [
            (10, "B1", "alpha"),      # exact within block
            (11, "B1", "alphaXY"),    # 2 inserts
            (12, "B2", "delta"),      # no match within 2
            (13, "B3", "alpha"),      # block with no clean rows
        ],
        "lid long, blk string, name string",
    )
    return dirty, clean


def _pairs(dirty, clean, **kw):
    return lk.blocked_pairs(
        dirty,
        clean,
        block_cols=["blk"],
        left_id="lid",
        right_id="rid",
        left_text="name",
        right_text="name",
        max_distance=2,
        **kw,
    )


def test_planted_edits_exact_set(spark, sides):
    dirty, clean = sides
    got = {
        (r.lid, r.rid): r.distance for r in _pairs(dirty, clean).collect()
    }
    # cross-block 'alpha' (rid 3) must NOT match lid 10 or 13; lid 12
    # has no within-2 neighbor; lid 13's block has no clean rows
    assert got == {(10, 1): 0, (10, 2): 1, (11, 1): 2}


def test_length_prefilter_is_lossless(spark, sides):
    """|len(a)-len(b)| <= d is a lower bound on edit distance, so the
    pre-filter can never drop a true match — pairs with and without it
    agree (the without-side here is a direct cross-block-join replay)."""
    dirty, clean = sides
    with_filter = {
        (r.lid, r.rid, r.distance)
        for r in _pairs(dirty, clean).collect()
    }
    import pyspark.sql.functions as F

    raw = (
        dirty.withColumnRenamed("name", "dn")
        .join(clean.withColumnRenamed("name", "cn"), "blk")
        .withColumn("distance", F.levenshtein("dn", "cn"))
        .filter(F.col("distance") <= 2)
    )
    without = {
        (r.lid, r.rid, r.distance) for r in raw.collect()
    }
    assert with_filter == without


def test_block_cap_drops_oversized_blocks(spark, sides):
    dirty, clean = sides
    capped = _pairs(dirty, clean, max_block=1).collect()
    # block B1 has 2 dirty rows -> dropped entirely; B2/B3 yield nothing
    assert capped == []
    prof = {
        r.blk: (r.block_n, r.dropped)
        for r in lk.block_profile(dirty, ["blk"], max_block=1).collect()
    }
    assert prof["B1"] == (2, True)
    assert prof["B2"] == (1, False)


def test_best_match_deterministic_tiebreak(spark):
    pairs = spark.createDataFrame(
        [(1, 100, 1), (1, 50, 1), (1, 60, 0), (2, 70, 2)],
        "lid long, rid long, distance int",
    )
    best = {
        r.lid: (r.rid, r.distance)
        for r in lk.best_match(pairs, "lid", "rid").collect()
    }
    assert best == {1: (60, 0), 2: (70, 2)}


def test_fine_block_keeps_every_true_pair(spark):
    """The two-pass fine blocking (first-5 UNION last-4) is LOSSLESS for
    the corpus's perturbation family: every (d_key == c_custkey) pair
    the exact nation-blocked join finds must survive the fine blocks —
    the recall contract the query's docstring proves by case analysis."""
    from pyspark.sql import functions as F

    from neynar_parquet_importer_spark.plans.queries import (
        QUERIES,
        _linkage_pairs,
    )

    sf = "/root/testdata/sf0.001"
    exact_true = (
        _linkage_pairs(spark, sf)
        .filter(F.col("d_key") == F.col("c_custkey"))
        .count()
    )
    fine = QUERIES["fuzzy_customer_linkage_fine_block"](spark, sf)
    fine_true = fine.agg(F.sum("n_true")).first()[0]
    n_customers = spark.read.parquet(f"{sf}/customer.parquet").count()
    assert exact_true == n_customers  # every perturbation stays within tau
    assert fine_true == exact_true
