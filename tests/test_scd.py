"""SCD Type-2 rebuild: collapse null-safety, interval tiling, current
flags. Cross-engine parity is the ``user_scd2_type_history`` oracle
twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators import scd


@pytest.fixture(scope="module")
def changes(spark):
    # key 1: a -> a (collapse) -> NULL -> NULL (collapse) -> b
    # key 2: single row
    return spark.createDataFrame(
        [
            (1, 10, "a"),
            (1, 20, "a"),
            (1, 30, None),
            (1, 40, None),
            (1, 50, "b"),
            (2, 15, "x"),
        ],
        "k long, t long, attr string",
    )


def test_collapse_is_null_safe(spark, changes):
    out = scd.collapse_consecutive(
        changes, ["k"], [F.col("t")], ["attr"]
    )
    got = sorted((r.k, r.t, r.attr) for r in out.collect())
    # NULL -> NULL collapses; a -> NULL and NULL -> b are changes
    assert got == [(1, 10, "a"), (1, 30, None), (1, 50, "b"), (2, 15, "x")]


def test_intervals_tile_and_current_flag(spark, changes):
    hist = scd.scd2_history(
        changes,
        keys=["k"],
        valid_from=F.col("t"),
        order_cols=[F.col("t")],
        attr_cols=["attr"],
    )
    rows = sorted(
        (r.k, r.valid_from, r.valid_to, r.version_n, r.is_current)
        for r in hist.collect()
    )
    assert rows == [
        (1, 10, 30, 1, False),
        (1, 30, 50, 2, False),
        (1, 50, None, 3, True),
        (2, 15, None, 1, True),
    ]
    # half-open intervals tile each key's timeline: every non-current
    # valid_to equals the next version's valid_from (asserted above by
    # value) and exactly one current row per key
    per_key_current = {}
    for k, _, _, _, cur in rows:
        per_key_current[k] = per_key_current.get(k, 0) + int(cur)
    assert all(v == 1 for v in per_key_current.values())


def test_total_order_tiebreak(spark):
    """Same-timestamp changes are ordered by the tiebreak column, making
    the history deterministic."""
    df = spark.createDataFrame(
        [(1, 10, 2, "b"), (1, 10, 1, "a")],
        "k long, t long, seq long, attr string",
    )
    hist = scd.scd2_history(
        df,
        keys=["k"],
        valid_from=F.col("t") * 100 + F.col("seq"),
        order_cols=[F.col("t"), F.col("seq")],
        attr_cols=["attr"],
    )
    rows = sorted((r.attr, r.version_n) for r in hist.collect())
    assert rows == [("a", 1), ("b", 2)]


def test_single_exchange_for_both_windows(spark, changes):
    """Collapse and intervalize share the partition key, so Catalyst
    plans ONE shuffle for the whole rebuild."""
    hist = scd.scd2_history(
        changes,
        keys=["k"],
        valid_from=F.col("t"),
        order_cols=[F.col("t")],
        attr_cols=["attr"],
    )
    plan = hist._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "SinglePartition" not in plan
