"""Data-quality audit: violation metrics, NULL-conservative semantics,
single-scan plan shape. Cross-engine parity is the
``orders_quality_audit`` oracle twin (which also exercises a failing
constraint on real data via the deliberate unique_probe)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators import audit as aud


@pytest.fixture(scope="module")
def dirty(spark):
    # 1 null key, a duplicated id, a negative amount, a NULL amount
    return spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (1, 20.0, "B"),
            (2, -5.0, "A"),
            (3, None, "C"),
            (None, 40.0, "zz"),
        ],
        "id long, amount double, cat string",
    )


def test_metrics_and_failures(spark, dirty):
    out = aud.table_audit(
        dirty,
        [
            aud.Check("id.complete", aud.completeness("id")),
            aud.Check("id.unique", aud.uniqueness("id")),
            aud.Check(
                "amount.positive", aud.satisfies(F.col("amount") > 0)
            ),
            aud.Check(
                "cat.domain",
                aud.satisfies(F.col("cat").isin("A", "B", "C")),
                threshold=0.8,
            ),
        ],
    )
    rows = {r.constraint: r for r in out.collect()}
    assert rows["id.complete"].metric == 0.8
    assert not rows["id.complete"].passed
    # count_distinct ignores NULLs in both engines: 3 distinct ids / 5
    assert rows["id.unique"].metric == 0.6
    # NULL amount counts as violation (conservative), negative too
    assert rows["amount.positive"].metric == 0.6
    assert not rows["amount.positive"].passed
    # 4/5 in domain, threshold 0.8 -> passes
    assert rows["cat.domain"].metric == 0.8
    assert rows["cat.domain"].passed


def test_referential_integrity_null_fk_violates(spark, dirty):
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    out = aud.referential_integrity(
        dirty, "id", parent, "pk", "id.ref_parent"
    ).collect()[0]
    # ids 1,1,2 match; 3 and NULL violate
    assert out.metric == 0.6
    assert not out.passed


def test_single_scan_per_table(spark, dirty):
    """However many constraints, the single-table suite is ONE scan and
    one partial+final aggregate — no per-constraint jobs."""
    out = aud.table_audit(
        dirty,
        [
            aud.Check("id.complete", aud.completeness("id")),
            aud.Check("id.unique", aud.uniqueness("id")),
            aud.Check(
                "amount.positive", aud.satisfies(F.col("amount") > 0)
            ),
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") == 1
