"""Time-series resample/gap-fill: grid bounds, forward-fill semantics,
exact gap counts. Cross-engine parity is the ``events_daily_resampled``
oracle twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators import timeseries as tss


@pytest.fixture(scope="module")
def series(spark):
    # key A: observations at buckets 0, 20, 30 (gap at 10); key B: one
    # observation (degenerate single-bucket grid); value NULL at A/20
    # exercises fill-through-null-observation
    return spark.createDataFrame(
        [
            ("A", 0, 1.0),
            ("A", 5, 3.0),
            ("A", 20, None),
            ("A", 30, 7.0),
            ("B", 12, 9.0),
        ],
        "k string, t long, v double",
    )


def test_dense_grid_inclusive_bounds(spark, series):
    observed = series.select(
        "k", (F.floor(F.col("t") / 10) * 10).alias("b")
    ).distinct()
    grid = tss.dense_grid(observed, ["k"], "b", 10)
    got = {(r.k, r.b) for r in grid.collect()}
    assert got == {
        ("A", 0),
        ("A", 10),
        ("A", 20),
        ("A", 30),
        ("B", 10),
    }


def test_resample_fill_forward_and_gap_counts(spark, series):
    out = tss.resample_fill(
        series,
        keys=["k"],
        epoch_col=F.col("t").cast("double"),
        step=10,
        aggs={"avg_v": F.round(F.avg("v"), 4)},
        fill_cols=["avg_v"],
    )
    rows = {(r.k, r.bucket_start): r for r in out.collect()}
    # bucket 0 aggregates both observations
    assert rows[("A", 0)].n_events == 2
    assert rows[("A", 0)].avg_v == 2.0
    # gap bucket: zero events, value carried forward
    assert rows[("A", 10)].n_events == 0
    assert rows[("A", 10)].avg_v == 2.0
    # observed bucket whose aggregate is NULL (all-null values): the
    # fill carries the last non-null PAST it, and the count stays exact
    assert rows[("A", 20)].n_events == 1
    assert rows[("A", 20)].avg_v == 2.0
    assert rows[("A", 30)].avg_v == 7.0
    # single-observation key: one-bucket grid, no gaps
    assert [k for k in rows if k[0] == "B"] == [("B", 10)]
    assert rows[("B", 10)].n_events == 1


def test_fill_window_is_partitioned(spark, series):
    """The fill must never plan a global (single-partition) window."""
    out = tss.resample_fill(
        series,
        keys=["k"],
        epoch_col=F.col("t").cast("double"),
        step=10,
        aggs={"avg_v": F.round(F.avg("v"), 4)},
        fill_cols=["avg_v"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
