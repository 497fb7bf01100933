"""Streaming CMS fold: fold == direct build (additive), replay
idempotency via the per-cell epoch guard, convergence from a
partially-applied crash state, and the bounded-state property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators.cms import cms_build, cms_estimate
from neynar_parquet_importer_spark.sinks.lake_upsert import LakeUpsertSink
from neynar_parquet_importer_spark.streaming.cms_count import cms_fold_batch

W, D = 64, 3


@pytest.fixture()
def sink(spark, tmp_path):
    return LakeUpsertSink(
        spark,
        str(tmp_path / "cms_state"),
        primary_key=("row", "col"),
        n_buckets=4,
    )


def _batch(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k long")


def _cells(sink):
    return sorted(
        (r.row, r.col, r.cnt) for r in sink.read().collect()
    )


def test_fold_equals_direct_build(spark, sink):
    batches = [
        [1, 1, 2, 3],
        [2, 2, 2, 4, 5],
        [1, 5, 5, 6],
    ]
    for epoch, keys in enumerate(batches):
        cms_fold_batch(sink, _batch(spark, keys), epoch, "k", width=W, depth=D)
    want = sorted(
        (r.row, r.col, r.cnt)
        for r in cms_build(
            _batch(spark, [k for b in batches for k in b]),
            "k",
            width=W,
            depth=D,
        ).collect()
    )
    assert _cells(sink) == want
    # and the probe path sees exact counts on this collision-free corpus
    truth = (
        _batch(spark, [k for b in batches for k in b])
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    est = cms_estimate(truth, sink.read(), "k", width=W, depth=D)
    assert est.filter(F.col("est_count") < F.col("t")).count() == 0


def test_replay_is_idempotent(spark, sink):
    """Re-folding an already-applied batch at the SAME epoch must leave
    every cell unchanged (the per-cell guard zeroes the delta)."""
    cms_fold_batch(sink, _batch(spark, [1, 2, 2, 3]), 0, "k", width=W, depth=D)
    cms_fold_batch(sink, _batch(spark, [2, 3, 3, 4]), 1, "k", width=W, depth=D)
    before = _cells(sink)
    cms_fold_batch(sink, _batch(spark, [2, 3, 3, 4]), 1, "k", width=W, depth=D)
    assert _cells(sink) == before


def test_converges_from_partially_applied_crash(spark, sink):
    """Simulate a crash mid-upsert: only HALF of epoch 1's merged cells
    reached the sink (stamped at 1), the rest still carry epoch 0.
    Replaying the whole batch must land on exactly the no-crash state —
    stamped cells keep their absorbed value, unstamped ones get the
    delta applied."""
    b0, b1 = [1, 2, 3, 3], [3, 4, 4, 5]
    cms_fold_batch(sink, _batch(spark, b0), 0, "k", width=W, depth=D)
    # the state a clean epoch-1 fold would produce
    clean = LakeUpsertSink(
        spark,
        sink.root + "_clean",
        primary_key=("row", "col"),
        n_buckets=4,
    )
    cms_fold_batch(clean, _batch(spark, b0), 0, "k", width=W, depth=D)
    cms_fold_batch(clean, _batch(spark, b1), 1, "k", width=W, depth=D)
    want = _cells(clean)
    # crash simulation: apply epoch 1 to an arbitrary half of the cells
    delta = cms_build(_batch(spark, b1), "k", width=W, depth=D)
    partial = (
        delta.filter(F.col("col") % 2 == 0)
        .join(
            sink.read().select(
                "row", "col", F.col("cnt").alias("__s")
            ),
            ["row", "col"],
            "left",
        )
        .select(
            "row",
            "col",
            (F.coalesce("__s", F.lit(0)) + F.col("cnt")).alias("cnt"),
        )
        .withColumn("updated_at", F.lit(1).cast("long"))
    )
    sink.upsert(partial, 1)
    # full replay of epoch 1
    cms_fold_batch(sink, _batch(spark, b1), 1, "k", width=W, depth=D)
    assert _cells(sink) == want


def test_state_is_cell_bounded(spark, sink):
    for epoch in range(3):
        keys = list(range(epoch * 1000, epoch * 1000 + 500))
        cms_fold_batch(sink, _batch(spark, keys), epoch, "k", width=W, depth=D)
    assert sink.read().count() <= W * D
