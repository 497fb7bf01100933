"""Streaming HLL fold: fold == direct build, crash-replay idempotency,
untouched-state inclusion, bounded state. The W10 sink-as-state
protocol applied to mergeable sketches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators.hll import (
    hll_estimate,
    hll_registers,
)
from neynar_parquet_importer_spark.sinks.lake_upsert import LakeUpsertSink
from neynar_parquet_importer_spark.streaming.hll_count import hll_fold_batch


@pytest.fixture()
def sink(spark, tmp_path):
    return LakeUpsertSink(
        spark,
        str(tmp_path / "hll_state"),
        primary_key=("g", "bucket"),
        n_buckets=4,
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, "g string, k long")


def test_fold_equals_direct_build(spark, sink):
    """Three folds must leave the sink with EXACTLY the register table a
    single build over the union produces, and the final estimates must
    match hll_estimate on the cumulative data."""
    batches = [
        [("a", i) for i in range(50)] + [("b", i) for i in range(10)],
        [("a", i) for i in range(25, 80)],
        [("b", i) for i in range(5, 40)] + [("a", 0)],
    ]
    est = None
    for epoch, rows in enumerate(batches):
        est = hll_fold_batch(
            sink, _batch(spark, rows), epoch, "k", ["g"], p=8
        )
    all_rows = _batch(spark, [r for b in batches for r in b])
    want_regs = sorted(
        map(tuple, hll_registers(all_rows, "k", ["g"], p=8).collect())
    )
    got_regs = sorted(
        map(
            tuple,
            sink.read().select("g", "bucket", "register").collect(),
        )
    )
    assert got_regs == want_regs
    want_est = {
        (r.g, r.estimate)
        for r in hll_estimate(
            hll_registers(all_rows, "k", ["g"], p=8), ["g"], p=8
        ).collect()
    }
    assert {(r.g, r.estimate) for r in est.collect()} == want_est


def test_replay_is_idempotent(spark, sink):
    """Re-folding a batch already in state must change nothing (max is
    monotone) — the crash-replay guarantee."""
    rows = [("a", i) for i in range(40)]
    hll_fold_batch(sink, _batch(spark, rows), 0, "k", ["g"], p=8)
    before = sorted(
        map(tuple, sink.read().select("g", "bucket", "register").collect())
    )
    est = hll_fold_batch(sink, _batch(spark, rows), 1, "k", ["g"], p=8)
    after = sorted(
        map(tuple, sink.read().select("g", "bucket", "register").collect())
    )
    assert before == after
    # and the estimate still reflects the full (unchanged) state
    want = hll_estimate(
        hll_registers(_batch(spark, rows), "k", ["g"], p=8), ["g"], p=8
    ).collect()[0].estimate
    assert est.collect()[0].estimate == want


def test_estimate_includes_untouched_state_buckets(spark, sink):
    """A later batch touching only a few buckets must still estimate the
    group from ALL its state registers, not just the touched ones."""
    hll_fold_batch(
        sink, _batch(spark, [("a", i) for i in range(200)]), 0, "k", ["g"], p=8
    )
    est = hll_fold_batch(
        sink, _batch(spark, [("a", 0)]), 1, "k", ["g"], p=8
    )
    want = hll_estimate(
        hll_registers(
            _batch(spark, [("a", i) for i in range(200)]), "k", ["g"], p=8
        ),
        ["g"],
        p=8,
    ).collect()[0].estimate
    assert est.collect()[0].estimate == want


def test_state_is_register_bounded(spark, sink):
    """However many distinct keys stream by, state never exceeds
    groups x 2^p rows."""
    for epoch in range(3):
        rows = [("a", epoch * 10_000 + i) for i in range(2_000)]
        hll_fold_batch(sink, _batch(spark, rows), epoch, "k", ["g"], p=8)
    assert sink.read().count() <= 256
