"""Streaming histogram fold: fold == direct build (additive), replay
idempotency via the per-cell epoch guard, convergence from a partially-
applied crash, bounded state, and live quantiles off the folded state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators.histogram import (
    histogram_build,
    histogram_quantiles,
)
from neynar_parquet_importer_spark.sinks.lake_upsert import LakeUpsertSink
from neynar_parquet_importer_spark.streaming.hist_fold import hist_fold_batch

LO, W, NB = 0.0, 10.0, 8


@pytest.fixture()
def sink(spark, tmp_path):
    return LakeUpsertSink(
        spark,
        str(tmp_path / "hist_state"),
        primary_key=("g", "bin"),
        n_buckets=4,
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, "g string, v double")


def _fold(spark, sink, rows, epoch):
    return hist_fold_batch(
        sink, _batch(spark, rows), epoch, "g", "v",
        lo=LO, width=W, n_bins=NB,
    )


def _cells(sink):
    return sorted((r.g, r.bin, r.cnt) for r in sink.read().collect())


BATCHES = [
    [("a", 1.0), ("a", 15.0), ("b", 5.0)],
    [("a", 15.5), ("b", 99.0), ("b", 5.5)],
    [("a", 42.0), ("a", 1.5)],
]


def test_fold_equals_direct_build(spark, sink):
    for epoch, rows in enumerate(BATCHES):
        _fold(spark, sink, rows, epoch)
    want = sorted(
        (r.g, r.bin, r.cnt)
        for r in histogram_build(
            _batch(spark, [r for b in BATCHES for r in b]),
            ["g"], "v", LO, W, NB,
        ).collect()
    )
    assert _cells(sink) == want


def test_replay_is_idempotent(spark, sink):
    _fold(spark, sink, BATCHES[0], 0)
    _fold(spark, sink, BATCHES[1], 1)
    before = _cells(sink)
    _fold(spark, sink, BATCHES[1], 1)
    assert _cells(sink) == before


def test_converges_from_partially_applied_crash(spark, sink, tmp_path):
    """A crash mid-upsert applied epoch 1 to HALF the cells (stamped 1)
    while the rest still carry epoch 0. Replaying the whole batch lands
    on exactly the no-crash state (the CMS fold's crash protocol)."""
    _fold(spark, sink, BATCHES[0], 0)
    clean = LakeUpsertSink(
        spark,
        str(tmp_path / "hist_clean"),
        primary_key=("g", "bin"),
        n_buckets=4,
    )
    _fold(spark, clean, BATCHES[0], 0)
    _fold(spark, clean, BATCHES[1], 1)
    want = _cells(clean)
    # crash simulation: epoch 1's delta reaches only group 'b' cells
    delta = histogram_build(
        _batch(spark, BATCHES[1]), ["g"], "v", LO, W, NB
    )
    partial = (
        delta.filter(F.col("g") == "b")
        .join(
            sink.read().select(
                "g", "bin", F.col("cnt").alias("__s")
            ),
            ["g", "bin"],
            "left",
        )
        .select(
            "g",
            "bin",
            (F.coalesce("__s", F.lit(0)) + F.col("cnt")).alias("cnt"),
        )
        .withColumn("updated_at", F.lit(1).cast("long"))
    )
    sink.upsert(partial, 1)
    _fold(spark, sink, BATCHES[1], 1)  # supervised full replay
    assert _cells(sink) == want


def test_state_is_bounded_and_quantiles_live(spark, sink):
    import random

    rnd = random.Random(3)
    for epoch in range(4):
        rows = [
            ("g%d" % (i % 3), rnd.uniform(0.0, 79.9)) for i in range(200)
        ]
        _fold(spark, sink, rows, epoch)
    state = sink.read()
    # bounded: at most groups x n_bins rows no matter how many batches
    assert state.count() <= 3 * NB
    q = histogram_quantiles(
        state.select("g", "bin", "cnt"), ["g"], [0.9], LO, W
    )
    rows = {r.g: r for r in q.collect()}
    assert set(rows) == {"g0", "g1", "g2"}
    # 4 epochs x 200 rows split i%3 -> 67/67/66 per epoch
    assert {g: r.n_total for g, r in rows.items()} == {
        "g0": 268, "g1": 268, "g2": 264,
    }
    for r in rows.values():
        assert 0 < r.q_upper <= 80.0
