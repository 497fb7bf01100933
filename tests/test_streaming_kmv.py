"""Streaming KMV fold: fold == direct build, replay idempotency,
rank-keyed state bounded at groups x k, untouched groups left alone,
and overlap answers from the folded state. W10 sink-as-state applied
to the k-minimum-values sketch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators.kmv import (
    kmv_estimate,
    kmv_pair_overlap,
    kmv_sketch,
)
from neynar_parquet_importer_spark.sinks.lake_upsert import LakeUpsertSink
from neynar_parquet_importer_spark.streaming.kmv_distinct import (
    kmv_fold_batch,
)

K = 32


@pytest.fixture()
def sink(spark, tmp_path):
    return LakeUpsertSink(
        spark,
        str(tmp_path / "kmv_state"),
        primary_key=("g", "rn"),
        n_buckets=4,
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, "g string, k long")


BATCHES = [
    [("a", i) for i in range(50)] + [("b", i) for i in range(10)],
    [("a", i) for i in range(25, 80)],
    [("b", i) for i in range(5, 40)] + [("a", 0)],
]


def test_fold_equals_direct_build(spark, sink):
    """Three folds leave the sink with EXACTLY the sketch a single
    build over the union produces — hv for hv, rank for rank."""
    est = None
    for epoch, rows in enumerate(BATCHES):
        est = kmv_fold_batch(sink, _batch(spark, rows), epoch, "k", ["g"], k=K)
    all_rows = _batch(spark, [r for b in BATCHES for r in b])
    want = sorted(
        (r.g, r.rn, r.hv)
        for r in kmv_sketch(all_rows, "k", ["g"], k=K).collect()
    )
    got = sorted(
        (r.g, r.rn, r.hv)
        for r in sink.read().select("g", "rn", "hv").collect()
    )
    assert got == want
    want_est = {
        (r.g, r.n_sketch, r.est)
        for r in kmv_estimate(
            kmv_sketch(all_rows, "k", ["g"], k=K), ["g"], k=K
        ).collect()
    }
    assert {(r.g, r.n_sketch, r.est) for r in est.collect()} == want_est


def test_replay_is_idempotent(spark, sink):
    for epoch, rows in enumerate(BATCHES):
        kmv_fold_batch(sink, _batch(spark, rows), epoch, "k", ["g"], k=K)
    before = sorted(map(tuple, sink.read().select("g", "rn", "hv").collect()))
    # crash-replay: the last epoch folds again with the same id
    kmv_fold_batch(sink, _batch(spark, BATCHES[-1]), 2, "k", ["g"], k=K)
    after = sorted(map(tuple, sink.read().select("g", "rn", "hv").collect()))
    assert before == after


def test_untouched_groups_left_alone(spark, sink):
    kmv_fold_batch(sink, _batch(spark, BATCHES[0]), 0, "k", ["g"], k=K)
    b_rows = sorted(
        (r.rn, r.hv)
        for r in sink.read().filter(F.col("g") == "b").collect()
    )
    # an a-only batch must not rewrite b's rows
    kmv_fold_batch(
        sink, _batch(spark, [("a", i) for i in range(100, 160)]), 1,
        "k", ["g"], k=K,
    )
    after = sorted(
        (r.rn, r.hv)
        for r in sink.read().filter(F.col("g") == "b").collect()
    )
    assert after == b_rows


def test_state_is_rank_bounded(spark, sink):
    for epoch, rows in enumerate(BATCHES):
        kmv_fold_batch(sink, _batch(spark, rows), epoch, "k", ["g"], k=K)
    counts = sink.read().groupBy("g").count().collect()
    assert all(r["count"] <= K for r in counts)
    ranks = sink.read().groupBy("g").agg(F.max("rn").alias("m"),
                                         F.count("*").alias("n")).collect()
    # ranks are dense 1..n
    assert all(r["m"] == r["n"] for r in ranks)


def test_overlap_from_folded_state(spark, sink):
    """The persisted state answers cross-group overlap without touching
    the stream again — and exactly (sets here are below k)."""
    for epoch, rows in enumerate(BATCHES):
        kmv_fold_batch(sink, _batch(spark, rows), epoch, "k", ["g"], k=128)
    # rebuild sketch frame shape from state and ask for the overlap
    sk = sink.read().select("g", "hv", "rn")
    ov = kmv_pair_overlap(sk, "g", k=128).collect()[0]
    a = {i for i in range(80)}  # union of a-batches
    b = {i for i in range(5, 40)} | {i for i in range(10)}
    true_j = len(a & b) / len(a | b)
    assert ov["jaccard_est"] == pytest.approx(true_j)
    assert ov["union_est"] == float(len(a | b))
