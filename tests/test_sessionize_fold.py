"""Sink-as-state sessionize fold: fold == single-pass ground truth,
cross-batch session stitching, replay idempotency, crash convergence
(closed-before-open write order), bounded state, gap boundary."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.sinks.lake_upsert import LakeUpsertSink
from neynar_parquet_importer_spark.streaming.sessionize_fold import (
    batch_segments,
    finalize_sessions,
    sessionize_fold_batch,
)

GAP = 100


@pytest.fixture()
def sinks(spark, tmp_path):
    open_sink = LakeUpsertSink(
        spark, str(tmp_path / "open"), primary_key=("user_id",), n_buckets=4
    )
    closed_sink = LakeUpsertSink(
        spark,
        str(tmp_path / "closed"),
        primary_key=("user_id", "session_start"),
        n_buckets=4,
    )
    return open_sink, closed_sink


def _batch(spark, rows):
    return spark.createDataFrame(rows, "user_id long, es long")


def _reference(events, gap):
    """Single-pass python sessionizer: {user: [(start, end, n), ...]},
    last tuple per user is the still-open session."""
    from collections import defaultdict

    out = defaultdict(list)
    per_user = defaultdict(list)
    for u, es in events:
        per_user[u].append(es)
    for u, ts in per_user.items():
        for es in sorted(ts):
            if not out[u] or es - out[u][-1][1] > gap:
                out[u].append((es, es, 1))
            else:
                s, _, n = out[u][-1]
                out[u][-1] = (s, es, n + 1)
    return dict(out)


# per-user time-ordered batches (the fold's W7 in-order contract);
# user 1 stitches a session across batches 0->1, then gaps; user 2 has
# an in-batch gap; user 3 appears once and stays open
BATCHES = [
    [(1, 100), (1, 150), (2, 100)],
    [(1, 200), (2, 500), (2, 550)],
    [(1, 900), (3, 1000), (1, 950)],
]


def _fold_all(spark, sinks, batches=BATCHES):
    open_sink, closed_sink = sinks
    for epoch, rows in enumerate(batches):
        sessionize_fold_batch(
            open_sink, closed_sink, _batch(spark, rows), epoch, gap_s=GAP
        )


def _observed(sinks):
    open_sink, closed_sink = sinks
    closed = closed_sink.read()
    closed_rows = (
        set()
        if closed is None
        else {
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in closed.collect()
        }
    )
    open_rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in finalize_sessions(open_sink).collect()
    }
    return closed_rows, open_rows


def test_fold_matches_single_pass_reference(spark, sinks):
    _fold_all(spark, sinks)
    ref = _reference([e for b in BATCHES for e in b], GAP)
    want_open = {(u, *s[-1]) for u, s in ref.items()}
    want_closed = {(u, *t) for u, s in ref.items() for t in s[:-1]}
    closed_rows, open_rows = _observed(sinks)
    assert open_rows == want_open
    assert closed_rows == want_closed
    # the cross-batch stitch really happened: user 1's first session
    # spans batches 0 and 1 (100..200, 3 events)
    assert (1, 100, 200, 3) in closed_rows


def test_gap_boundary_extends(spark, sinks):
    open_sink, closed_sink = sinks
    sessionize_fold_batch(
        open_sink, closed_sink, _batch(spark, [(7, 0)]), 0, gap_s=GAP
    )
    # exactly gap_s later: extends (the batch twin's `> gap` split rule)
    sessionize_fold_batch(
        open_sink, closed_sink, _batch(spark, [(7, 100)]), 1, gap_s=GAP
    )
    closed_rows, open_rows = _observed(sinks)
    assert closed_rows == set()
    assert open_rows == {(7, 0, 100, 2)}


def test_replay_is_idempotent(spark, sinks):
    open_sink, closed_sink = sinks
    for epoch, rows in enumerate(BATCHES[:2]):
        sessionize_fold_batch(
            open_sink, closed_sink, _batch(spark, rows), epoch, gap_s=GAP
        )
    before = _observed(sinks)
    sessionize_fold_batch(
        open_sink, closed_sink, _batch(spark, BATCHES[1]), 1, gap_s=GAP
    )
    assert _observed(sinks) == before


def test_converges_from_crash_between_sinks(spark, sinks, tmp_path):
    """Crash AFTER the closed write, BEFORE the open-state write: the
    user is unstamped, so replay recomputes from the unchanged
    pre-state — identical closed rows (idempotent PK upsert) plus the
    missed open-state update."""
    open_sink, closed_sink = sinks
    sessionize_fold_batch(
        open_sink, closed_sink, _batch(spark, BATCHES[0]), 0, gap_s=GAP
    )
    clean_open = LakeUpsertSink(
        spark, str(tmp_path / "co"), primary_key=("user_id",), n_buckets=4
    )
    clean_closed = LakeUpsertSink(
        spark,
        str(tmp_path / "cc"),
        primary_key=("user_id", "session_start"),
        n_buckets=4,
    )
    for epoch, rows in enumerate(BATCHES[:2]):
        sessionize_fold_batch(
            clean_open, clean_closed, _batch(spark, rows), epoch, gap_s=GAP
        )
    want = _observed((clean_open, clean_closed))
    # crash simulation: epoch 1's CLOSED rows land, open state doesn't
    closed_only = sessionize_fold_batch(
        open_sink, closed_sink, _batch(spark, BATCHES[1]), 1, gap_s=GAP
    )
    # roll the open sink back to its epoch-0 state by rebuilding it
    rolled = LakeUpsertSink(
        spark, str(tmp_path / "ro"), primary_key=("user_id",), n_buckets=4
    )
    sessionize_fold_batch(
        rolled, clean_closed, _batch(spark, BATCHES[0]), 0, gap_s=GAP
    )
    # supervised retry of epoch 1 against the stale open state
    sessionize_fold_batch(
        rolled, closed_sink, _batch(spark, BATCHES[1]), 1, gap_s=GAP
    )
    assert _observed((rolled, closed_sink)) == want


def test_open_state_is_bounded_by_users(spark, sinks):
    open_sink, closed_sink = sinks
    import random

    rnd = random.Random(5)
    t = 0
    for epoch in range(4):
        rows = []
        for _ in range(300):
            t += rnd.randint(1, 200)
            rows.append((t % 7, t))
        rows.sort(key=lambda r: r[1])
        sessionize_fold_batch(
            open_sink, closed_sink, _batch(spark, rows), epoch, gap_s=GAP
        )
    assert open_sink.read().count() <= 7
