"""Incremental follow-count maintenance (A3): folding per-batch deltas
must equal a full rebuild over the final edge state, for any batch
split, including unfollow (deleted_at) and re-follow transitions."""

from __future__ import annotations

import random

from neynar_parquet_importer_spark.graph.counts import (
    empty_counts,
    follow_counts_delta,
    follow_counts_full,
    merge_counts,
)

SCHEMA = "fid long, target_fid long, deleted_at string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_delta_fold_equals_full_rebuild(spark):
    """Random edge lifecycles (follow -> unfollow -> re-follow) split
    into batches: state folded batch-by-batch == rebuild from the final
    version of every edge."""
    rng = random.Random(7)
    edges = [(rng.randrange(6), rng.randrange(6)) for _ in range(40)]
    edges = list(dict.fromkeys((f, t) for f, t in edges if f != t))
    # lifecycle: each edge gets 1-3 versions alternating live/deleted
    versions = []
    for f, t in edges:
        n = rng.randrange(1, 4)
        for v in range(n):
            deleted = None if v % 2 == 0 else "2024-01-01"
            versions.append((f, t, deleted, v))
    rng.shuffle(versions)
    # batches must apply an edge's versions in order: sort within edge
    versions.sort(key=lambda r: r[3])
    cuts = sorted(rng.sample(range(1, len(versions)), 3))
    batches = [
        versions[a:b] for a, b in zip([0] + cuts, cuts + [len(versions)])
    ]

    current: dict[tuple[int, int], tuple] = {}
    state = empty_counts(spark)
    for batch in batches:
        # last version per edge within the batch (last-writer-wins dedup)
        latest = {}
        for f, t, deleted, v in batch:
            latest[(f, t)] = (f, t, deleted)
        prev_rows = [current[k] for k in latest if k in current]
        batch_df = _df(spark, list(latest.values()))
        prev_df = _df(spark, prev_rows) if prev_rows else None
        state = merge_counts(state, follow_counts_delta(batch_df, prev_df))
        current.update(latest)

    full = follow_counts_full(_df(spark, list(current.values())))
    assert _sorted(state) == _sorted(full)


def test_restating_unchanged_edges_is_idempotent(spark):
    """Re-sending an identical batch (same versions) contributes zero
    delta — the upsert-driven reimport case."""
    batch = _df(spark, [(1, 2, None), (2, 3, None), (3, 1, "2024-01-01")])
    state = merge_counts(empty_counts(spark), follow_counts_delta(batch, None))
    again = follow_counts_delta(batch, batch)
    state2 = merge_counts(state, again)
    assert _sorted(state) == _sorted(state2)


def test_unfollow_drops_fid_from_state(spark):
    """A fid whose only live edge is deleted disappears from state,
    matching the full rebuild's live-edge universe."""
    b1 = _df(spark, [(1, 2, None)])
    state = merge_counts(empty_counts(spark), follow_counts_delta(b1, None))
    b2 = _df(spark, [(1, 2, "2024-01-02")])
    state = merge_counts(state, follow_counts_delta(b2, b1))
    assert _sorted(state) == []


def test_sink_as_state_fold_matches_rebuild(spark, tmp_path):
    """W10-style maintenance: edges and counts live in bucketed upsert
    sinks; folding three micro-batches (with an unfollow, a stale replay,
    and a re-follow) matches the full rebuild of the final edge state."""
    from neynar_parquet_importer_spark.graph.counts import (
        fold_counts_batch,
        read_counts,
    )
    from neynar_parquet_importer_spark.sinks import LakeUpsertSink

    edge_sink = LakeUpsertSink(
        spark, str(tmp_path / "edges"), ("fid", "target_fid"), "updated_at"
    )
    counts_sink = LakeUpsertSink(
        spark, str(tmp_path / "counts"), ("fid",), "updated_at"
    )
    schema = "fid long, target_fid long, deleted_at string, updated_at long"
    b1 = spark.createDataFrame(
        [(1, 2, None, 10), (2, 3, None, 10), (3, 2, None, 10)], schema
    )
    b2 = spark.createDataFrame(
        [(1, 2, "2024-01-05", 20), (2, 1, None, 20)], schema
    )
    # stale replay of the original (1,2) live version + a re-follow of (1,2)
    b3 = spark.createDataFrame(
        [(1, 2, None, 10), (3, 2, "2024-01-06", 30)], schema
    )
    for epoch, b in enumerate([b1, b2, b3], start=1):
        fold_counts_batch(spark, edge_sink, counts_sink, b, epoch)

    final_edges = spark.createDataFrame(
        [(1, 2, "2024-01-05", 20), (2, 3, None, 10), (2, 1, None, 20)], schema
    )
    full = follow_counts_full(final_edges)
    got = sorted(tuple(r) for r in read_counts(counts_sink).collect())
    want = sorted(tuple(r) for r in full.collect())
    assert got == want


def test_sink_as_state_fold_random_lifecycles(spark, tmp_path):
    """Randomized edge lifecycles (seeded): versions of each edge arrive
    in order across four batches with rising updated_at; the sink-fed
    fold must match the rebuild of the final versions."""
    import random

    from neynar_parquet_importer_spark.graph.counts import (
        fold_counts_batch,
        read_counts,
    )
    from neynar_parquet_importer_spark.sinks import LakeUpsertSink

    rng = random.Random(99)
    schema = "fid long, target_fid long, deleted_at string, updated_at long"
    edges = list({(rng.randrange(5), rng.randrange(5)) for _ in range(20)})
    versions = []
    for f, t in edges:
        for v in range(rng.randrange(1, 4)):
            deleted = None if rng.random() < 0.6 else "2024-01-01"
            versions.append((f, t, deleted, v))
    versions.sort(key=lambda r: r[3])  # within-edge version order
    cuts = sorted(rng.sample(range(1, len(versions)), 3))
    batches = [versions[a:b] for a, b in zip([0] + cuts, cuts + [len(versions)])]

    edge_sink = LakeUpsertSink(
        spark, str(tmp_path / "e"), ("fid", "target_fid"), "updated_at"
    )
    counts_sink = LakeUpsertSink(spark, str(tmp_path / "c"), ("fid",), "updated_at")
    final = {}
    for epoch, b in enumerate(batches, start=1):
        fold_counts_batch(
            spark, edge_sink, counts_sink, spark.createDataFrame(b, schema), epoch
        )
        for f, t, d, v in b:
            final[(f, t)] = (f, t, d, v)

    full = follow_counts_full(spark.createDataFrame(list(final.values()), schema))
    got = sorted(tuple(r) for r in read_counts(counts_sink).collect())
    want = sorted(tuple(r) for r in full.collect())
    assert got == want


def test_sink_as_state_fold_crash_replay_is_idempotent(spark, tmp_path):
    """Crash between the counts upsert and the edge upsert, then replay
    the same batch: the epoch guard must not double-apply the delta."""
    import shutil

    from neynar_parquet_importer_spark.graph.counts import (
        fold_counts_batch,
        read_counts,
    )
    from neynar_parquet_importer_spark.sinks import LakeUpsertSink

    schema = "fid long, target_fid long, deleted_at string, updated_at long"
    e_root, c_root = str(tmp_path / "e"), str(tmp_path / "c")
    edge_sink = LakeUpsertSink(spark, e_root, ("fid", "target_fid"), "updated_at")
    counts_sink = LakeUpsertSink(spark, c_root, ("fid",), "updated_at")

    b1 = spark.createDataFrame([(1, 2, None, 10)], schema)
    fold_counts_batch(spark, edge_sink, counts_sink, b1, 1)
    # snapshot the edge sink BEFORE batch 2 so we can roll it back
    shutil.copytree(e_root, str(tmp_path / "e_snap"))

    b2 = spark.createDataFrame([(2, 3, None, 20)], schema)
    fold_counts_batch(spark, edge_sink, counts_sink, b2, 2)

    # simulate the crash: counts absorbed epoch 2, edge advance lost
    shutil.rmtree(e_root)
    shutil.copytree(str(tmp_path / "e_snap"), e_root)
    edge_sink = LakeUpsertSink(spark, e_root, ("fid", "target_fid"), "updated_at")

    fold_counts_batch(spark, edge_sink, counts_sink, b2, 2)  # replay
    got = sorted(tuple(r) for r in read_counts(counts_sink).collect())
    assert got == [(1, 0, 1), (2, 1, 1), (3, 1, 0)], got
    assert edge_sink.read().count() == 2  # edge advance completed on replay


def test_fold_survives_partial_counts_swap_crash(spark, tmp_path):
    """The lake sink swaps bucket dirs one at a time, so a crash mid-
    counts-upsert stamps SOME delta fids at the new epoch and not others.
    A whole-batch epoch gate would see one stamped row and skip the
    replay, silently losing the un-swapped fids' deltas; the per-fid
    guard must re-apply exactly the missing ones and converge to the
    full rebuild."""
    from pyspark.sql import functions as F

    from neynar_parquet_importer_spark.graph.counts import (
        fold_counts_batch,
        read_counts,
    )
    from neynar_parquet_importer_spark.sinks import LakeUpsertSink

    schema = "fid long, target_fid long, deleted_at string, updated_at long"
    edge_sink = LakeUpsertSink(
        spark, str(tmp_path / "e"), ("fid", "target_fid"), "updated_at"
    )
    counts_sink = LakeUpsertSink(spark, str(tmp_path / "c"), ("fid",), "updated_at")

    b1 = spark.createDataFrame(
        [(1, 2, None, 10), (3, 4, None, 10), (5, 6, None, 10)], schema
    )
    fold_counts_batch(spark, edge_sink, counts_sink, b1, 1)

    # epoch 2 touches fids {1, 2, 7, 8}: simulate a crash that swapped
    # only the buckets holding fids 1 and 2 (stamped at epoch 2, delta
    # applied) while 7/8's buckets never swapped and the edge advance
    # never ran
    b2 = spark.createDataFrame([(1, 2, "2024-01-01", 20), (7, 8, None, 20)], schema)
    partially_applied = spark.createDataFrame(
        [(1, 0, 0, 2), (2, 0, 0, 2)],
        "fid long, follower_count long, following_count long, updated_at long",
    )
    counts_sink.upsert(partially_applied, 2)

    fold_counts_batch(spark, edge_sink, counts_sink, b2, 2)  # replay

    final_edges = spark.createDataFrame(
        [
            (1, 2, "2024-01-01", 20),
            (3, 4, None, 10),
            (5, 6, None, 10),
            (7, 8, None, 20),
        ],
        schema,
    )
    want = sorted(tuple(r) for r in follow_counts_full(final_edges).collect())
    got = sorted(tuple(r) for r in read_counts(counts_sink).collect())
    assert got == want, (got, want)
    # and replaying once more is a no-op (all delta fids now stamped)
    fold_counts_batch(spark, edge_sink, counts_sink, b2, 2)
    again = sorted(tuple(r) for r in read_counts(counts_sink).collect())
    assert again == want
