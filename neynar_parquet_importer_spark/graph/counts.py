"""Incremental maintenance of the reference's precomputed aggregates
(A3: ``follow_counts`` — follower/following per fid, ``schema/015:1-9``).

Upstream, these counts arrive precomputed and the reference only upserts
them (SURVEY §2.6 A3). When the engine must *recompute* them, a full
rebuild rescans every follow edge — O(table) per refresh, which at
100 TB of edges is not a per-window option. This module maintains the
counts incrementally: each batch contributes a small per-fid delta
(+1 per new live follow, -1 per newly-deleted follow) and the running
state absorbs it with a full-outer merge keyed on fid — O(batch) work
plus a state-sized join that co-partitions on the same key every round,
exactly the shape of the Postgres-upsert sink the counts feed.

Batch contract: a batch is the *latest version* of each follow edge it
mentions (post last-writer-wins dedup, as every sink batch here is), and
``previous`` is the prior version of those same edges (empty on first
sight). The delta is live(now) - live(before), so re-sending an
unchanged edge contributes zero — the fold is idempotent per version,
and folding any batch split equals the full recompute
(tests/test_graph_counts.py asserts fold == rebuild on random splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _live():
    # built lazily: Column construction needs an active session
    return F.col("deleted_at").isNull()


def follow_counts_full(follows: DataFrame) -> DataFrame:
    """Full rebuild: (fid, follower_count, following_count) over live
    edges — SURVEY §2.6 A3's recompute mapping. The two directions
    aggregate separately and full-outer-merge, so each is a single
    partial+final count shuffle."""
    live = follows.filter(_live())
    followers = live.groupBy(F.col("target_fid").alias("fid")).agg(
        F.count(F.lit(1)).alias("follower_count")
    )
    following = live.groupBy(F.col("fid")).agg(
        F.count(F.lit(1)).alias("following_count")
    )
    return (
        followers.join(following, "fid", "full_outer")
        .select(
            "fid",
            F.coalesce("follower_count", F.lit(0)).alias("follower_count"),
            F.coalesce("following_count", F.lit(0)).alias("following_count"),
        )
    )


def follow_counts_delta(
    batch: DataFrame, previous: DataFrame | None = None
) -> DataFrame:
    """Per-fid count delta of a batch of follow-edge versions.

    ``previous`` carries the prior version of any edge the batch
    re-states (None/empty when every edge is first-seen). An edge counts
    +1 where it is live now but wasn't before, -1 where it was live and
    no longer is; unchanged liveness contributes 0.
    """
    now = batch.select(
        "fid", "target_fid", _live().cast("int").alias("live_now")
    )
    if previous is not None:
        before = previous.select(
            "fid", "target_fid", _live().cast("int").alias("live_before")
        )
        now = now.join(before, ["fid", "target_fid"], "left").withColumn(
            "d", F.col("live_now") - F.coalesce("live_before", F.lit(0))
        )
    else:
        now = now.withColumn("d", F.col("live_now"))
    changed = now.filter(F.col("d") != 0)
    d_followers = changed.groupBy(F.col("target_fid").alias("fid")).agg(
        F.sum("d").alias("follower_delta")
    )
    d_following = changed.groupBy("fid").agg(F.sum("d").alias("following_delta"))
    return (
        d_followers.join(d_following, "fid", "full_outer")
        .select(
            "fid",
            F.coalesce("follower_delta", F.lit(0)).alias("follower_delta"),
            F.coalesce("following_delta", F.lit(0)).alias("following_delta"),
        )
    )


def merge_counts(
    state: DataFrame, delta: DataFrame, drop_zero: bool = True
) -> DataFrame:
    """Fold a delta into the running counts: full-outer join on fid, sum,
    drop fids whose counts return to zero (so state stays exactly the
    set of fids with live edges, matching the full rebuild).
    ``drop_zero=False`` keeps zero rows — the sink-as-state fold uses it
    because an upsert sink can update but not delete."""
    merged = state.join(delta, "fid", "full_outer").select(
        "fid",
        (
            F.coalesce("follower_count", F.lit(0))
            + F.coalesce("follower_delta", F.lit(0))
        ).alias("follower_count"),
        (
            F.coalesce("following_count", F.lit(0))
            + F.coalesce("following_delta", F.lit(0))
        ).alias("following_count"),
    )
    if not drop_zero:
        return merged
    return merged.filter(
        (F.col("follower_count") != 0) | (F.col("following_count") != 0)
    )


def fold_counts_batch(
    spark,
    edge_sink,
    counts_sink,
    batch: DataFrame,
    epoch: int,
    version_column: str = "updated_at",
) -> None:
    """One sink-as-state fold step, shaped for ``foreachBatch``: the edge
    sink (PK (fid, target_fid)) supplies each restated edge's prior
    version, the counts sink (PK fid) absorbs the delta.

    W10 discipline throughout: state lives in the sinks, both upserts are
    recency-guarded, and every join against sink state is key-pruned to
    the batch (O(batch) work + bucket-pruned sink merges, never a
    state-sized rewrite). Stale replays (batch version older than the
    sink's) are filtered before the delta so a reordered window can't
    double-count.

    Crash-idempotency is PER-FID, not a global epoch gate: the counts
    upsert runs first and stamps ``epoch`` as each written row's version,
    so a crash between the two upserts leaves (some of) the counts
    applied but the edges un-advanced. A replay recomputes the same
    delta against the un-advanced edge state, then ZEROES the delta for
    every fid whose stored version is already >= epoch — those fids
    absorbed this exact delta before the crash. A whole-batch "any row
    at >= epoch" guard would be unsound here because the lake sink's
    multi-bucket swap is not atomic: a crash mid-swap stamps some
    buckets' fids and not others, and a global skip would silently lose
    the un-swapped fids' deltas forever. Per-fid filtering converges
    from any partially-applied state; the edge upsert that follows is
    idempotent via its own recency guard. Epochs must be strictly
    increasing across batches, which foreachBatch guarantees.
    """
    from ..operators.dedup import last_writer_wins

    latest = last_writer_wins(
        batch, ["fid", "target_fid"], [F.desc(version_column)]
    )
    prior_all = edge_sink.read()
    prior = None
    if prior_all is not None:
        prior = prior_all.join(
            latest.select("fid", "target_fid"), ["fid", "target_fid"], "left_semi"
        )
        # drop stale replays: keep batch rows at least as new as the sink's
        pv = prior.select(
            "fid", "target_fid", F.col(version_column).alias("__prior_v")
        )
        latest = (
            latest.join(pv, ["fid", "target_fid"], "left")
            .filter(
                F.col("__prior_v").isNull()
                | (F.col(version_column) >= F.col("__prior_v"))
            )
            .drop("__prior_v")
        )
    delta = follow_counts_delta(latest, prior)
    old = counts_sink.read()
    if old is None:
        old_subset = empty_counts(spark)
    else:
        old_subset = old.select(
            "fid", "follower_count", "following_count"
        ).join(delta.select("fid"), "fid", "left_semi")
        # per-fid replay guard: fids already stamped at >= epoch absorbed
        # this delta in a previous (crashed) attempt — zero their delta;
        # their current counts pass through old_subset and are restated
        # byte-identically under the same epoch stamp
        absorbed = old.filter(F.col(version_column) >= epoch).select("fid")
        delta = delta.join(absorbed, "fid", "left_anti")
    new_rows = merge_counts(old_subset, delta, drop_zero=False).withColumn(
        version_column, F.lit(epoch).cast("long")
    )
    counts_sink.upsert(new_rows, epoch)
    edge_sink.upsert(latest, epoch)


def read_counts(counts_sink) -> DataFrame | None:
    """Live view of the maintained counts: zero rows (kept because the
    sink cannot delete) are filtered out, matching follow_counts_full."""
    df = counts_sink.read()
    if df is None:
        return None
    return df.select("fid", "follower_count", "following_count").filter(
        (F.col("follower_count") != 0) | (F.col("following_count") != 0)
    )


def empty_counts(spark) -> DataFrame:
    """The fold's zero: an empty counts frame with the state schema."""
    return spark.createDataFrame(
        [], "fid long, follower_count long, following_count long"
    )
