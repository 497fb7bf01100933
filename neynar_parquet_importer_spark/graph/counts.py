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


def merge_counts(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a delta into the running counts: full-outer join on fid, sum,
    drop fids whose counts return to zero (so state stays exactly the
    set of fids with live edges, matching the full rebuild)."""
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
    return merged.filter(
        (F.col("follower_count") != 0) | (F.col("following_count") != 0)
    )


def empty_counts(spark) -> DataFrame:
    """The fold's zero: an empty counts frame with the state schema."""
    return spark.createDataFrame(
        [], "fid long, follower_count long, following_count long"
    )
