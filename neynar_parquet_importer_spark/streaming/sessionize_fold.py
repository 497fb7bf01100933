"""Streaming (cross-batch) gap sessionization with the sink as state.

``streaming/sessionize.py`` already sessionizes on Spark's state store
(``applyInPandasWithState``) — the right tool inside a running
Structured Streaming query. This module is the SAME semantics in the
engine's OTHER streaming mode: the daemon's window-driven foreachBatch
catch-up (W10 sink-as-state, like the near-dup/counts/HLL/CMS/histogram
folds), where state must live in an inspectable lake table and survive
process restarts without a streaming checkpoint.

State: one OPEN session per user (PK user_id) —
``(user_id, session_start, last_es, n_events, updated_at)``. Closed
sessions land in a second sink keyed (user_id, session_start); they are
deterministic functions of (pre-state, batch), so PK upserts make
re-emission idempotent.

Per batch, fully declaratively (one per-user window + one join — no
per-key Python state machine):

1. split the batch into per-user gap segments (the batch twin's
   lag/cumsum logic);
2. join each user's FIRST segment against the open state: within
   ``gap_s`` -> the open session extends into it (n_events add);
   beyond -> the open session closes as-is;
3. every segment except the user's last closes; the last becomes the
   new open state.

Ordering contract: batches must be per-user event-time ordered (batch
N's events >= batch N-1's) — exactly the in-order window guarantee the
ledger enforces for the daemon (W7); out-of-order delivery belongs to
the state-store variant with watermarks.

Crash safety: n_events addition double-counts on replay, so the fold
(a) writes CLOSED rows BEFORE the open state, and (b) skips users whose
open-state stamp already covers this epoch. A crash between the two
writes replays as: user unstamped -> recompute from the unchanged
pre-state -> identical closed rows (idempotent PK upsert) + the missed
open-state write. A stamped user's closed rows are guaranteed present
by the write order. Converges from any interleaving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OPEN_SCHEMA = (
    "user_id long, session_start long, last_es long, n_events long,"
    " updated_at long"
)
CLOSED_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events long,"
    " updated_at long"
)


def batch_segments(batch: DataFrame, gap_s: int) -> DataFrame:
    """(user_id, seg_idx, max_idx, seg_start, seg_end, n) — the batch's
    per-user gap segments, in one per-user window pass. ``es`` is the
    event's epoch-second column; ties are real (same-second events) and
    extend the segment."""
    w = Window.partitionBy("user_id").orderBy("es")
    flagged = batch.select(
        "user_id",
        "es",
        F.when(F.col("es") - F.lag("es").over(w) > gap_s, F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_new"),
    )
    seg = flagged.select(
        "user_id",
        "es",
        (
            F.sum("is_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            )
            + 1
        ).alias("seg_idx"),
    )
    grouped = seg.groupBy("user_id", "seg_idx").agg(
        F.min("es").alias("seg_start"),
        F.max("es").alias("seg_end"),
        F.count(F.lit(1)).alias("n"),
    )
    return grouped.withColumn(
        "max_idx",
        F.max("seg_idx").over(Window.partitionBy("user_id")),
    )


def sessionize_fold_batch(
    open_sink,
    closed_sink,
    batch: DataFrame,
    epoch: int,
    gap_s: int = 1800,
) -> DataFrame:
    """Fold one micro-batch (user_id + es columns) into the session
    state; returns the closed-session rows this fold wrote (pinned
    executor-side before either sink mutates)."""
    segs = batch_segments(batch.select("user_id", "es"), gap_s)
    state = open_sink.read()
    if state is not None:
        # replay guard: users already stamped at this epoch applied this
        # exact batch before the crash (closed rows are written first,
        # so theirs are guaranteed present) — drop their segments
        stamped = state.filter(F.col("updated_at") >= epoch).select(
            "user_id"
        )
        segs = segs.join(stamped, "user_id", "left_anti")
        st = state.select(
            "user_id",
            F.col("session_start").alias("__st_start"),
            F.col("last_es").alias("__st_last"),
            F.col("n_events").alias("__st_n"),
        )
        j = segs.join(st, "user_id", "left")
    else:
        j = (
            segs.withColumn("__st_start", F.lit(None).cast("long"))
            .withColumn("__st_last", F.lit(None).cast("long"))
            .withColumn("__st_n", F.lit(None).cast("long"))
        )
    merges = (F.col("seg_idx") == 1) & F.col("__st_last").isNotNull() & (
        F.col("seg_start") - F.col("__st_last") <= gap_s
    )
    adj = j.select(
        "user_id",
        "seg_idx",
        "max_idx",
        "seg_end",
        F.when(merges, F.col("__st_start"))
        .otherwise(F.col("seg_start"))
        .alias("adj_start"),
        F.when(merges, F.col("__st_n") + F.col("n"))
        .otherwise(F.col("n"))
        .alias("adj_n"),
        merges.alias("__merged"),
        "__st_start",
        "__st_last",
        "__st_n",
    )
    closed_from_state = adj.filter(
        (F.col("seg_idx") == 1)
        & F.col("__st_last").isNotNull()
        & ~F.col("__merged")
    ).select(
        "user_id",
        F.col("__st_start").alias("session_start"),
        F.col("__st_last").alias("session_end"),
        F.col("__st_n").alias("n_events"),
    )
    closed_from_segs = adj.filter(F.col("seg_idx") < F.col("max_idx")).select(
        "user_id",
        F.col("adj_start").alias("session_start"),
        F.col("seg_end").alias("session_end"),
        F.col("adj_n").alias("n_events"),
    )
    closed = closed_from_state.unionAll(closed_from_segs).localCheckpoint(
        eager=True
    )
    open_new = (
        adj.filter(F.col("seg_idx") == F.col("max_idx"))
        .select(
            "user_id",
            F.col("adj_start").alias("session_start"),
            F.col("seg_end").alias("last_es"),
            F.col("adj_n").alias("n_events"),
        )
        .localCheckpoint(eager=True)
    )
    # closed BEFORE open: the stamp on open state is the replay guard,
    # so everything it vouches for must already be durable. A batch with
    # no closures skips the write — an all-empty first upsert would
    # leave the sink as an uninferable empty parquet dir (cheap probe:
    # the frame is already checkpointed)
    if not closed.isEmpty():
        closed_sink.upsert(
            closed.withColumn("updated_at", F.lit(epoch).cast("long")),
            epoch,
        )
    open_sink.upsert(
        open_new.withColumn("updated_at", F.lit(epoch).cast("long")), epoch
    )
    return closed


def finalize_sessions(open_sink) -> DataFrame:
    """End-of-stream view: the still-open sessions as closed-shape rows
    (read-only — state is untouched, so a late window can still extend
    them)."""
    state = open_sink.read()
    if state is None:
        raise ValueError(
            "no open-session state: fold at least one batch first"
        )
    return state.select(
        "user_id",
        "session_start",
        F.col("last_es").alias("session_end"),
        "n_events",
    )
