"""Streaming (cross-batch) frequency maintenance via count-min cells.

The streaming twin of the HLL fold (``streaming/hll_count``) for the
OTHER sketch: running hot-key/heavy-hitter detection over an unbounded
stream with state bounded at ``depth x width`` cells forever.  The
interesting difference is the merge law: HLL registers merge by MAX
(monotone — replay is automatically a no-op), while CMS cells merge by
ADDITION, which double-counts on replay.  Crash safety therefore uses
the PER-CELL epoch-stamp protocol from the follow-counts fold
(``graph/counts.fold_counts_batch``):

- every written cell carries ``updated_at = epoch``;
- a replayed batch recomputes the same deterministic delta, then
  ZEROES it for every cell whose stored stamp is already >= epoch —
  those cells absorbed this exact delta before the crash;
- the guard is per-cell, not whole-batch, because the lake sink's
  multi-bucket swap is not atomic: a crash mid-swap leaves some cells
  stamped and others not, and a global skip would lose the un-swapped
  cells' deltas forever. Per-cell filtering converges from any
  partially-applied state. Epochs must be strictly increasing across
  batches (foreachBatch guarantees this).

Per batch: one bounded sketch build (at most depth x width groups
regardless of batch key cardinality), one key-pruned join against
state, one upsert of the touched cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.cms import cms_build

CELLS_SCHEMA = "row int, col long, cnt long, updated_at long"


def cms_fold_batch(
    cells_sink,
    batch: DataFrame,
    epoch: int,
    key_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Fold one micro-batch into the cell state (sink PK (row, col));
    return the merged (row, col, cnt) rows this fold wrote, pinned
    executor-side BEFORE the sink mutates."""
    delta = cms_build(
        batch, key_col, width=width, depth=depth, weight_col=weight_col
    )
    state = cells_sink.read()
    if state is not None:
        merged = (
            delta.join(
                state.select(
                    "row",
                    "col",
                    F.col("cnt").alias("__state_cnt"),
                    F.col("updated_at").alias("__state_epoch"),
                ),
                ["row", "col"],
                "left",
            )
            .select(
                "row",
                "col",
                (
                    F.coalesce("__state_cnt", F.lit(0))
                    # the replay guard: a cell already stamped at this
                    # (or a later) epoch absorbed this delta pre-crash
                    + F.when(
                        F.coalesce("__state_epoch", F.lit(-1)) >= epoch,
                        F.lit(0),
                    ).otherwise(F.col("cnt"))
                ).alias("cnt"),
            )
        )
    else:
        merged = delta
    merged = merged.localCheckpoint(eager=True)
    cells_sink.upsert(
        merged.withColumn("updated_at", F.lit(epoch).cast("long")),
        epoch,
    )
    return merged
