"""Streaming (cross-batch) distinct-count maintenance via HLL registers.

A continuously-ingesting pipeline wants "distinct users per type, so
far" after every micro-batch.  Recomputing ``countDistinct`` over
history is O(corpus) per batch; keeping the raw distinct-key set as
state is O(distinct keys).  The HLL register table
(``operators/hll``) is the right state: bounded at ``groups x 2^p``
rows FOREVER, and the fold is a register-wise MAX merge — idempotent,
so crash replay converges without any epoch bookkeeping beyond the
sink's own (W10 sink-as-state, the graph-counts/bloom-fold protocol).

Per batch:

1. build the batch's register frame (one bounded hash-aggregate);
2. max-merge against the state rows of the touched (group, bucket)
   keys — state buckets the batch didn't touch are left untouched on
   disk (the upsert writes only merged batch buckets);
3. upsert merged registers (PK = group + bucket; max is monotone, so
   replaying a crashed batch re-writes identical rows — a no-op);
4. return the post-fold estimates for the groups the batch touched,
   computed from the merged state (NOT re-read after the upsert: the
   returned frame must describe the transition this fold performed).

Cost per batch is O(batch) + O(touched registers); state never grows
past the register bound no matter how many distinct keys streamed by —
the property that makes this viable at 100 TB where the exact distinct
set cannot be state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.hll import hll_estimate, hll_registers


def hll_fold_batch(
    registers_sink,
    batch: DataFrame,
    epoch: int,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 10,
) -> DataFrame:
    """Fold one micro-batch into the register state; return
    (group_cols..., estimate) for every group present in the batch."""
    group_cols = group_cols or []
    batch_regs = hll_registers(batch, key_col, group_cols, p)
    state = registers_sink.read()
    if state is not None:
        merged = (
            batch_regs.join(
                state.select(
                    *group_cols,
                    "bucket",
                    F.col("register").alias("__state_reg"),
                ),
                [*group_cols, "bucket"],
                "left",
            )
            .select(
                *group_cols,
                "bucket",
                F.greatest(
                    F.col("register"), F.coalesce("__state_reg", F.lit(0))
                ).alias("register"),
            )
        )
    else:
        merged = batch_regs
    merged = merged.localCheckpoint(eager=True)
    if state is None:
        full = merged.select(*group_cols, "bucket", "register")
    else:
        # estimate needs ALL of a touched group's registers, including
        # state buckets the batch didn't touch
        state_sel = state.select(*group_cols, "bucket", "register")
        if group_cols:
            touched = batch_regs.select(*group_cols).distinct()
            state_sel = state_sel.join(
                F.broadcast(touched), group_cols, "left_semi"
            )
        untouched_state = state_sel.join(
            merged.select(*group_cols, "bucket"),
            [*group_cols, "bucket"],
            "left_anti",
        )
        full = merged.select(*group_cols, "bucket", "register").unionByName(
            untouched_state
        )
    # pin the result BEFORE the sink mutates: the estimate frame reads
    # the PRE-upsert state files, which the sink's bucket swap deletes —
    # a lazy evaluation after upsert fails with FILE_NOT_EXIST (and the
    # fold's result must describe this transition anyway, the near-dup
    # fold discipline)
    result = hll_estimate(full, group_cols, p).localCheckpoint(eager=True)
    registers_sink.upsert(
        merged.withColumn("updated_at", F.lit(epoch).cast("long")),
        epoch,
    )
    return result
