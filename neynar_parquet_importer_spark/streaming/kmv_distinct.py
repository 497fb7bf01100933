"""Streaming (cross-batch) KMV sketch maintenance: distinct estimates
AND cross-group overlap answers "so far" after every micro-batch, with
state bounded at ``groups x k`` rows forever.

The W10 sink-as-state protocol (graph-counts/bloom/hll/cms fold
discipline) applied to the k-minimum-values sketch
(``operators/kmv``). The state table is RANK-KEYED — primary key
``(group..., rn)``, value ``hv`` — because a lake upsert can overwrite
but not delete: merging can only tighten the k-min set, so every
transition is expressible as rank overwrites plus appends, never a
removal. The fold is a min-merge (k smallest of state ∪ batch), which
is idempotent — replaying a crashed epoch recomputes identical rows and
the upsert is a no-op — and ORDER-FREE across batches, so any replay /
reordering converges to the sketch of the union.

Per batch:

1. build the batch sketch (one distinct + one window, bounded output);
2. union with the state rows of TOUCHED groups only, re-rank, keep k;
3. checkpoint the merged frame, return post-fold estimates for touched
   groups (computed BEFORE the sink mutates — the returned frame must
   describe this transition, and lazy evaluation after the bucket swap
   would read deleted files);
4. upsert by (group, rn).

What this buys at 100 TB that hll alone doesn't: the persisted per-
source/day sketches keep answering UNION and OVERLAP questions
(``kmv.kmv_pair_overlap``) over any grouping after the fact, from
sketch rows alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.kmv import kmv_estimate, kmv_sketch


def kmv_fold_batch(
    sketch_sink,
    batch: DataFrame,
    epoch: int,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = 128,
    seed: str = "kmv",
) -> DataFrame:
    """Fold one micro-batch into the rank-keyed sketch state; return
    (group_cols..., n_sketch, est) for every group present in the
    batch."""
    group_cols = group_cols or []
    batch_sk = kmv_sketch(batch, key_col, group_cols, k, seed).select(
        *group_cols, "hv"
    )
    state = sketch_sink.read()
    if state is not None:
        state_sel = state.select(*group_cols, "hv")
        if group_cols:
            touched = batch_sk.select(*group_cols).distinct()
            state_sel = state_sel.join(
                F.broadcast(touched), group_cols, "left_semi"
            )
        pool = batch_sk.unionByName(state_sel).distinct()
    else:
        pool = batch_sk
    w = Window.partitionBy(*group_cols).orderBy("hv")
    merged = (
        pool.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .localCheckpoint(eager=True)
    )
    result = kmv_estimate(merged, group_cols, k).localCheckpoint(eager=True)
    sketch_sink.upsert(
        merged.withColumn("updated_at", F.lit(epoch).cast("long")),
        epoch,
    )
    return result
