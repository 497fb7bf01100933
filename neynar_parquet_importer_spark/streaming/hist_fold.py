"""Streaming (cross-batch) distribution maintenance via fixed-bin
histograms.

Third member of the bounded-state sketch-fold family: the HLL fold
(``streaming/hll_count``) maintains distinct counts, the CMS fold
(``streaming/cms_count``) key frequencies, this one VALUE DISTRIBUTIONS
— running latency/price/size quantiles over an unbounded stream with
state bounded at ``groups x n_bins`` rows forever. Any quantile is
answerable from the state at any moment with error <= one bin width
(``operators/histogram`` module doc).

The merge law is addition (the CMS law, not HLL's monotone max), so
crash safety is the same PER-CELL epoch-stamp protocol
(``cms_count.cms_fold_batch``): a replayed batch recomputes its
deterministic per-bin delta, then zeroes it for every (group, bin)
cell whose stored stamp already covers this epoch — converging from
any partially-applied sink state without double-counting.

Per batch: one bounded histogram aggregate, one key-pruned join
against state, one upsert of the touched cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.histogram import histogram_build


def hist_fold_batch(
    bins_sink,
    batch: DataFrame,
    epoch: int,
    group_col: str,
    value_col: str,
    *,
    lo: float,
    width: float,
    n_bins: int,
) -> DataFrame:
    """Fold one micro-batch into the bin state (sink PK
    (group_col, bin)); return the merged (group, bin, cnt) rows this
    fold wrote, pinned executor-side BEFORE the sink mutates."""
    delta = histogram_build(
        batch, [group_col], value_col, lo=lo, width=width, n_bins=n_bins
    )
    state = bins_sink.read()
    if state is not None:
        merged = (
            delta.join(
                state.select(
                    group_col,
                    "bin",
                    F.col("cnt").alias("__state_cnt"),
                    F.col("updated_at").alias("__state_epoch"),
                ),
                [group_col, "bin"],
                "left",
            )
            .select(
                group_col,
                "bin",
                (
                    F.coalesce("__state_cnt", F.lit(0))
                    # replay guard: a cell stamped at this (or a later)
                    # epoch absorbed this delta before the crash
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
    bins_sink.upsert(
        merged.withColumn("updated_at", F.lit(epoch).cast("long")),
        epoch,
    )
    return merged
