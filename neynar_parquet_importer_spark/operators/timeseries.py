"""Time-series resampling: per-key dense bucket grids and forward gap
fill.

The reference's event tables arrive as irregular streams (per-row
timestamps, no guarantee any interval has data); the first thing a
metrics/feature pipeline does downstream is put them on a regular
grid — "one row per user per day, carrying the last known value
through gaps". Neither Spark nor the reference ships this as a single
operator; here it is the composition of three declarative steps, all
codegen-friendly:

1. bucket + aggregate observations (ordinary groupBy — partial
   map-side combine, one shuffle on (key, bucket));
2. build each key's dense grid with ``sequence()`` + ``explode`` from
   that key's own min/max bucket (the only row inflation, and it is
   explicit and bounded: span/step rows per key, never a global
   cross-join against a calendar dimension);
3. left-join observations onto the grid and forward-fill with
   ``last(col, ignorenulls=True)`` over a per-key ordered window.

At scale: every shuffle is keyed by the series key, so the window in
step 3 is partitioned (never a single-task global window — the
anti-pattern ``test_plans.py`` pins against elsewhere), and the grid
explode runs AFTER aggregation, on one row per key, not per event.
A 100 TB deployment bounds grid size by construction: days-per-key is
span/step regardless of event volume. Values to be filled should be
rounded BEFORE the fill so a cross-engine oracle replays bit-equal
(queries.py convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dense_grid(
    observed: DataFrame, keys: list[str], bucket: str, step: int
) -> DataFrame:
    """One row per (key, bucket) for every ``step``-spaced bucket between
    each key's min and max observed bucket (both inclusive).

    ``observed`` must already be bucketized (one row per key+bucket is
    not required — only min/max are read). The explode is the only row
    inflation and happens on the one-row-per-key span frame.
    """
    spans = observed.groupBy(*keys).agg(
        F.min(bucket).alias("_b0"), F.max(bucket).alias("_b1")
    )
    return spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("_b0"), F.col("_b1"), F.lit(step))
        ).alias(bucket),
    )


def gap_fill_forward(
    grid: DataFrame,
    observed: DataFrame,
    keys: list[str],
    bucket: str,
    fill_cols: list[str],
    carry_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """Left-join ``observed`` onto ``grid`` and forward-fill each of
    ``fill_cols`` with the most recent non-null value per key.

    ``carry_cols`` maps output name -> expression evaluated on the
    joined frame BEFORE filling (e.g. an exact count coalesced to 0 —
    a gap has zero events, not "the last bucket's count").

    The fill window is partitioned by the series key and ordered by
    bucket with a rows-unbounded-preceding frame: distributed, and
    deterministic because (key, bucket) is unique on the grid side.
    """
    j = grid.join(observed, [*keys, bucket], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    extra = [
        expr.alias(name) for name, expr in (carry_cols or {}).items()
    ]
    filled = [
        F.last(c, ignorenulls=True).over(w).alias(c) for c in fill_cols
    ]
    return j.select(*keys, bucket, *extra, *filled)


def resample_fill(
    df: DataFrame,
    keys: list[str],
    epoch_col: Column,
    step: int,
    aggs: dict[str, Column],
    fill_cols: list[str],
    count_col: str = "n_events",
) -> DataFrame:
    """End-to-end resample: bucket ``epoch_col`` to ``step`` seconds,
    aggregate ``aggs`` per (key, bucket), densify, forward-fill.

    The bucket column is emitted as ``bucket_start`` (epoch seconds,
    BIGINT). ``aggs`` are computed on the observed buckets only;
    ``fill_cols`` (a subset of the agg output names) are carried
    through gaps; ``count_col`` is an exact row count that coalesces
    to 0 on gap rows.
    """
    bucket = F.floor(epoch_col / F.lit(step)) * F.lit(step)
    observed = (
        df.withColumn("bucket_start", bucket)
        .groupBy(*keys, "bucket_start")
        .agg(
            F.count(F.lit(1)).alias(count_col),
            *[c.alias(n) for n, c in aggs.items()],
        )
    )
    grid = dense_grid(observed, keys, "bucket_start", step)
    return gap_fill_forward(
        grid,
        observed,
        keys,
        "bucket_start",
        fill_cols,
        carry_cols={
            count_col: F.coalesce(F.col(count_col), F.lit(0)).cast("bigint")
        },
    )
