"""Slowly-changing-dimension (Type 2) history reconstruction.

The reference's sinks maintain ONLY the current row per key (Postgres
upsert, db.py:660-700 last-wins semantics; this repo's
``sinks/lake_upsert`` and ``sinks/jdbc_upsert`` mirror that). The
standard warehouse complement is the Type-2 history table: one row per
(key, attribute-version) with a validity interval, rebuilt from the
raw change stream. That rebuild is two window passes, both partitioned
by the dimension key — fully distributed, no iteration:

1. **collapse**: keep a change row only when a tracked attribute
   actually differs from the previous row (null-safe ``IS DISTINCT
   FROM`` — a NULL->value or value->NULL transition IS a change,
   NULL->NULL is not);
2. **intervalize**: on the collapsed stream, ``valid_from`` = the
   change's own ordering timestamp, ``valid_to`` = ``lead(valid_from)``
   (NULL on the current version), ``version_n`` = row_number.

Determinism: callers must pass a TOTAL order per key (timestamp plus a
unique tiebreak column) — same-timestamp changes would otherwise make
both the collapse and the intervals nondeterministic across runs and
engines.

At scale this is one shuffle on the key reused by both windows
(Catalyst plans a single Exchange for same-key windows); history for a
100 TB change log is bounded by the number of genuine attribute
transitions, not by raw event volume, because the collapse runs first.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def collapse_consecutive(
    df: DataFrame,
    keys: list[str],
    order_cols: list[Column],
    attr_cols: list[str],
) -> DataFrame:
    """Drop rows whose tracked attributes all equal the previous row's
    (per key, in ``order_cols`` order). The first row per key is always
    kept. Comparison is null-safe."""
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    # seeded reduce (diff.snapshot_diff discipline): attr_cols=[] means
    # "all of zero attributes equal" — vacuous truth, one version per
    # key — instead of reduce() raising TypeError on an empty iterable
    same_as_prev = reduce(
        lambda a, b: a & b,
        [
            F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
            for c in attr_cols
        ],
        F.lit(True),
    )
    first = F.row_number().over(w) == 1
    return (
        df.withColumn("_keep", first | ~same_as_prev)
        .filter(F.col("_keep"))
        .drop("_keep")
    )


def scd2_intervals(
    changes: DataFrame,
    keys: list[str],
    valid_from: Column,
    order_cols: list[Column],
    attr_cols: list[str],
) -> DataFrame:
    """(keys..., attrs..., valid_from, valid_to, version_n, is_current)
    from an already-collapsed change stream.

    ``valid_from`` is any monotone-in-order expression (usually the
    epoch seconds of the change timestamp); ``valid_to`` is the next
    version's ``valid_from`` — intervals are half-open [from, to) and
    exactly tile each key's timeline. The latest version per key has
    ``valid_to`` NULL and ``is_current`` true.
    """
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    nxt = F.lead(valid_from).over(w)
    return changes.select(
        *keys,
        *attr_cols,
        valid_from.alias("valid_from"),
        nxt.alias("valid_to"),
        F.row_number().over(w).cast("int").alias("version_n"),
        nxt.isNull().alias("is_current"),
    )


def scd2_history(
    df: DataFrame,
    keys: list[str],
    valid_from: Column,
    order_cols: list[Column],
    attr_cols: list[str],
) -> DataFrame:
    """Full rebuild: collapse consecutive duplicates, then intervalize."""
    changes = collapse_consecutive(df, keys, order_cols, attr_cols)
    return scd2_intervals(changes, keys, valid_from, order_cols, attr_cols)
