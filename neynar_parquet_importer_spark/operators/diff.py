"""Snapshot diff: classify rows between two versions of a keyed table.

The reference's ingestion model is full snapshot -> incremental windows
(sources/windows.py maps its S4/S6 discovery); the operation a real
deployment runs right after pulling a new full snapshot is "what
changed since the snapshot I already imported?" — added, removed, and
changed rows — both to audit the upstream export and to turn a
snapshot pair into a synthetic incremental batch when the provider's
window files are missing. This module is that diff as one full-outer
equi-join on the primary key.

Change detection compares columns directly with null-safe equality
(``eqNullSafe``), NOT via a row hash: a portable hash would have to
stringify every column, and float-to-string formatting is exactly the
kind of cross-engine trap (``'123.0'`` vs ``'123'``) the oracle
discipline here avoids.  Column comparison keeps the operator pure
codegen and NULL-correct (NULL -> NULL is unchanged; NULL -> value is
changed).

At scale: one shuffle on the key for each side (or zero with bucketed
snapshots — the natural layout for a table you re-diff every import),
and the output is a per-row status that downstream either aggregates
(audit counts) or filters (``status != 'unchanged'`` IS the synthetic
incremental batch).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """(key, status, <new-side compare cols>) with status in
    {'added', 'removed', 'changed', 'unchanged'}.

    Removed rows carry the OLD column values (there is no new side);
    everything else carries the new side."""
    o = old.select(
        F.col(key).alias("_ok"),
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        F.col(key).alias("_nk"),
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    j = o.join(n, o._ok == n._nk, "full_outer")
    # empty compare_cols is a legitimate key-presence-only diff
    # (added/removed audit) — seed the reduce so it doesn't raise
    same = reduce(
        lambda a, b: a & b,
        [
            F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
            for c in compare_cols
        ],
        F.lit(True),
    )
    removed = F.col("_nk").isNull()
    status = (
        F.when(F.col("_ok").isNull(), F.lit("added"))
        .when(removed, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    # branch on row presence, NOT coalesce per column: a column that
    # changed to NULL must surface as NULL (coalesce would resurrect the
    # old value and a downstream "synthetic incremental batch" would
    # silently undo the upstream NULL-ing)
    out_cols = [
        F.when(removed, F.col(f"_o_{c}"))
        .otherwise(F.col(f"_n_{c}"))
        .alias(c)
        for c in compare_cols
    ]
    return j.select(
        F.coalesce(F.col("_nk"), F.col("_ok")).alias(key),
        status.alias("status"),
        *out_cols,
    )


def diff_summary(diff: DataFrame, key: str) -> DataFrame:
    """(status, n_rows, key_checksum): the audit aggregate — exact
    integer counts plus a sum-of-keys checksum so a misclassified row
    moves mass between statuses and cannot cancel out.

    Numeric keys checksum as their plain sum (SQL-replayable as-is);
    non-numeric keys (string/hex doc ids) sum the md5-half instead —
    ``sum(key)`` on a string key is a CAST_INVALID_INPUT crash under
    ANSI and a silent all-NULL checksum without it, which deletes the
    misclassification-detection property this column exists for. The
    md5-half is the engine-portable discipline (conv(substr(md5,1,8)))
    every oracle twin can replay."""
    dt = diff.schema[key].dataType.simpleString()
    numeric = dt in {
        "tinyint", "smallint", "int", "bigint", "float", "double"
    } or dt.startswith("decimal")
    checksum_src = (
        F.col(key)
        if numeric
        else F.conv(
            F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10
        ).cast("long")
    )
    return (
        diff.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(checksum_src).alias("key_checksum"),
        )
        .orderBy("status")
    )
