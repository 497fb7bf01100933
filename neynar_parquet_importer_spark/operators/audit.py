"""Data-quality constraint audit (Deequ-style) — the pre-import gate.

The reference enforces quality implicitly, at insert time, through
Postgres constraints (schema/*.sql primary keys and NOT NULLs): a bad
batch fails the COPY. On a lake there is no database to reject rows,
so the same contract has to run as a query BEFORE data is published.
This module evaluates a suite of declarative constraints over a table
in ONE aggregation pass and emits one row per constraint:
``(constraint, metric, passed)``.

Design:

- every single-table constraint is an aggregate expression (a ratio in
  [0, 1]), so the whole suite is one ``df.agg(...)`` — one scan, one
  partial+final hash aggregate, no shuffle of data rows, regardless of
  how many constraints are checked;
- the wide one-row result is melted to rows with
  ``explode(array(struct...))`` — driver-free unpivot;
- referential integrity needs a second table, hence a join: implemented
  as a broadcast-friendly left join + match fraction, unioned onto the
  same output shape;
- metrics are rounded to 6 decimals and compared to the threshold
  AFTER rounding, so a cross-engine oracle replays the pass/fail bit
  exactly (queries.py convention).

At 100 TB the single-pass property is the point: a 40-constraint suite
costs one table scan, and the only non-scan constraint (RI) broadcasts
the parent key set when the dimension is small — exactly the shape of
the reference's FK relationships (casts -> fids).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint: ``metric`` is an aggregate expression producing a
    double in [0, 1]; the constraint passes when the rounded metric is
    >= ``threshold``."""

    name: str
    metric: Column
    threshold: float = 1.0


def completeness(col: str) -> Column:
    """Fraction of rows with a non-null value. ``try_divide``: an EMPTY
    table is 0/0 — a hard DIVIDE_BY_ZERO under ANSI, killing the audit
    job exactly when the table most needs reporting (a mis-pathed read);
    NULL metric + the fail-closed coalesce in table_audit turns it into
    a failed check instead."""
    return F.try_divide(F.count(col), F.count(F.lit(1)))


def uniqueness(*cols: str) -> Column:
    """Distinct fraction: 1.0 iff the column set is a complete key.
    ``count_distinct`` ignores NULLs (identically in Spark and DuckDB),
    so NULL-bearing keys lower the ratio — pair with ``completeness``
    to tell "has NULLs" apart from "has duplicates" in a PK check.
    try_divide: see completeness (empty-table 0/0)."""
    return F.try_divide(
        F.count_distinct(*[F.col(c) for c in cols]), F.count(F.lit(1))
    )


def satisfies(cond: Column) -> Column:
    """Fraction of rows satisfying a boolean predicate (NULL counts as
    not satisfied — the conservative reading for a quality gate)."""
    return F.avg(F.coalesce(cond, F.lit(False)).cast("double"))


def table_audit(df: DataFrame, checks: list[Check]) -> DataFrame:
    """(constraint, metric, passed) — one row per check, one table scan
    total."""
    row = df.agg(
        *[c.metric.alias(f"_m_{i}") for i, c in enumerate(checks)]
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("constraint"),
                F.round(F.col(f"_m_{i}"), 6).alias("metric"),
                # fail CLOSED: a NULL metric (empty table, NULL-yielding
                # aggregate) is a FAILED check, never a silent pass — a
                # consumer filtering passed == False must see it
                F.coalesce(
                    F.round(F.col(f"_m_{i}"), 6) >= F.lit(c.threshold),
                    F.lit(False),
                ).alias("passed"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return row.select(F.explode(entries).alias("_c")).select("_c.*")


def referential_integrity(
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
    name: str,
    threshold: float = 1.0,
) -> DataFrame:
    """Fraction of child rows whose foreign key matches a parent row,
    in the same (constraint, metric, passed) shape. NULL foreign keys
    count as violations (the gate's conservative reading). The parent
    side is deduplicated to its key and broadcast when small."""
    keys = parent.select(F.col(pk).alias("_pk")).distinct()
    j = child.select(F.col(fk).alias("_fk")).join(
        F.broadcast(keys), F.col("_fk") == F.col("_pk"), "left"
    )
    agg = j.agg(
        F.round(F.avg(F.col("_pk").isNotNull().cast("double")), 6).alias(
            "_raw"
        )
    )
    return agg.select(
        F.lit(name).alias("constraint"),
        F.col("_raw").alias("metric"),
        # fail closed on an empty child (avg -> NULL)
        F.coalesce(F.col("_raw") >= F.lit(threshold), F.lit(False)).alias(
            "passed"
        ),
    )


def audit_suite(parts: list[DataFrame]) -> DataFrame:
    """Union audit fragments (table_audit / referential_integrity
    outputs) into one report, ordered by constraint name."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("constraint")
