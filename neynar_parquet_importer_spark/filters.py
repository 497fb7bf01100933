"""MongoDB-style predicate DSL -> Catalyst ``Column`` compiler.

Reference semantics (src/neynar_parquet_importer/row_filters.py:1-82,
SURVEY §2.2): a JSON document keyed by ``data.<column>`` selectors whose
leaves are operator dicts (``$in/$nin/$lt/$lte/$gt/$gte/$eq/$ne``),
combined with ``$and`` / ``$or`` lists; multiple keys in one dict AND
together; empty/missing filter means include-everything
(row_filters.py:58-59); unknown keys raise (row_filters.py:81-82).

The reference evaluates this per-row in Python (db.py:827-831 — the
slow path); here it compiles once, driver-side, to a ``Column`` tree
that Catalyst pushes into the parquet scan (predicate pushdown +
row-group statistics skipping), so at 100 TB the filter prunes IO
instead of post-filtering decoded rows.

Also includes the backfill time-range predicate (row_filters.py:52-57,
inclusive bounds) as ``time_range_filter``.
"""

from __future__ import annotations

import datetime
from functools import reduce
from typing import Any, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

# NULL semantics deliberately match the reference's Python evaluator, not
# SQL three-valued logic: in Python `None != v` and `None not in [...]` are
# True, so $ne/$nin KEEP NULL-valued rows (row_filters.py comparisons),
# while $eq/$in/$lt/... drop them (None compares unequal/raises there).
# Without the explicit isNull() arm, `c != lit(v)` evaluates to NULL for
# NULL input and the filter silently drops rows the reference imports —
# visible on nullable columns like parent_fid / target_url.
_COMPARATORS = {
    "$lt": lambda c, v: c < F.lit(v),
    "$lte": lambda c, v: c <= F.lit(v),
    "$gt": lambda c, v: c > F.lit(v),
    "$gte": lambda c, v: c >= F.lit(v),
    "$eq": lambda c, v: c == F.lit(v),
    "$ne": lambda c, v: (c != F.lit(v)) | c.isNull(),
}


def _compile_leaf(column: Column, ops: Mapping[str, Any]) -> Column:
    """Leaf operator dict against one column. Multiple keys AND together
    (matches the reference's loop: every key checked, row_filters.py:48-51)."""
    exprs: list[Column] = []
    for op, value in ops.items():
        if op == "$in":
            exprs.append(column.isin(list(value)))
        elif op == "$nin":
            exprs.append(~column.isin(list(value)) | column.isNull())
        elif op in _COMPARATORS:
            exprs.append(_COMPARATORS[op](column, value))
        else:
            raise ValueError(f"unknown filter operator: {op!r}")
    if not exprs:
        return F.lit(True)
    return reduce(lambda a, b: a & b, exprs)


def compile_filter(filter_doc: Mapping[str, Any] | None) -> Column:
    """Compile a filter document to a single boolean ``Column``.

    Empty/None -> lit(True) (include everything, row_filters.py:58-59).
    """
    if not filter_doc:
        return F.lit(True)

    exprs: list[Column] = []
    for key, value in filter_doc.items():
        if key == "$and":
            subs = [compile_filter(sub) for sub in value]
            exprs.append(reduce(lambda a, b: a & b, subs) if subs else F.lit(True))
        elif key == "$or":
            subs = [compile_filter(sub) for sub in value]
            exprs.append(reduce(lambda a, b: a | b, subs) if subs else F.lit(False))
        elif key.startswith("data."):
            exprs.append(_compile_leaf(F.col(key[len("data.") :]), value))
        else:
            raise ValueError(f"unknown filter key: {key!r}")
    return reduce(lambda a, b: a & b, exprs)


def time_range_filter(
    column: str = "updated_at",
    start: datetime.datetime | None = None,
    end: datetime.datetime | None = None,
) -> Column:
    """Backfill range predicate: keep start <= col <= end, inclusive
    (row_filters.py:52-57; bounds built in cli/backfill.py:130-131)."""
    expr = F.lit(True)
    if start is not None:
        expr = expr & (F.col(column) >= F.lit(start))
    if end is not None:
        expr = expr & (F.col(column) <= F.lit(end))
    return expr


def load_filter_config(config: Mapping[str, Any], schema: str, table: str) -> Column:
    """Per-table lookup keyed '{schema}.{table}' (main.py:718-737)."""
    return compile_filter(config.get(f"{schema}.{table}"))


def evaluate_filter(filter_doc: Mapping[str, Any] | None, row: Mapping[str, Any]) -> bool:
    """Row-level Python twin of ``compile_filter`` — the reference's
    ``include_row`` semantics (row_filters.py:40-82), kept as the
    executable specification: tests/test_filters.py property-checks that
    the compiled Column and this evaluator agree on randomized rows and
    filter documents (including the NULL edge cases).
    """
    if not filter_doc:
        return True

    def leaf(value: Any, ops: Mapping[str, Any]) -> bool:
        for op, operand in ops.items():
            if op == "$in":
                if value not in list(operand):
                    return False
            elif op == "$nin":
                if value in list(operand):
                    return False
            elif op == "$eq":
                if value is None or value != operand:
                    return False
            elif op == "$ne":
                # Python: None != v is True -> NULL rows are KEPT
                if value is not None and value == operand:
                    return False
            elif op in ("$lt", "$lte", "$gt", "$gte"):
                if value is None:
                    return False
                if op == "$lt" and not value < operand:
                    return False
                if op == "$lte" and not value <= operand:
                    return False
                if op == "$gt" and not value > operand:
                    return False
                if op == "$gte" and not value >= operand:
                    return False
            else:
                raise ValueError(f"unknown filter operator: {op!r}")
        return True

    for key, value in filter_doc.items():
        if key == "$and":
            if not all(evaluate_filter(sub, row) for sub in value):
                return False
        elif key == "$or":
            if value and not any(evaluate_filter(sub, row) for sub in value):
                return False
        elif key.startswith("data."):
            if not leaf(row.get(key[len("data."):]), value):
                return False
        else:
            raise ValueError(f"unknown filter key: {key!r}")
    return True
