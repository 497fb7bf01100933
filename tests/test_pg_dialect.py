"""Postgres-dialect validation of every generated sink statement.

The live-Postgres leg is environment-gated (no service in this sandbox),
and the DuckDB shim that executes the statements every run is *more
lenient* than Postgres in exactly the ways that bite on first contact
with a real server: DuckDB's reserved-word set is smaller, its type
names are aliased more liberally, and it tolerates some constructs
Postgres rejects. This module closes that gap in-sandbox, three ways:

1. **Shape validation against the Postgres grammar subset we emit** —
   a hand-rolled checker for the four statement shapes the sinks
   generate (CREATE SCHEMA / CREATE TABLE / CREATE VIEW / INSERT ... ON
   CONFLICT). It enforces the rules Postgres enforces and DuckDB does
   not: bare identifiers must not collide with Postgres RESERVED
   keywords (PG 16 keyword table, 'reserved' category — e.g. a column
   named ``user`` or ``do`` parses fine in DuckDB and fails on
   Postgres), column types must come from the Postgres type grammar,
   ``excluded.*`` references must target real non-PK columns, and bind
   placeholders must count exactly ``n_rows * n_columns``.
2. **Parse-only grammar check of every view SELECT body** through
   DuckDB's ``json_serialize_sql`` — DuckDB's parser is derived from
   the Postgres grammar (libpg_query lineage), and serialize-sql parses
   WITHOUT binding catalog objects or functions, so it validates syntax
   for tables/functions that only exist on the real sink. Function
   names appearing in view bodies are additionally checked against a
   Postgres-builtin whitelist (catches a DuckDB-only function such as
   ``list_intersect`` sneaking into sink DDL).
3. **Full-grammar parse via sqlglot's postgres dialect** when sqlglot
   is importable (not in this container; runs wherever it is — the
   ``importorskip`` leg mirrors the live-sink gating discipline).

Reference surface: db.py:884-893 (upsert statement), db.py:105-160
(migration pass), schema/023 (view DDL).
"""

from __future__ import annotations

import json
import re

import duckdb
import pytest

from neynar_parquet_importer_spark.catalog import (
    ALL_TABLES,
    LEDGER_SCHEMA,
    TableSpec,
)
from neynar_parquet_importer_spark.sinks.ddl import (
    bootstrap_statements,
    ledger_ddl,
    substitute_schema,
    tablespec_to_pg_ddl,
    view_statements,
)
from neynar_parquet_importer_spark.sinks.jdbc_upsert import build_upsert_sql

SCHEMA = "graft_test"

ALL_SPECS: dict[str, TableSpec] = {}
for _registry in ALL_TABLES.values():
    ALL_SPECS.update(_registry)


# ---------------------------------------------------------------------------
# Postgres grammar facts (PG 16 documentation, keyword table appendix)
# ---------------------------------------------------------------------------

# 'reserved' category only: these cannot be used as bare column/table
# names on Postgres (DuckDB accepts several of them bare).
PG_RESERVED = frozenset(
    """
    all analyse analyze and any array as asc asymmetric both case cast
    check collate column constraint create current_catalog current_date
    current_role current_time current_timestamp current_user default
    deferrable desc distinct do else end except false fetch for foreign
    from grant group having in initially intersect into lateral leading
    limit localtime localtimestamp not null offset on only or order
    placing primary references returning select session_user some
    symmetric table then to trailing true union unique user using
    variadic when where window with
    """.split()
)

# exact type spellings the DDL generator may emit (subset of the PG
# type grammar; anything new must be added deliberately)
PG_BASE_TYPES = frozenset(
    {
        "bigint",
        "integer",
        "smallint",
        "real",
        "double precision",
        "boolean",
        "text",
        "bytea",
        "timestamp without time zone",
        "date",
        "uuid",
        "jsonb",
    }
)

# Postgres builtins the sink views are allowed to call; a DuckDB-only
# name (list_*, array_to_string variants, struct_pack, ...) fails here
# even though the shim executes it happily.
PG_VIEW_FUNCTIONS = frozenset({"jsonb_agg", "jsonb_build_object", "encode"})

_IDENT = re.compile(r"^[a-z_][a-z0-9_]*$")


def check_ident(name: str) -> None:
    assert _IDENT.match(name), f"invalid bare identifier {name!r}"
    assert name not in PG_RESERVED, (
        f"identifier {name!r} is a Postgres RESERVED keyword and is emitted "
        "unquoted — DuckDB accepts it, Postgres will not"
    )


def check_qualname(name: str) -> None:
    parts = name.split(".")
    assert len(parts) in (1, 2), f"bad qualified name {name!r}"
    for p in parts:
        check_ident(p)


def check_type(t: str) -> None:
    base = t[:-2] if t.endswith("[]") else t
    if base in PG_BASE_TYPES:
        return
    m = re.match(r"^numeric\((\d+),(\d+)\)$", base)
    assert m, f"type {t!r} is not in the emitted Postgres type grammar"
    p, s = int(m.group(1)), int(m.group(2))
    assert 1 <= p <= 1000 and 0 <= s <= p, f"numeric bounds out of range: {t!r}"


def _split_top_level(s: str) -> list[str]:
    """Split on commas not inside parentheses (numeric(p,s) stays whole)."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


# ---------------------------------------------------------------------------
# Statement-shape validators
# ---------------------------------------------------------------------------

def validate_create_schema(sql: str) -> None:
    m = re.fullmatch(r"CREATE SCHEMA IF NOT EXISTS (\S+)", sql.strip())
    assert m, f"unrecognized CREATE SCHEMA shape: {sql!r}"
    check_ident(m.group(1))


def validate_create_table(sql: str) -> None:
    m = re.fullmatch(
        r"CREATE TABLE IF NOT EXISTS ([\w.]+) \((.*)\)",
        " ".join(sql.split()),
    )
    assert m, f"unrecognized CREATE TABLE shape: {sql!r}"
    check_qualname(m.group(1))
    items = _split_top_level(m.group(2))
    assert items, "empty column list"
    pk_items = [i for i in items if i.lower().startswith("primary key")]
    assert len(pk_items) == 1, "exactly one PRIMARY KEY clause required"
    cols: dict[str, str] = {}
    for item in items:
        if item is pk_items[0]:
            continue
        name, _, typ = item.partition(" ")
        check_ident(name)
        check_type(typ.strip())
        assert name not in cols, f"duplicate column {name!r}"
        cols[name] = typ.strip()
    pk_m = re.fullmatch(r"PRIMARY KEY \(([^)]+)\)", pk_items[0], re.I)
    assert pk_m, f"bad PRIMARY KEY clause: {pk_items[0]!r}"
    for c in (c.strip() for c in pk_m.group(1).split(",")):
        check_ident(c)
        assert c in cols, f"PK column {c!r} is not a declared column"


def validate_upsert(
    sql: str, table: str, columns: list[str], pk: list[str], version_col: str, n_rows: int
) -> None:
    m = re.fullmatch(
        r"INSERT INTO ([\w.]+) \(([^)]*)\) VALUES (.*) "
        r"ON CONFLICT \(([^)]*)\) DO UPDATE SET (.*) "
        r"WHERE excluded\.(\w+) >= ([\w.]+)\.(\w+)",
        " ".join(sql.split()),
    )
    assert m, f"unrecognized upsert shape: {sql!r}"
    check_qualname(m.group(1))
    assert m.group(1) == table
    got_cols = [c.strip() for c in m.group(2).split(",")]
    assert got_cols == list(columns)
    for c in got_cols:
        check_ident(c)
    # placeholder arithmetic: psycopg binds n_rows * n_cols parameters
    rows = _split_top_level(m.group(3))
    assert len(rows) == n_rows, f"expected {n_rows} value rows, got {len(rows)}"
    for row in rows:
        rm = re.fullmatch(r"\(([^)]*)\)", row)
        assert rm, f"bad VALUES row {row!r}"
        ph = [p.strip() for p in rm.group(1).split(",")]
        assert ph == ["%s"] * len(columns), f"bad placeholder row {row!r}"
    conflict_cols = [c.strip() for c in m.group(4).split(",")]
    assert conflict_cols == list(pk)
    # every SET assignment is `col = excluded.col` over non-PK columns
    assigns = [a.strip() for a in _split_top_level(m.group(5))]
    expect = [f"{c} = excluded.{c}" for c in columns if c not in pk]
    assert assigns == expect, f"SET clause drifted: {assigns} != {expect}"
    # recency guard references the version column on both sides,
    # table-qualified on the target (bare `v >= v` is ambiguous on PG)
    assert m.group(6) == version_col
    assert m.group(7) == table and m.group(8) == version_col


def _pg_parse_select(body: str) -> None:
    """Parse-only check through DuckDB's Postgres-derived grammar."""
    esc = body.replace("'", "''")
    raw = duckdb.execute(f"SELECT json_serialize_sql('{esc}')").fetchone()[0]
    d = json.loads(raw)
    assert not d.get("error"), f"view body failed to parse: {d.get('error_message')}"


_FUNC_CALL = re.compile(r"\b([a-z_][a-z0-9_]*)\s*\(")


def validate_create_view(sql: str) -> None:
    m = re.match(r"CREATE OR REPLACE VIEW ([\w.]+) AS\s+(.*)", sql, re.S)
    assert m, f"unrecognized CREATE VIEW shape: {sql!r}"
    check_qualname(m.group(1))
    body = m.group(2)
    _pg_parse_select(body)
    called = set(_FUNC_CALL.findall(body))
    unknown = called - PG_VIEW_FUNCTIONS
    assert not unknown, (
        f"view calls functions outside the Postgres-builtin whitelist: "
        f"{sorted(unknown)} — DuckDB-only functions execute in the shim "
        "but fail on the live sink"
    )


# ---------------------------------------------------------------------------
# Tests over every generated statement
# ---------------------------------------------------------------------------

def test_bootstrap_statements_all_validate():
    stmts = bootstrap_statements(list(ALL_SPECS.values()), SCHEMA)
    assert stmts[0].startswith("CREATE SCHEMA")
    n_tables = n_views = 0
    kinds = []
    for s in stmts:
        if s.startswith("CREATE SCHEMA"):
            validate_create_schema(s)
            kinds.append("schema")
        elif s.startswith("CREATE TABLE"):
            validate_create_table(s)
            kinds.append("table")
            n_tables += 1
        elif s.startswith("CREATE OR REPLACE VIEW"):
            validate_create_view(s)
            kinds.append("view")
            n_views += 1
        else:
            raise AssertionError(f"unexpected statement kind: {s[:60]!r}")
        assert "${" not in s, f"unsubstituted template var in {s[:80]!r}"
    assert n_tables == len(ALL_SPECS) + 1  # + ledger
    assert n_views >= 1
    # ordering invariant: every view comes after every table — a view
    # emitted before its base tables fails the live bootstrap even
    # though each statement validates individually
    assert kinds.index("view") > max(
        i for i, kind in enumerate(kinds) if kind == "table"
    )


_FROM_TARGET = re.compile(r"\b(?:FROM|JOIN)\s+([a-z_][\w.]*)", re.I)


def test_view_from_targets_are_schema_qualified():
    """Every FROM/JOIN target inside a substituted view body must be
    qualified into the substituted schema — an unqualified reference
    resolves against search_path on the live sink (DuckDB's shim happens
    to have the views registered unqualified, so only this assertion
    catches a substitute_schema regression)."""
    for stmt in view_statements(SCHEMA):
        body = stmt.split(" AS", 1)[1]
        targets = _FROM_TARGET.findall(body)
        assert targets, "view body has no FROM targets?"
        for t in targets:
            assert t.startswith(SCHEMA + "."), (
                f"unqualified view FROM target {t!r}"
            )


@pytest.mark.parametrize("name", sorted(ALL_SPECS))
def test_upsert_sql_validates(name):
    spec = ALL_SPECS[name]
    columns = [f.name for f in spec.schema.fields]
    for n_rows in (1, 3):
        sql = build_upsert_sql(
            f"{SCHEMA}.{spec.name}",
            columns,
            list(spec.primary_key),
            n_rows=n_rows,
        )
        validate_upsert(
            sql,
            f"{SCHEMA}.{spec.name}",
            columns,
            list(spec.primary_key),
            "updated_at",
            n_rows,
        )


def test_ledger_upsert_and_ddl_validate():
    validate_create_table(substitute_schema(ledger_ddl(), SCHEMA))
    columns = [f.name for f in LEDGER_SCHEMA.fields]
    sql = build_upsert_sql(
        f"{SCHEMA}.parquet_import_tracking",
        columns,
        ["file_name"],
        version_column="imported_at",
        n_rows=2,
    )
    validate_upsert(
        sql,
        f"{SCHEMA}.parquet_import_tracking",
        columns,
        ["file_name"],
        "imported_at",
        2,
    )


def test_every_spec_column_is_postgres_safe():
    """The root cause the shape validators guard against, checked at the
    catalog level too: no spec may declare a column or table name that
    is Postgres-reserved (it would need quoting everywhere)."""
    for spec in ALL_SPECS.values():
        check_ident(spec.name)
        for f in spec.schema.fields:
            check_ident(f.name)
        for c in spec.primary_key:
            check_ident(c)


def test_validators_reject_postgres_rejects():
    """The checkers must actually have teeth: statements DuckDB accepts
    but Postgres rejects (reserved identifier, alien type, DuckDB-only
    function, placeholder drift) must fail validation."""
    with pytest.raises(AssertionError, match="RESERVED"):
        validate_create_table(
            "CREATE TABLE IF NOT EXISTS s.t (\n    user bigint,\n    PRIMARY KEY (user)\n)"
        )
    with pytest.raises(AssertionError, match="type grammar"):
        # DuckDB's UBIGINT has no Postgres spelling
        validate_create_table(
            "CREATE TABLE IF NOT EXISTS s.t (\n    id ubigint,\n    PRIMARY KEY (id)\n)"
        )
    with pytest.raises(AssertionError, match="whitelist"):
        validate_create_view(
            "CREATE OR REPLACE VIEW s.v AS SELECT list_intersect(a, b) AS x FROM s.t"
        )
    with pytest.raises(AssertionError, match="parse"):
        validate_create_view("CREATE OR REPLACE VIEW s.v AS SELECT FROM WHERE (")
    good = build_upsert_sql("s.t", ["id", "v", "updated_at"], ["id"], n_rows=2)
    with pytest.raises(AssertionError):
        validate_upsert(good, "s.t", ["id", "v", "updated_at"], ["id"], "updated_at", 3)


def test_sqlglot_full_grammar_leg():
    """Full-grammar postgres parse of every statement — runs wherever
    sqlglot is installed (not this container; mirrors the env-gated
    live-sink legs). %s placeholders are psycopg-level, swapped for NULL
    before parsing."""
    sqlglot = pytest.importorskip("sqlglot")
    stmts = list(bootstrap_statements(list(ALL_SPECS.values()), SCHEMA))
    for spec in ALL_SPECS.values():
        stmts.append(
            build_upsert_sql(
                f"{SCHEMA}.{spec.name}",
                [f.name for f in spec.schema.fields],
                list(spec.primary_key),
                n_rows=2,
            ).replace("%s", "NULL")
        )
    for s in stmts:
        parsed = sqlglot.parse(s, read="postgres")
        assert parsed and all(p is not None for p in parsed), s[:80]
