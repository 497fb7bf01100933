"""Machine-check the generated Postgres SQL dialect in-sandbox.

The live wire is env-bound (tests/test_live_sinks.py), and the DuckDB
shim executing these statements proves *DuckDB* accepts them — but
DuckDB's grammar is more permissive than Postgres's in places (type
names, identifier rules). This module closes that gap without a network
or a docker daemon:

1. a strict structural validator for every statement FAMILY the sinks
   emit (CREATE SCHEMA / CREATE TABLE / INSERT ... ON CONFLICT / CREATE
   OR REPLACE VIEW): identifiers must be legal unquoted Postgres
   identifiers and not RESERVED keywords, every column type must be on
   the Postgres type whitelist the DDL generator targets, parens must
   balance, placeholders must match n_rows x n_columns, the conflict
   target must be the primary key and the DO UPDATE SET list must touch
   exactly the non-PK columns with a recency guard;
2. when ``sqlglot`` is importable (not in this container, common in CI),
   every statement additionally round-trips through its postgres parser.

Reserved-word list = the `reserved` class of the public PostgreSQL 16
keyword table (SQL standard appendix C) — the words that CANNOT be used
as bare column/table names. Non-reserved and col_name keywords
(``timestamp``, ``location``, ``protocol``...) are legal identifiers and
the reference's own schema uses them.
"""

from __future__ import annotations

import re

import pytest

from neynar_parquet_importer_spark.catalog import (
    REFERENCE_TABLES_V2 as TABLES_V2,
    REFERENCE_TABLES_V3 as TABLES_V3,
)
from neynar_parquet_importer_spark.sinks.ddl import (
    bootstrap_statements,
    ledger_ddl,
    substitute_schema,
    tablespec_to_pg_ddl,
    view_statements,
)
from neynar_parquet_importer_spark.sinks.jdbc_upsert import build_upsert_sql

# PostgreSQL reserved keywords (cannot be bare identifiers); public PG
# docs "SQL Key Words" table, reserved column. Lowercase for comparison.
PG_RESERVED = {
    "all", "analyse", "analyze", "and", "any", "array", "as", "asc",
    "asymmetric", "both", "case", "cast", "check", "collate", "column",
    "constraint", "create", "current_catalog", "current_date",
    "current_role", "current_time", "current_timestamp", "current_user",
    "default", "deferrable", "desc", "distinct", "do", "else", "end",
    "except", "false", "fetch", "for", "foreign", "from", "grant",
    "group", "having", "in", "initially", "intersect", "into", "lateral",
    "leading", "limit", "localtime", "localtimestamp", "not", "null",
    "offset", "on", "only", "or", "order", "placing", "primary",
    "references", "returning", "select", "session_user", "some",
    "symmetric", "system_user", "table", "then", "to", "trailing",
    "true", "union", "unique", "user", "using", "variadic", "when",
    "where", "window", "with",
}

IDENT_RE = re.compile(r"^[a-z_][a-z0-9_]*$")

# Exactly the type surface sinks/ddl.py generates (plus array suffixes).
PG_TYPES = {
    "bigint", "integer", "smallint", "real", "double precision",
    "boolean", "text", "bytea", "timestamp without time zone", "date",
    "uuid", "jsonb",
}
NUMERIC_RE = re.compile(r"^numeric\(\d+,\d+\)$")


def assert_pg_identifier(name: str, ctx: str) -> None:
    assert IDENT_RE.match(name), f"{ctx}: {name!r} is not a legal bare identifier"
    assert name not in PG_RESERVED, f"{ctx}: {name!r} is a reserved keyword"


def assert_pg_type(t: str, ctx: str) -> None:
    base = t[:-2] if t.endswith("[]") else t
    assert base in PG_TYPES or NUMERIC_RE.match(base), (
        f"{ctx}: {t!r} is not a recognized postgres type"
    )


def assert_balanced(sql: str) -> None:
    depth = 0
    for ch in sql:
        depth += ch == "("
        depth -= ch == ")"
        assert depth >= 0, f"unbalanced parens in: {sql[:120]}..."
    assert depth == 0, f"unbalanced parens in: {sql[:120]}..."


CREATE_TABLE_RE = re.compile(
    r"^CREATE TABLE IF NOT EXISTS (?P<schema>\w+)\.(?P<table>\w+) \(\n"
    r"(?P<body>(?:    \w+ [a-z0-9_ ()\[\],]+,\n)+)"
    r"    PRIMARY KEY \((?P<pk>\w+(?:, \w+)*)\)\n\)$"
)


def _check_create_table(sql: str) -> None:
    assert_balanced(sql)
    m = CREATE_TABLE_RE.match(sql)
    assert m, f"CREATE TABLE shape mismatch:\n{sql}"
    assert_pg_identifier(m["schema"], "schema")
    assert_pg_identifier(m["table"], "table")
    cols: dict[str, str] = {}
    for line in m["body"].rstrip("\n").split("\n"):
        name, _, typ = line.strip().rstrip(",").partition(" ")
        assert_pg_identifier(name, f"{m['table']} column")
        assert_pg_type(typ, f"{m['table']}.{name}")
        assert name not in cols, f"duplicate column {name}"
        cols[name] = typ
    for k in m["pk"].split(", "):
        assert k in cols, f"PRIMARY KEY column {k} not declared"


@pytest.mark.parametrize(
    "spec", [*TABLES_V2.values(), *TABLES_V3.values()], ids=lambda s: s.name
)
def test_generated_table_ddl_is_valid_pg(spec):
    _check_create_table(substitute_schema(tablespec_to_pg_ddl(spec), "nindexer"))


def test_ledger_ddl_is_valid_pg():
    _check_create_table(substitute_schema(ledger_ddl(), "nindexer"))


UPSERT_RE = re.compile(
    r"^INSERT INTO (?P<table>\w+(?:\.\w+)?) \((?P<cols>[\w, ]+)\) "
    r"VALUES (?P<values>\(%s(?:, %s)*\)(?:, \(%s(?:, %s)*\))*) "
    r"ON CONFLICT \((?P<pk>[\w, ]+)\) DO UPDATE SET (?P<sets>.+) "
    r"WHERE excluded\.(?P<vcol>\w+) >= (?P<table2>\w+(?:\.\w+)?)\.(?P=vcol)$"
)


@pytest.mark.parametrize("n_rows", [1, 2, 7])
@pytest.mark.parametrize(
    "table,columns,pk",
    [
        ("nindexer.casts", ["id", "fid", "text", "updated_at"], ["id"]),
        ("ledger", ["file_name", "imported_at", "updated_at"], ["file_name"]),
        ("s.t", ["a", "b", "c", "updated_at"], ["a", "b"]),
    ],
)
def test_generated_upsert_is_valid_pg(table, columns, pk, n_rows):
    sql = build_upsert_sql(table, columns, pk, "updated_at", n_rows=n_rows)
    assert_balanced(sql)
    m = UPSERT_RE.match(sql)
    assert m, f"upsert shape mismatch:\n{sql}"
    assert m["table"] == m["table2"] == table
    for part in table.split("."):
        assert_pg_identifier(part, "upsert table")
    cols = m["cols"].split(", ")
    for c in cols:
        assert_pg_identifier(c, "upsert column")
    assert cols == list(columns)
    # placeholder arity: n_rows tuples x n_columns params — the property
    # the 65,535-bind-param chunker relies on
    assert sql.count("%s") == n_rows * len(columns)
    assert m["values"].count("(") == n_rows
    # conflict target is exactly the PK
    assert m["pk"].split(", ") == list(pk)
    # DO UPDATE SET touches exactly the non-PK columns, each from excluded
    sets = dict(
        s.split(" = ", 1) for s in m["sets"].split(", ")
    )
    assert set(sets) == set(columns) - set(pk)
    for col, rhs in sets.items():
        assert rhs == f"excluded.{col}", f"non-excluded update source: {rhs}"
    # recency guard names the version column
    assert m["vcol"] == "updated_at"


def test_bootstrap_statement_order_and_substitution():
    specs = [TABLES_V3["casts"], TABLES_V3["profiles"], TABLES_V3["verifications"]]
    stmts = bootstrap_statements(specs, "nindexer")
    assert stmts[0] == "CREATE SCHEMA IF NOT EXISTS nindexer"
    for s in stmts:
        assert "${" not in s, f"unsubstituted template var in:\n{s}"
        assert ";" not in s, "statements must be single, unterminated"
        assert_balanced(s)
    # profiles + verifications present -> the view ships, after its bases
    views = [s for s in stmts if s.startswith("CREATE OR REPLACE VIEW")]
    assert len(views) == 1 and "profiles_with_verifications" in views[0]
    assert stmts.index(views[0]) > max(
        i for i, s in enumerate(stmts) if s.startswith("CREATE TABLE")
    )


VIEW_HEAD_RE = re.compile(
    r"^CREATE OR REPLACE VIEW (?P<schema>\w+)\.(?P<name>\w+) AS\nSELECT\n"
)


def test_view_ddl_shape():
    (sql,) = view_statements("nindexer")
    assert_balanced(sql)
    m = VIEW_HEAD_RE.match(sql)
    assert m, f"view head mismatch:\n{sql[:120]}"
    assert_pg_identifier(m["schema"], "view schema")
    assert_pg_identifier(m["name"], "view name")
    # every FROM target is schema-qualified into the substituted schema
    for tbl in re.findall(r"FROM\s+(\S+)", sql):
        assert tbl.startswith("nindexer."), f"unqualified FROM target {tbl}"
    # PG-specific call surface is intentional and fixed: jsonb aggregate
    # with ORDER BY inside the aggregate, hex encode of bytea
    assert "jsonb_agg(" in sql and "ORDER BY v.timestamp DESC" in sql
    assert "encode(v.address, 'hex')" in sql


def test_full_parse_with_sqlglot_when_available():
    """Full postgres-grammar parse of every generated statement — runs
    wherever sqlglot is installed (CI), cleanly skips in this container."""
    sqlglot = pytest.importorskip("sqlglot")
    specs = [*TABLES_V2.values(), *TABLES_V3.values()]
    stmts = bootstrap_statements(specs, "nindexer")
    stmts.append(
        build_upsert_sql(
            "nindexer.casts", ["id", "fid", "text", "updated_at"], ["id"], n_rows=3
        ).replace("%s", "NULL")  # placeholders aren't grammar
    )
    for s in stmts:
        sqlglot.parse_one(s, read="postgres")
