"""DDL generation for JDBC sink bootstrap (reference S12 + P8).

The reference applies 37 hand-written schema/*.sql migrations with
``${POSTGRES_SCHEMA}`` substitution (db.py:68-162, pattern db.py:107,
substitution db.py:140). Here the catalog's TableSpec is the source of
truth and the Postgres DDL is *generated* from it — one declaration, two
artifacts (Spark StructType + sink DDL), no drift.
"""

from __future__ import annotations

from string import Template

from pyspark.sql import types as T

from ..catalog import LEDGER_SCHEMA, TableSpec

_PG_TYPES: dict[type, str] = {
    T.LongType: "bigint",
    T.IntegerType: "integer",
    T.ShortType: "smallint",
    T.FloatType: "real",
    T.DoubleType: "double precision",
    T.BooleanType: "boolean",
    T.StringType: "text",
    T.BinaryType: "bytea",
    T.TimestampType: "timestamp without time zone",
    T.DateType: "date",
}


def _pg_type(dtype: T.DataType) -> str:
    if isinstance(dtype, T.ArrayType):
        return _pg_type(dtype.elementType) + "[]"
    if isinstance(dtype, T.DecimalType):
        return f"numeric({dtype.precision},{dtype.scale})"
    try:
        return _PG_TYPES[type(dtype)]
    except KeyError as exc:
        raise ValueError(f"no postgres mapping for spark type {dtype}") from exc


def tablespec_to_pg_ddl(spec: TableSpec, schema: str = "${POSTGRES_SCHEMA}") -> str:
    """CREATE TABLE IF NOT EXISTS with the spec's PK; JSON columns become
    jsonb (they are raw-JSON strings on the Spark side)."""
    cols = []
    for field in spec.schema.fields:
        if field.name in spec.uuid_columns:
            pg = "uuid"  # normalized from fixed_size_binary[16] in-pipeline
        elif field.name in spec.json_columns:
            pg = "jsonb"
        else:
            pg = _pg_type(field.dataType)
        cols.append(f"    {field.name} {pg}")
    pk = ", ".join(spec.primary_key)
    body = ",\n".join(cols)
    return (
        f"CREATE TABLE IF NOT EXISTS {schema}.{spec.name} (\n{body},\n"
        f"    PRIMARY KEY ({pk})\n)"
    )


def ledger_ddl(schema: str = "${POSTGRES_SCHEMA}") -> str:
    """The tracking table (schema/000_00_all_parquet_import_tracking.sql)."""
    cols = ",\n".join(
        f"    {f.name} {_pg_type(f.dataType)}" for f in LEDGER_SCHEMA.fields
    )
    return (
        f"CREATE TABLE IF NOT EXISTS {schema}.parquet_import_tracking (\n{cols},\n"
        "    PRIMARY KEY (file_name)\n)"
    )


def substitute_schema(ddl: str, schema_name: str) -> str:
    """P8: ``${POSTGRES_SCHEMA}`` template substitution (db.py:140)."""
    return Template(ddl).safe_substitute(POSTGRES_SCHEMA=schema_name)


def bootstrap_statements(specs: list[TableSpec], schema_name: str) -> list[str]:
    """Ordered DDL for a fresh sink database: schema, ledger, tables —
    the init_db migration pass (db.py:105-160) regenerated from specs."""
    out = [f"CREATE SCHEMA IF NOT EXISTS {schema_name}"]
    out.append(substitute_schema(ledger_ddl(), schema_name))
    out.extend(substitute_schema(tablespec_to_pg_ddl(s), schema_name) for s in specs)
    return out
