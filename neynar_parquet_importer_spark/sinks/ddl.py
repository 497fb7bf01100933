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


# spark-ddl element names (TableSpec.json_array_columns) -> postgres
_PG_ELEM = {
    "bigint": "bigint",
    "int": "integer",
    "integer": "integer",
    "smallint": "smallint",
    "string": "text",
    "float": "real",
    "double": "double precision",
}


def tablespec_to_pg_ddl(spec: TableSpec, schema: str = "${POSTGRES_SCHEMA}") -> str:
    """CREATE TABLE IF NOT EXISTS with the spec's PK. JSON columns become
    jsonb (raw-JSON strings on the Spark side) — except declared v2 array
    columns, which the pipeline parses to native arrays and the sink
    stores as element_type[] exactly like the reference's hand-written
    schema (e.g. schema/001: mentions bigint[])."""
    arr = dict(spec.json_array_columns)
    cols = []
    for field in spec.schema.fields:
        if field.name in spec.uuid_columns:
            pg = "uuid"  # normalized from fixed_size_binary[16] in-pipeline
        elif field.name in arr:
            pg = _PG_ELEM[arr[field.name]] + "[]"
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


# Sink-side view DDL (reference schema/023:9-53, ALL_VIEWS main.py:92-99).
# Transcribed semantics: each profile row carries the DESC-timestamp-ordered
# JSON aggregate of its non-deleted verifications with 0x-hex addresses.
VIEW_DDL: dict[str, str] = {
    "profiles_with_verifications": """\
CREATE OR REPLACE VIEW ${POSTGRES_SCHEMA}.profiles_with_verifications AS
SELECT
    p.id AS profile_id,
    p.created_at AS profile_created_at,
    p.updated_at AS profile_updated_at,
    p.deleted_at AS profile_deleted_at,
    p.fid AS profile_fid,
    p.bio,
    p.pfp_url,
    p.url,
    p.username AS profile_username,
    p.display_name,
    p.location,
    p.latitude,
    p.longitude,
    (
        SELECT jsonb_agg(
            jsonb_build_object(
                'timestamp', v.timestamp,
                'address', '0x' || encode(v.address, 'hex'),
                'protocol', v.protocol
            )
            ORDER BY v.timestamp DESC
        )
        FROM ${POSTGRES_SCHEMA}.verifications v
        WHERE v.fid = p.fid
        AND v.deleted_at IS NULL
    ) AS verifications
FROM
    ${POSTGRES_SCHEMA}.profiles p""",
}


def view_statements(schema_name: str, views: list[str] | None = None) -> list[str]:
    """DDL for registered sink views (in-engine twin:
    graph.transforms.profiles_with_verifications)."""
    names = list(VIEW_DDL) if views is None else views
    return [substitute_schema(VIEW_DDL[name], schema_name) for name in names]


def bootstrap_statements(
    specs: list[TableSpec],
    schema_name: str,
    views: list[str] | None = None,
) -> list[str]:
    """Ordered DDL for a fresh sink database: schema, ledger, tables, then
    views over them — the init_db migration pass (db.py:105-160)
    regenerated from specs. ``views`` names entries in VIEW_DDL (the
    ALL_VIEWS registry in catalog maps schema coordinates to view names);
    default emits every known view whose base tables are in ``specs``."""
    out = [f"CREATE SCHEMA IF NOT EXISTS {schema_name}"]
    out.append(substitute_schema(ledger_ddl(), schema_name))
    out.extend(substitute_schema(tablespec_to_pg_ddl(s), schema_name) for s in specs)
    if views is None:
        from ..catalog import ALL_VIEWS

        have = {s.name for s in specs}
        views = [
            name
            for registry in ALL_VIEWS.values()
            for name, required in registry.items()
            if set(required) <= have
        ]
    out.extend(view_statements(schema_name, views))
    return out
