"""Control-plane tests: observe()-based metrics + cost metering, graph
MERGE statement builders, DDL generation."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.catalog import REFERENCE_TABLES
from neynar_parquet_importer_spark.graph.writer import (
    clamp_batch_size,
    edge_merge_cypher,
    node_merge_cypher,
    table_to_label,
)
from neynar_parquet_importer_spark.sinks.ddl import (
    bootstrap_statements,
    ledger_ddl,
    substitute_schema,
    tablespec_to_pg_ddl,
)
from neynar_parquet_importer_spark.streaming.metrics import (
    BatchMetrics,
    collect_metrics,
    compute_unit_cost,
    observe_filter,
)


def test_observe_filter_counts(spark):
    df = spark.range(100)
    scanned, kept = Observation(), Observation()
    out = observe_filter(df, F.col("id") < 30, scanned, kept)
    assert out.count() == 30
    m = collect_metrics(scanned, kept, window_end_ts=90.0, now=100.0)
    assert (m.rows_scanned, m.rows_imported, m.rows_filtered) == (100, 30, 70)
    assert m.file_age_s == 10.0


def test_compute_unit_cost():
    m = BatchMetrics(rows_scanned=100, rows_imported=30, rows_filtered=70)
    # filters active: all scanned rows at 1.1x (db.py:844-856)
    assert compute_unit_cost(m, cost_per_row=2.0, filters_active=True) == 100 * 1.1 * 2.0
    assert compute_unit_cost(m, cost_per_row=2.0, filters_active=False) == 30 * 2.0


def test_node_merge_cypher():
    q = node_merge_cypher("User", "id", ["id", "username", "updated_at"])
    assert q.startswith("UNWIND $batch AS row MERGE (n:User {id: row.id})")
    assert "n.username = row.username" in q and "n.id = row.id" not in q


def test_edge_merge_cypher():
    q = edge_merge_cypher("FOLLOWS", "User", "User", prop_columns=["timestamp"])
    assert "MERGE (a:User {id: row.src})" in q
    assert "MERGE (b:User {id: row.dst})" in q
    assert "MERGE (a)-[r:FOLLOWS]->(b)" in q and "r.timestamp = row.timestamp" in q


def test_batch_clamp_and_label():
    assert clamp_batch_size(50) == 100
    assert clamp_batch_size(50_000) == 10_000
    assert clamp_batch_size(1234) == 1234
    assert table_to_label("follows") == "Follows"


def test_tablespec_ddl():
    ddl = tablespec_to_pg_ddl(REFERENCE_TABLES["verifications"], schema="s")
    assert "CREATE TABLE IF NOT EXISTS s.verifications" in ddl
    assert "address bytea" in ddl
    assert "protocol smallint" in ddl
    assert "PRIMARY KEY (id)" in ddl
    casts = tablespec_to_pg_ddl(REFERENCE_TABLES["casts"], schema="s")
    assert "embeds jsonb" in casts  # json columns map to jsonb
    assert "mentions bigint[]" in casts


def test_schema_substitution():
    ddl = ledger_ddl()
    assert "${POSTGRES_SCHEMA}" in ddl
    assert "public.parquet_import_tracking" in substitute_schema(ddl, "public")


def test_bootstrap_statements_order():
    stmts = bootstrap_statements([REFERENCE_TABLES["follows"]], "nindexer")
    assert stmts[0].startswith("CREATE SCHEMA")
    assert "parquet_import_tracking" in stmts[1]
    assert "nindexer.follows" in stmts[2]
