"""Graph MERGE sink (reference S10): node/edge DataFrames -> batched
Cypher MERGE statements.

The reference groups operations by type and runs
``UNWIND $batch MERGE ...`` per group in one transaction
(database/neo4j.py:60-170, query builders neo4j_queries.py:8-98). Here
the builders are pure functions (unit-testable without a Neo4j), and the
distributed write is ``foreachPartition`` with one driver-connection per
partition — the same shape as the JDBC upsert sink. The neo4j import is
lazy/gated (not installed in this container).

Batch sizing mirrors the reference's adaptive envelope
(unified_performance.py:82-84): default 1000, clamped to [100, 10000].
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def node_merge_cypher(label: str, key: str, prop_columns: Sequence[str]) -> str:
    """UNWIND-MERGE for a node batch; label is title-cased from the table
    name at the call site (P6, transformers/base.py:98 analog)."""
    sets = ", ".join(f"n.{c} = row.{c}" for c in prop_columns if c != key)
    set_clause = f" SET {sets}" if sets else ""
    return (
        "UNWIND $batch AS row "
        f"MERGE (n:{label} {{{key}: row.{key}}})"
        f"{set_clause}"
    )


def edge_merge_cypher(
    rel_type: str,
    src_label: str,
    dst_label: str,
    src_key: str = "id",
    dst_key: str = "id",
    prop_columns: Sequence[str] = (),
) -> str:
    """UNWIND-MERGE for an edge batch; endpoints are MERGEd by key so
    missing nodes are created implicitly (J2, neo4j_queries.py:88-93)."""
    sets = ", ".join(f"r.{c} = row.{c}" for c in prop_columns)
    set_clause = f" SET {sets}" if sets else ""
    return (
        "UNWIND $batch AS row "
        f"MERGE (a:{src_label} {{{src_key}: row.src}}) "
        f"MERGE (b:{dst_label} {{{dst_key}: row.dst}}) "
        f"MERGE (a)-[r:{rel_type}]->(b)"
        f"{set_clause}"
    )


def clamp_batch_size(size: int, lo: int = 100, hi: int = 10_000) -> int:
    return max(lo, min(hi, size))


def table_to_label(table_name: str) -> str:
    """P6: table name -> node label via title-case (base.py:98)."""
    return table_name.title()


def write_nodes(
    df: DataFrame,
    uri: str,
    auth: tuple[str, str],
    label: str,
    key: str = "id",
    batch_size: int = 1000,
) -> None:
    """Distributed MERGE of a node DataFrame. One bolt session per
    partition; rows stream in ``batch_size`` chunks."""
    batch_size = clamp_batch_size(batch_size)
    columns = df.columns
    cypher = node_merge_cypher(label, key, columns)

    def write_partition(rows_iter) -> None:
        try:
            from neo4j import GraphDatabase  # noqa: PLC0415
        except ImportError as exc:  # pragma: no cover - no neo4j here
            raise RuntimeError("neo4j driver not installed") from exc
        batch: list[dict] = []
        with GraphDatabase.driver(uri, auth=auth) as driver, driver.session() as session:
            for row in rows_iter:
                batch.append(row.asDict())
                if len(batch) >= batch_size:
                    session.run(cypher, batch=batch)
                    batch = []
            if batch:
                session.run(cypher, batch=batch)

    df.foreachPartition(write_partition)
