"""Property-graph projection (reference U4-U6 transformers + J1 view).

The reference turns table rows into Neo4j MERGE operations
(transformers/follows.py:12-34, users.py:12-43, verifications.py:12-58,
Cypher in database/neo4j_queries.py:8-98). Spark-side the projection is
node/edge *DataFrames* (GraphFrames convention: ``id`` vertices,
``src``/``dst`` edges); the sink-side MERGE stays a connector concern
(foreachBatch + a graph writer), so the transforms are pure and
testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import hex0x


def follows_to_edges(follows: DataFrame) -> DataFrame:
    """U4: follows row -> FOLLOWS edge (src=fid, dst=target_fid, props
    timestamp/created/updated/deleted — transformers/follows.py:12-34)."""
    return follows.select(
        F.col("fid").alias("src"),
        F.col("target_fid").alias("dst"),
        F.lit("FOLLOWS").alias("relationship"),
        "timestamp",
        "created_at",
        "updated_at",
        "deleted_at",
    )


def users_to_nodes(df: DataFrame) -> DataFrame:
    """U5: fids/profiles row -> User node; keeps the P5 projection columns
    when present (transformers/users.py:16-33)."""
    optional = ["username", "display_name", "pfp_url", "bio"]
    cols = [F.col("fid").alias("id"), F.lit("User").alias("label"), "updated_at"]
    cols += [F.col(c) for c in optional if c in df.columns]
    return df.select(*cols)


def verifications_to_nodes_and_edges(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """U6: verification row -> Address node + HOLDS/VERIFIED_ADDRESS edge,
    address rendered '0x'+hex (transformers/verifications.py:12-58)."""
    nodes = df.select(
        hex0x("address").alias("id"),
        F.lit("Address").alias("label"),
        F.col("protocol"),
        "updated_at",
    )
    edges = df.select(
        F.col("fid").alias("src"),
        hex0x("address").alias("dst"),
        F.lit("VERIFIED_ADDRESS").alias("relationship"),
        "timestamp",
        "updated_at",
        "deleted_at",
    )
    return nodes, edges


def edges_to_node_keys(edges: DataFrame) -> DataFrame:
    """J2: implicit endpoint creation (MERGE by key, neo4j_queries.py:88-93)
    = distinct union of both endpoint key columns."""
    return (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def profiles_with_verifications(profiles: DataFrame, verifications: DataFrame) -> DataFrame:
    """The reference's one SQL view (schema/023:9-53): each profile left-
    joined to a timestamp-DESC-ordered JSON array of its live (deleted_at
    IS NULL) verifications with '0x'-hex addresses.

    The correlated per-row subquery decorrelates to aggregate-then-join;
    aggregation happens BEFORE the join so the shuffle carries one row per
    fid, and Catalyst broadcasts whichever side is small.
    """
    live = verifications.filter(F.col("deleted_at").isNull())
    agg = live.groupBy("fid").agg(
        F.to_json(
            F.reverse(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("timestamp"),
                            hex0x("address").alias("address"),
                            F.col("protocol"),
                        )
                    )
                )
            )
        ).alias("verifications")
    )
    joined = profiles.join(agg, "fid", "left")
    return joined.withColumn(
        "verifications", F.coalesce(F.col("verifications"), F.lit("[]"))
    )
