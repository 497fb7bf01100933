"""Graph-sink schema bootstrap (reference S10's DDL half:
``database/neo4j_schema.py:9-140``): uniqueness constraints and indexes,
emitted conditionally on the selected table set.

Declarative re-expression, not a port: each schema group is a
(trigger-tables, statements) row; ``graph_schema_statements`` unions the
groups whose trigger set intersects the selection. Every statement is
``IF NOT EXISTS`` so the bootstrap is idempotent by construction — the
reference instead catches "equivalent constraint already exists" errors
per statement (neo4j_schema.py:70-76), which IF NOT EXISTS makes
unnecessary on any modern server.
"""

from __future__ import annotations

from collections.abc import Iterable

# (trigger tables, statements). Trigger sets mirror
# neo4j_schema.py:47-60; the import-tracking constraint is unconditional
# (":23-24" — always needed for the ledger graph twin).
_SCHEMA_GROUPS: list[tuple[frozenset[str] | None, list[str]]] = [
    (
        None,  # unconditional
        [
            "CREATE CONSTRAINT import_tracking_unique IF NOT EXISTS "
            "FOR (t:ImportTracking) REQUIRE (t.table_name, t.file_name) IS UNIQUE",
        ],
    ),
    # Property names are THIS ENGINE's emitted names, not the
    # reference's column names: transforms.users_to_nodes MERGEs User on
    # `id` (fid aliased) and verifications_to_nodes_and_edges MERGEs
    # Address on `id` ('0x'+hex address) with node prop `protocol` and
    # edge prop `timestamp`. Constraints/indexes declared over renamed
    # properties (u.fid, a.address, a.chain, r.verification_timestamp —
    # the reference's spellings) would never fire: the uniqueness MERGE
    # races under concurrent foreachPartition writers and every lookup
    # full-scans the label. Faithful to the reference's DDL INTENT
    # (which keys are unique, which props are indexed), mapped through
    # the engine's property renames.
    (
        frozenset({"fids", "profiles", "nindexer_fids", "nindexer_profiles"}),
        [
            "CREATE CONSTRAINT user_id_unique IF NOT EXISTS "
            "FOR (u:User) REQUIRE u.id IS UNIQUE",
            "CREATE INDEX user_username_index IF NOT EXISTS "
            "FOR (u:User) ON (u.username)",
            "CREATE INDEX user_updated_at_index IF NOT EXISTS "
            "FOR (u:User) ON (u.updated_at)",
        ],
    ),
    (
        frozenset(
            {"verifications", "account_verifications", "nindexer_verifications"}
        ),
        [
            "CREATE CONSTRAINT address_id_unique IF NOT EXISTS "
            "FOR (a:Address) REQUIRE a.id IS UNIQUE",
            "CREATE INDEX address_protocol_index IF NOT EXISTS "
            "FOR (a:Address) ON (a.protocol)",
            "CREATE INDEX address_updated_at_index IF NOT EXISTS "
            "FOR (a:Address) ON (a.updated_at)",
        ],
    ),
    (
        # NOTE: deliberately ONE group for both relationship families —
        # the reference's _create_relationship_indexes (neo4j_schema.py:
        # 57-60,122-140) creates the FOLLOWS and VERIFIED_ADDRESS indexes
        # together whenever ANY relationship table is selected, so a
        # follows-only deployment also gets VERIFIED_ADDRESS indexes.
        # Faithful over minimal: splitting would diverge from the
        # reference's observable DDL.
        frozenset(
            {
                "follows",
                "nindexer_follows",
                "verifications",
                "account_verifications",
                "nindexer_verifications",
            }
        ),
        [
            "CREATE INDEX follows_timestamp_index IF NOT EXISTS "
            "FOR ()-[r:FOLLOWS]-() ON (r.timestamp)",
            "CREATE INDEX follows_updated_at_index IF NOT EXISTS "
            "FOR ()-[r:FOLLOWS]-() ON (r.updated_at)",
            "CREATE INDEX verified_address_timestamp_index IF NOT EXISTS "
            "FOR ()-[r:VERIFIED_ADDRESS]-() ON (r.timestamp)",
            "CREATE INDEX verified_address_updated_at_index IF NOT EXISTS "
            "FOR ()-[r:VERIFIED_ADDRESS]-() ON (r.updated_at)",
        ],
    ),
]


def graph_schema_statements(tables: Iterable[str]) -> list[str]:
    """Bootstrap statements for the selected tables, in emission order.
    Unconditional groups always apply; conditional groups apply when any
    trigger table is selected (neo4j_schema.py:17-38's gating)."""
    selected = set(tables)
    out: list[str] = []
    for triggers, statements in _SCHEMA_GROUPS:
        if triggers is None or triggers & selected:
            out.extend(statements)
    return out


def apply_graph_schema(driver, tables: Iterable[str]) -> list[str]:
    """Run the bootstrap through a bolt driver session (lazy import, no
    graph DB in this container); returns the statements applied."""
    statements = graph_schema_statements(tables)
    with driver.session() as session:
        for stmt in statements:
            session.run(stmt)
    return statements
