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

from collections.abc import Callable, Iterable, Sequence

from pyspark.sql import DataFrame

from ..sinks.jdbc_upsert import retry_with_backoff


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


def _neo4j_open_session(uri: str, auth: tuple[str, str]):
    """Default session opener: (driver, session) over bolt. Split out so
    tests (and alternative drivers) can inject an opener — the same seam
    as jdbc_upsert's connect_fn."""
    try:
        from neo4j import GraphDatabase  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - no neo4j here
        raise RuntimeError("neo4j driver not installed") from exc
    driver = GraphDatabase.driver(uri, auth=auth)
    return driver, driver.session()


def write_merge_partition(
    rows_iter: Iterable,
    open_session: Callable[[], tuple],
    cypher: str,
    batch_size: int,
    to_dict: Callable = None,
    retry: Callable[[Callable[[], None]], None] = retry_with_backoff,
) -> None:
    """One partition's MERGE loop (module-level so tests drive it
    directly; ``write_nodes``/``write_edges`` run it in
    foreachPartition). Same discipline as the JDBC partition body:

    - STREAMS the partition in ``batch_size`` UNWIND chunks — executor
      memory is bounded by the chunk, never the partition;
    - opens the bolt session lazily (empty partitions connect nothing);
    - each chunk runs under the retry wrapper, and a failed attempt
      CLOSES the session/driver so the next attempt reconnects —
      re-running a chunk is idempotent because MERGE is (the reference's
      own recovery assumption, database/neo4j.py:60-170).
    """
    to_dict = to_dict or (lambda r: r.asDict())
    state: dict = {"driver": None, "session": None}

    def ensure():
        if state["session"] is None:
            state["driver"], state["session"] = open_session()
        return state["session"]

    def drop() -> None:
        for k in ("session", "driver"):
            obj = state[k]
            state[k] = None
            if obj is not None:
                try:
                    obj.close()
                except Exception:
                    pass  # a dead socket may refuse even the close

    def flush(payload: list[dict]) -> None:
        def run() -> None:
            session = ensure()
            try:
                result = session.run(cypher, batch=payload)
                # CONSUME the result: with the sync bolt driver an
                # auto-commit query's execution errors (constraint
                # violation, server-side failure mid-UNWIND) surface on
                # consumption, not at run(). Unconsumed, a failed chunk
                # reports success here and the error either re-raises
                # against the NEXT chunk (whose retry re-runs the wrong
                # payload) or dies inside drop()'s close-swallow —
                # silently lost writes either way.
                if result is not None and hasattr(result, "consume"):
                    result.consume()
            except Exception:
                drop()  # reconnect on the next attempt
                raise

        retry(run)

    try:
        batch: list[dict] = []
        for row in rows_iter:
            batch.append(to_dict(row))
            if len(batch) >= batch_size:
                flush(batch)
                batch = []
        if batch:
            flush(batch)
    finally:
        drop()


def write_nodes(
    df: DataFrame,
    uri: str,
    auth: tuple[str, str],
    label: str,
    key: str = "id",
    batch_size: int = 1000,
    session_factory: Callable | None = None,
) -> None:
    """Distributed MERGE of a node DataFrame. One bolt session per
    partition; rows stream in ``batch_size`` chunks through
    :func:`write_merge_partition`."""
    batch_size = clamp_batch_size(batch_size)
    columns = df.columns
    cypher = node_merge_cypher(label, key, columns)
    factory = session_factory or (lambda: _neo4j_open_session(uri, auth))

    def write_partition(rows_iter) -> None:
        write_merge_partition(rows_iter, factory, cypher, batch_size)

    df.foreachPartition(write_partition)


def write_edges(
    df: DataFrame,
    uri: str,
    auth: tuple[str, str],
    rel_type: str,
    src_label: str,
    dst_label: str,
    src_key: str = "id",
    dst_key: str = "id",
    batch_size: int = 1000,
    session_factory: Callable | None = None,
) -> None:
    """Distributed MERGE of an edge DataFrame (columns ``src``, ``dst``,
    plus relationship properties). Endpoints are MERGEd by key so missing
    nodes are created implicitly (J2); same partition discipline as
    :func:`write_nodes`."""
    batch_size = clamp_batch_size(batch_size)
    props = [c for c in df.columns if c not in ("src", "dst")]
    cypher = edge_merge_cypher(
        rel_type, src_label, dst_label, src_key, dst_key, props
    )
    factory = session_factory or (lambda: _neo4j_open_session(uri, auth))

    def write_partition(rows_iter) -> None:
        write_merge_partition(rows_iter, factory, cypher, batch_size)

    df.foreachPartition(write_partition)
