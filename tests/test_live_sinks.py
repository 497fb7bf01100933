"""Live-sink contract tests, environment-gated.

The sandbox has no Postgres or Neo4j, so the MERGE semantics are proven
elsewhere against in-process stand-ins (DuckDB executes the generated
SQL in test_upsert_ledger.py; networkx replays the Cypher semantics in
test_graph_merge_semantics.py). This module closes the remaining gap in
two ways:

1. the full psycopg WRITER PATH (prepare -> foreachPartition -> chunk ->
   statement build -> retry -> commit) executes its SQL against a
   file-backed DuckDB through the injectable connection factory — the
   exact code that would talk to Postgres runs end-to-end in every CI
   run, only the socket is swapped;
2. when ``TEST_POSTGRES_DSN`` / ``TEST_NEO4J_URI`` are set (real
   hardware, e.g. testcontainers), the same writers run against the live
   services (reference behavior: db.py:884-893, database/neo4j.py:60-170)
   and the tests assert recency-guarded idempotency there. They skip
   cleanly otherwise.
"""

from __future__ import annotations

import os

import pytest

from neynar_parquet_importer_spark.sinks.jdbc_upsert import jdbc_upsert_writer

PG_DSN = os.environ.get("TEST_POSTGRES_DSN")
NEO4J_URI = os.environ.get("TEST_NEO4J_URI")
NEO4J_USER = os.environ.get("TEST_NEO4J_USER", "neo4j")
NEO4J_PASSWORD = os.environ.get("TEST_NEO4J_PASSWORD", "")

SCHEMA = "id long, v string, updated_at long"


# -- in-process executed-SQL stand-in (runs everywhere) ---------------------

def test_jdbc_writer_path_executes_sql_in_process(spark, tmp_path):
    """The real partition-writer path (dedup, chunking, statement build,
    retry wrapper, commit) runs through foreachPartition in an executor
    and its generated SQL executes for real — recency guard included —
    with only the connection factory swapped for a DuckDB-backed shim.
    The shim classes are local so cloudpickle ships them by value (the
    test module isn't importable on executor workers)."""
    import duckdb

    class _DuckCursor:
        def __init__(self, con):
            self._con = con

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def execute(self, sql, params):
            # psycopg placeholders -> DuckDB placeholders; the statement
            # (ON CONFLICT .. excluded .. recency guard) otherwise runs as-is
            self._con.execute(sql.replace("%s", "?"), list(params))

    class _DuckConn:
        """DBAPI-ish shim: what jdbc_upsert_writer expects from psycopg's
        connection, backed by a file DuckDB so executor writes are
        visible to the test process."""

        def __init__(self, dsn):
            import duckdb as _duckdb

            self._con = _duckdb.connect(dsn)

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            self._con.close()
            return False

        def cursor(self):
            return _DuckCursor(self._con)

        def commit(self):
            pass

    db = str(tmp_path / "pg_standin.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE t (id BIGINT PRIMARY KEY, v VARCHAR, updated_at BIGINT)")
    con.close()  # release the writer lock before the executor opens it

    b1 = spark.createDataFrame(
        [(1, "a", 10), (1, "a-newer", 11), (2, "b", 10)], SCHEMA
    )
    # max_connections=1 -> one partition -> one writer process (the file
    # engine allows a single writer; Postgres itself has no such limit)
    jdbc_upsert_writer(b1, db, "t", ["id"], "updated_at", 1, connect_fn=_DuckConn)

    # stale replay (must lose) + genuine update + new row
    b2 = spark.createDataFrame(
        [(1, "a-stale", 5), (2, "b2", 20), (3, "c", 20)], SCHEMA
    )
    jdbc_upsert_writer(b2, db, "t", ["id"], "updated_at", 1, connect_fn=_DuckConn)

    con = duckdb.connect(db)
    rows = con.execute("SELECT id, v, updated_at FROM t ORDER BY id").fetchall()
    con.close()
    assert rows == [(1, "a-newer", 11), (2, "b2", 20), (3, "c", 20)]


# -- failure-path + streaming contracts (direct partition-body drive) -------
#
# write_partition_rows is the exact body foreachPartition runs; driving it
# directly lets these tests observe laziness and failure handling without
# crossing an executor boundary (that crossing is covered above).

class _DuckCursor2:
    def __init__(self, con):
        self._con = con

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def execute(self, sql, params):
        self._con.execute(sql.replace("%s", "?"), list(params))


class _DuckConn2:
    def __init__(self, dsn):
        import duckdb

        self._con = duckdb.connect(dsn)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self._con.close()
        return False

    def close(self):
        self._con.close()

    def cursor(self):
        return _DuckCursor2(self._con)

    def commit(self):
        pass


def _no_sleep_retry(attempts):
    def retry(fn):
        for i in range(attempts):
            try:
                fn()
                return
            except Exception:
                if i == attempts - 1:
                    raise
    return retry


def test_writer_streams_partition_lazily():
    """Scale contract: the partition body must pull rows one param-limit
    chunk at a time — after the connection-budget coalesce a real
    partition is enormous, so materializing it before chunking (the
    pre-round-4 behavior, and the reference's own hazard db.py:796-797)
    is unbounded executor memory. Observed directly: at every statement
    execution, the source iterator has yielded no more than one chunk
    beyond what has already been executed."""
    from neynar_parquet_importer_spark.sinks.jdbc_upsert import (
        write_partition_rows,
    )

    yielded = {"n": 0}
    executed: list[tuple[int, int]] = []  # (rows_executed_so_far, yielded_at_exec)

    def rows():
        for i in range(10):
            yielded["n"] += 1
            yield (i, f"v{i}", 1)

    class _Cursor:
        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def execute(self, sql, params):
            executed.append((len(params) // 3, yielded["n"]))

    class _Conn:
        def __init__(self, dsn):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def cursor(self):
            return _Cursor()

        def commit(self):
            pass

    # 3 columns, max_params=9 -> 3 rows per chunk, 4 chunks for 10 rows
    write_partition_rows(
        rows(), _Conn, "dsn", "t", ["id", "v", "updated_at"], ["id"],
        max_params=9, retry=_no_sleep_retry(1),
    )
    assert [r for r, _ in executed] == [3, 3, 3, 1]
    done = 0
    for rows_in_chunk, yielded_at_exec in executed:
        # lazily pulled: one chunk of lookahead beyond committed work
        assert yielded_at_exec <= done + 3
        done += rows_in_chunk
    assert yielded["n"] == 10


def test_mid_batch_connection_drop_resumes_from_failed_chunk(tmp_path):
    """A connection lost mid-partition must not lose or duplicate data:
    prior chunks are committed, the failed chunk's retry RECONNECTS (the
    dead connection is dropped) and re-executes idempotently."""
    import duckdb

    from neynar_parquet_importer_spark.sinks.jdbc_upsert import (
        write_partition_rows,
    )

    db = str(tmp_path / "dropconn.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE t (id BIGINT PRIMARY KEY, v VARCHAR, updated_at BIGINT)")
    con.close()

    connects = {"n": 0}
    fail_state = {"armed": True}

    class _FlakyCursor(_DuckCursor2):
        def execute(self, sql, params):
            # simulate the socket dying while executing the SECOND chunk,
            # exactly once
            if fail_state["armed"] and params and params[0] == 2:
                fail_state["armed"] = False
                raise RuntimeError("connection dropped mid-batch")
            super().execute(sql, params)

    class _FlakyConn(_DuckConn2):
        def __init__(self, dsn):
            connects["n"] += 1
            super().__init__(dsn)

        def cursor(self):
            return _FlakyCursor(self._con)

    rows = [(i, f"v{i}", 1) for i in range(4)]
    # 3 columns, max_params=6 -> 2 rows per chunk; chunk 2 starts at id=2
    write_partition_rows(
        rows, _FlakyConn, db, "t", ["id", "v", "updated_at"], ["id"],
        max_params=6, retry=_no_sleep_retry(3),
    )
    assert connects["n"] == 2  # the retry opened a fresh connection
    con = duckdb.connect(db)
    got = con.execute("SELECT id, v FROM t ORDER BY id").fetchall()
    con.close()
    assert got == [(0, "v0"), (1, "v1"), (2, "v2"), (3, "v3")]


def test_duplicate_pk_in_one_statement_is_rejected_without_dedup(tmp_path):
    """The engine-level hazard the PK dedup guards: one statement touching
    the same PK twice is REJECTED by the database (Postgres raises 'row
    updated twice'; DuckDB raises a duplicate-key constraint error — same
    contract). Driving the partition body with un-deduped rows must fail;
    the full writer (which dedups in prepare_upsert_frame) succeeds on
    identical input — proven by test_jdbc_writer_path_executes_sql_in_process."""
    import duckdb

    from neynar_parquet_importer_spark.sinks.jdbc_upsert import (
        write_partition_rows,
    )

    db = str(tmp_path / "duppk.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE t (id BIGINT PRIMARY KEY, v VARCHAR, updated_at BIGINT)")
    con.close()

    rows = [(1, "a", 10), (1, "a-newer", 11)]
    with pytest.raises(Exception, match="(?i)duplicate|updated twice"):
        write_partition_rows(
            rows, _DuckConn2, db, "t", ["id", "v", "updated_at"], ["id"],
            retry=_no_sleep_retry(1),
        )


# -- live services (skip cleanly in the sandbox) ----------------------------

@pytest.mark.skipif(
    not PG_DSN, reason="TEST_POSTGRES_DSN not set; live Postgres test skipped"
)
def test_live_postgres_upsert_contract(spark):
    psycopg = pytest.importorskip("psycopg")
    table = "spark_upsert_contract_test"
    with psycopg.connect(PG_DSN) as conn:
        with conn.cursor() as cur:
            cur.execute(f"DROP TABLE IF EXISTS {table}")
            cur.execute(
                f"CREATE TABLE {table} "
                "(id BIGINT PRIMARY KEY, v TEXT, updated_at BIGINT)"
            )
        conn.commit()

    b1 = spark.createDataFrame([(1, "a", 10), (2, "b", 10)], SCHEMA)
    jdbc_upsert_writer(b1, PG_DSN, table, ["id"], "updated_at", 4)
    b2 = spark.createDataFrame([(1, "stale", 5), (2, "b2", 20), (3, "c", 20)], SCHEMA)
    jdbc_upsert_writer(b2, PG_DSN, table, ["id"], "updated_at", 4)
    # idempotent re-import (reference catch-up behavior)
    jdbc_upsert_writer(b2, PG_DSN, table, ["id"], "updated_at", 4)

    with psycopg.connect(PG_DSN) as conn:
        with conn.cursor() as cur:
            cur.execute(f"SELECT id, v, updated_at FROM {table} ORDER BY id")
            rows = cur.fetchall()
            cur.execute(f"DROP TABLE {table}")
        conn.commit()
    assert rows == [(1, "a", 10), (2, "b2", 20), (3, "c", 20)]


@pytest.mark.skipif(
    not NEO4J_URI, reason="TEST_NEO4J_URI not set; live Neo4j test skipped"
)
def test_live_neo4j_node_merge_idempotent(spark):
    neo4j = pytest.importorskip("neo4j")
    from neynar_parquet_importer_spark.graph.writer import write_nodes

    auth = (NEO4J_USER, NEO4J_PASSWORD)
    label = "SparkContractTest"
    with neo4j.GraphDatabase.driver(NEO4J_URI, auth=auth) as driver:
        with driver.session() as session:
            session.run(f"MATCH (n:{label}) DETACH DELETE n")

    from neynar_parquet_importer_spark.graph.writer import write_edges

    nodes = spark.createDataFrame(
        [(1, "alice"), (2, "bob")], "id long, name string"
    )
    write_nodes(nodes, NEO4J_URI, auth, label, key="id")
    write_nodes(nodes, NEO4J_URI, auth, label, key="id")  # MERGE idempotency
    edges = spark.createDataFrame([(1, 2, 7)], "src long, dst long, ts long")
    write_edges(edges, NEO4J_URI, auth, "KNOWS", label, label, "id", "id")
    write_edges(edges, NEO4J_URI, auth, "KNOWS", label, label, "id", "id")

    with neo4j.GraphDatabase.driver(NEO4J_URI, auth=auth) as driver:
        with driver.session() as session:
            n = session.run(f"MATCH (n:{label}) RETURN count(n) AS c").single()["c"]
            names = sorted(
                r["n.name"]
                for r in session.run(f"MATCH (n:{label}) RETURN n.name")
            )
            e = session.run(
                f"MATCH (:{label})-[r:KNOWS]->(:{label}) RETURN count(r) AS c"
            ).single()["c"]
            session.run(f"MATCH (n:{label}) DETACH DELETE n")
    assert n == 2
    assert names == ["alice", "bob"]
    assert e == 1  # MERGE kept the edge single across re-imports
