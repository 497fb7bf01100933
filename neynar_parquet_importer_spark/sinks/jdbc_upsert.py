"""Postgres upsert sink (reference S9) for JDBC/psycopg targets.

Spark's built-in JDBC writer only appends/overwrites, so the MERGE runs
as per-partition statements from ``foreachPartition`` (streaming: from
``foreachBatch``). Differences from the reference, on purpose:

- rows are chunked under Postgres's 65,535 bind-parameter limit — the
  hazard the reference acknowledges but leaves unhandled (db.py:796-797);
- the batch is deduped per PK (max version wins) BEFORE the statement,
  because `INSERT ... ON CONFLICT` raises "row updated twice" if one
  statement touches a PK twice — the reference only avoids this by
  accident of single-threaded row groups (SURVEY §7.3);
- retry with exponential backoff + jitter matches the reference's C1
  envelope (db.py:59-67: 5 attempts, 0.4s -> 10s).

The psycopg import is lazy/gated: this container has no Postgres, so the
SQL builders and chunkers are pure functions (unit-tested), and the
writer raises a clear error if the driver is missing.
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable, Iterable, Iterator, Sequence
from itertools import islice

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import last_writer_wins

POSTGRES_MAX_BIND_PARAMS = 65_535


def build_upsert_sql(
    table: str,
    columns: Sequence[str],
    primary_key: Sequence[str],
    version_column: str = "updated_at",
    n_rows: int = 1,
) -> str:
    """`INSERT ... ON CONFLICT (pk) DO UPDATE SET ... WHERE excluded.v >=
    t.v` — the recency-guarded last-writer-wins statement (db.py:884-893
    semantics, rebuilt; no code shared with the reference)."""
    cols = ", ".join(columns)
    row = "(" + ", ".join(["%s"] * len(columns)) + ")"
    values = ", ".join([row] * n_rows)
    updates = ", ".join(f"{c} = excluded.{c}" for c in columns if c not in primary_key)
    pk = ", ".join(primary_key)
    return (
        f"INSERT INTO {table} ({cols}) VALUES {values} "
        f"ON CONFLICT ({pk}) DO UPDATE SET {updates} "
        f"WHERE excluded.{version_column} >= {table}.{version_column}"
    )


def chunk_rows_for_param_limit(
    rows: Sequence[Sequence],
    n_columns: int,
    max_params: int = POSTGRES_MAX_BIND_PARAMS,
) -> Iterable[Sequence[Sequence]]:
    """Yield row chunks with len(chunk) * n_columns <= max_params."""
    if n_columns <= 0:
        raise ValueError("n_columns must be positive")
    per_chunk = max(1, max_params // n_columns)
    for i in range(0, len(rows), per_chunk):
        yield rows[i : i + per_chunk]


def iter_chunks_for_param_limit(
    rows_iter: Iterable[Sequence],
    n_columns: int,
    max_params: int = POSTGRES_MAX_BIND_PARAMS,
) -> Iterator[list[tuple]]:
    """Streaming form of :func:`chunk_rows_for_param_limit`: consume the
    row iterator lazily, yielding one materialized chunk at a time with
    len(chunk) * n_columns <= max_params. Executor Python memory is
    bounded by the CHUNK size, never the partition size — after the
    connection-budget coalesce, a 100 TB batch makes each partition
    enormous, so materializing it up front (the reference's own hazard,
    db.py:796-797, and this writer's pre-round-4 behavior) is a
    scale-killer."""
    if n_columns <= 0:
        raise ValueError("n_columns must be positive")
    per_chunk = max(1, max_params // n_columns)
    it = iter(rows_iter)
    while True:
        chunk = [tuple(r) for r in islice(it, per_chunk)]
        if not chunk:
            return
        yield chunk


def retry_with_backoff(
    fn: Callable[[], None],
    attempts: int = 5,
    base_sleep: float = 0.4,
    max_sleep: float = 10.0,
) -> None:
    for attempt in range(attempts):
        try:
            fn()
            return
        except Exception:
            if attempt == attempts - 1:
                raise
            sleep = min(max_sleep, base_sleep * (2**attempt))
            time.sleep(sleep * (0.5 + random.random() / 2))


def prepare_upsert_frame(
    df: DataFrame,
    primary_key: Sequence[str],
    version_column: str = "updated_at",
    max_connections: int = 90,
) -> DataFrame:
    """PK-dedupe (max version wins) + connection-budget partition cap.
    coalesce (not repartition) so the cap costs no shuffle."""
    deduped = last_writer_wins(df, list(primary_key), [F.desc(version_column)])
    if max_connections > 0:
        deduped = deduped.coalesce(max_connections)
    return deduped


def _psycopg_connect(dsn: str):
    try:
        import psycopg  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - no PG in container
        raise RuntimeError(
            "psycopg not installed; jdbc_upsert_writer needs a Postgres "
            "driver at the executors"
        ) from exc
    return psycopg.connect(dsn)


def write_partition_rows(
    rows_iter: Iterable[Sequence],
    connect: Callable,
    dsn: str,
    table: str,
    columns: Sequence[str],
    primary_key: Sequence[str],
    version_column: str = "updated_at",
    max_params: int = POSTGRES_MAX_BIND_PARAMS,
    retry: Callable[[Callable[[], None]], None] = retry_with_backoff,
) -> None:
    """One partition's upsert loop (the body ``jdbc_upsert_writer`` runs
    inside foreachPartition; module-level so tests drive it directly).

    - STREAMS the partition: rows are pulled lazily one param-limit chunk
      at a time (:func:`iter_chunks_for_param_limit`), so executor Python
      memory is bounded by chunk size, not partition size;
    - connects lazily (an empty partition opens no connection);
    - each chunk commits independently under the retry wrapper, and a
      failed attempt DROPS the connection so the next attempt reconnects
      — a mid-batch connection loss resumes from the failed chunk (prior
      chunks are committed; re-execution of the failed chunk is
      idempotent because the statement is a recency-guarded upsert).
    """
    chunks = iter_chunks_for_param_limit(rows_iter, len(columns), max_params)
    state: dict = {"cm": None, "conn": None}

    def ensure_conn():
        if state["cm"] is None:
            cm = connect(dsn)
            state["cm"] = cm
            state["conn"] = cm.__enter__()
        return state["conn"]

    def drop_conn(failed: bool = False) -> None:
        cm, conn = state["cm"], state["conn"]
        state["cm"] = state["conn"] = None
        if cm is None:
            return
        try:
            if failed and hasattr(conn, "close"):
                # psycopg close() == rollback the aborted transaction;
                # per-chunk work was committed explicitly already
                conn.close()
            else:
                cm.__exit__(None, None, None)
        except Exception:
            pass  # a dead socket may refuse even the close

    try:
        for chunk in chunks:
            sql = build_upsert_sql(
                table, columns, primary_key, version_column, n_rows=len(chunk)
            )
            params = [v for row in chunk for v in row]

            def run() -> None:
                conn = ensure_conn()
                try:
                    with conn.cursor() as cur:
                        cur.execute(sql, params)
                    conn.commit()
                except Exception:
                    drop_conn(failed=True)
                    raise

            retry(run)
    finally:
        drop_conn()


def jdbc_upsert_writer(
    df: DataFrame,
    dsn: str,
    table: str,
    primary_key: Sequence[str],
    version_column: str = "updated_at",
    max_connections: int = 90,
    connect_fn: Callable | None = None,
) -> None:
    """Distributed upsert: dedupe per PK, then per-partition chunked
    INSERT..ON CONFLICT with retry. One DB connection per partition; C2's
    connection budget (reference settings.py:64-66 pool_size=90) is
    ENFORCED by capping the write-side partition count — a 100 TB batch
    with thousands of scan partitions coalesces (no shuffle) down to the
    pool budget instead of opening a connection per input split. Each
    partition streams through :func:`write_partition_rows`, so the
    coalesced (hence huge) partitions never materialize in executor
    Python memory.

    ``connect_fn(dsn)`` injects the connection factory (default: psycopg).
    It must be picklable (it ships to executors) and return a DBAPI-ish
    context-managed connection with cursor()/commit() — which is also the
    seam the executed-SQL contract tests use to drive this exact partition
    path against an in-process engine when no live Postgres exists."""
    deduped = prepare_upsert_frame(df, primary_key, version_column, max_connections)
    columns = deduped.columns
    connect = _psycopg_connect if connect_fn is None else connect_fn

    def write_partition(rows_iter) -> None:
        write_partition_rows(
            rows_iter, connect, dsn, table, columns, primary_key, version_column
        )

    deduped.foreachPartition(write_partition)
