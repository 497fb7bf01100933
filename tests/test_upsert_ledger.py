"""Upsert sink + ledger semantics: last-writer-wins with recency guard,
idempotent re-import, 65535-param chunking, in-order completion."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.sinks import (
    ImportLedger,
    LakeUpsertSink,
    build_upsert_sql,
    chunk_rows_for_param_limit,
)
from neynar_parquet_importer_spark.sinks.ledger import LedgerEntry


def _ts(day: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, day)


@pytest.fixture()
def sink(spark, tmp_path):
    return LakeUpsertSink(spark, str(tmp_path / "tbl"), ("id",), "updated_at")


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string, updated_at timestamp")


def _state(sink):
    return {r.id: (r.v, r.updated_at) for r in sink.read().collect()}


def test_upsert_insert_then_update(spark, sink):
    sink.upsert(_df(spark, [(1, "a", _ts(1)), (2, "b", _ts(1))]), epoch=1)
    assert _state(sink) == {1: ("a", _ts(1)), 2: ("b", _ts(1))}

    # newer row wins, older row is ignored (recency guard)
    sink.upsert(_df(spark, [(1, "a2", _ts(2)), (2, "stale", _ts(0) if False else _ts(1))]), epoch=2)
    st = _state(sink)
    assert st[1] == ("a2", _ts(2))


def test_upsert_recency_guard_blocks_old(spark, sink):
    sink.upsert(_df(spark, [(1, "new", _ts(5))]), epoch=1)
    sink.upsert(_df(spark, [(1, "old", _ts(2))]), epoch=2)
    assert _state(sink)[1] == ("new", _ts(5))


def test_upsert_equal_version_incoming_wins(spark, sink):
    # the `excluded.updated_at >= existing.updated_at` tie rule (db.py:887-893)
    sink.upsert(_df(spark, [(1, "first", _ts(3))]), epoch=1)
    sink.upsert(_df(spark, [(1, "second", _ts(3))]), epoch=2)
    assert _state(sink)[1] == ("second", _ts(3))


def test_upsert_intra_batch_dedup(spark, sink):
    # one batch containing the same PK twice must not fail and newest wins
    sink.upsert(_df(spark, [(1, "x", _ts(1)), (1, "y", _ts(2))]), epoch=1)
    assert _state(sink)[1] == ("y", _ts(2))


def test_upsert_idempotent_reimport(spark, sink):
    batch = _df(spark, [(1, "a", _ts(1)), (2, "b", _ts(2))])
    sink.upsert(batch, epoch=1)
    first = _state(sink)
    sink.upsert(batch, epoch=2)  # re-import same file => same state
    assert _state(sink) == first


def test_build_upsert_sql():
    sql = build_upsert_sql("t", ["id", "v", "updated_at"], ["id"], "updated_at", n_rows=2)
    assert "INSERT INTO t (id, v, updated_at) VALUES (%s, %s, %s), (%s, %s, %s)" in sql
    assert "ON CONFLICT (id) DO UPDATE SET v = excluded.v" in sql
    assert "WHERE excluded.updated_at >= t.updated_at" in sql


def test_chunk_rows_for_param_limit():
    rows = [(i, i) for i in range(100)]
    chunks = list(chunk_rows_for_param_limit(rows, n_columns=30000))
    # 65535 // 30000 = 2 rows per chunk
    assert all(len(c) <= 2 for c in chunks)
    assert sum(len(c) for c in chunks) == 100


def test_ledger_roundtrip(tmp_path):
    path = str(tmp_path / "ledger.jsonl")
    led = ImportLedger(path)

    def entry(name, start, end, ftype="incremental"):
        return LedgerEntry(
            file_name=name, file_type=ftype, file_version="v3",
            file_duration_s=end - start, start_timestamp=start, end_timestamp=end,
        )

    led.record_file(entry("s-t-0-100.parquet", 0, 100, "full"))
    led.record_file(entry("s-t-100-101.parquet", 100, 101))
    led.record_file(entry("s-t-101-102.parquet", 101, 102))

    assert led.resume_point() == 100  # newest full, nothing completed yet
    led.mark_completed("s-t-100-101.parquet")
    assert led.resume_point() == 101  # newest completed incremental wins

    # persistence across reopen
    led2 = ImportLedger(path)
    assert led2.is_completed("s-t-100-101.parquet")
    assert not led2.is_completed("s-t-101-102.parquet")


def test_ledger_record_is_idempotent(tmp_path):
    led = ImportLedger(str(tmp_path / "l.jsonl"))
    e1 = LedgerEntry("f", "incremental", "v3", 1, 0, 1, completed=True)
    led.record_file(e1)
    e2 = led.record_file(LedgerEntry("f", "incremental", "v3", 1, 0, 1))
    assert e2.completed  # existing row wins (ON CONFLICT no-op)


def test_ledger_in_order_commit(tmp_path):
    led = ImportLedger(str(tmp_path / "l.jsonl"))
    names = [f"s-t-{i}-{i+1}.parquet" for i in range(4)]
    for i, n in enumerate(names):
        led.record_file(LedgerEntry(n, "incremental", "v3", 1, i, i + 1))
    # window 1 not done -> only window 0 commits (W7 contiguous-prefix rule)
    done = {names[0], names[2], names[3]}
    committed = led.advance_completed_through(names, done)
    assert committed == [names[0]]
    # once the gap fills, the rest commit in order
    committed = led.advance_completed_through(names, done | {names[1]})
    assert committed == names[1:]


def test_ledger_staleness(tmp_path):
    led = ImportLedger(str(tmp_path / "l.jsonl"))
    assert led.is_stale(now=1_000_000)  # empty ledger => snapshot needed
    led.record_file(LedgerEntry("s-t-0-100.parquet", "full", "v3", 100, 0, 100))
    assert led.is_stale(now=100 + 22 * 24 * 3600)
    assert not led.is_stale(now=100 + 20 * 24 * 3600)
