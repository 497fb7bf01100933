"""All six streaming sketch folds driven through a REAL
readStream.foreachBatch StreamingQuery (r6 verdict task #3).

The unit suites (test_streaming_{hll,cms,hist,bloom_dedup,near_dup}.py,
test_sessionize_fold.py) call the folds directly with hand-assigned
epochs; this module exercises the semantics only a live StreamingQuery
produces:

- epochs assigned by the engine (file source, maxFilesPerTrigger=1,
  AvailableNow trigger — the test_streaming.py:68 shape);
- a SAME-EPOCH REPLAY mid-stream: foreachBatch raises AFTER the fold
  mutated the sinks for one batch (post-fold, pre-commit — the
  worst-case crash), so on restart the engine re-delivers the same
  batch id with the same file set and the fold's replay guard must
  converge instead of double-applying;
- a killed-and-restarted query resuming from checkpoint: a third file
  arrives after the first query terminated, and the restarted query
  processes only it;
- the fold's RETURNED frame consumed inside foreachBatch (the folds pin
  their results pre-upsert precisely so this is safe — a regression
  there surfaces here as FILE_NOT_EXIST).

Done-condition: each fold's state after the real 3-batch stream (with
one replayed epoch) equals the hand-folded no-crash reference.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neynar_parquet_importer_spark.operators.dedup import release_cached
from neynar_parquet_importer_spark.sinks.lake_upsert import LakeUpsertSink

CRASH_MARK = "injected post-fold crash"


def _write_file(src: str, name: str, table: pa.Table, order: int) -> None:
    """One parquet FILE per micro-batch, mtimes spaced so the file
    source's oldest-first ordering is deterministic."""
    path = os.path.join(src, name)
    pq.write_table(table, path)
    t = time.time() - 1000 + order * 10
    os.utime(path, (t, t))


def _drive(
    spark,
    src: str,
    ckpt: str,
    schema: T.StructType,
    fold_fn,
    crash_state: dict | None = None,
) -> None:
    """AvailableNow stream over ``src``, one file per micro-batch,
    ``fold_fn(batch_df, batch_id)`` in foreachBatch. If ``crash_state``
    is given, raise ONCE after the fold of batch id
    ``crash_state['epoch']`` (post-fold: sinks already mutated)."""

    def sink_batch(batch_df, batch_id):
        fold_fn(batch_df, batch_id)
        if (
            crash_state is not None
            and batch_id == crash_state["epoch"]
            and not crash_state.get("done")
        ):
            crash_state["done"] = True
            raise RuntimeError(CRASH_MARK)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    except Exception as e:  # the injected failure surfaces here
        assert CRASH_MARK in str(e)
    finally:
        if q.isActive:
            q.stop()
    if crash_state is not None and crash_state.get("done") and q.exception():
        assert CRASH_MARK in str(q.exception())


def _run_replay_scenario(spark, tmp_path, schema, tables, fold_fn):
    """The shared scenario: files 0+1 -> crash after folding batch 1 ->
    restart (engine replays batch 1) -> file 2 arrives -> restart."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    _write_file(src, "b0.parquet", tables[0], 0)
    _write_file(src, "b1.parquet", tables[1], 1)
    crash = {"epoch": 1}
    _drive(spark, src, ckpt, schema, fold_fn, crash_state=crash)
    assert crash["done"], "the injected crash never fired"
    # restart: batch 1 was folded but never committed -> engine replays
    # the same epoch with the same file
    _drive(spark, src, ckpt, schema, fold_fn)
    # late third file, fresh restart from the same checkpoint
    _write_file(src, "b2.parquet", tables[2], 2)
    _drive(spark, src, ckpt, schema, fold_fn)


# --------------------------------------------------------------------------
# per-fold scenarios
# --------------------------------------------------------------------------

def test_hll_fold_through_readstream(spark, tmp_path):
    from neynar_parquet_importer_spark.streaming.hll_count import (
        hll_fold_batch,
    )

    schema = T.StructType([
        T.StructField("g", T.StringType()),
        T.StructField("k", T.LongType()),
    ])
    batches = [
        [("a", i) for i in range(50)] + [("b", i) for i in range(10)],
        [("a", i) for i in range(25, 80)],
        [("b", i) for i in range(5, 40)] + [("a", 0)],
    ]
    tables = [
        pa.table({"g": [g for g, _ in b], "k": [k for _, k in b]})
        for b in batches
    ]
    sink = LakeUpsertSink(
        spark, str(tmp_path / "state"), ("g", "bucket"), n_buckets=4
    )
    returned: list = []

    def fold(batch_df, batch_id):
        returned.append(
            hll_fold_batch(sink, batch_df, batch_id, "k", ["g"], p=8)
            .collect()
        )

    _run_replay_scenario(spark, tmp_path, schema, tables, fold)
    assert len(returned) == 4  # 3 batches + 1 replay, all consumed

    ref = LakeUpsertSink(
        spark, str(tmp_path / "ref"), ("g", "bucket"), n_buckets=4
    )
    for epoch, b in enumerate(batches):
        hll_fold_batch(
            ref, spark.createDataFrame(b, schema), epoch, "k", ["g"], p=8
        )
    got = sorted(
        (r.g, r.bucket, r.register)
        for r in sink.read().select("g", "bucket", "register").collect()
    )
    want = sorted(
        (r.g, r.bucket, r.register)
        for r in ref.read().select("g", "bucket", "register").collect()
    )
    assert got == want


def test_cms_fold_through_readstream(spark, tmp_path):
    from neynar_parquet_importer_spark.streaming.cms_count import (
        cms_fold_batch,
    )

    schema = T.StructType([T.StructField("k", T.LongType())])
    batches = [
        [7] * 30 + list(range(20)),
        [7] * 5 + list(range(10, 40)),
        [9] * 12 + [7] * 2,
    ]
    tables = [pa.table({"k": b}) for b in batches]
    sink = LakeUpsertSink(
        spark, str(tmp_path / "state"), ("row", "col"), n_buckets=4
    )

    def fold(batch_df, batch_id):
        cms_fold_batch(
            sink, batch_df, batch_id, "k", width=64, depth=3
        ).collect()

    _run_replay_scenario(spark, tmp_path, schema, tables, fold)

    ref = LakeUpsertSink(
        spark, str(tmp_path / "ref"), ("row", "col"), n_buckets=4
    )
    for epoch, b in enumerate(batches):
        cms_fold_batch(
            ref,
            spark.createDataFrame([(k,) for k in b], schema),
            epoch, "k", width=64, depth=3,
        )
    got = sorted(
        (r.row, r.col, r.cnt)
        for r in sink.read().select("row", "col", "cnt").collect()
    )
    want = sorted(
        (r.row, r.col, r.cnt)
        for r in ref.read().select("row", "col", "cnt").collect()
    )
    # an additive sketch is where a replay guard failure shows up as
    # double-counted cells — exact equality is the whole point
    assert got == want


def test_hist_fold_through_readstream(spark, tmp_path):
    from neynar_parquet_importer_spark.streaming.hist_fold import (
        hist_fold_batch,
    )

    schema = T.StructType([
        T.StructField("g", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ])
    batches = [
        [("a", 1.0), ("a", 15.0), ("b", 5.0)],
        [("a", 15.5), ("b", 99.0), ("b", 5.5)],
        [("a", 42.0), ("a", 1.5)],
    ]
    tables = [
        pa.table({"g": [g for g, _ in b], "v": [v for _, v in b]})
        for b in batches
    ]
    sink = LakeUpsertSink(
        spark, str(tmp_path / "state"), ("g", "bin"), n_buckets=4
    )

    def fold(batch_df, batch_id):
        hist_fold_batch(
            sink, batch_df, batch_id, "g", "v", lo=0.0, width=10.0,
            n_bins=10,
        ).collect()

    _run_replay_scenario(spark, tmp_path, schema, tables, fold)

    ref = LakeUpsertSink(
        spark, str(tmp_path / "ref"), ("g", "bin"), n_buckets=4
    )
    for epoch, b in enumerate(batches):
        hist_fold_batch(
            ref, spark.createDataFrame(b, schema), epoch, "g", "v",
            lo=0.0, width=10.0, n_bins=10,
        )
    got = sorted(
        (r.g, r.bin, r.cnt)
        for r in sink.read().select("g", "bin", "cnt").collect()
    )
    want = sorted(
        (r.g, r.bin, r.cnt)
        for r in ref.read().select("g", "bin", "cnt").collect()
    )
    assert got == want


def test_sessionize_fold_through_readstream(spark, tmp_path):
    from neynar_parquet_importer_spark.streaming.sessionize_fold import (
        sessionize_fold_batch,
    )

    gap = 100
    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("es", T.LongType()),
    ])
    batches = [
        [(1, 0), (1, 50), (2, 0)],
        [(1, 120), (2, 500), (3, 600)],          # closes u1/u2 sessions
        [(1, 1000), (3, 650), (3, 5000)],
    ]
    tables = [
        pa.table({
            "user_id": [u for u, _ in b], "es": [e for _, e in b],
        })
        for b in batches
    ]
    open_sink = LakeUpsertSink(
        spark, str(tmp_path / "open"), ("user_id",), n_buckets=4
    )
    closed_sink = LakeUpsertSink(
        spark, str(tmp_path / "closed"), ("user_id", "session_start"),
        n_buckets=4,
    )

    def fold(batch_df, batch_id):
        sessionize_fold_batch(
            open_sink, closed_sink, batch_df, batch_id, gap_s=gap
        ).collect()

    _run_replay_scenario(spark, tmp_path, schema, tables, fold)

    ref_open = LakeUpsertSink(
        spark, str(tmp_path / "ro"), ("user_id",), n_buckets=4
    )
    ref_closed = LakeUpsertSink(
        spark, str(tmp_path / "rc"), ("user_id", "session_start"),
        n_buckets=4,
    )
    for epoch, b in enumerate(batches):
        sessionize_fold_batch(
            ref_open, ref_closed, spark.createDataFrame(b, schema),
            epoch, gap_s=gap,
        )
    for got_sink, want_sink, cols in [
        (open_sink, ref_open, ["user_id", "session_start", "last_es", "n_events"]),
        (closed_sink, ref_closed, ["user_id", "session_start", "session_end", "n_events"]),
    ]:
        got = sorted(map(tuple, got_sink.read().select(*cols).collect()))
        want = sorted(map(tuple, want_sink.read().select(*cols).collect()))
        assert got == want, cols


def test_bloom_dedup_fold_through_readstream(spark, tmp_path):
    from neynar_parquet_importer_spark.streaming.bloom_dedup import (
        bloom_dedup_fold_batch,
    )

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    batches = [
        [(1, "alpha beaver"), (2, "canyon delta")],
        [(3, "alpha beaver"), (4, "ember falcon")],   # 3 dups 1
        [(5, "canyon delta"), (6, "garnet harbor")],  # 5 dups 2
    ]
    tables = [
        pa.table({
            "doc_id": [i for i, _ in b], "text": [t for _, t in b],
        })
        for b in batches
    ]
    content = LakeUpsertSink(
        spark, str(tmp_path / "content"), ("content_hash",), "updated_at"
    )
    words = LakeUpsertSink(
        spark, str(tmp_path / "words"), ("word_idx",), "updated_at"
    )
    verdicts: dict = {}

    def fold(batch_df, batch_id):
        out = bloom_dedup_fold_batch(content, words, batch_df, batch_id)
        for r in out.collect():  # consumed in-batch
            verdicts[r["id"]] = (r["is_dup"], r["dup_of"])

    _run_replay_scenario(spark, tmp_path, schema, tables, fold)
    assert verdicts[3] == (True, 1)
    assert verdicts[5] == (True, 2)
    assert verdicts[4][0] is False and verdicts[6][0] is False

    ref_content = LakeUpsertSink(
        spark, str(tmp_path / "rco"), ("content_hash",), "updated_at"
    )
    ref_words = LakeUpsertSink(
        spark, str(tmp_path / "rw"), ("word_idx",), "updated_at"
    )
    for epoch, b in enumerate(batches):
        bloom_dedup_fold_batch(
            ref_content, ref_words, spark.createDataFrame(b, schema), epoch
        )
    got = sorted(
        map(tuple, content.read().select("content_hash", "id").collect())
    )
    want = sorted(
        map(
            tuple,
            ref_content.read().select("content_hash", "id").collect(),
        )
    )
    assert got == want
    gw = sorted(map(tuple, words.read().select("word_idx", "word").collect()))
    ww = sorted(
        map(tuple, ref_words.read().select("word_idx", "word").collect())
    )
    assert gw == ww


def test_near_dup_fold_through_readstream(spark, tmp_path):
    from neynar_parquet_importer_spark.streaming.near_dup import (
        near_dup_fold_batch,
    )

    g = {
        "a": "alpha beaver canyon delta ember falcon garnet harbor indigo jasper katydid lumen",
        "b": "meadow nectar onyx prairie quartz russet sierra tundra umber velvet willow xenon",
        "c": "anchor bastion cipher dynamo enclave fresco glacier hollow isthmus junction keystone lagoon",
    }
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    batches = [
        [(1, g["a"]), (2, g["b"])],
        [(3, g["a"] + " zephyr"), (4, g["c"])],   # 3 near-dups 1
        [(5, g["b"]), (6, g["c"] + " zenith")],   # 5 dups 2, 6 near 4
    ]
    tables = [
        pa.table({
            "doc_id": [i for i, _ in b], "text": [t for _, t in b],
        })
        for b in batches
    ]
    sig = LakeUpsertSink(spark, str(tmp_path / "sigs"), ("id",), "updated_at")
    buckets = LakeUpsertSink(
        spark, str(tmp_path / "buckets"), ("band", "bucket", "id"),
        "updated_at",
    )
    verdicts: dict = {}

    def fold(batch_df, batch_id):
        out = near_dup_fold_batch(sig, buckets, batch_df, batch_id)
        for r in out.collect():
            verdicts[r["id"]] = (r["is_dup"], r["dup_of"])
        release_cached()

    _run_replay_scenario(spark, tmp_path, schema, tables, fold)
    assert verdicts[3] == (True, 1)
    assert verdicts[5] == (True, 2)
    assert verdicts[6] == (True, 4)

    ref_sig = LakeUpsertSink(
        spark, str(tmp_path / "rs"), ("id",), "updated_at"
    )
    ref_buckets = LakeUpsertSink(
        spark, str(tmp_path / "rb"), ("band", "bucket", "id"), "updated_at"
    )
    for epoch, b in enumerate(batches):
        near_dup_fold_batch(
            ref_sig, ref_buckets, spark.createDataFrame(b, schema), epoch
        )
        release_cached()
    got = sorted(map(tuple, sig.read().select("id", "signature").collect()))
    want = sorted(map(tuple, ref_sig.read().select("id", "signature").collect()))
    assert got == want
    gb = sorted(
        map(tuple, buckets.read().select("band", "bucket", "id").collect())
    )
    wb = sorted(
        map(
            tuple,
            ref_buckets.read().select("band", "bucket", "id").collect(),
        )
    )
    assert gb == wb


def test_kmv_fold_through_readstream(spark, tmp_path):
    from neynar_parquet_importer_spark.streaming.kmv_distinct import (
        kmv_fold_batch,
    )

    schema = T.StructType([
        T.StructField("g", T.StringType()),
        T.StructField("k", T.LongType()),
    ])
    batches = [
        [("a", i) for i in range(50)] + [("b", i) for i in range(10)],
        [("a", i) for i in range(25, 80)],
        [("b", i) for i in range(5, 40)] + [("a", 0)],
    ]
    tables = [
        pa.table({"g": [g for g, _ in b], "k": [k for _, k in b]})
        for b in batches
    ]
    sink = LakeUpsertSink(
        spark, str(tmp_path / "state"), ("g", "rn"), n_buckets=4
    )
    returned: list = []

    def fold(batch_df, batch_id):
        returned.append(
            kmv_fold_batch(sink, batch_df, batch_id, "k", ["g"], k=32)
            .collect()
        )

    _run_replay_scenario(spark, tmp_path, schema, tables, fold)
    assert len(returned) == 4  # 3 batches + 1 replay, all consumed

    ref = LakeUpsertSink(
        spark, str(tmp_path / "ref"), ("g", "rn"), n_buckets=4
    )
    for epoch, b in enumerate(batches):
        kmv_fold_batch(
            ref, spark.createDataFrame(b, schema), epoch, "k", ["g"], k=32
        )
    got = sorted(
        (r.g, r.rn, r.hv)
        for r in sink.read().select("g", "rn", "hv").collect()
    )
    want = sorted(
        (r.g, r.rn, r.hv)
        for r in ref.read().select("g", "rn", "hv").collect()
    )
    assert got == want
