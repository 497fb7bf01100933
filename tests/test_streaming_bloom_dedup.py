"""Streaming exact-dedup Bloom fold (streaming/bloom_dedup.py):
cross-batch detection, intra-batch first-wins, false-positive rescue
through the confirmation join, crash-replay idempotency, and OR-merge
equivalence of the words state."""

from __future__ import annotations

from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators.bloom import bloom_build
from neynar_parquet_importer_spark.sinks.lake_upsert import LakeUpsertSink
from neynar_parquet_importer_spark.streaming.bloom_dedup import (
    bloom_dedup_fold_batch,
)

DOC_SCHEMA = "doc_id long, text string"


def _sinks(spark, tmp_path):
    content = LakeUpsertSink(
        spark, str(tmp_path / "content"), ("content_hash",), "updated_at"
    )
    words = LakeUpsertSink(
        spark, str(tmp_path / "words"), ("word_idx",), "updated_at"
    )
    return content, words


def _fold(spark, sinks, rows, epoch, **kw):
    batch = spark.createDataFrame(rows, DOC_SCHEMA)
    out = bloom_dedup_fold_batch(sinks[0], sinks[1], batch, epoch, **kw)
    return {r["id"]: (r["is_dup"], r["dup_of"]) for r in out.collect()}


def test_cross_batch_exact_dup_detected(spark, tmp_path):
    sinks = _sinks(spark, tmp_path)
    v1 = _fold(spark, sinks, [(1, "alpha beaver"), (2, "canyon delta")], 1)
    assert v1 == {1: (False, 1), 2: (False, 2)}
    v2 = _fold(spark, sinks, [(3, "alpha beaver"), (4, "ember falcon")], 2)
    assert v2 == {3: (True, 1), 4: (False, 4)}
    # and the new doc is now state too
    v3 = _fold(spark, sinks, [(5, "ember falcon")], 3)
    assert v3 == {5: (True, 4)}


def test_intra_batch_first_wins(spark, tmp_path):
    sinks = _sinks(spark, tmp_path)
    v = _fold(
        spark, sinks,
        [(7, "same text"), (3, "same text"), (9, "other text")],
        1,
    )
    assert v == {3: (False, 3), 7: (True, 3), 9: (False, 9)}


def test_false_positive_rescued_by_confirmation(spark, tmp_path):
    """A 64-bit filter over 30 accepted docs saturates (~every probe
    collides): distinct new texts flag maybe, but the confirmation join
    rejects them all — accepted, not dropped."""
    sinks = _sinks(spark, tmp_path)
    batch1 = [(i, f"text number {i}") for i in range(30)]
    _fold(spark, sinks, batch1, 1, n_bits=64, k=2)
    v = _fold(
        spark, sinks,
        [(100, "completely new content"), (101, f"text number {3}")],
        2, n_bits=64, k=2,
    )
    assert v == {100: (False, 100), 101: (True, 3)}


def test_crash_replay_is_idempotent(spark, tmp_path):
    sinks = _sinks(spark, tmp_path)
    rows = [(1, "alpha"), (2, "beta"), (3, "alpha")]
    v_first = _fold(spark, sinks, rows, 1)
    # replay the same epoch: accepted docs are already in state; the
    # self-match exclusion must keep them accepted
    v_replay = _fold(spark, sinks, rows, 1)
    assert v_first == v_replay == {1: (False, 1), 2: (False, 2), 3: (True, 1)}


def test_words_state_equals_batch_rebuild(spark, tmp_path):
    """After several folds, the OR-merged words state must equal a
    from-scratch bloom_build over exactly the accepted texts."""
    sinks = _sinks(spark, tmp_path)
    _fold(spark, sinks, [(1, "aa"), (2, "bb")], 1)
    _fold(spark, sinks, [(3, "aa"), (4, "cc")], 2)
    _fold(spark, sinks, [(5, "dd"), (6, "dd")], 3)
    accepted_texts = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (4, "cc"), (5, "dd")], DOC_SCHEMA
    )
    want = {
        (r["word_idx"], r["word"])
        for r in bloom_build(accepted_texts, "text").collect()
    }
    got = {
        (r["word_idx"], r["word"])
        for r in sinks[1].read().select("word_idx", "word").collect()
    }
    assert got == want
