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


def test_null_text_rows_get_verdicts_and_stay_out_of_state(spark, tmp_path):
    """md5(NULL) is NULL; an inner equi-join on content_hash would silently
    drop NULL-text rows from the verdict. They must instead each come back
    (id, False, id) — exact equality is undefined on absent content — and
    must never enter the content/words state."""
    sinks = _sinks(spark, tmp_path)
    v1 = _fold(
        spark, sinks, [(1, None), (2, "real text"), (3, None)], 1
    )
    assert v1 == {1: (False, 1), 2: (False, 2), 3: (False, 3)}
    # state holds only the hashed doc; no NULL hash row, no NULL words
    content = sinks[0].read()
    assert [r["id"] for r in content.collect()] == [2]
    words = sinks[1].read()
    assert words.filter(F.col("word_idx").isNull()).count() == 0
    # a later NULL-text row is again its own verdict, not a dup of anything
    v2 = _fold(spark, sinks, [(4, None), (5, "real text")], 2)
    assert v2 == {4: (False, 4), 5: (True, 2)}


def test_broadcast_words_false_matches_and_drops_hint(spark, tmp_path):
    """broadcast_words=False must produce identical verdicts through a
    plain (unhinted) join — the 100 TB path where the words table has
    outgrown an executor. The forced-broadcast hint must be absent from
    the analyzed plan of the probe."""
    from neynar_parquet_importer_spark.operators.bloom import bloom_probe

    docs = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(20)], DOC_SCHEMA
    )
    bl = bloom_build(docs, "text", n_bits=256, k=3)
    probe_new = spark.createDataFrame(
        [(100, "text number 3"), (101, "novel content")], DOC_SCHEMA
    )
    hinted = bloom_probe(
        probe_new, "text", bl, n_bits=256, k=3, id_col="doc_id"
    )
    plain = bloom_probe(
        probe_new, "text", bl, n_bits=256, k=3, id_col="doc_id",
        broadcast_words=False,
    )
    want = {(r["doc_id"], r["maybe_in_bloom"]) for r in hinted.collect()}
    got = {(r["doc_id"], r["maybe_in_bloom"]) for r in plain.collect()}
    assert got == want
    assert want and (100, True) in want  # the true member always flags
    assert "ResolvedHint (strategy=broadcast)" not in plain._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint (strategy=broadcast)" in hinted._jdf.queryExecution().analyzed().toString()

    # fold-level: a full fold with broadcast_words=False matches the default
    sinks_a = _sinks(spark, tmp_path / "a")
    sinks_b = _sinks(spark, tmp_path / "b")
    rows1 = [(i, f"state doc {i}") for i in range(10)]
    rows2 = [(20, "state doc 4"), (21, "fresh doc")]
    _fold(spark, sinks_a, rows1, 1)
    _fold(spark, sinks_b, rows1, 1, broadcast_words=False)
    va = _fold(spark, sinks_a, rows2, 2)
    vb = _fold(spark, sinks_b, rows2, 2, broadcast_words=False)
    assert va == vb == {20: (True, 4), 21: (False, 21)}
