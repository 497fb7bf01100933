"""Streaming (cross-batch) EXACT dedup with a Bloom-filter state probe.

The near-dup fold (``streaming/near_dup.py``) pays a signature aggregate
plus LSH index joins per batch because "duplicate" there is fuzzy.  When
the contract is exact content equality — the common first gate of an
ingest pipeline — the state probe can be radically cheaper: the accepted
history is summarized in a Bloom words table (``operators/bloom.py``),
and each batch pays

1. intra-batch exact dedup (first-wins by min id per content hash);
2. k broadcast-join probes per survivor against the words table — NO
   join against history for rows the filter rules out (the overwhelming
   majority at steady state);
3. an exact confirmation equi-join against the keyed content sink for
   just the ``maybe`` slice (true dups + the ~FPR sliver of false
   positives, which are rescued and accepted).

State lives in two sinks (LakeUpsertSink-shaped, W10 sink-as-state):
``content_sink`` — one row per accepted doc ``(content_hash, id)``, the
confirmation target; and ``words_sink`` — the Bloom words keyed by
``word_idx``.  Words are merged by OR (``new = state | batch``), which
is idempotent, so crash replay converges: re-folding a batch whose
survivors are already in state re-ORs the same bits (no-op) and the
confirmation join's self-match exclusion (state id == batch id) keeps
the original accepted verdicts — same discipline as the near-dup fold.

At 100 TB: the words table for a 10 B-doc history at 1 % FPR is ~12 GB
= ~375 M rows — past broadcast range, so ``bloom_probe``'s equi-join on
``word_idx`` runs as a plain shuffled join (or against a bucketed words
table, shuffle-free); nothing in the fold assumes the filter fits in
one executor.  The confirmation sink is keyed (bucketed) by content
hash, so the maybe-slice join prunes to matching buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.bloom import bloom_build, bloom_probe

CONTENT_SCHEMA = "content_hash string, id long, updated_at long"
WORDS_SCHEMA = "word_idx long, word long, updated_at long"


def bloom_dedup_fold_batch(
    content_sink,
    words_sink,
    batch: DataFrame,
    epoch: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 1 << 15,
    k: int = 4,
    broadcast_words: bool = True,
) -> DataFrame:
    """Fold one micro-batch through the exact-dedup Bloom filter.

    Returns ``(id, is_dup, dup_of)`` for EVERY batch row: ``dup_of`` is
    the accepted state doc with identical content (state first-wins),
    the batch's min-id holder of the content for intra-batch dups, or
    the doc itself for accepted rows.  Rows with NULL text have no
    content to compare — exact equality is undefined on them — so each
    is its own verdict row ``(id, false, id)`` and none enters the
    content/words state (md5(NULL) is NULL; an equi-join would silently
    drop them from the verdict instead, which is the bug this split
    prevents).  The verdict frame is materialized executor-side (eager
    ``localCheckpoint``) BEFORE the sinks mutate, exactly like the
    near-dup fold — the result must describe the state transition that
    happened, and must not be recomputed against post-upsert state.
    ``broadcast_words`` is forwarded to :func:`bloom_probe` — pass
    ``False`` once the words table outgrows broadcast range.
    """
    # persist the hashed batch: it is re-read by the verdict checkpoint,
    # the content-sink upsert's actions, and the words-sink bloom build
    # (~5 actions per fold) — without the pin each one re-scans the
    # caller's batch and recomputes the md5 (the near-dup fold pins its
    # signature frame for the same reason). Released in the finally:
    # every consumer runs inside this fold and the returned verdict is
    # an eager localCheckpoint, so nothing escapes that depends on it —
    # a long-running stream must not leak one cache per micro-batch
    # (including batches that FAIL mid-fold).
    all_hashed = batch.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__text"),
        F.md5(F.col(text_col).cast("string")).alias("content_hash"),
    ).persist()
    try:
        return _fold_inner(
            content_sink, words_sink, all_hashed, epoch,
            n_bits, k, broadcast_words,
        )
    finally:
        all_hashed.unpersist()


def _fold_inner(
    content_sink,
    words_sink,
    all_hashed: DataFrame,
    epoch: int,
    n_bits: int,
    k: int,
    broadcast_words: bool,
) -> DataFrame:
    null_text = all_hashed.filter(F.col("content_hash").isNull())
    hashed = all_hashed.filter(F.col("content_hash").isNotNull())

    # --- intra-batch exact dedup: first(min-id)-wins per content -------
    rep = hashed.groupBy("content_hash").agg(F.min("id").alias("rep"))
    labeled = hashed.join(rep, "content_hash")

    # --- representatives probe the Bloom words, then confirm -----------
    reps = labeled.filter(F.col("id") == F.col("rep")).select(
        "id", "__text", "content_hash"
    )
    state_words = words_sink.read()
    state_content = content_sink.read()
    if state_words is not None and state_content is not None:
        probed = bloom_probe(
            reps, "__text", state_words.select("word_idx", "word"),
            n_bits=n_bits, k=k, id_col="id",
            broadcast_words=broadcast_words,
        )
        confirmed = (
            probed.filter(F.col("maybe_in_bloom"))
            .join(
                state_content.select(
                    "content_hash", F.col("id").alias("state_id")
                ),
                "content_hash",
            )
            # self-match exclusion: a doc accepted by a crashed run is in
            # state; without this it would flip to dup on replay
            .filter(F.col("id") != F.col("state_id"))
            .groupBy("id")
            .agg(F.min("state_id").alias("dup_of_state"))
        )
        resolved = labeled.join(
            confirmed.withColumnsRenamed({"id": "rep"}), "rep", "left"
        )
    else:
        resolved = labeled.withColumn(
            "dup_of_state", F.lit(None).cast("long")
        )

    verdict = (
        resolved.select(
            "id",
            (
                F.col("dup_of_state").isNotNull()
                | (F.col("id") != F.col("rep"))
            ).alias("is_dup"),
            F.coalesce("dup_of_state", "rep").alias("dup_of"),
        )
        .unionByName(
            null_text.select(
                "id",
                F.lit(False).alias("is_dup"),
                F.col("id").alias("dup_of"),
            )
        )
        .localCheckpoint(eager=True)
    )

    # --- accept survivors into the state -------------------------------
    accepted_ids = verdict.filter(~F.col("is_dup")).select("id")
    if accepted_ids.limit(1).count() > 0:
        acc = hashed.join(accepted_ids, "id", "left_semi")
        content_sink.upsert(
            acc.select("content_hash", "id").withColumn(
                "updated_at", F.lit(epoch).cast("long")
            ),
            epoch,
        )
        batch_words = bloom_build(acc, "__text", n_bits=n_bits, k=k)
        if state_words is not None:
            batch_words = (
                batch_words.join(
                    state_words.select(
                        "word_idx", F.col("word").alias("__state_word")
                    ),
                    "word_idx",
                    "left",
                )
                .select(
                    "word_idx",
                    F.col("word")
                    .bitwiseOR(F.coalesce("__state_word", F.lit(0)))
                    .alias("word"),
                )
            )
        words_sink.upsert(
            batch_words.withColumn(
                "updated_at", F.lit(epoch).cast("long")
            ),
            epoch,
        )
    return verdict
