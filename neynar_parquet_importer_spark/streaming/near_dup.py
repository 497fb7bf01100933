"""Streaming (cross-batch) near-duplicate dedup: MinHash/LSH against a
persisted signature store, folded one micro-batch at a time.

The batch dedup family (operators/dedup.py) answers "which documents in
THIS corpus are near-dups of each other". A streaming ingest needs the
first-wins form: as micro-batches arrive, each document is checked
against everything ACCEPTED so far, duplicates are marked (never
accepted), and survivors join the state — so the accepted set is always
near-dup-free under the ingestion order. This is the W10 sink-as-state
pattern (graph/counts.py, plans/pretrain.fold_budget_batch) applied to
content dedup:

- **state** lives in two keyed sinks (any LakeUpsertSink-shaped store):
  ``sig_sink`` — one row per accepted doc (id, signature array), and
  ``bucket_sink`` — the exploded LSH index, one row per (band, bucket,
  id). Both are plain tables: at 100 TB they are partitioned parquet /
  the warehouse, and the per-batch probe below is an equi-join against
  them, never a scan of history;
- **per batch**: signatures for the batch (one corpus-scan aggregate),
  intra-batch LSH + estimated-Jaccard pairs -> connected components ->
  a first-wins representative per batch cluster; representatives probe
  the persisted bucket index (equi-join on (band, bucket)), matches are
  verified by signature agreement (>= threshold) against ``sig_sink``;
  a component whose representative matches state is entirely dup-of
  that state doc. Survivor representatives upsert into both sinks;
- **crash replay** is idempotent: both sinks are recency-guarded keyed
  upserts (re-upserting a survivor is a last-writer-wins no-op), and
  the state probe EXCLUDES self-matches by id — a doc the crashed run
  already accepted sits in the index and would otherwise match itself
  and flip from accepted to dup on the re-fold; with the exclusion, the
  re-fold reproduces the original verdicts exactly (test pinned).

Estimated Jaccard = fraction of agreeing MinHash members, the same
statistic ``minhash_lsh_candidates`` reports; exact-rerank (shingle
Jaccard via ``ngram_jaccard_pairs``) IS layered on the emitted
(dup, dup_of) pairs under ``rerank=True`` — signature false positives
are rescued back into the accepted set (see ``near_dup_fold_batch``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup as _dedup
from ..operators.dedup import (
    _persist,
    connected_components,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    release_cached,  # noqa: F401  (re-exported convenience for callers)
)

SIG_SCHEMA = "id long, signature array<bigint>, updated_at long"
BUCKET_SCHEMA = "band int, bucket long, id long, updated_at long"


def _band_keys(sigs: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(id, band, bucket) for every signature row — the exploded LSH
    index shape shared by the in-batch join and the persisted store."""
    return sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col("signature")[b * rows_per_band + r]
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")


def _sig_agreement(a: str, b: str):
    agree = F.size(
        F.filter(F.zip_with(a, b, lambda x, y: x == y), lambda x: x)
    )
    return agree / F.size(a)


def near_dup_fold_batch(
    sig_sink,
    bucket_sink,
    batch: DataFrame,
    epoch: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    rerank: bool = False,
    state_text: DataFrame | None = None,
    rerank_max_shingle_df: int | float | None = None,
) -> DataFrame:
    """Fold one micro-batch through the streaming near-dup filter.

    Returns the batch's dedup verdicts as a DataFrame
    ``(id, is_dup, dup_of)`` — ``dup_of`` is the accepted doc the
    cluster representative matched (state first-wins), or the batch
    cluster's first (min-id) member for intra-batch dups, or the doc
    itself for accepted docs. Survivors' signatures and bucket keys are
    upserted into the sinks before returning (so the RESULT frame is
    computed eagerly — it must describe the state transition that
    actually happened, not a lazy plan over mutated state).

    Scale shape: the verdict frame is pinned with an eager
    ``localCheckpoint`` — materialized on EXECUTORS before the sink
    upserts mutate state, never round-tripped through the driver — and
    the accepted set is a ``left_semi`` join against it, so a catch-up
    micro-batch of millions of docs stays distributed end to end. Every
    frame persisted/checkpointed inside the fold is released before
    returning (a long-running stream would otherwise leak one signature
    cache per batch); the returned verdict frame is caller-owned — its
    checkpoint blocks are reclaimed by Spark's ContextCleaner once the
    caller drops the reference.

    ``rerank=True`` layers the promised exact verification
    (:func:`~..operators.dedup.ngram_jaccard_pairs`) onto the emitted
    (dup, dup_of) matches: a pair whose MinHash member agreement clears
    ``threshold`` but whose exact (capped) shingle Jaccard does not is a
    signature false positive — the doc is RESCUED (accepted, and its
    signature joins the state). Intra-batch pairs rerank from the
    batch's own text; state matches need the accepted docs' text, which
    the signature sinks deliberately do not keep — pass ``state_text``
    (an ``(id_col, text_col)`` frame, e.g. the lake table the accepted
    ids key into; at 100 TB the rerank fetch is a semi-join against it,
    never a scan) to rerank those too, otherwise state matches keep
    their signature-agreement verdict. Trade documented: rerank is
    pair-exact, so a transitive chain a~b~c whose (a, c) link is weak
    can split — that is the point of a rescue pass.
    ``rerank_max_shingle_df`` forwards the stop-shingle cap so the
    exact statistic matches the capped one the signatures estimate.
    """
    # mark this THREAD's cache registries so everything THIS fold pins
    # can be released on exit without touching frames the caller already
    # holds (the registries are thread-local, so concurrent folds in
    # other pipeline threads are untouched by construction). The rollback
    # runs in a finally: a failed sink upsert or Spark job must not leak
    # this batch's persisted/checkpointed frames into a supervised
    # catch-and-retry daemon (ADVICE r5).
    cache_mark = len(_dedup._cached())
    ckpt_mark = len(_dedup._ckpts())
    try:
        return _fold_batch_inner(
            sig_sink,
            bucket_sink,
            batch,
            epoch,
            text_col,
            id_col,
            num_hashes,
            bands,
            rows_per_band,
            shingle_n,
            threshold,
            rerank,
            state_text,
            rerank_max_shingle_df,
        )
    finally:
        # release every frame this fold pinned (batch signatures, banding
        # caches, component states, rerank candidates): the verdict
        # checkpoint no longer depends on any of them, and a long-running
        # stream must not accumulate one cached frame per micro-batch —
        # including batches that FAILED mid-fold
        while len(_dedup._cached()) > cache_mark:
            _dedup._cached().pop().unpersist()
        while len(_dedup._ckpts()) > ckpt_mark:
            _dedup._release_ckpt(_dedup._ckpts()[-1])


def _fold_batch_inner(
    sig_sink,
    bucket_sink,
    batch: DataFrame,
    epoch: int,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    rows_per_band: int,
    shingle_n: int,
    threshold: float,
    rerank: bool,
    state_text: DataFrame | None,
    rerank_max_shingle_df: int | float | None,
) -> DataFrame:
    sigs = _persist(
        minhash_signatures(batch, text_col, id_col, num_hashes, shingle_n)
    )

    # --- intra-batch clusters, first(min-id)-wins representative -------
    intra = minhash_lsh_candidates(
        sigs, bands=bands, rows_per_band=rows_per_band
    ).filter(F.col("est_jaccard") >= threshold)
    comps = connected_components(intra.select("id_a", "id_b"))
    labels = sigs.select("id").join(comps, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("rep")
    )

    # --- representatives probe the persisted LSH index -----------------
    reps = labels.select(F.col("rep").alias("id")).distinct().join(
        sigs, "id"
    )
    state_sigs = sig_sink.read()
    matches = None
    if state_sigs is not None:
        rep_keys = _band_keys(reps, bands, rows_per_band)
        state_buckets = bucket_sink.read()
        if state_buckets is None:
            # crash window between the two sink upserts (sig landed,
            # bucket didn't — reachable on the first-ever batch, or a
            # manually cleared index dir): the bucket index is a pure
            # function of the signatures, so REBUILD it from state
            # rather than crash-looping on NoneType, and PERSIST the
            # full rebuild NOW (before this fold mutates the sig sink)
            # — persisting only this batch's survivors later would
            # leave a non-None-but-partial index that silently misses
            # state matches on every future fold
            state_buckets = _band_keys(
                state_sigs.select("id", "signature"), bands, rows_per_band
            )
            bucket_sink.upsert(
                state_buckets.withColumn(
                    "updated_at", F.lit(epoch).cast("long")
                ),
                epoch,
            )
        cand = (
            rep_keys.join(
                state_buckets.withColumnsRenamed({"id": "state_id"}),
                ["band", "bucket"],
            )
            # self-match exclusion is what makes crash REPLAY idempotent:
            # a doc accepted by the crashed run is already in the index
            # and would otherwise match itself at agreement 1 and flip
            # from accepted to dup on the re-fold
            .filter(F.col("id") != F.col("state_id"))
            .select("id", "state_id")
            .distinct()
        )
        verified = (
            cand.join(reps.select("id", "signature"), "id")
            .join(
                state_sigs.select(
                    F.col("id").alias("state_id"),
                    F.col("signature").alias("state_sig"),
                ),
                "state_id",
            )
            .filter(_sig_agreement("signature", "state_sig") >= threshold)
        )
        matches = verified.groupBy("id").agg(
            F.min("state_id").alias("dup_of_state")
        )

    resolved = labels.join(
        reps.select(F.col("id").alias("rep")).withColumn("__is_rep", F.lit(1)),
        "rep",
        "left",
    )
    if matches is not None:
        resolved = resolved.join(
            matches.withColumnsRenamed({"id": "rep"}), "rep", "left"
        )
    else:
        resolved = resolved.withColumn("dup_of_state", F.lit(None).cast("long"))

    verdict = resolved.select(
        "id",
        (
            F.col("dup_of_state").isNotNull() | (F.col("id") != F.col("rep"))
        ).alias("is_dup"),
        F.coalesce("dup_of_state", "rep").alias("dup_of"),
    )

    if rerank:
        verdict = _exact_rerank(
            verdict,
            batch,
            text_col,
            id_col,
            shingle_n,
            threshold,
            state_text,
            rerank_max_shingle_df,
        )
    # eager + lineage-truncated: the sink upserts below change state, so
    # the verdicts must be MATERIALIZED against the pre-upsert state now —
    # on executors (localCheckpoint), not via an O(batch) driver collect —
    # and truncation detaches the result from every fold-local cached/
    # checkpointed frame so those can all be released before returning
    verdict = verdict.localCheckpoint(eager=True)

    # --- accept survivors into the state -------------------------------
    accepted = verdict.filter(~F.col("is_dup")).select("id")
    if accepted.limit(1).count() > 0:
        acc = _persist(sigs.join(accepted, "id", "left_semi"))
        sig_sink.upsert(
            acc.withColumn("updated_at", F.lit(epoch).cast("long")), epoch
        )
        bucket_sink.upsert(
            _band_keys(acc, bands, rows_per_band).withColumn(
                "updated_at", F.lit(epoch).cast("long")
            ),
            epoch,
        )
    return verdict


def _exact_rerank(
    verdict: DataFrame,
    batch: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int,
    threshold: float,
    state_text: DataFrame | None,
    rerank_max_shingle_df: int | float | None,
) -> DataFrame:
    """Rescue signature-agreement false positives: recompute each
    (dup, dup_of) pair's EXACT capped shingle Jaccard and flip pairs
    below ``threshold`` back to accepted. Runs entirely as equi-joins
    (ngram_jaccard_pairs semi-joins the text source down to candidate
    docs first), pre-``localCheckpoint`` so rescued docs flow into the
    accepted set and the state sinks with no extra materialization."""
    dup_pairs = verdict.filter(F.col("is_dup")).select("id", "dup_of")
    text_src = batch.select(F.col(id_col), F.col(text_col))
    if state_text is not None:
        text_src = text_src.unionByName(
            state_text.select(F.col(id_col), F.col(text_col))
        )
    else:
        # without the accepted docs' text only intra-batch pairs are
        # verifiable; state matches keep their signature verdict
        dup_pairs = dup_pairs.join(
            batch.select(F.col(id_col).alias("dup_of")), "dup_of", "left_semi"
        )
    # ngram_jaccard_pairs joins its inverted index under id_a < id_b, so
    # normalize the (possibly reversed) pair orientation and map back
    norm = dup_pairs.select(
        F.col("id").alias("orig_id"),
        F.least("id", "dup_of").alias("id_a"),
        F.greatest("id", "dup_of").alias("id_b"),
    )
    exact = ngram_jaccard_pairs(
        text_src,
        norm.select("id_a", "id_b").distinct(),
        text_col=text_col,
        id_col=id_col,
        shingle_n=shingle_n,
        max_shingle_df=rerank_max_shingle_df,
    )
    rescued = (
        norm.join(exact, ["id_a", "id_b"])
        .filter(F.col("jaccard") < threshold)
        .select(F.col("orig_id").alias("id"), F.lit(True).alias("__rescued"))
    )
    return verdict.join(rescued, "id", "left").select(
        "id",
        (F.col("is_dup") & F.col("__rescued").isNull()).alias("is_dup"),
        F.when(F.col("__rescued").isNull(), F.col("dup_of"))
        .otherwise(F.col("id"))
        .alias("dup_of"),
    )
