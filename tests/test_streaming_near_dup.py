"""Streaming cross-batch near-dup dedup (streaming/near_dup.py): the
first-wins fold against persisted MinHash state — detection across
batches, intra-batch clustering, crash-replay idempotency, and
equivalence with the batch LSH pipeline on an ordered corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators.dedup import release_cached
from neynar_parquet_importer_spark.sinks.lake_upsert import LakeUpsertSink
from neynar_parquet_importer_spark.streaming.near_dup import near_dup_fold_batch

DOC_SCHEMA = "doc_id long, text string"


def _sinks(spark, tmp_path):
    sig = LakeUpsertSink(spark, str(tmp_path / "sigs"), ("id",), "updated_at")
    buckets = LakeUpsertSink(
        spark, str(tmp_path / "buckets"), ("band", "bucket", "id"), "updated_at"
    )
    return sig, buckets


def _doc(words: str, salt: str = "") -> str:
    return (words + " " + salt).strip()


_G = {
    "a": "alpha beaver canyon delta ember falcon garnet harbor indigo jasper katydid lumen",
    "b": "meadow nectar onyx prairie quartz russet sierra tundra umber velvet willow xenon",
    "c": "anchor bastion cipher dynamo enclave fresco glacier hollow isthmus junction keystone lagoon",
}


def _fold(spark, sinks, rows, epoch, **kw):
    batch = spark.createDataFrame(rows, DOC_SCHEMA)
    out = near_dup_fold_batch(sinks[0], sinks[1], batch, epoch, **kw)
    verdicts = {r["id"]: (r["is_dup"], r["dup_of"]) for r in out.collect()}
    release_cached()
    return verdicts


def test_cross_batch_near_dup_detected(spark, tmp_path):
    sinks = _sinks(spark, tmp_path)
    v1 = _fold(
        spark,
        sinks,
        [(1, _doc(_G["a"])), (2, _doc(_G["b"]))],
        epoch=1,
    )
    assert v1 == {1: (False, 1), 2: (False, 2)}

    # batch 2: a near-copy of doc 1, and a genuinely new doc
    v2 = _fold(
        spark,
        sinks,
        [(3, _doc(_G["a"], "tail")), (4, _doc(_G["c"]))],
        epoch=2,
    )
    assert v2[3] == (True, 1)  # first-wins: dup of the accepted state doc
    assert v2[4] == (False, 4)
    # state only ever holds accepted docs
    assert sorted(r["id"] for r in sinks[0].read().collect()) == [1, 2, 4]


def test_intra_batch_cluster_first_wins(spark, tmp_path):
    sinks = _sinks(spark, tmp_path)
    v = _fold(
        spark,
        sinks,
        [
            (10, _doc(_G["a"])),
            (11, _doc(_G["a"], "x")),
            (12, _doc(_G["a"], "y")),
            (13, _doc(_G["b"])),
        ],
        epoch=1,
    )
    assert v[10] == (False, 10)
    assert v[11] == (True, 10)
    assert v[12] == (True, 10)
    assert v[13] == (False, 13)
    assert sorted(r["id"] for r in sinks[0].read().collect()) == [10, 13]


def test_replay_is_idempotent(spark, tmp_path):
    """Crash between sink upserts and verdict consumption: re-folding the
    same batch must reproduce the verdicts (no self-match flip) and leave
    state unchanged."""
    sinks = _sinks(spark, tmp_path)
    _fold(spark, sinks, [(1, _doc(_G["a"]))], epoch=1)
    rows2 = [(2, _doc(_G["a"], "tail")), (3, _doc(_G["b"]))]
    first = _fold(spark, sinks, rows2, epoch=2)
    state_after = sorted(tuple(r) for r in sinks[0].read().collect())
    replay = _fold(spark, sinks, rows2, epoch=2)
    assert replay == first == {2: (True, 1), 3: (False, 3)}
    assert sorted(tuple(r) for r in sinks[0].read().collect()) == state_after


def test_streaming_fold_matches_batch_pipeline(spark, tmp_path):
    """On an id-ordered corpus of near-dup cliques, the streaming
    first-wins accepted set must equal the batch pipeline's keeper set
    (LSH pairs -> components -> min-id keeper)."""
    from neynar_parquet_importer_spark.operators.dedup import (
        dedup_cluster_keepers,
        minhash_lsh_candidates,
        minhash_signatures,
    )

    # interleave cliques across ids so each micro-batch below holds one
    # member of each clique — every dup detection is CROSS-batch
    rows = []
    nid = 0
    for i in range(3):
        for g in ["a", "b", "c"]:  # 3-member cliques
            rows.append((nid, _doc(_G[g], f"v{i}")))
            nid += 1

    # batch ground truth
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    sigs = minhash_signatures(docs, "text", "doc_id")
    pairs = minhash_lsh_candidates(sigs).filter(
        F.col("est_jaccard") >= 0.5
    ).select("id_a", "id_b")
    keepers = {
        r["doc_id"]
        for r in dedup_cluster_keepers(docs, pairs, "doc_id").collect()
        if r["keep"]
    }
    clustered = {
        r["doc_id"] for r in dedup_cluster_keepers(docs, pairs, "doc_id").collect()
    }
    batch_accepted = keepers | ({r[0] for r in rows} - clustered)
    release_cached()

    # streaming: same corpus in 3 ordered micro-batches
    sinks = _sinks(spark, tmp_path)
    accepted = set()
    for e, lo in enumerate([0, 3, 6], start=1):
        v = _fold(spark, sinks, rows[lo : lo + 3], epoch=e)
        accepted |= {i for i, (dup, _) in v.items() if not dup}
    assert accepted == batch_accepted


# A planted signature false positive vs _G["a"]+" meadow nectar onyx
# prairie": MinHash member agreement 0.50 (32/64 members, and an LSH
# band collision) while the exact 3-gram Jaccard is 0.40 — found by a
# deterministic search over word-replacement variants. With
# threshold=0.45 the signature path calls it a dup and the exact rerank
# must rescue it.
_FP_BASE = _G["a"] + " meadow nectar onyx prairie"
_FP_VARIANT = (
    "alpha beaver canyon delta ember falcon willow xenon indigo jasper "
    "katydid lumen meadow nectar glacier hollow"
)
_FP_THRESHOLD = 0.45


def test_rerank_rescues_state_match_false_positive(spark, tmp_path):
    """member agreement (0.50) >= threshold (0.45) > exact capped
    Jaccard (0.40): without rerank the doc is marked dup of state; with
    rerank + the accepted docs' text it is rescued and joins the state."""
    sinks = _sinks(spark, tmp_path / "plain")
    _fold(spark, sinks, [(1, _FP_BASE)], epoch=1, threshold=_FP_THRESHOLD)
    v = _fold(spark, sinks, [(2, _FP_VARIANT)], epoch=2, threshold=_FP_THRESHOLD)
    assert v == {2: (True, 1)}  # signature path alone: false positive

    sinks = _sinks(spark, tmp_path / "rerank")
    _fold(spark, sinks, [(1, _FP_BASE)], epoch=1, threshold=_FP_THRESHOLD)
    state_text = spark.createDataFrame([(1, _FP_BASE)], DOC_SCHEMA)
    v = _fold(
        spark,
        sinks,
        [(2, _FP_VARIANT)],
        epoch=2,
        threshold=_FP_THRESHOLD,
        rerank=True,
        state_text=state_text,
    )
    assert v == {2: (False, 2)}  # rescued
    assert sorted(r["id"] for r in sinks[0].read().collect()) == [1, 2]


def test_rerank_without_state_text_keeps_signature_verdict(spark, tmp_path):
    """State matches are only rerankable when the accepted docs' text is
    provided; without it the signature verdict stands (documented)."""
    sinks = _sinks(spark, tmp_path)
    _fold(spark, sinks, [(1, _FP_BASE)], epoch=1, threshold=_FP_THRESHOLD)
    v = _fold(
        spark,
        sinks,
        [(2, _FP_VARIANT)],
        epoch=2,
        threshold=_FP_THRESHOLD,
        rerank=True,
    )
    assert v == {2: (True, 1)}


def test_rerank_intra_batch_rescue_and_true_dup_kept(spark, tmp_path):
    """Intra-batch pairs rerank from the batch's own text: the planted
    false positive is rescued while a genuine near-copy (exact Jaccard
    0.93) stays dup — the rescue is selective, not a blanket accept."""
    sinks = _sinks(spark, tmp_path)
    v = _fold(
        spark,
        sinks,
        [(1, _FP_BASE), (2, _FP_VARIANT), (3, _doc(_FP_BASE, "tail"))],
        epoch=1,
        threshold=_FP_THRESHOLD,
        rerank=True,
    )
    assert v[1] == (False, 1)
    assert v[2] == (False, 2)  # rescued intra-batch
    assert v[3] == (True, 1)  # true near-copy survives the rerank as dup
    assert sorted(r["id"] for r in sinks[0].read().collect()) == [1, 2]


def test_fold_releases_registries_on_failure(spark, tmp_path):
    """ADVICE r5: the registry rollback must run on the FAILURE path too —
    a sink upsert that raises mid-fold must not leak this batch's
    persisted/checkpointed frames into a catch-and-retry daemon."""
    import pytest

    from neynar_parquet_importer_spark.operators import dedup as dmod

    class _ExplodingSink:
        def read(self):
            return None

        def upsert(self, df, epoch):
            raise RuntimeError("sink down")

    n_cached, n_ckpt = len(dmod._cached()), len(dmod._ckpts())
    batch = spark.createDataFrame([(1, _doc(_G["a"]))], DOC_SCHEMA)
    with pytest.raises(RuntimeError, match="sink down"):
        near_dup_fold_batch(_ExplodingSink(), _ExplodingSink(), batch, epoch=1)
    assert (len(dmod._cached()), len(dmod._ckpts())) == (n_cached, n_ckpt)


def test_fold_is_distributed_and_releases_caches(spark, tmp_path):
    """Scale-shape pins: the fold must never round-trip the batch through
    the driver (no DataFrame.collect), must return an executor-
    materialized (checkpoint-leaf) verdict frame that stays consumable
    after release_cached(), and must leave the dedup module's cache
    registries exactly as it found them (no per-batch leak)."""
    from unittest import mock

    from pyspark.sql import DataFrame

    from neynar_parquet_importer_spark.operators import dedup as dmod

    sinks = _sinks(spark, tmp_path)
    # seed state so the state-probe branch (the expensive path) runs too
    _fold(spark, sinks, [(1, _doc(_G["a"]))], epoch=1)

    n_cached, n_ckpt = len(dmod._cached()), len(dmod._ckpts())
    batch = spark.createDataFrame(
        [(2, _doc(_G["a"], "tail")), (3, _doc(_G["b"]))], DOC_SCHEMA
    )
    real_collect = DataFrame.collect
    state_text = spark.createDataFrame([(1, _doc(_G["a"]))], DOC_SCHEMA)
    with mock.patch.object(
        DataFrame,
        "collect",
        side_effect=AssertionError("driver collect inside fold"),
    ):
        # rerank=True exercises the exact-verification path under the
        # collect ban too — the rescue joins must stay distributed
        out = near_dup_fold_batch(
            sinks[0],
            sinks[1],
            batch,
            epoch=2,
            rerank=True,
            state_text=state_text,
        )
    # fold-local caches all released, registries restored
    assert (len(dmod._cached()), len(dmod._ckpts())) == (n_cached, n_ckpt)
    # verdict is a checkpoint leaf (materialized, lineage truncated) ...
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan
    # ... so it survives a full release_cached() and reads correctly
    release_cached()
    verdicts = {r["id"]: (r["is_dup"], r["dup_of"]) for r in real_collect(out)}
    assert verdicts == {2: (True, 1), 3: (False, 3)}
    assert sorted(r["id"] for r in sinks[0].read().collect()) == [1, 3]


def test_replay_heals_missing_bucket_index(spark, tmp_path):
    """Crash window between the two sink upserts: signatures landed,
    the bucket index didn't (reachable on the first-ever batch). The
    re-fold must not crash-loop on the None bucket state — it rebuilds
    the index from the signatures (a pure function of them), PERSISTS
    the rebuild, and reproduces the original verdicts; a subsequent
    batch then probes a complete index."""
    import shutil

    sinks = _sinks(spark, tmp_path)
    rows = [(1, _doc(_G["a"])), (2, _doc(_G["b"]))]
    _fold(spark, sinks, rows, epoch=1)
    # simulate the crash: wipe the bucket sink only
    shutil.rmtree(str(tmp_path / "buckets"))
    sinks = _sinks(spark, tmp_path)  # fresh handles, sig state intact
    assert sinks[0].read() is not None and sinks[1].read() is None
    # replay the same batch: converges, no AttributeError
    v = _fold(spark, sinks, rows, epoch=1)
    assert v == {1: (False, 1), 2: (False, 2)}
    # the heal persisted the FULL index: state docs are now probe-able
    assert sinks[1].read() is not None
    v2 = _fold(spark, sinks, [(3, _doc(_G["a"]))], epoch=2)
    assert v2 == {3: (True, 1)}
