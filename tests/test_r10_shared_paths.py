"""Round-10 optimization equivalence pins: the shared/amortized fast
paths added for performance must compute bit-identical results to the
paths they replaced.

- minhash_signatures(capped_stream=...) == minhash_signatures(df, hot=...)
  (min over the distinct stream equals min over the occurrence stream);
- ngram_jaccard_pairs(capped_sets=...) == the self-deriving path
  (per-id sz is the same count either way);
- kcore_edges(assume_canonical=True) == default on canonical input
  (the skipped distinct was a no-op there);
- the simhash fold-packed signature (one aggregate/zip_with expression)
  equals the independently computed chained-sum packing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators import dedup as dd
from neynar_parquet_importer_spark.graph import kcore as kcr


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text with no shared shingles at all"),
        (4, "the quick brown fox jumps over the lazy dog"),  # dup of 1
        (5, "another unrelated document body entirely here now"),
        (6, "the quick brown fox leaps over the lazy dog"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_minhash_capped_stream_matches_direct(spark, docs):
    hot = dd.hot_shingles(docs, 0.5, "text", "doc_id", 3)
    direct = dd.minhash_signatures(docs, num_hashes=16, shingle_n=3, hot=hot)
    capped = dd.capped_distinct_shingles(
        docs, "text", "doc_id", 3, max_shingle_df=None, hot=hot
    )
    shared = dd.minhash_signatures(
        docs, num_hashes=16, shingle_n=3, capped_stream=capped
    )
    assert _rows(direct) == _rows(shared)
    dd.release_cached()


def test_minhash_capped_stream_rejects_md5(spark, docs):
    capped = dd.capped_distinct_shingles(
        docs, "text", "doc_id", 3, max_shingle_df=None
    )
    with pytest.raises(ValueError, match="xxhash64"):
        dd.minhash_signatures(
            docs, hash_family="md5", capped_stream=capped
        )
    dd.release_cached()


def test_rerank_capped_sets_matches_direct(spark, docs):
    cands = spark.createDataFrame(
        [(1, 2), (1, 4), (2, 6), (3, 5)], "id_a long, id_b long"
    )
    hot = dd.hot_shingles(docs, 0.5, "text", "doc_id", 3)
    direct = dd.ngram_jaccard_pairs(docs, cands, "text", "doc_id", hot=hot)
    capped = dd._persist(
        dd.capped_distinct_shingles(
            docs, "text", "doc_id", 3, max_shingle_df=None, hot=hot
        )
    )
    shared = dd.ngram_jaccard_pairs(
        docs, cands, "text", "doc_id", capped_sets=capped
    )
    assert _rows(direct) == _rows(shared)
    dd.release_cached()


def test_kcore_assume_canonical_matches_default(spark):
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6), (4, 6)],
        "a long, b long",
    )
    default = kcr.kcore_edges(edges, k=2)
    fast = kcr.kcore_edges(edges, k=2, assume_canonical=True)
    assert _rows(default) == _rows(fast)
    dd.release_cached()


def test_simhash_fold_pack_matches_chained(spark, docs):
    got = {r["id"]: r["simhash"] for r in dd.simhash(docs, token_hash="md5").collect()}
    # independent packing: recompute votes, pack with python ints
    tok = F.coalesce(F.col("tok"), F.lit(""))
    base = docs.select(
        F.col("doc_id").alias("id"),
        F.explode_outer(
            F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
        ).alias("tok"),
    ).select("id", dd.md5_signed64(tok).alias("h"))
    votes = base.groupBy("id").agg(
        *[
            F.sum(F.when(F.getbit("h", F.lit(i)) == 1, 1).otherwise(-1)).alias(f"b{i}")
            for i in range(64)
        ]
    )
    for r in votes.collect():
        acc = 0
        for i in range(64):
            if r[f"b{i}"] > 0:
                acc |= 1 << i
        # two's-complement fold of bit 63
        if acc >= 1 << 63:
            acc -= 1 << 64
        assert got[r["id"]] == acc
    dd.release_cached()
