"""Round-11 equivalence pins: the optimized fast paths must compute
exactly what the plain paths compute.

- retrieval.doc_lengths (projection) == postings.groupBy(doc).sum(tf)
- bm25_topk(doc_lengths=, prune_terms=) == bm25_topk() verbatim
- capped_distinct_shingles rejects an explicit cap alongside a
  precomputed hot frame (the ngram_jaccard_pairs contract, r10 advisor)
- pretrain_pipeline's contamination-over-gated branch == the
  contamination-over-deduped form it replaced
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators import dedup as dd
from neynar_parquet_importer_spark.operators import retrieval as rtr

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_doc_lengths_matches_postings_sum(spark, docs):
    """dl-as-projection must equal the postings aggregate exactly,
    including which docs appear at all (whitespace-only docs have no
    postings and no dl row)."""
    plus_empty = docs.select("doc_id", "text").union(
        spark.createDataFrame(
            [(99990, ""), (99991, "   \t\n "), (99992, "one token  here")],
            "doc_id long, text string",
        )
    )
    via_postings = (
        rtr.term_postings(plus_empty)
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("dl"))
    )
    assert _rows(rtr.doc_lengths(plus_empty)) == _rows(via_postings)


def test_bm25_pruned_path_matches_plain(spark, docs):
    queries = {"qa": ["customer", "vector"], "qb": ["spark", "merge", "zzz_absent"]}
    q = rtr.query_frame(spark, queries)
    postings = rtr.term_postings(docs)
    plain = rtr.bm25_topk(postings, q, k=5)
    fast = rtr.bm25_topk(
        postings,
        q,
        k=5,
        doc_lengths=rtr.doc_lengths(docs),
        prune_terms=sorted({t for ts in queries.values() for t in ts}),
    )
    assert _rows(plain) == _rows(fast)


def test_capped_shingles_rejects_cap_with_hot(spark, docs):
    hot = dd.hot_shingles(docs, 0.5, "text", "doc_id", 3)
    with pytest.raises(ValueError, match="max_shingle_df"):
        dd.capped_distinct_shingles(
            docs, "text", "doc_id", 3, max_shingle_df=0.3, hot=hot
        )
    with pytest.raises(ValueError, match="max_shingle_df"):
        dd.jaccard_all_pairs(
            docs, "text", "doc_id", threshold=0.5, max_shingle_df=0.3, hot=hot
        )
    # the module default counts as unset: hot-only calls stay valid
    dd.capped_distinct_shingles(docs, "text", "doc_id", 3, hot=hot).count()
    dd.release_cached()


def test_pretrain_contamination_over_gated_matches_deduped(spark, docs):
    """The r11 branch rewrite: contamination computed over the gated
    (pre-dedup) corpus joins back to exactly the same surviving rows
    with exactly the same values as the old deduped-input form."""
    from pyspark.sql import Window

    from neynar_parquet_importer_spark.operators import text as tx
    from neynar_parquet_importer_spark.plans.pretrain import pretrain_pipeline
    from neynar_parquet_importer_spark.operators.corpus import ngram_contamination

    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)

    # replicate the OLD form inline (contamination over deduped)
    feats = corpus.select(
        F.col("doc_id"),
        F.col("lang"),
        F.col("text"),
        tx.token_count("text").alias("n_tokens"),
        tx.quality_score("text").alias("quality"),
        tx.fingerprint("text").alias("__fp"),
    )
    gated = feats.filter(
        (F.length(F.trim("text")) > 0)
        & (F.col("n_tokens") >= 5)
        & (F.col("quality") >= 0.3)
    )
    w = Window.partitionBy("__fp").orderBy("doc_id")
    deduped = (
        gated.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__fp")
    )
    old_contam = ngram_contamination(deduped, bench, "text", "doc_id", 3).select(
        "doc_id", "contamination"
    )
    old_rows = _rows(
        deduped.join(old_contam, "doc_id", "left")
        .filter(F.coalesce("contamination", F.lit(0.0)) <= 0.5)
        .select("doc_id", F.round(F.coalesce("contamination", F.lit(0.0)), 6).alias("c"))
    )
    new = pretrain_pipeline(corpus, benchmark=bench)
    # pipeline output is post-sampling; compare the contamination values
    # for every surviving doc against the old form's values
    new_rows = dict(
        (r[0], r[1])
        for r in new.select("doc_id", F.round("contamination", 6)).collect()
    )
    old_map = dict(old_rows)
    assert new_rows, "pipeline output is empty - the equivalence pin would pass vacuously"
    assert new_rows.keys() <= old_map.keys()
    for k, v in new_rows.items():
        assert old_map[k] == v, (k, old_map[k], v)
