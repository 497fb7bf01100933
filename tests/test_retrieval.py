"""BM25 retrieval: postings correctness, score monotonicity in tf and
rarity, ranking determinism, and the broadcast-probe plan shape.
Cross-engine parity is the ``bm25_topk_docs`` / ``bm25_term_stats``
oracle twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators import retrieval as rtr


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "Apple  APPLE apple apple"),
            (4, "durian elderberry fig grape"),
            (5, "cherry banana cherry banana cherry"),
        ],
        "doc_id long, text string",
    )


def test_postings_counts_and_normalization(spark, corpus):
    got = {
        (r.doc_id, r.term): r.tf
        for r in rtr.term_postings(corpus).collect()
    }
    # case-folded, whitespace-run split, per-doc term counts
    assert got[(1, "apple")] == 2
    assert got[(3, "apple")] == 4
    assert got[(5, "cherry")] == 3
    assert (3, "Apple") not in got


def test_rare_term_outranks_common(spark, corpus):
    """'durian' appears in one doc, 'banana' in three: for a query with
    both, the unique-match doc must outrank any banana-only doc."""
    q = rtr.query_frame(spark, {"q": ["durian", "banana"]})
    ranked = rtr.bm25_topk(rtr.term_postings(corpus), q, k=5).collect()
    assert ranked[0].doc_id == 4


def test_higher_tf_scores_higher_same_length(spark):
    """Two docs of equal length, same single query term, tf 3 vs 1."""
    df = spark.createDataFrame(
        [(1, "kiwi kiwi kiwi pad"), (2, "kiwi pad pad pad")],
        "doc_id long, text string",
    )
    q = rtr.query_frame(spark, {"q": ["kiwi"]})
    rows = {
        r.doc_id: r.score
        for r in rtr.bm25_scores(rtr.term_postings(df), q).collect()
    }
    assert rows[1] > rows[2]


def test_query_frame_dedups_and_folds_case(spark):
    q = rtr.query_frame(spark, {"a": ["Apple", "apple", " BANANA "]})
    assert sorted(map(tuple, q.collect())) == [("a", "apple"), ("a", "banana")]


def test_topk_rank_is_dense_and_tiebroken(spark):
    """Identical docs tie on score; doc_id must break the tie and ranks
    must be 1..k with no gaps."""
    df = spark.createDataFrame(
        [(i, "same text here") for i in range(1, 7)],
        "doc_id long, text string",
    )
    q = rtr.query_frame(spark, {"q": ["same"]})
    got = rtr.bm25_topk(rtr.term_postings(df), q, k=3).collect()
    assert [(r.rank, r.doc_id) for r in got] == [(1, 1), (2, 2), (3, 3)]


def test_scoring_probe_broadcasts_query_side(spark, corpus):
    """The postings-vs-query joins must be broadcast on term (the
    posting-list seek) — the corpus-sized postings are never
    shuffle-joined on term. The doc_id join against the doc-length
    frame MAY sort-merge: both sides are corpus-sized relations there."""
    q = rtr.query_frame(spark, {"q": ["apple", "cherry"]})
    plan = (
        rtr.bm25_scores(rtr.term_postings(corpus), q)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin [term" in plan
    assert "SortMergeJoin [term" not in plan


# --------------------------------------------------------------------------
# Reciprocal-rank fusion
# --------------------------------------------------------------------------

def _rank_frame(spark, rows):
    return spark.createDataFrame(
        rows, "query_id string, doc_id long, rank int"
    )


def test_rrf_fuse_hand_computed(spark):
    """Two systems, one query; fused scores checked against the exact
    integer contributions 1e9 // (60 + rank)."""
    a = _rank_frame(spark, [("q", 10, 1), ("q", 20, 2), ("q", 30, 3)])
    b = _rank_frame(spark, [("q", 20, 1), ("q", 10, 2), ("q", 40, 3)])
    got = {
        r.doc_id: (r.rank, r.rrf_fp, r.n_systems)
        for r in rtr.rrf_fuse([a, b]).collect()
    }
    c = lambda rank: 1_000_000_000 // (60 + rank)
    # doc 10: ranks 1+2 -> same total as doc 20 (ranks 2+1); doc_id breaks it
    assert got[10] == (1, c(1) + c(2), 2)
    assert got[20] == (2, c(2) + c(1), 2)
    assert got[30] == (3, c(3), 1)
    assert got[40] == (4, c(3), 1)


def test_rrf_fuse_k_cut_and_multi_query(spark):
    a = _rank_frame(
        spark, [("q1", 1, 1), ("q1", 2, 2), ("q2", 7, 1), ("q2", 8, 2)]
    )
    b = _rank_frame(spark, [("q1", 3, 1), ("q2", 7, 2)])
    out = rtr.rrf_fuse([a, b], k=2).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append((r.rank, r.doc_id))
    # doc1 (rank1 in a) ties doc3 (rank1 in b) on rrf_fp; doc_id asc wins
    assert sorted(per_q["q1"]) == [(1, 1), (2, 3)]
    assert sorted(per_q["q2"]) == [(1, 7), (2, 8)]  # doc7 in both systems dominates
    assert all(len(v) == 2 for v in per_q.values())


def test_rrf_fuse_single_system_preserves_order(spark):
    a = _rank_frame(spark, [("q", 5, 1), ("q", 6, 2), ("q", 7, 3)])
    got = [(r.rank, r.doc_id) for r in rtr.rrf_fuse([a]).collect()]
    assert sorted(got) == [(1, 5), (2, 6), (3, 7)]


def test_rrf_fuse_empty_list_raises(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rtr.rrf_fuse([])
