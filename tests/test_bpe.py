"""BPE merge learning: Spark training == single-process replay on a
hand corpus, the left-to-right non-overlap rule, tie-breaking, early
stop, inference-order application, and compression stats. Cross-engine
parity is the ``bpe_learned_merges`` / ``bpe_token_compression``
replay-oracle twins."""

from __future__ import annotations

import pytest

from neynar_parquet_importer_spark.operators import bpe

CORPUS = [
    "a a a b a b",
    "the cat the cat the dog",
    "a b a b",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )


def test_merge_seq_nonoverlap():
    assert bpe._merge_seq(["a", "a", "a"], "a", "a", "aa") == ["aa", "a"]
    assert bpe._merge_seq(["a", "a", "a", "a"], "a", "a", "aa") == ["aa", "aa"]
    assert bpe._merge_seq(["x"], "a", "a", "aa") == ["x"]


def test_python_replay_hand_checked():
    merges = bpe.bpe_learn_py(CORPUS, 3)
    # pair counts round 1: (a,b)x3 (doc1 has 'a b' twice? -> 'a a a b a b'
    # pairs: aa,aa,ab,ba,ab -> ab x2; doc3: ab,ba,ab -> ab x2 => ab x4;
    # (the,cat) x2; (a,a) x2; ties by count: ab wins with 4
    assert merges[0][:2] == ("a", "b")
    assert merges[0][2] == 4


def test_spark_matches_python(spark, docs):
    got, final = bpe.bpe_learn(docs, "text", 5)
    want = bpe.bpe_learn_py(CORPUS, 5)
    assert got == want
    # the tokenized corpus under the learned table matches apply_merges
    via_apply = sorted(
        tuple(r["syms"])
        for r in bpe.apply_merges(docs, "text", got).collect()
    )
    direct = sorted(tuple(r["syms"]) for r in final.collect())
    assert via_apply == direct


def test_early_stop_on_min_count(spark):
    df = spark.createDataFrame([(0, "x y"), (1, "p q")], ["doc_id", "text"])
    merges, _ = bpe.bpe_learn(df, "text", 10, min_count=2)
    assert merges == []  # every pair occurs once


def test_apply_merges_order_matters(spark):
    # rule 1 creates the symbol rule 2 consumes
    df = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    j = bpe.MERGE_JOIN
    out = bpe.apply_merges(
        df, "text", [("a", "b"), (f"a{j}b", "c")]
    ).collect()[0]["syms"]
    assert list(out) == [f"a{j}b{j}c"]


def test_token_length_stats(spark, docs):
    occ = bpe.token_occurrences(docs, "text", [])
    row = bpe.token_length_stats(occ).collect()[0]
    assert row["n_seqs"] == 3
    assert row["total_symbols"] == sum(len(t.split()) for t in CORPUS)
    assert row["distinct_symbols"] == len(
        {w for t in CORPUS for w in t.split()}
    )


def test_token_length_stats_empty_stream_is_zero(spark):
    """sum(when(...)) over an empty stream would be NULL; the replay
    oracle states literal 0 — count-based n_seqs keeps them equal."""
    df = spark.createDataFrame([], "doc_id long, text string")
    row = bpe.token_length_stats(
        bpe.token_occurrences(df, "text", [])
    ).collect()[0]
    assert (row["n_seqs"], row["total_symbols"], row["distinct_symbols"]) == (
        0, 0, 0,
    )
