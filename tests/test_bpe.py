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


def test_learn_stable_converges_on_zipfian_and_flags_noise(spark):
    """Sequential-doubling sample validation (round-8
    sample-sufficiency fix): a skewed corpus whose top pairs carry real
    margins converges at a small nested sample (and the returned table
    matches full-corpus training); a near-uniform corpus whose ranking
    is counting noise must come back converged=False at the cap
    instead of pretending a bounded sample resolved it."""
    import random

    from neynar_parquet_importer_spark.operators.bpe import (
        bpe_learn,
        bpe_learn_stable,
    )
    from neynar_parquet_importer_spark.operators.dedup import _release_ckpt

    rng = random.Random(9)
    # Zipf-ish: 'a b' dominates, then 'b c', wide margins
    zipf_rows = []
    for i in range(800):
        words = []
        for _ in range(20):
            r = rng.random()
            words.append("a b" if r < 0.5 else ("b c" if r < 0.8 else
                         rng.choice("defgh")))
        zipf_rows.append((i, " ".join(words)))
    z = spark.createDataFrame(zipf_rows, ["doc_id", "text"])
    res = bpe_learn_stable(z, "doc_id", "text", n_merges=3, start=64,
                           max_docs=512)
    assert res["converged"] is True
    assert res["agreed_with"] == res["sample_docs"] // 2
    full, fin = bpe_learn(z, "text", 3)
    _release_ckpt(fin)
    assert [(a, b) for a, b, _ in res["merges"]] == [
        (a, b) for a, b, _ in full
    ]

    # near-uniform noise: every pair count within sqrt-noise of every
    # other, ranking unresolvable from a prefix sample
    noise_rows = [
        (i, " ".join(rng.choice("pqrstuvwxyz") for _ in range(30)))
        for i in range(800)
    ]
    nz = spark.createDataFrame(noise_rows, ["doc_id", "text"])
    res2 = bpe_learn_stable(nz, "doc_id", "text", n_merges=6, start=32,
                            max_docs=128)
    assert res2["converged"] is False
    assert res2["sample_docs"] == 128
    assert res2["covered_corpus"] is False
    assert res["covered_corpus"] is False  # zipfian converged at 128<800


def test_bpe_learn_stable_short_circuits_on_full_coverage(spark):
    """A corpus with <= start docs trains ONCE: the doubled sample would
    be the identical full corpus, so the old loop burned a second
    distributed pass and reported a vacuous converged/agreed_with
    (round-8 advisor). Full-corpus training is exact — converged=True,
    covered_corpus=True, agreed_with=None (no smaller sample agreed)."""
    from neynar_parquet_importer_spark.operators.bpe import (
        bpe_learn,
        bpe_learn_stable,
    )
    from neynar_parquet_importer_spark.operators.dedup import _release_ckpt

    rows = [(i, "a b a b c") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    res = bpe_learn_stable(df, "doc_id", "text", n_merges=2, start=64,
                           max_docs=512)
    assert res["converged"] is True
    assert res["covered_corpus"] is True
    assert res["agreed_with"] is None
    assert res["sample_docs"] == 10  # the real row count, not the cap
    full, fin = bpe_learn(df, "text", 2)
    _release_ckpt(fin)
    assert [(a, b) for a, b, _ in res["merges"]] == [
        (a, b) for a, b, _ in full
    ]
