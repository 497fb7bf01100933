"""Prefix-filtering set-similarity join (SSJoin/AllPairs/PPJoin family).

The load-bearing property is EXACTNESS: unlike the LSH families, the
prefix-filter join must return precisely the pairs with capped Jaccard
>= t. Every test here compares against a pure-Python reference that
recomputes shingle sets and exact ``Fraction`` Jaccards from scratch —
reference semantics, not a re-derivation through Spark.
"""

from __future__ import annotations

import re
from fractions import Fraction

import pytest

from neynar_parquet_importer_spark.operators import dedup as dd

SF_SMOKE = "/root/testdata/sf0.001"


def _ref_shingle_set(text: str, n: int = 3) -> set[str]:
    toks = re.split(r"\s+", text.strip().lower())
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _ref_pairs(
    docs: list[tuple[int, str]],
    threshold: Fraction,
    shingle_n: int = 3,
    max_df: int | None = None,
) -> dict[tuple[int, int], Fraction]:
    sets = {i: _ref_shingle_set(t, shingle_n) for i, t in docs}
    if max_df is not None:
        from collections import Counter

        df = Counter(s for ss in sets.values() for s in ss)
        hot = {s for s, c in df.items() if c > max_df}
        sets = {i: ss - hot for i, ss in sets.items()}
    out: dict[tuple[int, int], Fraction] = {}
    ids = sorted(sets)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and Fraction(inter, union) >= threshold:
                out[(a, b)] = Fraction(inter, union)
    return out


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
    (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (4, "entirely different words about spark shuffles and joins"),
    (5, "spark shuffles and joins dominate distributed query cost"),
    (6, "completely unrelated content talking about pasta recipes today"),
    (7, "short text"),
    (8, "short text"),  # exact dup of 7 (sub-shingle length)
    (9, "a b c d e f g h i j"),
    (10, "a b c d e f g h i x"),
]


def _spark_pairs(spark, docs, threshold, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = dd.prefix_filter_pairs(df, "text", "doc_id", threshold=threshold, **kw).collect()
    dd.release_cached()
    return {(r.id_a, r.id_b): r.jaccard for r in rows}


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8, 1.0])
def test_matches_python_reference(spark, threshold):
    got = _spark_pairs(spark, CORPUS, threshold)
    want = _ref_pairs(CORPUS, Fraction(threshold).limit_denominator(10**6))
    assert set(got) == set(want)
    for pair, jac in want.items():
        assert got[pair] == pytest.approx(round(float(jac), 6), abs=1e-9)


def test_exact_dups_and_boundary(spark):
    # exact dups at threshold 1.0 — including the sub-shingle-length pair
    got = _spark_pairs(spark, CORPUS, 1.0)
    assert (1, 3) in got and got[(1, 3)] == 1.0
    assert (7, 8) in got and got[(7, 8)] == 1.0
    # (9, 10): 8 shingles each, 7 common, union 9 -> 7/9 ~ 0.7778
    got = _spark_pairs(spark, CORPUS, 7 / 9)
    assert (9, 10) in got
    # strictly above 7/9 the pair must drop (exact predicate, no float slack)
    got = _spark_pairs(spark, CORPUS, 0.778)
    assert (9, 10) not in got


def test_df_cap_matches_reference(spark):
    # cap df at 2: the 'the quick brown fox...' boilerplate (docs 1,2,3)
    # loses its shared shingles, changing the surviving pair set
    got = _spark_pairs(spark, CORPUS, 0.5, max_shingle_df=2)
    want = _ref_pairs(CORPUS, Fraction(1, 2), max_df=2)
    assert set(got) == set(want)


def test_agrees_with_all_pairs_ground_truth_on_documents(spark):
    """Differential vs the independent jaccard_all_pairs implementation
    on the real sf0.001 documents corpus (same cap, same threshold).
    jaccard_all_pairs filters on the ROUNDED value; assert set equality
    modulo pairs sitting within 1e-6 of the threshold (none exist in
    this corpus, so in practice this is exact equality)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    t = 0.5
    pf = dd.prefix_filter_pairs(
        docs, "text", "doc_id", threshold=t, max_shingle_df=0.05
    ).collect()
    ap = dd.jaccard_all_pairs(
        docs, "text", "doc_id", threshold=t, max_shingle_df=0.05
    ).collect()
    dd.release_cached()
    pf_pairs = {(r.id_a, r.id_b): r.jaccard for r in pf}
    ap_pairs = {(r.id_a, r.id_b): r.jaccard for r in ap}
    boundary = {
        p
        for d_ in (pf_pairs, ap_pairs)
        for p, j in d_.items()
        if abs(j - t) < 1e-6
    }
    assert set(pf_pairs) - boundary == set(ap_pairs) - boundary
    for p in set(pf_pairs) & set(ap_pairs):
        assert pf_pairs[p] == pytest.approx(ap_pairs[p], abs=2e-6)
    assert pf_pairs, "corpus should contain at least one near-dup pair"


def test_stats_consistency(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    row = dd.prefix_filter_stats(df, "text", "doc_id", threshold=0.5).collect()[0]
    dd.release_cached()
    assert row.n_docs == len(CORPUS)
    assert 0 < row.n_prefix_rows <= row.n_set_rows
    assert row.n_verified <= row.n_candidates <= row.n_naive_pairs
    want = _ref_pairs(CORPUS, Fraction(1, 2))
    assert row.n_verified == len(want)


def test_candidates_have_no_false_negatives(spark):
    """The prefix-filter guarantee itself: every true pair appears in the
    candidate set BEFORE verification, at several thresholds."""
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    for t in (0.3, 0.6, 0.9):
        ranked = dd._prefix_ranked_sets(df, "text", "doc_id", 3, None)
        cand = {
            (r.id_a, r.id_b)
            for r in dd.prefix_filter_candidates(ranked, t).collect()
        }
        want = _ref_pairs(CORPUS, Fraction(t).limit_denominator(10**6))
        assert set(want) <= cand, f"missed true pairs at t={t}"


# --------------------------------------------------------------------------
# Asymmetric containment join
# --------------------------------------------------------------------------

def _ref_containment(
    docs: list[tuple[int, str]],
    threshold: Fraction,
    shingle_n: int = 3,
    max_df: int | None = None,
) -> dict[tuple[int, int], Fraction]:
    sets = {i: _ref_shingle_set(t, shingle_n) for i, t in docs}
    if max_df is not None:
        from collections import Counter

        df = Counter(s for ss in sets.values() for s in ss)
        hot = {s for s, c in df.items() if c > max_df}
        sets = {i: ss - hot for i, ss in sets.items()}
    out: dict[tuple[int, int], Fraction] = {}
    for a, sa in sets.items():
        if not sa:
            continue
        for b, sb in sets.items():
            if a == b:
                continue
            c = Fraction(len(sa & sb), len(sa))
            if c >= threshold:
                out[(a, b)] = c
    return out


CONTAIN_CORPUS = CORPUS + [
    # doc 11's shingles are a strict subset of doc 12's (quote inside a
    # larger container) — symmetric Jaccard misses it, containment must not
    (11, "alpha beta gamma delta epsilon"),
    (12, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lamda mu nu xi omicron pi rho sigma tau upsilon"),
]


def _spark_containment(spark, docs, threshold, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = dd.containment_pairs(
        df, "text", "doc_id", threshold=threshold, **kw
    ).collect()
    dd.release_cached()
    return {(r.id_contained, r.id_container): r.containment for r in rows}


@pytest.mark.parametrize("threshold", [0.5, 0.9, 1.0])
def test_containment_matches_python_reference(spark, threshold):
    got = _spark_containment(spark, CONTAIN_CORPUS, threshold)
    want = _ref_containment(
        CONTAIN_CORPUS, Fraction(threshold).limit_denominator(10**6)
    )
    assert set(got) == set(want)
    for pair, c in want.items():
        assert got[pair] == pytest.approx(round(float(c), 6), abs=1e-9)


def test_containment_finds_subset_jaccard_misses(spark):
    got = _spark_containment(spark, CONTAIN_CORPUS, 1.0)
    assert (11, 12) in got and got[(11, 12)] == 1.0
    assert (12, 11) not in got  # asymmetric: the container isn't contained
    jac = _spark_pairs(spark, CONTAIN_CORPUS, 0.5)
    assert (11, 12) not in jac  # symmetric Jaccard 3/18 = 0.17 misses it


def test_containment_df_cap(spark):
    got = _spark_containment(spark, CONTAIN_CORPUS, 0.9, max_shingle_df=2)
    want = _ref_containment(CONTAIN_CORPUS, Fraction(9, 10), max_df=2)
    assert set(got) == set(want)
