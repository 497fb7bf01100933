"""PassJoin exact edit-distance join: brute-force differential tests.

The operator claims ZERO false negatives from segment filtering
(pigeonhole over tau+1 segments) and exact verified distances. These
tests compare the full output set against a quadratic python reference
on adversarial corpora: random typo'd strings, length-straddling edits
(insert/delete across segment boundaries), degenerate short strings,
duplicates, and blocked variants.
"""

from __future__ import annotations

import random

import pytest

from neynar_parquet_importer_spark.operators import linkage as lk


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _ref_pairs(lefts, rights, tau):
    return {
        (li, ri, _lev(lt, rt))
        for li, lt in lefts
        for ri, rt in rights
        if _lev(lt, rt) <= tau
    }


def _spark_pairs(spark, lefts, rights, tau, blocks=None):
    ldf = spark.createDataFrame(lefts, "lid long, ltxt string")
    rdf = spark.createDataFrame(rights, "rid long, rtxt string")
    out = lk.passjoin_pairs(
        ldf, rdf, "lid", "rid", "ltxt", "rtxt", tau, block_cols=blocks
    )
    return {(r.lid, r.rid, r.distance) for r in out.collect()}


def _typo(rng, s):
    ops = rng.choice(["sub", "ins", "del", "none"])
    if not s or ops == "none":
        return s
    i = rng.randrange(len(s))
    c = rng.choice("abcde0123")
    if ops == "sub":
        return s[:i] + c + s[i + 1 :]
    if ops == "ins":
        return s[:i] + c + s[i:]
    return s[:i] + s[i + 1 :]


@pytest.mark.parametrize("tau", [1, 2, 3])
def test_passjoin_matches_bruteforce_random(spark, tau):
    rng = random.Random(tau * 101)
    vocab = "abcdef012345"
    rights = [
        (i, "".join(rng.choice(vocab) for _ in range(rng.randint(4, 14))))
        for i in range(40)
    ]
    lefts = []
    for j in range(60):
        base = rights[rng.randrange(len(rights))][1]
        t = base
        for _ in range(rng.randint(0, tau + 1)):  # sometimes beyond tau
            t = _typo(rng, t)
        lefts.append((1000 + j, t))
    got = _spark_pairs(spark, lefts, rights, tau)
    want = _ref_pairs(lefts, rights, tau)
    assert got == want


def test_passjoin_degenerate_short_strings(spark):
    """Right strings shorter than tau+1 chars go through the length-only
    leg; empty and single-char strings must not crash or miss."""
    lefts = [(1, ""), (2, "a"), (3, "ab"), (4, "abcd"), (5, "zzzz")]
    rights = [(10, ""), (11, "b"), (12, "ab"), (13, "abc")]
    for tau in (1, 2):
        got = _spark_pairs(spark, lefts, rights, tau)
        want = _ref_pairs(lefts, rights, tau)
        assert got == want, tau


def test_passjoin_boundary_straddling_edits(spark):
    """Edits placed exactly on segment boundaries — the positions where
    a buggy partition scheme loses the untouched-segment guarantee."""
    base = "abcdefghij"  # len 10, tau=2 -> segments 3/3/4 (scheme-defined)
    lefts, rights = [], [(0, base)]
    variants = [
        base[:3] + "X" + base[4:],          # hit segment 0/1 boundary char
        base[:6] + "X" + base[7:],          # hit segment 1/2 boundary char
        base[:3] + base[4:],                # delete at boundary (len 9)
        base[:6] + "XY" + base[6:],         # double insert mid-string
        "X" + base[1:9] + "Y",              # first and last char
        base[:2] + "XX" + base[4:],         # two subs inside one segment
    ]
    lefts = list(enumerate(variants, start=100))
    got = _spark_pairs(spark, lefts, rights, 2)
    want = _ref_pairs(lefts, rights, 2)
    assert got == want


def test_passjoin_blocked_restricts_to_block(spark):
    ldf = spark.createDataFrame(
        [(1, "abc", 7), (2, "abc", 8)], "lid long, ltxt string, blk int"
    )
    rdf = spark.createDataFrame(
        [(10, "abd", 7), (11, "abc", 9)], "rid long, rtxt string, blk int"
    )
    out = lk.passjoin_pairs(
        ldf, rdf, "lid", "rid", "ltxt", "rtxt", 1, block_cols=["blk"]
    )
    assert {(r.lid, r.rid, r.distance) for r in out.collect()} == {(1, 10, 1)}


def test_passjoin_equals_blocked_pairs_on_linkage_corpus(spark):
    """Algorithm-level differential on the real linkage workload at
    sf0.001: the segment-filtered join must emit the IDENTICAL pair set
    as the block cross-product + banded Levenshtein."""
    from neynar_parquet_importer_spark.plans import queries as Q

    sf = "/root/testdata/sf0.001"
    clean = Q._t(spark, sf, "customer").selectExpr(
        "c_custkey", "c_nationkey", "substr(c_name, 10) AS c_suffix"
    )
    dirty = Q._dirty_customers(spark, sf).selectExpr(
        "d_key", "c_nationkey", "substr(d_name, 10) AS d_suffix"
    )
    via_block = {
        (r.d_key, r.c_custkey, r.distance)
        for r in lk.blocked_pairs(
            dirty, clean, ["c_nationkey"], "d_key", "c_custkey",
            "d_suffix", "c_suffix", 2,
        ).collect()
    }
    via_pass = {
        (r.d_key, r.c_custkey, r.distance)
        for r in lk.passjoin_pairs(
            dirty, clean, "d_key", "c_custkey", "d_suffix", "c_suffix", 2,
            block_cols=["c_nationkey"],
        ).collect()
    }
    assert via_pass == via_block and len(via_pass) > 0


def test_segment_closed_form_matches_reference():
    """The operator computes segment (start, length) with closed-form
    Column arithmetic (base*i + max(i - long_from, 0), base + [i >=
    long_from]); pin it against the readable python partition scheme
    for every (length, k) the joins can produce."""
    for k in (2, 3, 4):
        for n in range(k, 40):
            base, rem = divmod(n, k)
            long_from = k - rem
            got = [
                (
                    base * i + max(i - long_from, 0),
                    base + (1 if i >= long_from else 0),
                )
                for i in range(k)
            ]
            assert got == lk._segment_bounds(n, k), (n, k)
