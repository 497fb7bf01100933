"""Measured dispatch between blocked_pairs and passjoin_pairs
(linkage.auto_pairs / decide_pairs_strategy) — r6 verdict task #4.

The two regimes from the module doc's measured crossover:

- LOW-ENTROPY keys + selective blocking (zero-padded digit suffixes,
  nation-style blocks): PassJoin segments collide corpus-wide, its
  candidate estimate approaches the block cross-product, and the plain
  block join wins.
- HIGH-ENTROPY keys, no usable blocking key (random text prefixes):
  the blocked "budget" is the full cross-product while segment
  candidates track true near-matches — PassJoin wins.

Both choices are pinned on the executed plan, and auto_pairs' output is
set-equal to both underlying operators (they are exact joins, so the
dispatch can never change results — only cost)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators import linkage as lk


def _low_entropy(spark, n=400, n_blocks=4, seed=5):
    """Zero-padded numeric suffixes in a few blocks; dirty side = one
    substituted digit."""
    rng = random.Random(seed)
    clean, dirty = [], []
    for i in range(n):
        name = f"{i:09d}"
        blk = i % n_blocks
        clean.append((i, blk, name))
        d = list(name)
        pos = rng.randrange(9)
        d[pos] = str((int(d[pos]) + 1 + rng.randrange(8)) % 10)
        dirty.append((i, blk, "".join(d)))
    c = spark.createDataFrame(clean, "cid long, blk int, cname string")
    d = spark.createDataFrame(dirty, "did long, blk int, dname string")
    return d, c


def _high_entropy(spark, n=400, seed=11):
    """Random 24-char alphanumeric keys, no blocking key; dirty side =
    one substituted char."""
    rng = random.Random(seed)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    clean, dirty = [], []
    for i in range(n):
        s = "".join(rng.choice(alpha) for _ in range(24))
        clean.append((i, s))
        d = list(s)
        d[rng.randrange(24)] = rng.choice(alpha)
        dirty.append((i, "".join(d)))
    c = spark.createDataFrame(clean, "cid long, cname string")
    d = spark.createDataFrame(dirty, "did long, dname string")
    return d, c


def test_low_entropy_blocked_wins_and_plan_pinned(spark):
    d, c = _low_entropy(spark)
    decision: dict = {}
    out = lk.auto_pairs(
        d, c, ["blk"], "did", "cid", "dname", "cname", 2,
        sample_target=200, decision_out=decision,
    )
    assert decision["strategy"] == "blocked"
    # segments of zero-padded digits collide corpus-wide: the sampled
    # estimate must be within 2x-overhead reach of the block budget
    assert (
        decision["passjoin_est_candidates"] * decision["passjoin_overhead"]
        >= decision["blocked_budget"]
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_piece" not in plan          # no segment machinery
    assert "levenshtein" in plan.lower()
    # exactness: dispatch never changes results
    ref = lk.blocked_pairs(d, c, ["blk"], "did", "cid", "dname", "cname", 2)
    assert {tuple(r) for r in out.collect()} == {
        tuple(r) for r in ref.collect()
    }


def test_high_entropy_passjoin_wins_and_plan_pinned(spark):
    d, c = _high_entropy(spark)
    decision: dict = {}
    out = lk.auto_pairs(
        d, c, [], "did", "cid", "dname", "cname", 2,
        sample_target=200, decision_out=decision,
    )
    assert decision["strategy"] == "passjoin"
    assert decision["blocked_budget"] == 400 * 400  # no blocks: n*n
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_piece" in plan              # segment equi-join ran
    # the candidate join is a hash/merge equi-join keyed on the piece;
    # the only nested-loop allowed is the degenerate short-string leg
    # (bounded by the count of near-empty strings — zero here)
    piece_join_lines = [
        ln for ln in plan.splitlines()
        if "_piece" in ln and "Join" in ln
    ]
    assert piece_join_lines
    assert all(
        "BroadcastHashJoin" in ln or "SortMergeJoin" in ln
        or "ShuffledHashJoin" in ln
        for ln in piece_join_lines
    )
    ref = lk.passjoin_pairs(d, c, "did", "cid", "dname", "cname", 2)
    assert {tuple(r) for r in out.collect()} == {
        tuple(r) for r in ref.collect()
    }


def test_blocked_budget_respects_max_block(spark):
    d, c = _low_entropy(spark, n=400, n_blocks=4)
    full = lk.blocked_pair_budget(d, c, ["blk"])
    assert full == 4 * 100 * 100
    capped = lk.blocked_pair_budget(d, c, ["blk"], max_block=50)
    assert capped == 0  # every left block has 100 rows > 50 -> dropped


def test_estimator_is_scale_consistent(spark):
    """The sampled estimate must be the exact candidate count when the
    sample IS the corpus (denominators 1)."""
    d, c = _high_entropy(spark, n=300)
    decision = lk.decide_pairs_strategy(
        d, c, [], "did", "cid", "dname", "cname", 2, sample_target=300
    )
    assert decision["sample_denominators"] == [1, 1]
    l = d.select(
        F.col("did").alias("_lid"),
        F.col("dname").alias("_ltxt"),
        F.length("dname").alias("_llen"),
    )
    r = c.select(
        F.col("cid").alias("_rid"),
        F.col("cname").alias("_rtxt"),
        F.length("cname").alias("_rlen"),
    )
    exact = lk._passjoin_candidates(l, r, 2, []).count()
    assert decision["passjoin_est_candidates"] == exact


def test_estimator_unbiased_on_presliced_corpus(spark):
    """Regression (round 7): the dispatch sampler must stay unbiased
    when the INPUT was itself selected by an unsalted xxhash64 slice —
    before the sampler hash was salted, pmod(xxhash64(id), d) composed
    with an outer pmod(xxhash64(id), k) slice was correlated
    (P(h%d==0 | h%k==0) = k/d, not 1/d) and a sliced estimate came out
    25x high. With the salt, the estimate on a 1/3 slice must land
    within a small factor of the slice's exact candidate count."""
    d, c = _high_entropy(spark, n=900, seed=23)
    d_sl = d.filter(F.pmod(F.xxhash64("did"), F.lit(3)) == 0)
    c_sl = c.filter(F.pmod(F.xxhash64("cid"), F.lit(3)) == 0)
    n_dsl, n_csl = d_sl.count(), c_sl.count()
    decision = lk.decide_pairs_strategy(
        d_sl, c_sl, [], "did", "cid", "dname", "cname", 2,
        sample_target=max(n_dsl, n_csl) // 3,
    )
    l = d_sl.select(
        F.col("did").alias("_lid"),
        F.col("dname").alias("_ltxt"),
        F.length("dname").alias("_llen"),
    )
    r = c_sl.select(
        F.col("cid").alias("_rid"),
        F.col("cname").alias("_rtxt"),
        F.length("cname").alias("_rlen"),
    )
    exact = lk._passjoin_candidates(l, r, 2, []).count()
    est = decision["passjoin_est_candidates"]
    # a 3x3 sub-sample of ~100 true matches is noisy, but nowhere near
    # the 9x systematic inflation the correlated hash produced
    assert est <= exact * 4, (est, exact)
    assert est >= exact / 4, (est, exact)


def test_max_block_parity_across_strategies(spark):
    """With max_block set, the passjoin branch must apply the SAME
    over-cap block drop blocked_pairs applies — the dispatch can change
    cost, never answers. Forced check: run BOTH underlying operators
    with the cap semantics and compare to auto_pairs on a corpus with
    one over-cap block, regardless of which side the dispatch picks."""
    d, c = _low_entropy(spark, n=200, n_blocks=4)
    # make block 0 over-cap on the left (dirty) side
    extra = spark.createDataFrame(
        [(10_000 + i, 0, f"{i:09d}") for i in range(120)],
        "did long, blk int, dname string",
    )
    d_all = d.unionByName(extra)
    cap = 100
    args = dict(
        block_cols=["blk"], left_id="did", right_id="cid",
        left_text="dname", right_text="cname", max_distance=2,
    )
    want = sorted(
        map(tuple, lk.blocked_pairs(d_all, c, max_block=cap, **args).collect())
    )
    got_auto = sorted(
        map(tuple, lk.auto_pairs(d_all, c, max_block=cap, **args).collect())
    )
    assert got_auto == want
    # and the passjoin side itself, under the same pre-drop, agrees
    sizes = (
        d_all.groupBy("blk").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= cap).drop("n")
    )
    d_capped = d_all.join(sizes, "blk", "left_semi")
    got_pj = sorted(
        map(
            tuple,
            lk.passjoin_pairs(
                d_capped, c, "did", "cid", "dname", "cname", 2,
                block_cols=["blk"],
            ).collect(),
        )
    )
    assert got_pj == want


def test_candidate_ceiling_rejects_infeasible_passjoin(spark):
    """The memory-ceiling term (r7 verdict #3): on the high-entropy
    corpus PassJoin wins on cost, but an explicit ceiling below its
    candidate estimate must flip the dispatch to blocked — feasibility
    overrides projected speed — and the statistics must say why."""
    d, c = _high_entropy(spark)
    free = lk.decide_pairs_strategy(
        d, c, [], "did", "cid", "dname", "cname", 2, sample_target=200,
    )
    assert free["strategy"] == "passjoin"
    assert free["passjoin_feasible"] is True
    assert free["candidate_ceiling"] >= 1_000_000  # heap-derived default
    capped: dict = {}
    out = lk.auto_pairs(
        d, c, [], "did", "cid", "dname", "cname", 2,
        sample_target=200,
        candidate_ceiling=max(1, int(free["passjoin_est_candidates"]) - 1),
        decision_out=capped,
    )
    assert capped["strategy"] == "blocked"
    assert capped["passjoin_feasible"] is False
    # the dispatch-never-changes-answers contract holds across the flip
    ref = lk.passjoin_pairs(d, c, "did", "cid", "dname", "cname", 2)
    assert {tuple(r) for r in out.collect()} == {
        tuple(r) for r in ref.collect()
    }


def test_default_ceiling_tracks_jvm_heap(spark):
    heap = int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory())
    assert lk.passjoin_candidate_ceiling(spark) == max(1_000_000, heap // 128)


def test_ceiling_conf_path_by_master(spark):
    """local-cluster[...] forks separate executor JVMs, so an explicit
    spark.executor.memory must win there — the old startswith("local")
    fallback wrongly read the DRIVER heap for it (round-8 advisor).
    Pure local[N] with the conf set still uses the live JVM heap
    (driver == executor there, the conf is advisory)."""
    heap = int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory())

    class _Conf:
        def get(self, key, default=None):
            return "4g" if key == "spark.executor.memory" else default

    class _Stub:
        conf = _Conf()

        def __init__(self, master, jvm):
            class _SC:
                pass

            self.sparkContext = _SC()
            self.sparkContext.master = master
            self._jvm = jvm

    # local-cluster: conf path — 4g // 128 candidates, not driver heap
    assert lk.passjoin_candidate_ceiling(
        _Stub("local-cluster[2,1,1024]", None)
    ) == max(1_000_000, (4 * 1024**3) // 128)
    # real cluster master: conf path too
    assert lk.passjoin_candidate_ceiling(
        _Stub("spark://host:7077", None)
    ) == max(1_000_000, (4 * 1024**3) // 128)
    # pure local with conf set: live JVM heap still wins
    assert lk.passjoin_candidate_ceiling(
        _Stub("local[32]", spark._jvm)
    ) == max(1_000_000, heap // 128)
    assert lk.passjoin_candidate_ceiling(
        _Stub("local", spark._jvm)
    ) == max(1_000_000, heap // 128)


# ---------------------------------------------------------------------------
# round-10: the fine-key third arm
# ---------------------------------------------------------------------------

_FK = [
    ("substr(dname, 1, 5)", "substr(cname, 1, 5)"),
    ("substr(dname, 6, 4)", "substr(cname, 6, 4)"),
]


def test_fine_arm_wins_low_entropy_and_is_lossless_for_its_family(spark):
    """On the zero-padded corpus the fine keys (first-5 / last-4 by
    position) shrink blocks massively, so the three-way dispatch must
    pick fine_block — and because the perturbation is a single
    substitution (position <= 5 preserves the tail key, position >= 6
    preserves the head key), every true pair must survive: the declared
    completeness contract, checked."""
    d, c = _low_entropy(spark)
    decision: dict = {}
    out = lk.auto_pairs(
        d, c, ["blk"], "did", "cid", "dname", "cname", 2,
        sample_target=200, decision_out=decision, fine_keys=_FK,
    )
    assert decision["strategy"] == "fine_block"
    assert decision["fine_budget"] * decision["fine_overhead"] < (
        decision["blocked_budget"]
    )
    got = {tuple(r) for r in out.collect()}
    blocked = {
        tuple(r)
        for r in lk.blocked_pairs(
            d, c, ["blk"], "did", "cid", "dname", "cname", 2
        ).collect()
    }
    # fine-key pairs are exactly the blocked pairs whose texts agree on
    # at least one declared key — a subset, never new pairs
    assert got <= blocked
    # lossless for the corpus's single-substitution family
    true_pairs = {(i, i) for i in range(400)}
    assert true_pairs <= {(a, b) for a, b, _ in got}
    # operator == dispatch arm
    ref = {
        tuple(r)
        for r in lk.fine_blocked_pairs(
            d, c, ["blk"], "did", "cid", "dname", "cname", 2, _FK
        ).collect()
    }
    assert got == ref


def test_two_way_behavior_unchanged_without_fine_keys(spark):
    """fine_keys undeclared -> the decision dict has no fine fields and
    the strategy follows the original two-way rule bit-exactly."""
    d, c = _low_entropy(spark)
    decision = lk.decide_pairs_strategy(
        d, c, ["blk"], "did", "cid", "dname", "cname", 2,
        sample_target=200,
    )
    assert "fine_budget" not in decision
    old_rule = (
        "passjoin"
        if decision["passjoin_feasible"]
        and decision["passjoin_est_candidates"]
        * decision["passjoin_overhead"]
        < decision["blocked_budget"]
        else "blocked"
    )
    assert decision["strategy"] == old_rule


def test_three_way_oracle_assumption_passjoin_out_of_contention(spark):
    """The linkage_dispatch_3way oracle twin re-derives the argmin from
    the two SQL-exact budgets only; that is valid iff the PassJoin arm
    can never undercut both on this corpus family. Pinned here on the
    same low-entropy shape: the weighted PassJoin cost must exceed the
    winning arm's cost."""
    d, c = _low_entropy(spark)
    decision = lk.decide_pairs_strategy(
        d, c, ["blk"], "did", "cid", "dname", "cname", 2,
        sample_target=200, fine_keys=_FK,
    )
    winning = min(
        decision["blocked_budget"],
        decision["fine_budget"] * decision["fine_overhead"],
    )
    assert (
        decision["passjoin_est_candidates"] * decision["passjoin_overhead"]
        > winning
    )
    # and the engine argmin equals the twin's two-arm CASE expression
    sql_arm = (
        "fine_block"
        if 3 * decision["fine_budget"] < 2 * decision["blocked_budget"]
        else "blocked"
    )
    assert decision["strategy"] == sql_arm


def test_fine_arm_max_block_parity(spark):
    """The coarse max_block drop applies identically in the fine arm,
    so dispatch + cap can never change which left rows participate."""
    d, c = _low_entropy(spark, n=400, n_blocks=4)
    cap = 60  # every 100-row block dropped -> empty everywhere
    fine = lk.fine_blocked_pairs(
        d, c, ["blk"], "did", "cid", "dname", "cname", 2, _FK,
        max_block=cap,
    )
    blocked = lk.blocked_pairs(
        d, c, ["blk"], "did", "cid", "dname", "cname", 2, max_block=cap,
    )
    assert fine.count() == 0 and blocked.count() == 0
