"""Fuzzy record linkage: blocked edit-distance joins and best-match
resolution.

A dedup pipeline over entity tables (the reference's users/profiles
model) eventually needs APPROXIMATE key matching — the same customer
arriving with a typo'd name from a second source. The scalable form is
the classic two-stage shape shared with this repo's MinHash/LSH
modules: a cheap equi-join on a BLOCKING key bounds the candidate set,
then the expensive string metric (Levenshtein) runs only inside
blocks.

Levenshtein is unit-cost edit distance in both Spark
(``F.levenshtein``) and DuckDB (``levenshtein``), so the whole
operator replays as static ANSI-ish SQL — the engine-portability
discipline the md5 MinHash family established.

At scale:

- block sizes are the entire cost model: candidate pairs are
  sum(|block_L| * |block_R|). ``blocked_pairs`` takes ``max_block`` and
  DROPS oversized blocks (df-cap discipline, same rationale as
  ``dedup.py``'s hot-shingle cap: a block that big means the blocking
  key is underspecified, and the fix is a finer key — e.g. q-gram LSH,
  which ``dedup.ngram_lsh_*`` already provides for long text — not a
  quadratic join);
- a length pre-filter (``abs(len_l - len_r) <= max_distance``) is
  pushed inside the block join: length difference is a lower bound on
  edit distance, so it discards most of the block cross-product before
  any Levenshtein is evaluated;
- best-match resolution is one row_number window per dirty record —
  partitioned by the dirty key, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .parallelism import fan_out


def blocked_pairs(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    max_distance: int,
    max_block: int | None = None,
) -> DataFrame:
    """(left_id, right_id, distance) for all within-block pairs at
    Levenshtein distance <= ``max_distance``.

    ``max_block`` drops blocks whose LEFT-side size exceeds the cap
    (logged into the plan as a filter, not silently: callers see the
    dropped mass via ``block_profile``). With NO blocking key the whole
    corpus is one block — the join degrades to the full length-banded
    cross-product (the shape auto_pairs' ceiling term can pick when
    PassJoin's candidate set would not fit in memory), and ``max_block``
    caps that single global block."""
    # the join below typically broadcasts the right side, so the LEFT
    # frame's partitioning IS the stage parallelism of the quadratic
    # block scan — and a dimension-sized parquet input is one split
    # (fan_out module doc). Measured at sf0.1: the whole 9M-pair banded
    # Levenshtein ran in ONE task before this.
    l = fan_out(
        left.select(
            *block_cols,
            F.col(left_id).alias("_lid"),
            F.col(left_text).alias("_ltxt"),
        )
    )
    if max_block is not None:
        if block_cols:
            sizes = (
                l.groupBy(*block_cols)
                .agg(F.count(F.lit(1)).alias("_bn"))
                .filter(F.col("_bn") <= max_block)
                .drop("_bn")
            )
            l = l.join(F.broadcast(sizes), block_cols, "left_semi")
        else:
            # one global block: the cap is the same semi-join shape with
            # no key — a broadcast 1-row count frame, evaluated LAZILY at
            # execution like the grouped path (an eager l.count() here
            # froze the decision at build time — round-8 review finding)
            total = l.agg(F.count(F.lit(1)).alias("_bn")).filter(
                F.col("_bn") <= max_block
            )
            l = l.crossJoin(F.broadcast(total)).drop("_bn")
    r = right.select(
        *block_cols,
        F.col(right_id).alias("_rid"),
        F.col(right_text).alias("_rtxt"),
    )
    j = (l.join(r, block_cols) if block_cols else l.crossJoin(r)).filter(
        F.abs(F.length("_ltxt") - F.length("_rtxt")) <= max_distance
    )
    # threshold-banded Levenshtein: the DP short-circuits to -1 once the
    # distance provably exceeds max_distance — O(d*n) per pair instead
    # of O(n^2) (measured ~2x on 9M 18-char pairs). Kept distances are
    # exact, so external semantics are unchanged.
    return (
        j.withColumn(
            "distance", F.levenshtein("_ltxt", "_rtxt", max_distance)
        )
        .filter(F.col("distance") >= 0)
        .select(
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            F.col("distance").cast("int").alias("distance"),
        )
    )


def best_match(
    pairs: DataFrame, left_id: str, right_id: str
) -> DataFrame:
    """One row per left id: the minimum-distance match, ties broken by
    smallest right id (deterministic)."""
    w = Window.partitionBy(left_id).orderBy("distance", right_id)
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def block_profile(
    df: DataFrame, block_cols: list[str], max_block: int | None = None
) -> DataFrame:
    """Audit of the blocking key: per-block sizes plus whether the block
    would be dropped by the cap — run this BEFORE a linkage job to see
    the candidate-pair budget and the dropped mass."""
    out = df.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("block_n"))
    dropped = (
        F.lit(False)
        if max_block is None
        else (F.col("block_n") > max_block)
    )
    return out.select(
        *block_cols,
        F.col("block_n").cast("bigint").alias("block_n"),
        (F.col("block_n") * F.col("block_n")).cast("bigint").alias(
            "pair_budget"
        ),
        dropped.alias("dropped"),
    )


# ---------------------------------------------------------------------------
# PassJoin: exact edit-distance join via segment filtering
# ---------------------------------------------------------------------------

def _segment_bounds(n: int, k: int) -> list[tuple[int, int]]:
    """Deterministic even partition of a length-``n`` string into ``k``
    segments: the first ``k - n % k`` get ``n // k`` chars, the rest one
    more — (start, length) pairs, 0-based. Probe-side substring
    generation MUST use the identical scheme (it re-derives the index
    side's boundaries from the candidate length alone)."""
    base, rem = divmod(n, k)
    out, start = [], 0
    for i in range(k):
        ln = base + (1 if i >= k - rem else 0)
        out.append((start, ln))
        start += ln
    return out


def passjoin_pairs(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    max_distance: int,
    block_cols: list[str] | None = None,
) -> DataFrame:
    """EXACT (left_id, right_id, distance) pairs at Levenshtein distance
    <= ``max_distance`` — PassJoin segment filtering (Li, Deng, Feng,
    VLDB'12 family), the edit-distance analog of ``dedup.py``'s
    prefix-filter Jaccard join: a zero-false-negative candidate
    equi-join replaces the block cross-product, and the quadratic
    metric runs only on candidates.

    The pigeonhole: partition each RIGHT string s into ``tau + 1``
    segments. Any r with ``lev(r, s) <= tau`` aligns to s with at most
    tau edits, so at least ONE segment is untouched — it occurs in r
    VERBATIM, at a start position shifted by at most tau (the net
    insertions/deletions before it). So the index side emits tau+1
    (seg_idx, seg_string) rows per record, the probe side emits, for
    each candidate right length n in [len(r)-tau, len(r)+tau] and each
    segment of that length's partition scheme, the <= 2*tau+1 substrings
    of r in the shifted window — and candidates are an EQUI-join on
    (n, seg_idx, substring [, block]). Probe fan-out is bounded by
    (2*tau+1) lengths x (tau+1) segments x (2*tau+1) shifts = 75 rows
    per record at tau=2 BEFORE the window-validity filter and distinct
    (which cut overlapping/out-of-range windows) — constant either way,
    vs the |block| comparisons per record of the block cross-product;
    candidate volume is driven by true near-matches, not by block
    sizes. Kept pairs are verified with the threshold-banded
    ``F.levenshtein`` — exact distances, identical external semantics
    to ``blocked_pairs`` (tests pin set-equality; the DuckDB oracle is
    the independent all-pairs twin).

    SEGMENT-ENTROPY REGIME (measured): the filter's power is segment
    selectivity. On high-entropy keys (document text prefixes) the
    tau+1 segments are near-unique and this join runs a 5k x 5k corpus
    UNBLOCKED in ~2 s at sf0.1 where the cross-product pays 25M banded
    Levenshteins. On low-entropy zero-padded keys (customer names,
    where segment "000" collides corpus-wide) candidates approach the
    block cross-product and the extra join machinery makes it ~2x
    SLOWER than ``blocked_pairs`` (13 s vs 7 s at sf0.1) — the same
    regime boundary as the prefix-filter Jaccard join at low
    thresholds. Prefer ``blocked_pairs`` when a selective blocking key
    exists and the keys are low-entropy; prefer this join on text keys
    or when no blocking key is available.

    Degenerate-length leg: a right string shorter than tau+1 chars
    cannot host tau+1 non-empty segments (the pigeonhole needs tau+1
    pigeons); those few records join by the length filter alone
    (lev <= tau forces len(r) <= len(s) + tau <= 2*tau, so both sides
    are tiny strings and the leg's pair population is bounded by the
    count of near-empty strings, not by corpus size).

    ``block_cols``: optional exact blocking keys AND-ed into every
    candidate join (the segment filter then prunes WITHIN blocks).
    """
    if max_distance < 1:
        raise ValueError(f"max_distance must be >= 1, got {max_distance}")
    tau = max_distance
    blocks = list(block_cols or [])

    l = left.select(
        *blocks,
        F.col(left_id).alias("_lid"),
        F.col(left_text).alias("_ltxt"),
        F.length(left_text).alias("_llen"),
    )
    r = right.select(
        *blocks,
        F.col(right_id).alias("_rid"),
        F.col(right_text).alias("_rtxt"),
        F.length(right_text).alias("_rlen"),
    )
    cand = _passjoin_candidates(l, r, tau, blocks)

    # ---- exact verification on candidates ------------------------------
    verified = (
        cand.join(l.select(*blocks, "_lid", "_ltxt"), [*blocks, "_lid"])
        .join(r.select(*blocks, "_rid", "_rtxt"), [*blocks, "_rid"])
        .withColumn("distance", F.levenshtein("_ltxt", "_rtxt", tau))
        .filter(F.col("distance") >= 0)
    )
    return verified.select(
        F.col("_lid").alias(left_id),
        F.col("_rid").alias(right_id),
        F.col("distance").cast("int").alias("distance"),
    ).dropDuplicates([left_id, right_id])


def _passjoin_candidates(
    l: DataFrame, r: DataFrame, tau: int, blocks: list[str]
) -> DataFrame:
    """PassJoin candidate generation over pre-projected frames
    (``l``: blocks + _lid/_ltxt/_llen, ``r``: blocks + _rid/_rtxt/_rlen)
    — distinct (blocks, _lid, _rid) candidates. Factored out so the
    dispatch estimator (:func:`decide_pairs_strategy`) can count
    candidates on hash samples through the IDENTICAL plan the real join
    runs."""
    k = tau + 1
    # both sides explode 1->O(tau^2) rows and feed the candidate
    # equi-join; a single-split scan would run that fan-out serially
    # (see parallelism.fan_out — no-op once inputs arrive multi-split)
    l = fan_out(l)
    r = fan_out(r)

    # ---- index side: tau+1 segments per right record (len >= k) -------
    # one literal plan per possible (n, i): segment bounds depend only on
    # the string LENGTH, so a CASE over n is avoided by computing
    # substring bounds arithmetically: start_i(n) and len_i(n) in closed
    # form from the even-partition scheme.
    seg_idx = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_seg")
    # integer division via `div` (Column has no // operator)
    base, rem = F.expr(f"_rlen div {k}"), F.col("_rlen") % k
    long_from = k - rem  # segments with index >= k - rem get base+1
    seg_len = base + F.when(F.col("_seg") >= long_from, 1).otherwise(0)
    seg_start = (
        base * F.col("_seg")
        + F.greatest(F.col("_seg") - long_from, F.lit(0))
    )
    idx = (
        r.filter(F.col("_rlen") >= k)
        .select(*blocks, "_rid", "_rtxt", "_rlen", seg_idx)
        .select(
            *blocks,
            "_rid",
            "_rlen",
            "_seg",
            F.col("_rtxt").substr(seg_start + 1, seg_len).alias("_piece"),
        )
    )

    # ---- probe side: shifted windows for each candidate length --------
    # candidate right lengths [len(r)-tau, len(r)+tau], clamped to >= k
    # (shorter rights go through the degenerate leg). Guarded when():
    # Spark's sequence(start, stop) runs DESCENDING when start > stop
    # (a left string shorter than k - tau would fabricate lengths);
    # the un-matched when() yields NULL and explode emits no rows.
    lo = F.greatest(F.col("_llen") - tau, F.lit(k))
    hi = F.col("_llen") + tau
    cand_n = F.explode(F.when(lo <= hi, F.sequence(lo, hi))).alias("_n")
    p = l.select(*blocks, "_lid", "_ltxt", "_llen", cand_n)
    pbase, prem = F.expr(f"_n div {k}"), F.col("_n") % k
    plong_from = k - prem
    p = p.select(
        *blocks, "_lid", "_ltxt", "_llen", "_n",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_seg"),
    )
    pseg_len = pbase + F.when(F.col("_seg") >= plong_from, 1).otherwise(0)
    pseg_start = (
        pbase * F.col("_seg")
        + F.greatest(F.col("_seg") - plong_from, F.lit(0))
    )
    shift = F.explode(
        F.sequence(F.lit(-tau), F.lit(tau))
    ).alias("_shift")
    p = p.select(
        *blocks, "_lid", "_ltxt", "_llen", "_n", "_seg",
        pseg_start.alias("_pstart"), pseg_len.alias("_plen"), shift,
    ).withColumn("_start", F.col("_pstart") + F.col("_shift"))
    # valid windows only: inside r, non-empty
    p = p.filter(
        (F.col("_start") >= 0)
        & (F.col("_plen") >= 1)
        & (F.col("_start") + F.col("_plen") <= F.col("_llen"))
    ).select(
        *blocks, "_lid", "_llen", "_n", "_seg",
        F.col("_ltxt").substr(F.col("_start") + 1, F.col("_plen")).alias(
            "_piece"
        ),
    ).distinct()

    join_keys = [*blocks, "_n", "_seg", "_piece"]
    cand = (
        p.join(idx.withColumnRenamed("_rlen", "_n"), join_keys)
        .select(*blocks, "_lid", "_rid")
        .distinct()
    )

    # ---- degenerate right strings (len < k): length filter only -------
    short = r.filter(F.col("_rlen") < k)
    short_cand = (
        l.filter(F.col("_llen") <= 2 * tau).join(short, blocks)
        if blocks
        else l.filter(F.col("_llen") <= 2 * tau).crossJoin(short)
    )
    short_cand = short_cand.filter(
        F.abs(F.col("_llen") - F.col("_rlen")) <= tau
    ).select(*blocks, "_lid", "_rid")
    return cand.unionByName(short_cand).distinct()


# ---------------------------------------------------------------------------
# Measured dispatch: blocked cross-product vs PassJoin segment filtering
# ---------------------------------------------------------------------------

def fine_blocked_pairs(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    max_distance: int,
    fine_keys: list[tuple[str, str]],
    max_block: int | None = None,
) -> DataFrame:
    """Multi-pass fine-key blocking (Hernández & Stolfo sorted-
    neighborhood discipline), the linkage module's documented mitigation
    for the quadratic coarse-block regime, as a first-class operator:
    one pass per ``fine_keys`` entry — ``(left_expr, right_expr)`` SQL
    expressions over the text columns (e.g. first-5 / last-4 chars) —
    each an equi-join on ``block_cols + fine key``; passes are unioned
    and pair-deduped, then verified with the same length band + banded
    Levenshtein as :func:`blocked_pairs`.

    Completeness contract: matches are found iff the two texts agree on
    at least ONE declared fine key (within their coarse block). That is
    the same epistemic status as ``block_cols`` itself — a blocking key
    is always a caller-declared completeness assumption about the
    perturbation family (the nation block already drops cross-nation
    matches). The caller chooses keys lossless for its corpus; the
    plans-layer linkage queries document the proof for theirs.

    Scale shape: the quadratic core runs on DISTINCT (block, text)
    values, then expands back to rows through two equi-joins — exact
    (the metric depends only on the texts), and duplicate-heavy corpora
    multiply only the linear expansion, never the pair scan. Measured
    sf0.1 -> sf1 exponent 0.10 vs 1.95 for the coarse nation block
    (BENCH_SCALING.checks)."""
    text_pairs = fine_blocked_text_pairs(
        left, right, block_cols, left_text, right_text, max_distance,
        fine_keys, max_block=max_block,
    )
    l = left.select(
        *block_cols,
        F.col(left_id).alias("_lid"),
        F.col(left_text).alias("_ltxt"),
    )
    r = right.select(
        *block_cols,
        F.col(right_id).alias("_rid"),
        F.col(right_text).alias("_rtxt"),
    )
    tp = text_pairs.select(
        *block_cols,
        F.col(left_text).alias("_ltxt"),
        F.col(right_text).alias("_rtxt"),
        "distance",
    )
    # row expansion: output-proportional by construction — on
    # duplicate-heavy corpora the PAIR SET itself is quadratic in the
    # duplication factor (100x-replicated texts mean 10,000 row pairs
    # per matched text pair; 1.5e9 rows at the sf10 study corpus).
    # Callers that only need aggregates over the pairs should aggregate
    # THROUGH the expansion instead: per-text weights x text pairs (see
    # plans fuzzy_customer_linkage_fine_block) — never this stream.
    return (
        tp.join(l, [*block_cols, "_ltxt"])
        .join(r, [*block_cols, "_rtxt"])
        .select(
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            F.col("distance").cast("int").alias("distance"),
        )
    )


def fine_blocked_text_pairs(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    left_text: str,
    right_text: str,
    max_distance: int,
    fine_keys: list[tuple[str, str]],
    max_block: int | None = None,
) -> DataFrame:
    """The fine-key arm's DISTINCT-TEXT core: ``(block_cols...,
    left_text, right_text, distance)`` — one row per matched text pair,
    never expanded to row pairs. On duplicate-heavy corpora this is the
    scalable surface: the text-pair population is duplication-invariant
    (measured: identical candidate counts at sf0.1/sf1/sf10 on the
    100x-replicated study corpus), while the row-pair expansion grows
    with the square of the duplication factor. Aggregations over row
    pairs should join per-text weights (count / sum-of-ids per (block,
    text)) against this frame and multiply — the aggregate-through-join
    pattern — rather than consuming :func:`fine_blocked_pairs`.

    ``max_block`` applies blocked_pairs' oversized-coarse-block drop on
    the raw LEFT rows before the distinct, so arm dispatch never
    changes which rows participate."""
    if not fine_keys:
        raise ValueError("fine_keys must name at least one pass")
    if left_text == right_text:
        raise ValueError(
            "left_text and right_text must differ (they name the output "
            "pair columns); alias one side before calling"
        )
    l = left.select(*block_cols, F.col(left_text).alias("_ltxt"))
    if max_block is not None and block_cols:
        sizes = (
            l.groupBy(*block_cols)
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") <= max_block)
            .drop("_bn")
        )
        l = l.join(F.broadcast(sizes), block_cols, "left_semi")
    dl = l.distinct()
    dr = right.select(
        *block_cols, F.col(right_text).alias("_rtxt")
    ).distinct()

    def _pass(lexpr: str, rexpr: str) -> DataFrame:
        lk_ = dl.withColumn(
            "_fk", F.expr(lexpr.replace(left_text, "_ltxt"))
        )
        rk_ = dr.withColumn(
            "_fk", F.expr(rexpr.replace(right_text, "_rtxt"))
        )
        return lk_.join(rk_, [*block_cols, "_fk"]).select(
            *block_cols, "_ltxt", "_rtxt"
        )

    cand = _pass(*fine_keys[0])
    for lexpr, rexpr in fine_keys[1:]:
        cand = cand.unionByName(_pass(lexpr, rexpr))
    return (
        cand.distinct()
        .filter(F.abs(F.length("_ltxt") - F.length("_rtxt")) <= max_distance)
        .withColumn(
            "distance", F.levenshtein("_ltxt", "_rtxt", max_distance)
        )
        .filter(F.col("distance") >= 0)
        .select(
            *block_cols,
            F.col("_ltxt").alias(left_text),
            F.col("_rtxt").alias(right_text),
            F.col("distance").cast("int").alias("distance"),
        )
    )


def fine_block_budget(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    left_text: str,
    right_text: str,
    fine_keys: list[tuple[str, str]],
    max_block: int | None = None,
) -> int:
    """EXACT candidate-pair count of the fine-key arm in the dispatch's
    shared currency: sum over passes of sum over (coarse block, fine
    key) groups of |distinct-L| * |distinct-R| — the pair population the
    fine core actually scans (pass overlap is deduped AFTER the scan,
    so the sum, not the union, is the honest cost). Distinct-text
    counting mirrors the operator; the linear expansion joins are not
    counted, same as the other arms' linear sides."""
    l = left.select(*block_cols, F.col(left_text).alias("_t"))
    if max_block is not None and block_cols:
        sizes = (
            l.groupBy(*block_cols)
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") <= max_block)
            .drop("_bn")
        )
        l = l.join(F.broadcast(sizes), block_cols, "left_semi")
    dl = l.distinct()
    dr = right.select(*block_cols, F.col(right_text).alias("_t")).distinct()
    # ONE driver-blocking job for every pass (was one per pass): tag each
    # pass's (block, fine-key) aggregates with the pass index so the
    # joins can't cross passes, union, and take a single grand sum —
    # arithmetic identical to summing per-pass results (integer adds
    # commute), job-launch overhead paid once.
    per_pass = []
    for i, (lexpr, rexpr) in enumerate(fine_keys):
        lb = (
            dl.withColumn("_fk", F.expr(lexpr.replace(left_text, "_t")))
            .groupBy(*block_cols, "_fk")
            .agg(F.count(F.lit(1)).alias("_ln"))
            .withColumn("_pass", F.lit(i))
        )
        rb = (
            dr.withColumn("_fk", F.expr(rexpr.replace(right_text, "_t")))
            .groupBy(*block_cols, "_fk")
            .agg(F.count(F.lit(1)).alias("_rn"))
            .withColumn("_pass", F.lit(i))
        )
        per_pass.append(lb.join(rb, [*block_cols, "_fk", "_pass"]))
    unioned = per_pass[0]
    for j in per_pass[1:]:
        unioned = unioned.unionByName(j)
    row = unioned.agg(
        F.coalesce(F.sum(F.col("_ln") * F.col("_rn")), F.lit(0))
    ).first()
    return int(row[0])


def blocked_pair_budget(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    max_block: int | None = None,
) -> int:
    """EXACT candidate-pair count of the blocked cross-product:
    ``sum over blocks of |block_L| * |block_R|`` (after the same
    left-side ``max_block`` drop :func:`blocked_pairs` applies). Two
    small aggregates + one block-key join — the cheap side of the
    dispatch statistic."""
    lb = left.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("_ln"))
    if max_block is not None:
        lb = lb.filter(F.col("_ln") <= max_block)
    rb = right.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("_rn"))
    # no blocking key: one global "block" — the full cross-product
    joined = lb.crossJoin(rb) if not block_cols else lb.join(rb, block_cols)
    row = joined.agg(
        F.coalesce(F.sum(F.col("_ln") * F.col("_rn")), F.lit(0))
    ).first()
    return int(row[0])


_MEM_SUFFIX = {
    "k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4,
    "kb": 1024, "mb": 1024**2, "gb": 1024**3, "tb": 1024**4,
    "b": 1,
}


def _parse_mem(s: str) -> int:
    """'8g' / '512m' / '1024' (MiB default, Spark's convention) → bytes."""
    s = s.strip().lower()
    i = len(s)
    while i > 0 and not s[i - 1].isdigit():
        i -= 1
    num, suffix = int(s[:i]), s[i:]
    return num * _MEM_SUFFIX.get(suffix, 1024**2)


def _budget_and_counts(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    max_block: int | None,
) -> tuple[int, int, int]:
    """(blocked budget, |left|, |right|) in ONE driver-blocking job —
    value-identical to ``blocked_pair_budget`` + two ``count()`` calls
    (the dispatch previously paid three job launches for three scalar
    aggregates over the same grouped frames). Full-outer join keeps
    every block so the row counts cover both sides; the budget term
    keeps the inner-join semantics (both sides present, left size under
    ``max_block``)."""
    lb = left.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("_ln"))
    rb = right.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("_rn"))
    joined = (
        lb.join(rb, block_cols, "full_outer")
        if block_cols
        else lb.crossJoin(rb)
    )
    keep = F.col("_ln").isNotNull() & F.col("_rn").isNotNull()
    if max_block is not None:
        keep = keep & (F.col("_ln") <= max_block)
    row = joined.agg(
        F.coalesce(
            F.sum(F.when(keep, F.col("_ln") * F.col("_rn"))), F.lit(0)
        ).alias("budget"),
        F.coalesce(F.sum("_ln"), F.lit(0)).alias("n_l"),
        F.coalesce(F.sum("_rn"), F.lit(0)).alias("n_r"),
    ).first()
    return int(row[0]), int(row[1]), int(row[2])


def passjoin_candidate_ceiling(spark) -> int:
    """Feasibility ceiling on PassJoin's ESTIMATED candidate count,
    derived from the EXECUTOR heap — the JVM the candidate distinct
    actually partitions across: PassJoin materializes its candidate set
    through a distinct (hash aggregate), and while the aggregate
    spills, the surrounding machinery — concurrent explode buffers, one
    UnsafeRow + map slot per in-flight candidate across every parallel
    task in the same JVM — budgets ~128 bytes per candidate at the
    observed OOM point (sf1 low-entropy regime: ~9e8 candidates killed
    an 8g heap; 8g // 128B = 6.7e7 would have rejected it with margin).

    On a cluster ``spark.executor.memory`` is the right unit; a py4j
    Runtime.maxMemory() read would measure the DRIVER and over/under-
    shoot whenever the two differ (round-8 review finding). Only in
    PURE local mode (``local`` / ``local[N]`` — one JVM, driver ==
    executor, conf usually unset) is the live JVM heap the truthful
    fallback; ``local-cluster[...]`` forks separate executor JVMs whose
    heap IS ``spark.executor.memory``, so it must take the conf path
    (round-8 advisor finding — ``startswith("local")`` matched it)."""
    import re

    conf_mem = spark.conf.get("spark.executor.memory", None)
    pure_local = re.fullmatch(
        r"local(\[[^\]]*\])?", spark.sparkContext.master
    )
    if conf_mem and not pure_local:
        heap = _parse_mem(conf_mem)
    else:
        heap = int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory())
    return max(1_000_000, heap // 128)


def decide_pairs_strategy(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    max_distance: int,
    max_block: int | None = None,
    sample_target: int = 2000,
    passjoin_overhead: float = 2.0,
    candidate_ceiling: int | None = None,
    fine_keys: list[tuple[str, str]] | None = None,
    fine_overhead: float = 1.5,
) -> dict:
    """The bounded measured dispatch between :func:`blocked_pairs`,
    :func:`passjoin_pairs`, and (when the caller declares fine keys)
    :func:`fine_blocked_pairs` — the same discipline as the ANN family's
    ``exact_below`` / k-core's ``local_below``: decide from a cheap
    statistic in the shared cost currency (candidate pairs), never from
    a heuristic about the data.

    - blocked side: the EXACT pair budget (:func:`blocked_pair_budget`,
      two aggregates + a block-key join);
    - PassJoin side: candidate count measured on deterministic hash
      samples of both inputs (``pmod(xxhash64(id), d) == 0`` with d
      sized for ~``sample_target`` rows per side) through the IDENTICAL
      candidate plan the real join runs, scaled by ``d_l * d_r`` — the
      unbiased estimator of an equi-join size under independent
      Bernoulli sampling. Segment selectivity is exactly what this
      measures: low-entropy keys (zero-padded names) collide corpus-wide
      and the estimate approaches the cross-product; high-entropy keys
      (text prefixes) stay near the true-match count.
    - rule: PassJoin wins iff it is FEASIBLE (``est_candidates <=
      candidate_ceiling`` — default :func:`passjoin_candidate_ceiling`
      from the live heap; blocked streams its cross-product and has no
      materialization ceiling) AND ``est_candidates * passjoin_overhead
      < blocked_budget``. The overhead constant is measured, not
      assumed: at sf0.1 on comparable candidate volumes PassJoin's
      extra join machinery (two explodes, distinct, verification
      re-joins) costs ~2x per candidate vs the block join's banded
      Levenshtein (13 s vs 7 s on the low-entropy corpus — module doc).
      The ceiling term makes the sf1 convergence-regime choice
      principled rather than lucky (round-7 verdict #3): at ~9e8
      estimated candidates PassJoin OOMs an 8g heap, so it must lose
      the dispatch regardless of projected speed.
    - fine-key side (round-10: the measured-best plan in the coarse-
      block quadratic regime must be an arm, not folklore): when the
      caller passes ``fine_keys``, :func:`fine_block_budget` gives the
      EXACT pair count of the multi-pass distinct-text core in the same
      currency. ``fine_overhead`` prices its extra machinery per
      candidate (distinct + union-dedup + two expansion joins) relative
      to the plain block join; at comparable candidate volumes the
      fine core's per-candidate cost is close to blocked's (the same
      banded Levenshtein dominates), so the default 1.5 is a
      conservative handicap — the sf1 A/B (linkage_ab_sf1) checks the
      decision against measured wall-clock in all three regimes.
    - rule: cheapest FEASIBLE arm in weighted candidate currency wins;
      ties prefer blocked (the streaming arm with no materialization
      ceiling and no key assumptions beyond the caller's coarse block).
      Dispatch with fine keys can only change answers in the way the
      caller's own key declaration allows — a blocking key is always a
      caller-declared completeness assumption (see
      :func:`fine_blocked_pairs`).
    """
    budget, n_l, n_r = _budget_and_counts(
        left, right, block_cols, max_block
    )
    d_l = max(1, n_l // sample_target)
    d_r = max(1, n_r // sample_target)
    blocks = list(block_cols or [])
    # SALTED sampler hash: callers (the sf1 A/B, any pre-sliced corpus)
    # may themselves select rows by pmod(xxhash64(id), k) — composing a
    # second unsalted xxhash64 with that is CORRELATED, not independent
    # (P(h%15==0 | h%5==0) = 1/3, not 1/15), which inflated a sliced
    # estimate 25x before the salt. xxhash64 over (salt, id) is
    # independent of xxhash64 over (id) for sampling purposes.
    l_s = left.filter(
        F.pmod(F.xxhash64(F.lit("dps-sample"), F.col(left_id)), F.lit(d_l))
        == 0
    ).select(
        *blocks,
        F.col(left_id).alias("_lid"),
        F.col(left_text).alias("_ltxt"),
        F.length(left_text).alias("_llen"),
    )
    r_s = right.filter(
        F.pmod(F.xxhash64(F.lit("dps-sample"), F.col(right_id)), F.lit(d_r))
        == 0
    ).select(
        *blocks,
        F.col(right_id).alias("_rid"),
        F.col(right_text).alias("_rtxt"),
        F.length(right_text).alias("_rlen"),
    )
    sampled = _passjoin_candidates(l_s, r_s, max_distance, blocks).count()
    est = float(sampled) * d_l * d_r
    if candidate_ceiling is None:
        candidate_ceiling = passjoin_candidate_ceiling(left.sparkSession)
    feasible = est <= candidate_ceiling
    # cheapest feasible arm in weighted candidate currency; insertion
    # order breaks ties toward blocked (two-way behavior is bit-exact
    # with the old `feasible and est*overhead < budget` rule)
    costs: dict[str, float] = {"blocked": float(budget)}
    if feasible:
        costs["passjoin"] = est * passjoin_overhead
    fine_budget = None
    if fine_keys:
        fine_budget = fine_block_budget(
            left, right, block_cols, left_text, right_text, fine_keys,
            max_block=max_block,
        )
        costs["fine_block"] = fine_budget * fine_overhead
    strategy = min(costs, key=costs.get)
    out = {
        "strategy": strategy,
        "blocked_budget": budget,
        "passjoin_est_candidates": est,
        "passjoin_feasible": feasible,
        "candidate_ceiling": int(candidate_ceiling),
        "sampled_candidates": int(sampled),
        "sample_denominators": [int(d_l), int(d_r)],
        "passjoin_overhead": passjoin_overhead,
        "n_left": int(n_l),
        "n_right": int(n_r),
    }
    if fine_keys:
        out["fine_budget"] = int(fine_budget)
        out["fine_overhead"] = fine_overhead
        out["n_fine_passes"] = len(fine_keys)
    return out


def auto_pairs(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    max_distance: int,
    max_block: int | None = None,
    sample_target: int = 2000,
    passjoin_overhead: float = 2.0,
    candidate_ceiling: int | None = None,
    decision_out: dict | None = None,
    fine_keys: list[tuple[str, str]] | None = None,
    fine_overhead: float = 1.5,
) -> DataFrame:
    """Auto-dispatched exact edit-distance join: run
    :func:`decide_pairs_strategy`, then the winning operator — same
    output contract for every arm (``left_id, right_id, distance``,
    distance <= max_distance, exact within the declared blocking keys).
    Without ``fine_keys`` the dispatch is answer-invariant (blocked and
    PassJoin are both exact); declaring fine keys admits the third arm
    under the caller's own completeness assumption (see
    :func:`fine_blocked_pairs`). Pass ``decision_out={}`` to receive
    the measured statistics that drove the choice."""
    decision = decide_pairs_strategy(
        left, right, block_cols, left_id, right_id, left_text,
        right_text, max_distance, max_block=max_block,
        sample_target=sample_target, passjoin_overhead=passjoin_overhead,
        candidate_ceiling=candidate_ceiling,
        fine_keys=fine_keys, fine_overhead=fine_overhead,
    )
    if decision_out is not None:
        decision_out.update(decision)
    if decision["strategy"] == "fine_block":
        return fine_blocked_pairs(
            left, right, block_cols, left_id, right_id, left_text,
            right_text, max_distance, fine_keys, max_block=max_block,
        )
    if decision["strategy"] == "passjoin":
        # the "dispatch never changes answers" contract: blocked_pairs
        # drops blocks whose LEFT size exceeds max_block, so the
        # passjoin branch must apply the SAME drop before joining —
        # otherwise which rows appear would depend on the cost model
        if max_block is not None and block_cols:
            sizes = (
                left.groupBy(*block_cols)
                .agg(F.count(F.lit(1)).alias("_bn"))
                .filter(F.col("_bn") <= max_block)
                .drop("_bn")
            )
            left = left.join(F.broadcast(sizes), block_cols, "left_semi")
        return passjoin_pairs(
            left, right, left_id, right_id, left_text, right_text,
            max_distance, block_cols=block_cols,
        )
    return blocked_pairs(
        left, right, block_cols, left_id, right_id, left_text,
        right_text, max_distance, max_block=max_block,
    )
