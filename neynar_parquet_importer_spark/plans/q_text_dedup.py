"""Registry chunk split out of plans/queries.py (round-9 hygiene): original lines 1516-2235. Definitions land in the shared QUERIES/ORACLE_SQL dicts at import; the spine (plans.queries) imports every chunk in original order and re-exports all names, so `from ..plans.queries import X` keeps working for every X."""
from __future__ import annotations

from .q_relational import (  # noqa: E501
    _emb_cache_key,
)
from .queries import (  # noqa: E501
    DataFrame,
    F,
    SparkSession,
    Window,
    _HOT_SHINGLE_CACHE,
    _ntz_epoch_seconds,
    _t,
    crp,
    dd,
    reduce,
    smp,
    tx,
)


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tx.token_count("text").alias("n_tokens"),
        tx.token_count("text", mode="bpe").alias("n_bpe_tokens"),
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", tx.quality_score("text").alias("quality"))


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", tx.language_id("text").alias("lang_pred"))


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", tx.fingerprint("text").alias("fp"))


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/spam signal: 1 - distinct-token ratio per document."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", tx.repetition_score("text").alias("repetition"))


def text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters per document (top-bigram position
    fraction, duplicated-trigram position fraction, pass/fail rule) —
    ORACLE-CHECKED; see operators.corpus.gopher_repetition for the
    n-gram-position adaptation and the execution shape."""
    docs = _t(spark, sf_dir, "documents")
    out = crp.gopher_repetition(docs, "text", "doc_id")
    return out.select(
        F.col("id").alias("doc_id"),
        "top_bigram_frac",
        "dup_trigram_frac",
        "repetition_ok",
    )


def text_substring_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication per document at 10-gram granularity
    (Lee et al. 2022 signal): duplicated-window fraction + longest
    duplicated run — ORACLE-CHECKED (DuckDB recomputes positional grams,
    global occurrence counts, and the run decomposition)."""
    docs = _t(spark, sf_dir, "documents")
    out = crp.substring_dup_stats(docs, "text", "doc_id", gram_n=10)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_grams",
        "dup_grams",
        "dup_fraction",
        "max_dup_run",
    )


def lang_mixing_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.3) language sampling weights — the
    mBERT/XLM-R/mT5 alpha-sampling rule; ORACLE-CHECKED. Complements
    lang_mixing_weights (the alpha->0 uniform limit)."""
    docs = _t(spark, sf_dir, "documents")
    return crp.mixing_weights_temperature(docs, "lang", alpha=0.3)


def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub plumbing: per-category match counts + fingerprint of the
    redacted text (witnesses the replacement without shipping the text)."""
    docs = _t(spark, sf_dir, "documents")
    counts = tx.pii_counts(F.col("text"))
    return docs.select(
        "doc_id",
        counts["email"].alias("n_emails"),
        counts["ipv4"].alias("n_ipv4"),
        F.md5(tx.redact_pii("text")).alias("redacted_fp"),
    )


# ---------------------------------------------------------------------------
# Near-dup dedup (rows-only oracle: not SQL-expressible)
# ---------------------------------------------------------------------------

def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures -> LSH banding -> estimated-Jaccard filter —
    the real scale pipeline (one signature aggregate, one banded
    self-join), ORACLE-CHECKED end to end: the member family is the
    engine-portable md5 + Kirsch-Mitzenmacher construction
    (dedup.minhash_signatures hash_family="md5"), so the DuckDB twin
    recomputes the identical signatures, replays band collisions as
    member-slice equality (bucket-hash equality <=> slice equality up to
    a ~2^-64 xxhash64 collision), and reproduces est_jaccard exactly.
    The xxhash64 family remains the default for engine-internal
    pipelines (streaming near-dup state)."""
    docs = _t(spark, sf_dir, "documents")
    sigs = dd.minhash_signatures(
        docs, num_hashes=64, shingle_n=3, hash_family="md5"
    )
    cands = dd.minhash_lsh_candidates(sigs, bands=16, rows_per_band=4)
    return cands.filter(F.col("est_jaccard") >= 0.5).orderBy("id_a", "id_b")




def _hot_shingles_cached(
    spark: SparkSession, docs: DataFrame, sf_dir: str, frac: float
) -> DataFrame:
    """Stop-shingle frame for the documents corpus, computed once per
    (corpus, cap) per process and rebuilt as a tiny frame thereafter —
    the same artifact discipline as the IVF centroids / PQ codebooks: in
    production the hot list is computed once at corpus build and
    persisted beside it (dedup.hot_shingles + every consumer's ``hot``
    parameter exist for exactly that), so queries don't re-pay a full
    corpus shingle aggregation each. The hot tail is tiny by construction
    (shingles in > frac of ALL documents), so caching the hash values at
    the driver is bounded."""
    key = (_emb_cache_key(sf_dir), "documents", frac)
    if key not in _HOT_SHINGLE_CACHE:
        _HOT_SHINGLE_CACHE[key] = [
            r[0] for r in dd.hot_shingles(docs, frac, "text", "doc_id", 3).collect()
        ]
    vals = _HOT_SHINGLE_CACHE[key]
    return spark.createDataFrame([(v,) for v in vals], "shingle long")


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates reranked by exact shingle Jaccard — under the SAME
    fractional stop-shingle cap as dedup_ngram_jaccard_allpairs, so both
    exact-Jaccard paths share one definition (hot list amortized per
    corpus, see _hot_shingles_cached). At jaccard >= 0.8 the 16-band x
    4-row banding collides with probability ~1 - 3e-4 per pair, so the
    rerank output equals the capped all-pairs ground truth at 0.8 on
    every tested corpus — making this query ORACLE-CHECKED (the
    all-pairs SQL at 0.8); the banding recall contract is additionally
    property-tested in tests/test_operators.py."""
    docs = _t(spark, sf_dir, "documents")
    hot = _hot_shingles_cached(spark, docs, sf_dir, 0.05)
    # ONE persisted capped shingle-set frame feeds BOTH the signature
    # aggregate and the exact rerank (r10: the two stages previously ran
    # independent tokenize/explode/hash pipelines over the same corpus —
    # guide §2.4, share the subtree). Signatures over the CAPPED stream
    # (hot shingles excluded), so signature agreement estimates the same
    # capped Jaccard the exact rerank and the all-pairs oracle compute —
    # without this, a pair with capped jaccard >= 0.8 but boilerplate-
    # diluted raw sets can sit below every signature/banding threshold
    # and break the recall bound. min over the distinct stream equals
    # min over the occurrence stream, so signatures are unchanged.
    capped = dd._persist_eager(
        dd.capped_distinct_shingles(
            docs, "text", "doc_id", 3, max_shingle_df=None, hot=hot
        )
    )
    sigs = dd.minhash_signatures(
        docs, num_hashes=64, shingle_n=3, capped_stream=capped
    )
    # estimated-Jaccard pre-filter before the exact rerank (the standard
    # three-stage LSH pipeline): a pair with CAPPED jaccard >= 0.8 has
    # P[signature agreement < 0.5] = P[Binom(64, 0.8) < 32] ~ 1e-8, so
    # est >= 0.5 sheds the collision noise (most banding candidates on a
    # common-vocabulary corpus) at no recall cost — the exact rerank then
    # touches a vanishing candidate set
    cands = (
        dd.minhash_lsh_candidates(sigs, bands=16, rows_per_band=4)
        .filter(F.col("est_jaccard") >= 0.5)
        .select("id_a", "id_b")
    )
    return dd.ngram_jaccard_pairs(
        docs, cands, "text", "doc_id", capped_sets=capped
    ).filter(F.col("jaccard") >= 0.8)


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clustering: exact-Jaccard pairs (>= 0.7, over df-capped
    shingle sets — the same FRACTIONAL stop-shingle rule as the rest of
    the Jaccard family, mirrored in the oracle) -> connected components
    (iterative min-label propagation) -> canonical keeper per cluster.
    The oracle twin computes the same components with a recursive-CTE
    transitive closure, making this an ORACLE-CHECKED iterative
    algorithm."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.jaccard_all_pairs(
        docs, "text", "doc_id", threshold=0.7, max_shingle_df=None,
        hot=_hot_shingles_cached(spark, docs, sf_dir, 0.05),
    ).select("id_a", "id_b")
    return dd.dedup_cluster_keepers(docs, pairs, "doc_id")


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per ship quarter, how many lines belong to
    high- vs low-priority orders. No l_shipmode in this schema, so the
    grouping key is the ship quarter. Conditional counts in one pass;
    orders joins in as a (broadcastable) two-column projection."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.quarter(F.col("l_shipdate").cast("date")).cast("long").alias("ship_quarter")
        )
        .agg(
            # when/otherwise (not bool.cast) so a NULL priority counts as
            # low, matching the oracle's CASE ... ELSE 1 exactly
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def balance_distribution_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-distribution windows: percent_rank and cume_dist of each
    customer's balance within its market segment. One sort per segment
    partition; no global sort."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        F.round(F.percent_rank().over(w), 6).alias("bal_percent_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
    )


def user_first_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's first and last event type by time (event_id tie-break)
    as ONE hash aggregate: min_by/max_by on the (ts, event_id) ordering
    struct. The earlier full-frame-window + distinct form computed the
    same result but sorted every user partition and shuffled duplicate
    rows into the distinct; the aggregate form is partial+final (map-side
    combine), no sort, no duplicate-row shuffle."""
    ev = _t(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.min_by("event_type", key).alias("first_event_type"),
        F.max_by("event_type", key).alias("last_event_type"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue. The
    revenue view aggregates first (one shuffle on suppkey) and is persisted
    so it computes once; the max collapses to a one-row aggregate that
    broadcast-joins back as an equi-join on the value — no unpartitioned
    window (which would funnel the aggregated frame through one task)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev = dd._persist(
        li.groupBy("l_suppkey").agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    top = rev.join(
        F.broadcast(mx), F.col("total_revenue") == F.col("mx")
    ).drop("mx")
    supplier = _t(spark, sf_dir, "supplier")
    return top.join(supplier, top.l_suppkey == supplier.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


def orders_export_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Totally-ordered export (the one shape that legitimately needs a
    global sort): range-partitioned sample-based sort, so each partition
    writes a disjoint key range — never a single-node sort."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01"))
        .select(
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .orderBy("o_orderdate", "o_orderkey")
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention matrix over the events stream: users
    bucketed by first-active week, counted per week offset. Weeks are
    epoch arithmetic (floor(epoch_seconds/604800)) where epoch seconds
    come from an NTZ-to-NTZ timestampdiff — genuinely timezone-
    independent (unix_timestamp on a TIMESTAMP_NTZ column would convert
    via the session zone and only matched the oracle because the session
    pins UTC). user-week distinct first, so the join and both aggregates
    run on the collapsed frame."""
    ev = _t(spark, sf_dir, "events")
    secs = _ntz_epoch_seconds("ts")
    wk = F.floor(secs / 604800).cast("long")
    user_weeks = ev.select("user_id", wk.alias("week_idx")).distinct()
    firsts = user_weeks.groupBy("user_id").agg(F.min("week_idx").alias("cohort_week"))
    return (
        user_weeks.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week_idx") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


def event_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase with
    strictly-after chaining: a user reaches step N only via an event
    AFTER their step-(N-1) time, and the step time is the EARLIEST such
    event (min-ts chaining — the standard funnel semantics, not mere
    per-type existence). Each step is one filtered aggregate joined to
    the previous frontier; all three frames are user-sized (small next
    to the event stream), and every output is an exact integer count,
    plus an epoch-seconds checksum of the step times so the chaining
    itself is value-checked, not just the counts. Timestamps compare as
    NTZ — no session-zone dependence."""
    ev = _t(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def _row(step: str, order: int, frame, tcol: str):
        chk = _ntz_epoch_seconds(tcol)
        return frame.agg(
            F.lit(order).alias("step_order"),
            F.lit(step).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
            F.sum(chk).alias("step_ts_checksum"),
        )

    return (
        _row("view", 1, s1, "t1")
        .unionAll(_row("click", 2, s2, "t2"))
        .unionAll(_row("purchase", 3, s3, "t3"))
        .orderBy("step_order")
    )


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user next-event transition counts (the Markov matrix behind
    path analysis): lag over each user's ts-ordered stream, tie-broken
    by event_id so the ordering is a total order and the lag is
    deterministic on any engine. One window shuffle partitioned by
    user_id (bounded keys, no global sort) + one count aggregate; every
    output an exact integer."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("prev_type", "next_type")
    )


def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing in the same
    order, counted across orders, min-support filtered, top-20. The
    pair self-join is bounded per order by C(lines, 2) (~6 here); at
    100 TB the same shape needs the df-cap discipline the n-gram
    families use — drop parts in more than a support-fraction of
    baskets BEFORE pairing, since one ubiquitous part otherwise
    dominates the pair shuffle exactly like a hot shingle. Exact
    integer counts; id-ordered canonical pairs."""
    # distinct (order, part) BEFORE pairing, not distinct pairs after:
    # a part appearing k times in an order multiplies the pair explosion
    # k-fold only to be deduped post-join, so deduping the linear base
    # frame moves the distinct from the quadratic pair space to the
    # input (guide §2.3 "shuffle fewer bytes" — the dedup shuffle
    # carries 600k 2-int rows instead of every duplicated pair). The
    # self-join probe is then shuffle-rooted, so its parallelism comes
    # from AQE instead of the single-row-group scan split (the pairing
    # stage ran as 3 tasks on 32 cores before this).
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    l2 = li.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("p2")
    )
    pairs = (
        li.join(l2, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("p2"))
        .select(
            F.col("l_orderkey"),
            F.col("l_partkey").alias("part_a"),
            F.col("p2").alias("part_b"),
        )
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM filtering with a corpus-trained unigram model: score
    each document by the mean negative log-probability of its tokens
    under corpus-wide unigram frequencies. Two aggregations (token
    frequency, then per-doc mean); the vocabulary frame is small relative
    to the corpus so Catalyst broadcasts it back onto the token stream,
    and the scalar total arrives as a 1-row broadcast."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    )
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("n"))
    return (
        tok.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("c") / F.col("n"))), 4).alias(
                "avg_neg_logprob"
            ),
        )
    )


def bigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM filtering, one order up from the unigram model:
    score each document by the mean negative conditional log-probability
    of its bigrams, P(w2|w1) = c(w1 w2) / c(w1 ·), under corpus-trained
    counts. Catches locally-incoherent text the unigram model cannot
    (every word common, the transitions nonsense). Self-trained on the
    corpus, so no probability is zero and no smoothing constant leaks
    into the contract.

    Scale shape: the bigram stream is posexplode + lead (the codegen
    shingling shape), both count models are partial+final aggregates
    keyed by ngram, and the rejoin shuffles per-bigram rows on their
    natural keys — no driver state, no broadcast of anything unbounded.
    Documents with fewer than two tokens have no bigram and drop out
    (same rule in the oracle)."""
    docs = _t(spark, sf_dir, "documents")
    docs = docs.repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = tok.select(
        "doc_id",
        F.col("tok").alias("w1"),
        F.lead("tok", 1).over(w).alias("w2"),
    ).filter(F.col("w2").isNotNull())
    bfreq = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    cfreq = big.groupBy("w1").agg(F.count(F.lit(1)).alias("cc"))
    return (
        big.join(bfreq, ["w1", "w2"])
        .join(cfreq, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.log(F.col("cb") / F.col("cc"))), 4).alias(
                "avg_neg_logprob"
            ),
        )
    )


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (Efraimidis-Spirakis, weight =
    n_chars): longer documents are proportionally likelier, yet the
    sample is a pure function of (doc_id, n_chars, seed) — identical in
    any engine, as the oracle proves by replaying the same md5-uniform
    and -ln(u)/w scoring in SQL."""
    docs = _t(spark, sf_dir, "documents")
    out = smp.weighted_sample(docs, ["doc_id"], "n_chars", k=50, seed="wdocs")
    return out.select("doc_id", "lang", "source", "n_chars")


def events_interval_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded interval self-join: per user, count event pairs occurring
    within 10 minutes of each other ((t1, t1+600s], microsecond-exact).

    A naive time-range self-join is a per-user nested loop — O(k^2) rows
    per key with no equi-condition for the hash join to use. The banding
    trick makes it an equi-join: bucket time into window-sized bands, a
    successor event must land in the same or next band, so the left side
    probes (bucket, bucket+1) and the join runs hash-partitioned on
    (user, band); the exact interval predicate filters inside the join.
    Each qualifying pair matches exactly once (its successor band is one
    of the two probes). This is the standard range-join optimization —
    shuffle stays O(events), never O(pairs)."""
    window_us = 600 * 1_000_000
    # ts is TIMESTAMP_NTZ: diff against the NTZ epoch is timezone-
    # independent (unix_micros would force a session-zone cast)
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
    )
    ev = _t(spark, sf_dir, "events").select("user_id", micros.alias("t"))
    left = ev.select(
        "user_id",
        F.col("t").alias("t1"),
        F.explode(
            F.array(
                F.floor(F.col("t") / window_us),
                F.floor(F.col("t") / window_us) + 1,
            )
        ).alias("band"),
    )
    right = ev.select(
        F.col("user_id").alias("r_user"),
        F.col("t").alias("t2"),
        F.floor(F.col("t") / window_us).alias("r_band"),
    )
    return (
        left.join(
            right,
            (F.col("user_id") == F.col("r_user"))
            & (F.col("band") == F.col("r_band"))
            & (F.col("t2") > F.col("t1"))
            & (F.col("t2") - F.col("t1") <= window_us),
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of the orders table: one row per column with
    null count, exact distinct count, and min/max rendered as strings.

    One branch per column — groupBy(value) hash-agg then a tiny final
    aggregate — unioned. NOT a single agg with five count_distincts:
    multi-distinct aggregation plans as Expand (5x every row) feeding a
    SortAggregate, measured ~3 s at sf0.1 vs ~0.3 s for these unioned
    two-level hash aggregates, each over a pruned one-column scan."""
    orders = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"]
    branches = []
    for c in cols:
        if c == "o_totalprice":
            # fixed %.2f: a raw double->string cast goes scientific at
            # different magnitudes in different engines
            mn = F.format_string("%.2f", F.min(F.col("v")))
            mx = F.format_string("%.2f", F.max(F.col("v")))
        else:
            mn = F.min(F.col("v")).cast("string")
            mx = F.max(F.col("v")).cast("string")
        lvl1 = orders.groupBy(F.col(c).alias("v")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        branches.append(
            lvl1.agg(
                F.sum(
                    F.when(F.col("v").isNull(), F.col("cnt")).otherwise(0)
                ).alias("n_nulls"),
                F.sum(F.col("v").isNotNull().cast("long")).alias("n_distinct"),
                mn.alias("min_value"),
                mx.alias("max_value"),
            ).select(
                F.lit(c).alias("column_name"),
                F.coalesce("n_nulls", F.lit(0)).alias("n_nulls"),
                F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
                "min_value",
                "max_value",
            )
        )
    return reduce(DataFrame.unionAll, branches)


def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: each document's token range in the
    concatenated corpus and the 512-token training sequences it spans.
    The global prefix sum runs as a two-phase distributed scan
    (operators/packing.py) — never a single-task empty-PARTITION-BY
    window — while the oracle is the naive single-window SQL, proving
    the scalable plan computes the same answer."""
    from ..operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tx.token_count("text").alias("n_tokens"))
    return pack_sequences(toks, seq_len=512).select(
        F.col("id").alias("doc_id"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "offset",
        "first_seq",
        "last_seq",
        "n_seqs",
    )


def passage_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide passage-level exact dedup (10-word windows): per doc,
    how many passages survive first-occurrence dedup and the md5 of the
    reassembled text. The md5 makes the full reassembly oracle-checked
    without hashing megabytes of text through the driver."""
    docs = _t(spark, sf_dir, "documents")
    out = crp.passage_dedup(docs, "text", "doc_id", chunk_words=10)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_chunks",
        "kept_chunks",
        F.md5(F.col("kept_text")).alias("kept_text_md5"),
    )


def boilerplate_chunk_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-based boilerplate removal (CCNet/C4 rule over 10-word
    windows): chunks appearing in more than 2 distinct documents are
    dropped from every document; the reassembled text is oracle-checked
    by md5 like passage_dedup_docs."""
    docs = _t(spark, sf_dir, "documents")
    out = crp.remove_boilerplate_chunks(
        docs, "text", "doc_id", chunk_words=10, max_chunk_df=2
    )
    return out.select(
        F.col("id").alias("doc_id"),
        "n_chunks",
        "kept_chunks",
        F.md5(F.col("kept_text")).alias("kept_text_md5"),
    )


def epoch_shuffle_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle of the corpus (training order for
    "epoch-1"): every row tagged with its engine-portable md5 sort key.
    The permutation is fully value-checked — the oracle recomputes the
    same md5 draw, and sorting either engine's output by sort_key
    reproduces the identical training order. Plans as a range-partitioned
    parallel sort (see test_plans)."""
    docs = _t(spark, sf_dir, "documents")
    return smp.epoch_shuffle(docs, ["doc_id"], seed="epoch-1").select(
        "doc_id", "sort_key"
    )


def doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shingle novelty: fraction of the doc's distinct
    3-gram shingles first seen (min doc_id) in this doc — the marginal-
    contribution score used to curate under a fixed ingestion order."""
    docs = _t(spark, sf_dir, "documents")
    out = crp.shingle_novelty(docs, "text", "doc_id", shingle_n=3)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_shingles",
        F.round(F.col("novelty"), 4).alias("novelty"),
    )


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms. Term frequency aggregates on the
    (doc, term) pair key (partial+final, one shuffle); document frequency
    reuses that frame with a second aggregate on term — the df table is
    O(vocab), far smaller than the corpus, and at 100 TB can be broadcast
    when the vocabulary is bounded. The corpus size joins in as a
    broadcast 1-row frame (no driver-side collect), and top-3 is a
    row_number window partitioned by doc — never a global sort. Ranking
    uses the ROUNDED score (ties broken by term) so cross-engine
    last-ulp float drift can't reorder the cut."""
    docs = _t(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tfidf", "rnk")
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3) — ORACLE-CHECKED end to end:
    token hashes derive from md5 (engine-portable, one md5 per distinct
    token), pigeonhole blocking is EXACT for the threshold (any pair
    within hamming 3 agrees on >= 1 of 4 chunks), so the output is
    precisely the SQL-expressible set {pairs: hamming(simhash) <= 3} and
    DuckDB recomputes the identical signatures bit for bit."""
    docs = _t(spark, sf_dir, "documents")
    return dd.simhash_near_duplicates(
        dd.simhash(docs, token_hash="md5"), max_hamming=3
    )


def dedup_ngram_jaccard_allpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs shingle Jaccard (>= 0.5) — the oracle-checked ground
    truth for the whole near-dup family (inverted-index plan, not a cross
    join; see operators.dedup.jaccard_all_pairs). The stop-shingle cap is
    the FRACTIONAL form (df > 5% of the corpus): a fraction names the
    same boilerplate at every corpus size, where an absolute count means
    less and less as the corpus grows — the oracle mirrors the same
    fraction against count(*) of documents."""
    docs = _t(spark, sf_dir, "documents")
    return dd.jaccard_all_pairs(
        docs, "text", "doc_id", shingle_n=3, threshold=0.5,
        max_shingle_df=None,
        hot=_hot_shingles_cached(spark, docs, sf_dir, 0.05),
    )
