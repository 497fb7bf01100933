"""Registry chunk split out of plans/queries.py (round-9 hygiene): original lines 7210-8323. Definitions land in the shared QUERIES/ORACLE_SQL dicts at import; the spine (plans.queries) imports every chunk in original order and re-exports all names, so `from ..plans.queries import X` keeps working for every X."""
from __future__ import annotations

from .q_embed_pipeline import (  # noqa: E501
    _BM25_QUERIES,
    _BM25_TERMS,
)
from .q_oracle_artifact import (  # noqa: E501
    _ivf_knn_join_oracle_sql,
    _ivf_topk_oracle_sql,
    _kcore_oracle_sql,
    _kmeans_oracle_sql,
    _kmeans_profile_oracle_sql,
    _lpa_oracle_sql,
    _lsh_pairs_oracle_sql,
    _lsh_topk_oracle_sql,
    _oracle_embeddings,
    _pagerank_oracle_sql,
    _pq_topk_oracle_sql,
)
from .q_oracle_static import (  # noqa: E501
    ORACLE_SQL,
    QUERIES,
)
from .q_relational import (  # noqa: E501
    _emb_cache_key,
)
from .queries import (  # noqa: E501
    DataFrame,
    _BPE_ORACLE_MERGE_CACHE,
    _BPE_STABLE_CACHE,
    F,
    SparkSession,
    Window,
    _ARTIFACT_ORACLE_CACHE,
    _BPE_MERGE_CACHE,
    _PCA_MODEL_CACHE,
    _t,
    dd,
    lk,
    os,
    rtr,
    sim,
)


def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT near-dup pairs (capped Jaccard >= 0.8) via prefix filtering —
    the zero-false-negative scale path: only each doc's rarest-token
    prefix (~20% of the set at t=0.8) enters the inverted-index
    self-join, with PPJoin's length and positional filters pruning
    inside the join condition (see operators.dedup section comment;
    Bayardo WWW'07, Xiao WWW'08). t=0.8 is the family's high-confidence
    near-dup threshold (same as dedup_ngram_jaccard) and the regime
    prefix filtering is designed for — the operator docstring records
    the measured low-threshold blowup. Same fractional df-cap (5%) as
    the all-pairs twin, so the result must EQUAL the all-pairs ground
    truth — the oracle is the independent all-pairs DuckDB twin with the
    same exact-integer acceptance predicate (5*common >= 4*union), an
    algorithm-level differential check."""
    docs = _t(spark, sf_dir, "documents")
    return dd.prefix_filter_pairs(
        docs, "text", "doc_id", shingle_n=3, threshold=0.8, max_shingle_df=0.05
    )


def prefix_filter_candidate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The prefix-filter pruning profile: corpus/posting sizes, prefix-row
    count, candidates surviving the in-join filters, the naive
    shared-token pair count an unfiltered inverted index would aggregate,
    and the verified pairs. All exact integers; the oracle replays the
    ENTIRE candidate pipeline (md5_signed64 hashes, global df order,
    ranks, all three integer filters) as static SQL — the algorithm's
    internals, value-checked."""
    docs = _t(spark, sf_dir, "documents")
    return dd.prefix_filter_stats(
        docs, "text", "doc_id", shingle_n=3, threshold=0.8, max_shingle_df=0.05
    )


QUERIES["dedup_prefix_filter_pairs"] = dedup_prefix_filter_pairs
QUERIES["prefix_filter_candidate_stats"] = prefix_filter_candidate_stats

ORACLE_SQL["dedup_prefix_filter_pairs"] = """
    -- INDEPENDENT all-pairs twin of the engine's prefix-filter join:
    -- same capped sets, same exact-integer predicate (5*inter >=
    -- 4*union, t = 4/5), different algorithm — a differential test of
    -- the prefix-filtering no-false-negative guarantee.
    WITH base AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                    THEN list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                    ELSE [array_to_string(t, ' ')] END AS s
        FROM (SELECT doc_id,
                     string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
              FROM documents)
    ), shx AS (
        SELECT doc_id, unnest(s) AS shingle FROM base
    ), hot AS (
        SELECT shingle FROM shx GROUP BY shingle
        HAVING count(*) > 0.05 * (SELECT count(*) FROM documents)
    ), capped AS (
        SELECT doc_id, list(shingle) AS s
        FROM shx ANTI JOIN hot USING (shingle)
        GROUP BY doc_id
    )
    SELECT id_a, id_b, round(inter::DOUBLE / un, 6) AS jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.s, b.s)) AS inter,
               len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS un
        FROM capped a JOIN capped b ON a.doc_id < b.doc_id
    )
    WHERE 5 * inter >= 4 * un
"""

ORACLE_SQL["prefix_filter_candidate_stats"] = """
    -- Full replay of the prefix-filter candidate pipeline: md5_signed64
    -- shingle hashes, corpus df, global (df, hash) order, per-doc ranks,
    -- prefix cut, and the length + positional integer filters
    -- (threshold 4/5 -> n=4, d=5).
    WITH base AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                    THEN list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                    ELSE [array_to_string(t, ' ')] END AS s
        FROM (SELECT doc_id,
                     string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
              FROM documents)
    ), shx AS (
        SELECT DISTINCT doc_id, unnest(s) AS shingle FROM base
    ), hx AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(shingle), 1, 8)) AS BIGINT) AS hi,
               CAST(concat('0x', substr(md5(shingle), 9, 8)) AS BIGINT) AS lo
        FROM shx
    ), hv AS (
        SELECT doc_id,
               (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
                 * 4294967296 + lo AS shingle
        FROM hx
    ), dfreq AS (
        SELECT shingle, count(*) AS df FROM hv GROUP BY shingle
    ), joined AS (
        SELECT h.doc_id, h.shingle, d.df
        FROM hv h JOIN dfreq d USING (shingle)
        WHERE d.df <= 0.05 * (SELECT count(*) FROM documents)
    ), sized AS (
        SELECT doc_id, shingle, df,
               count(*) OVER (PARTITION BY doc_id) AS sz,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY df, shingle) AS rnk
        FROM joined
    ), prefix AS (
        SELECT * FROM sized WHERE 4 * sz <= 5 * (sz - rnk + 1)
    ), cand AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM prefix l JOIN prefix r
          ON l.shingle = r.shingle AND l.doc_id < r.doc_id
         AND 5 * least(l.sz, r.sz) >= 4 * greatest(l.sz, r.sz)
         AND (1 + least(l.sz - l.rnk, r.sz - r.rnk)) * 9 >= 4 * (l.sz + r.sz)
    ), naive AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM sized l JOIN sized r
          ON l.shingle = r.shingle AND l.doc_id < r.doc_id
    ), verified AS (
        SELECT id_a, id_b FROM (
            SELECT l.doc_id AS id_a, r.doc_id AS id_b,
                   count(*) AS nc, min(l.sz) AS sa, min(r.sz) AS sb
            FROM sized l JOIN sized r
              ON l.shingle = r.shingle AND l.doc_id < r.doc_id
            GROUP BY 1, 2
        ) WHERE 5 * nc >= 4 * (sa + sb - nc)
    )
    SELECT (SELECT count(DISTINCT doc_id) FROM sized) AS n_docs,
           (SELECT count(*) FROM sized) AS n_set_rows,
           (SELECT count(*) FROM prefix) AS n_prefix_rows,
           (SELECT count(*) FROM naive) AS n_naive_pairs,
           (SELECT count(*) FROM cand) AS n_candidates,
           (SELECT count(*) FROM verified) AS n_verified
"""


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 + dense cosine, fused by reciprocal rank
# ---------------------------------------------------------------------------

# each lexical query is paired with a deterministic query VECTOR (the
# embedding row whose vec_id is the query's index in sorted order) — the
# plumbing a production hybrid search has, where a doc's embedding joins
# by id. The SQL mapping literal is generated from this dict so the two
# sides cannot drift.
_HYBRID_QUERY_VECS = {qid: i for i, qid in enumerate(sorted(_BM25_QUERIES))}


def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-10 (lexical leg) and exact-cosine
    top-10 (dense leg, per mapped query vector) fused by reciprocal-rank
    fusion — the calibration-free combiner (retrieval.rrf_fuse;
    Cormack & Clarke SIGIR'09). Both legs rank on ROUNDED scores with id
    tie-breaks (the cross-engine ranking contract) and the fused score is
    an exact integer sum, so the final top-5 cut is boundary-proof. The
    dense leg is a broadcast of 3 query vectors against the corpus scan —
    no shuffle until the (30-row) per-query window."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    postings = rtr.term_postings(docs)
    # r11: dl as a projection + literal-term prune below the postings
    # aggregate (see bm25_topk_docs) — the lexical leg no longer
    # aggregates the full corpus vocabulary
    lex = rtr.bm25_topk(
        postings,
        rtr.query_frame(spark, _BM25_QUERIES),
        k=10,
        doc_lengths=rtr.doc_lengths(docs),
        prune_terms=_BM25_TERMS,
    ).select("query_id", "doc_id", "rank")
    qmap = spark.createDataFrame(
        sorted(_HYBRID_QUERY_VECS.items()), "query_id string, qvec_id long"
    )
    qvecs = emb.join(
        F.broadcast(qmap), emb["vec_id"] == qmap["qvec_id"]
    ).select("query_id", F.col("embedding").alias("q"))
    joined = emb.crossJoin(F.broadcast(qvecs))
    dot = sim._dot(F.col("embedding"), F.col("q"))
    den = sim._norm(F.col("embedding")) * sim._norm(F.col("q"))
    cos = F.round(F.when(den > 0, dot / den).otherwise(F.lit(0.0)), 6)
    dw = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.col("doc_id")
    )
    dense = (
        joined.select("query_id", F.col("vec_id").alias("doc_id"), cos.alias("cos"))
        .withColumn("rank", F.row_number().over(dw))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "rank")
    )
    return rtr.rrf_fuse([lex, dense], k=5).orderBy("query_id", "rank")


QUERIES["hybrid_rrf_topk"] = hybrid_rrf_topk

_HYBRID_QMAP_VALUES = ", ".join(
    f"('{qid}', {vid})" for qid, vid in sorted(_HYBRID_QUERY_VECS.items())
)

ORACLE_SQL["hybrid_rrf_topk"] = f"""
    WITH lex AS (
        SELECT query_id, doc_id, rank
        FROM ({rtr.bm25_oracle_sql(_BM25_QUERIES, k=10)})
    ), qmap(query_id, qvec_id) AS (VALUES {_HYBRID_QMAP_VALUES}),
    qv AS (
        SELECT m.query_id, e.embedding::DOUBLE[] AS q
        FROM qmap m JOIN embeddings e ON e.vec_id = m.qvec_id
    ), ds AS (
        SELECT query_id, doc_id,
               round(CASE WHEN den > 0 THEN num / den ELSE 0.0 END, 6) AS cos
        FROM (
            SELECT qv.query_id, e.vec_id AS doc_id,
                   list_dot_product(e.embedding::DOUBLE[], qv.q) AS num,
                   sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                     * sqrt(list_dot_product(qv.q, qv.q)) AS den
            FROM embeddings e CROSS JOIN qv
        )
    ), dr AS (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, doc_id) AS rank
        FROM ds
    ), dense AS (
        SELECT query_id, doc_id, rank FROM dr WHERE rank <= 10
    ), u AS (
        SELECT * FROM lex UNION ALL SELECT * FROM dense
    ), fused AS (
        SELECT query_id, doc_id,
               CAST(sum(1000000000 // (60 + rank)) AS BIGINT) AS rrf_fp,
               count(*) AS n_systems
        FROM u GROUP BY 1, 2
    ), ranked AS (
        SELECT query_id, doc_id, rrf_fp, n_systems,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rrf_fp DESC, doc_id) AS rank
        FROM fused
    )
    SELECT query_id, rank, doc_id, rrf_fp, n_systems
    FROM ranked WHERE rank <= 5
"""


def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT asymmetric containment pairs (|Sa∩Sb|/|Sa| >= 0.9): the
    quote/subset detector symmetric Jaccard is blind to — an eval
    passage embedded in a 100x larger training doc has Jaccard ~0.01
    but containment ~1. One-sided prefix-filter candidates (only the
    contained side's rarest-token prefix joins the full posting rows —
    candidate volume linear in posting length, never quadratic), exact
    integer acceptance 10*common >= 9*|Sa|. Oracle: independent
    all-ordered-pairs DuckDB twin (the prefix-filter differential
    discipline)."""
    docs = _t(spark, sf_dir, "documents")
    return dd.containment_pairs(
        docs, "text", "doc_id", shingle_n=3, threshold=0.9, max_shingle_df=0.05
    )


QUERIES["dedup_containment_pairs"] = dedup_containment_pairs

ORACLE_SQL["dedup_containment_pairs"] = """
    -- INDEPENDENT all-ordered-pairs twin of the engine's one-sided
    -- prefix-filter containment join (t = 9/10): same capped sets, same
    -- exact-integer predicate, different algorithm.
    WITH base AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                    THEN list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                    ELSE [array_to_string(t, ' ')] END AS s
        FROM (SELECT doc_id,
                     string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
              FROM documents)
    ), shx AS (
        SELECT doc_id, unnest(s) AS shingle FROM base
    ), hot AS (
        SELECT shingle FROM shx GROUP BY shingle
        HAVING count(*) > 0.05 * (SELECT count(*) FROM documents)
    ), capped AS (
        SELECT doc_id, list(shingle) AS s
        FROM shx ANTI JOIN hot USING (shingle)
        GROUP BY doc_id
    )
    SELECT id_contained, id_container,
           round(inter::DOUBLE / sa, 6) AS containment
    FROM (
        SELECT a.doc_id AS id_contained, b.doc_id AS id_container,
               len(list_intersect(a.s, b.s)) AS inter,
               len(a.s) AS sa
        FROM capped a JOIN capped b ON a.doc_id <> b.doc_id
    )
    WHERE 10 * inter >= 9 * sa
"""


def passjoin_doc_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PassJoin segment-filtered EXACT edit-distance join
    (``operators/linkage.passjoin_pairs`` — Li/Deng/Feng VLDB'12
    family) in its DESIGN REGIME: high-entropy text keys. A
    deterministically-perturbed 24-char document prefix (one char
    overwritten at a doc_id-dependent position, a second every third
    doc — distance 1-2 by construction, plus whatever natural
    collisions exist) links back to the clean prefixes at tau=2 with NO
    blocking key at all: the segment equi-join IS the blocking. On
    text, the tau+1 = 3 eight-char segments are near-unique, so
    candidate volume tracks true matches — measured at sf0.1 this runs
    ~5k x 5k unblocked in ~2 s where a naive cross-product pays 25M
    banded Levenshteins. The REGIME BOUNDARY is documented on the
    operator and pinned by test: on low-entropy zero-padded keys
    (customer names, where the segment "000" collides corpus-wide) the
    plain blocked join wins (measured 7 s vs 13 s at sf0.1), exactly as
    the prefix-filter Jaccard join degrades at low thresholds — the
    linkage queries therefore keep blocked_pairs and THIS query owns
    the text regime. Oracle: INDEPENDENT all-pairs DuckDB twin
    (cross-product + unbanded levenshtein) — an algorithm-level
    differential check of the pigeonhole segment selection."""
    docs = _t(spark, sf_dir, "documents")
    clean = docs.select(
        F.col("doc_id").alias("c_id"),
        F.expr("substr(lower(text), 1, 24)").alias("c_prefix"),
    )
    dirty = docs.select(
        F.col("doc_id").alias("d_id"),
        F.expr(_PASSJOIN_DIRTY_EXPR).alias("d_prefix"),
    )
    pairs = lk.passjoin_pairs(
        dirty, clean, "d_id", "c_id", "d_prefix", "c_prefix",
        max_distance=2,
    )
    return (
        pairs.groupBy("distance")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("d_id").alias("dirty_checksum"),
            F.sum("c_id").alias("clean_checksum"),
        )
        .orderBy("distance")
    )


# one char overwritten at position (doc_id % 16) + 3; a second at
# position ((doc_id % 7) + 18) for every third doc — pure string
# arithmetic both engines evaluate identically
_PASSJOIN_DIRTY_EXPR = (
    "concat("
    "substr(substr(lower(text), 1, 24), 1, cast(doc_id % 16 + 2 as int)), '~',"
    "substr(substr(lower(text), 1, 24), cast(doc_id % 16 + 4 as int)))"
)
_PASSJOIN_DIRTY_EXPR = (
    "CASE WHEN doc_id % 3 = 0 THEN "
    "concat(substr(" + _PASSJOIN_DIRTY_EXPR + ", 1, cast(doc_id % 7 + 17 as int)), '#',"
    "substr(" + _PASSJOIN_DIRTY_EXPR + ", cast(doc_id % 7 + 19 as int)))"
    " ELSE " + _PASSJOIN_DIRTY_EXPR + " END"
)

QUERIES["passjoin_doc_prefix_pairs"] = passjoin_doc_prefix_pairs

ORACLE_SQL["passjoin_doc_prefix_pairs"] = f"""
    -- INDEPENDENT all-pairs twin of the engine's PassJoin segment join:
    -- plain cross-product + unbanded levenshtein, same perturbation
    -- arithmetic, same exact acceptance (distance <= 2)
    WITH clean AS (
        SELECT doc_id AS c_id, substr(lower(text), 1, 24) AS c_prefix
        FROM documents
    ), dirty AS (
        SELECT doc_id AS d_id, {_PASSJOIN_DIRTY_EXPR.replace('cast(', 'CAST(').replace(' as int)', ' AS INTEGER)')} AS d_prefix
        FROM documents
    ), pairs AS (
        SELECT d.d_id, c.c_id,
               levenshtein(d.d_prefix, c.c_prefix) AS distance
        FROM dirty d, clean c
        WHERE abs(length(d.d_prefix) - length(c.c_prefix)) <= 2
          AND levenshtein(d.d_prefix, c.c_prefix) <= 2
    )
    SELECT CAST(distance AS INTEGER) AS distance,
           count(*) AS n_pairs,
           sum(d_id) AS dirty_checksum,
           sum(c_id) AS clean_checksum
    FROM pairs GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketches: distinct estimates + set overlap
# ---------------------------------------------------------------------------

def kmv_distinct_buyers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-buyer estimate per market segment next to the exact
    count — the bounded-shuffle path (``n_groups x k`` rows) a 100 TB
    pipeline uses when the exact distinct is too wide, with the exact
    count retained here as the in-query quality evidence. Sketch
    membership and ranks are md5-integer-exact; the lone float is the
    reported estimate (operators/kmv.py)."""
    from ..operators import kmv as kv

    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    buyers = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).select("segment", "o_custkey")
    sk = kv.kmv_sketch(buyers, "o_custkey", ["segment"], k=64, seed="kmvq")
    est = kv.kmv_estimate(sk, ["segment"], k=64)
    exact = buyers.groupBy("segment").agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    return (
        est.join(exact, "segment")
        .select(
            "segment",
            "n_sketch",
            F.round("est", 4).alias("est"),
            "n_exact",
        )
        .orderBy("segment")
    )


def kmv_returnflag_part_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jaccard / union / intersection estimates between the
    distinct-part sets of every return-flag pair, computed from per-flag
    KMV sketches ALONE — the sketch-only answer to "how much do these
    segments' vocabularies overlap" that drives corpus-mixture dedup
    budgeting without a second pass over the data (operators/kmv.py)."""
    from ..operators import kmv as kv

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"), "l_partkey"
    )
    sk = kv.kmv_sketch(li, "l_partkey", ["flag"], k=64, seed="kmvp")
    ov = kv.kmv_pair_overlap(sk, "flag", k=64)
    return ov.select(
        "g1",
        "g2",
        "n_union_sketch",
        "n_both",
        F.round("jaccard_est", 6).alias("jaccard_est"),
        F.round("union_est", 4).alias("union_est"),
        F.round("intersection_est", 4).alias("intersection_est"),
    ).orderBy("g1", "g2")


QUERIES["kmv_distinct_buyers_per_segment"] = kmv_distinct_buyers_per_segment
QUERIES["kmv_returnflag_part_overlap"] = kmv_returnflag_part_overlap


def _kmv_hash_sql(key_expr: str, seed: str) -> str:
    from ..operators.kmv import kmv_hash_sql

    return kmv_hash_sql(key_expr, seed)


ORACLE_SQL["kmv_distinct_buyers_per_segment"] = f"""
    -- full KMV replay: distinct (segment, custkey), signed-64 md5 order,
    -- k=64 smallest per segment, (k-1)/F_k estimate, exact count twin
    WITH buyers AS (
        SELECT DISTINCT c.c_mktsegment AS segment, o.o_custkey
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), hashed AS (
        SELECT DISTINCT segment,
               {_kmv_hash_sql('o_custkey', 'kmvq')} AS hv
        FROM buyers
    ), ranked AS (
        SELECT segment, hv,
               row_number() OVER (PARTITION BY segment ORDER BY hv) AS rn
        FROM hashed
    ), sk AS (
        SELECT * FROM ranked WHERE rn <= 64
    ), est AS (
        SELECT segment,
               count(*) AS n_sketch,
               max(CASE WHEN rn = 64 THEN
                   (CAST(hv AS DOUBLE) + 9223372036854775808.0)
                   / 18446744073709551616.0 END) AS fk
        FROM sk GROUP BY segment
    ), exact AS (
        SELECT segment, count(DISTINCT o_custkey) AS n_exact
        FROM buyers GROUP BY segment
    )
    SELECT e.segment,
           e.n_sketch,
           round(CASE WHEN e.n_sketch < 64 THEN CAST(e.n_sketch AS DOUBLE)
                      ELSE 63.0 / e.fk END, 4) AS est,
           x.n_exact
    FROM est e JOIN exact x ON e.segment = x.segment
    ORDER BY e.segment
"""

ORACLE_SQL["kmv_returnflag_part_overlap"] = f"""
    -- full KMV overlap replay: per-mode k=64 sketches, pairwise union
    -- re-rank, presence flags from the retained sketches, Beyer et al.
    -- jaccard/union/intersection estimators
    WITH hashed AS (
        SELECT DISTINCT l_returnflag AS mode,
               {_kmv_hash_sql('l_partkey', 'kmvp')} AS hv
        FROM lineitem
    ), ranked AS (
        SELECT mode, hv,
               row_number() OVER (PARTITION BY mode ORDER BY hv) AS rn
        FROM hashed
    ), sk AS (
        SELECT * FROM ranked WHERE rn <= 64
    ), modes AS (
        SELECT DISTINCT mode FROM sk
    ), expanded AS (
        SELECT s.mode AS g1, m.mode AS g2, s.hv,
               1 AS in_a, 0 AS in_b
        FROM sk s JOIN modes m ON s.mode < m.mode
        UNION ALL
        SELECT m.mode AS g1, s.mode AS g2, s.hv,
               0 AS in_a, 1 AS in_b
        FROM sk s JOIN modes m ON s.mode > m.mode
    ), merged AS (
        SELECT g1, g2, hv, max(in_a) AS in_a, max(in_b) AS in_b
        FROM expanded GROUP BY g1, g2, hv
    ), union_sk AS (
        SELECT *, row_number() OVER (PARTITION BY g1, g2 ORDER BY hv) AS urn
        FROM merged
    ), agg AS (
        SELECT g1, g2,
               count(*) AS n_union_sketch,
               sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS n_both,
               max(CASE WHEN urn = 64 THEN
                   (CAST(hv AS DOUBLE) + 9223372036854775808.0)
                   / 18446744073709551616.0 END) AS fk
        FROM union_sk WHERE urn <= 64
        GROUP BY g1, g2
    )
    SELECT g1, g2, n_union_sketch, n_both,
           round(CAST(n_both AS DOUBLE) / n_union_sketch, 6) AS jaccard_est,
           round(CASE WHEN n_union_sketch < 64
                      THEN CAST(n_union_sketch AS DOUBLE)
                      ELSE 63.0 / fk END, 4) AS union_est,
           round((CAST(n_both AS DOUBLE) / n_union_sketch)
                 * (CASE WHEN n_union_sketch < 64
                         THEN CAST(n_union_sketch AS DOUBLE)
                         ELSE 63.0 / fk END), 4) AS intersection_est
    FROM agg ORDER BY g1, g2
"""


# ---------------------------------------------------------------------------
# Corpus-trained bigram LM scoring (CCNet-style perplexity quality filter)
# ---------------------------------------------------------------------------

def lm_surprising_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The high-perplexity tail a CCNet-style curation pass cuts: top 15
    documents by average negative log-probability under the
    corpus-trained add-k bigram model (operators/lm.py). Ranking uses
    the 6-decimal ROUNDED score with doc_id as the tiebreak, so the
    selection boundary is engine-stable (a raw-float order could flip
    on sub-ulp ln/mean differences; the rounded order can't unless the
    rounding itself straddles a boundary — the accepted twin risk)."""
    from ..operators import lm

    docs = _t(spark, sf_dir, "documents")
    scored = lm.doc_nll(docs, "text", "doc_id", k_smooth=0.5)
    return (
        scored.select(
            F.col("id").alias("doc_id"),
            "n_bigrams",
            F.round("nll", 6).alias("nll"),
        )
        .orderBy(F.col("nll").desc(), F.col("doc_id"))
        .limit(15)
    )


def lm_source_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-model perplexity per source — the per-domain quality
    signal a mixture scheduler weighs against size: documents scored by
    the shared bigram model, averaged within source, exponentiated to
    perplexity (operators/lm.py)."""
    from ..operators import lm

    docs = _t(spark, sf_dir, "documents")
    scored = lm.doc_nll(docs, "text", "doc_id", k_smooth=0.5)
    joined = scored.join(
        docs.select(F.col("doc_id").alias("id"), "source"), "id"
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bigrams").alias("n_bigrams"),
            F.round(F.avg("nll"), 6).alias("avg_nll"),
            F.round(F.exp(F.avg("nll")), 4).alias("perplexity"),
        )
        .orderBy("source")
    )


QUERIES["lm_surprising_docs"] = lm_surprising_docs
QUERIES["lm_source_perplexity"] = lm_source_perplexity


def _lm_ctes() -> str:
    from ..operators.lm import bigram_nll_sql

    return bigram_nll_sql("documents", "text", "doc_id", k_smooth=0.5)


ORACLE_SQL["lm_surprising_docs"] = (
    _lm_ctes()
    + """
    SELECT id AS doc_id, n_bigrams, round(nll, 6) AS nll
    FROM scored
    ORDER BY round(nll, 6) DESC, id
    LIMIT 15
"""
)

ORACLE_SQL["lm_source_perplexity"] = (
    _lm_ctes()
    + """
    SELECT d.source,
           count(*) AS n_docs,
           sum(s.n_bigrams) AS n_bigrams,
           round(avg(s.nll), 6) AS avg_nll,
           round(exp(avg(s.nll)), 4) AS perplexity
    FROM scored s JOIN documents d ON s.id = d.doc_id
    GROUP BY d.source
    ORDER BY d.source
"""
)


# ---------------------------------------------------------------------------
# PCA embedding compression (trained-artifact family, like IVF/PQ/kmeans)
# ---------------------------------------------------------------------------

_PCA_M = 4
_PCA_SAMPLE = 2048


def _pca_model_cached(emb: DataFrame, sf_dir: str):
    from ..operators import pca as pc

    key = _emb_cache_key(sf_dir)
    if key not in _PCA_MODEL_CACHE:
        _PCA_MODEL_CACHE[key] = pc.pca_fit(
            emb, _PCA_M, sample_size=_PCA_SAMPLE
        )
    return _PCA_MODEL_CACHE[key]


def pca_label_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Low-rank compression quality per label: squared reconstruction
    error of the 4-component PCA basis, averaged within each embedding
    label — the per-domain signal that says which corpus slices a
    compressed index represents faithfully. Basis trained driver-side on
    the deterministic id-ordered sample (the IVF-artifact discipline);
    the scan-side error uses the orthonormal identity
    ``||x-mean||^2 - sum p_i^2`` as pure Column folds
    (operators/pca.py)."""
    from ..operators import pca as pc

    emb = _t(spark, sf_dir, "embeddings")
    mean, comps, _eigs, _evr = _pca_model_cached(emb, sf_dir)
    scored = pc.reconstruction_error(emb, mean, comps)
    return (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("err"), 6).alias("avg_err"),
        )
        .orderBy("label")
    )


def pca_component_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized variance along each trained component over the FULL
    corpus next to the sample eigenvalue and explained-variance ratio —
    the drift check between the persisted basis and the data it now
    serves (sample == corpus at gate scale, so realized ≈ eigenvalue;
    at 100 TB the gap is the retrain signal)."""
    from ..operators import pca as pc

    emb = _t(spark, sf_dir, "embeddings")
    mean, comps, eigs, evr = _pca_model_cached(emb, sf_dir)
    pr = pc.project(emb, mean, comps)
    agg = pr.agg(
        *[
            F.avg(F.col(f"p{i}") * F.col(f"p{i}")).alias(f"v{i}")
            for i in range(len(comps))
        ]
    )
    stacked = agg.selectExpr(
        "stack({n}, {args}) as (component, realized_var)".format(
            n=len(comps),
            args=", ".join(f"{i}, v{i}" for i in range(len(comps))),
        )
    )
    model = F.create_map(
        *[
            x
            for i in range(len(comps))
            for x in (F.lit(i), F.array(F.lit(eigs[i]), F.lit(evr[i])))
        ]
    )
    return (
        stacked.select(
            "component",
            F.round("realized_var", 6).alias("realized_var"),
            F.round(model[F.col("component")][0], 6).alias("eigenvalue"),
            F.round(model[F.col("component")][1], 6).alias("evr"),
        )
        .orderBy("component")
    )


QUERIES["pca_label_compression"] = pca_label_compression
QUERIES["pca_component_variance"] = pca_component_variance


def _pca_model_for_oracle(sf_dir: str):
    from ..operators.pca import pca_core

    return pca_core(_oracle_embeddings(sf_dir, limit=_PCA_SAMPLE), _PCA_M)


def _pca_err_expr(mean, comps) -> str:
    """The exact Spark-side error expression in DuckDB list arithmetic:
    same literals, same association order."""
    import numpy as _np

    from ..operators.pca import comp_sql, mean_sql

    mm = float(_np.dot(_np.asarray(mean), _np.asarray(mean)))
    p_terms = []
    for c in comps:
        md = float(_np.dot(_np.asarray(mean), _np.asarray(c)))
        # ::DOUBLE: a bare decimal literal types as DECIMAL (see
        # _pca_variance_oracle_sql) — promotion would still land on
        # DOUBLE here, but typed literals make that not depend on
        # DuckDB's promotion rules
        p_terms.append(
            f"(list_dot_product(d, {comp_sql(c)}) - ({md!r}::DOUBLE))"
        )
    proj2 = " + ".join(f"{p} * {p}" for p in p_terms)
    return (
        f"list_dot_product(d, d) - 2.0 * list_dot_product(d, {mean_sql(mean)})"
        f" + ({mm!r}::DOUBLE) - ({proj2})"
    )


def _pca_label_oracle_sql(sf_dir: str) -> str:
    mean, comps, _eigs, _evr = _pca_model_for_oracle(sf_dir)
    return f"""
        WITH e AS (
            SELECT label, embedding::DOUBLE[] AS d FROM embeddings
        )
        SELECT label,
               count(*) AS n_vecs,
               round(avg({_pca_err_expr(mean, comps)}), 6) AS avg_err
        FROM e GROUP BY label ORDER BY label
    """


def _pca_variance_oracle_sql(sf_dir: str) -> str:
    import numpy as _np

    from ..operators.pca import comp_sql

    mean, comps, eigs, evr = _pca_model_for_oracle(sf_dir)
    rows = []
    for i, c in enumerate(comps):
        md = float(_np.dot(_np.asarray(mean), _np.asarray(c)))
        # ::DOUBLE on every scalar literal: DuckDB types a bare decimal
        # VALUES literal as DECIMAL, whose string form keeps trailing
        # zeros ('0.021090') and hash-mismatches the float ('0.02109')
        # — surfaced by the sf1 probe, latent at smaller sfs
        rows.append(
            f"({i}, {comp_sql(c)}, {md!r}::DOUBLE,"
            f" {eigs[i]!r}::DOUBLE, {evr[i]!r}::DOUBLE)"
        )
    values = ",\n            ".join(rows)
    return f"""
        WITH model(i, c, mdotc, eig, evr) AS (VALUES
            {values}
        ), proj AS (
            SELECT m.i,
                   (list_dot_product(e.embedding::DOUBLE[], m.c) - m.mdotc)
                     AS p
            FROM embeddings e CROSS JOIN model m
        )
        SELECT CAST(p.i AS INTEGER) AS component,
               round(avg(p.p * p.p), 6) AS realized_var,
               round(any_value(m.eig), 6) AS eigenvalue,
               round(any_value(m.evr), 6) AS evr
        FROM proj p JOIN model m ON p.i = m.i
        GROUP BY p.i ORDER BY component
    """


# ---------------------------------------------------------------------------
# BPE tokenizer induction (trained-artifact family; integer-exact replay)
# ---------------------------------------------------------------------------

_BPE_N_MERGES = 12
_BPE_SAMPLE = 1024


def _bpe_sample(docs: DataFrame) -> DataFrame:
    return docs.orderBy("doc_id").limit(_BPE_SAMPLE)


def _docs_cache_key(sf_dir: str) -> tuple:
    """(path, 'documents', mtime) key for documents-derived artifacts —
    the embeddings-mtime key can't see a rewritten documents.parquet."""
    import os as _os

    path = _os.path.join(sf_dir, "documents.parquet")
    try:
        return (sf_dir, "documents", _os.path.getmtime(path))
    except OSError:
        return (sf_dir, "documents", None)


def _bpe_merges_cached(docs: DataFrame, sf_dir: str) -> list:
    from ..operators import bpe
    from ..operators.dedup import _release_ckpt

    key = _docs_cache_key(sf_dir)
    if key not in _BPE_MERGE_CACHE:
        merges, final = bpe.bpe_learn(
            _bpe_sample(docs), "text", _BPE_N_MERGES
        )
        _release_ckpt(final)
        _BPE_MERGE_CACHE[key] = merges
    return _BPE_MERGE_CACHE[key]


def bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table itself — distributed BPE training
    (iterated pair-count aggregations + Arrow-batched merge rewrites,
    operators/bpe.py) on the deterministic id-ordered sample. Every
    value is an exact integer or a string and the tie rule is total
    (count desc, pair lexicographic), so the oracle is an INDEPENDENT
    single-process replay of training (bpe_learn_py) — the
    kmeans-twin discipline, a stronger check than sharing artifacts."""
    docs = _t(spark, sf_dir, "documents")
    merges = _bpe_merges_cached(docs, sf_dir)
    return spark.createDataFrame(
        [(i + 1, a, b, int(c)) for i, (a, b, c) in enumerate(merges)],
        "merge_rank int, w1 string, w2 string, cnt long",
    )


def bpe_token_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide compression under the learned table: tokenize EVERY
    document with the sample-trained merges (one Arrow pass regardless
    of table length) and report sequence/symbol/vocab totals — the
    number a tokenizer build is accepted on. Integer-exact."""
    from ..operators import bpe

    docs = _t(spark, sf_dir, "documents")
    merges = _bpe_merges_cached(docs, sf_dir)
    return bpe.token_length_stats(
        bpe.token_occurrences(docs, "text", merges)
    )


QUERIES["bpe_learned_merges"] = bpe_learned_merges
QUERIES["bpe_token_compression"] = bpe_token_compression


# small enough that the validator's worst case (three distributed
# trainings) stays a single-digit-seconds gate query, large enough that
# the doubling ladder has three rungs (128 -> 256 -> 512) below the cap
_BPE_STABLE_PARAMS = {"n_merges": 4, "start": 128, "max_docs": 512}


def bpe_stable_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sequential-doubling sample validator AS a gate query
    (round-9 verdict #5): ``bpe.bpe_learn_stable`` runs its nested
    id-ordered doubling ladder on the corpus and the row exposes the
    full DECISION — sample size trained at, whether consecutive samples
    agreed (converged), whether the ladder hit the whole corpus
    (covered_corpus, where the table is exact by construction), the
    size it agreed with, and the learned table itself. The oracle is an
    INDEPENDENT single-process replay of the same ladder
    (bpe_learn_py per rung, same doubling and short-circuit rules), so
    the convergence decision — not just one trained table — is
    value-checked at the gate. On the word-soup gate corpus the honest
    outcome varies by scale: below the cap the ladder covers the corpus
    (exact); above it the noise ranking keeps disagreeing and the row
    must say converged=false."""
    from ..operators import bpe

    docs = _t(spark, sf_dir, "documents")
    key = _docs_cache_key(sf_dir)
    if key not in _BPE_STABLE_CACHE:
        _BPE_STABLE_CACHE[key] = bpe.bpe_learn_stable(
            docs, "doc_id", "text", **_BPE_STABLE_PARAMS
        )
    res = _BPE_STABLE_CACHE[key]
    table = "|".join(f"{a}+{b}" for a, b, _ in res["merges"])
    return spark.createDataFrame(
        [(
            int(res["sample_docs"]),
            bool(res["converged"]),
            bool(res["covered_corpus"]),
            None if res["agreed_with"] is None else int(res["agreed_with"]),
            len(res["merges"]),
            table,
        )],
        "sample_docs long, converged boolean, covered_corpus boolean, "
        "agreed_with long, n_merges long, merges string",
    )


QUERIES["bpe_stable_merges"] = bpe_stable_merges


def _oracle_documents(sf_dir: str, limit: int | None = None) -> list[str]:
    """Document texts OUTSIDE Spark in the trainers' sample order."""
    import duckdb

    con = duckdb.connect()
    sql = (
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet') "
        "ORDER BY doc_id"
    )
    if limit is not None:
        sql += f" LIMIT {limit}"
    rows = con.execute(sql).fetchall()
    con.close()
    return [r[0] for r in rows]




def _bpe_oracle_merges(sf_dir: str) -> list:
    """Single-process training replay, cached per documents mtime — the
    merges and compression builders both need it, and each replay
    re-reads the parquet and reruns the full n_merges training loop."""
    from ..operators.bpe import bpe_learn_py

    key = _docs_cache_key(sf_dir)
    if key not in _BPE_ORACLE_MERGE_CACHE:
        _BPE_ORACLE_MERGE_CACHE[key] = bpe_learn_py(
            _oracle_documents(sf_dir, limit=_BPE_SAMPLE), _BPE_N_MERGES
        )
    return _BPE_ORACLE_MERGE_CACHE[key]


def _sql_str(x: str) -> str:
    """SQL string literal with quote doubling (repr would emit Python
    escapes DuckDB can't parse)."""
    return "'" + x.replace("'", "''") + "'"


def _bpe_merges_oracle_sql(sf_dir: str) -> str:
    merges = _bpe_oracle_merges(sf_dir)
    if not merges:
        # types must match the non-empty branch (and the Spark frame's
        # int/long) even on the empty result, or the schema leg fails
        return (
            "SELECT CAST(1 AS INTEGER) AS merge_rank, '' AS w1, '' AS w2,"
            " CAST(1 AS BIGINT) AS cnt WHERE 1=0"
        )
    values = ",\n            ".join(
        f"({i + 1}, {_sql_str(a)}, {_sql_str(b)}, {c})"
        for i, (a, b, c) in enumerate(merges)
    )
    return f"""
        -- independent single-process replay of BPE training (same
        -- tokenizer, counts, tie rule, early stop) embedded as literals
        SELECT CAST(merge_rank AS INTEGER) AS merge_rank, w1, w2,
               CAST(cnt AS BIGINT) AS cnt
        FROM (VALUES
            {values}
        ) t(merge_rank, w1, w2, cnt)
    """


def _bpe_stable_oracle_sql(sf_dir: str) -> str:
    """Independent replay of the sequential-doubling validator: the
    same nested id-ordered prefixes (DuckDB ORDER BY doc_id mirrors the
    engine's orderBy — doc ids are unique, so the order is total), the
    same doubling ladder, the same covered-corpus short-circuit and
    convergence rule, each rung trained by the single-process
    ``bpe_learn_py`` replay — embedded as one literal row."""
    import duckdb

    from ..operators.bpe import bpe_learn_py

    p = _BPE_STABLE_PARAMS
    con = duckdb.connect()
    n_total = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    con.close()
    texts = _oracle_documents(sf_dir, limit=min(p["max_docs"], n_total))
    s = min(max(1, p["start"]), p["max_docs"])
    prev: list | None = None
    prev_size = 0
    while True:
        covered = s >= n_total
        merges = bpe_learn_py(texts[:s], p["n_merges"])
        table = [(a, b) for a, b, _ in merges]
        trained = min(s, n_total)
        if prev is not None and table == prev:
            res = (trained, True, covered, prev_size, merges)
            break
        if covered:
            res = (trained, True, True, None, merges)
            break
        prev, prev_size = table, trained
        if s >= p["max_docs"]:
            res = (trained, False, False, None, merges)
            break
        s = min(2 * s, p["max_docs"])
    trained, converged, covered, agreed, merges = res
    joined = "|".join(f"{a}+{b}" for a, b, _ in merges)
    aw = (
        "CAST(NULL AS BIGINT)"
        if agreed is None
        else f"CAST({agreed} AS BIGINT)"
    )
    return f"""
        -- independent single-process replay of the sequential-doubling
        -- sample validator (nested prefixes, doubling ladder,
        -- covered-corpus short-circuit, convergence rule)
        SELECT CAST({trained} AS BIGINT) AS sample_docs,
               {str(bool(converged)).upper()} AS converged,
               {str(bool(covered)).upper()} AS covered_corpus,
               {aw} AS agreed_with,
               CAST({len(merges)} AS BIGINT) AS n_merges,
               {_sql_str(joined)} AS merges
    """


def _bpe_compression_oracle_sql(sf_dir: str) -> str:
    from ..operators.bpe import MERGE_JOIN, _merge_seq, _tok_py

    merges = _bpe_oracle_merges(sf_dir)
    texts = _oracle_documents(sf_dir)
    n_seqs, total, vocab = 0, 0, set()
    for t in texts:
        if t is None:
            continue
        seq = _tok_py(t)
        for a, b, _c in merges:
            seq = _merge_seq(seq, a, b, a + MERGE_JOIN + b)
        n_seqs += 1
        total += len(seq)
        vocab.update(seq)
    return f"""
        -- full-corpus replay of tokenization under the learned table
        SELECT CAST({n_seqs} AS BIGINT) AS n_seqs,
               CAST({total} AS BIGINT) AS total_symbols,
               CAST({len(vocab)} AS BIGINT) AS distinct_symbols
    """


def build_artifact_oracles(sf_dir: str) -> dict[str, str]:
    """Oracle SQL for the four index-probe queries whose twins embed
    corpus-derived artifacts (hyperplane tables, IVF centroids, PQ
    codebooks, the ADC distance table): the artifacts are deterministic
    functions of (corpus sample, seed), so the SQL must be generated for
    the corpus it will run against. Consumers merge this over ORACLE_SQL
    with the sf_dir their gate uses (__spark_entry__ pins the driver's
    sf0.01; tests/test_queries_oracle passes its own).

    Accepted float-parity risk (same class as every raw-float threshold
    filter in the static oracles): the engine computes dots/distances
    with numpy (BLAS/pairwise summation) while DuckDB sums sequentially,
    so a plane dot within ~1 ulp of zero, a near-exact centroid-distance
    tie, or a cosine landing exactly on a rounding boundary could
    diverge. At the gate corpus (500-2000 vectors) the probability is
    ~1e-9 per run; the tie-break rules themselves (numpy argmin first
    index, array_max-over-structs last max) ARE replicated exactly."""
    # BOTH mtimes key the cache: the BPE members replay documents.parquet
    # (an embeddings-only key served stale BPE SQL after a documents
    # rewrite, and permanently omitted the members when documents.parquet
    # appeared after the first call)
    key = (_emb_cache_key(sf_dir), _docs_cache_key(sf_dir))
    if key not in _ARTIFACT_ORACLE_CACHE:
        _ARTIFACT_ORACLE_CACHE[key] = {
            "embedding_lsh_topk": _lsh_topk_oracle_sql(sf_dir),
            "embedding_ivf_topk": _ivf_topk_oracle_sql(sf_dir),
            "embedding_ivf_knn_join": _ivf_knn_join_oracle_sql(sf_dir),
            "embedding_pq_topk": _pq_topk_oracle_sql(sf_dir),
            "embedding_near_dup_lsh": _lsh_pairs_oracle_sql(sf_dir),
            "kmeans_corpus_clusters": _kmeans_oracle_sql(sf_dir),
            "kmeans_domain_profile": _kmeans_profile_oracle_sql(sf_dir),
            "pca_label_compression": _pca_label_oracle_sql(sf_dir),
            "pca_component_variance": _pca_variance_oracle_sql(sf_dir),
        }
        # the PageRank replay reads the relational tables, which planted
        # test corpora (embeddings-only dirs) don't carry — per-file gate
        if os.path.exists(os.path.join(sf_dir, "lineitem.parquet")):
            _ARTIFACT_ORACLE_CACHE[key]["pagerank_supplier_rank"] = (
                _pagerank_oracle_sql(sf_dir)
            )
            _ARTIFACT_ORACLE_CACHE[key]["lpa_supplier_communities"] = (
                _lpa_oracle_sql(sf_dir)
            )
            _ARTIFACT_ORACLE_CACHE[key]["kcore_supplier_stats"] = (
                _kcore_oracle_sql(sf_dir)
            )
        # the BPE replay reads documents.parquet, which embeddings-only
        # planted corpora don't carry — same per-file gate
        if os.path.exists(os.path.join(sf_dir, "documents.parquet")):
            _ARTIFACT_ORACLE_CACHE[key]["bpe_learned_merges"] = (
                _bpe_merges_oracle_sql(sf_dir)
            )
            _ARTIFACT_ORACLE_CACHE[key]["bpe_token_compression"] = (
                _bpe_compression_oracle_sql(sf_dir)
            )
            _ARTIFACT_ORACLE_CACHE[key]["bpe_stable_merges"] = (
                _bpe_stable_oracle_sql(sf_dir)
            )
    return _ARTIFACT_ORACLE_CACHE[key]
