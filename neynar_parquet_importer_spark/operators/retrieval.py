"""BM25 full-text retrieval over a document corpus.

A training-data pipeline needs lexical retrieval in several places:
contamination checks (rank training docs against eval-set queries —
``corpus.contamination_overlap`` is the n-gram variant, this is the
scored one), dedup triage (find what an incoming doc most resembles),
and hard-negative mining for retrieval models (top-BM25 non-positives
are the classic negatives).  This module is the Okapi BM25 scorer as a
pure DataFrame composition — postings are rows, never an in-memory
index, so it scales like any other equi-join.

Plan shape at 100 TB:

- the postings table ``(doc_id, term, tf)`` is one explode + one
  hash-aggregate off the corpus scan, partitioned by term after the
  groupBy — exactly the layout an inverted index shards by;
- per-term document frequencies reuse the postings aggregate; corpus
  stats (N, avgdl) are two scalars broadcast as 1-row frames;
- a query set joins postings on ``term`` — the query side is tiny and
  broadcasts, so scoring touches ONLY the posting rows of query terms
  (the pushed-down equi-join is the "seek the posting lists" of a
  search engine, expressed declaratively);
- per-query top-k is a window rank partitioned by query_id: fine while
  queries are few and k small; for millions of queries use the
  two-phase chunked top-k discipline of ``similarity.knn_join``.

Determinism across engines: tf, dl, df, N are exact integers; avgdl is
an exact-integer sum / count; the idf/tf-norm chain is the same double
arithmetic on both sides.  The only order-sensitive step is summing the
per-term partials of docs matching >= 2 query terms, which can differ
by 1 ulp between engines — scores are therefore rounded (4 dp) BEFORE
ranking on both sides, with doc_id as the total-order tie-break, so the
top-k cut is cross-engine stable (a flip would need the ulp to straddle
a half-boundary of the 4th decimal).

Tokenization is the corpus-wide convention shared with the winnowing
family: lowercase, trim, split on whitespace runs (DuckDB twin:
``string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def term_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, tf): the inverted-index relation. One explode +
    one hash-aggregate; partial combine runs map-side so the shuffle
    carries distinct (doc, term) pairs, not token occurrences."""
    term = F.explode(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    ).alias("term")
    return (
        df.select(F.col(id_col).alias("doc_id"), term)
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, dl): document length as ONE codegen'd projection over the
    corpus scan — no explode, no aggregate, no shuffle.

    Exactly equal to ``postings.groupBy(doc_id).sum(tf)``: summing tf
    over a document's distinct terms counts its non-empty tokens, which
    is the size of the split-token array with empties removed. Docs with
    zero non-empty tokens have no posting rows, so they are filtered out
    here too. Passing this to :func:`bm25_scores` removes the full-corpus
    (doc, term) aggregate from the dl branch (r11, guide §2.1: the dl
    subtree was one of three independent evaluations of that aggregate
    per scoring run)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    dl = F.size(F.filter(toks, lambda t: t != ""))
    return (
        df.select(F.col(id_col).alias("doc_id"), dl.alias("dl"))
        .filter(F.col("dl") > 0)
    )


def query_frame(spark: SparkSession, queries: dict[str, list[str]]) -> DataFrame:
    """(query_id, term) from a literal query set — lowercased through
    the same convention as the postings so a mixed-case query term
    still matches."""
    rows = [
        (qid, t.strip().lower())
        for qid, terms in sorted(queries.items())
        for t in terms
    ]
    return spark.createDataFrame(rows, "query_id string, term string").distinct()


def bm25_scores(
    postings: DataFrame,
    query_terms: DataFrame,
    *,
    k1: float = K1,
    b: float = B,
    doc_lengths: DataFrame | None = None,
    prune_terms: list[str] | None = None,
) -> DataFrame:
    """(query_id, doc_id, score): Okapi BM25 with the standard
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf (never negative, unlike
    the raw Robertson form).  ``score`` is rounded to 4 dp — the
    cross-engine ranking contract, see module doc.

    ``doc_lengths``: a precomputed (doc_id, dl) frame (:func:`doc_lengths`
    — a pure projection over the corpus); without it dl is aggregated
    from ``postings``.  ``prune_terms``: the literal query-term values —
    when supplied, an ``isin`` filter on term is applied to ``postings``
    for the df and score branches, which Catalyst pushes BELOW the
    (doc, term) aggregate so only query-term tokens are aggregated at
    all (a broadcast join cannot be pushed through the aggregate, so
    without the literal list both branches re-aggregate the full
    corpus).  CONTRACT: ``prune_terms`` must be a SUPERSET of
    ``query_terms``' term values (derive both from the same literal
    dict, as the registered plans do via ``_BM25_TERMS``) — a term in
    ``query_terms`` but missing here is silently scored as absent from
    the corpus.  Under that contract results are identical either way:
    non-query-term posting rows only ever fed the dl sum, and extra
    prune terms are dropped by the query join.  With both supplied, no full-corpus
    (doc, term) aggregate remains in the plan — the "seek the posting
    lists" shape the module doc promises (r11, guide §2.1/§2.3)."""
    # postings is consumed three times (document lengths, per-term df,
    # the score join). A persist here LOST the r10 interleaved A/B
    # (min of 3: none 2.10 s / lazy 2.39 / eager 2.30 for the top-k
    # query) — the three subtrees overlap on idle cores and two of the
    # consumers reduce through broadcast joins, so the cache barrier
    # costs more than the recompute. At a corpus scale where the
    # tokenize scan is IO-bound, materialize postings ONCE as a table
    # (the standard inverted-index build) rather than caching inside
    # this operator.
    if prune_terms is not None:
        pruned = postings.filter(
            F.col("term").isin([t.strip().lower() for t in prune_terms])
        )
    else:
        pruned = postings
    if doc_lengths is not None:
        dl = doc_lengths
    else:
        dl = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfreq = (
        pruned.join(F.broadcast(query_terms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    idf = (
        dfreq.crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.log(
                1
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
            "avgdl",
        )
    )
    matched = (
        pruned.join(F.broadcast(query_terms), "term")
        .join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        matched.select(
            "query_id", "doc_id", (F.col("idf") * tf_norm).alias("partial")
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("partial"), 4).alias("score"))
    )


def bm25_topk(
    postings: DataFrame,
    query_terms: DataFrame,
    k: int = 5,
    *,
    k1: float = K1,
    b: float = B,
    doc_lengths: DataFrame | None = None,
    prune_terms: list[str] | None = None,
) -> DataFrame:
    """(query_id, rank, doc_id, score): top-k docs per query by rounded
    score, doc_id tie-break.  Window per query_id — see module doc for
    when to switch to chunked top-k.  ``doc_lengths``/``prune_terms``
    forward to :func:`bm25_scores`."""
    scores = bm25_scores(
        postings,
        query_terms,
        k1=k1,
        b=b,
        doc_lengths=doc_lengths,
        prune_terms=prune_terms,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("doc_id")
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def bm25_oracle_sql(
    queries: dict[str, list[str]],
    k: int = 5,
    *,
    k1: float = K1,
    b: float = B,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin replaying postings, stats, idf, tf-norm, and the
    rounded-score ranking from the same corpus."""
    # SQL-escape single quotes ('' doubling): a natural-language term
    # like "don't" would otherwise render a malformed VALUES clause and
    # the parity check could not run for exactly the apostrophe-bearing
    # queries the Spark side handles fine
    def _q(s: str) -> str:
        return s.replace("'", "''")

    qvals = ",\n            ".join(
        f"('{_q(qid)}', '{_q(t.strip().lower())}')"
        for qid, terms in sorted(queries.items())
        for t in terms
    )
    return f"""
        WITH toks AS (
            SELECT {id_col} AS doc_id,
                   unnest(string_split_regex(trim(lower({text_col})), '[ \\t\\n\\x0b\\f\\r]+')) AS term
            FROM {table}
        ), postings AS (
            SELECT doc_id, term, count(*) AS tf
            FROM toks WHERE term <> '' GROUP BY 1, 2
        ), dl AS (
            SELECT doc_id, sum(tf) AS dl FROM postings GROUP BY 1
        ), stats AS (
            SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
        ), q(query_id, term) AS (VALUES
            {qvals}
        ), qterms AS (SELECT DISTINCT query_id, term FROM q),
        dfreq AS (
            SELECT term, count(DISTINCT doc_id) AS df
            FROM postings
            WHERE term IN (SELECT DISTINCT term FROM qterms)
            GROUP BY 1
        ), idf AS (
            SELECT term,
                   ln(1 + (n_docs - df + 0.5) / (df + 0.5)) AS idf,
                   avgdl
            FROM dfreq, stats
        ), scored AS (
            SELECT qterms.query_id, p.doc_id,
                   round(sum(idf.idf * (p.tf * ({k1} + 1)) /
                             (p.tf + {k1} * (1 - {b} + {b} * dl.dl / idf.avgdl))), 4)
                     AS score
            FROM postings p
            JOIN qterms ON p.term = qterms.term
            JOIN idf ON p.term = idf.term
            JOIN dl ON p.doc_id = dl.doc_id
            GROUP BY 1, 2
        ), ranked AS (
            SELECT query_id, doc_id, score,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, doc_id) AS rank
            FROM scored
        )
        SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
    """


# --------------------------------------------------------------------------
# Hybrid retrieval fusion (reciprocal-rank fusion)
# --------------------------------------------------------------------------

RRF_K = 60
RRF_SCALE = 1_000_000_000


def rrf_fuse(
    rankings: list[DataFrame], k_rrf: int = RRF_K, k: int | None = None
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack & Clarke, SIGIR'09) over any
    number of (query_id, doc_id, rank) ranking frames — the standard way
    to combine lexical (BM25) and dense (embedding) retrieval without
    score calibration, since it consumes only RANKS.

    Cross-engine exactness: the textbook score sum(1/(k+rank)) is a float
    whose summation order varies; here each contribution is the exact
    integer ``RRF_SCALE DIV (k_rrf + rank)`` and the fused score is an
    integer SUM — associative, engine-independent, and monotone-identical
    to the float version for any rank < RRF_SCALE**0.5. Final order:
    (rrf_fp DESC, doc_id) — a total order, so the top-k cut is stable.

    Plan shape: a unionByName of the (tiny) per-system top-k frames, one
    hash aggregate on (query_id, doc_id), one per-query window rank. At
    scale the inputs are already k rows per query per system, so the
    fusion cost is negligible next to the retrieval legs."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking frame")
    cols = ["query_id", "doc_id", "rank"]
    unioned = rankings[0].select(*cols)
    for r in rankings[1:]:
        unioned = unioned.unionByName(r.select(*cols))
    contrib = F.expr(f"CAST({RRF_SCALE} DIV ({k_rrf} + rank) AS BIGINT)")
    fused = unioned.groupBy("query_id", "doc_id").agg(
        F.sum(contrib).alias("rrf_fp"),
        F.count(F.lit(1)).alias("n_systems"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_fp"), F.col("doc_id")
    )
    out = fused.withColumn("rank", F.row_number().over(w))
    if k is not None:
        out = out.filter(F.col("rank") <= k)
    return out.select("query_id", "rank", "doc_id", "rrf_fp", "n_systems")
