"""Corpus-trained n-gram language-model scoring: the CCNet-style
quality filter (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", 2020) re-expressed as plain
Spark aggregations — train bigram statistics ON the corpus, then score
every document by its average negative log-probability (its perplexity
under the corpus model). Documents whose text is "surprising" relative
to the corpus (boilerplate soup, encoding damage, wrong-language
fragments) surface at the high-NLL tail; the low tail is the most
templated text. Both tails are standard pretraining-curation cut
points.

Why Spark-first beats a driver-side LM here: training IS two
aggregations (unigram and bigram occurrence counts — map-side partial,
shuffle bounded by vocabulary, not corpus, size), and scoring is a join
of the per-document bigram stream against those count tables. Nothing
leaves the JVM; no UDF. At 100 TB the count tables are the only state,
they're reusable DataFrames a pipeline persists once and scores any
number of corpora against, and the scoring join shuffles on the bigram
key — skew on stop-word bigrams is the known hot spot, which AQE's
skew-join splitting handles (the count side is also a candidate for
broadcast when the vocabulary fits).

Model, chosen engine-portable and oracle-replayable:

- tokens: Spark ``split(trim(lower(text)), '\\s+')`` (Java ``\\s`` ==
  ``[ \\t\\n\\x0b\\f\\r]``); the DuckDB twin spells the class out because
  RE2 ``\\s`` lacks U+000B — the same pin every tokenizer twin uses;
- bigram occurrences keep duplicates (counts are multiset counts);
- add-k smoothing: ``P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k*V)`` with
  ``c(w1)`` the FULL unigram occurrence count and ``V`` the distinct
  vocabulary size. Self-trained scoring means every bigram's words
  exist in the counts — no OOV branch;
- per-document score: ``nll = avg(-ln P)`` over the document's bigram
  occurrences; ``ppx = exp(nll)``. Documents with fewer than 2 tokens
  carry no bigram and drop out of the scored frame.

Float-parity scope: counts, V, and every ratio numerator/denominator
are integer-exact; ``ln`` and the per-document mean are the only float
steps (the same accepted class as every rounded-score twin in
plans/queries.py — callers round to 6 decimals).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def bigram_stream(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per bigram OCCURRENCE: ``(id, w1, w2)`` — duplicates
    preserved. Documents with < 2 tokens contribute nothing."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("w1"),
        F.slice(toks, 2, n - 1).alias("w2"),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(pairs).alias("p"))
        .select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def unigram_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(w, c1): occurrence counts over ALL token positions — one
    hash-aggregate, shuffle bounded by vocabulary size."""
    toks = _tokens(F.col(text_col))
    return (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )


def bigram_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(w1, w2, c12): bigram occurrence counts."""
    return (
        bigram_stream(df, text_col, id_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )


def doc_nll(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k_smooth: float = 0.5,
) -> DataFrame:
    """(id, n_bigrams, nll): per-document average negative
    log-probability under the corpus-trained add-k bigram model.

    Plan shape: the bigram stream joins the bigram count table on
    (w1, w2) and the unigram table on w1 — both hash joins keyed on
    model-table keys (broadcast candidates when the vocab fits), then
    one per-document aggregate. V arrives as a scalar via a crossJoin
    of a 1-row frame (a broadcast, not a driver collect)."""
    big = bigram_stream(df, text_col, id_col)
    uni = unigram_counts(df, text_col)
    # counts from the SAME stream frame — a bigram_counts(df, ...) call
    # would carry a second full tokenize/zip/explode subtree in the plan
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    v = uni.agg(F.count(F.lit(1)).alias("v"))
    scored = (
        big.join(bc, ["w1", "w2"])
        .join(uni, big["w1"] == uni["w"])
        .crossJoin(F.broadcast(v))
        .select(
            "id",
            (
                -F.log(
                    (F.col("c12") + F.lit(k_smooth))
                    / (F.col("c1") + F.lit(k_smooth) * F.col("v"))
                )
            ).alias("nl"),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("nl").alias("nll"),
    )


def bigram_nll_sql(
    table: str, text_expr: str, id_expr: str, k_smooth: float = 0.5
) -> str:
    """DuckDB CTE block replaying the full model — tokenizer, multiset
    counts, smoothing, per-occurrence join — ending in a ``scored``
    relation ``(id, n_bigrams, nll)``. Callers append their SELECT."""
    return f"""
    WITH toks AS (
        SELECT {id_expr} AS id,
               string_split_regex(trim(lower({text_expr})), '[ \\t\\n\\x0b\\f\\r]+') AS l
        FROM {table}
    ), big AS (
        SELECT id, l[i] AS w1, l[i + 1] AS w2
        FROM toks, LATERAL unnest(generate_series(1, len(l) - 1)) t(i)
        WHERE len(l) >= 2
    ), uni AS (
        SELECT w, count(*) AS c1
        FROM (SELECT unnest(l) AS w FROM toks) GROUP BY w
    ), bc AS (
        SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2
    ), vocab AS (
        SELECT count(*) AS v FROM uni
    ), occ AS (
        SELECT b.id,
               -ln((bc.c12 + {k_smooth}) / (u.c1 + {k_smooth} * vocab.v)) AS nl
        FROM big b
        JOIN bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
        JOIN uni u ON b.w1 = u.w
        CROSS JOIN vocab
    ), scored AS (
        SELECT id, count(*) AS n_bigrams, avg(nl) AS nll
        FROM occ GROUP BY id
    )
    """
