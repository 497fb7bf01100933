"""Hashed linear text classifier — fastText-style scoring plumbing.

The standard quality gate in large pretraining pipelines is a linear
classifier over hashed bag-of-words features (fastText's trick: no
vocabulary file, just ``hash(token) mod n_buckets`` into a weight
table).  Training happens offline; what the 100 TB engine must do well
is *inference*: tokenize, hash, join the weight table, average — all
JVM-side, one shuffle.

This module implements exactly that join shape.  Weights are any
``(bucket: long, w_milli: long)`` DataFrame — integer milli-units, not
floats, so the per-document sum is exact int64 arithmetic and the final
logit is a single deterministic double division; summation order can
never flip a value hash, which is what makes the whole family
oracle-checkable without rounding tolerances.  A deterministic
pseudo-trained table (:func:`pseudo_weights`, derived from md5 of the
bucket index) stands in for a trained model in tests and oracles; swap
in a real table and nothing else changes.

Tokenization is the 1-gram case of the corpus-wide contract
(``dedup._shingle_stream``): whitespace split of ``trim(lower(text))``.
Bucket hashing reuses the engine-portable md5-half discipline
(``bloom._md5_halves``): bucket = h1 mod n_buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bloom import _md5_halves
from .text import _tokens


def pseudo_weights(
    spark: SparkSession, n_buckets: int = 4096, scale_milli: int = 1000
) -> DataFrame:
    """Deterministic stand-in weight table ``(bucket, w_milli)`` with
    ``w_milli = (h2(md5(bucket)) mod (2*scale+1)) - scale`` — uniform in
    [-scale, +scale], reproducible on any engine from the same md5.
    Built with ``spark.range`` so even a 2^24-bucket table never exists
    driver-side."""
    _, h2 = _md5_halves(F.col("id").cast("string"))
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (F.pmod(h2, F.lit(2 * scale_milli + 1)) - scale_milli).alias("w_milli"),
    )


def token_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 4096,
) -> DataFrame:
    """(id_col, bucket) per token occurrence."""
    # ONE definition of the tokenization contract: text._tokens is the
    # corpus-wide whitespace tokenizer (also the 1-gram base of
    # dedup._shingle_stream); reusing it keeps the classifier's buckets
    # from silently diverging if the contract ever changes
    tok = df.select(
        F.col(id_col),
        F.explode(_tokens(F.col(text_col))).alias("tok"),
    # drop the empty token split() yields on whitespace-only text: an
    # empty doc would otherwise get n_terms=1 and the arbitrary pseudo-
    # weight of bucket md5('') as its quality logit — inconsistent with
    # text.token_count (0) and retrieval.term_postings (filters '').
    # Empty docs therefore emit NO classifier row: "no terms to score",
    # for the caller's empty-doc policy to handle explicitly.
    ).filter(F.col("tok") != "")
    h1, _ = _md5_halves(F.col("tok"))
    return tok.select(id_col, F.pmod(h1, F.lit(n_buckets)).alias("bucket"))


def classify(
    df: DataFrame,
    weights: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 4096,
    scale_milli: int = 1000,
    broadcast_weights: bool = True,
) -> DataFrame:
    """(id, n_terms, logit) — mean hashed-bucket weight per document.

    ``logit = sum(w_milli) / (scale_milli * n_terms)`` as ONE double
    division over an exact int64 sum.  Buckets absent from ``weights``
    (a pruned trained model) contribute 0 — the left join + coalesce is
    the standard sparse-model inference semantics.  The weight join is
    broadcast by default (a 2^22-bucket table is ~64 MB); pass
    ``broadcast_weights=False`` past that and it becomes a plain
    equi-join on the bucket key."""
    w = F.broadcast(weights) if broadcast_weights else weights
    joined = token_buckets(df, text_col, id_col, n_buckets).join(
        w, "bucket", "left"
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms"),
        # exact int64 — the value-hashable form (a rounded float logit sits
        # on round-half boundaries that Spark (HALF_UP on the decimal
        # string) and other engines (nearest on the binary double) break
        # differently; the sf0.01 corpus hit one at -0.0317125)
        F.sum(F.coalesce(F.col("w_milli"), F.lit(0))).alias("w_milli_sum"),
        (
            F.sum(F.coalesce(F.col("w_milli"), F.lit(0)))
            / (F.lit(float(scale_milli)) * F.count(F.lit(1)))
        ).alias("logit"),
    )
