"""KMV (k-minimum-values) sketches: mergeable distinct counts AND set
overlap (Jaccard / intersection) estimates, which HyperLogLog alone
can't give without inclusion-exclusion error blowup.

At 100 TB, computing the Jaccard similarity between the distinct-key
sets of every pair of segments (`|A ∩ B| / |A ∪ B|`) exactly means a
full-width shuffle of every distinct key per segment. A KMV sketch
keeps only the k smallest hash values of each set; because a uniform
hash makes "the k smallest of A ∪ B" a uniform random sample of the
union, the union sketch is computable FROM the per-set sketches alone
(k smallest of the concatenation), and the fraction of union-sketch
members present in both input sketches is an unbiased Jaccard
estimator (Beyer et al., "On Synopses for Distinct-Value Estimation
Under Multiset Operations", SIGMOD 2007). The shuffle then carries at
most ``n_groups x k`` rows regardless of key cardinality — the same
bounded-shuffle discipline as ``operators/hll`` — and sketches built
per partition/day/source merge by re-taking the k smallest.

Distinct estimate: with ``F_k`` = the k-th smallest hash mapped to a
(0,1) fraction, ``E = (k-1) / F_k`` (the classic KMV estimator); when a
set has fewer than k distinct keys the sketch IS the set and the count
is exact. Relative standard error ~ ``1/sqrt(k-2)`` (~9% at k=128).

Engine-portable determinism: hashes come from the md5 discipline shared
with bloom/hll/cms/minhash (``dedup.md5_signed64`` — the first 16 hex
chars of md5 as a signed two's-complement BIGINT). Signed
reinterpretation is order-preserving after the affine shift
``u = h + 2^63`` (exact in double? no — u is compared as INTEGER, only
the final fraction ``u / 2^64`` is float, and it feeds only the
reported estimate, never membership or ranking). Everything an oracle
compares structurally — sketch membership, overlap counts, union ranks
— is integer/string-exact; the lone float is the estimate itself,
rounded by callers.

Scale notes: the sketch build is one window (row_number per group over
hash order) after a distinct — both shuffle on the group key only; the
pairwise-overlap stage materializes ``n_groups^2 * k`` rows, which is
the intended regime (segments/domains/days, not per-user groups). For
high-cardinality group keys, estimate distincts with ``operators/hll``
and reserve KMV for the overlap questions it uniquely answers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5_signed64

TWO63 = 2**63
TWO64 = 2.0**64


def kmv_hash(key: Column | str, seed: str = "kmv") -> Column:
    """Signed-64 md5 hash of ``seed:key`` — the uniform order both the
    Spark plan and a SQL oracle derive identically (NULL keys hash to
    NULL and are dropped by the sketch builder, matching countDistinct).

    ``F.concat`` (not ``concat_ws``) so a NULL key propagates to a NULL
    hash, matching the ``'seed' || ':' || key`` twin in
    :func:`kmv_hash_sql` — ``concat_ws`` skips NULL args and would hash
    a NULL key to ``md5('kmv:')`` on the Spark side only.
    """
    key = F.col(key) if isinstance(key, str) else key
    return md5_signed64(F.concat(F.lit(seed), F.lit(":"), key.cast("string")))


def kmv_hash_sql(key_expr: str, seed: str = "kmv") -> str:
    """DuckDB twin of :func:`kmv_hash` (same hex→signed-64 scheme as the
    simhash/winnowing oracles)."""
    m = f"md5('{seed}' || ':' || CAST({key_expr} AS VARCHAR))"
    return (
        f"(CASE WHEN CAST(concat('0x', substr({m}, 1, 8)) AS BIGINT) >= 2147483648 "
        f"THEN CAST(concat('0x', substr({m}, 1, 8)) AS BIGINT) - 4294967296 "
        f"ELSE CAST(concat('0x', substr({m}, 1, 8)) AS BIGINT) END) * 4294967296 "
        f"+ CAST(concat('0x', substr({m}, 9, 8)) AS BIGINT)"
    )


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = 128,
    seed: str = "kmv",
    salt_buckets: int = 32,
) -> DataFrame:
    """(group_cols..., hv, rn) — the k smallest distinct key hashes per
    group, rank-numbered 1..k by hv (hashes are distinct by build).

    Build shape: ONE distinct over (group, hv) — hashing before the
    distinct means dedup-by-hash subsumes dedup-by-key (same key, same
    hv; distinct keys colliding to one hv is the sketch's 2^-64 error
    term, collapsed exactly like the oracle's ``SELECT DISTINCT group,
    hash(key)``), so the build pays one full-width shuffle, same as any
    distinct-count — then a SALTED two-phase top-k: rank within
    (group, hv mod S) first and keep k per salt, so no single task ever
    sorts a whole group's distinct set (a ``Window.partitionBy(group)``
    alone serializes each group through one task — the thing that
    breaks at 100 TB with few groups); the final per-group rank then
    runs over at most ``S x k`` survivors. Exact: the global k smallest
    are each the k-or-better smallest of their own salt bucket. After
    the filter at most ``n_groups x k`` rows flow anywhere.
    """
    group_cols = group_cols or []
    hv = kmv_hash(key_col, seed).alias("hv")
    hashed = (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, hv)
        .distinct()
    )
    w_salt = Window.partitionBy(*group_cols, "_salt").orderBy("hv")
    w = Window.partitionBy(*group_cols).orderBy("hv")
    return (
        hashed.withColumn("_salt", F.pmod(F.col("hv"), F.lit(salt_buckets)))
        .withColumn("_srn", F.row_number().over(w_salt))
        .filter(F.col("_srn") <= k)
        .drop("_salt", "_srn")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def _fraction(hv: Column) -> Column:
    """Map a signed-64 hash to its uniform (0,1) fraction — float ONLY
    here, feeding the reported estimate, never an ordering."""
    return (hv.cast("double") + F.lit(float(TWO63))) / F.lit(TWO64)


def kmv_estimate(
    sketch: DataFrame, group_cols: list[str] | None = None, k: int = 128
) -> DataFrame:
    """(group_cols..., n_sketch, est) from a :func:`kmv_sketch` frame.

    ``est = (k-1)/F_k`` when the sketch is full, else the sketch size
    itself (the set had < k distinct keys: exact).
    """
    group_cols = group_cols or []
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max(F.when(F.col("rn") == k, _fraction(F.col("hv")))).alias("fk"),
    )
    return agg.select(
        *group_cols,
        "n_sketch",
        F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.col("fk"))
        .alias("est"),
    )


def kmv_pair_overlap(
    sketch: DataFrame, group_col: str, k: int = 128
) -> DataFrame:
    """Pairwise set-overlap estimates between every pair of groups, from
    the per-group sketches ALONE (no second pass over the data).

    For each unordered pair (g1 < g2): re-rank the union of the two
    sketches by hash, keep the k smallest (the union sketch — a uniform
    sample of A ∪ B), and count how many of those k are present in both
    input sketches. Returns one row per pair:

    ``g1, g2, n_union_sketch, n_both, jaccard_est, union_est,
    intersection_est``

    where ``jaccard_est = n_both / n_union_sketch``, ``union_est`` is
    the KMV distinct estimate evaluated on the union sketch, and
    ``intersection_est = jaccard_est * union_est`` (Beyer et al. 2007,
    §4). A member of the union sketch that ranked beyond k in one
    input's ORIGINAL sketch is still counted correctly: presence flags
    come from the retained sketches, whose k-th smallest bound is never
    below the union sketch's — every union-sketch member small enough to
    matter survives in any input sketch that contains the key.

    Shuffle shape: the pair expansion is ``n_groups`` per sketch row
    (one row per (member, other-group)), grouped on (g1, g2, hv) — at
    sketch scale (``n_groups x k`` rows in), never data scale.
    """
    groups = sketch.select(F.col(group_col).alias("_g")).distinct()
    left = (
        sketch.join(groups, F.col(group_col) < F.col("_g"))
        .select(
            F.col(group_col).alias("g1"),
            F.col("_g").alias("g2"),
            "hv",
            F.lit(1).alias("in_a"),
            F.lit(0).alias("in_b"),
        )
    )
    right = (
        sketch.join(groups, F.col(group_col) > F.col("_g"))
        .select(
            F.col("_g").alias("g1"),
            F.col(group_col).alias("g2"),
            "hv",
            F.lit(0).alias("in_a"),
            F.lit(1).alias("in_b"),
        )
    )
    merged = (
        left.unionByName(right)
        .groupBy("g1", "g2", "hv")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("g1", "g2").orderBy("hv")
    union_sk = merged.withColumn("urn", F.row_number().over(w)).filter(
        F.col("urn") <= k
    )
    agg = union_sk.groupBy("g1", "g2").agg(
        F.count(F.lit(1)).alias("n_union_sketch"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        ).alias("n_both"),
        F.max(F.when(F.col("urn") == k, _fraction(F.col("hv")))).alias("fk"),
    )
    # single definition of each estimator; intersection derives from the
    # aliased columns in a second select (an inline repeat would let the
    # two copies drift under a future edit)
    return agg.select(
        "g1",
        "g2",
        "n_union_sketch",
        "n_both",
        (F.col("n_both") / F.col("n_union_sketch")).alias("jaccard_est"),
        F.when(
            F.col("n_union_sketch") < k, F.col("n_union_sketch").cast("double")
        )
        .otherwise(F.lit(float(k - 1)) / F.col("fk"))
        .alias("union_est"),
    ).withColumn(
        "intersection_est", F.col("jaccard_est") * F.col("union_est")
    )
