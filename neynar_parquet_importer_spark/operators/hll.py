"""HyperLogLog: mergeable distinct-count sketches with a bounded shuffle.

At 100 TB, ``countDistinct(key)`` over a high-cardinality key shuffles
every distinct value; a HyperLogLog register table compresses the whole
distinct set into ``m = 2^p`` max-registers, so the shuffle carries at
most ``groups x m`` rows no matter how many distinct keys exist, and
sketches from different partitions/days/sources merge by a plain
``max`` per register — the same mergeable-summary discipline as the
count-min sketch (``operators/cms``) applies to frequencies.

Spark ships ``approx_count_distinct`` (HLL++ in the JVM); this module
exists for the two things the built-in can't do:

1. **materialized, mergeable register tables** — the register frame is a
   first-class DataFrame a pipeline can persist per source/day and union
   later (register-wise max), which ``approx_count_distinct``'s opaque
   binary buffer doesn't expose to SQL consumers;
2. **engine-portable determinism** — registers derive from the md5
   discipline shared with bloom/cms/minhash (``bloom._md5_halves``), so
   another engine replays bucket, rank, and estimate bit-for-bit and the
   whole family is value-checkable against a SQL twin with no tolerance
   band (the built-in's xxhash64-based buffer is JVM-internal).

Portable arithmetic, chosen so every step is integer-exact or
order-independent across engines:

- bucket ``j = h1 mod m``; rank ``rho = 33 - bitlen(h2)`` (+1-based
  leading-zero count of the 32-bit half, 33 when ``h2 = 0``) — bitlen
  via ``length(bin(x))``, pure integer/string ops, no float log;
- registers ``M_j = max(rho)`` per bucket: commutative, order-free;
- the harmonic sum ``S = sum(2^-M_j)`` over ``m <= 2^10`` registers with
  ``M_j <= 33`` needs at most 43 mantissa bits for any partial sum, so
  double addition is EXACT and summation order can't change it (the
  reason ``p`` is capped at 10 here);
- estimate ``E = alpha_m * m^2 / S`` with the standard small-range
  correction ``E = m * ln(m / V)`` when ``E <= 2.5 m`` and some register
  is empty (``V`` = empty-register count). ``ln`` is the only
  non-exact step and only ever feeds the reported value, never a
  branch — the branch condition compares the exact-S estimate. The
  32-bit large-range correction is deliberately omitted: rank is derived
  from a 32-bit half, so beyond ~10^8 distinct keys per group raise
  ``p`` / switch halves rather than patch the curve.

Standard error is the classic ``1.04 / sqrt(m)`` (~3.2% at p=10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .bloom import _md5_halves

MAX_P = 10  # keeps the harmonic sum exact in doubles (see module doc)


def _alpha(m: int) -> float:
    """Bias constant from the HLL paper (Flajolet et al. 2007)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _bucket_and_rank(key: Column, p: int) -> tuple[Column, Column]:
    """(bucket, rho) from the two 32-bit md5 halves: bucket from h1,
    rank from h2 so the two are independent. bitlen via the binary
    string — integer-exact, engine-portable (``length(bin(x))``)."""
    h1, h2 = _md5_halves(key)
    bucket = F.pmod(h1, F.lit(1 << p)).alias("bucket")
    rho = (
        F.when(h2 == 0, F.lit(33))
        .otherwise(F.lit(33) - F.length(F.bin(h2)))
        .alias("rho")
    )
    return bucket, rho


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 10,
) -> DataFrame:
    """(group_cols..., bucket, register) — the sketch as a DataFrame.

    One hash-aggregate: partial max runs map-side, so the shuffle
    carries at most ``n_groups * 2^p`` rows regardless of key
    cardinality — this is the whole point at scale. Empty buckets are
    absent rows (the estimator reconstructs them as zeros).
    """
    if not 4 <= p <= MAX_P:
        raise ValueError(f"p must be in [4, {MAX_P}], got {p}")
    group_cols = group_cols or []
    bucket, rho = _bucket_and_rank(F.col(key_col), p)
    return (
        # NULL keys are ignored, matching countDistinct (md5(NULL) would
        # otherwise yield a NULL-bucket row that hll_estimate counts in
        # n_present, shrinking S/V and biasing the estimate upward)
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, bucket, rho)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Union sketches: register-wise max across whatever grouping
    remains. Dropping a group column from ``group_cols`` merges its
    sketches — e.g. per-(source, day) registers roll up to per-source.
    """
    group_cols = group_cols or []
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("register").alias("register")
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    p: int = 10,
) -> DataFrame:
    """(group_cols..., estimate) from a register frame.

    Absent buckets count as zero registers: ``S += (m - present)`` and
    ``V = m - present`` reconstruct them without materializing empties.
    """
    if not 4 <= p <= MAX_P:
        raise ValueError(f"p must be in [4, {MAX_P}], got {p}")
    group_cols = group_cols or []
    m = 1 << p
    alpha = _alpha(m)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("register"))).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    s = F.col("s_present") + (F.lit(m) - F.col("n_present"))
    v = F.lit(m) - F.col("n_present")
    raw = F.lit(alpha * m * m) / s
    small = (raw <= 2.5 * m) & (v > 0)
    est = F.when(small, F.lit(float(m)) * F.log(F.lit(float(m)) / v)).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 4).alias("estimate"))


def hll_oracle_sql(
    table: str,
    key_expr: str,
    group_cols: list[str] | None = None,
    p: int = 10,
    where: str = "",
) -> str:
    """DuckDB twin replaying bucket/rank/registers/estimate from the
    same md5 hex — the independent-check discipline of ``bloom`` /
    ``cms`` applied to HLL. ``key_expr`` must match the Spark side's
    pre-hash cast exactly (md5 is byte-sensitive)."""
    m = 1 << p
    alpha = _alpha(m)
    group_cols = group_cols or []
    gsel = "".join(f"{c}, " for c in group_cols)
    gby = ("GROUP BY " + ", ".join(group_cols)) if group_cols else ""
    gby_bucket = "GROUP BY " + ", ".join([*group_cols, "bucket"])
    null_guard = f"({key_expr}) IS NOT NULL"
    where = (
        f"{where} AND {null_guard}" if where.strip() else f"WHERE {null_guard}"
    )
    return f"""
        WITH halves AS (
            SELECT {gsel}
                   CAST('0x'||substr(md5({key_expr}), 1, 8) AS BIGINT) AS u1,
                   CAST('0x'||substr(md5({key_expr}), 9, 8) AS BIGINT) AS u2
            FROM {table} {where}
        ), regs AS (
            SELECT {gsel} u1 % {m} AS bucket,
                   max(CASE WHEN u2 = 0 THEN 33 ELSE 33 - length(bin(u2)) END) AS register
            FROM halves {gby_bucket}
        ), agg AS (
            SELECT {gsel}
                   sum(power(2.0, -register)) + ({m} - count(*)) AS s,
                   {m} - count(*) AS v
            FROM regs {gby}
        )
        SELECT {gsel}
               round(CASE WHEN (CAST({alpha!r} AS DOUBLE) * {m} * {m} / s) <= 2.5 * {m} AND v > 0
                          THEN {m}.0 * ln({m}.0 / v)
                          ELSE CAST({alpha!r} AS DOUBLE) * {m} * {m} / s END, 4) AS estimate
        FROM agg
    """
