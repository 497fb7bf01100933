"""Z-order (Morton) layout: multi-dimensional clustering for file skip.

At 100 TB the cheapest query is the one that never reads the file:
parquet min/max footer stats prune a scan only if the row layout makes
per-file ranges TIGHT on the filtered columns.  Sorting by one column
gives tight ranges on that column and useless ones on every other;
interleaving the bits of two (or more) columns into a Morton z-value
and range-partitioning on it gives every co-sorted file a bounded
rectangle in BOTH dimensions — the layout trick behind Delta/Iceberg
``OPTIMIZE ZORDER BY``, built here from plain Column bit arithmetic.

Everything is exact integer ops (shift/and/or), so layouts and their
skip-profile audits replay as static ANSI SQL — no UDF, pure
whole-stage codegen.

``zorder_profile`` is the audit: bucket rows by z-range (the file
boundaries a writer would use) and report each bucket's bounding box
and its share of each dimension's domain.  Tight boxes (share ~
1/sqrt(n_buckets) per dim for uniform data, vs 1.0 for the unsorted
dimension of a single-column sort) are the direct evidence a
predicate on EITHER dimension will skip most buckets.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .parallelism import fan_out


def morton_z(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: x in even
    positions, y in odd. Callers must pre-scale dims into [0, 2^bits)
    (values beyond wrap into high bits and break locality, so clamp or
    quantize first). Inputs are widened to LONG first — on an
    IntegerType column the bit-31 term would otherwise wrap to
    Integer.MIN_VALUE and the z-value would go negative."""
    x, y = x.cast("long"), y.cast("long")
    terms = [
        F.shiftleft(
            F.shiftright(c, i).bitwiseAND(F.lit(1)), 2 * i + off
        )
        for i in range(bits)
        for off, c in ((0, x), (1, y))
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def morton_z_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical interleave as an ANSI SQL expression (oracle twin /
    pushdown into engines without the Column API)."""
    terms = [
        f"((({c} >> {i}) & 1) << {2 * i + off})"
        for i in range(bits)
        for off, c in ((0, x), (1, y))
    ]
    return " | ".join(terms)


def quantize_dim(c: Column, cmin: Column, cmax: Column, bits: int = 16) -> Column:
    """Affine-map an integer dimension onto [0, 2^bits): what a z-order
    writer does before interleaving, so both dims spread over the full
    bit budget regardless of their natural ranges. Exact integer
    arithmetic (``div``), replayable as ``((c - cmin) * (2^bits - 1)) //
    range`` — callers pass the GLOBAL min/max (two scalar aggregates,
    broadcast), making the mapping a pure function of the corpus."""
    # DECIMAL(38,0) for the scale-up: (c - cmin) * (2^bits - 1) in LONG
    # overflows int64 once the span passes ~2^47 at bits=16 — an
    # epoch-nanos dimension spanning a year (~2^55) dies with
    # ARITHMETIC_OVERFLOW under ANSI and silently wraps without it.
    # 128-bit decimal holds span * 2^bits (< 1e24) with room to spare,
    # and +,*,compare on decimal(38,0) are exact.
    span = F.greatest(cmax - cmin, F.lit(1)).cast("decimal(38,0)")
    scaled = (c - cmin).cast("decimal(38,0)") * F.lit((1 << bits) - 1)
    # exact integer floor-division: decimal division rounds to scale 6,
    # so a quotient within 1e-6 of an integer can floor wrong — the
    # +-1 correction below re-derives the exact floor with exact
    # decimal multiply/compare (q <= 2^bits - 1, q * span < 1e24).
    q0 = F.floor(scaled / span).cast("long")
    q1 = F.when(q0.cast("decimal(38,0)") * span > scaled, q0 - 1).otherwise(q0)
    return F.when(
        (q1 + 1).cast("decimal(38,0)") * span <= scaled, q1 + 1
    ).otherwise(q1)


def zorder_profile(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    bits: int = 16,
    n_buckets: int = 64,
) -> DataFrame:
    """(bucket, n_rows, x_min, x_max, y_min, y_max, x_span, y_span):
    the per-file bounding boxes a z-range writer would produce.

    ``n_buckets`` must be a power of two <= 2^(2*bits); the bucket is
    the top log2(n_buckets) bits of the z-value — exactly the split
    points of an equal-width z-range partitioning."""
    z = morton_z(F.col(x_col), F.col(y_col), bits)
    return (
        df.select(
            zbucket_of(z, bits=bits, n_buckets=n_buckets).alias("bucket"),
            F.col(x_col).alias("x"),
            F.col(y_col).alias("y"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        .select(
            "bucket",
            "n_rows",
            "x_min",
            "x_max",
            "y_min",
            "y_max",
            (F.col("x_max") - F.col("x_min")).alias("x_span"),
            (F.col("y_max") - F.col("y_min")).alias("y_span"),
        )
        .orderBy("bucket")
    )


def _zbucket_shift(bits: int, n_buckets: int) -> int:
    """Validate and return the top-bits shift — THE single definition of
    the equal-width z-range split rule (profile, writer, and any oracle
    replay all route through here)."""
    if (
        n_buckets < 1
        or n_buckets > (1 << (2 * bits))
        or n_buckets & (n_buckets - 1)
    ):
        raise ValueError(
            f"n_buckets must be a power of two in [1, 2^{2 * bits}],"
            f" got {n_buckets}"
        )
    return 2 * bits - n_buckets.bit_length() + 1


def zbucket_of(z: Column, *, bits: int = 16, n_buckets: int = 64) -> Column:
    """Bucket id from an ALREADY-COMPUTED Morton value — lets callers
    that also need ``z`` avoid building the 64-term interleave
    expression twice."""
    return F.shiftright(z, _zbucket_shift(bits, n_buckets))


def zorder_bucket(
    x: Column, y: Column, *, bits: int = 16, n_buckets: int = 64
) -> Column:
    """Equal-width z-range bucket id: the top log2(n_buckets) bits of
    the Morton value — the SAME split rule :func:`zorder_profile`
    audits, shared by the profile and the writer so the audit describes
    exactly the files the writer cuts. Deterministic closed-form
    arithmetic (unlike ``repartitionByRange``, whose sampled boundaries
    are not replayable by an oracle)."""
    return zbucket_of(
        morton_z(x, y, bits), bits=bits, n_buckets=n_buckets
    ).alias("zbucket")


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    *,
    bits: int = 16,
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """THE WRITE PATH for the z-order layout (the profile's claims made
    physical): quantize both dims onto the full bit budget from their
    global min/max (two scalar aggregates, broadcast), Morton-
    interleave, cut equal-width z-range buckets, and write one
    ``zbucket=<i>/`` partition directory per bucket with rows z-sorted
    inside.

    Layout properties a reader gets for free:

    - directory-level pruning: ``zbucket`` is a physical partition
      column, so a predicate rewritten to z-ranges prunes at the
      LISTING level before any footer is opened;
    - footer-level pruning on the DATA columns: each bucket is a
      bounded rectangle in (x, y), so parquet min/max row-group stats
      are tight in BOTH dims — a filter on either column skips most
      row groups (measured: scale_study --zorder-skip);
    - within-file z-sort keeps row groups inside a bucket tight too
      (row-group stats are per ~128 MB chunk, not per file).

    One shuffle (hash repartition on the bucket id — every bucket's
    rows into one task so each directory holds one file per write),
    then a per-partition sort; both scale linearly. At 100 TB pick
    n_buckets so a bucket ~ a few row groups (the same sizing rule as
    the lake sink's hash buckets)."""
    # the Morton interleave is ~64 bitwise terms per row over quantize
    # subexpressions — compute-dense relative to bytes, so a single-split
    # input must be spread before the map stage (parallelism.fan_out is
    # a no-op once the input arrives multi-split)
    base = fan_out(
        df.select(
            "*",
            F.col(x_col).cast("long").alias("__zx"),
            F.col(y_col).cast("long").alias("__zy"),
        )
    )
    rng = base.agg(
        F.min("__zx").alias("__xmin"),
        F.max("__zx").alias("__xmax"),
        F.min("__zy").alias("__ymin"),
        F.max("__zy").alias("__ymax"),
    )
    q = base.crossJoin(F.broadcast(rng))
    qx = quantize_dim(F.col("__zx"), F.col("__xmin"), F.col("__xmax"), bits)
    qy = quantize_dim(F.col("__zy"), F.col("__ymin"), F.col("__ymax"), bits)
    # one Morton tree: __z is computed once and the bucket derives from
    # it by a shift (the interleave is ~64 bitwise terms over decimal
    # quantize subexpressions — building it twice doubled the plan)
    bucketed = (
        q.withColumn("__z", morton_z(qx, qy, bits))
        .withColumn(
            "zbucket",
            zbucket_of(F.col("__z"), bits=bits, n_buckets=n_buckets),
        )
        .drop("__zx", "__zy", "__xmin", "__xmax", "__ymin", "__ymax")
    )
    (
        bucketed.repartition(F.col("zbucket"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .partitionBy("zbucket")
        .parquet(path)
    )


def parquet_rowgroup_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-row-group min/max footer statistics for ``cols`` across every
    parquet file under ``path`` (recursive) — METADATA-ONLY reads, the
    exact information a scan's predicate pushdown consults. Driver-side
    by design: footers are KBs per file; at warehouse scale this is the
    table-format manifest read, not a data scan."""
    import os

    import pyarrow.parquet as pq

    out: list[dict] = []
    for root, _dirs, files in os.walk(path):
        for name in sorted(files):
            if not name.endswith(".parquet"):
                continue
            fp = os.path.join(root, name)
            meta = pq.ParquetFile(fp).metadata
            if meta.num_row_groups == 0:
                # schema-only part file (empty DataFrame / partition
                # write): nothing to profile, nothing to skip
                continue
            idx = {
                meta.row_group(0).column(i).path_in_schema: i
                for i in range(meta.num_columns)
            }
            for g in range(meta.num_row_groups):
                rg = meta.row_group(g)
                row: dict = {"file": fp, "row_group": g, "n_rows": rg.num_rows}
                for c in cols:
                    ci = idx.get(c)
                    st = None if ci is None else rg.column(ci).statistics
                    # a column absent from this file profiles as
                    # stats-missing — skip_fraction already treats that
                    # as conservatively touched
                    row[f"{c}_min"] = None if st is None else st.min
                    row[f"{c}_max"] = None if st is None else st.max
                out.append(row)
    return out


def skip_fraction(
    stats: list[dict], col: str, lo, hi
) -> float:
    """Fraction of row groups a range predicate ``lo <= col <= hi`` can
    SKIP on footer stats alone (a group is touched iff its [min, max]
    intersects [lo, hi]; missing stats are conservatively touched) —
    the pruning arithmetic every parquet reader runs."""
    if not stats:
        return 0.0
    touched = 0
    for row in stats:
        mn, mx = row[f"{col}_min"], row[f"{col}_max"]
        if mn is None or mx is None or (mx >= lo and mn <= hi):
            touched += 1
    return 1.0 - touched / len(stats)
