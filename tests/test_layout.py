"""Z-order layout: known Morton values, Column/SQL twin equality,
quantization exactness, and the locality property the layout exists
for. Cross-engine parity is the ``zorder_events_profile`` oracle twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators import layout as lay


def _py_morton(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_matches_reference_bits(spark):
    """Column interleave equals the bit-by-bit python reference on a
    grid including domain corners."""
    vals = [0, 1, 2, 3, 5, 255, 256, 32767, 65535]
    rows = [(x, y) for x in vals for y in vals]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", lay.morton_z(F.col("x"), F.col("y"), 16).alias("z")
    ).collect()
    for r in got:
        assert r.z == _py_morton(r.x, r.y), (r.x, r.y)


def test_sql_twin_is_identical(spark):
    """morton_z_sql must be the same function as morton_z (it is the
    oracle's replay)."""
    df = spark.createDataFrame(
        [(x, y) for x in (0, 7, 1234) for y in (0, 9, 60000)],
        "x long, y long",
    )
    mism = df.select(
        (
            lay.morton_z(F.col("x"), F.col("y"), 16)
            != F.expr(lay.morton_z_sql("x", "y", 16))
        ).alias("bad")
    )
    assert mism.filter(F.col("bad")).count() == 0


def test_quantize_hits_domain_ends_exactly(spark):
    """min -> 0, max -> 2^bits - 1, constant dim -> 0 (span guard)."""
    df = spark.createDataFrame(
        [(0,), (500,), (1000,)], "v long"
    ).crossJoin(
        spark.createDataFrame([(0, 1000)], "lo long, hi long")
    )
    got = sorted(
        r[0]
        for r in df.select(
            lay.quantize_dim(F.col("v"), F.col("lo"), F.col("hi"), 16)
        ).collect()
    )
    assert got[0] == 0 and got[-1] == 65535
    const = spark.createDataFrame([(5, 5, 5)], "v long, lo long, hi long")
    assert (
        const.select(
            lay.quantize_dim(F.col("v"), F.col("lo"), F.col("hi"), 16)
        ).collect()[0][0]
        == 0
    )


def test_zorder_boxes_are_tight_in_both_dims(spark):
    """Uniform 256x256 grid, 64 buckets: every z-bucket's bounding box
    must span ~1/8 of EACH dimension (the file-skip property); a
    single-column sort would leave one dimension's span at ~full
    domain. Asserts max span <= 1/4 of the domain in both dims."""
    grid = spark.range(256).selectExpr("id as gx").crossJoin(
        spark.range(256).selectExpr("id as gy")
    )
    q = grid.select(
        lay.quantize_dim(F.col("gx"), F.lit(0), F.lit(255), 16).alias("qx"),
        lay.quantize_dim(F.col("gy"), F.lit(0), F.lit(255), 16).alias("qy"),
    )
    prof = lay.zorder_profile(q, "qx", "qy", bits=16, n_buckets=64)
    worst = prof.agg(
        F.max("x_span").alias("xs"), F.max("y_span").alias("ys")
    ).collect()[0]
    assert worst.xs <= 65536 // 4
    assert worst.ys <= 65536 // 4


def test_n_buckets_must_be_power_of_two(spark):
    df = spark.createDataFrame([(1, 1)], "x long, y long")
    for bad in (48, 0, 1 << 40):
        with pytest.raises(ValueError):
            lay.zorder_profile(df, "x", "y", n_buckets=bad)


def test_quantize_exact_at_epoch_nano_spans(spark):
    """Spans above 2^37 overflow the pure-double division path; the
    long-arithmetic correction must keep every quantile equal to
    python's exact integer `//` (the oracle's arithmetic)."""
    spans = [
        # ~2.8 h of nanos: past the pure-double exactness bound (2^37)
        (1_700_000_000_000_000_000, 1_700_009_999_999_999_999),
        # ~1 YEAR of nanos (~2^55): past the int64 scale-up bound too —
        # (c - cmin) * 65535 overflows a long here (ANSI
        # ARITHMETIC_OVERFLOW before the decimal fix)
        (1_700_000_000_000_000_000, 1_731_536_000_000_000_000),
    ]
    for lo, hi in spans:
        vals = [lo, lo + 1, (lo + hi) // 2, hi - 1, hi,
                lo + (hi - lo) * 2 // 3 + 1]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = {
            r.v: r.q
            for r in df.select(
                "v",
                lay.quantize_dim(
                    F.col("v"), F.lit(lo), F.lit(hi), 16
                ).alias("q"),
            ).collect()
        }
        span = hi - lo
        for v in vals:
            assert got[v] == ((v - lo) * 65535) // span, (v, span)


def test_morton_int_input_does_not_wrap_negative(spark):
    """IntegerType inputs with bit 15 set must not overflow into the
    sign bit (z stays non-negative)."""
    df = spark.createDataFrame([(65535, 65535)], "x int, y int")
    z = df.select(
        lay.morton_z(F.col("x"), F.col("y"), 16).alias("z")
    ).collect()[0].z
    assert z == (1 << 32) - 1


def test_write_zordered_layout_and_roundtrip(spark, tmp_path):
    """The write path: one file per z-bucket directory, row multiset
    preserved through the round trip, and every bucket a bounded
    rectangle whose bucket id matches the closed-form arithmetic."""
    import os

    rows = [(i, i % 97, (i * 31) % 89) for i in range(4000)]
    df = spark.createDataFrame(rows, "eid long, x long, y long")
    path = str(tmp_path / "z")
    lay.write_zordered(df, path, "x", "y", bits=16, n_buckets=16)

    dirs = sorted(
        d for d in os.listdir(path) if d.startswith("zbucket=")
    )
    assert 1 <= len(dirs) <= 16
    for d in dirs:
        files = [
            f for f in os.listdir(os.path.join(path, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1  # one file per bucket per write

    back = spark.read.parquet(path)
    assert sorted(
        (r.eid, r.x, r.y) for r in back.collect()
    ) == sorted(rows)

    # bucket membership matches the closed-form quantize+morton path
    xs = [r[1] for r in rows]
    ys = [r[2] for r in rows]
    xmin, xmax, ymin, ymax = min(xs), max(xs), min(ys), max(ys)

    def bucket_of(x, y):
        qx = ((x - xmin) * 65535) // max(xmax - xmin, 1)
        qy = ((y - ymin) * 65535) // max(ymax - ymin, 1)
        z = 0
        for i in range(16):
            z |= ((qx >> i) & 1) << (2 * i)
            z |= ((qy >> i) & 1) << (2 * i + 1)
        return z >> 28  # 32 z-bits, 16 buckets
    got = {
        (r.eid): r.zbucket for r in back.select("eid", "zbucket").collect()
    }
    for eid, x, y in rows:
        assert got[eid] == bucket_of(x, y), (eid, x, y)


def test_rowgroup_stats_and_skip_fraction(spark, tmp_path):
    """Footer stats drive real pruning: a z-ordered layout skips most
    row groups on a narrow range over EITHER dimension, while a
    single-dimension sort only prunes its own column."""
    rows = [(i, i % 199, (i * 57) % 211) for i in range(20000)]
    df = spark.createDataFrame(rows, "eid long, x long, y long")
    zpath = str(tmp_path / "z")
    lay.write_zordered(df, zpath, "x", "y", bits=16, n_buckets=16)
    xpath = str(tmp_path / "xsort")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        xpath
    )

    zstats = lay.parquet_rowgroup_stats(zpath, ["x", "y"])
    xstats = lay.parquet_rowgroup_stats(xpath, ["x", "y"])
    assert sum(r["n_rows"] for r in zstats) == 20000
    # a ~10%-of-domain range on each dim
    zx = lay.skip_fraction(zstats, "x", 10, 29)
    zy = lay.skip_fraction(zstats, "y", 10, 30)
    xx = lay.skip_fraction(xstats, "x", 10, 29)
    xy = lay.skip_fraction(xstats, "y", 10, 30)
    assert xx > 0.5          # the sorted dim prunes
    assert xy == 0.0         # the unsorted dim cannot
    assert zx > 0.4 and zy > 0.4  # z-order prunes BOTH dims
    # conservative touch when stats are missing
    broken = [dict(r, x_min=None) for r in zstats]
    assert lay.skip_fraction(broken, "x", 10, 29) == 0.0


def test_rowgroup_stats_tolerates_empty_files_and_missing_cols(spark, tmp_path):
    """A schema-only part file (zero row groups) is skipped, and a
    column absent from a file profiles as stats-missing — conservatively
    touched by skip_fraction, never a crash."""
    p = str(tmp_path / "mixed")
    spark.range(0).selectExpr("id AS a", "id AS b").write.parquet(p)
    spark.range(10).selectExpr("id AS a", "id AS b").write.mode(
        "append"
    ).parquet(p)
    stats = lay.parquet_rowgroup_stats(p, ["a", "b", "absent"])
    assert stats, "non-empty file must still be profiled"
    assert all(r["absent_min"] is None for r in stats)
    # missing stats => conservatively touched => skip fraction 0
    assert lay.skip_fraction(stats, "absent", 0, 1) == 0.0
