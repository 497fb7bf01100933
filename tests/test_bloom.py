"""Bloom-filter incremental dedup: no-false-negative guarantee, FPR
sizing math, definite-new filtering, and the broadcast probe plan shape.

The cross-engine bit-arithmetic parity is covered by the oracle harness
(``bloom_incremental_dedup`` / ``bloom_words_profile`` twins); these
tests pin the operator contracts the oracle can't express.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators import bloom

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_no_false_negatives_on_planted_dups(spark, docs):
    """Every incoming row whose text was fed to the build MUST flag true,
    at any filter size — even an absurdly overloaded 64-bit one."""
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    # plant: incoming = odd docs UNION 40 exact copies of history texts
    planted = hist.limit(40).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    inc = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text").union(planted)
    for n_bits in (64, 1 << 12):
        bl = bloom.bloom_build(hist, "text", n_bits=n_bits, k=3)
        probed = bloom.bloom_probe(
            inc, "text", bl, n_bits=n_bits, k=3, id_col="doc_id"
        )
        missed = probed.filter(
            (F.col("doc_id") >= 1_000_000) & ~F.col("maybe_in_bloom")
        ).count()
        assert missed == 0, f"false negatives at n_bits={n_bits}"


def test_definite_new_is_exact_complement(spark, docs):
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    inc = docs.filter(F.col("doc_id") % 2 == 1)
    bl = bloom.bloom_build(hist, "text", n_bits=1 << 12, k=4)
    probed = bloom.bloom_probe(inc, "text", bl, n_bits=1 << 12, k=4, id_col="doc_id")
    new = bloom.bloom_filter_new(inc, "text", bl, n_bits=1 << 12, k=4, id_col="doc_id")
    n_inc = inc.count()
    n_maybe = probed.filter("maybe_in_bloom").count()
    assert new.count() == n_inc - n_maybe
    assert new.columns == inc.columns  # flag column dropped
    # definite-new rows are genuinely absent from history
    overlap = new.join(hist.select("text").distinct(), "text", "left_semi").count()
    assert overlap == 0


def test_fpr_sizing_math():
    # classic sizing: 1e6 items at 1% -> ~9.59e6 bits, k=7
    m, k = bloom.bloom_size_for(1_000_000, 0.01)
    assert 9_400_000 < m < 9_800_000 and k == 7
    assert bloom.bloom_fpr(1_000_000, m, k) <= 0.0105
    # monotonicity: more bits -> lower fpr
    assert bloom.bloom_fpr(1000, 1 << 14, 4) < bloom.bloom_fpr(1000, 1 << 12, 4)
    with pytest.raises(ValueError):
        bloom.bloom_size_for(10, 1.5)


def test_measured_fpr_tracks_expected(spark, docs):
    """With disjoint history/incoming text sets, every flag is a false
    positive; the measured rate should sit near the analytic estimate
    (generous 3x band — 250 trials of a ~0.1-0.4 rate)."""
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    inc = docs.filter(F.col("doc_id") % 2 == 1)
    n_hist = hist.count()
    n_bits, k = 1024, 4
    expected = bloom.bloom_fpr(n_hist, n_bits, k)
    probed = bloom.bloom_probe(
        inc,
        "text",
        bloom.bloom_build(hist, "text", n_bits=n_bits, k=k),
        n_bits=n_bits,
        k=k,
        id_col="doc_id",
    )
    measured = probed.filter("maybe_in_bloom").count() / inc.count()
    assert measured < 3 * expected + 0.02
    assert measured > expected / 3 - 0.02


def test_empty_history_flags_nothing(spark, docs):
    empty = docs.filter(F.lit(False))
    bl = bloom.bloom_build(empty, "text")
    probed = bloom.bloom_probe(docs, "text", bl, id_col="doc_id")
    assert probed.filter("maybe_in_bloom").count() == 0


def test_probe_is_broadcast_join_no_incoming_shuffle(spark, docs):
    """The words table must broadcast: the incoming side of the probe
    join may not shuffle (the whole point at ingest scale)."""
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    bl = bloom.bloom_build(hist, "text", n_bits=1 << 12, k=4)
    probed = bloom.bloom_probe(
        docs.filter(F.col("doc_id") % 2 == 1), "text", bl,
        n_bits=1 << 12, k=4, id_col="doc_id",
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_build_is_idempotent_under_duplicates(spark, docs):
    """bit_or is idempotent: feeding the corpus twice yields the exact
    same words table (the property that makes crash-replay safe)."""
    once = bloom.bloom_build(docs, "text", n_bits=1 << 12, k=4)
    twice = bloom.bloom_build(docs.union(docs), "text", n_bits=1 << 12, k=4)
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0
