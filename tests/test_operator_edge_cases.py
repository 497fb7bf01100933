"""Edge-case regressions from the round-6 adversarial operator review:
empty tables, NULL/NaN values, string keys, whitespace-only text,
keep-everything strata, attribute-less SCD, giant z-order spans — each
previously a live crash (ANSI Spark 4) or a silent wrong answer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_audit_empty_table_fails_closed(spark):
    """An EMPTY table must audit as FAILED checks (metric NULL), never
    crash with DIVIDE_BY_ZERO (ANSI) or read as passed (NULL >= t)."""
    from neynar_parquet_importer_spark.operators import audit as aud

    empty = spark.createDataFrame([], "a long, b string")
    rows = aud.table_audit(
        empty,
        [aud.Check("a_complete", aud.completeness("a")),
         aud.Check("ab_unique", aud.uniqueness("a", "b"))],
    ).collect()
    assert [r.passed for r in rows] == [False, False]
    assert all(r.metric is None for r in rows)
    ri = aud.referential_integrity(
        empty, "a", spark.createDataFrame([(1,)], "pk long"), "pk", "fk_ok"
    ).collect()[0]
    assert ri.passed is False


def test_diff_summary_string_keys(spark):
    """String primary keys checksum via the md5-half, not sum(key) —
    which is a CAST crash under ANSI and an all-NULL checksum without."""
    from neynar_parquet_importer_spark.operators import diff as dff

    old = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    new = spark.createDataFrame([("a", 1), ("c", 3)], "k string, v int")
    d = dff.snapshot_diff(old, new, "k", ["v"])
    rows = {r.status: r for r in dff.diff_summary(d, "k").collect()}
    assert rows["added"].n_rows == rows["removed"].n_rows == 1
    assert all(r.key_checksum is not None for r in rows.values())
    # numeric keys keep the plain-sum oracle contract
    dn = dff.snapshot_diff(
        old.selectExpr("length(k) AS k", "v"),
        new.selectExpr("length(k) + v AS k", "v"),
        "k", ["v"],
    )
    assert all(
        r.key_checksum is not None
        for r in dff.diff_summary(dn, "k").collect()
    )


def test_histogram_excludes_nan_consistently(spark):
    """NaN must be excluded from BOTH the sketch and the sizing audit —
    it used to clamp into bin 0 while the profile counted it in n_above
    (NaN sorts greatest), skewing quantiles low with no signal."""
    from neynar_parquet_importer_spark.operators import histogram as hg

    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (None,), (9.0,)], "v double"
    )
    hist = hg.histogram_build(df, [], "v", 0.0, 1.0, 10).collect()
    assert sum(r.cnt for r in hist) == 2  # only the two real values
    prof = hg.histogram_profile(df, [], "v", 0.0, 10.0).collect()[0]
    assert prof.n_values == 2 and prof.n_above == 0


def test_classifier_whitespace_doc_emits_no_row(spark):
    """A whitespace-only doc has no terms: it must not receive the
    arbitrary md5('') bucket's weight as its quality logit."""
    from neynar_parquet_importer_spark.operators import classifier as clf

    docs = spark.createDataFrame(
        [(1, "real words here"), (2, "   ")], "doc_id long, text string"
    )
    w = clf.pseudo_weights(spark)
    out = {r.doc_id for r in clf.classify(docs, w, "text", "doc_id").collect()}
    assert out == {1}


def test_stratified_sample_full_fraction_keeps_all(spark):
    """fraction >= 1.0 keeps EVERY row of the stratum — the strict
    h < 'ffffffff' predicate deterministically dropped hash-boundary
    rows from keep-100% strata."""
    from neynar_parquet_importer_spark.operators import sampling as smp

    df = spark.createDataFrame(
        [(i, "keep" if i % 2 else "half") for i in range(200)],
        "id long, s string",
    )
    out = smp.stratified_sample(df, "s", {"keep": 1.0, "half": 0.5}, ["id"])
    kept = out.groupBy("s").count().collect()
    counts = {r.s: r["count"] for r in kept}
    assert counts["keep"] == 100  # every row, including any 'ffffffff' hash


def test_scd_collapse_no_attrs_is_vacuous_truth(spark):
    """attr_cols=[] collapses to one version per key (all zero
    attributes trivially equal) instead of TypeError on an empty
    reduce — the diff.snapshot_diff seeding discipline."""
    from neynar_parquet_importer_spark.operators import scd

    df = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30)], "k long, ts long"
    )
    out = scd.collapse_consecutive(df, ["k"], [F.col("ts")], []).collect()
    assert sorted((r.k, r.ts) for r in out) == [(1, 10), (2, 30)]


def test_kmeans_assign_string_ids(spark):
    """kmeans_assign must carry the caller's id TYPE through the Arrow
    schema (hardcoded 'id long' crashed on string doc ids)."""
    from neynar_parquet_importer_spark.operators import clustering as clu

    df = spark.createDataFrame(
        [("a", [0.0, 0.0]), ("b", [1.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    out = clu.kmeans_assign(
        df, [[0.0, 0.0], [1.0, 1.0]], vec_col="embedding", id_col="vec_id"
    ).collect()
    assert {r.id: r.cluster for r in out} == {"a": 0, "b": 1}


def test_bloom_null_content_not_definitely_new(spark):
    """NULL content is not probe-able: the build must not emit a junk
    (NULL, NULL) word row, and bloom_filter_new must not re-admit the
    same NULL-content rows as 'definitely new' on every batch."""
    from neynar_parquet_importer_spark.operators import bloom as blm

    hist = spark.createDataFrame(
        [(1, "seen"), (2, None)], "id long, c string"
    )
    words = blm.bloom_build(hist, "c")
    assert words.filter(F.col("word_idx").isNull()).count() == 0
    batch = spark.createDataFrame(
        [(3, "seen"), (4, "fresh"), (5, None)], "id long, c string"
    )
    new_ids = {
        r.id for r in blm.bloom_filter_new(batch, "c", words, id_col="id").collect()
    }
    assert new_ids == {4}  # NULL row is neither new nor maybe — split upstream
    flags = {
        r.id: r.maybe_in_bloom
        for r in blm.bloom_probe(batch, "c", words, id_col="id").collect()
    }
    assert flags[3] is True and flags[4] is False and flags[5] is None
