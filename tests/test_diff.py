"""Snapshot diff: all four statuses, NULL transition semantics, and
carried values. Cross-engine parity is the ``snapshot_diff_orders``
oracle twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators import diff as dff


@pytest.fixture(scope="module")
def versions(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, "c", None),
            (4, "d", 40.0),
        ],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),     # unchanged
            (2, "b", 21.0),     # changed value
            (3, "c", None),     # unchanged (NULL == NULL under eqNullSafe)
            (5, "e", 50.0),     # added
        ],                       # 4 removed
        "k long, s string, v double",
    )
    return old, new


def test_statuses_and_carried_values(spark, versions):
    old, new = versions
    rows = {
        r.k: r
        for r in dff.snapshot_diff(old, new, "k", ["s", "v"]).collect()
    }
    assert {k: r.status for k, r in rows.items()} == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",
        4: "removed",
        5: "added",
    }
    # changed/added rows carry the NEW values, removed the OLD
    assert rows[2].v == 21.0
    assert rows[5].v == 50.0
    assert rows[4].v == 40.0


def test_null_to_value_is_changed(spark):
    old = spark.createDataFrame([(1, None)], "k long, v double")
    new = spark.createDataFrame([(1, 7.0)], "k long, v double")
    got = dff.snapshot_diff(old, new, "k", ["v"]).collect()[0]
    assert got.status == "changed"


def test_value_to_null_is_changed_and_surfaces_null(spark):
    """A column NULL-ed upstream must come through as NULL (a coalesce
    would resurrect the old value and the 'synthetic incremental batch'
    use would silently undo the NULL-ing)."""
    old = spark.createDataFrame([(1, 7.0)], "k long, v double")
    new = spark.createDataFrame([(1, None)], "k long, v double")
    got = dff.snapshot_diff(old, new, "k", ["v"]).collect()[0]
    assert got.status == "changed"
    assert got.v is None


def test_empty_compare_cols_is_presence_only_diff(spark):
    """No payload columns: a pure added/removed/unchanged audit."""
    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    got = {
        r.k: r.status for r in dff.snapshot_diff(old, new, "k", []).collect()
    }
    assert got == {1: "removed", 2: "unchanged", 3: "added"}


def test_summary_counts_and_checksums(spark, versions):
    old, new = versions
    d = dff.snapshot_diff(old, new, "k", ["s", "v"])
    got = {
        r.status: (r.n_rows, r.key_checksum)
        for r in dff.diff_summary(d, "k").collect()
    }
    assert got == {
        "added": (1, 5),
        "changed": (1, 2),
        "removed": (1, 4),
        "unchanged": (2, 4),
    }


def test_diff_matches_python_reference_property(spark):
    """Hypothesis: random keyed old/new tables (overlapping keys, NULLs,
    value collisions) — statuses and carried values must match a plain
    python reference diff."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    val = st.one_of(st.none(), st.integers(min_value=0, max_value=3))
    table = st.dictionaries(
        st.integers(min_value=0, max_value=9), val, max_size=8
    )

    @settings(max_examples=15, deadline=None)
    @given(old=table, new=table)
    def check(old, new):
        odf = spark.createDataFrame(
            [(k, v) for k, v in old.items()] or [(None, None)],
            "k long, v long",
        ).filter(F.col("k").isNotNull())
        ndf = spark.createDataFrame(
            [(k, v) for k, v in new.items()] or [(None, None)],
            "k long, v long",
        ).filter(F.col("k").isNotNull())
        got = {
            r.k: (r.status, r.v)
            for r in dff.snapshot_diff(odf, ndf, "k", ["v"]).collect()
        }
        want = {}
        for k in set(old) | set(new):
            if k not in old:
                want[k] = ("added", new[k])
            elif k not in new:
                want[k] = ("removed", old[k])
            elif old[k] == new[k]:
                want[k] = ("unchanged", new[k])
            else:
                want[k] = ("changed", new[k])
        assert got == want

    check()
