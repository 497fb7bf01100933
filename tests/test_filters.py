"""Filter-DSL compiler tests — mirrors the reference's
tests/test_filters.py cases (casts $in, reactions $or, channel_members
$in) on synthetic DataFrames, plus edge semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.filters import compile_filter, time_range_filter


@pytest.fixture(scope="module")
def rows(spark):
    return spark.createDataFrame(
        [
            (1, 10, "a", 5.0),
            (2, 20, "b", 15.0),
            (3, 30, "c", 25.0),
            (4, 20, "a", 35.0),
        ],
        "fid long, target_fid long, channel_id string, value double",
    )


def _ids(df):
    return sorted(r.fid for r in df.collect())


def test_empty_filter_includes_everything(rows):
    assert _ids(rows.filter(compile_filter(None))) == [1, 2, 3, 4]
    assert _ids(rows.filter(compile_filter({}))) == [1, 2, 3, 4]


def test_in_nin(rows):
    assert _ids(rows.filter(compile_filter({"data.fid": {"$in": [1, 3]}}))) == [1, 3]
    assert _ids(rows.filter(compile_filter({"data.fid": {"$nin": [1, 3]}}))) == [2, 4]


def test_comparisons(rows):
    assert _ids(rows.filter(compile_filter({"data.value": {"$lt": 15.0}}))) == [1]
    assert _ids(rows.filter(compile_filter({"data.value": {"$lte": 15.0}}))) == [1, 2]
    assert _ids(rows.filter(compile_filter({"data.value": {"$gt": 15.0}}))) == [3, 4]
    assert _ids(rows.filter(compile_filter({"data.value": {"$gte": 15.0}}))) == [2, 3, 4]
    assert _ids(rows.filter(compile_filter({"data.channel_id": {"$eq": "a"}}))) == [1, 4]
    assert _ids(rows.filter(compile_filter({"data.channel_id": {"$ne": "a"}}))) == [2, 3]


def test_multi_key_leaf_is_anded(rows):
    doc = {"data.channel_id": {"$eq": "a"}, "data.value": {"$gt": 10.0}}
    assert _ids(rows.filter(compile_filter(doc))) == [4]


def test_or_of_leaves(rows):
    # the reference's reactions example: match on fid OR target_fid
    doc = {"$or": [{"data.fid": {"$in": [1]}}, {"data.target_fid": {"$in": [20]}}]}
    assert _ids(rows.filter(compile_filter(doc))) == [1, 2, 4]


def test_and_combinator(rows):
    doc = {"$and": [{"data.value": {"$gt": 10.0}}, {"data.value": {"$lt": 30.0}}]}
    assert _ids(rows.filter(compile_filter(doc))) == [2, 3]


def test_null_semantics_match_reference(spark):
    # the reference evaluates filters in Python where `None != v` and
    # `None not in [...]` are True: $ne/$nin keep NULL rows, $eq/$in drop
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "fid long, channel_id string"
    )

    def ids(doc):
        return sorted(r.fid for r in df.filter(compile_filter(doc)).collect())

    assert ids({"data.channel_id": {"$ne": "a"}}) == [2, 3]
    assert ids({"data.channel_id": {"$nin": ["a", "b"]}}) == [2]
    assert ids({"data.channel_id": {"$eq": "a"}}) == [1]
    assert ids({"data.channel_id": {"$in": ["a"]}}) == [1]


def test_unknown_key_raises():
    with pytest.raises(ValueError, match="unknown filter key"):
        compile_filter({"bogus": {"$eq": 1}})


def test_unknown_operator_raises():
    with pytest.raises(ValueError, match="unknown filter operator"):
        compile_filter({"data.fid": {"$regex": ".*"}})


def test_time_range_filter(spark):
    import datetime

    df = spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, i + 1)) for i in range(5)],
        "id long, updated_at timestamp",
    )
    pred = time_range_filter(
        "updated_at", datetime.datetime(2024, 1, 2), datetime.datetime(2024, 1, 4)
    )
    assert sorted(r.id for r in df.filter(pred).collect()) == [1, 2, 3]


# ---------------------------------------------------------------------------
# Property: compiled Column == Python row evaluator (reference include_row)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from neynar_parquet_importer_spark.filters import evaluate_filter

_INT_VALUES = st.integers(min_value=-5, max_value=5)
_STR_VALUES = st.sampled_from(["a", "b", "c", "d"])

_INT_LEAF = st.fixed_dictionaries(
    {},
    optional={
        "$in": st.lists(_INT_VALUES, min_size=1, max_size=3),
        "$nin": st.lists(_INT_VALUES, min_size=1, max_size=3),
        "$lt": _INT_VALUES,
        "$lte": _INT_VALUES,
        "$gt": _INT_VALUES,
        "$gte": _INT_VALUES,
        "$eq": _INT_VALUES,
        "$ne": _INT_VALUES,
    },
).filter(bool)
_STR_LEAF = st.fixed_dictionaries(
    {},
    optional={
        "$in": st.lists(_STR_VALUES, min_size=1, max_size=3),
        "$nin": st.lists(_STR_VALUES, min_size=1, max_size=3),
        "$eq": _STR_VALUES,
        "$ne": _STR_VALUES,
    },
).filter(bool)

_BASIC_DOC = st.fixed_dictionaries(
    {},
    optional={"data.x": _INT_LEAF, "data.s": _STR_LEAF},
).filter(bool)

_DOC = st.one_of(
    _BASIC_DOC,
    st.fixed_dictionaries({"$or": st.lists(_BASIC_DOC, min_size=1, max_size=3)}),
    st.fixed_dictionaries({"$and": st.lists(_BASIC_DOC, min_size=1, max_size=3)}),
)


@pytest.fixture(scope="module")
def filter_rows(spark):
    import itertools

    rows = [
        (i, x, s)
        for i, (x, s) in enumerate(
            itertools.product(
                [None, -3, -1, 0, 1, 3, 5],
                [None, "a", "b", "c", "z"],
            )
        )
    ]
    df = spark.createDataFrame(rows, "rid long, x long, s string")
    df.persist().count()
    return rows, df


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(doc=_DOC)
def test_compiled_filter_matches_row_evaluator(filter_rows, doc):
    """The compiled Catalyst predicate and the reference's row-level
    Python semantics must keep exactly the same rows — including NULL
    handling for $ne/$nin (kept) vs $eq/$in/range ops (dropped)."""
    rows, df = filter_rows
    kept_spark = {r.rid for r in df.filter(compile_filter(doc)).select("rid").collect()}
    kept_py = {
        rid for rid, x, s in rows if evaluate_filter(doc, {"x": x, "s": s})
    }
    assert kept_spark == kept_py, f"divergence for {doc!r}"
