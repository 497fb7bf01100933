"""Bigram LM scoring: pure-Python model replay on a hand corpus, the
short-document drop rule, occurrence preservation through the scoring
joins, and the no-Python-UDF plan contract. Cross-engine parity is the
``lm_surprising_docs`` / ``lm_source_perplexity`` oracle twins."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from neynar_parquet_importer_spark.operators import lm

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ran"),
    (3, "a dog sat"),
    (4, "solo"),  # 1 token: no bigram, must drop from scoring
]


def _py_model(rows, k=0.5):
    toks = {i: t.lower().strip().split() for i, t in rows}
    uni = Counter(w for l in toks.values() for w in l)
    big = Counter(
        (l[i], l[i + 1]) for l in toks.values() for i in range(len(l) - 1)
    )
    v = len(uni)
    out = {}
    for i, l in toks.items():
        nls = [
            -math.log((big[(l[j], l[j + 1])] + k) / (uni[l[j]] + k * v))
            for j in range(len(l) - 1)
        ]
        if nls:
            out[i] = (len(nls), sum(nls) / len(nls))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_doc_nll_matches_python_model(spark, docs):
    got = {
        r["id"]: (r["n_bigrams"], r["nll"])
        for r in lm.doc_nll(docs, "text", "doc_id").collect()
    }
    expected = _py_model(CORPUS)
    assert set(got) == set(expected)
    for i in expected:
        assert got[i][0] == expected[i][0]
        assert got[i][1] == pytest.approx(expected[i][1], rel=1e-12)


def test_short_docs_drop(spark, docs):
    ids = {r["id"] for r in lm.doc_nll(docs, "text", "doc_id").collect()}
    assert 4 not in ids


def test_counts_are_multiset(spark, docs):
    uni = {r["w"]: r["c1"] for r in lm.unigram_counts(docs, "text").collect()}
    assert uni["the"] == 3 and uni["cat"] == 2 and uni["solo"] == 1
    bc = {
        (r["w1"], r["w2"]): r["c12"]
        for r in lm.bigram_counts(docs, "text", "doc_id").collect()
    }
    assert bc[("the", "cat")] == 2 and bc[("the", "mat")] == 1


def test_occurrences_preserved_through_joins(spark, docs):
    """Every bigram occurrence matches exactly one count row on each
    join — n_bigrams equals the raw stream count per doc."""
    stream = (
        lm.bigram_stream(docs, "text", "doc_id").groupBy("id").count()
    )
    raw = {r["id"]: r["count"] for r in stream.collect()}
    scored = {
        r["id"]: r["n_bigrams"]
        for r in lm.doc_nll(docs, "text", "doc_id").collect()
    }
    assert raw == scored


def test_no_python_udf_in_plan(spark, docs):
    plan = lm.doc_nll(docs, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vertical_tab_tokenizes_identically_in_duckdb_twin(spark):
    """U+000B is whitespace to Java ``\\s`` but NOT to RE2 ``\\s`` — the
    DuckDB twin must spell the class out (round-7 advisor finding).
    Replays bigram_nll_sql on a corpus containing a vertical tab and
    compares against the Spark frame."""
    duckdb = pytest.importorskip("duckdb")
    rows = [(1, "cat\x0bsat on"), (2, "cat sat mat"), (3, "on a\x0bmat")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["id"]: (r["n_bigrams"], round(r["nll"], 9))
        for r in lm.doc_nll(docs, "text", "doc_id").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") AS t(doc_id, text)"
    )
    sql = lm.bigram_nll_sql("documents", "text", "doc_id") + (
        "SELECT id, n_bigrams, nll FROM scored"
    )
    want = {
        int(i): (int(n), round(nll, 9)) for i, n, nll in con.execute(sql).fetchall()
    }
    # the \x0b inside doc 1 and 3 MUST split: doc 1 has bigrams
    # (cat,sat),(sat,on) in both engines
    assert got == want
    assert got[1][0] == 2


def test_vertical_tab_nonspace_parity_with_duckdb(spark):
    """The quality-score oracles' nonspace/punct expressions must use
    the explicit whitespace class too (round-8 review finding: the
    tokenizer fix left bare RE2 '\\s' in the nonspace twins). Compares
    Spark's Java-\\s regexp_replace against the DuckDB class on a
    vertical-tab document."""
    duckdb = pytest.importorskip("duckdb")
    from pyspark.sql import functions as F

    text = "ab\x0bcd ef\tgh"
    got = (
        spark.range(1)
        .select(
            F.length(F.regexp_replace(F.lit(text), r"\s", "")).alias("n")
        )
        .first()["n"]
    )
    want = duckdb.connect().execute(
        "SELECT length(regexp_replace(?, '[ \\t\\n\\x0b\\f\\r]', '', 'g'))",
        [text],
    ).fetchone()[0]
    assert got == want == 8  # the \x0b and \t and space all stripped
