"""Oracle-parity harness: run every registered query on Spark and its
DuckDB oracle twin on the same parquet, compare row count, column names,
and an order-insensitive value multiset — a local replica of the
driver's CORRECTNESS gate (at sf0.001 for speed; the driver uses sf0.01).
"""

from __future__ import annotations

import duckdb
import pytest

from neynar_parquet_importer_spark.catalog import TESTDATA_TABLE_NAMES
from neynar_parquet_importer_spark.plans.queries import (
    ORACLE_SQL as _STATIC_ORACLE_SQL,
    QUERIES,
    build_artifact_oracles,
)

import os

SF = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
# the trained-artifact twins (IVF/PQ) are corpus-specific: generate them
# for the sf this harness runs at
ORACLE_SQL = {**_STATIC_ORACLE_SQL, **build_artifact_oracles(SF)}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


# the compare layer lives in canon_replica so the sensitivity audit
# (test_canon_sensitivity.py, scale_study --canon-sensitivity) audits
# THE code this harness runs, not a copy
from canon_replica import canon as _canon, multiset as _multiset  # noqa: E402


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    rel = duck.sql(ORACLE_SQL[name])
    duck_rows = rel.fetchall()
    duck_cols = rel.columns

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count differs"
    sm, dm = _multiset(spark_rows, spark_cols), _multiset(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(sm, dm) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize(
    "name",
    [
        "moving_avg_user_value",
        "sessionize_events",
        "tumbling_event_counts",
        "cohort_retention",
        "events_interval_pairs",
    ],
)
def test_time_queries_are_session_timezone_independent(spark, name):
    """Every epoch-arithmetic query must use the NTZ-safe timestampdiff
    form: results may not change when the session timezone flips away
    from the UTC the engine session pins (unix_timestamp on an NTZ column
    would shift by the zone offset and only LOOK correct under UTC)."""
    key = "spark.sql.session.timeZone"
    utc_rows = _multiset(
        [tuple(r) for r in QUERIES[name](spark, SF).collect()],
        QUERIES[name](spark, SF).columns,
    )
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "America/New_York")  # DST zone, -5/-4 offset
        flipped_rows = _multiset(
            [tuple(r) for r in QUERIES[name](spark, SF).collect()],
            QUERIES[name](spark, SF).columns,
        )
    finally:
        spark.conf.set(key, old)
    assert flipped_rows == utc_rows, f"{name} depends on the session timezone"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE_SQL)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_lsh_pair_probe_oracle_on_planted_corpus(spark, tmp_path):
    """The default-SF corpora yield ~0-1 near-dup pairs, which would let a
    broken candidate-generation SQL pass empty-vs-empty: re-run the
    embedding_near_dup_lsh parity on a planted corpus where the expected
    output is provably nonzero, so the plane literals, bucket replay,
    multiprobe predicate, and rerank are all actually exercised."""
    import duckdb as _duckdb
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    dim = 16
    vecs = [v for v in rng.randn(60, dim)]
    for i in range(6):  # planted near-dup pairs, cos ~ 1
        base = rng.randn(dim)
        vecs.append(base)
        vecs.append(base + 0.01 * rng.randn(dim))
    frame = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [[float(x) for x in v] for v in vecs],
            "label": np.zeros(len(vecs), dtype=np.int64),
        }
    )
    sf_dir = tmp_path / "planted"
    sf_dir.mkdir()
    con = _duckdb.connect()
    con.register("f", frame)
    con.execute(f"COPY f TO '{sf_dir}/embeddings.parquet' (FORMAT PARQUET)")

    sdf = QUERIES["embedding_near_dup_lsh"](spark, str(sf_dir))
    spark_rows = _multiset([tuple(r) for r in sdf.collect()], sdf.columns)

    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    rel = con.sql(build_artifact_oracles(str(sf_dir))["embedding_near_dup_lsh"])
    duck_rows = _multiset(rel.fetchall(), rel.columns)
    con.close()

    assert len(spark_rows) >= 6  # every planted pair must surface
    assert spark_rows == duck_rows


def test_bloom_incremental_dedup_oracle_on_planted_corpus(spark, tmp_path):
    """At sf0.001 AND sf0.01 no odd-id doc shares text with an even-id doc,
    so the true-dup confirmation join passes the gate empty-vs-empty: a
    wrong EXISTS predicate in the twin or a wrong left_semi key on the
    Spark side would go unnoticed. Re-run the parity on a planted corpus
    where the expected n_true_dup is provably nonzero, so the confirmation
    path (and the false-positive resolution around it) is actually
    value-checked."""
    import duckdb as _duckdb
    import pandas as pd

    rows = []
    # history: even ids, two sources
    for i in range(40):
        rows.append((2 * i, f"history document number {i}", "en",
                     "web" if i % 2 == 0 else "books", 20))
    # incoming: odd ids — 7 exact matches of history texts (true dups,
    # split across both sources) + 33 unique texts
    for j in range(7):
        rows.append((2 * j + 1, f"history document number {j}", "en",
                     "web" if j % 3 == 0 else "books", 20))
    for j in range(7, 40):
        rows.append((2 * j + 1, f"incoming novel text {j}", "en",
                     "web" if j % 2 == 0 else "books", 18))
    frame = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf_dir = tmp_path / "planted_bloom"
    sf_dir.mkdir()
    con = _duckdb.connect()
    con.register("f", frame)
    con.execute(f"COPY f TO '{sf_dir}/documents.parquet' (FORMAT PARQUET)")

    sdf = QUERIES["bloom_incremental_dedup"](spark, str(sf_dir))
    spark_rows = [tuple(r) for r in sdf.collect()]
    cols = sdf.columns
    total_true_dup = sum(r[cols.index("n_true_dup")] for r in spark_rows)
    assert total_true_dup == 7  # Bloom has no false negatives

    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    rel = con.sql(ORACLE_SQL["bloom_incremental_dedup"])
    duck_rows = _multiset(rel.fetchall(), rel.columns)
    con.close()

    assert _multiset(spark_rows, cols) == duck_rows
