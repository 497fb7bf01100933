"""Mutation audit of the oracle harness (round-9 verdict #1): prove the
twins DETECT engine regressions, not just agree with a correct engine.

One test per artifact/replay twin family: inject the family's deliberate
engine-side mutation (mutation_audit.MUTANTS — off-by-one counts, flipped
signs, dropped canonicalization), run the family's twin with the gate's
own comparison, and require that the mutant is KILLED while the clean
engine still matches. A family whose mutant survives means the twin has
gone blind — this suite makes that a CI failure, not a silent hole.

Runs at the suite's sf0.001 (the recorded BENCH_SCALING kill table runs
the same code at the driver's sf0.01 gate scale).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mutation_audit import MUTANTS, audit_family  # noqa: E402

from neynar_parquet_importer_spark.catalog import TESTDATA_TABLE_NAMES

SF = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def oracle_env():
    from neynar_parquet_importer_spark.plans.queries import (
        ORACLE_SQL,
        build_artifact_oracles,
    )

    # oracle side fully built before any mutant exists in the process
    oracle_sql = {**ORACLE_SQL, **build_artifact_oracles(SF)}
    con = duckdb.connect()
    for t in TESTDATA_TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con, oracle_sql
    con.close()


@pytest.mark.parametrize("entry", MUTANTS, ids=[m["family"] for m in MUTANTS])
def test_twin_kills_mutant(spark, oracle_env, entry):
    con, oracle_sql = oracle_env
    row = audit_family(spark, con, entry, SF, oracle_sql)
    assert row["clean_match"], f"{row['family']}: clean twin broken: {row}"
    assert row["killed"], (
        f"{row['family']}: mutant SURVIVED — twin is blind to "
        f"{row['mutation']} in {row['target']}"
    )
