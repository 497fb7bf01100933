"""Spot-check named queries against their DuckDB oracle twins at a given
scale (default sf0.01 — the driver gate scale), replicating the suite's
canon/multiset compare without paying full-suite collection.

  ORACLE_SF_DIR=/root/testdata/sf0.01 python scripts/oracle_check.py q1 q2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import duckdb

SF = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")

from neynar_parquet_importer_spark.catalog import TESTDATA_TABLE_NAMES
from neynar_parquet_importer_spark.plans.queries import (
    ORACLE_SQL as _STATIC,
    QUERIES,
    build_artifact_oracles,
)
from neynar_parquet_importer_spark.session import get_spark
from canon_replica import multiset as _multiset


def main(names: list[str]) -> None:
    oracle = {**_STATIC, **build_artifact_oracles(SF)}
    con = duckdb.connect()
    for t in TESTDATA_TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    spark = get_spark(
        app_name="oracle_check",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    failed = []
    for name in names:
        sdf = QUERIES[name](spark, SF)
        srows = [tuple(r) for r in sdf.collect()]
        rel = con.sql(oracle[name])
        drows, dcols = rel.fetchall(), rel.columns
        ok_cols = sorted(sdf.columns) == sorted(dcols)
        ok_n = len(srows) == len(drows)
        sm, dm = _multiset(srows, sdf.columns), _multiset(drows, dcols)
        ok_vals = sm == dm
        status = "OK " if (ok_cols and ok_n and ok_vals) else "FAIL"
        print(f"{status} {name} rows={len(srows)}", flush=True)
        if status == "FAIL":
            failed.append(name)
            print(f"  cols match={ok_cols} rows match={ok_n} values match={ok_vals}")
            bad = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
            print(f"  first diffs: {bad}")
    spark.stop()
    raise SystemExit(1 if failed else 0)


if __name__ == "__main__":
    main(sys.argv[1:])
