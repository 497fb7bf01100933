"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``neynar_parquet_importer_spark``; this module
is a thin adapter.
"""

from __future__ import annotations

import os
import warnings
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from neynar_parquet_importer_spark.plans.queries import (
    ORACLE_SQL,
    QUERIES,
    build_artifact_oracles,
    flagship,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY registered query — no rows-only
    entries remain. The trained/seeded-artifact twins (IVF
    centroids, PQ codebooks, hyperplane tables — deterministic functions
    of the corpus and seeds, replayed outside Spark through the same
    code paths) are generated for the corpus the gate runs against:
    ``$ORACLE_SF_DIR`` if set (the repo harness's knob), else the
    driver's sf0.01."""
    out = dict(ORACLE_SQL)
    sf_dir = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
    if os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        # any failure past the existence probe is a genuine generator bug
        # and must propagate — a blanket swallow here once silently
        # downgraded four value checks to rows-only while the docstring
        # still claimed 111/111 (ADVICE r5, medium)
        out.update(build_artifact_oracles(sf_dir))
    # the only expected degradation: artifact twins whose corpus file is
    # absent (the whole dir, or a per-file gate inside the builder —
    # e.g. embeddings-only planted corpora carry no documents.parquet
    # for the BPE replay). NEVER silent: name every degraded query.
    degraded = sorted(set(QUERIES) - set(out))
    if degraded:
        warnings.warn(
            "artifact-oracle corpus (partially) missing at "
            f"{sf_dir!r}; {' / '.join(degraded)} degrade to "
            "rows-only checks",
            stacklevel=2,
        )
    return out
