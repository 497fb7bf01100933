"""Bucketed table layout for co-located joins (the pre-shuffle strategy).

A table written with ``bucketBy(k, join_key)`` is already hash-
partitioned on disk: every subsequent join or aggregation on that key
skips its shuffle exchange entirely. For a 100 TB lake where the same
keys (fid, custkey, doc_id) are joined daily, paying the shuffle once at
write time is the single biggest repeated-query win Spark offers —
bucketed scan + SortMergeJoin with NO Exchange on either side
(asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and in-bucket sorted) managed table.
    Sorting by the bucket key additionally lets SortMergeJoin skip its
    sort. ``num_buckets`` should divide the cluster's parallelism at the
    target scale (buckets = max join parallelism without a shuffle)."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (metastore
    scan, not a raw path read — path reads lose bucketing metadata)."""
    return spark.table(table_name)
