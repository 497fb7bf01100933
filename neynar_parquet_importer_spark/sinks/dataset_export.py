"""Curated-dataset export: hive-partitioned parquet with bounded files.

The last mile of a training-data pipeline is writing the curated corpus
back out in a layout downstream loaders can consume: directory
partitioning on the routing columns (``split=train/lang=en/...`` so a
reader's filter becomes partition pruning), file sizes bounded (a
trainer shard-loads files; one 2 TB file or 4 M 10 KB files both
break it), rows inside each file sorted (stable shard order without a
global sort), and the write PARALLEL within each partition directory.

The naive ``df.write.partitionBy(...)`` fails the last requirement at
scale: without a matching repartition, every task holding rows of a
partition opens its own file there (small-file explosion); with
``repartition(partition_cols)`` exactly ONE task owns each directory —
a 5 TB ``split=train/lang=en`` partition funnels through one writer.
The fix is the salt column: repartition on (partition cols + salt),
where salt = ``pmod(xxhash64(salt_on), files_per_partition)`` — each
directory gets up to ``files_per_partition`` parallel writers, each
producing one internally-sorted file (``sortWithinPartitions`` keys the
sort inside each task), with ``maxRecordsPerFile`` as the hard upper
bound backstop.

The salt column never reaches the output schema (dropped before write),
and determinism holds: same input -> same salt -> same file membership
and order, so re-exports are byte-stable modulo parquet metadata.

Reference analog: the importer's terminal sink is a Postgres upsert
(db.py:884-893); an exported lake layout is the Spark-first terminal
shape for analytics/training consumers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_dataset(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    sort_cols: Sequence[str],
    salt_on: str,
    files_per_partition: int = 4,
    max_records_per_file: int = 1_000_000,
    compression: str = "zstd",
) -> None:
    """Write ``df`` hive-partitioned on ``partition_cols`` with at most
    ``files_per_partition`` (parallel) writers per directory, each file
    internally sorted by ``sort_cols``.

    ``salt_on`` names a stable id column driving file assignment. Size
    ``files_per_partition`` so partition_rows / files_per_partition stays
    under ``max_records_per_file`` — past it the backstop splits a
    writer's output and the per-file sort invariant still holds (Spark
    rolls files within one sorted task stream)."""
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(files_per_partition))
    keyed = df.withColumn("__salt", salt)
    (
        keyed.repartition(*[F.col(c) for c in partition_cols], F.col("__salt"))
        # the salt routes rows to tasks but must NOT key the sort: when two
        # salts of one partition hash to the same task, the dynamic-
        # partition writer emits them as ONE file, and a salt-keyed sort
        # would interleave two sorted runs in it. Sorting by (partition
        # cols, sort cols) keeps every task's per-directory stream — hence
        # every output file — totally ordered on sort_cols.
        .sortWithinPartitions(
            *[F.col(c) for c in partition_cols],
            *[F.col(c) for c in sort_cols],
        )
        .drop("__salt")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .option("compression", compression)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def export_manifest(
    spark: SparkSession, path: str, partition_cols: Sequence[str] = ()
) -> DataFrame:
    """(file, partition cols, n_rows) per output parquet file — the shard
    list a training loader (or a completeness check) consumes. The
    partition columns come back hive-decoded by the reader; pass the
    same names given to :func:`export_dataset`."""
    df = spark.read.parquet(path)
    return (
        df.withColumn("file", F.input_file_name())
        .groupBy("file", *partition_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
