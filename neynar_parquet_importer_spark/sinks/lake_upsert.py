"""Recency-guarded MERGE into a parquet lake directory.

Semantics of the reference's S9 sink (db.py:884-893):
``INSERT ... ON CONFLICT (pk) DO UPDATE SET <all columns>
WHERE excluded.updated_at >= existing.updated_at`` — last-writer-wins
keyed on PK with a recency guard, which together with idempotent
re-imports gives exactly-once-ish end state.

Lake expression of the same semantics:
  new_state = last_writer_wins(existing ∪ incoming, pk, version DESC)
with ties broken toward the incoming batch (the `>=` in the guard).

Implementation notes for scale:
- the union+window is one shuffle on the PK — the same cost profile as
  any MERGE engine (Delta/Iceberg do a join instead; same shuffle);
- incoming batches are deduped per PK *before* merging (SURVEY §7.3 hard
  part 1: the reference never hits double-update only because its row
  groups are single-threaded);
- the write is atomic-by-rename at directory granularity: write to
  ``<root>/.staging-<epoch>``, then swap. Single-writer (per table) is
  assumed, matching the reference's one-importer-per-table topology.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import last_writer_wins


class LakeUpsertSink:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        primary_key: tuple[str, ...],
        version_column: str = "updated_at",
    ) -> None:
        self.spark = spark
        self.root = root
        self.primary_key = primary_key
        self.version_column = version_column
        self._data_dir = os.path.join(root, "data")

    # -- read --------------------------------------------------------------
    def exists(self) -> bool:
        return os.path.isdir(self._data_dir)

    def read(self) -> DataFrame | None:
        if not self.exists():
            return None
        return self.spark.read.parquet(self._data_dir)

    # -- write -------------------------------------------------------------
    def _order(self) -> list[Column]:
        # incoming (priority 1) beats existing (0) on version ties == the
        # `excluded.updated_at >= existing.updated_at` guard's >=
        return [F.desc(self.version_column), F.desc("__src_priority")]

    def upsert(self, incoming: DataFrame, epoch: int = 0) -> None:
        pk = list(self.primary_key)
        batch = last_writer_wins(
            incoming.withColumn("__src_priority", F.lit(1)),
            pk,
            self._order(),
        )
        existing = self.read()
        if existing is None:
            merged = batch.drop("__src_priority")
        else:
            all_rows = existing.withColumn("__src_priority", F.lit(0)).unionByName(
                batch, allowMissingColumns=False
            )
            merged = last_writer_wins(all_rows, pk, self._order()).drop("__src_priority")

        staging = os.path.join(self.root, f".staging-{epoch}")
        merged.write.mode("overwrite").parquet(staging)
        old = os.path.join(self.root, f".old-{epoch}")
        if os.path.isdir(self._data_dir):
            os.rename(self._data_dir, old)
        os.rename(staging, self._data_dir)
        if os.path.isdir(old):
            shutil.rmtree(old)
