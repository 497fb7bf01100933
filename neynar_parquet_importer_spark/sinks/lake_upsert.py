"""Recency-guarded MERGE into a PK-hash-bucketed parquet lake.

Semantics of the reference's S9 sink (db.py:884-893):
``INSERT ... ON CONFLICT (pk) DO UPDATE SET <all columns>
WHERE excluded.updated_at >= existing.updated_at`` — last-writer-wins
keyed on PK with a recency guard, which together with idempotent
re-imports gives exactly-once-ish end state.

Lake expression of the same semantics:
  new_state = last_writer_wins(existing ∪ incoming, pk, version DESC)
with ties broken toward the incoming batch (the `>=` in the guard).

Storage layout & scale:
- rows live under ``<root>/data/__bucket=<i>/`` where
  ``__bucket = pmod(xxhash64(pk...), n_buckets)`` — a deterministic hash
  partition, so every PK maps to exactly one bucket directory;
- an upsert merges ONLY the buckets containing incoming PKs and rewrites
  only those directories: per-batch work is O(touched state), not
  O(table), which is what keeps a 1-second micro-batch viable when the
  table is 100 TB (size ``n_buckets`` so a bucket ≈ a few hundred MB —
  thousands of buckets at warehouse scale; Delta/Iceberg MERGE does the
  same thing with file-level pruning);
- untouched bucket directories are not opened, rewritten, or renamed —
  their files stay byte-identical (asserted by tests);
- the merge itself is one shuffle on the PK within touched buckets;
  incoming batches are deduped per PK *before* merging (SURVEY §7.3 hard
  part 1).

Crash safety (single writer per table, like the reference's
one-importer-per-table topology): each touched bucket is swapped by
rename via a ``.old-<epoch>`` holding area. A crash can leave a bucket
missing from ``data/``; ``_recover()`` — run on open and before every
upsert — rolls such buckets back from ``.old-*`` and clears stale
staging, so the sink never silently restarts empty. A partially-swapped
batch (some buckets new, some rolled back) is converged by re-running
the batch: the ledger only commits after ``upsert`` returns, and the
recency guard makes the re-merge idempotent.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import last_writer_wins

_BUCKET = "__bucket"


class LakeUpsertSink:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        primary_key: tuple[str, ...],
        version_column: str = "updated_at",
        n_buckets: int = 16,
    ) -> None:
        self.spark = spark
        self.root = root
        self.primary_key = primary_key
        self.version_column = version_column
        self.n_buckets = n_buckets
        self._data_dir = os.path.join(root, "data")
        self._recover()

    # -- crash recovery ----------------------------------------------------
    def _recover(self) -> None:
        """Roll back any interrupted swap: restore buckets (or a whole
        legacy data dir) left in ``.old-*``, drop stale staging dirs."""
        if not os.path.isdir(self.root):
            return
        for name in sorted(os.listdir(self.root)):
            path = os.path.join(self.root, name)
            if name.startswith(".old-"):
                if not os.path.isdir(self._data_dir):
                    os.rename(path, self._data_dir)
                    continue
                for sub in os.listdir(path):
                    if sub.startswith(f"{_BUCKET}="):
                        dst = os.path.join(self._data_dir, sub)
                        if not os.path.exists(dst):
                            # crash between rename-out and rename-in
                            os.rename(os.path.join(path, sub), dst)
                shutil.rmtree(path)
            elif name.startswith(".staging-"):
                shutil.rmtree(path)

    # -- read --------------------------------------------------------------
    def exists(self) -> bool:
        """True iff the sink holds DATA — bucket dirs or parquet files.
        A zero-row first upsert writes a data dir containing only
        ``_SUCCESS``; counting that as existing bricks the sink (the
        schemaless ``spark.read.parquet`` on it throws
        UNABLE_TO_INFER_SCHEMA on every later read), so marker-only
        dirs read as empty and the next non-empty upsert takes the
        fresh-sink full-swap path."""
        if not os.path.isdir(self._data_dir):
            return False
        return any(
            n.startswith(f"{_BUCKET}=") or n.endswith(".parquet")
            for n in os.listdir(self._data_dir)
        )

    def _is_bucketed(self) -> bool:
        return any(
            n.startswith(f"{_BUCKET}=") for n in os.listdir(self._data_dir)
        )

    def read(self) -> DataFrame | None:
        if not self.exists():
            return None
        df = self.spark.read.parquet(self._data_dir)
        return df.drop(_BUCKET) if _BUCKET in df.columns else df

    # -- write -------------------------------------------------------------
    def _order(self) -> list[Column]:
        # incoming (priority 1) beats existing (0) on version ties == the
        # `excluded.updated_at >= existing.updated_at` guard's >=
        return [F.desc(self.version_column), F.desc("__src_priority")]

    def _bucket_expr(self) -> Column:
        return F.pmod(
            F.xxhash64(*[F.col(k) for k in self.primary_key]),
            F.lit(self.n_buckets),
        ).cast("int")

    def upsert(self, incoming: DataFrame, epoch: int = 0) -> None:
        self._recover()
        self._check_meta()
        pk = list(self.primary_key)
        # persist: the batch is evaluated TWICE (the touched-bucket
        # collect, then the merged staging write). Unpinned, the second
        # evaluation re-runs the whole upstream plan — and if that plan
        # embeds any non-determinism (a re-read of a changing source),
        # it can emit a bucket that was not in `touched`, whose existing
        # directory was never merged: the per-bucket swap would then
        # replace it with only new rows, silently deleting stored PKs.
        batch = last_writer_wins(
            incoming.withColumn("__src_priority", F.lit(1)), pk, self._order()
        ).withColumn(_BUCKET, self._bucket_expr()).persist()
        try:
            self._upsert_inner(batch, epoch)
        finally:
            batch.unpersist()

    def _meta_path(self) -> str:
        return os.path.join(self.root, "_sink_meta.json")

    def _check_meta(self) -> None:
        """Pin (n_buckets, pk) across reopens: a sink reopened with a
        different n_buckets hashes updated PKs into different buckets,
        the merge never sees the old version, and read() returns
        duplicate PKs forever — silently. First write records the
        layout; every later open asserts it."""
        import json

        path = self._meta_path()
        if os.path.exists(path):
            with open(path) as f:
                meta = json.load(f)
            if meta.get("n_buckets") != self.n_buckets or tuple(
                meta.get("primary_key", ())
            ) != tuple(self.primary_key):
                raise ValueError(
                    f"sink at {self.root!r} was written with "
                    f"n_buckets={meta.get('n_buckets')}, "
                    f"pk={tuple(meta.get('primary_key', ()))}; reopened "
                    f"with n_buckets={self.n_buckets}, "
                    f"pk={tuple(self.primary_key)} — a layout change "
                    "requires a rewrite, not a reopen"
                )
            # version_column drives the last-writer-wins recency guard;
            # reopening with a different one silently changes which row
            # survives a PK collision over already-stored data — the same
            # class of divergence the meta file exists to prevent. Meta
            # files written before this key existed are upgraded in place.
            if "version_column" not in meta:
                meta["version_column"] = self.version_column
                with open(path, "w") as f:
                    json.dump(meta, f)
            elif meta["version_column"] != self.version_column:
                raise ValueError(
                    f"sink at {self.root!r} was written with "
                    f"version_column={meta['version_column']!r}; reopened "
                    f"with {self.version_column!r} — a recency-guard "
                    "change requires a rewrite, not a reopen"
                )
        else:
            os.makedirs(self.root, exist_ok=True)
            with open(path, "w") as f:
                json.dump(
                    {
                        "n_buckets": self.n_buckets,
                        "primary_key": list(self.primary_key),
                        "version_column": self.version_column,
                    },
                    f,
                )

    def _upsert_inner(self, batch: DataFrame, epoch: int) -> None:
        pk = list(self.primary_key)
        full_swap = False
        if not self.exists():
            merged = batch.drop("__src_priority")
            full_swap = True
        elif not self._is_bucketed():
            # one-time migration of a legacy unpartitioned table: full
            # merge + full rewrite into the bucketed layout
            existing = (
                self.read()
                .withColumn("__src_priority", F.lit(0))
                .withColumn(_BUCKET, self._bucket_expr())
            )
            merged = last_writer_wins(
                existing.unionByName(batch), pk, self._order()
            ).drop("__src_priority")
            full_swap = True
        else:
            # touched buckets only: one tiny driver-side distinct (at most
            # n_buckets ints — control-plane, not data)
            touched = sorted(
                r[0] for r in batch.select(_BUCKET).distinct().collect()
            )
            bucket_dirs = [
                os.path.join(self._data_dir, f"{_BUCKET}={b}")
                for b in touched
            ]
            live = [p for p in bucket_dirs if os.path.isdir(p)]
            if live:
                existing = (
                    self.spark.read.option("basePath", self._data_dir)
                    .parquet(*live)
                    .withColumn("__src_priority", F.lit(0))
                )
                merged = last_writer_wins(
                    existing.unionByName(batch), pk, self._order()
                ).drop("__src_priority")
            else:
                merged = batch.drop("__src_priority")

        staging = os.path.join(self.root, f".staging-{epoch}")
        if os.path.isdir(staging):
            shutil.rmtree(staging)
        merged.write.partitionBy(_BUCKET).mode("overwrite").parquet(staging)

        if full_swap:
            old = os.path.join(self.root, f".old-{epoch}")
            if os.path.isdir(self._data_dir):
                os.rename(self._data_dir, old)
            os.rename(staging, self._data_dir)
            if os.path.isdir(old):
                shutil.rmtree(old)
            return

        # per-bucket swap: only directories for buckets in this batch move;
        # everything else is untouched on disk
        old = os.path.join(self.root, f".old-{epoch}")
        os.makedirs(old, exist_ok=True)
        for sub in sorted(os.listdir(staging)):
            if not sub.startswith(f"{_BUCKET}="):
                continue
            dst = os.path.join(self._data_dir, sub)
            if os.path.isdir(dst):
                os.rename(dst, os.path.join(old, sub))
            os.rename(os.path.join(staging, sub), dst)
        shutil.rmtree(old)
        shutil.rmtree(staging, ignore_errors=True)
