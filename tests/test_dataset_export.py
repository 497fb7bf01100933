"""Partitioned dataset export (sinks/dataset_export.py): hive layout,
per-directory file-count bound, in-file sort order, read-back equality,
maxRecordsPerFile backstop, and manifest coverage."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from neynar_parquet_importer_spark.sinks.dataset_export import (
    export_dataset,
    export_manifest,
)

SCHEMA = "doc_id long, split string, lang string, text string"


def _corpus(spark, n=200):
    rows = [
        (
            i,
            "train" if i % 10 else "val",
            ["en", "de", "fr"][i % 3],
            f"doc {i}",
        )
        for i in range(n)
    ]
    # deliberately scrambled input order: the export owns the layout
    rows.reverse()
    return spark.createDataFrame(rows, SCHEMA)


def _parquet_files(path):
    out = []
    for root, _dirs, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return out


def test_layout_filecount_and_readback(spark, tmp_path):
    df = _corpus(spark)
    dest = str(tmp_path / "ds")
    export_dataset(
        df, dest, ["split", "lang"], ["doc_id"], salt_on="doc_id",
        files_per_partition=3,
    )
    files = _parquet_files(dest)
    # hive directory layout on both partition columns
    assert all("/split=" in f and "/lang=" in f for f in files)
    # bounded parallel writers per directory
    from collections import Counter

    per_dir = Counter(os.path.dirname(f) for f in files)
    assert per_dir and max(per_dir.values()) <= 3
    # read-back equality (partition cols come back via the hive decoder)
    back = spark.read.parquet(dest).select("doc_id", "split", "lang", "text")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_rows_sorted_inside_each_file(spark, tmp_path):
    dest = str(tmp_path / "sorted")
    export_dataset(
        _corpus(spark), dest, ["split"], ["doc_id"], salt_on="doc_id",
        files_per_partition=2,
    )
    for f in _parquet_files(dest):
        ids = [r["doc_id"] for r in spark.read.parquet(f"file://{f}").collect()]
        assert ids == sorted(ids), f


def test_max_records_backstop_splits_files(spark, tmp_path):
    dest = str(tmp_path / "capped")
    export_dataset(
        _corpus(spark, n=90), dest, ["split"], ["doc_id"], salt_on="doc_id",
        files_per_partition=1, max_records_per_file=20,
    )
    files = _parquet_files(dest)
    counts = {
        f: spark.read.parquet(f"file://{f}").count() for f in files
    }
    assert all(c <= 20 for c in counts.values())
    # and the backstop preserves the per-file sort invariant
    for f in files:
        ids = [r["doc_id"] for r in spark.read.parquet(f"file://{f}").collect()]
        assert ids == sorted(ids)


def test_salt_never_reaches_output_schema(spark, tmp_path):
    dest = str(tmp_path / "clean")
    export_dataset(
        _corpus(spark), dest, ["split"], ["doc_id"], salt_on="doc_id"
    )
    assert "__salt" not in spark.read.parquet(dest).columns


def test_manifest_covers_every_file_and_row(spark, tmp_path):
    df = _corpus(spark)
    dest = str(tmp_path / "mani")
    export_dataset(
        df, dest, ["split", "lang"], ["doc_id"], salt_on="doc_id",
        files_per_partition=2,
    )
    man = export_manifest(spark, dest, ["split", "lang"]).collect()
    assert sum(r["n_rows"] for r in man) == df.count()
    assert len({r["file"] for r in man}) == len(_parquet_files(dest))
    # every (split, lang) combination present in the manifest
    combos = {(r["split"], r["lang"]) for r in man}
    assert combos == {
        (s, lang)
        for s in ("train", "val")
        for lang in ("en", "de", "fr")
    }


def test_reexport_is_deterministic(spark, tmp_path):
    """Same input -> same file membership and in-file order (salt is a
    pure hash of the id), so incremental re-exports are reproducible."""
    df = _corpus(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for dest in (a, b):
        export_dataset(
            df, dest, ["split"], ["doc_id"], salt_on="doc_id",
            files_per_partition=3,
        )
    def sig(dest):
        out = {}
        for f in _parquet_files(dest):
            rel = os.path.relpath(f, dest)
            # file names carry task attempt ids; key on directory + the
            # sorted row content per file instead
            rows = tuple(
                tuple(r)
                for r in spark.read.parquet(f"file://{f}")
                .select("doc_id", "text")
                .collect()
            )
            out.setdefault(os.path.dirname(rel), []).append(rows)
        return {k: sorted(v) for k, v in out.items()}

    assert sig(a) == sig(b)
