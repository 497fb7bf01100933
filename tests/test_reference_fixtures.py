"""Integration against the reference's REAL fixture exports
(/root/reference/tests/data — read-only): the same files its e2e suite
imports (tests/README.md:6-9). Exercises uuid16 normalization, window
discovery on real filenames, the upsert path, idempotent re-import, and
the graph projection on real verification bytes."""

from __future__ import annotations

import os
import shutil
import uuid as uuidlib

import pytest

from neynar_parquet_importer_spark.catalog import REFERENCE_TABLES
from neynar_parquet_importer_spark.graph import verifications_to_nodes_and_edges
from neynar_parquet_importer_spark.streaming import ImportPipeline

FIXTURE_DIR = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURE_DIR), reason="reference fixtures not available"
)


@pytest.fixture()
def follows_src(tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for name in os.listdir(FIXTURE_DIR):
        if name.startswith("nindexer-follows-"):
            shutil.copy(os.path.join(FIXTURE_DIR, name), os.path.join(src, name))
    return src


def test_import_real_follows_fixtures(spark, tmp_path, follows_src):
    spec = REFERENCE_TABLES["follows"]
    pipe = ImportPipeline(
        spark, spec, follows_src, str(tmp_path / "lake"), incremental_duration=1
    )
    report = pipe.run_catchup(
        start_timestamp=1750957186, end_timestamp=1750957191, now=1750957191
    )
    assert report.files_imported == 4  # 4 one-second windows on disk
    assert report.missing_windows == 1  # 1750957188 was never published
    raw = spark.read.schema(spec.schema).parquet(f"{follows_src}/*.parquet")
    n_source_ids = raw.select("id").distinct().count()
    rows = pipe.sink.read().collect()
    assert len(rows) == n_source_ids  # one state row per distinct PK
    assert len({r.id for r in rows}) == len(rows)
    for r in rows:
        uuidlib.UUID(r.id)  # canonical hyphenated uuid string
        assert r.fid > 0 and r.target_fid > 0
    # re-run: windows before the unpublished gap (1750957188) were committed
    # and are skipped; the two windows after the gap stay uncommitted (W7 —
    # completion never jumps a gap) and are re-read idempotently. State is
    # unchanged either way thanks to the recency-guarded upsert.
    report2 = pipe.run_catchup(
        start_timestamp=1750957186, end_timestamp=1750957191, now=1750957191
    )
    assert report2.files_imported == 2
    assert report2.missing_windows == 1
    assert pipe.sink.read().count() == len(rows)


def test_import_real_verifications_fixture(spark, tmp_path):
    src = str(tmp_path / "vsrc")
    os.makedirs(src)
    for name in os.listdir(FIXTURE_DIR):
        if name.startswith("nindexer-verifications-"):
            shutil.copy(os.path.join(FIXTURE_DIR, name), os.path.join(src, name))
    spec = REFERENCE_TABLES["verifications"]
    pipe = ImportPipeline(
        spark, spec, src, str(tmp_path / "vlake"), incremental_duration=1
    )
    pipe.run_catchup(
        start_timestamp=1749145661, end_timestamp=1749145662, now=1749145662
    )
    imported = pipe.sink.read()
    assert imported.count() == 1
    # graph projection on the real address bytes -> 0x-hex rendering
    nodes, edges = verifications_to_nodes_and_edges(imported)
    node = nodes.collect()[0]
    assert node.id.startswith("0x") and len(node.id) == 42  # 20-byte address
    edge = edges.collect()[0]
    assert edge.relationship == "VERIFIED_ADDRESS" and edge.dst == node.id
