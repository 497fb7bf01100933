"""Env-gated real-object-store leg for the S4/S5/S6 window seam.

The windows discovery/probe path already runs through the Hadoop
FileSystem API for every URI source (file:// exercised in
tests/test_pipeline.py::test_uri_source_listing_via_hadoop_fs — the
same code path s3a:// takes, modulo the FS implementation). This module
closes the remaining distance to a REAL object store the moment an
environment provides one:

- ``TEST_S3A_ENDPOINT`` (e.g. ``http://localhost:29000`` from
  ``make live-env``'s MinIO) plus ``TEST_S3A_BUCKET`` /
  ``TEST_S3A_ACCESS_KEY`` / ``TEST_S3A_SECRET_KEY`` select the store;
- the hadoop-aws + aws-sdk jars must be on Spark's classpath (not
  bundled with pyspark; e.g. ``spark.jars.packages
  org.apache.hadoop:hadoop-aws:3.4.1``). Without them the test SKIPS
  with an actionable message rather than failing.

The leg then writes two incremental windows to the bucket with Spark,
discovers them via plan_windows over the s3a:// URI, and runs the full
catch-up — listing, existence probe, read, and ledger commit all
against the real wire.
"""

from __future__ import annotations

import os

import pytest

ENDPOINT = os.environ.get("TEST_S3A_ENDPOINT")
BUCKET = os.environ.get("TEST_S3A_BUCKET", "spark-graft-test")
ACCESS = os.environ.get("TEST_S3A_ACCESS_KEY", "spark_graft")
SECRET = os.environ.get("TEST_S3A_SECRET_KEY", "spark_graft_test")


def _s3a_available(spark) -> str | None:
    """Reason the leg can't run, or None if it can."""
    if not ENDPOINT:
        return "TEST_S3A_ENDPOINT not set; live S3/MinIO test skipped"
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.hadoop.fs.s3a.S3AFileSystem"
        )
    except Exception:
        return (
            "hadoop-aws not on the Spark classpath (add e.g. "
            "spark.jars.packages=org.apache.hadoop:hadoop-aws:3.4.1)"
        )
    return None


@pytest.mark.skipif(not ENDPOINT, reason="TEST_S3A_ENDPOINT not set")
def test_windows_catchup_against_real_object_store(spark, tmp_path):
    reason = _s3a_available(spark)
    if reason:
        pytest.skip(reason)
    from tests.test_pipeline import SPEC, _row, _write_window

    from neynar_parquet_importer_spark.sources.windows import plan_windows
    from neynar_parquet_importer_spark.streaming.pipeline import ImportPipeline

    hconf = spark._jsc.hadoopConfiguration()
    hconf.set("fs.s3a.endpoint", ENDPOINT)
    hconf.set("fs.s3a.access.key", ACCESS)
    hconf.set("fs.s3a.secret.key", SECRET)
    hconf.set("fs.s3a.path.style.access", "true")
    hconf.set("fs.s3a.connection.ssl.enabled", "false")

    # stage single-file windows locally (the helper's os.replace is
    # local-only), then upload through the Hadoop FS API — the same API
    # the discovery/probe path uses
    local = str(tmp_path / "stage")
    os.makedirs(local)
    _write_window(spark, local, 100, 1, [_row(1, 1, 2, 5)])
    _write_window(spark, local, 101, 1, [_row(2, 3, 4, 6)])
    src = f"s3a://{BUCKET}/windows-leg"
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(src).getFileSystem(hconf)
    for fname in os.listdir(local):
        fs.copyFromLocalFile(
            jvm.org.apache.hadoop.fs.Path(os.path.join(local, fname)),
            jvm.org.apache.hadoop.fs.Path(f"{src}/{fname}"),
        )

    plan = plan_windows(src, "nindexer", "follows", 100, 102, 1)
    assert len(plan.incremental_paths) == 2
    assert all(p.startswith("s3a://") for p in plan.incremental_paths)

    pipe = ImportPipeline(
        spark, SPEC, src, str(tmp_path / "s3lake"), incremental_duration=1
    )
    report = pipe.run_catchup(start_timestamp=100, end_timestamp=102, now=102)
    assert report.files_imported == 2 and report.rows_upserted == 2
