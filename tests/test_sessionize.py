"""Stateful streaming sessionization (applyInPandasWithState): sessions
close on gap within a batch and on later-batch evidence; state persists
across micro-batches (maxFilesPerTrigger=1 forces multiple batches)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neynar_parquet_importer_spark.streaming.sessionize import sessionize_stream

SCHEMA = T.StructType(
    [T.StructField("user_id", T.LongType()), T.StructField("es", T.LongType())]
)


def test_sessionize_stream_multi_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    os.makedirs(src)
    # batch file 1: user 1 has two events 10s apart, then a 3600s gap event
    spark.createDataFrame(
        [(1, 1000), (1, 1010), (1, 5000)], SCHEMA
    ).coalesce(1).write.parquet(os.path.join(src, "f1"))
    # batch file 2: user 1 again far later (closes the 5000 session),
    # user 2 appears (stays open -> not emitted)
    spark.createDataFrame(
        [(1, 10000), (2, 7000)], SCHEMA
    ).coalesce(1).write.parquet(os.path.join(src, "f2"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = sessionize_stream(stream, gap_s=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in spark.sql("select * from sessions").collect()
    }
    # closed by in-batch gap: [1000,1010]; closed by batch-2 event: [5000]
    assert rows[(1, 1000)] == (1010, 2)
    assert rows[(1, 5000)] == (5000, 1)
    # still-open sessions may be flushed by the idle processing-time
    # timeout before the query drains; if emitted they must be intact
    if (1, 10000) in rows:
        assert rows[(1, 10000)] == (10000, 1)
    if (2, 7000) in rows:
        assert rows[(2, 7000)] == (7000, 1)
