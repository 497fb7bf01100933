"""Structured Streaming tests: AvailableNow catch-up through foreachBatch
upsert, checkpoint-based resume without re-processing, and the tumbling
window aggregate."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import types as T

from neynar_parquet_importer_spark.streaming import ImportPipeline, streaming_window_counts
from tests.test_pipeline import SPEC, _row, _write_window


@pytest.fixture()
def stream_env(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_window(spark, src, 0, 1000, [_row(1, 10, 20, 500)])
    _write_window(spark, src, 1000, 1, [_row(1, 10, 99, 1000), _row(2, 11, 21, 1000)])
    pipe = ImportPipeline(spark, SPEC, src, str(tmp_path / "lake"), incremental_duration=1)
    return pipe, src, str(tmp_path / "ckpt")


def test_streaming_available_now_upserts(stream_env):
    pipe, src, ckpt = stream_env
    q = pipe.run_streaming(ckpt)
    q.awaitTermination(120)
    state = {r.id: r.target_fid for r in pipe.sink.read().collect()}
    assert state == {"id-1": 99, "id-2": 21}  # newer window won for id-1


def test_streaming_checkpoint_resume(stream_env, spark):
    pipe, src, ckpt = stream_env
    pipe.run_streaming(ckpt).awaitTermination(120)
    first = sorted((r.id, r.target_fid) for r in pipe.sink.read().collect())

    # restart with same checkpoint: no files re-processed, state unchanged
    pipe.run_streaming(ckpt).awaitTermination(120)
    assert sorted((r.id, r.target_fid) for r in pipe.sink.read().collect()) == first

    # a new window arriving is picked up on the next run
    _write_window(spark, src, 1001, 1, [_row(3, 12, 22, 1001)])
    pipe.run_streaming(ckpt).awaitTermination(120)
    assert pipe.sink.read().count() == 3


def test_streaming_window_counts(spark, tmp_path):
    src = str(tmp_path / "events")
    os.makedirs(src)
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("v", T.LongType())]
    )
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(base + datetime.timedelta(minutes=m), m) for m in (0, 10, 70, 80, 130)],
        schema,
    )
    df.coalesce(1).write.mode("overwrite").parquet(src)

    counts = streaming_window_counts(spark, src, schema, ts_col="ts", window_duration="1 hour")
    q = (
        counts.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["window"]["start"].minute + r["window"]["start"].hour * 60: r["count"]
        for r in spark.sql("select * from win_counts").collect()
    }
    assert rows == {0: 2, 60: 2, 120: 1}


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from neynar_parquet_importer_spark.streaming.pipeline import streaming_dedup

    src = str(tmp_path / "dupsrc")
    os.makedirs(src)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.LongType()),
        ]
    )
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base, 10),
        (1, base + datetime.timedelta(minutes=1), 11),  # dup id within horizon
        (2, base + datetime.timedelta(minutes=2), 20),
        (2, base + datetime.timedelta(minutes=2), 20),  # exact dup
        (3, base + datetime.timedelta(minutes=3), 30),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(src)
    out = streaming_dedup(spark, src, schema, id_cols=["event_id"], watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM dedup_stream").collect()
    assert sorted(r.event_id for r in got) == [1, 2, 3]


def test_streaming_enrich_stream_static_join(spark, tmp_path):
    from neynar_parquet_importer_spark.streaming.pipeline import streaming_enrich

    src = str(tmp_path / "esrc")
    os.makedirs(src)
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("v", T.LongType())]
    )
    spark.createDataFrame([(1, 100), (2, 200), (9, 900)], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_enrich(stream, dim, on=["user_id"])
    q = (
        out.writeStream.format("memory")
        .queryName("enriched_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.user_id: r.tier for r in spark.sql("SELECT * FROM enriched_stream").collect()}
    assert got == {1: "gold", 2: "silver", 9: None}  # left join keeps unmatched
