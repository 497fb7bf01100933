"""Pre-training curation pipeline tests beyond oracle parity: the
streaming leg (stateless stages + fingerprint-keyed sink dedup across
micro-batches) and the row-local shingle expression's equivalence to the
batch shingle stream.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neynar_parquet_importer_spark.operators.corpus import shingle_array
from neynar_parquet_importer_spark.operators.dedup import _shingle_stream
from neynar_parquet_importer_spark.plans.pretrain import curate_stream
from neynar_parquet_importer_spark.sinks.lake_upsert import LakeUpsertSink

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and it is a fine day "
    "for the animals to run in the field of tall grass"
)


def test_shingle_array_matches_batch_stream(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    via_expr = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(shingle_array("text", 3)).alias("shingle"),
    )
    via_stream = _shingle_stream(docs, "text", "doc_id", 3).select("id", "shingle")
    sym_diff = via_expr.exceptAll(via_stream).count() + via_stream.exceptAll(via_expr).count()
    assert sym_diff == 0


def test_curate_stream_sink_dedups_across_batches(spark, tmp_path):
    """Two micro-batches carry the same content under different ids: the
    stateless curation plan passes both rows, and the fingerprint-keyed
    upsert sink collapses them — cross-batch exact dedup with an unbounded
    horizon and zero engine state (the W10 sink-as-state pattern)."""
    src = str(tmp_path / "src")
    os.makedirs(src)

    def write_batch(name, rows):
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/{name}")

    # batch 1: one good doc, one too short (gated out)
    write_batch("b1", [(1, GOOD, "en"), (2, "tiny", "en")])

    stream = spark.readStream.schema(DOC_SCHEMA).option(
        "pathGlobFilter", "*.parquet"
    ).parquet(f"{src}/*")
    curated = curate_stream(stream, strat_fractions={"en": 1.0})

    sink = LakeUpsertSink(
        spark, str(tmp_path / "lake"), primary_key=("fp",), version_column="doc_id"
    )

    def sink_batch(batch_df, batch_id):
        sink.upsert(batch_df, epoch=batch_id)

    ckpt = str(tmp_path / "ckpt")
    q = curated.writeStream.foreachBatch(sink_batch).option(
        "checkpointLocation", ckpt
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    state = sink.read().collect()
    assert [r.doc_id for r in state] == [1]  # short doc gated out

    # batch 2: same content, new id (dup) + genuinely new content
    write_batch(
        "b2",
        [
            (10, GOOD, "en"),
            (11, GOOD.replace("fox", "wolf"), "en"),
        ],
    )
    q = curated.writeStream.foreachBatch(sink_batch).option(
        "checkpointLocation", ckpt
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    rows = {r.doc_id for r in sink.read().collect()}
    # fingerprint collapse: id 10 supersedes id 1 (same fp, higher version);
    # id 11 is new content
    assert rows == {10, 11}


def test_curate_stream_decontaminates(spark, tmp_path):
    """A streamed doc sharing a 3-gram with the benchmark is dropped by
    the row-local arrays_overlap filter (no streaming state, no join)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, GOOD, "en"), (2, "completely unrelated words describing different things entirely here today", "en")],
        DOC_SCHEMA,
    ).coalesce(1).write.parquet(f"{src}/b1")

    bench = spark.createDataFrame(
        [(100, "the quick brown fox sleeps", "en")], DOC_SCHEMA
    )
    stream = spark.readStream.schema(DOC_SCHEMA).option(
        "pathGlobFilter", "*.parquet"
    ).parquet(f"{src}/*")
    curated = curate_stream(stream, benchmark=bench, strat_fractions={"en": 1.0})

    out = []

    def collect_batch(batch_df, batch_id):
        out.extend(batch_df.collect())

    q = curated.writeStream.foreachBatch(collect_batch).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    assert [r.doc_id for r in out] == [2], "contaminated doc must be dropped"


def test_curate_stream_rejects_oversized_benchmark(spark, monkeypatch):
    """The streaming leg inlines benchmark shingles as a plan literal, so
    its size is bounded hard: past MAX_STREAM_BENCH_SHINGLES the call must
    raise (pointing at the batch leg) rather than compile a plan-killing
    literal. The limit is lowered here so the test stays fast."""
    from neynar_parquet_importer_spark.plans import pretrain as P

    monkeypatch.setattr(P, "MAX_STREAM_BENCH_SHINGLES", 3)
    bench = spark.createDataFrame(
        [(100, GOOD, "en")], DOC_SCHEMA
    )  # GOOD has far more than 3 distinct 3-gram shingles
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(
        "/tmp/nonexistent-never-started/*"
    )
    with pytest.raises(ValueError, match="batch leg"):
        curate_stream(stream, benchmark=bench)


def _budget_sinks(spark, tmp_path):
    from neynar_parquet_importer_spark.sinks.lake_upsert import LakeUpsertSink

    doc_sink = LakeUpsertSink(
        spark, str(tmp_path / "docs"), ("fp",), "doc_id"
    )
    budget_sink = LakeUpsertSink(
        spark, str(tmp_path / "budget"), ("split", "lang"), "updated_at"
    )
    return doc_sink, budget_sink


BUDGET_SCHEMA = (
    "doc_id long, lang string, fp string, n_tokens long, split string"
)


def _recompute(doc_sink):
    return sorted(
        tuple(r)
        for r in doc_sink.read()
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
        .collect()
    )


def test_budget_fold_matches_recompute_over_lifecycles(spark, tmp_path):
    """Randomized fingerprint lifecycles (re-observations move documents
    between (split, lang) cells and change token counts): after every
    folded micro-batch, the incrementally-maintained budget must equal
    the full recompute over the doc sink — O(batch) maintenance with
    O(state) answers."""
    import random

    from neynar_parquet_importer_spark.plans.pretrain import (
        fold_budget_batch,
        read_budget,
    )

    rng = random.Random(7)
    doc_sink, budget_sink = _budget_sinks(spark, tmp_path)
    fps = [f"fp{i}" for i in range(12)]
    langs, splits = ["en", "de", "zh"], ["train", "val"]
    doc_id = 0
    for epoch in range(1, 5):
        rows = []
        for fp in rng.sample(fps, rng.randrange(3, 9)):
            doc_id += 1
            rows.append(
                (
                    doc_id,
                    rng.choice(langs),
                    fp,
                    rng.randrange(1, 200),
                    rng.choice(splits),
                )
            )
        batch = spark.createDataFrame(rows, BUDGET_SCHEMA)
        fold_budget_batch(spark, doc_sink, budget_sink, batch, epoch)
        got = sorted(tuple(r) for r in read_budget(budget_sink).collect())
        assert got == _recompute(doc_sink), f"epoch {epoch}"


def test_budget_fold_honors_sink_version_column(spark, tmp_path):
    """The fold must guard and stamp with the BUDGET SINK's own version
    column (read from the sink), not a hardcoded 'updated_at' — a sink
    built with any other column would be silently mis-guarded."""
    from neynar_parquet_importer_spark.plans.pretrain import (
        fold_budget_batch,
        read_budget,
    )
    from neynar_parquet_importer_spark.sinks.lake_upsert import LakeUpsertSink

    doc_sink = LakeUpsertSink(spark, str(tmp_path / "docs"), ("fp",), "doc_id")
    budget_sink = LakeUpsertSink(
        spark, str(tmp_path / "budget"), ("split", "lang"), "stamped_epoch"
    )
    b1 = spark.createDataFrame(
        [(1, "en", "a", 100, "train"), (2, "de", "b", 50, "val")], BUDGET_SCHEMA
    )
    fold_budget_batch(spark, doc_sink, budget_sink, b1, 1)
    fold_budget_batch(spark, doc_sink, budget_sink, b1, 1)  # replay: no-op
    want = sorted([("train", "en", 1, 100), ("val", "de", 1, 50)])
    assert sorted(tuple(r) for r in read_budget(budget_sink).collect()) == want
    assert "stamped_epoch" in budget_sink.read().columns


def test_budget_fold_partial_stamp_replay_converges(spark, tmp_path):
    """Crash mid-budget-upsert (some cells stamped at the epoch, others
    not, docs un-advanced): replay must apply exactly the missing cells'
    deltas and a second replay must be a no-op."""
    from neynar_parquet_importer_spark.plans.pretrain import (
        fold_budget_batch,
        read_budget,
    )

    doc_sink, budget_sink = _budget_sinks(spark, tmp_path)
    b1 = spark.createDataFrame(
        [(1, "en", "a", 100, "train"), (2, "de", "b", 50, "val")], BUDGET_SCHEMA
    )
    fold_budget_batch(spark, doc_sink, budget_sink, b1, 1)

    # epoch 2 touches (train,en) and (val,zh); simulate a crash that
    # stamped only (train,en)
    b2 = spark.createDataFrame(
        [(3, "en", "c", 25, "train"), (4, "zh", "d", 10, "val")], BUDGET_SCHEMA
    )
    budget_sink.upsert(
        spark.createDataFrame(
            [("train", "en", 125, 2, 2)],
            "split string, lang string, n_tokens long, n_docs long, updated_at long",
        ).select("split", "lang", "n_docs", "n_tokens", "updated_at"),
        2,
    )
    fold_budget_batch(spark, doc_sink, budget_sink, b2, 2)  # replay

    want = sorted(
        [("train", "en", 2, 125), ("val", "de", 1, 50), ("val", "zh", 1, 10)]
    )
    got = sorted(tuple(r) for r in read_budget(budget_sink).collect())
    assert got == want, (got, want)
    fold_budget_batch(spark, doc_sink, budget_sink, b2, 2)  # second replay
    assert sorted(tuple(r) for r in read_budget(budget_sink).collect()) == want


def test_curate_stream_feeds_budget_fold_end_to_end(spark, tmp_path):
    """The full streaming story in one flow: micro-batches -> stateless
    curation -> foreachBatch folds BOTH sinks (docs keyed by fingerprint,
    budgets keyed by (split, lang)). A later batch restating the same
    content under a new id supersedes the old doc AND moves/keeps its
    budget contribution — the maintained budget always equals the
    recompute over the doc sink."""
    import os

    from neynar_parquet_importer_spark.plans.pretrain import (
        fold_budget_batch,
        read_budget,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)

    def write_batch(name, rows):
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/{name}")

    write_batch("b1", [(1, GOOD, "en"), (2, GOOD.replace("fox", "owl"), "en")])

    stream = spark.readStream.schema(DOC_SCHEMA).option(
        "pathGlobFilter", "*.parquet"
    ).parquet(f"{src}/*")
    curated = curate_stream(stream, strat_fractions={"en": 1.0})
    doc_sink, budget_sink = _budget_sinks(spark, tmp_path)

    def sink_batch(batch_df, batch_id):
        fold_budget_batch(
            spark, doc_sink, budget_sink, batch_df, epoch=batch_id + 1
        )

    ckpt = str(tmp_path / "ckpt")
    for n, rows in [
        (1, None),
        (2, [(10, GOOD, "en")]),  # same fp as doc 1, new id: supersedes
    ]:
        if rows is not None:
            write_batch(f"b{n}", rows)
        q = curated.writeStream.foreachBatch(sink_batch).option(
            "checkpointLocation", ckpt
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)
        got = sorted(tuple(r) for r in read_budget(budget_sink).collect())
        assert got == _recompute(doc_sink), f"after batch {n}"

    # the restated content replaced doc 1 (same fp), so totals are
    # unchanged: still 2 docs in (train/.../en cells combined)
    assert doc_sink.read().count() == 2
    assert sum(r[2] for r in (tuple(x) for x in read_budget(budget_sink).collect())) == 2
