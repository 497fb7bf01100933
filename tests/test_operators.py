"""Operator unit tests: dedup family, similarity search, text analysis,
multimodal plumbing, graph transforms."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neynar_parquet_importer_spark.operators import (
    brute_force_topk,
    exact_dedup,
    last_writer_wins,
    lsh_bucketed_topk,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_duplicates,
)
from neynar_parquet_importer_spark.operators.multimodal import (
    decode_image,
    documents_as_media,
    extract_features,
    frame_sample_plan,
)
from neynar_parquet_importer_spark.graph import (
    edges_to_node_keys,
    follows_to_edges,
    profiles_with_verifications,
    users_to_nodes,
    verifications_to_nodes_and_edges,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")
    other = "completely different content about spark query engines and shuffles"
    return spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, other)],
        "doc_id long, text string",
    )


def test_exact_dedup(docs):
    out = {r.keep_id: r.n_copies for r in exact_dedup(docs, "text", "doc_id").collect()}
    assert out[1] == 2  # docs 1 and 2 identical, keeper is min id
    assert out[3] == 1 and out[4] == 1


def test_last_writer_wins(spark):
    df = spark.createDataFrame(
        [(1, "old", 1), (1, "new", 2), (2, "only", 1)],
        "id long, v string, version long",
    )
    out = {r.id: r.v for r in last_writer_wins(df, ["id"], [F.desc("version")]).collect()}
    assert out == {1: "new", 2: "only"}


def test_minhash_lsh_finds_near_dups(docs):
    sigs = minhash_signatures(docs, num_hashes=32, shingle_n=3)
    assert sigs.count() == 4
    cands = minhash_lsh_candidates(sigs, bands=8, rows_per_band=4).collect()
    pairs = {(r.id_a, r.id_b): r.est_jaccard for r in cands}
    assert pairs.get((1, 2)) == 1.0  # identical docs always collide
    near = pairs.get((1, 3)) or pairs.get((2, 3))
    assert near is not None and near > 0.3  # near-dup lands in a shared band
    assert (1, 4) not in pairs and (2, 4) not in pairs and (3, 4) not in pairs


def test_ngram_jaccard_rerank(docs, spark):
    cands = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "id_a long, id_b long")
    out = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(docs, cands).collect()}
    assert out[(1, 2)] == 1.0
    assert 0.3 < out[(1, 3)] < 1.0
    assert out[(1, 4)] == 0.0


def test_simhash_near_duplicates(docs):
    h = simhash(docs)
    assert h.count() == 4
    dupes = {(r.id_a, r.id_b): r.hamming for r in simhash_near_duplicates(h, max_hamming=10).collect()}
    assert dupes.get((1, 2)) == 0  # identical => same simhash
    assert (1, 4) not in dupes


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
        (4, [0.7, 0.7, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(vectors):
    out = brute_force_topk(vectors, [1.0, 0.0, 0.0], k=3).collect()
    assert [r.vec_id for r in out] == [0, 1, 4]
    assert out[0].cos_sim == pytest.approx(1.0)


def test_lsh_topk_recalls_close_neighbors(vectors):
    out = lsh_bucketed_topk(vectors, [1.0, 0.0, 0.0], k=3, n_planes=4, multiprobe_hamming=1)
    ids = [r.vec_id for r in out.collect()]
    assert 0 in ids  # the exact match must survive bucket pruning


def test_multimodal_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"bytes")


def test_multimodal_extract_features(spark):
    docs = spark.createDataFrame([(1, "hello"), (2, "world")], "doc_id long, text string")
    out = extract_features(documents_as_media(docs), fake=True).collect()
    assert len(out) == 2
    by_id = {r.media_id: r for r in out}
    assert by_id[1].n_bytes == 5
    assert len(by_id[1].feature) == 8
    assert by_id[1].content_sha256 != by_id[2].content_sha256
    # determinism
    again = extract_features(documents_as_media(docs), fake=True).collect()
    assert {r.media_id: r.feature for r in again} == {r.media_id: r.feature for r in out}


def test_frame_sample_plan(spark):
    media = spark.createDataFrame(
        [(1, None, "video/mp4", None, None, 3500)],
        "media_id long, payload binary, mime_type string, width int, height int, duration_ms long",
    )
    out = frame_sample_plan(media, every_ms=1000).collect()
    assert [r.frame_ts_ms for r in out] == [0, 1000, 2000, 3000]


# -- graph transforms -------------------------------------------------------

def _ts(d):
    return datetime.datetime(2024, 1, d)


def test_follows_to_edges_and_node_keys(spark):
    follows = spark.createDataFrame(
        [("a", 1, 2, _ts(1), _ts(1), _ts(2), None)],
        "id string, fid long, target_fid long, timestamp timestamp, "
        "created_at timestamp, updated_at timestamp, deleted_at timestamp",
    )
    edges = follows_to_edges(follows)
    row = edges.collect()[0]
    assert (row.src, row.dst, row.relationship) == (1, 2, "FOLLOWS")
    nodes = edges_to_node_keys(edges)
    assert sorted(r.id for r in nodes.collect()) == [1, 2]


def test_users_to_nodes_optional_columns(spark):
    fids = spark.createDataFrame([(1, _ts(1))], "fid long, updated_at timestamp")
    out = users_to_nodes(fids)
    assert out.columns == ["id", "label", "updated_at"]
    profiles = spark.createDataFrame(
        [(1, _ts(1), "u", "d")], "fid long, updated_at timestamp, username string, display_name string"
    )
    out2 = users_to_nodes(profiles)
    assert "username" in out2.columns and out2.collect()[0].label == "User"


def test_verifications_projection(spark):
    ver = spark.createDataFrame(
        [(1, bytearray(b"\xab\xcd"), 0, _ts(1), _ts(1), None)],
        "fid long, address binary, protocol smallint, timestamp timestamp, "
        "updated_at timestamp, deleted_at timestamp",
    )
    nodes, edges = verifications_to_nodes_and_edges(ver)
    assert nodes.collect()[0].id == "0xabcd"
    e = edges.collect()[0]
    assert (e.src, e.dst, e.relationship) == (1, "0xabcd", "VERIFIED_ADDRESS")


def test_profiles_with_verifications_view(spark):
    profiles = spark.createDataFrame(
        [(1, "alice", _ts(1)), (2, "bob", _ts(1))],
        "fid long, username string, updated_at timestamp",
    )
    ver = spark.createDataFrame(
        [
            (1, bytearray(b"\x01"), 0, _ts(1), _ts(1), None),
            (1, bytearray(b"\x02"), 0, _ts(3), _ts(3), None),
            (1, bytearray(b"\x03"), 0, _ts(2), _ts(2), _ts(4)),  # deleted
        ],
        "fid long, address binary, protocol smallint, timestamp timestamp, "
        "updated_at timestamp, deleted_at timestamp",
    )
    out = {r.fid: r.verifications for r in profiles_with_verifications(profiles, ver).collect()}
    import json

    alice = json.loads(out[1])
    assert [a["address"] for a in alice] == ["0x02", "0x01"]  # ts DESC, deleted excluded
    assert out[2] == "[]"  # left join keeps bob with empty array
