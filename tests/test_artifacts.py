"""Trained-artifact store: bit-exact float round trips (a reloaded
model must project/assign identically), kind/checksum integrity, and
atomic writes. The store closes the "persisted artifact" loop the index
builders document."""

from __future__ import annotations

import json

import pytest

from neynar_parquet_importer_spark.catalog import load_table
from neynar_parquet_importer_spark.operators import artifacts as art
from neynar_parquet_importer_spark.operators import bpe, pca
from neynar_parquet_importer_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def test_pca_roundtrip_is_bit_exact(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    model = pca.pca_fit(emb, 3, sample_size=256)
    p = str(tmp_path / "pca.json")
    art.save_pca(p, *model)
    loaded = art.load_pca(p)
    assert loaded == model  # exact float equality, not approx
    # and the distributed projection under the reloaded basis is
    # row-for-row identical
    a = sorted(
        map(tuple, pca.project(emb, model[0], model[1]).limit(20).collect())
    )
    b = sorted(
        map(tuple, pca.project(emb, loaded[0], loaded[1]).limit(20).collect())
    )
    assert a == b


def test_ivf_and_pq_roundtrip(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    cents = sim.ivf_centroids(emb, n_centroids=4)
    art.save_ivf(str(tmp_path / "ivf.json"), cents)
    assert art.load_ivf(str(tmp_path / "ivf.json")) == cents
    cbs = sim.pq_codebooks(emb, n_sub=4)
    art.save_pq(str(tmp_path / "pq.json"), cbs)
    assert art.load_pq(str(tmp_path / "pq.json")) == cbs


def test_bpe_roundtrip(tmp_path):
    merges = bpe.bpe_learn_py(["a a a b a b", "a b a b"], 3)
    p = str(tmp_path / "bpe.json")
    art.save_bpe(p, merges)
    assert art.load_bpe(p) == merges


def test_kind_mismatch_and_corruption_fail_loudly(tmp_path):
    p = str(tmp_path / "m.json")
    art.save_ivf(p, [[1.0, 2.0]])
    with pytest.raises(ValueError, match="kind"):
        art.load_pca(p)
    doc = json.load(open(p))
    doc["payload"]["centroids"][0][0] = 9.9  # tamper, stale checksum
    json.dump(doc, open(p, "w"))
    with pytest.raises(ValueError, match="checksum"):
        art.load_ivf(p)


def test_no_partial_file_visible(tmp_path):
    """save writes tmp+rename: the target path either doesn't exist or
    holds a complete, checksum-valid artifact."""
    import os

    p = str(tmp_path / "a.json")
    art.save_ivf(p, [[0.5] * 8])
    assert not [f for f in os.listdir(tmp_path) if ".tmp." in f]
    assert art.load_ivf(p) == [[0.5] * 8]
