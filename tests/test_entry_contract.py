"""Driver-contract shape tests for __spark_entry__.py (no Spark session:
these pin the queries()/oracle_sql() registry contract and the
artifact-oracle degradation behavior, ADVICE r5 medium)."""

from __future__ import annotations

import importlib.util
import warnings


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_query_has_an_oracle_twin():
    m = _load_entry()
    qs, osql = m.queries(), m.oracle_sql()
    assert set(qs) == set(osql), (
        "rows-only queries reappeared: " f"{sorted(set(qs) - set(osql))}"
    )


def test_missing_corpus_degrades_with_warning_not_silently(monkeypatch):
    """With the gate corpus absent, exactly the four artifact-oracle
    queries degrade to rows-only AND a warning names them; with it
    present, generation failures would propagate (no blanket except)."""
    m = _load_entry()
    monkeypatch.setenv("ORACLE_SF_DIR", "/root/testdata/does-not-exist")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        degraded = m.oracle_sql()
    missing = set(m.queries()) - set(degraded)
    assert missing == {
        "embedding_lsh_topk",
        "embedding_ivf_topk",
        "embedding_ivf_knn_join",
        "embedding_pq_topk",
        "embedding_near_dup_lsh",
        "kmeans_corpus_clusters",
        "kmeans_domain_profile",
        "pca_label_compression",
        "pca_component_variance",
        "bpe_learned_merges",
        "bpe_token_compression",
        "bpe_stable_merges",
        "pagerank_supplier_rank",
        "lpa_supplier_communities",
        "kcore_supplier_stats",
    }
    assert any("missing" in str(w.message) for w in caught)


def test_generator_bugs_propagate(monkeypatch):
    """A genuine artifact-generator failure must NOT be swallowed into a
    silent rows-only downgrade."""
    import neynar_parquet_importer_spark.plans.queries as Q

    m = _load_entry()

    def boom(sf_dir):
        raise RuntimeError("generator bug")

    monkeypatch.setattr(Q, "build_artifact_oracles", boom)
    # the entry module holds its own reference; patch that too
    monkeypatch.setattr(m, "build_artifact_oracles", boom)
    try:
        m.oracle_sql()
    except RuntimeError as exc:
        assert "generator bug" in str(exc)
    else:  # pragma: no cover
        raise AssertionError("generator failure was swallowed")


def test_bench_covers_every_registered_query():
    """bench.py's explicit list must track the registry: a new query that
    is registered (and therefore correctness-gated) but silently missing
    from the bench would never get a recorded timing."""
    import importlib.util

    from neynar_parquet_importer_spark.plans.queries import QUERIES

    import os

    bench_path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench", bench_path)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    assert sorted(bench.BENCH_QUERIES) == sorted(QUERIES)


def test_bench_pass_count_validated_upfront(monkeypatch):
    """A bad SPARK_GRAFT_BENCH_PASSES must fail at startup, not at
    min([]) after a multi-minute warmup."""
    import bench

    import pytest as _pytest

    monkeypatch.setenv("SPARK_GRAFT_BENCH_PASSES", "0")
    with _pytest.raises(SystemExit, match=">= 1"):
        bench._n_passes()
    monkeypatch.setenv("SPARK_GRAFT_BENCH_PASSES", "two")
    with _pytest.raises(SystemExit, match="int"):
        bench._n_passes()
    monkeypatch.setenv("SPARK_GRAFT_BENCH_PASSES", "2")
    assert bench._n_passes() == 2
