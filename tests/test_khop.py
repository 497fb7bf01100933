"""k-hop BFS: min-dist semantics on a crafted graph, isolated seeds,
frontier correctness vs the single-process replay (and networkx when
present). Cross-engine parity is the ``khop_supplier_reach`` recursive-
CTE oracle twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.graph import khop as kh
from neynar_parquet_importer_spark.operators.dedup import release_cached

#   1 - 2 - 3 - 4 - 5     path graph
#   1 - 6                 short-cut branch
#   7 - 8                 disconnected component
EDGES = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 6), (7, 8)]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(EDGES, "a long, b long")


def _reach(spark, edges, seed_ids, k):
    seeds = spark.createDataFrame(
        [(s,) for s in seed_ids], "root long"
    )
    out = {
        (r.root, r.node): r.dist
        for r in kh.khop_reach(edges, seeds, k).collect()
    }
    release_cached()
    return out


def test_min_dist_bfs(spark, edges):
    got = _reach(spark, edges, [1], 3)
    assert got == {
        (1, 1): 0,
        (1, 2): 1,
        (1, 6): 1,
        (1, 3): 2,
        (1, 4): 3,
    }


def test_multi_source_and_disconnected(spark, edges):
    got = _reach(spark, edges, [1, 7], 2)
    # 7's component is size 2; 1 never reaches it and vice versa
    assert {(n, d) for (r, n), d in got.items() if r == 7} == {
        (7, 0),
        (8, 1),
    }
    assert {n for (r, n) in got if r == 1} == {1, 2, 6, 3}


def test_isolated_seed_and_k0(spark, edges):
    # a seed absent from the edge list reaches only itself
    got = _reach(spark, edges, [99], 3)
    assert got == {(99, 99): 0}
    # k=0 is just the seed rows
    got0 = _reach(spark, edges, [1, 7], 0)
    assert got0 == {(1, 1): 0, (7, 7): 0}


def test_matches_replay_and_networkx(spark, edges):
    seeds = [1, 3, 7]
    got = _reach(spark, edges, seeds, 2)
    assert got == kh.khop_replay(EDGES, seeds, 2)
    nx = pytest.importorskip("networkx")
    g = nx.Graph(EDGES)
    expect = {}
    for s in seeds:
        for n, d in nx.single_source_shortest_path_length(
            g, s, cutoff=2
        ).items():
            expect[(s, n)] = d
    assert got == expect


def test_summary_checksums(spark, edges):
    seeds = spark.createDataFrame([(1,)], "root long")
    rows = {
        (r.root, r.dist): (r.n_nodes, r.node_checksum)
        for r in kh.khop_summary(kh.khop_reach(edges, seeds, 2)).collect()
    }
    release_cached()
    assert rows == {
        (1, 0): (1, 1),
        (1, 1): (2, 8),   # nodes 2 and 6
        (1, 2): (1, 3),
    }


def test_negative_k_raises(spark, edges):
    seeds = spark.createDataFrame([(1,)], "root long")
    with pytest.raises(ValueError):
        kh.khop_reach(edges, seeds, -1)
