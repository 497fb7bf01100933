"""Integer-exact distributed PageRank (graph/pagerank.py): partition
invariance of the int64 mass recursion, equality with the single-process
replay, ranking sanity on a hub graph, and the no-dangling contract."""

from __future__ import annotations

from neynar_parquet_importer_spark.graph.pagerank import (
    SCALE,
    pagerank,
    pagerank_replay,
)

EDGE_SCHEMA = "src long, dst long"


def _hub_edges():
    """Star graph: everyone links to node 0 (directed both ways so no
    node dangles) + a 5-6 side pair."""
    e = []
    for v in range(1, 5):
        e += [(v, 0), (0, v)]
    e += [(5, 6), (6, 5)]
    return e


def test_distributed_matches_replay_exactly(spark):
    rows = _hub_edges()
    df = spark.createDataFrame(rows, EDGE_SCHEMA)
    got = {
        r["node"]: r["mass"] for r in pagerank(df, n_iter=5).collect()
    }
    want = pagerank_replay(rows, n_iter=5)
    assert got == want


def test_partition_invariance_bitwise(spark):
    rows = _hub_edges() * 1  # same edges, different physical layouts
    a = pagerank(
        spark.createDataFrame(rows, EDGE_SCHEMA).repartition(1), n_iter=4
    ).collect()
    b = pagerank(
        spark.createDataFrame(rows, EDGE_SCHEMA).repartition(7), n_iter=4
    ).collect()
    assert {(r["node"], r["mass"]) for r in a} == {
        (r["node"], r["mass"]) for r in b
    }


def test_hub_outranks_spokes_and_side_pair(spark):
    df = spark.createDataFrame(_hub_edges(), EDGE_SCHEMA)
    mass = {r["node"]: r["mass"] for r in pagerank(df, n_iter=5).collect()}
    assert mass[0] > mass[1]           # hub beats a spoke
    assert mass[0] > mass[5]           # hub beats the isolated pair
    assert mass[1] == mass[2] == mass[3] == mass[4]  # symmetric spokes
    assert mass[5] == mass[6]


def test_mass_is_conserved_up_to_floor_leakage(spark):
    """Total mass stays within [damped floor, SCALE]: each floor division
    leaks < 1 unit per edge/node per iteration — bounded, never negative,
    never created."""
    rows = _hub_edges()
    df = spark.createDataFrame(rows, EDGE_SCHEMA)
    total = sum(
        r["mass"] for r in pagerank(df, n_iter=5).collect()
    )
    n_nodes = 7
    n_edges = len(rows)
    leak_bound = 5 * (n_edges + n_nodes + 2)
    assert SCALE - leak_bound <= total <= SCALE


def test_empty_edges(spark):
    df = spark.createDataFrame([], EDGE_SCHEMA)
    assert pagerank(df, n_iter=3).count() == 0


def test_replay_np_bitequal_to_dict_replay():
    """The vectorized sf1 replay must be bit-identical to the pure-dict
    spec on random graphs (dangling nodes, multi-edges, skewed degree)."""
    import random

    import numpy as np

    from neynar_parquet_importer_spark.graph.pagerank import (
        pagerank_replay,
        pagerank_replay_np,
    )

    for seed in range(5):
        rng = random.Random(seed)
        n = rng.randint(2, 120)
        m = rng.randint(1, 600)
        edges = [(rng.randint(0, n), rng.randint(0, n)) for _ in range(m)]
        # include a dangling node (dst-only) explicitly
        edges.append((rng.randint(0, n), n + 7))
        want = pagerank_replay(edges, n_iter=5)
        src = np.array([e[0] for e in edges])
        dst = np.array([e[1] for e in edges])
        got = pagerank_replay_np(src, dst, n_iter=5)
        assert got == want, f"seed {seed}"
    assert pagerank_replay_np([], []) == {}


def test_symmetric_fast_path_matches_general_and_replay(spark):
    """symmetric=True (round-10: node set = distinct src, no
    per-iteration completion join) must be row-identical to the general
    path AND the replay on a both-directions graph, for every
    materialization granularity."""
    rows = _hub_edges()  # already contains both directions of each edge
    df = spark.createDataFrame(rows, EDGE_SCHEMA)
    want = pagerank_replay(rows, n_iter=5)
    for mat in (1, 2, 5):
        got = {
            r["node"]: r["mass"]
            for r in pagerank(
                df, n_iter=5, symmetric=True, materialize_every=mat
            ).collect()
        }
        assert got == want, f"materialize_every={mat}"
    general = {
        r["node"]: r["mass"] for r in pagerank(df, n_iter=5).collect()
    }
    assert general == want


def test_general_path_keeps_no_inflow_nodes(spark):
    """A node with out-edges but NO in-edges (asymmetric graph) must
    stay in the general-path result holding teleport mass — the row the
    symmetric shortcut would drop if misused."""
    rows = [(1, 2), (2, 1), (3, 1)]  # 3 has an out-edge, no in-edge
    df = spark.createDataFrame(rows, EDGE_SCHEMA)
    got = {r["node"]: r["mass"] for r in pagerank(df, n_iter=4).collect()}
    want = pagerank_replay(rows, n_iter=4)
    assert got == want
    assert 3 in got
