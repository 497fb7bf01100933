"""Label propagation: known community structure, replay equivalence on
a nontrivial deterministic graph, and tie-break semantics. Cross-engine
parity is the ``lpa_supplier_communities`` replay oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.graph import lpa


def _directed(spark, undirected_pairs):
    both = list(undirected_pairs) + [(b, a) for a, b in undirected_pairs]
    return spark.createDataFrame(both, "src long, dst long")


def test_two_cliques_with_bridge_split(spark):
    """Two 4-cliques joined by one bridge edge must resolve to two
    communities, each labeled by its clique's minimum id."""
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    e = _directed(spark, c1 + c2 + [(3, 10)])
    got = {
        r.node: r.label
        for r in lpa.label_propagation(e, n_iter=4).collect()
    }
    assert {got[v] for v in range(4)} == {0}
    assert {got[v] for v in range(10, 14)} == {10}


def test_spark_matches_replay_on_structured_graph(spark):
    """A deterministic mixed graph (ring + chords + a clique): the
    distributed result must equal the single-process replay node for
    node, every iteration count tested — the property the oracle
    generator relies on."""
    n = 40
    und = [(i, (i + 1) % n) for i in range(n)]
    und += [(i, (i + 7) % n) for i in range(0, n, 3)]
    und += [(a, b) for a in range(50, 55) for b in range(a + 1, 55)]
    und += [(20, 52)]
    pairs = sorted({(min(a, b), max(a, b)) for a, b in und if a != b})
    directed = pairs + [(b, a) for a, b in pairs]
    for n_iter in (1, 3):
        want = lpa.lpa_replay(directed, n_iter=n_iter)
        got = {
            r.node: r.label
            for r in lpa.label_propagation(
                _directed(spark, pairs), n_iter=n_iter
            ).collect()
        }
        assert got == want


def test_tie_breaks_to_smallest_label(spark):
    """Node 2 sees neighbors {0, 1} once each in round one: the tie must
    resolve to label 0 on both paths."""
    pairs = [(0, 2), (1, 2)]
    got = {
        r.node: r.label
        for r in lpa.label_propagation(
            _directed(spark, pairs), n_iter=1
        ).collect()
    }
    assert got[2] == 0
    assert lpa.lpa_replay(pairs + [(2, 0), (2, 1)], n_iter=1)[2] == 0


def test_community_sizes_sum_to_nodes(spark):
    pairs = [(i, i + 1) for i in range(9)]
    labels = lpa.label_propagation(_directed(spark, pairs), n_iter=2)
    sizes = lpa.community_sizes(labels)
    assert sizes.agg(F.sum("n_members")).collect()[0][0] == 10


def test_replay_np_bitequal_to_dict_replay():
    """Vectorized sf1 replay vs the dict spec on random SYMMETRIC graphs
    (the oracle shape): same most-common/smallest-label fixpoint."""
    import random

    import numpy as np

    from neynar_parquet_importer_spark.graph.lpa import lpa_replay, lpa_replay_np

    for seed in range(5):
        rng = random.Random(100 + seed)
        n = rng.randint(2, 100)
        m = rng.randint(1, 400)
        base = {(rng.randint(0, n), rng.randint(0, n)) for _ in range(m)}
        base = {(a, b) for a, b in base if a != b}
        directed = list(base) + [(b, a) for a, b in base]
        if not directed:
            continue
        want = lpa_replay(directed, n_iter=4)
        src = np.array([e[0] for e in directed])
        dst = np.array([e[1] for e in directed])
        got = lpa_replay_np(src, dst, n_iter=4)
        assert got == want, f"seed {seed}"
