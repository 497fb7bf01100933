"""k-core: closed-form graphs, peel-chain behavior, replay equivalence,
empty-core edge case, and non-convergence guard. Cross-engine parity is
the ``kcore_supplier_stats`` replay oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.graph import kcore as kcr
from neynar_parquet_importer_spark.graph.triangles import canonical_edges


def _edges(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return canonical_edges(df, "src", "dst")


def _core_set(df):
    return {(r.a, r.b) for r in df.collect()}


def test_clique_survives_tail_peels(spark):
    """K5 with a pendant path hanging off it: the 3-core is exactly the
    clique — the path peels away over multiple rounds (chain peeling,
    not a single pass)."""
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    tail = [(4, 10), (10, 11), (11, 12)]
    core = kcr.kcore_edges(_edges(spark, k5 + tail), k=3)
    assert _core_set(core) == set(k5)


def test_spark_matches_replay(spark):
    """BOTH engine paths — the default local tail-finish (bucket peel)
    and the forced-distributed rounds (local_below=0) — must equal the
    simultaneous-rounds python replay on a mixed graph, several k. Three
    peel orders, one unique fixpoint."""
    und = [(i, (i + 1) % 12) for i in range(12)]
    und += [(i, (i + 3) % 12) for i in range(12)]
    und += [(a, b) for a in range(20, 26) for b in range(a + 1, 26)]
    und += [(5, 21), (6, 22)]
    pairs = sorted({(min(a, b), max(a, b)) for a, b in und})
    for k in (2, 3, 4, 5):
        want = kcr.kcore_replay(set(pairs), k=k)
        got_local = _core_set(kcr.kcore_edges(_edges(spark, pairs), k=k))
        got_dist = _core_set(
            kcr.kcore_edges(_edges(spark, pairs), k=k, local_below=0)
        )
        assert got_local == want, k
        assert got_dist == want, k


def test_bucket_peel_matches_replay_randomized():
    """Pure-python differential check of the two local algorithms over
    random graphs — the independence claim behind the tail-finish."""
    import random

    rng = random.Random(99)
    for trial in range(25):
        n = rng.randint(4, 40)
        m = rng.randint(n, 4 * n)
        pairs = set()
        while len(pairs) < m:
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        for k in (2, 3, 4):
            assert kcr._local_kcore_bucket(sorted(pairs), k) == kcr.kcore_replay(
                pairs, k
            ), (trial, k)


def test_empty_core_is_empty_not_error(spark):
    path = [(i, i + 1) for i in range(6)]
    core = kcr.kcore_edges(_edges(spark, path), k=3)
    assert core.count() == 0
    stats = kcr.kcore_stats(_edges(spark, path), k=3).collect()[0]
    assert (stats.n_core_nodes, stats.n_core_edges, stats.node_checksum) == (
        0,
        0,
        0,
    )


def test_stats_checksum_and_counts(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    row = kcr.kcore_stats(_edges(spark, k4 + [(3, 9)]), k=3).collect()[0]
    assert (row.k, row.n_core_nodes, row.n_core_edges) == (3, 4, 6)
    assert row.node_checksum == 0 + 1 + 2 + 3


def test_nonconvergence_raises_not_silent(spark):
    """max_iter=1 on the pendant-path graph (needs several rounds) must
    raise on the forced-distributed path, never return a non-fixpoint;
    the default local tail-finish resolves the same graph in one round
    regardless of max_iter (it peels to the fixpoint locally)."""
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    tail = [(4, 10), (10, 11), (11, 12)]
    with pytest.raises(RuntimeError):
        kcr.kcore_edges(
            _edges(spark, k5 + tail), k=3, max_iter=1, local_below=0
        )
    assert _core_set(
        kcr.kcore_edges(_edges(spark, k5 + tail), k=3, max_iter=1)
    ) == set(k5)
    with pytest.raises(ValueError):
        kcr.kcore_edges(_edges(spark, k5), k=0)


def test_kcore_duplicate_edge_rows_match_canonical(spark):
    """Non-canonical input with duplicate (a, b) rows: both the
    distributed peel and the local tail-finish must compute the
    simple-graph core (duplicates must not inflate degrees), and the
    two paths must agree with each other."""
    # triangle 1-2-3 plus a pendant 3-4 duplicated 3x: with duplicate
    # counting, node 4 would fake degree 3 and survive k=2
    base = [(1, 2), (1, 3), (2, 3), (3, 4)]
    rows = base + [(3, 4), (3, 4)]
    edges = spark.createDataFrame(rows, "a long, b long")
    expect = {(1, 2), (1, 3), (2, 3)}
    got_local = {
        (r.a, r.b) for r in kcr.kcore_edges(edges, 2, local_below=10**6).collect()
    }
    got_dist = {
        (r.a, r.b) for r in kcr.kcore_edges(edges, 2, local_below=0).collect()
    }
    assert got_local == expect
    assert got_dist == expect
    assert kcr.kcore_replay(set(rows), 2) == expect


def test_replay_np_bitequal_to_dict_replay():
    """Vectorized sf1 peel vs the dict spec: identical surviving edge
    set (the fixpoint is unique) across random graphs and k values."""
    import random

    import numpy as np

    from neynar_parquet_importer_spark.graph.kcore import (
        kcore_replay,
        kcore_replay_np,
    )

    for seed in range(5):
        rng = random.Random(200 + seed)
        n = rng.randint(3, 80)
        m = rng.randint(1, 300)
        pairs = {(rng.randint(0, n), rng.randint(0, n)) for _ in range(m)}
        pairs = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
        if not pairs:
            continue
        k = rng.randint(1, 5)
        want = kcore_replay(pairs, k=k)
        a = np.array([e[0] for e in pairs])
        b = np.array([e[1] for e in pairs])
        got = kcore_replay_np(a, b, k=k)
        assert got == want, f"seed {seed} k {k}"


def test_replay_np_dedups_duplicate_pairs():
    """Duplicate (a, b) rows must not inflate degrees (round-8 advisor):
    the dict replay set-dedups implicitly, so the np twin must match it
    even when the caller skipped SELECT DISTINCT. The triangle below is
    a 2-core only if each edge counts once — feeding one edge twice
    would keep a dangling node alive at k=2."""
    import numpy as np

    from neynar_parquet_importer_spark.graph.kcore import (
        kcore_replay,
        kcore_replay_np,
    )

    # triangle 1-2-3 plus a pendant edge (3,4); (3,4) duplicated 3x
    # would fake deg[4] = 3 >= 2 and keep it in the 2-core
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (3, 4), (3, 4)]
    a = np.array([p[0] for p in pairs])
    b = np.array([p[1] for p in pairs])
    want = kcore_replay(set(pairs), k=2)
    got = kcore_replay_np(a, b, k=2)
    assert got == want == {(1, 2), (1, 3), (2, 3)}
