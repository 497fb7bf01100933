"""Triangle counting: known closed-form graphs, exactly-once semantics,
orientation out-degree bound, and per-node credit. Cross-engine parity
is the ``cosupplier_triangle_*`` oracle twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.graph import triangles as tri


def _edges(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return tri.canonical_edges(df, "src", "dst")


def test_k4_has_four_triangles(spark):
    """Complete graph on 4 nodes: C(4,3) = 4 triangles, clustering 1."""
    e = _edges(
        spark, [(a, b) for a in range(4) for b in range(4) if a != b]
    )
    row = tri.triangle_stats(e).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (4, 6, 4)
    assert row.clustering_coeff == 1.0


def test_path_and_star_have_none(spark):
    """A path and a star are triangle-free but wedge-rich — the wedge
    join must close nothing."""
    path = _edges(spark, [(i, i + 1) for i in range(6)])
    star = _edges(spark, [(0, i) for i in range(1, 8)])
    assert tri.triangle_stats(path).collect()[0].n_triangles == 0
    assert tri.triangle_stats(star).collect()[0].n_triangles == 0


def test_each_triangle_exactly_once_with_duplicates_and_loops(spark):
    """Input noise (duplicate edges both directions, self-loops) must
    not change the count; the one triangle appears once, sorted."""
    e = _edges(
        spark,
        [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 1), (3, 4), (4, 3)],
    )
    rows = tri.triangles(e).collect()
    assert [(r.x, r.y, r.z) for r in rows] == [(1, 2, 3)]


def test_node_credit_is_three_per_triangle(spark):
    """Two triangles sharing an edge: shared nodes get credit 2."""
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4)])
    got = {
        r.node: r.n_triangles
        for r in tri.node_triangle_counts(e).collect()
    }
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_orientation_bounds_hub_outdegree(spark):
    """In a star + one closing rim edge, the hub has max degree, so
    every oriented edge points INTO it except ties — the hub's
    out-degree must be 0 and no wedge is ever generated at the hub
    (the skew-bounding property)."""
    e = _edges(spark, [(0, i) for i in range(1, 9)] + [(1, 2)])
    o = tri.oriented_edges(e)
    hub_out = o.filter(F.col("u") == 0).count()
    assert hub_out == 0
    # the one triangle (0,1,2) still found, emitted at a rim node
    assert tri.triangles(e).count() == 1
