"""k-core extraction — iterative degree peeling to a fixpoint.

The k-core (maximal subgraph where every node has degree >= k) is the
classic density filter: spam/bot rings and tightly-knit communities
survive aggressive cores while the long tail peels away, and coreness
is the standard cheap proxy for "how embedded is this node" (used for
influence seeding and as a sampling stratum). Completes the graph
suite: PageRank (influence), triangles (local density), LPA
(communities), k-core (global density backbone).

Peeling is inherently iterative but — unlike classic LPA — it has a
DETERMINISTIC fixpoint independent of peel order (removing a node never
raises another's degree, so the surviving set is unique). The rounds
below peel ALL under-degree nodes simultaneously:

- per round: one degree aggregate over the surviving edge list + two
  semi-joins to keep edges whose BOTH endpoints survive;
- convergence is a driver-side count compare (an exact integer — safe
  to branch on, the float-free discipline of the other graph modules);
- rounds <= longest peel chain (worst case O(n), in practice a handful)
  with ``max_iter`` as a hard stop that RAISES rather than silently
  returning a non-fixpoint.

Edge frames persist per round through the shared ``release_cached()``
registry (signature-frame discipline) and each round's count
materializes the new frame before the previous unpersists — at cluster
scale each round is one bounded shuffle over a monotonically shrinking
edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import _ckpt, _release_ckpt


def kcore_edges(
    edges: DataFrame,
    k: int,
    max_iter: int = 50,
    broadcast_keep: bool = True,
) -> DataFrame:
    """Canonical (a, b) edges of the k-core of a canonical undirected
    edge list. Returns an empty frame when no k-core exists.

    Each round's state is an EAGER localCheckpoint, not a mere persist:
    the next round references the current edge set three times (two
    degree legs + the semi-join left side), so an un-truncated plan
    grows geometrically and a deep peel chain OOMs the driver on plan
    ANALYSIS alone (the connected-components lesson, ``dedup._ckpt``).
    Like the CC result, the returned frame's lineage is truncated —
    consume it before ``release_cached()``.

    ``broadcast_keep``: the surviving-node set is node-sized; while it
    fits an executor (the default), broadcasting it turns BOTH per-round
    semi-joins map-side, leaving the degree aggregate as the round's
    only shuffle — measured 18 s -> ~7 s on a deep peel at sf0.1. On a
    billion-node graph pass False and the semi-joins shuffle on the
    node key instead (same knob discipline as
    ``triangles.oriented_edges``)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cur = _ckpt(edges.select("a", "b"))
    n = cur.count()
    for _ in range(max_iter):
        deg = (
            cur.select(F.col("a").alias("node"))
            .unionAll(cur.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        if broadcast_keep:
            keep = F.broadcast(keep)
        nxt = _ckpt(
            cur.join(
                keep.select(F.col("node").alias("a")), "a", "left_semi"
            ).join(
                keep.select(F.col("node").alias("b")), "b", "left_semi"
            ).select("a", "b")
        )
        m = nxt.count()
        if m == n:
            _release_ckpt(nxt)
            return cur
        _release_ckpt(cur)
        cur, n = nxt, m
        if n == 0:
            return cur
    raise RuntimeError(
        f"k-core peeling did not converge within {max_iter} rounds"
    )


def kcore_stats(edges: DataFrame, k: int) -> DataFrame:
    """One row: k, surviving node/edge counts, and an id-sum checksum of
    the core's node set (exact integers throughout — a single wrongly
    peeled node moves the checksum)."""
    core = kcore_edges(edges, k)
    nodes = (
        core.select(F.col("a").alias("node"))
        .unionAll(core.select(F.col("b").alias("node")))
        .distinct()
    )
    return (
        nodes.agg(
            F.count(F.lit(1)).alias("n_core_nodes"),
            F.coalesce(F.sum("node"), F.lit(0)).alias("node_checksum"),
        )
        .crossJoin(core.agg(F.count(F.lit(1)).alias("n_core_edges")))
        .select(
            F.lit(k).alias("k"),
            "n_core_nodes",
            "n_core_edges",
            "node_checksum",
        )
    )


def kcore_replay(edge_pairs, k: int) -> set[tuple[int, int]]:
    """Single-process replay over canonical (a, b) pairs — the oracle
    generator's independent recomputation (unique fixpoint, so any
    correct peel order must land on the same set)."""
    from collections import defaultdict

    cur = set(edge_pairs)
    while True:
        deg: dict[int, int] = defaultdict(int)
        for a, b in cur:
            deg[a] += 1
            deg[b] += 1
        nxt = {
            (a, b) for a, b in cur if deg[a] >= k and deg[b] >= k
        }
        if nxt == cur:
            return cur
        cur = nxt
