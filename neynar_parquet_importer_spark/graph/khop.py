"""k-hop reachability — multi-source BFS over an undirected edge list.

The graph suite so far scores nodes (PageRank), measures density
(triangles, k-core), and labels communities (LPA); the remaining
everyday primitive is NEIGHBORHOOD EXPANSION: "every node within k
hops of these seeds, with its hop distance". It powers ego-network
features, contamination-radius audits (how far does a bad account's
influence reach), and frontier-bounded graph sampling.

BFS from multiple roots is level-synchronous and embarrassingly
declarative: each round joins the current frontier to the edge list,
anti-joins the already-visited set (per ROOT — visited state is keyed
(root, node)), and unions the survivors in. Exactly k rounds, no
convergence test needed; min-distance semantics fall out for free
because a node reached in round d is in the visited set before round
d+1 can reach it again.

Scale notes:

- per round: one shuffle joining frontier to edges on the node key +
  one anti-join on (root, node). Frontier size is bounded by
  |roots| * nodes; the visited set grows monotonically to the same
  bound — state is O(answer), never O(paths) (the recursive-CTE
  formulation enumerates paths; this one doesn't);
- per-round EAGER localCheckpoints (``dedup._ckpt``) truncate lineage —
  the k-core/CC discipline: visited is referenced by both the
  anti-join and the union every round, so an untruncated plan doubles
  per hop;
- like every iterative module here the returned frame has truncated
  lineage: consume it before ``release_cached()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import _ckpt, _release_ckpt


def undirect(edges: DataFrame) -> DataFrame:
    """(src, dst) in both directions from canonical (a, b) edges."""
    return edges.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(
        edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


def khop_reach(edges: DataFrame, seeds: DataFrame, k: int) -> DataFrame:
    """(root, node, dist) for every node within ``k`` hops of each seed,
    ``dist`` = minimum hop count (0 for the seed itself).

    ``edges`` is a canonical undirected (a, b) list; ``seeds`` is a
    one-column ``root`` frame (its rows need not appear in the edge
    list — an isolated seed yields just its own dist-0 row).
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    # persist: every one of the k rounds joins the frontier against the
    # doubled edge list — unpinned, the full upstream edge plan (often
    # the most expensive subtree, e.g. a lineitem self-join) recomputes
    # k times (the pagerank/lpa/triangles suite discipline); drained by
    # release_cached()
    from ..operators.dedup import _persist

    und = _persist(undirect(edges))
    visited = _ckpt(
        seeds.select(
            F.col("root"),
            F.col("root").alias("node"),
            F.lit(0).cast("int").alias("dist"),
        ).distinct()
    )
    frontier = visited
    for d in range(1, k + 1):
        nxt = (
            frontier.join(und, frontier.node == und.src)
            .select("root", F.col("dst").alias("node"))
            .distinct()
            .join(visited, ["root", "node"], "left_anti")
            .select("root", "node", F.lit(d).cast("int").alias("dist"))
        )
        # _ckpt is EAGER (localCheckpoint(eager=True)) — the union is
        # fully materialized by the checkpoint itself, so it is safe to
        # drop the frame it read without any extra count job
        new_visited = _ckpt(visited.unionAll(nxt))
        _release_ckpt(visited)
        visited = new_visited
        # the new frontier is exactly this round's additions
        frontier = visited.filter(F.col("dist") == d)
    return visited


def khop_summary(reach: DataFrame) -> DataFrame:
    """(root, dist, n_nodes, node_checksum): ring sizes per seed with an
    id-sum checksum — exact integers, so one misplaced node moves the
    hash (the graph-suite oracle discipline)."""
    return (
        reach.groupBy("root", "dist")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("node").alias("node_checksum"),
        )
        .orderBy("root", "dist")
    )


def khop_replay(
    edge_pairs, seed_ids, k: int
) -> dict[tuple[int, int], int]:
    """Single-process BFS replay: {(root, node): dist} — the oracle
    generator's independent recomputation."""
    from collections import defaultdict, deque

    adj: dict[int, list[int]] = defaultdict(list)
    for a, b in edge_pairs:
        adj[a].append(b)
        adj[b].append(a)
    out: dict[tuple[int, int], int] = {}
    for root in seed_ids:
        dist = {root: 0}
        q = deque([root])
        while q:
            u = q.popleft()
            if dist[u] == k:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for node, d in dist.items():
            out[(root, node)] = d
    return out
