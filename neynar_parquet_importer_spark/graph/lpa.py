"""Synchronous label propagation — deterministic community detection.

Community structure complements the other graph signals (PageRank for
influence, triangles for density): at training-data scale it powers
source clustering, bot-ring grouping, and leakage-safe splits coarser
than near-dup closures.  Classic LPA is notoriously nondeterministic
(random vertex order, random tie-breaks); this implementation removes
every source of randomness so the distributed result is value-checkable
by an independent single-process replay (the fixed-point
PageRank/k-means discipline):

- labels start as the node id (a long);
- SYNCHRONOUS rounds: every node simultaneously adopts the most common
  label among its neighbors, ties broken by the SMALLEST label —
  ``max(struct(cnt, -label))`` makes the whole update one aggregate of
  exact integers, order-invariant under any shuffle;
- a FIXED iteration count (no convergence test): synchronous LPA can
  two-cycle on bipartite-ish structure, so termination-by-stability is
  not guaranteed; a fixed horizon is, and the replay runs the same
  horizon.

Per round: one equi-join of the label frame (node-sized) with the edge
list on ``src`` and one two-level aggregate — the same join shape as
the PageRank mass split, and like it the edge list is persisted once,
partitioned by ``src``, and reused every round (bucketing makes the
join shuffle-free on a real cluster; the per-round shuffle is then only
the label-count gather).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    n_iter: int = 4,
    src: str = "src",
    dst: str = "dst",
    materialize_every: int = 2,
    pre_partitioned: bool = False,
) -> DataFrame:
    """(node, label) after ``n_iter`` synchronous rounds.

    ``edges`` is DIRECTED adjacency: pass both directions of each
    undirected edge (which also makes every node appear as a ``src``,
    so no node is ever without an update).

    ``materialize_every``: rounds chained per persist + count (the
    pagerank discipline — chaining PAIRS halves the driver-blocking
    materializations while each persisted state still gives AQE exact
    sizes; chaining everything starves the planner). The former
    per-round ``.repartition(par, "node")`` of the label frame is gone
    for the same reason it left pagerank: the label frame is node-sized
    and AQE already bounds its partitions — the explicit exchange was a
    full extra stage per round.

    ``pre_partitioned``: caller's promise that ``edges`` is already
    hash-partitioned by ``dst`` — the iteration key (below); pass True
    to skip the build exchange.

    Plan shape (r10, guide §2.4): the persisted edge frame is
    partitioned by ``dst``, so BOTH per-round aggregates reuse the
    cached partitioning — hash(dst) clusters (dst, label) for the
    neighbor-label count and dst for the struct-max — and the label
    frame (node-sized) joins in as an explicit broadcast: a round costs
    ZERO exchanges. The node set is ``distinct dst`` (identical to
    distinct src under the both-directions contract above — each
    undirected edge contributes (u,v) AND (v,u)), which also reuses the
    dst partitioning. The node frame must fit a broadcast — the same
    regime the previous shape's auto-broadcast label join already
    relied on."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    par = e.sparkSession.sparkContext.defaultParallelism
    if not pre_partitioned:
        e = e.repartition(par, "dst")
    e = e.persist()
    try:
        labels = (
            e.select(F.col("dst").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("label"))
            .persist()
        )
        labels.count()

        def step(lab: DataFrame) -> DataFrame:
            nbr = (
                e.join(
                    F.broadcast(lab.withColumnRenamed("node", "src")), "src"
                )
                .groupBy(F.col("dst").alias("node"), "label")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            return (
                nbr.groupBy("node")
                .agg(
                    F.max(
                        F.struct(
                            F.col("cnt"), (-F.col("label")).alias("neg")
                        )
                    ).alias("m")
                )
                .select("node", (-F.col("m.neg")).alias("label"))
            )

        done = 0
        while done < n_iter:
            k = min(max(1, materialize_every), n_iter - done)
            prev = labels
            for _ in range(k):
                labels = step(labels)
            labels = labels.persist()
            labels.count()
            prev.unpersist()
            done += k
        return labels
    finally:
        e.unpersist()


def lpa_replay(edge_pairs, n_iter: int = 4) -> dict[int, int]:
    """Single-process replay over directed (src, dst) pairs — THE shared
    recursion the oracle generator recomputes independently (python
    ints; must stay rule-identical to :func:`label_propagation`)."""
    from collections import defaultdict

    adj: dict[int, list[int]] = defaultdict(list)
    for s, d in edge_pairs:
        adj[s].append(d)
    labels = {v: v for v in adj}
    for _ in range(n_iter):
        new = {}
        for v, nbrs in adj.items():
            cnt: dict[int, int] = defaultdict(int)
            for u in nbrs:
                cnt[labels[u]] += 1
            # most common, smallest label on ties — the struct-max rule
            new[v] = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        labels = new
    return labels


def community_sizes(labels: DataFrame) -> DataFrame:
    """(community, n_members) from a label frame."""
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members")
    )


def lpa_replay_np(src, dst, n_iter: int = 4) -> dict[int, int]:
    """Vectorized twin of :func:`lpa_replay` for SYMMETRIC edge input
    (both directions present — the only shape the oracle builders pass;
    the dict replay would KeyError on anything else). Per iteration:
    one lexsort groups (src, neighbor-label) pairs, a run-length count
    replaces the per-node Counter, and a second lexsort on
    (src asc, count desc, label asc) picks each node's most-common/
    smallest-label winner — the identical struct-max rule. Bit-equal to
    the dict replay (property-tested); exists for the sf1 oracle build
    (round-7 verdict #2)."""
    import numpy as np

    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    nodes, codes = np.unique(np.concatenate([src, dst]), return_inverse=True)
    n = int(len(nodes))
    if n == 0:
        return {}
    s, d = codes[: len(src)], codes[len(src):]
    # the dict replay KeyErrors on a dst-only node; fail as loudly here
    # instead of silently fixpointing over never-updated self-labels
    is_src = np.zeros(n, dtype=bool)
    is_src[s] = True
    if not bool(is_src[d].all()):
        raise ValueError(
            "lpa_replay_np needs symmetric edge input (every dst must "
            "also appear as a src) — pass both directions"
        )
    labels = nodes.copy()  # label VALUES are original node ids
    for _ in range(n_iter):
        lab = labels[d]
        order = np.lexsort((lab, s))
        s_o, l_o = s[order], lab[order]
        new_grp = np.r_[True, (s_o[1:] != s_o[:-1]) | (l_o[1:] != l_o[:-1])]
        starts = np.flatnonzero(new_grp)
        g_src, g_lab = s_o[starts], l_o[starts]
        g_cnt = np.diff(np.r_[starts, len(s_o)])
        pick = np.lexsort((g_lab, -g_cnt, g_src))
        gs = g_src[pick]
        first = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        new_labels = labels.copy()
        new_labels[gs[first]] = g_lab[pick][first]
        labels = new_labels
    return {int(nodes[i]): int(labels[i]) for i in np.flatnonzero(is_src)}
