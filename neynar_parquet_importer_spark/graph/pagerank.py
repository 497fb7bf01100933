"""Distributed PageRank with exact integer mass — replayable iteration.

The canonical iterative graph algorithm on the canonical Spark join
shape: per iteration, one equi-join of the rank frame with the edge
list on ``src`` (each node's mass splits over its out-edges) and one
``groupBy(dst).sum`` (map-side partial combine) to gather inflow.
Float PageRank is NOT value-checkable across engines — inflow sums
accumulate in whatever order the shuffle delivers — so ranks here are
exact int64 "mass" in units of 1e-12 (decimal fixed point):

- initial mass     = ``SCALE // n`` per node,
- edge contribution = ``mass div out_degree``   (floor division),
- damped update    = ``T + (85 * inflow) div 100`` with the teleport
  term ``T = (15 * SCALE) // (100 * n)`` computed once driver-side.

Every operation is integer arithmetic, so the result is invariant to
partitioning and summation order, and the oracle generator replays the
identical recursion single-process over the same edge set (python
ints) — like the fixed-point k-means, an INDEPENDENT recomputation of
the whole iteration, not a shared artifact.  Floor-division mass
leakage (< 1 unit per edge per iteration, i.e. < 1e-12 of total per
edge) is deliberate and identical on both paths.

Overflow audit: total mass <= SCALE = 1e12, so ``85 * inflow`` <=
8.5e13 << 2^63; degrees and counts are corpus-bounded longs.

At 100 TB the per-iteration frames are (node, mass) — tiny next to the
edge list — and the edge list is persisted once and reused by all
iterations; co-partitioning edges by ``src`` (bucketing) makes the
mass-split join shuffle-free, leaving one shuffle (the inflow gather)
per iteration.

Beyond-reference operator: the reference materializes follow EDGES and
COUNTS (src/fetch_data.py transforms); ranking over the graph is the
natural Spark-side extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    src: str = "src",
    dst: str = "dst",
    eager_every: int = 10,
) -> DataFrame:
    """(node, mass) after ``n_iter`` damped integer-PageRank steps.

    ``edges`` is a DIRECTED edge list; pass the union of both directions
    for undirected influence (which also guarantees no dangling nodes —
    every node that appears has at least one out-edge). Nodes are
    whatever long ids the caller encoded; isolated nodes (no edges)
    don't participate by construction.

    Execution shape: the whole recursion is ONE LAZY PLAN. A previous
    version persisted + counted the rank frame every iteration — five
    driver-blocking jobs whose cost is pure scheduling overhead at any
    scale (the rank frame is node-sized, tiny next to the edge list).
    Chained lazily, the identical per-iteration subplans dedup at the
    physical layer: the edge repartition, the out-degree aggregate, and
    the node set each materialize ONCE as a ReusedExchange no matter
    how many iterations reference them (plan-pinned in
    tests/test_plans.py), and the per-iteration inflow gather is the
    only recurring shuffle. AQE picks broadcast for the rank-frame join
    when it is small and keeps it a shuffle join when it is not.
    ``eager_every`` bounds plan DEPTH for deep iteration counts: every
    that-many iterations the rank frame is pinned with an eager
    localCheckpoint (executor-side, the dedup._ckpt discipline), so a
    500-iteration run never hands Catalyst a 500-shuffle plan. Exact
    integer arithmetic makes all of this safe: the result is invariant
    to partitioning, scheduling, and recompute."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    par = e.sparkSession.sparkContext.defaultParallelism
    e = e.repartition(par, "src")
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # the one unavoidable driver scalar: n fixes the teleport constants
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("mass", F.lit(0).cast("long"))
    base = SCALE // n
    teleport = (DAMP_DEN - DAMP_NUM) * SCALE // (DAMP_DEN * n)
    mass = nodes.withColumn("mass", F.lit(base).cast("long"))
    for i in range(n_iter):
        contrib = (
            e.join(mass.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("mass div out_deg").alias("c"),
            )
        )
        inflow = contrib.groupBy("node").agg(F.sum("c").alias("inflow"))
        mass = nodes.join(inflow, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.expr(
                    f"({DAMP_NUM} * coalesce(inflow, 0L))"
                    f" div {DAMP_DEN}"
                )
            ).cast("long").alias("mass"),
        )
        if eager_every and (i + 1) % eager_every == 0 and (i + 1) < n_iter:
            mass = mass.localCheckpoint(eager=True)
    return mass


def pagerank_replay(edge_pairs, n_iter: int = 5) -> dict[int, int]:
    """Single-process integer replay over (src, dst) pairs — THE shared
    recursion the oracle generator uses to independently recompute the
    distributed result (python ints; must stay formula-identical to
    :func:`pagerank`)."""
    from collections import defaultdict

    out_deg: dict[int, int] = defaultdict(int)
    nodes: set[int] = set()
    for s, d in edge_pairs:
        out_deg[s] += 1
        nodes.add(s)
        nodes.add(d)
    n = len(nodes)
    if n == 0:
        return {}
    base = SCALE // n
    teleport = (DAMP_DEN - DAMP_NUM) * SCALE // (DAMP_DEN * n)
    mass = {v: base for v in nodes}
    for _ in range(n_iter):
        inflow: dict[int, int] = defaultdict(int)
        for s, d in edge_pairs:
            inflow[d] += mass[s] // out_deg[s]
        mass = {
            v: teleport + (DAMP_NUM * inflow.get(v, 0)) // DAMP_DEN
            for v in nodes
        }
    return mass
