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
    symmetric: bool = False,
    materialize_every: int = 2,
    pre_partitioned: bool = False,
) -> DataFrame:
    """(node, mass) after ``n_iter`` damped integer-PageRank steps.

    ``edges`` is a DIRECTED edge list; pass the union of both directions
    for undirected influence (which also guarantees no dangling nodes —
    every node that appears has at least one out-edge). Nodes are
    whatever long ids the caller encoded; isolated nodes (no edges)
    don't participate by construction.

    ``symmetric``: caller's promise that the edge set contains BOTH
    directions of every edge (the union form above), i.e. every node
    appears as a src AND as a dst. Then the node set is exactly
    ``distinct src`` (no union-distinct over both endpoints) and every
    node receives an inflow row, so the per-iteration
    ``nodes LEFT JOIN inflow`` completion is the identity and is
    skipped — the update is computed straight off the inflow aggregate.
    Identical integers by construction; A/B'd row-identical on the
    supplier graph. Leave False for general directed graphs (a node
    with out-edges but no in-edges would otherwise vanish from the
    result instead of holding teleport mass).

    ``materialize_every``: how many iterations to chain per persist +
    count. 1 materializes every step; large values approach one lazy
    plan. Measured (sf0.1 supplier graph, 1.17M directed edges, fresh
    JVMs, min of 2): every-step 8.1 s, every-2 5.9 s, and the round-8
    sf1 A/B showed all-5-chained at 23.9 s vs 10.1 s — chaining PAIRS
    keeps AQE's stats fresh enough (the edge frame is persisted with
    exact sizes either way) while halving the driver-blocking
    materialization jobs; chaining everything starves the planner.

    The out-degree is folded into the persisted edge frame — (src, dst,
    out_deg), +8 bytes/edge in cache — so an iteration is ONE
    broadcast-hash join (the node-sized mass frame onto the edge frame)
    plus one partial-aggregated shuffle of (dst, c): the former
    per-iteration ``mass JOIN deg`` node join is gone and ``mass div
    out_deg`` is evaluated per edge (same floor-division integers, just
    evaluated on the attached column).

    ``pre_partitioned``: caller's promise that ``edges`` is already
    hash-partitioned by the iteration key (``dst`` on the symmetric fast
    path, ``src`` on the general path — e.g. it ended in
    ``.repartition(par, key).dropDuplicates()``, the dedup then shares
    that exchange by the subset rule); pagerank then skips its own
    repartition instead of paying a second full exchange of the edge
    list.

    Symmetric fast path (r10): the persisted edge frame is partitioned
    by ``dst``, so the per-iteration inflow ``groupBy(dst)`` reuses the
    cached partitioning (guide §2.4: operations keyed the same way share
    one exchange) — an iteration is ONE broadcast-hash join of the
    node-sized (node, ctr = mass div out_deg) frame onto the edges plus
    an exchange-FREE aggregate; the degree frame (groupBy(dst) — the
    in-degree, which IS the out-degree on a symmetric edge set, again
    no exchange) broadcasts back onto the inflow to thread out_deg into
    the next round. ZERO per-iteration shuffles. The node frame must fit
    a broadcast (same regime the general path's mass join already
    relies on below the autoBroadcast threshold); for graphs whose node
    set cannot broadcast, use symmetric=False — the general path keeps
    the src-co-partitioned shuffle-join shape."""
    e0 = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    par = e0.sparkSession.sparkContext.defaultParallelism
    if symmetric:
        return _pagerank_symmetric(
            e0, n_iter, par, materialize_every, pre_partitioned
        )
    if not pre_partitioned:
        e0 = e0.repartition(par, "src")
    # deg shares e0's exchange (groupBy on the partition key); the fold
    # join is co-partitioned — no extra shuffle of the edge list, and
    # deg itself is consumed exactly once so it is not persisted
    deg = e0.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ed = e0.join(deg, "src").persist()
    try:
        ed.count()
        nodes = (
            ed.select(F.col("src").alias("node"))
            .union(ed.select(F.col("dst").alias("node")))
            .distinct()
            .persist()
        )
        n = nodes.count()
        if n == 0:
            return nodes.withColumn("mass", F.lit(0).cast("long"))
        base = SCALE // n
        teleport = (DAMP_DEN - DAMP_NUM) * SCALE // (DAMP_DEN * n)
        mass = nodes.withColumn("mass", F.lit(base).cast("long")).persist()

        def step(m: DataFrame) -> DataFrame:
            contrib = ed.join(
                m.withColumnRenamed("node", "src"), "src"
            ).select(
                F.col("dst").alias("node"),
                F.expr("mass div out_deg").alias("c"),
            )
            inflow = contrib.groupBy("node").agg(
                F.sum("c").alias("inflow")
            )
            upd = (
                F.lit(teleport)
                + F.expr(
                    f"({DAMP_NUM} * coalesce(inflow, 0L))"
                    f" div {DAMP_DEN}"
                )
            ).cast("long")
            # general graphs: complete to the full node set (a node
            # with no in-edges holds teleport mass)
            return nodes.join(inflow, "node", "left").select(
                "node", upd.alias("mass")
            )

        done = 0
        while done < n_iter:
            k = min(max(1, materialize_every), n_iter - done)
            prev = mass
            for _ in range(k):
                mass = step(mass)
            # no per-iteration repartition: AQE coalescing already
            # bounds the node-sized frame's partitions under any conf
            mass = mass.persist()
            # materialize before releasing the previous step so the new
            # frame never recomputes through an unpersisted parent
            mass.count()
            prev.unpersist()
            done += k
        return mass
    finally:
        ed.unpersist()
        try:
            nodes.unpersist()
        except NameError:
            pass


def _pagerank_symmetric(
    e0: DataFrame,
    n_iter: int,
    par: int,
    materialize_every: int,
    pre_partitioned: bool,
) -> DataFrame:
    """Symmetric-edge fast path: dst-partitioned persisted edges, zero
    per-iteration exchanges (module/pagerank docstrings). The broadcast
    node frame carries ``ctr = mass div out_deg`` precomputed per node,
    so the edge-side projection is a plain column read; the inflow
    aggregate and the deg re-attach both reuse the cached hash(dst)
    partitioning. Integer arithmetic identical to the general path
    (same formulas, different plan shape)."""
    if not pre_partitioned:
        e0 = e0.repartition(par, "dst")
    ed = e0.persist()
    # in-degree == out-degree on a symmetric edge set, and groupBy(dst)
    # reuses the cached partitioning — deg costs no exchange
    deg = (
        ed.groupBy(F.col("dst").alias("node"))
        .agg(F.count(F.lit(1)).alias("out_deg"))
        .persist()
    )
    try:
        # one blocking job: materializes ed AND deg caches, returns n
        # (the former separate ed.count() + nodes.count() pair)
        n = deg.count()
        if n == 0:
            return deg.select("node", F.lit(0).cast("long").alias("mass"))
        base = SCALE // n
        teleport = (DAMP_DEN - DAMP_NUM) * SCALE // (DAMP_DEN * n)
        mass = deg.select(
            "node",
            F.lit(base).cast("long").alias("mass"),
            F.expr(f"CAST({base} AS BIGINT) div out_deg").alias("ctr"),
        )

        def step(m: DataFrame) -> DataFrame:
            inflow = (
                ed.join(
                    F.broadcast(m.select(F.col("node").alias("src"), "ctr")),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("ctr").alias("inflow"))
            )
            upd = (
                F.lit(teleport)
                + F.expr(f"({DAMP_NUM} * inflow) div {DAMP_DEN}")
            ).cast("long")
            return (
                inflow.join(F.broadcast(deg), "node")
                .select("node", upd.alias("mass"), "out_deg")
                .select(
                    "node",
                    "mass",
                    F.expr("mass div out_deg").alias("ctr"),
                )
            )

        prev = None
        done = 0
        while done < n_iter:
            k = min(max(1, materialize_every), n_iter - done)
            for _ in range(k):
                mass = step(mass)
            mass = mass.persist()
            # materialize before releasing the previous step so the new
            # frame never recomputes through an unpersisted parent
            mass.count()
            if prev is not None:
                prev.unpersist()
            prev = mass
            done += k
        return mass.select("node", "mass")
    finally:
        ed.unpersist()
        deg.unpersist()


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


def pagerank_replay_np(src, dst, n_iter: int = 5) -> dict[int, int]:
    """Vectorized twin of :func:`pagerank_replay` — identical integer
    recursion on int64 numpy arrays (floor division and sums of
    non-negative int64 are exact and overflow-free per the module
    overflow audit), so results are bit-equal to the dict replay
    (property-tested in tests/test_pagerank.py). Exists because the
    dict replay is the slow side of the sf1 oracle build (round-7
    verdict #2): ~50M dict ops at sf1 vs a few vector passes here."""
    import numpy as np

    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    nodes, codes = np.unique(np.concatenate([src, dst]), return_inverse=True)
    n = int(len(nodes))
    if n == 0:
        return {}
    s, d = codes[: len(src)], codes[len(src):]
    out_deg = np.bincount(s, minlength=n).astype(np.int64)
    base = SCALE // n
    teleport = (DAMP_DEN - DAMP_NUM) * SCALE // (DAMP_DEN * n)
    mass = np.full(n, base, dtype=np.int64)
    # sort edges by dst once so each iteration's inflow gather is a
    # contiguous segmented sum (add.reduceat), not a scatter
    order = np.argsort(d, kind="stable")
    s_o, d_o = s[order], d[order]
    starts = np.flatnonzero(np.r_[True, d_o[1:] != d_o[:-1]])
    dst_ids = d_o[starts]
    for _ in range(n_iter):
        contrib = mass[s_o] // out_deg[s_o]
        inflow = np.zeros(n, dtype=np.int64)
        if len(s_o):
            inflow[dst_ids] = np.add.reduceat(contrib, starts)
        mass = teleport + (DAMP_NUM * inflow) // DAMP_DEN
    return {int(nodes[i]): int(mass[i]) for i in range(n)}
