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
    local_below: int = 200_000,
    assume_canonical: bool = False,
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
    only shuffle. On a billion-node graph pass False and the semi-joins
    shuffle on the node key instead (same knob discipline as
    ``triangles.oriented_edges``).

    ``local_below`` — the bounded LOCAL TAIL-FINISH: once the surviving
    edge list fits under this cap it is collected and peeled to the
    fixpoint in one pass of Matula–Beck bucket peeling. The driver
    budget is PYTHON-OBJECT cost, not raw longs: collected Rows + the
    adjacency sets measure ~0.5 KB per edge (review-measured ~1 GB peak
    at 2M edges), so the 200k default costs ~100 MB — safe on a
    default-sized driver; raise it only alongside driver memory
    (O(E), min-degree-first). Peeling round count equals the longest
    peel CHAIN, which is independent of graph size — a gentle tail
    peels a handful of nodes per round for dozens of rounds, and every
    distributed round costs a full job + shuffle no matter how few
    edges remain (measured: 17 rounds x ~0.9 s fixed overhead on a
    35k-edge co-supplier graph; the tail-finish collapses it to one
    collect). At 100 TB the distributed rounds do the volume work and
    the sub-cap tail finishes locally — the same bounded-dispatch
    discipline as the ANN family's ``exact_below``. Pass ``0`` to force
    every round distributed (tests pin both paths equal).

    Algorithm-independence note: the local finisher is deliberately a
    DIFFERENT algorithm (sequential min-degree bucket peel) from
    :func:`kcore_replay` (simultaneous-rounds replay, the ORACLE's
    generator) — the k-core fixpoint is unique regardless of peel
    order, so the cross-check between engine and oracle stays a
    differential test even when the engine finishes locally."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # Dedup up front: the local bucket peel builds SET adjacency while
    # the distributed degree aggregate counts rows — on a non-canonical
    # input with duplicate (a, b) rows the two fixpoints (and output
    # multiplicities) would diverge, and which path runs would depend on
    # local_below. One distinct here makes both paths compute the same
    # simple-graph core on any input. ``assume_canonical=True`` skips
    # BOTH the distinct and the round-0 checkpoint copy for callers
    # whose edges are already the canonical distinct form (e.g.
    # triangles.canonical_edges output) — the distinct was a full
    # extra exchange + aggregate over the edge list plus one
    # materialized copy, per run (r10). PRECONDITION: the caller should
    # also have PERSISTED (or checkpointed) the frame — round 1
    # references it three times (two degree legs + the semi-join left
    # side) and the sub-cap path collects it, so an unpersisted
    # upstream plan would re-execute per reference. Round STATES still
    # checkpoint inside the loop; round 0 reads the caller's frame
    # (cur_is_ckpt guards the release calls, which must only touch
    # frames this function checkpointed).
    cur_is_ckpt = not assume_canonical
    cur = (
        edges.select("a", "b")
        if assume_canonical
        else _ckpt(edges.select("a", "b").distinct())
    )
    n = cur.count()
    for _ in range(max_iter):
        if local_below and n <= local_below:
            pdf = cur.toPandas()  # Arrow columns, not Row objects
            core = _local_kcore_bucket(
                list(zip(pdf["a"].tolist(), pdf["b"].tolist())), k
            )
            import pandas as pd

            out = edges.sparkSession.createDataFrame(
                pd.DataFrame(sorted(core), columns=["a", "b"]),
                schema=cur.schema,
            )
            if cur_is_ckpt:
                _release_ckpt(cur)
            return out
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
        if cur_is_ckpt:
            _release_ckpt(cur)
        cur, n, cur_is_ckpt = nxt, m, True
        if n == 0:
            return cur
    # release the live round before raising: every other exit path
    # frees its checkpoint, and a caller retrying after the guard fires
    # must not accumulate one materialized edge copy per attempt
    if cur_is_ckpt:
        _release_ckpt(cur)
    raise RuntimeError(
        f"k-core peeling did not converge within {max_iter} rounds"
    )


def kcore_stats(
    edges: DataFrame, k: int, assume_canonical: bool = False
) -> DataFrame:
    """One row: k, surviving node/edge counts, and an id-sum checksum of
    the core's node set (exact integers throughout — a single wrongly
    peeled node moves the checksum)."""
    core = kcore_edges(edges, k, assume_canonical=assume_canonical)
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


def _local_kcore_bucket(
    edge_pairs: list[tuple[int, int]], k: int
) -> set[tuple[int, int]]:
    """Matula–Beck-style bucket peel: maintain live adjacency, remove
    under-degree nodes one at a time from a worklist, cascading. O(E)
    total, SEQUENTIAL min-work order — a different peel order (and a
    different implementation shape) than :func:`kcore_replay`'s
    simultaneous rounds; the unique-fixpoint property is what makes the
    two comparable, and tests pin them equal."""
    from collections import defaultdict

    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in edge_pairs:
        adj[a].add(b)
        adj[b].add(a)
    dead: set[int] = set()
    work = [n for n, nb in adj.items() if len(nb) < k]
    while work:
        n = work.pop()
        if n in dead:
            continue
        dead.add(n)
        for m in adj[n]:
            live = adj[m]
            live.discard(n)
            if m not in dead and len(live) < k:
                work.append(m)
        adj[n] = set()
    return {
        (a, b) for a, b in edge_pairs if a not in dead and b not in dead
    }


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


def kcore_replay_np(a, b, k: int) -> set[tuple[int, int]]:
    """Vectorized twin of :func:`kcore_replay` over UNIQUE canonical
    (a, b) pairs (the oracle fetch is SELECT DISTINCT; the dict replay
    sets-dedups internally). Each peel round is two bincounts and a
    mask instead of dict loops; the fixpoint is unique so the surviving
    edge set is identical (property-tested). Exists for the sf1 oracle
    build (round-7 verdict #2).

    Duplicate pairs are deduped internally (the dict replay's ``set()``
    does the same implicitly) — without this, a caller that skipped the
    SELECT DISTINCT would silently double-count degrees and land on a
    different fixpoint (round-8 advisor finding)."""
    import numpy as np

    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    a, b = pairs[:, 0], pairs[:, 1]
    nodes, codes = np.unique(np.concatenate([a, b]), return_inverse=True)
    n = int(len(nodes))
    ai, bi = codes[: len(a)], codes[len(a):]
    alive = np.ones(len(a), dtype=bool)
    while True:
        deg = np.bincount(ai[alive], minlength=n) + np.bincount(
            bi[alive], minlength=n
        )
        keep = alive & (deg[ai] >= k) & (deg[bi] >= k)
        if bool((keep == alive).all()):
            return {
                (int(a[i]), int(b[i])) for i in np.flatnonzero(alive)
            }
        alive = keep
