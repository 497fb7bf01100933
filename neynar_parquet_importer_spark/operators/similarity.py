"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single narrow projection over the
corpus (dot product via ``zip_with``/``aggregate``, JVM-side, no Python)
followed by a top-k. At 100 TB the scan parallelizes perfectly (no
shuffle until the final k-row reduction; Spark's ``orderBy().limit(k)``
plans as TakeOrderedAndProject = per-partition top-k then a k-sized
driver merge, not a global sort).

Scale path: random-hyperplane LSH bucketing — assign each vector to a
bucket by the sign pattern of ``n_planes`` fixed hyperplanes, search only
the query's bucket (optionally with multi-probe). Buckets are a plain
column, so the bucketed corpus can be written out partitioned/bucketed by
it and pruned at scan time.
"""

from __future__ import annotations

import math
from typing import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .parallelism import fan_out
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_scores(
    df: DataFrame,
    query_vec: Sequence[float] | Column,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    score_col: str = "cos_sim",
) -> DataFrame:
    """(id, cosine(vec, query)) for every row. ``query_vec`` may be a
    Python sequence (inlined as a literal array — no driver round trip per
    row) or a Column (e.g. from a broadcast one-row cross join)."""
    if isinstance(query_vec, Column):
        q = query_vec
        qnorm = _norm(q)
    else:
        q = F.array(*[F.lit(float(v)) for v in query_vec])
        qnorm = F.lit(math.sqrt(sum(float(v) * float(v) for v in query_vec)))
    v = F.col(vec_col)
    denom = _norm(v) * qnorm
    score = F.when(denom > 0, _dot(v, q) / denom).otherwise(F.lit(0.0))
    return df.select(F.col(id_col), score.alias(score_col))


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float] | Column,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine. orderBy+limit => TakeOrderedAndProject
    (per-partition heap + driver merge of k rows, no global shuffle)."""
    scores = cosine_scores(df, query_vec, vec_col, id_col)
    return scores.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def hyperplane_bucket(
    vec_col: Column | str,
    planes: Sequence[Sequence[float]],
) -> Column:
    """Sign-pattern bucket id for random-hyperplane LSH: bit i set iff
    dot(vec, plane_i) >= 0. Planes are fixed literals (seeded driver-side)
    so the bucketing is deterministic and usable as a partition column."""
    import json

    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    # one packed literal, not n_planes × dim lit nodes — same reasoning
    # as ivf_assign: keeps Catalyst's expression tree (and codegen time)
    # independent of the plane count
    packed = F.from_json(
        F.lit(json.dumps([[float(x) for x in p] for p in planes])),
        "array<array<double>>",
    )
    idxs = F.sequence(F.lit(0), F.lit(len(planes) - 1))
    bits = F.transform(
        idxs,
        lambda i: F.when(
            _dot(v, F.element_at(packed, i + 1)) >= 0,
            # 2^i as the bit weight (exact in double for i << 53); keeps
            # the 1<<i convention the multiprobe XOR masks rely on
            F.pow(F.lit(2.0), i).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)


def make_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (pure-Python LCG, no numpy
    dependency at the executors; generated once driver-side)."""
    state = seed & 0x7FFFFFFF or 1
    planes: list[list[float]] = []
    for _ in range(n_planes):
        plane = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            plane.append(state / float(1 << 31) * 2.0 - 1.0)
        planes.append(plane)
    return planes


# --------------------------------------------------------------------------
# IVF (inverted-file) index — the FAISS-style coarse-quantizer scale path
# --------------------------------------------------------------------------

def ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    sample_size: int = 2048,
    iters: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Spherical k-means centroids trained driver-side on a deterministic
    sample (first ``sample_size`` rows by id). The coarse quantizer is tiny
    (n_centroids x dim floats) — training it on a bounded sample at the
    driver and shipping centroids as literals is the standard IVF build;
    at 100 TB the sample is still a single small collect and the expensive
    part (assignment) stays fully distributed."""
    rows = df.orderBy(id_col).limit(sample_size).select(vec_col).collect()
    return spherical_kmeans_core(
        [r[0] for r in rows], n_centroids, iters, seed
    )


def spherical_kmeans_core(
    vectors, n_centroids: int = 16, iters: int = 8, seed: int = 42
) -> list[list[float]]:
    """The numpy spherical-k-means shared by the Spark trainer and the
    oracle generators (which replay training on the same sample fetched
    outside Spark — one code path, so the centroid floats are bitwise
    identical)."""
    import numpy as np

    x = np.array(vectors, dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = x / norms
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), min(n_centroids, len(x)), replace=False)].copy()
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return [[float(v) for v in row] for row in cent]


def ivf_assign(
    vec_col: Column | str, centroids: Sequence[Sequence[float]]
) -> Column:
    """Nearest-centroid id (argmax cosine; centroids are unit-norm so the
    dot product suffices). array_max over (dot, idx) structs compares by
    the first field — a pure JVM expression, no UDF. The resulting id is a
    plain column: write the corpus partitioned by it and probes become
    partition pruning at the source.

    The centroid matrix ships as ONE from_json literal instead of
    n_centroids × dim unrolled lit nodes: the unrolled form made Catalyst
    compile a ~1000-node expression per query (~4 s of plan/codegen time
    at 16×64, re-paid whenever centroids change); the packed form parses
    once per task and evaluates the same dots via higher-order functions.
    """
    import json

    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    packed = F.from_json(
        F.lit(json.dumps([[float(x) for x in c] for c in centroids])),
        "array<array<double>>",
    )
    idxs = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    structs = F.transform(
        idxs,
        lambda i: F.struct(
            _dot(v, F.element_at(packed, i + 1)).alias("d"), i.alias("i")
        ),
    )
    return F.array_max(structs)["i"]


def ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    centroids: Sequence[Sequence[float]] | None = None,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k via IVF: probe only the ``nprobe`` centroids
    nearest the query, brute-force within the probed cells.

    Probing is *adaptive* (nearest centroids to this query), which beats
    data-oblivious LSH buckets when the corpus has cluster structure —
    the actual regime of embedding near-dup retrieval. On unstructured
    (near-uniform) corpora no sublinear index helps: recall tracks the
    scanned fraction (tests/test_operators.py measures both regimes).
    Pass precomputed ``centroids`` to amortize training across queries."""
    import math as _math

    if centroids is None:
        centroids = ivf_centroids(
            df, n_centroids=n_centroids, vec_col=vec_col, id_col=id_col
        )
    qn = _math.sqrt(sum(float(v) ** 2 for v in query_vec)) or 1.0
    scored = sorted(
        (
            sum(float(a) * float(b) for a, b in zip(query_vec, c)) / qn,
            i,
        )
        for i, c in enumerate(centroids)
    )
    probe = [i for _, i in scored[-nprobe:]]
    pruned = df.filter(ivf_assign(vec_col, centroids).isin(probe))
    return brute_force_topk(pruned, query_vec, k, vec_col, id_col)


def _hamming_ball_masks(n_planes: int, radius: int) -> list[int]:
    """All XOR masks over ``n_planes`` bits with popcount <= radius."""
    return [m for m in range(1 << n_planes) if bin(m).count("1") <= radius]


def _multitable_bucket_udf(planes_all, n_planes: int, n_tables: int):
    """All n_tables*n_planes plane dots as ONE numpy matrix product
    (Arrow-batched). A literal-weight JVM expression this wide (2k+
    multiply-adds) overflows whole-stage codegen's 64 KB method limit and
    falls back to interpreted mode — the vectorized UDF is the faster
    AND scale-correct shape here."""
    import numpy as np

    w = np.array(planes_all, dtype=np.float64)  # (tables*planes, dim)
    bits = 1 << np.arange(n_planes, dtype=np.int64)

    @pandas_udf(T.ArrayType(T.LongType()))
    def buckets(v: pd.Series) -> pd.Series:
        x = np.vstack(v.to_numpy()).astype(np.float64)  # (batch, dim)
        signs = (x @ w.T) >= 0  # (batch, tables*planes)
        per_table = signs.reshape(len(x), n_tables, n_planes)
        b = (per_table * bits).sum(axis=2)  # (batch, tables)
        return pd.Series(list(b))

    return buckets


def planes_for_corpus(n_rows: int) -> int:
    """The constant-occupancy auto-plane rule, shared by the engine and
    the oracle generators so the two can never drift:
    ``max(8, ceil(log2(n / 16)))``."""
    import math

    return max(8, math.ceil(math.log2(max(n_rows, 2) / 16)))


def pq_adc_table(
    query_vec: Sequence[float],
    codebooks: Sequence[Sequence[Sequence[float]]],
) -> list[list[float]]:
    """The ADC distance table (normalized query -> squared L2 to every
    codebook centroid per subspace) — ONE arithmetic path shared by
    :func:`pq_topk` and its oracle generator, so the embedded literal
    floats are the engine's exact values by construction."""
    import math

    n_sub = len(codebooks)
    sub = len(codebooks[0][0])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    q = [float(x) / qn for x in query_vec]
    return [
        [
            sum((q[s * sub + j] - c[j]) ** 2 for j in range(sub))
            for c in codebooks[s]
        ]
        for s in range(n_sub)
    ]


def _tables_for_recall(
    n_planes: int,
    multiprobe_hamming: int,
    design_cos: float = 0.9,
    target_recall: float = 0.98,
) -> int:
    """Table count keeping union recall >= ``target_recall`` for pairs at
    the ``design_cos`` point, given the plane count and multiprobe
    radius (see :func:`lsh_near_dup_pairs`). Pure closed-form binomial
    arithmetic — evaluated once at plan-build time on the driver."""
    import math

    q = 1.0 - math.acos(design_cos) / math.pi
    p_table = sum(
        math.comb(n_planes, k) * q ** (n_planes - k) * (1.0 - q) ** k
        for k in range(min(multiprobe_hamming, n_planes) + 1)
    )
    if p_table >= 1.0:
        return 1
    return max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_table)))


def lsh_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.5,
    n_planes: int | None = None,
    n_tables: int | None = None,
    multiprobe_hamming: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_rows: int | None = None,
) -> DataFrame:
    """LSH-pruned near-duplicate pairs: (id_a, id_b, cos_sim >= threshold).

    ``n_planes=None`` (default) auto-scales the bucket space with the
    corpus: ``max(8, ceil(log2(n / 16)))`` — the constant-occupancy rule.
    A FIXED plane count is the classic hyperplane-LSH scaling trap: the
    bucket space is 2^p, so at 10x the vectors the expected collisions
    per bucket grow 10x and the candidate set grows ~quadratically (the
    sf1 scaling study measured exponent 1.7 at p=8 before this rule).

    Growing p alone trades that cost for silent recall decay, so
    ``n_tables=None`` (default) pairs it with the matching table rule:
    per-plane agreement for the design point cos 0.9 is
    ``q = 1 - acos(0.9)/pi ~= 0.856``; a table of p planes with
    multiprobe radius r collides with probability
    ``P = sum_{k<=r} C(p,k) q^(p-k) (1-q)^k``, and the table count is
    chosen so the OR over tables clears recall 0.98 at the design point:
    ``L = ceil(ln(1-0.98)/ln(1-P))`` (p=8 -> L=4, the historical
    default; p=11 -> 6; p=16 -> 11). L growing with p IS hyperplane
    LSH's honest cost for fixed recall (the classic n^rho table growth)
    — the adaptive dispatcher exists because below ~1e5 vectors exact
    BLAS beats paying it at all. Genuine planted dups sit above the
    design point (cos 0.98 -> q ~= 0.936 -> recall >= 0.999). ``n_rows``
    lets a caller that already counted the corpus (the adaptive
    dispatcher) skip the extra count job.

    The scale path for the exact all-pairs plan
    (plans.queries.embedding_near_dup_pairs): instead of O(n^2) compares,
    each vector is bucketed in ``n_tables`` independent hyperplane tables;
    only pairs colliding in some table (within ``multiprobe_hamming`` bits,
    probed by XOR-expanding the LEFT side only so each colliding pair is
    emitted once per table, not probe^2 times) are reranked with the exact
    cosine. Borderline pairs (cos ~ threshold) are where the approximation
    spends its error budget (tests/test_operators.py measures planted-dup
    recall and containment vs the exact plan).

    Execution shape: all n_tables*n_planes plane dots are ONE numpy
    matrix product inside an Arrow-batched pandas UDF — a literal-weight
    expression tree this wide (2k+ multiply-adds) overflows whole-stage
    codegen's 64 KB method limit and silently falls back to interpreted
    mode, which is slower than the vectorized UDF. The tiny (id, buckets)
    frame is persisted and reused by the probe explode and collision
    join; the rerank joins flattened vectors back through a codegen'd
    64-term dot with precomputed norms."""
    from .dedup import _persist  # shared persist registry (release_cached)

    if n_planes is None:
        n = n_rows if n_rows is not None else df.count()
        n_planes = planes_for_corpus(n)
    if n_tables is None:
        n_tables = _tables_for_recall(n_planes, multiprobe_hamming)
    masks = _hamming_ball_masks(n_planes, multiprobe_hamming)
    planes_all = [
        plane
        for t in range(n_tables)
        for plane in make_planes(dim, n_planes, seed=1009 + 7919 * t)
    ]
    # fan_out before the bucket UDF (r11): on a single-split corpus the
    # whole bucket pipeline — Python-worker hop, n_tables*n_planes
    # matmul, persist write — serialized through ONE task (stage
    # profile: 1 task, ~2.0 s wall of a ~3.0 s query at sf0.1 once the
    # r10 session-wide scan-split floor was reverted). The conditional
    # repartition moves only (id, vector) rows and is a no-op on
    # multi-split inputs, i.e. at any real corpus scale.
    base = _persist(
        fan_out(df.select(F.col(id_col).alias("id"), F.col(vec_col))).select(
            "id",
            _multitable_bucket_udf(planes_all, n_planes, n_tables)(
                F.col(vec_col)
            ).alias("bs"),
        )
    )

    left = base.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        F.col("bs")[t].bitwiseXOR(F.lit(m)).alias("bucket"),
                    )
                    for t in range(n_tables)
                    for m in masks
                ]
            )
        ).alias("p"),
    ).select("id", "p.tbl", "p.bucket")
    right = base.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), F.col("bs")[t].alias("bucket"))
                    for t in range(n_tables)
                ]
            )
        ).alias("p"),
    ).select("id", "p.tbl", "p.bucket")
    cand = (
        left.alias("l")
        .join(
            right.alias("r"),
            on=[
                F.col("l.tbl") == F.col("r.tbl"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
    )
    # NOTE: cand still contains multi-table duplicate pairs (~10%); the
    # rerank is cheap per row, so dedup runs AFTER the threshold filter,
    # on the (tiny) surviving set — a shuffle of results, not candidates
    # (measured: deduping 290k candidates first cost 2s to save 7% of a
    # 1s rerank).
    # exact-cosine rerank: plain equi-joins pull each side's vector onto
    # the pair row, then ONE Arrow-batched numpy kernel computes all
    # cosines row-wise ((A*B).sum(1) — O(pairs x dim), no matmul needed).
    # This replaced a flattened-column broadcast build that read the
    # candidate frame three times (two id collections + the join) and was
    # bounded by how many candidate vectors fit in a broadcast; the plain
    # joins have no such cap — the optimizer broadcasts the vector side
    # while it is small and falls back to shuffle joins at corpus scale.
    vecs = df.select(
        F.col(id_col).alias("__rid"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )

    @pandas_udf("double")
    def _pair_cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        import numpy as np

        a = np.vstack(va.to_numpy())
        b = np.vstack(vb.to_numpy())
        num = (a * b).sum(axis=1)
        den = np.sqrt((a * a).sum(axis=1)) * np.sqrt((b * b).sum(axis=1))
        return pd.Series(
            np.divide(num, den, out=np.zeros_like(num), where=den > 0)
        )

    paired = cand.join(
        vecs.withColumnsRenamed({"__rid": "id_a", "__v": "__va"}), "id_a"
    ).join(vecs.withColumnsRenamed({"__rid": "id_b", "__v": "__vb"}), "id_b")
    return (
        paired.select(
            "id_a",
            "id_b",
            F.round(_pair_cos("__va", "__vb"), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def near_dup_pairs_adaptive(
    df: DataFrame,
    dim: int,
    threshold: float = 0.5,
    exact_below: int = 100_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_rows: int | None = None,
    **lsh_kwargs,
) -> DataFrame:
    """Near-dup pairs with a corpus-size crossover: below ``exact_below``
    vectors, run the exact blocked-BLAS all-pairs scan; above it, the
    multi-table LSH candidate + rerank path.

    The FAISS-style dispatch rule: an index only pays when n^2 dominates
    its fixed overhead. Exact blocked pairs cost ~n^2·dim/2 fused
    multiply-adds at BLAS rate — at dim=64 and n=1e5 that is ~3e11 flops,
    seconds on a small cluster — while the LSH path pays bucketing UDFs, a
    multiprobe explode, a collision join, and a rerank join regardless of
    n. Measured at bench scale (n=2e3) the LSH path costs ~5x the exact
    scan; the crossover sits around n~1e5 for dim~64 (scale ``exact_below``
    down for wider vectors: it is the n where n^2·dim work overtakes the
    index overhead, so ~1e5·sqrt(64/dim) is a reasonable rule of thumb).

    Contract note: below the crossover the output is the EXACT pair set
    (a deterministic superset of what LSH banding would admit — every
    colliding pair above threshold, plus borderline pairs LSH might have
    missed), which is both faster and strictly better recall; downstream
    consumers (clustering, keeper selection) only ever benefit. Above the
    crossover the LSH recall contract applies (see
    :func:`lsh_near_dup_pairs`). Tests pin that both regimes agree on
    planted-dup corpora by forcing each path.

    ``n_rows`` lets a caller that already knows the corpus size (the
    query layer caches it per (path, mtime)) skip the dispatch count
    job — on Parquet that job is metadata-only, but it is still one
    Spark job per invocation on a hot path.
    """
    n = n_rows if n_rows is not None else df.count()
    if n <= exact_below:
        # kernel already filters on raw >= threshold; round for the same
        # presentation contract as the LSH branch
        return exact_cosine_pairs_blocked(
            df, threshold, vec_col=vec_col, id_col=id_col
        ).select("id_a", "id_b", F.round("cos_raw", 4).alias("cos_sim"))
    return lsh_near_dup_pairs(
        df,
        dim,
        threshold=threshold,
        vec_col=vec_col,
        id_col=id_col,
        n_rows=n,  # reuse the dispatch count for the auto-plane rule
        **lsh_kwargs,
    )


def exact_cosine_pairs_blocked(
    df: DataFrame,
    threshold: float,
    n_blocks: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    chunk_rows: int = 4096,
) -> DataFrame:
    """EXACT all-pairs cosine >= threshold as distributed block-pair BLAS.

    An exact threshold join over dense embeddings is inherently O(n^2)
    *comparisons* — no candidate pruning can cut that without losing
    borderline pairs (at thresholds near the data's bulk, e.g. 0.4 on
    random vectors, LSH recall collapses; see ``lsh_near_dup_pairs`` for
    the approximate regime). What CAN scale is how the n^2 work runs:
    instead of broadcasting the corpus and comparing row-at-a-time in
    codegen, vectors are hashed into ``n_blocks`` blocks and every block
    pair (i <= j) becomes one task that computes the cross-block cosine
    matrix as a numpy/BLAS matmul over Arrow batches.

    Scale shape: no broadcast of the corpus (each task holds two blocks),
    work splits into B(B+1)/2 independent tasks (pick B so a block fits
    executor memory: replication factor is B, shuffle volume n*B rows),
    and the per-pair cost drops from an interpreted/codegen multiply-add
    chain to BLAS throughput. Output: (id_a < id_b, cos_raw), unrounded —
    the caller applies its own rounding/filter presentation.

    ``chunk_rows`` bounds the score-matrix memory per task
    (chunk_rows x |block| doubles), so huge blocks stream instead of
    materializing a |block|^2 matrix.
    """
    import numpy as np  # noqa: F401  (executors import inside the UDF)

    spark = df.sparkSession
    if n_blocks is None:
        par = spark.sparkContext.defaultParallelism
        # B(B+1)/2 tasks ~= 1-2x cores keeps every core busy without
        # paying replication (factor B) for parallelism nobody uses
        n_blocks = max(2, math.isqrt(2 * par))
    B = int(n_blocks)
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).cast("int").alias("bid"),
    )
    tasks = F.transform(
        F.sequence(F.lit(0), F.lit(B - 1)),
        lambda j: F.struct(
            F.least(F.col("bid"), j).cast("int").alias("ti"),
            F.greatest(F.col("bid"), j).cast("int").alias("tj"),
        ),
    )
    rep = base.select("id", "v", "bid", F.explode(tasks).alias("t")).select(
        "id", "v", "bid", F.col("t.ti").alias("ti"), F.col("t.tj").alias("tj")
    )
    thr = float(threshold)

    def compute(key, pdf):
        import numpy as np

        ti, tj = int(key[0]), int(key[1])
        ids = pdf["id"].to_numpy()
        x = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
        nrm = np.sqrt((x * x).sum(axis=1))
        if ti == tj:
            a_ids, b_ids, a_x, b_x, a_n, b_n = ids, ids, x, x, nrm, nrm
        else:
            am = (pdf["bid"] == ti).to_numpy()
            a_ids, b_ids = ids[am], ids[~am]
            a_x, b_x = x[am], x[~am]
            a_n, b_n = nrm[am], nrm[~am]
        out_a, out_b, out_c = [], [], []
        for s in range(0, len(a_ids), chunk_rows):
            e = s + chunk_rows
            scores = a_x[s:e] @ b_x.T
            denom = np.outer(a_n[s:e], b_n)
            cos = np.divide(
                scores, denom, out=np.zeros_like(scores), where=denom > 0
            )
            ii, jj = np.nonzero(cos >= thr)
            ia, ib = a_ids[s:e][ii], b_ids[jj]
            if ti == tj:
                keep = ia < ib  # upper triangle by id, diagonal excluded
                ii, jj, ia, ib = ii[keep], jj[keep], ia[keep], ib[keep]
            out_a.append(np.minimum(ia, ib))
            out_b.append(np.maximum(ia, ib))
            out_c.append(cos[ii, jj])
        cat = (
            lambda parts, dt: np.concatenate(parts).astype(dt)
            if parts
            else np.array([], dtype=dt)
        )
        return pd.DataFrame(
            {
                "id_a": cat(out_a, np.int64),
                "id_b": cat(out_b, np.int64),
                "cos_raw": cat(out_c, np.float64),
            }
        )

    return rep.groupBy("ti", "tj").applyInPandas(
        compute, "id_a long, id_b long, cos_raw double"
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    chunk_rows: int = 4096,
) -> DataFrame:
    """Exact k-NN join: for EVERY query vector, its top-k corpus
    neighbors by cosine — the batch retrieval primitive (hard-negative
    mining, embedding-index audits, retrieval eval) that single-query
    top-k doesn't cover.

    Execution shape for a small-to-moderate query batch against an
    arbitrarily large corpus: the query matrix broadcasts to every task
    (queries are the SMALL side by contract — thousands, not the
    corpus), each corpus partition computes its scores as one chunked
    numpy/BLAS matmul and keeps only its LOCAL top-k per query
    (mapInPandas, so nothing but k rows per query per partition survive
    the scan), and a final per-query TakeOrdered-style aggregate merges
    the partition winners — shuffle volume is O(partitions * |Q| * k),
    never O(n). Ties broken by ascending neighbor id, so results are
    deterministic and oracle-checkable.
    """
    import numpy as np

    q_rows = queries.select(
        F.col(query_id_col).cast("long"), F.col(vec_col)
    ).collect()
    if not q_rows:
        raise ValueError("queries frame is empty")
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    q_nrm = np.sqrt((q_mat * q_mat).sum(axis=1))
    q_nrm[q_nrm == 0] = 1.0
    kk = int(k)

    base = corpus.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )

    def _topk(qi, ni, ci):
        # top-k per query under (cos desc, neighbor id asc) — the same
        # total order at every merge level, so chunk-local selection
        # composes into exactly the global top-k
        order = np.lexsort((ni, -ci, qi))
        qi, ni, ci = qi[order], ni[order], ci[order]
        rank = np.arange(len(qi)) - np.searchsorted(qi, qi, side="left")
        keep = rank < kk
        return qi[keep], ni[keep], ci[keep]

    def local_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy()
            x = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            nrm = np.sqrt((x * x).sum(axis=1))
            nrm[nrm == 0] = 1.0
            # running winners re-merged after every chunk: task memory is
            # O(chunk_rows * |Q|) for the transient score matrix plus
            # O(|Q| * k) for the winners — never O(|batch| * |Q|)
            rq = rn = rc = None
            for s in range(0, len(ids), chunk_rows):
                e = s + chunk_rows
                cos = (x[s:e] @ q_mat.T) / np.outer(nrm[s:e], q_nrm)
                cq = np.repeat(q_ids, len(ids[s:e]))
                cn = np.tile(ids[s:e], len(q_ids))
                cc = cos.T.ravel()
                if rq is not None:
                    cq = np.concatenate([rq, cq])
                    cn = np.concatenate([rn, cn])
                    cc = np.concatenate([rc, cc])
                rq, rn, rc = _topk(cq, cn, cc)
            yield pd.DataFrame(
                {"query_id": rq, "neighbor_id": rn, "cos_raw": rc}
            )

    local = base.mapInPandas(
        local_topk, "query_id long, neighbor_id long, cos_raw double"
    )
    # global merge: per-query top-k over the partition winners (a tiny
    # frame — O(partitions * |Q| * k) rows)
    w_rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.desc("cos_raw"), F.col("neighbor_id")
        )
    )
    return (
        local.withColumn("rnk", w_rank)
        .filter(F.col("rnk") <= kk)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_raw", 6).alias("cos_sim"),
            "rnk",
        )
    )


def within_cell_cosine_pairs(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    chunk_rows: int = 4096,
) -> DataFrame:
    """(id_a < id_b, cos_raw) for pairs IN THE SAME k-means cell with
    cosine >= threshold — the candidate structure of SemDeDup (Abbas et
    al. 2023): comparisons drop from n^2 to sum(|cell|^2), on the
    observation that semantic near-dups land in the same coarse cluster.

    One shuffle on the cell id, then each cell is one applyInPandas task
    computing its pairwise cosines as chunked numpy/BLAS matmuls (same
    kernel discipline as :func:`exact_cosine_pairs_blocked`; chunk_rows
    bounds the score-matrix memory). Cells of a balanced quantizer are
    n/k rows; an unbalanced hot cell degrades toward n^2 — pick k so
    cells fit a task, the same tuning FAISS applies."""
    cells = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        ivf_assign(vec_col, centroids).alias("cell"),
    )
    thr = float(threshold)

    def compute(key, pdf):
        import numpy as np

        ids = pdf["id"].to_numpy()
        x = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
        nrm = np.sqrt((x * x).sum(axis=1))
        out_a, out_b, out_c = [], [], []
        for s in range(0, len(ids), chunk_rows):
            e = s + chunk_rows
            scores = x[s:e] @ x.T
            denom = np.outer(nrm[s:e], nrm)
            cos = np.divide(
                scores, denom, out=np.zeros_like(scores), where=denom > 0
            )
            ii, jj = np.nonzero(cos >= thr)
            ia, ib = ids[s:e][ii], ids[jj]
            keep = ia < ib
            out_a.append(ia[keep])
            out_b.append(ib[keep])
            out_c.append(cos[ii, jj][keep])
        cat = (
            lambda parts, dt: np.concatenate(parts).astype(dt)
            if parts
            else np.array([], dtype=dt)
        )
        return pd.DataFrame(
            {
                "id_a": cat(out_a, np.int64),
                "id_b": cat(out_b, np.int64),
                "cos_raw": cat(out_c, np.float64),
            }
        )

    return cells.groupBy("cell").applyInPandas(
        compute, "id_a long, id_b long, cos_raw double"
    )


def semdedup_keepers(
    df: DataFrame,
    threshold: float = 0.9,
    centroids: Sequence[Sequence[float]] | None = None,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup: cluster the corpus with the IVF coarse quantizer, detect
    near-duplicate pairs WITHIN each cell, connect them into components,
    and keep the min-id representative per component. Returns
    (id_col, component, keep) for every clustered document (documents in
    no pair are implicit singletons — kept, same contract as
    dedup_cluster_keepers).

    vs the exact pipeline (exact_cosine_pairs_blocked -> components):
    comparisons shrink from n^2 to sum(|cell|^2) at the cost of missing
    cross-cell pairs; at the high thresholds semantic dedup runs (~0.9+)
    near-identical vectors quantize to the same cell with ~certainty, so
    the miss rate is the quantizer's boundary mass (property-tested on a
    planted corpus)."""
    from .dedup import dedup_cluster_keepers

    if centroids is None:
        centroids = ivf_centroids(
            df, n_centroids=n_centroids, vec_col=vec_col, id_col=id_col
        )
    pairs = within_cell_cosine_pairs(
        df, centroids, threshold, vec_col, id_col
    ).select("id_a", "id_b")
    return dedup_cluster_keepers(df, pairs, id_col)


def semdedup_keepers_adaptive(
    df: DataFrame,
    threshold: float = 0.9,
    exact_below: int = 100_000,
    centroids: "Sequence[Sequence[float]] | Callable[[], Sequence] | None" = None,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_rows: int | None = None,
) -> DataFrame:
    """:func:`semdedup_keepers` with the same FAISS-style corpus-size
    crossover as :func:`near_dup_pairs_adaptive`: below ``exact_below``
    vectors the pair scan runs EXACTLY (blocked BLAS, no quantizer) —
    the single-cell limit of SemDeDup, deterministic and strictly better
    recall than any cell partition (no boundary misses) — and the
    clustering/keeper contract is unchanged. Above the crossover, the
    k-means-cell path engages and comparisons drop from n^2 to
    sum(|cell|^2) (SemDeDup's scale shape); its planted-dup equivalence
    with the exact limit is property-tested by forcing each path.

    The dispatch is what makes small-scale output a pure function of the
    data (no trained-quantizer dependence), hence value-checkable against
    a SQL twin, while the registered plan keeps the scale path.
    ``n_rows``: pre-counted corpus size — skips the dispatch count job
    (see :func:`near_dup_pairs_adaptive`)."""
    from .dedup import dedup_cluster_keepers

    n = n_rows if n_rows is not None else df.count()
    if n <= exact_below:
        pairs = exact_cosine_pairs_blocked(
            df, threshold, vec_col=vec_col, id_col=id_col
        ).select("id_a", "id_b")
        return dedup_cluster_keepers(df, pairs, id_col)
    if callable(centroids):
        # lazy artifact hook: the quantizer (an expensive per-corpus
        # train, cached/persisted beside the corpus in production) is
        # only materialized when the cell path actually engages
        centroids = centroids()
    return semdedup_keepers(
        df, threshold, centroids, n_centroids, vec_col, id_col
    )


def lsh_bucketed_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: search only buckets within ``multiprobe_hamming``
    of the query's bucket. With 8 planes + 1-probe that's 9/256 of the
    corpus scanned — the recall/cost dial a 100 TB ANN deployment needs.
    The bucket filter is a plain predicate, so a corpus pre-partitioned by
    bucket gets partition pruning at the source."""
    dim = len(query_vec)
    planes = make_planes(dim, n_planes)

    def bucket_of(vec: Sequence[float]) -> int:
        b = 0
        for i, plane in enumerate(planes):
            if sum(float(x) * float(y) for x, y in zip(vec, plane)) >= 0:
                b |= 1 << i
        return b

    qb = bucket_of(query_vec)
    probe = [
        b
        for b in range(1 << n_planes)
        if bin(b ^ qb).count("1") <= multiprobe_hamming
    ]
    bucketed = df.withColumn("__bucket", hyperplane_bucket(vec_col, planes))
    pruned = bucketed.filter(F.col("__bucket").isin(probe)).drop("__bucket")
    return brute_force_topk(pruned, query_vec, k, vec_col, id_col)


# --------------------------------------------------------------------------
# Product quantization (PQ) — the FAISS-style compressed-domain scale path
# --------------------------------------------------------------------------

def pq_codebooks(
    df: DataFrame,
    n_sub: int = 8,
    n_centroids: int = 16,
    sample_size: int = 2048,
    iters: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Per-subspace k-means codebooks trained driver-side on a bounded,
    deterministic sample (same build discipline as :func:`ivf_centroids`:
    the codebook is tiny — n_sub x n_centroids x sub_dim floats — while
    the expensive part, encoding the corpus, stays fully distributed).
    Vectors are unit-normalized first so PQ L2 distance is monotone in
    cosine. Returns ``codebooks[s][c] = centroid c of subspace s``."""
    rows = df.orderBy(id_col).limit(sample_size).select(vec_col).collect()
    return pq_codebooks_core([r[0] for r in rows], n_sub, n_centroids, iters, seed)


def pq_codebooks_core(
    vectors, n_sub: int = 8, n_centroids: int = 16, iters: int = 8, seed: int = 42
) -> list[list[list[float]]]:
    """The numpy per-subspace k-means shared by the Spark trainer and the
    oracle generators (same rationale as :func:`spherical_kmeans_core`)."""
    import numpy as np

    x = np.array(vectors, dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = x / norms
    dim = x.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    sub = dim // n_sub
    rng = np.random.RandomState(seed)
    books: list[list[list[float]]] = []
    for s in range(n_sub):
        xs = x[:, s * sub : (s + 1) * sub]
        cent = xs[rng.choice(len(xs), min(n_centroids, len(xs)), replace=False)].copy()
        for _ in range(iters):
            d = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(len(cent)):
                members = xs[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books.append([[float(v) for v in row] for row in cent])
    return books


def pq_assign_frame(
    df: DataFrame,
    codebooks: Sequence[Sequence[Sequence[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """(id, code_col=array<int>[n_sub]): per subspace, the L2-nearest
    codebook centroid of the unit-normalized subvector. In production the
    codes are computed once at ingest and stored, shrinking each vector
    to n_sub bytes (64x here).

    Assignment runs as ONE numpy broadcast-subtract/argmin inside an
    Arrow-batched pandas UDF — the same reasoning as the multi-table LSH
    bucketer above: Spark's interpreted higher-order lambdas re-evaluate
    shared subexpressions per element (and CollapseProject folds staged
    projections back in), so the K*n_sub*dim distance arithmetic per row
    is 100x+ slower as Column expressions than as a vectorized matmul."""
    import numpy as np

    w = np.array(codebooks, dtype=np.float64)  # (n_sub, K, sub)
    n_sub, _, sub = w.shape

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(v: pd.Series) -> pd.Series:
        x = np.vstack(v.to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(x, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        x = x / nrm
        codes = np.empty((len(x), n_sub), dtype=np.int32)
        for s in range(n_sub):
            xs = x[:, s * sub : (s + 1) * sub]
            d = ((xs[:, None, :] - w[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return df.select(F.col(id_col), assign(F.col(vec_col)).alias(code_col))


def pq_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    codebooks: Sequence[Sequence[Sequence[float]]] | None = None,
    n_sub: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rerank: int | None = None,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC): the
    query-to-centroid distance table (n_sub x n_centroids floats) is
    computed driver-side and shipped as one literal; each row's distance
    is n_sub table lookups over its PQ code — no float vector is touched
    at query time, which is the compressed-domain regime a 100 TB ANN
    corpus runs in. Unit-normalized L2 is monotone in cosine, so the
    score is reported as approx_cos = 1 - d/2. TakeOrderedAndProject as
    everywhere else.

    ``rerank=R`` layers the standard IVFADC refinement (Jégou et al.,
    "Product Quantization for Nearest Neighbor Search", §IV-E): the
    compressed scan shortlists the top R >= k codes, then ONLY those R
    rows' float vectors are read back and scored exactly, and the exact
    order picks the final k. Quantization error then only hurts when a
    true neighbor falls outside the whole shortlist, so recall climbs
    with R while the float-domain cost stays R rows (broadcast semi-join
    against the shortlist) — the dial :func:`tune_topk_index` turns.
    Output gains an ``exact_cos`` column next to ``approx_cos``."""
    import json

    if codebooks is None:
        codebooks = pq_codebooks(df, n_sub=n_sub, vec_col=vec_col, id_col=id_col)
    n_sub = len(codebooks)
    dtable = pq_adc_table(query_vec, codebooks)
    packed_dt = F.from_json(F.lit(json.dumps(dtable)), "array<array<double>>")
    coded = pq_assign_frame(df, codebooks, vec_col, id_col).withColumn(
        "__dt", packed_dt
    )
    idxs = F.sequence(F.lit(0), F.lit(n_sub - 1))
    dist = F.aggregate(
        F.transform(
            idxs,
            lambda s: F.element_at(
                F.element_at(F.col("__dt"), s + 1),
                F.element_at(F.col("pq_code"), s + 1) + 1,
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = coded.select(
        F.col(id_col), F.round(1.0 - dist / 2.0, 6).alias("approx_cos")
    )
    if rerank is None:
        return scored.orderBy(F.desc("approx_cos"), F.col(id_col)).limit(k)
    if rerank < k:
        raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    shortlist = scored.orderBy(F.desc("approx_cos"), F.col(id_col)).limit(
        rerank
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = df.select(id_col, vec_col).join(F.broadcast(shortlist), id_col)
    num = _dot(F.col(vec_col).cast("array<double>"), q)
    den = _norm(F.col(vec_col).cast("array<double>")) * _norm(q)
    ecos = F.when(den > 0, num / den).otherwise(F.lit(0.0))
    return (
        cand.select(id_col, "approx_cos", F.round(ecos, 6).alias("exact_cos"))
        .orderBy(F.desc("exact_cos"), F.col(id_col))
        .limit(k)
    )


def sq8_params(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Scalar-quantization training state: ONE row ``(mns: array<double>,
    mxs: array<double>)`` of per-dimension corpus min/max.

    Unlike the LSH/IVF/PQ families, SQ8's entire "index training" is two
    plan-side aggregates — no driver-side sample, no seeded artifact, no
    collect anywhere — so the whole pipeline (train, compress, score) is
    a single Catalyst plan and its oracle twin is plain static SQL. The
    explode is k=dim rows per vector, map-side combined to dim rows per
    partition before the shuffle."""
    ex = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("d", "x")
    )
    pm = ex.groupBy("d").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    one = pm.agg(
        F.array_sort(F.collect_list(F.struct("d", "mn", "mx"))).alias("pm")
    )
    return one.select(
        F.transform("pm", lambda s: s["mn"]).alias("mns"),
        F.transform("pm", lambda s: s["mx"]).alias("mxs"),
    )


def _sq8_code(xi: Column, mn: Column, mx: Column) -> Column:
    """8-bit affine code: clamp(floor((x - mn) / ((mx - mn)/255)), 0, 255).
    Pure IEEE-double ops (sub/div/floor) — bit-identical on any engine,
    which is what makes the family oracle-checkable without artifacts."""
    s = (mx - mn) / F.lit(255.0)
    raw = F.floor((xi - mn) / s).cast("double")
    return F.when(
        mx > mn, F.greatest(F.lit(0.0), F.least(F.lit(255.0), raw))
    ).otherwise(F.lit(0.0))


def sq8_compress(
    df: DataFrame,
    params: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, sq_code: array<int>) — the 1-byte-per-dimension compressed
    corpus (4x smaller than float32, what a 100 TB vector store scans)."""
    if params is None:
        params = sq8_params(df, vec_col)
    x = F.col(vec_col).cast("array<double>")

    def code(xi, i):
        mn = F.element_at(F.col("mns"), i + 1)
        mx = F.element_at(F.col("mxs"), i + 1)
        return _sq8_code(xi, mn, mx).cast("int")

    return df.crossJoin(F.broadcast(params)).select(
        F.col(id_col), F.transform(x, code).alias("sq_code")
    )


def sq8_dequantized(
    df: DataFrame,
    params: DataFrame | None = None,
    vec_col: str = "embedding",
    out_col: str = "sq_deq",
) -> DataFrame:
    """``df`` + ``out_col``: the quantize->dequantize round trip
    ``mn + code * (mx - mn)/255`` — the reconstruction an SQ8 scanner
    scores against. One narrow higher-order pass per row (fine at
    dim <= ~128; see the PQ family for the wide-arithmetic regime where
    per-row work moves to an Arrow-batched pandas UDF)."""
    if params is None:
        params = sq8_params(df, vec_col)
    x = F.col(vec_col).cast("array<double>")

    def deq(xi, i):
        mn = F.element_at(F.col("mns"), i + 1)
        mx = F.element_at(F.col("mxs"), i + 1)
        s = (mx - mn) / F.lit(255.0)
        return F.when(mx > mn, mn + _sq8_code(xi, mn, mx) * s).otherwise(mn)

    return (
        df.crossJoin(F.broadcast(params))
        .withColumn(out_col, F.transform(x, deq))
        .drop("mns", "mxs")
    )


def sq8_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    params: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rerank: bool | int = True,
) -> DataFrame:
    """Approximate top-k by cosine over SQ8 reconstructions, with an
    optional exact rerank.

    ``query_df`` is a one-row broadcast frame with column ``q`` (the
    no-collect convention of the cosine family). The scan scores every
    row against the dequantized vector — TakeOrderedAndProject keeps it
    a per-partition heap — then ``rerank=True`` joins only the k
    surviving ids back to their float vectors for an exact score, so the
    output exposes both ``sq_cos_raw`` and ``exact_cos_raw`` and the
    quantization error is visible per hit. At 100 TB the scan touches
    only the 1-byte codes + the one-row params broadcast; the float
    corpus is read for k rows.

    ``rerank=R`` (an int >= k) widens the shortlist to the top R codes
    and returns the top k of those by EXACT score — the same refinement
    dial as :func:`pq_topk`'s ``rerank``, tunable via
    :func:`tune_topk_index` when quantization error alone costs recall."""
    if isinstance(rerank, bool):
        shortlist_n = k
    else:
        shortlist_n = int(rerank)
        if shortlist_n < k:
            raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    deq = sq8_dequantized(df, params=params, vec_col=vec_col)
    scored = deq.crossJoin(query_df)
    num = _dot(F.col("sq_deq"), F.col("q"))
    den = _norm(F.col("sq_deq")) * _norm(F.col("q"))
    sq_cos = F.when(den > 0, num / den).otherwise(F.lit(0.0))
    top = (
        scored.select(F.col(id_col), sq_cos.alias("sq_cos_raw"))
        .orderBy(F.desc("sq_cos_raw"), F.col(id_col))
        .limit(shortlist_n)
    )
    if rerank is False:
        return top
    exact = df.select(id_col, vec_col).join(
        F.broadcast(top), id_col
    ).crossJoin(query_df)
    enum = _dot(F.col(vec_col), F.col("q"))
    eden = _norm(F.col(vec_col)) * _norm(F.col("q"))
    ecos = F.when(eden > 0, enum / eden).otherwise(F.lit(0.0))
    out = exact.select(
        id_col, "sq_cos_raw", ecos.alias("exact_cos_raw")
    )
    if shortlist_n == k:
        return out  # historical shape: the k ADC winners, exact-scored
    return (
        out.orderBy(F.desc("exact_cos_raw"), F.col(id_col)).limit(k)
    )


# --------------------------------------------------------------------------
# Recall-targeted auto-tuning — pick the cheapest knob that hits a target
# --------------------------------------------------------------------------

def _lsh_ball_frac(n_planes: int, radius: int) -> float:
    import math as _m

    ball = sum(_m.comb(n_planes, i) for i in range(min(radius, n_planes) + 1))
    return ball / float(1 << n_planes)


def tune_topk_index(
    df: DataFrame,
    index: str,
    k: int = 10,
    target_recall: float = 0.8,
    n_val_queries: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    n_centroids: int = 16,
    n_sub: int = 8,
    centroids: Sequence[Sequence[float]] | None = None,
    codebooks: Sequence[Sequence[Sequence[float]]] | None = None,
    ladder: Sequence[int] | None = None,
) -> dict:
    """THE TUNING RULE for the approximate top-k family: measure, then
    pick the cheapest knob value whose validation recall@k meets
    ``target_recall``.

    Closed forms (``planes_for_corpus``, ``_tables_for_recall``) work for
    the PAIR design point because collision probability at a fixed cosine
    is corpus-independent. Single-query top-k recall is NOT corpus-
    independent — it depends on where the corpus's k-th neighbor sits
    relative to the index's partitioning (uniform corpora: recall tracks
    scanned fraction, no sublinear index can help; clustered corpora —
    the real embedding regime — a small probe set covers the true
    neighbors). So the top-k rule is empirical by necessity:

    1. hold out ``n_val_queries`` validation queries, deterministically
       spread over the corpus (hash order, so no cluster is favored);
    2. one exact :func:`knn_join` gives ground truth for all of them in
       a single distributed pass;
    3. walk the index's knob ladder cheapest-first — LSH: multiprobe
       radius (scan ~ Hamming-ball/2^planes), IVF: nprobe (scan ~
       nprobe/n_centroids), PQ/SQ8: exact-rerank shortlist R (float
       reads ~ R rows) — and stop at the first rung whose mean recall@k
       >= target.

    Cost: the validation queries are a few dozen small jobs against the
    index; at 100 TB this runs once per (corpus, index) build, exactly
    like an index-build hyperparameter sweep, and the chosen knob is
    then pinned for the query workload. Returns the full measured ladder
    (``met=False`` with the best rung if even the widest setting misses,
    e.g. a structureless corpus where the honest answer is brute force).
    """
    if index not in ("lsh", "ivf", "pq", "sq8"):
        raise ValueError(f"unknown index {index!r}")
    n_rows = df.count()
    val = (
        df.orderBy(F.xxhash64(F.col(id_col)))
        .limit(n_val_queries)
        .select(F.col(id_col).alias("query_id"), vec_col)
    )
    truth: dict[int, set[int]] = {}
    for r in knn_join(df, val, k=k, vec_col=vec_col, id_col=id_col).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    qvecs = {r["query_id"]: list(r[vec_col]) for r in val.collect()}

    if index == "ivf" and centroids is None:
        centroids = ivf_centroids(
            df, n_centroids=n_centroids, vec_col=vec_col, id_col=id_col
        )
    if index == "ivf":
        # precomputed centroids may not match the n_centroids default —
        # the ladder ceiling and every recorded scan_frac derive from
        # the ACTUAL cell count, not the parameter
        n_centroids = len(centroids)
    if index == "pq" and codebooks is None:
        codebooks = pq_codebooks(
            df, n_sub=n_sub, vec_col=vec_col, id_col=id_col
        )
    sq_par = sq8_params(df, vec_col) if index == "sq8" else None

    if ladder is None:
        if index == "lsh":
            ladder = list(range(0, n_planes + 1))
        elif index == "ivf":
            ladder = [p for p in (1, 2, 3, 4, 6, 8, 12, 16, 24, 32)
                      if p <= n_centroids]
            if ladder[-1] != n_centroids:
                ladder.append(n_centroids)
        else:  # pq / sq8 exact-rerank shortlist
            ladder = [k, 4 * k, 16 * k, 64 * k, 256 * k]
            ladder = sorted({min(r, n_rows) for r in ladder})

    def run_one(knob: int, qid: int) -> set[int]:
        qv = qvecs[qid]
        if index == "lsh":
            got = lsh_bucketed_topk(
                df, qv, k=k, n_planes=n_planes, vec_col=vec_col,
                id_col=id_col, multiprobe_hamming=knob,
            )
        elif index == "ivf":
            got = ivf_topk(
                df, qv, k=k, centroids=centroids, nprobe=knob,
                vec_col=vec_col, id_col=id_col,
            )
        elif index == "pq":
            got = pq_topk(
                df, qv, k=k, codebooks=codebooks, vec_col=vec_col,
                id_col=id_col, rerank=max(knob, k),
            )
        else:
            qdf = df.filter(F.col(id_col) == qid).select(
                F.col(vec_col).cast("array<double>").alias("q")
            )
            got = sq8_topk(
                df, qdf, k=k, params=sq_par, vec_col=vec_col,
                id_col=id_col, rerank=max(knob, k),
            )
        return {r[0] for r in got.select(id_col).collect()}

    def scan_frac(knob: int) -> float:
        if index == "lsh":
            return _lsh_ball_frac(n_planes, knob)
        if index == "ivf":
            return knob / float(n_centroids)
        return min(1.0, knob / float(max(n_rows, 1)))

    knob_name = {
        "lsh": "multiprobe_hamming", "ivf": "nprobe",
        "pq": "rerank", "sq8": "rerank",
    }[index]
    rungs = []
    chosen = None
    for knob in ladder:
        recalls = [
            len(run_one(knob, q) & truth[q]) / float(k) for q in qvecs
        ]
        rec = sum(recalls) / len(recalls)
        rungs.append({
            "value": int(knob),
            "recall": round(rec, 4),
            "scan_frac": round(scan_frac(knob), 5),
        })
        if rec >= target_recall:
            chosen = rungs[-1]
            break
    if chosen is None:
        chosen = max(rungs, key=lambda r: r["recall"])
    return {
        "index": index,
        "knob": knob_name,
        "k": k,
        "n_val_queries": len(qvecs),
        "target": target_recall,
        "ladder": rungs,
        "chosen": chosen["value"],
        "recall": chosen["recall"],
        "scan_frac": chosen["scan_frac"],
        "met": bool(chosen["recall"] >= target_recall),
        "n_rows": int(n_rows),
    }


def ivf_knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    centroids: Sequence[Sequence[float]] | None = None,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Batch ANN retrieval: for EVERY query, approximate top-k corpus
    neighbors by cosine, searching only each query's ``nprobe`` nearest
    IVF cells — the index-accelerated counterpart of :func:`knn_join`
    (which broadcast-matmuls every query against every corpus row).

    Shape and scale: the corpus is cell-assigned once (one JVM
    expression, :func:`ivf_assign` — at rest this is the partition
    column, so the join below prunes at the source); the query side
    expands to |Q| * nprobe (query, cell) probe rows via one
    posexplode + row_number over the packed centroid literal; the
    candidate set is the equi-join of the two on the cell id —
    |Q| * n * (nprobe / n_centroids) rows instead of knn_join's
    |Q| * n, the whole point of the coarse quantizer. Per-candidate
    cosine is a JVM fold (sequential, DuckDB-parity like the rest of
    the cosine family) and the final per-query top-k is a bounded
    window over candidates. Ties break (cos desc, neighbor id asc);
    probe/assignment ties to the HIGHER cell id — the exact rules the
    generated oracle replays.

    Recall follows the single-query IVF story (tune nprobe via
    :func:`tune_topk_index` — on clustered corpora small nprobe
    suffices; on structureless ones no sublinear index helps).

    Unlike :func:`knn_join` (which must collect the query matrix and
    therefore raises on an empty query frame), this join never moves
    queries to the driver — an empty query frame yields an empty
    result, the natural semantics of a fully plan-side operator."""
    import json

    if centroids is None:
        centroids = ivf_centroids(
            corpus, n_centroids=n_centroids, vec_col=vec_col, id_col=id_col
        )
    packed = F.from_json(
        F.lit(json.dumps([[float(x) for x in c] for c in centroids])),
        "array<array<double>>",
    )
    qv = F.col(vec_col).cast("array<double>")
    cscored = queries.select(
        F.col(query_id_col), qv.alias("__qv")
    ).select(
        query_id_col,
        "__qv",
        F.posexplode(packed).alias("__cid", "__cv"),
    ).select(
        query_id_col,
        "__qv",
        "__cid",
        _dot(F.col("__qv"), F.col("__cv")).alias("__cdot"),
    )
    w_probe = Window.partitionBy(query_id_col).orderBy(
        F.desc("__cdot"), F.desc("__cid")
    )
    probes = (
        cscored.withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= nprobe)
        .select(query_id_col, "__qv", F.col("__cid").alias("__cell"))
    )
    # fan_out before the assignment fold (r11): cell assignment is
    # n_centroids dot-product folds per row and the candidate cosine is
    # another, all inside the scan stage — a single-split corpus ran the
    # whole probe as ONE task (warm stage profile: 1 task / 0.69 s of a
    # 1.63 s wall at sf0.1). Moves (id, vector) rows only; no-op on
    # multi-split inputs.
    cells = fan_out(corpus.select(F.col(id_col), F.col(vec_col))).select(
        F.col(id_col).alias("neighbor_id"),
        qv.alias("__v"),
        ivf_assign(vec_col, centroids).alias("__cell"),
    )
    cand = cells.join(F.broadcast(probes), "__cell")
    num = _dot(F.col("__v"), F.col("__qv"))
    den = _norm(F.col("__v")) * _norm(F.col("__qv"))
    cos = F.when(den > 0, num / den).otherwise(F.lit(0.0))
    scored = cand.select(
        query_id_col, "neighbor_id", cos.alias("__cos")
    )
    w_rank = Window.partitionBy(query_id_col).orderBy(
        F.desc("__cos"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= k)
        .select(
            query_id_col,
            "neighbor_id",
            F.round("__cos", 6).alias("cos_sim"),
            "rnk",
        )
    )


def write_ivf_partitioned(
    df: DataFrame,
    path: str,
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """Materialize the ANN corpus partitioned by its IVF cell — the
    at-rest layout every probe-style function in this module keeps
    promising ("write the corpus partitioned by the bucket and probes
    become partition pruning"), made physical. One ``ivf_cell=<i>/``
    directory per cell (the write shuffles once on the cell id so each
    directory is one file per write), float vectors stored inside.

    At 100 TB this is the difference between an index and a scan: a
    query's nprobe cells are a LISTING-level filter — files for the
    other n_centroids - nprobe cells are never opened (see
    :func:`ivf_topk_partitioned`, plan-pinned in tests). Pair with
    :func:`tune_topk_index` to size nprobe for a recall target, and
    retrain/rewrite when the corpus drifts (centroids are layout, like
    the lake sink's n_buckets)."""
    (
        df.withColumn("ivf_cell", ivf_assign(vec_col, centroids))
        .repartition(F.col("ivf_cell"))
        .write.mode(mode)
        .partitionBy("ivf_cell")
        .parquet(path)
    )


def ivf_topk_partitioned(
    spark,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    centroids: Sequence[Sequence[float]] | None = None,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k over a :func:`write_ivf_partitioned` corpus:
    the nprobe nearest cells are computed driver-side (n_centroids dot
    products on one vector) and applied as an ``isin`` filter on the
    PARTITION column, so pruning happens at file listing — the scan
    never opens the other cells' files (``PartitionFilters`` in the
    plan, pinned by test). Same probe selection and tie rules as
    :func:`ivf_topk`; results are identical on the same corpus and
    centroids."""
    import math as _math

    if centroids is None:
        raise ValueError(
            "centroids are layout for a partitioned corpus — pass the "
            "same list write_ivf_partitioned used"
        )
    qn = _math.sqrt(sum(float(v) ** 2 for v in query_vec)) or 1.0
    scored = sorted(
        (
            sum(float(a) * float(b) for a, b in zip(query_vec, c)) / qn,
            i,
        )
        for i, c in enumerate(centroids)
    )
    probe = [i for _, i in scored[-nprobe:]]
    pruned = spark.read.parquet(path).filter(F.col("ivf_cell").isin(probe))
    return brute_force_topk(pruned, query_vec, k, vec_col, id_col)
