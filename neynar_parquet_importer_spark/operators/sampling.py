"""Deterministic sampling / split assignment for training-data pipelines.

A 100 TB corpus cannot be sampled with ``rand()``: the sample must be
*reproducible* (same rows on re-run, resumable after failure), *stable
under repartitioning* (Spark's ``df.sample`` is seed + partition-layout
dependent), and *auditable* (an oracle engine must agree on exactly which
rows are in). The standard fix is content-hash thresholding: a row is
sampled iff ``hash(seed, key) < fraction * 2^bits``. Here the hash is
md5 over a seed-prefixed key string, compared on the first 8 hex chars —
fixed-width lowercase hex compares lexicographically exactly like the
integer it encodes, so the predicate is portable to any engine with md5
(DuckDB, Trino, BigQuery, Postgres) and hashes agree bit-for-bit.

Scale shape: every function below is a pure Column expression — the
sample predicate is a codegen'd filter evaluated at scan time (no
shuffle, no state, no driver round-trip), and split assignment is a
projection. Sampling 1% of 100 TB reads 100 TB but shuffles nothing.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPAN = 16**8  # first 8 md5 hex chars encode a uniform 32-bit draw


def threshold_hex(fraction: float) -> str:
    """The 8-char lowercase hex threshold encoding ``fraction`` of the
    32-bit hash space (also used verbatim in oracle SQL strings)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return format(min(int(round(fraction * _HEX_SPAN)), _HEX_SPAN - 1), "08x")


def hash_hex(key_cols: Sequence[Column | str], seed: str) -> Column:
    """First 8 hex chars of md5 over ``seed:key1:key2:...`` — the uniform
    draw both the Spark plan and the SQL oracle compute identically."""
    cols = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in key_cols]
    return F.substring(F.md5(F.concat_ws(":", F.lit(seed), *cols)), 1, 8)


def hash_hex_sql(key_exprs: Sequence[str], seed: str) -> str:
    """The oracle-side twin of :func:`hash_hex` (ANSI-ish SQL string)."""
    parts = " || ':' || ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs)
    return f"substr(md5('{seed}' || ':' || {parts}), 1, 8)"


def hash_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    fraction: float,
    seed: str = "sample",
) -> DataFrame:
    """Keep ``fraction`` of rows, deterministically by key hash.

    Unlike ``df.sample`` this is a *function of the row*, not of the
    partition layout: re-runs, retries, and different cluster sizes
    produce the identical sample, and adding new rows to the corpus never
    changes the verdict for existing rows (the property incremental
    training-data pipelines need).
    """
    if fraction >= 1.0:
        return df
    return df.filter(hash_hex(list(key_cols), seed) < F.lit(threshold_hex(fraction)))


def split_column(
    key_cols: Sequence[str],
    weights: Mapping[str, float],
    seed: str = "split",
) -> Column:
    """Assign each row to a named split (train/val/test/...) by hash range.

    ``weights`` maps split name -> relative weight (normalized here).
    Iteration order of the mapping defines the hash-range order, so the
    assignment is fully specified by (weights, seed). Rows never migrate
    between splits when other splits' weights change only via renames.
    """
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    h = hash_hex(list(key_cols), seed)
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = h < F.lit(threshold_hex(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def split_case_sql(
    key_exprs: Sequence[str],
    weights: Mapping[str, float],
    seed: str = "split",
) -> str:
    """Oracle-side CASE expression matching :func:`split_column`."""
    total = float(sum(weights.values()))
    h = hash_hex_sql(key_exprs, seed)
    arms = []
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        arms.append(f"WHEN {h} < '{threshold_hex(acc)}' THEN '{name}'")
    return "CASE " + " ".join(arms) + f" ELSE '{names[-1]}' END"


def capped_per_group(
    df: DataFrame,
    group_col: str,
    key_cols: Sequence[str],
    cap: int,
    seed: str = "cap",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically by
    key hash (the per-domain contribution cap of pretraining pipelines:
    no single source may dominate the mixture).

    Ordering by the hash makes the selection uniform-at-random yet
    reproducible and engine-portable; the tiebreak on the key itself makes
    it total. One shuffle on the group key; with millions of groups the
    per-group state is a k-row heap inside the window operator — no group
    ever materializes fully in memory beyond its sorted run.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_hex(list(key_cols), seed), *[F.col(k) for k in key_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_cols: Sequence[str],
    seed: str = "stratified",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum hash sampling: each stratum value gets its own
    fraction (strata absent from ``fractions`` get ``default_fraction``).

    The workhorse of data-mixing pipelines — downsample over-represented
    languages/sources while keeping rare ones intact — expressed as a
    single codegen'd CASE-threshold filter: no shuffle, no per-stratum
    scans, one pass at scan speed regardless of the number of strata.
    """
    h = hash_hex(list(key_cols), seed)

    def keep_for(frac: float) -> Column:
        # fraction >= 1.0 short-circuits to keep-everything, like
        # hash_sample: the strict `h < 'ffffffff'` predicate silently
        # and DETERMINISTICALLY drops any row whose hash is exactly
        # 'ffffffff' (p = 2^-32 per row — real rows at 10B-doc scale)
        # from a stratum configured to keep 100%
        if frac >= 1.0:
            return F.lit(True)
        return h < F.lit(threshold_hex(frac))

    keep: Column = keep_for(default_fraction)
    for value, frac in fractions.items():
        keep = F.when(F.col(strata_col) == F.lit(value), keep_for(frac)).otherwise(keep)
    return df.filter(keep)


def weighted_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    weight_col: str,
    k: int,
    seed: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES): each row draws a uniform u from the md5
    of its key (the same engine-portable draw as :func:`hash_sample`)
    and scores ``-ln(u) / w``; the k smallest scores win. Inclusion
    probability is proportional to weight; the sample is a pure function
    of (keys, weights, seed) — reproducible across engines, runs, and
    partitionings, and it plans as TakeOrderedAndProject (per-partition
    heap + k-row driver merge), never a global sort.

    u is mapped to (0, 1] via (hash+1)/2^32 so ln() never sees zero.
    Rows with weight <= 0 are excluded (zero-weight rows must never beat
    a weighted one)."""
    u = (
        F.conv(hash_hex(list(key_cols), seed), 16, 10).cast("double") + 1.0
    ) / float(_HEX_SPAN)
    w = F.col(weight_col).cast("double")
    score = -F.log(u) / w
    return (
        df.filter(w > 0)
        .withColumn("__wscore", score)
        .orderBy(F.col("__wscore").asc(), *[F.col(c) for c in key_cols])
        .limit(k)
        .drop("__wscore")
    )


def epoch_shuffle(
    df: DataFrame,
    key_cols: Sequence[str],
    seed: str = "epoch-0",
    order_col: str = "sort_key",
) -> DataFrame:
    """Deterministic training-order shuffle: global ORDER BY the md5 draw
    of (seed, keys), keys as tie-break — the per-epoch reshuffle a
    training pipeline runs over the whole corpus. A new seed ("epoch-1",
    ...) yields an independent permutation; the order is a pure function
    of (keys, seed), reproducible across engines, runs, and partition
    layouts (same engine-portable draw as :func:`hash_sample`).

    Scale shape: Spark plans a global ORDER BY as a range-partitioned
    parallel sort (sampled boundaries, every partition sorts its range
    independently) — never a single-task ordering — and downstream
    writers preserve it per output split. The draw is exposed as
    ``order_col`` so the permutation itself is value-checkable (sorting
    any engine's output by it reproduces the order).
    """
    h = hash_hex(list(key_cols), seed)
    return df.withColumn(order_col, h).orderBy(
        F.col(order_col).asc(), *[F.col(c) for c in key_cols]
    )


def negative_samples(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = 4,
    seed: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor document draws ``k`` pseudo-random OTHER documents, the same
    ones on every engine and layout. Returns (id_col, neg_idx,
    neg_<id_col>).

    Construction: documents get a dense 0..N-1 rank by id via the same
    two-phase range-partitioned prefix scan as sequence packing (never a
    single-task window); negative j of rank r is rank
    ``(r + 1 + (h mod (N-1))) mod N`` with ``h`` the first 32 bits of
    md5(seed:r:j) — the +1 shift makes self-selection impossible, and
    md5 keeps the draw engine-portable (the DuckDB oracle reproduces it
    byte for byte). The mapping back from target rank to document id is
    one equi-join against the (persisted) rank frame. The mod draw has
    the usual negligible modulo bias (~2^-32 * N).

    A corpus of a single document has no valid negative: the plan fails
    loudly at execution (in-plan guard — no extra driver-side count job)
    instead of silently returning an empty frame. When ``k >= N - 1``
    the draws repeat targets (sampling is WITH replacement among the
    N-1 others); callers wanting distinct negatives should
    ``dropDuplicates([id_col, "neg_" + id_col])`` and accept < k rows.
    """
    from .dedup import _persist
    from .packing import token_offsets

    if k <= 0:
        raise ValueError("k must be positive")
    base = df.select(F.col(id_col).alias("__ord")).withColumn("__one", F.lit(1))
    ranked = token_offsets(base, id_col="__ord", token_col="__one")
    n = F.broadcast(ranked.agg(F.count(F.lit(1)).alias("n_total")))
    r = _persist(
        ranked.crossJoin(n).select(
            F.col("id").alias(id_col),
            F.col("offset").alias("rnk"),
            "n_total",
        )
    )
    anchors = r.select(
        id_col,
        "rnk",
        "n_total",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_idx"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(seed), F.col("rnk"), F.col("neg_idx"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    # in-plan guard: n_total == 1 would make pmod(h, 0) NULL and the
    # final inner join silently drop every row; raise instead. The guard
    # rides the existing broadcast count — no separate driver count job.
    denom = F.when(
        F.col("n_total") >= 2, F.col("n_total") - 1
    ).otherwise(
        F.raise_error(
            F.lit("negative_samples requires a corpus of >= 2 documents")
        )
    )
    target = F.pmod(F.col("rnk") + 1 + F.pmod(h, denom), F.col("n_total"))
    lookup = r.select(
        F.col("rnk").alias("__t"), F.col(id_col).alias(f"neg_{id_col}")
    )
    return (
        anchors.withColumn("__t", target)
        .join(lookup, "__t")
        .select(id_col, "neg_idx", f"neg_{id_col}")
    )
