"""Training-sequence packing: map each document onto its token range in
the GPT-style "concatenate the corpus, chunk every N tokens" layout.

Given documents with token counts and a deterministic global order
(doc id), every document occupies tokens [offset, offset + n_tokens)
of the concatenated stream, and training sequence k covers tokens
[k*N, (k+1)*N). The packing answer per document — its offset, and the
first/last sequence it lands in — is what a data loader needs to slice
shards without materializing the concatenation.

The global prefix sum is the interesting part at 100 TB: a naive
``sum() OVER (ORDER BY id)`` window has an empty PARTITION BY, which
Spark plans as a SINGLE task holding the whole corpus. Instead the
classic two-phase scan:

1. range-partition by id (so partition p holds an id range wholly below
   partition p+1), compute per-partition token totals — one tiny row per
   partition;
2. cumulate those totals driver-side (thousands of rows at worst) and
   broadcast-join the per-partition base offsets back;
3. within each partition, an id-ordered window cumsum runs in parallel
   per partition; final offset = partition base + local cumsum - own.

The result is independent of the partition count or boundaries (range
partitioning only has to respect id order), so the output is
deterministic and the DuckDB oracle is the naive single-window SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def token_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, n_tokens, offset): each document's start position in the
    id-ordered concatenated token stream, via the two-phase prefix sum
    described in the module docstring."""
    from .dedup import _persist  # shared persist registry (release_cached)

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    ranged = df.select(
        F.col(id_col).alias("id"), F.col(token_col).cast("long").alias("n_tokens")
    ).repartitionByRange(num_partitions, "id")
    # persist pins ONE materialization across both consumers (the phase-1
    # totals collect and the phase-3 join): spark_partition_id is
    # recompute-sensitive, so if the input were nondeterministic on
    # recompute (sample/rand upstream, files changing between jobs) the
    # collected bases could otherwise disagree with a re-derived pid
    # assignment and offsets would be silently wrong. Released via
    # dedup.release_cached() like the other operator-internal persists.
    ranged = _persist(ranged.withColumn("pid", F.spark_partition_id()))

    # phase 1+2: per-partition totals -> running base offsets. The totals
    # frame is one row per partition (thousands at worst), so the
    # exclusive cumsum runs as a single-task window over a provably tiny
    # frame — and stays fully in-plan: no driver collect, no
    # createDataFrame round trip, one fewer job. Bases are ordered by
    # min(id), not pid (repartitionByRange assigns ascending pids, but
    # the actual id range is the invariant that matters).
    parts = ranged.groupBy("pid").agg(
        F.sum("n_tokens").alias("part_tokens"), F.min("id").alias("min_id")
    )
    wb = Window.orderBy("min_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases_df = F.broadcast(
        parts.select(
            "pid",
            F.coalesce(F.sum("part_tokens").over(wb), F.lit(0)).alias("base"),
        )
    )

    # phase 3: parallel within-partition cumsum on top of the base
    w = Window.partitionBy("pid").orderBy("id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ranged.join(bases_df, "pid")
        .withColumn("offset", F.col("base") + F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .select("id", "n_tokens", "offset")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, n_tokens, offset, first_seq, last_seq, n_seqs): which fixed-
    length training sequences each document's tokens land in. Documents
    with zero tokens get first_seq = last_seq = the sequence at their
    offset (they contribute nothing but keep a defined position)."""
    off = token_offsets(df, id_col, token_col, num_partitions)
    first_seq = F.floor(F.col("offset") / seq_len)
    last_tok = F.col("offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1
    last_seq = F.floor(last_tok / seq_len)
    return off.select(
        "id",
        "n_tokens",
        "offset",
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (last_seq - first_seq + 1).alias("n_seqs"),
    )
