"""Scan-parallelism floor for compute-dense operators.

Spark sizes scan tasks by BYTES (``maxPartitionBytes`` splits, packed at
row-group granularity), which is the right model when cost is
proportional to bytes read. The similarity/linkage/graph operators break
that model: a kilobyte-scale dimension frame can fan out into millions
of candidate pairs inside the very first stage (a broadcast-join probe,
an explode, a wedge join), so a single-row-group parquet file — one
split, one task — serializes the whole quadratic core on one core no
matter how many the cluster has.

``fan_out`` is the operator-side fix (optimization guide §2.5/§8: use
what you know that the optimizer does not — here, that downstream cost
is super-linear in rows, not bytes): round-robin repartition the frame
to the cluster's default parallelism, but ONLY when its physical plan
has fewer partitions than that. At 100 TB the same frame arrives with
thousands of scan splits and the helper is a no-op — the condition makes
it scale-adaptive rather than a local[32] constant. Where it does fire,
the exchange moves only the small frame itself (KBs), which the probe
stage was going to stream anyway.

Only meaningful for SCAN-ROOTED frames: a frame downstream of an
exchange reports the pre-AQE shuffle width (so the helper no-ops) while
AQE may still coalesce it at runtime — shuffle-rooted parallelism is
governed by the AQE coalescing floor in session.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """``df`` with at least ``target`` (default: cluster default
    parallelism) partitions; unchanged when it already has them."""
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
