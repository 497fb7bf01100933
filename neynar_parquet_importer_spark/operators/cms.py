"""Count-min sketch: mergeable frequency summaries for hot-key and
heavy-hitter detection.

At 100 TB the question "which keys are hot?" has to be answered without
a full ``groupBy(key)`` — the skewed key IS the reason that shuffle
hurts (``operators/skew.salted_aggregate`` is the mitigation; this
module is the detector that tells you which keys need it).  A count-min
sketch compresses the full frequency table into ``depth x width``
counters: building it is one ``groupBy`` over (row, col) — at most
``depth * width`` groups regardless of key cardinality, so the shuffle
is bounded and skew-free by construction — and sketches from different
partitions/days/sources merge by plain addition.

Hashing reuses the engine-portable md5 discipline (``bloom``):
``col_i = (h1 + i*h2) mod width`` for row i (Kirsch-Mitzenmacher).
Counters are exact int64 sums, so the whole family — build, merge,
point query — is value-checkable against a SQL twin with no tolerance.

Estimates carry the classic one-sided guarantee: ``est >= true`` always
(every probe lands on a counter that includes the key's own count), and
``est <= true + eps*N`` with probability ``1 - delta`` for
``width = ceil(e/eps)``, ``depth = ceil(ln(1/delta))``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .bloom import _md5_halves


def _probe_cells(key: Column, width: int, depth: int) -> Column:
    """array<struct<row:int, col:long>> of the key's depth probe cells."""
    h1, h2 = _md5_halves(key)
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(h1 + i * h2, F.lit(width)).alias("col"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """``(row: int, col: long, cnt: long)`` — the sketch counters.

    One explode (depth rows per input row) then a groupBy over at most
    ``depth * width`` cells — map-side partial aggregation collapses
    each partition to the cell count before any shuffle, so the build
    cost is independent of how skewed the keys are.  ``weight_col``
    counts weighted occurrences (e.g. bytes per record) instead of 1.
    Sketches with the same (width, depth) merge by unioning and
    re-summing: ``cms_merge``."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    return (
        df.select(
            F.explode(
                _probe_cells(F.col(key_col).cast("string"), width, depth)
            ).alias("cell"),
            w.alias("__w"),
        )
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge same-shaped sketches by cell-wise addition (the property
    that lets per-day/per-source sketches roll up without rescanning)."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    out_col: str = "est_count",
    broadcast_sketch: bool = True,
) -> DataFrame:
    """``keys`` + ``out_col``: the count-min estimate per key — min over
    the key's depth counters, missing cells counting 0.  The sketch is
    ``depth * width`` rows (a few MB at any practical shape), so the
    probe join broadcasts; the keys side never shuffles."""
    sk = F.broadcast(sketch) if broadcast_sketch else sketch
    probes = keys.select(
        F.col(key_col),
        F.explode(
            _probe_cells(F.col(key_col).cast("string"), width, depth)
        ).alias("cell"),
    ).select(key_col, F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
    est = (
        probes.join(sk, ["row", "col"], "left")
        .select(key_col, F.coalesce("cnt", F.lit(0)).alias("__c"))
        .groupBy(key_col)
        .agg(F.min("__c").alias(out_col))
    )
    return keys.join(est, key_col, "left")


def cms_shape_for(eps: float, delta: float) -> tuple[int, int]:
    """(width, depth) for additive error eps*N at confidence 1-delta."""
    if not (0.0 < eps < 1.0 and 0.0 < delta < 1.0):
        raise ValueError(f"eps and delta must be in (0,1), got {eps}, {delta}")
    return math.ceil(math.e / eps), math.ceil(math.log(1.0 / delta))
