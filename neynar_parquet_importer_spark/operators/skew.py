"""Skew-handling aggregation strategies.

AQE's skew-join splitting (enabled in session.py) covers joins, but a
grouped aggregation over a power-law key (one user generating 30% of
events — the shape of social data like the reference's casts/reactions
tables) still funnels one group into one reduce task. Salting splits the
hot group across ``salt`` sub-keys, aggregates partials, then combines:
two small shuffles instead of one straggler.

Only ALGEBRAIC aggregates decompose this way (sum/count/min/max, and
avg as sum+count); the API takes (partial, final) expression pairs so
composition stays explicit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase grouped aggregation with a random salt on the first
    shuffle.

    ``partial_aggs`` run per (keys, salt) group; ``final_aggs`` combine
    the partials per keys. E.g. a skew-proof count+sum:

        salted_aggregate(
            ev, ["event_type"],
            [F.count(F.lit(1)).alias("pc"), F.sum("value").alias("ps")],
            [F.sum("pc").alias("n"), F.sum("ps").alias("total")],
        )

    The salt column is internal (never leaves the function). rand() here
    does not break determinism of the RESULT — any salt assignment
    combines to the same totals — only of the intermediate partition
    layout. The second shuffle carries at most |groups| * salt rows.
    """
    salted = df.withColumn("__salt", (F.rand(seed=7) * salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
