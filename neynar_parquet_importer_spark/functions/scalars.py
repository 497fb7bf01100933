"""Scalar projections from the reference (SURVEY §2.3), as JVM-side exprs.

- hex0x: bytea -> '0x'+hex, the graph-edge address rendering
  (transformers/verifications.py:17-23; SQL twin schema/023:43).
- epoch_seconds_to_ts: filename epoch secs -> UTC timestamp (db.py:362).
- window_start: wall-clock alignment ``ts // dur * dur`` (main.py:286-291),
  the tumbling-window assignment used by the streaming source.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hex0x(col: Column | str) -> Column:
    """bytes -> '0x' + lowercase hex. Already-string inputs that lack the
    prefix get it added, mirroring the transformer's str branch."""
    c = F.col(col) if isinstance(col, str) else col
    hexed = F.lower(F.hex(c))
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("0x"), hexed)
    )


def epoch_seconds_to_ts(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_seconds(c)


def window_start(ts: Column | str, duration_s: int) -> Column:
    """Tumbling-window start for a timestamp column: floor(epoch/dur)*dur,
    returned as epoch seconds (bigint) for stable cross-engine comparison."""
    c = F.col(ts) if isinstance(ts, str) else ts
    epoch = F.unix_timestamp(c)
    return (F.floor(epoch / duration_s) * duration_s).cast("long")
