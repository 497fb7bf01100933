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


def uuid16_to_string(col: Column | str) -> Column:
    """16-byte uuid (parquet fixed_size_binary[16], arrow.uuid extension —
    the PK type of every v3 table, SURVEY §1.2) -> canonical hyphenated
    lowercase string. Pure JVM: hex + substrings."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.lower(F.hex(c))
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat_ws(
            "-",
            F.substring(h, 1, 8),
            F.substring(h, 9, 4),
            F.substring(h, 13, 4),
            F.substring(h, 17, 4),
            F.substring(h, 21, 12),
        )
    )


def epoch_seconds_to_ts(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_seconds(c)


def window_start(ts: Column | str, duration_s: int) -> Column:
    """Tumbling-window start for a timestamp column: floor(epoch/dur)*dur,
    returned as epoch seconds (bigint) for stable cross-engine comparison.
    Epoch seconds come from an NTZ-to-NTZ timestampdiff so the alignment
    is timezone-independent (``unix_timestamp`` on a TIMESTAMP_NTZ column
    converts via the session zone and would shift window boundaries under
    a non-UTC session)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    epoch = F.timestamp_diff(
        "SECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        c.cast("timestamp_ntz"),
    )
    return (F.floor(epoch / duration_s) * duration_s).cast("long")
