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


def hex0x(col: Column | str, *, input_is_hex_string: bool = False) -> Column:
    """bytes -> '0x' + lowercase hex.

    ``input_is_hex_string=True`` mirrors the reference transformer's str
    branch (an ALREADY-HEX string gets lowercased and prefixed if the
    prefix is missing). The flag is explicit because the Column API
    can't branch on input type, and ``F.hex`` applied to a StringType
    column hex-encodes the string's UTF-8 BYTES — a silent double
    encoding ('abc1' -> '0x61626331'), which an earlier docstring here
    wrongly described as prefix-adding. Every in-repo caller passes the
    binary address column (default path)."""
    c = F.col(col) if isinstance(col, str) else col
    if input_is_hex_string:
        low = F.lower(c)
        rendered = F.when(
            low.startswith("0x"), low
        ).otherwise(F.concat(F.lit("0x"), low))
    else:
        rendered = F.concat(F.lit("0x"), F.lower(F.hex(c)))
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(rendered)


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
