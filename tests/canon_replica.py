"""Local replica of the round driver's CORRECTNESS-gate compare:
sorted-by-name column mapping + order-insensitive row multiset +
scale-aware float canonicalization. test_queries_oracle.py runs every
registered query through it; test_canon_sensitivity.py mutation-audits
it (round-10 verdict #3) — each component here is proven load-bearing
by a seeded compare-layer mutant that provably MISSES a defect the
real compare catches.
"""

from __future__ import annotations

import math


def canon(v):
    """Order-insensitive value canonicalization. Floats round to 7
    SIGNIFICANT digits, capped at 6 decimals — identical to the old
    fixed 6-decimal grain for |v| < 10, strictly coarser above it, so
    the relative grain stays ~1e-6 at every magnitude. The fixed grain
    flaked at sf1 where group sums reach ~1e10 and double-summation
    error (~1e-5 absolute = 1e-15 relative) exceeds 1e-6 absolute
    (round-7 verdict #1)."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        av = abs(v)
        d = 6 if av < 10 else 6 - int(math.floor(math.log10(av)))
        r = round(v, d)
        if r == 0:
            return "0"
        s = f"{r:.{max(d, 0)}f}"
        return s.rstrip("0").rstrip(".") if "." in s else s
    if v is None:
        return "NULL"
    return str(v)


def multiset(rows, colnames, canon_fn=canon):
    """Sorted multiset of rows with columns mapped BY NAME (sorted), so
    two engines returning the same relation in different column and row
    orders compare equal. ``canon_fn`` is injectable only for the
    sensitivity audit."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(canon_fn(r[i]) for i in order) for r in rows)


def results_match(rows_a, cols_a, rows_b, cols_b, canon_fn=canon,
                  multiset_fn=multiset) -> bool:
    """The full gate predicate: column-name set, row count, and value
    multiset must all agree."""
    if sorted(cols_a) != sorted(cols_b):
        return False
    if len(rows_a) != len(rows_b):
        return False
    return multiset_fn(rows_a, cols_a, canon_fn) == multiset_fn(
        rows_b, cols_b, canon_fn
    )
