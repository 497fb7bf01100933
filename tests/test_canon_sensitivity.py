"""Mutation audit of the COMPARE layer itself (round-10 verdict #3).

The 14-mutant engine audit (mutation_audit.py) proves the oracle twins
DETECT engine bugs; nothing there proved the shared canonicalization /
multiset compare (tests/canon_replica.py — the local replica of the
driver gate's sorted-column, 6-decimal-grain hash) would catch a
compare-side bug. This file seeds compare-layer mutants — each removing
one component of the compare — and pairs each with a synthetic defect
that the REAL compare provably catches while the MUTANT provably
misses. A mutant is *killed* when both halves hold: that component is
load-bearing, not ceremony.

Also pinned: the tolerances the compare is REQUIRED to grant (row
order, column order, sub-grain float drift, -0.0) still pass, so the
audit cannot be gamed by an over-strict compare that fails everything.

``run_audit()`` returns the kill table; scale_study --canon-sensitivity
records it as BENCH_SCALING.checks.canon_sensitivity, and the pytest
wrappers re-prove the kills on every suite run (the
test_twin_sensitivity.py discipline).
"""

from __future__ import annotations

from canon_replica import canon, multiset, results_match


# --- seeded mutants: each deletes ONE compare component ------------------

def _canon_2dec(v):
    """Mutant: fixed 2-decimal rounding (coarsened grain)."""
    if isinstance(v, float):
        return f"{round(v, 2):.2f}"
    if v is None:
        return "NULL"
    return str(v)


def _multiset_drop_last_col(rows, colnames, canon_fn=canon):
    """Mutant: drops the alphabetically-last column before hashing."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])[:-1]
    return sorted(tuple(canon_fn(r[i]) for i in order) for r in rows)


def _multiset_as_set(rows, colnames, canon_fn=canon):
    """Mutant: compares the row SET — duplicate counts vanish."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted({tuple(canon_fn(r[i]) for i in order) for r in rows})


def _multiset_positional(rows, colnames, canon_fn=canon):
    """Mutant: maps columns by arrival position instead of sorted name."""
    return sorted(tuple(canon_fn(v) for v in r) for r in rows)


# --- paired defects: caught by the real compare, missed by the mutant ----

_COLS = ["amount", "zkey"]
_BASE = [(0.1234, 7), (10.5, 3), (10.5, 3)]

_DEFECTS = {
    # sub-2-decimal float drift: 0.1234 -> 0.1239 (5e-4, well above the
    # real ~1e-6 relative grain, far below the mutant's 1e-2)
    "coarse_round_2dec": (
        _BASE,
        [(0.1239, 7), (10.5, 3), (10.5, 3)],
    ),
    # corruption confined to the alphabetically-LAST column
    "drop_last_column": (
        _BASE,
        [(0.1234, 8), (10.5, 3), (10.5, 3)],
    ),
    # same row set and same row count, different duplicate counts
    "set_not_multiset": (
        [(0.1234, 7), (0.1234, 7), (10.5, 3)],
        [(0.1234, 7), (10.5, 3), (10.5, 3)],
    ),
}

# the positional mutant's defect needs differing column ORDERS: the
# oracle returns (zkey, amount) with values swapped to match — real
# name-mapping catches the semantic swap; positional pairing sees
# identical tuples
_POS_A = (_BASE, _COLS)
_POS_B = ([(0.1234, 7), (10.5, 3), (10.5, 3)], ["zkey", "amount"])

_MUTANTS = {
    "coarse_round_2dec": dict(canon_fn=_canon_2dec),
    "drop_last_column": dict(multiset_fn=_multiset_drop_last_col),
    "set_not_multiset": dict(multiset_fn=_multiset_as_set),
    "positional_columns": dict(multiset_fn=_multiset_positional),
}


def run_audit() -> dict:
    out: dict = {}
    for name, kw in _MUTANTS.items():
        if name == "positional_columns":
            (rows_a, cols_a), (rows_b, cols_b) = _POS_A, _POS_B
        else:
            rows_a, rows_b = _DEFECTS[name]
            cols_a = cols_b = _COLS
        real_detects = not results_match(rows_a, cols_a, rows_b, cols_b)
        mutant_misses = results_match(rows_a, cols_a, rows_b, cols_b, **kw)
        out[name] = {
            "real_compare_detects_defect": real_detects,
            "mutant_misses_defect": mutant_misses,
            "killed": real_detects and mutant_misses,
        }
    # required tolerances: the real compare must GRANT these (an
    # everything-fails compare would trivially "kill" all mutants)
    rows = [(1.0, 2), (3.0, 4)]
    out["tolerances"] = {
        "row_order": results_match(
            rows, _COLS, list(reversed(rows)), _COLS
        ),
        "column_order": results_match(
            rows, _COLS, [(2, 1.0), (4, 3.0)], ["zkey", "amount"]
        ),
        "sub_grain_float_drift": results_match(
            [(1.0e10, 1)], _COLS, [(1.0e10 + 1e-4, 1)], _COLS
        ),
        "negative_zero": results_match(
            [(-0.0, 1)], _COLS, [(0.0, 1)], _COLS
        ),
        "all_granted": None,  # filled below
    }
    tol = out["tolerances"]
    tol["all_granted"] = all(
        v for k, v in tol.items() if k != "all_granted"
    )
    out["n_mutants"] = len(_MUTANTS)
    out["n_killed"] = sum(
        1 for k in _MUTANTS if out[k]["killed"]
    )
    return out


def test_all_compare_mutants_killed():
    audit = run_audit()
    assert audit["n_killed"] == audit["n_mutants"], audit


def test_required_tolerances_granted():
    audit = run_audit()
    assert audit["tolerances"]["all_granted"], audit["tolerances"]


def test_canon_is_the_harness_canon():
    """The audited functions must BE the oracle harness's compare (a
    drifted copy would audit dead code)."""
    import test_queries_oracle as tqo

    assert tqo._canon is canon
    assert tqo._multiset is multiset
