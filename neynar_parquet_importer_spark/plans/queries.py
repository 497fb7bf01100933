"""The engine's query surface: every operator family from SURVEY §2 plus
the training-data-pipeline extensions, each as a (spark, sf_dir) ->
DataFrame plan with a DuckDB oracle twin in ``ORACLE_SQL``.

Conventions (driver contract):
- every computed column is aliased identically in the Spark plan and the
  oracle SQL (the correctness hash sorts columns by name);
- float aggregates are rounded (2 decimals for money, 4-6 for ratios) on
  BOTH sides so cross-engine summation order can't flip the hash;
- timestamps are projected as dates or epoch bigints (the events table is
  nanosecond-precision parquet, which Spark truncates to micros — raw
  timestamp output would hash-mismatch by design, not by bug);
- queries with no SQL-expressible oracle (the xxhash64-based MinHash/
  SimHash families, seeded-LSH/IVF probes, approximate sketches) are
  registered without an ORACLE_SQL entry -> driver rows-only check,
  backed by recall/containment property tests in tests/test_operators.py.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..filters import compile_filter
from ..functions.scalars import window_start
from ..operators import audit as aud
from ..operators import bloom as blm
from ..operators import classifier as clf
from ..operators import clustering as clu
from ..operators import cms as cm
from ..operators import corpus as crp
from ..operators import dedup as dd
from ..operators import diff as dff
from ..operators import histogram as hg
from ..operators import hll as hl
from ..operators import layout as lay
from ..operators import linkage as lk
from ..operators import retrieval as rtr
from ..operators import sampling as smp
from ..operators import scd as sc2
from ..operators import similarity as sim
from ..operators import text as tx
from ..operators import timeseries as tss
from ..graph import kcore as kcr
from ..graph import khop as kh
from ..graph import lpa
from ..graph import pagerank as pgr
from ..graph import triangles as tri
from ..operators.multimodal import documents_as_media, extract_features


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _ntz_epoch_seconds(ts_col: str):
    """Epoch seconds from a TIMESTAMP_NTZ column, timezone-independent:
    an NTZ-to-NTZ timestampdiff. ``unix_timestamp(ts)`` on an NTZ column
    converts via the SESSION timezone — every query here must use this
    form instead so results don't silently depend on session.py pinning
    UTC (tests flip the session TZ to prove it)."""
    return F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {ts_col})"
    )



# Per-corpus derived-artifact memos, ALL defined here on the spine:
# the reset functions and every registry chunk mutate these dicts in
# place through this single shared binding (hoisted when the registry
# split into chunk modules, so no chunk forward-references another).
_EMB_DIM_CACHE: dict[tuple, int] = {}
_EMB_COUNT_CACHE: dict[tuple, int] = {}
_HOT_SHINGLE_CACHE: dict[tuple, list[int]] = {}
_IVF_CENTROID_CACHE: dict[tuple, list[list[float]]] = {}
_PQ_CODEBOOK_CACHE: dict[tuple, list] = {}
_KMEANS_CENT_CACHE: dict[tuple, list[list[float]]] = {}
_ARTIFACT_ORACLE_CACHE: dict[tuple, dict[str, str]] = {}
_PCA_MODEL_CACHE: dict[tuple, tuple] = {}
_BPE_MERGE_CACHE: dict[tuple, list] = {}
_BPE_STABLE_CACHE: dict[tuple, dict] = {}
_BPE_ORACLE_MERGE_CACHE: dict[tuple, list] = {}


# --- registry chunks (split round 9): imported in original definition order
# so QUERIES/ORACLE_SQL registration side-effects replay exactly; every chunk
# name is then re-exported here so existing `from plans.queries import X`
# call sites (tests, bench, scale_study, mutation_audit) keep working.
from . import q_relational, q_text_dedup, q_embed_pipeline, q_oracle_static, q_oracle_artifact, q_trained  # noqa: E402

def _benign_dup(a, b) -> bool:
    """Same object, or comparably-equal values (two chunks each defining
    `_EPS = 1e-9` is fine). Functions/classes compare by identity, so a
    helper *re-defined* in a second chunk — the silent first-wins mask
    the round-9 advisor flagged — is NOT benign and raises below."""
    if a is b:
        return True
    try:
        return bool(a == b)
    except Exception:
        return False


_origin: dict[str, str] = {}
for _chunk in (q_relational, q_text_dedup, q_embed_pipeline, q_oracle_static, q_oracle_artifact, q_trained):
    for _k, _v in vars(_chunk).items():
        if _k.startswith('__'):
            continue
        if _k in globals() and not _benign_dup(globals()[_k], _v):
            raise ImportError(
                f"registry chunk collision: {_k!r} is defined with divergent "
                f"values in both {_origin.get(_k, 'the spine')} and "
                f"{_chunk.__name__} — rename one or hoist the shared helper"
            )
        if _k not in globals():
            _origin[_k] = _chunk.__name__
            globals()[_k] = _v
del _chunk, _k, _v, _origin
