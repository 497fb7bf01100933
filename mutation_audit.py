"""Twin-sensitivity mutation audit (round-9 verdict #1).

The correctness gate rests on 168 DuckDB oracle twins, 14 of which are
artifact/replay oracles that share authorship with the engine. "Twins
agree" only proves correctness if the harness would actually FAIL when
the engine regresses — so this audit proves detection: for each
artifact/replay family it injects ONE deliberate engine-side mutation
(off-by-one in a count, a flipped sign, a dropped canonicalization — the
classic mutation-testing operators) behind a test-only monkeypatch, runs
the family's twin with the gate's own comparison (row count, column
names, canonicalized value multiset), and records that the twin KILLS
the mutant. The patch is reverted and the clean twin re-verified, so the
audit leaves the process as it found it.

Design constraints honored:
- Mutations target the part of the engine the oracle INDEPENDENTLY
  replays. Trainer cores documented as shared-by-construction
  (``spherical_kmeans_core``, ``pq_codebooks_core``, ``pca_core`` — one
  numpy path so artifact floats are bitwise identical) are out of scope
  BY DESIGN and recorded as such in ``SHARED_CORE_EXCLUSIONS``: a bug
  there moves both sides identically and no twin of this construction
  can see it. Everything downstream (distributed assignment, probe
  selection, iteration counts, sketch sizes, hash/rank arithmetic) is
  independently replayed and therefore in scope.
- Oracle SQL is built (and its generator caches warmed) BEFORE any
  patch is applied, so a mutation can never leak into the oracle side.
- Engine model memos are dropped around every leg
  (``reset_model_caches``) so a mutant actually retrains where the
  family caches trained artifacts (BPE).

Usage:
    python mutation_audit.py                 # all families at sf0.01,
                                             # merges BENCH_SCALING.json
    python mutation_audit.py --sf DIR --families bpe,kmv --no-record

The pytest leg (tests/test_twin_sensitivity.py) runs the same table at
the suite's sf0.001 so a future harness change that silently blinds a
twin fails CI, not just the recorded artifact.
"""

from __future__ import annotations

import importlib
import json
import math
import os
import time

from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Gate-replica comparison (same canon as tests/test_queries_oracle.py:
# floats to 7 significant digits capped at 6 decimals, None -> "NULL",
# columns sorted by name, order-insensitive row multiset)
# ---------------------------------------------------------------------------


def _canon(v):
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


def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare_twin(spark, duck, name, sf_dir, oracle_sql) -> dict:
    """One gate-style comparison: {rows_match, schema_match, hash_match}."""
    from neynar_parquet_importer_spark.plans.queries import QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns
    rel = duck.sql(oracle_sql[name])
    duck_rows = rel.fetchall()
    duck_cols = rel.columns
    schema_match = sorted(spark_cols) == sorted(duck_cols)
    rows_match = len(spark_rows) == len(duck_rows)
    hash_match = (
        rows_match
        and schema_match
        and _multiset(spark_rows, spark_cols) == _multiset(duck_rows, duck_cols)
    )
    return {
        "rows_match": rows_match,
        "schema_match": schema_match,
        "hash_match": hash_match,
    }


# ---------------------------------------------------------------------------
# The mutant table: one deliberate engine-side bug per twin family
# ---------------------------------------------------------------------------

_PKG = "neynar_parquet_importer_spark"


def _neg(cents):
    return [[-float(x) for x in c] for c in cents]


def _w_ivf(orig):
    # flipped sign in the centroid matrix the DISTRIBUTED assignment
    # sees: every row lands in its FARTHEST cell
    def mutant(vec_col, centroids):
        return orig(vec_col, _neg(centroids))

    return mutant


def _w_pq(orig):
    # wrong subspace offset: codes index a REVERSED codebook order while
    # the ADC distance table stays in learned order
    def mutant(df, codebooks, *a, **k):
        return orig(df, list(codebooks)[::-1], *a, **k)

    return mutant


def _w_lsh(orig):
    # engine drifts off the pinned artifact: planes regenerate from the
    # wrong seed, so bucket membership disagrees with the oracle's
    # embedded plane literals
    def mutant(dim, n_planes, seed=42):
        return orig(dim, n_planes, seed + 1)

    return mutant


def _w_pca(orig):
    # dropped canonicalization: projection skips mean-centering
    def mutant(vec, mean, comp):
        return orig(vec, [0.0] * len(mean), comp)

    return mutant


def _w_bpe(orig):
    # off-by-one in the merge count: the learned table loses its last row
    def mutant(df, text_col, n_merges, *a, **k):
        return orig(df, text_col, n_merges - 1, *a, **k)

    return mutant


def _w_kmeans(orig):
    # flipped sign in the centroids the distributed assigner uses
    def mutant(df, centroids, *a, **k):
        return orig(df, _neg(centroids), *a, **k)

    return mutant


def _w_pagerank(orig):
    # off-by-one iteration count
    def mutant(edges, n_iter=5, *a, **k):
        return orig(edges, n_iter - 1, *a, **k)

    return mutant


def _w_lpa(orig_F):
    # flipped comparison in the label-update aggregate (struct-MAX ->
    # struct-MIN: least-common neighbor label, largest on ties). An
    # iteration-count mutation is EQUIVALENT on this corpus — the
    # co-supplier graph is complete, so LPA converges in one round —
    # which is itself a finding the audit records; the flipped
    # aggregate diverges in round 1 on any graph with >= 2 labels.
    class _FlippedF:
        def __getattr__(self, name):
            return getattr(orig_F, name)

        @staticmethod
        def max(col):
            return orig_F.min(col)

    return _FlippedF()


def _w_kcore(orig):
    # peel threshold doubled. +-1 threshold mutations are EQUIVALENT on
    # this corpus (complete co-supplier graph: every degree is N-1, so
    # every k <= N-1 keeps everything) — recorded as a finding; the
    # derived k is ~0.7*(N-1), so 2k > N-1 empties the core at every
    # scale and the counts/checksum must move.
    def mutant(edges, k, *a, **kw):
        return orig(edges, 2 * k, *a, **kw)

    return mutant


def _w_kmv(orig):
    # off-by-one sketch size: keep k-1 smallest hashes. Checked on the
    # returnflag-overlap query whose per-flag key sets FILL the sketch
    # at every test scale (the buyers-per-segment sketch holds < k keys
    # at sf<=0.01, where sketch size is provably unobservable: an
    # unfilled KMV sketch IS the exact distinct set).
    def mutant(df, key_col, group_cols=None, k=128, *a, **kw):
        return orig(df, key_col, group_cols, k - 1, *a, **kw)

    return mutant


def _w_lm(orig):
    # wrong smoothing mass: add-k/2 instead of add-k
    def mutant(df, text_col, id_col, k_smooth=0.5, **kw):
        return orig(df, text_col, id_col, k_smooth * 0.5, **kw)

    return mutant


def _w_hll(orig):
    # rho off-by-one: the classic leading-zero-count bug
    def mutant(key, p):
        bucket, rho = orig(key, p)
        return bucket, (rho + F.lit(1)).alias("rho")

    return mutant


def _w_winnow(orig):
    # window off-by-one: selects ~2/(w+2) of the grams instead of 2/(w+1)
    def mutant(docs, text_col="text", id_col="doc_id", k=5, w=4):
        return orig(docs, text_col, id_col, k, w + 1)

    return mutant


def _w_zorder(orig):
    # transposed interleave: y gets the even bit lanes
    def mutant(x, y, bits=16):
        return orig(y, x, bits)

    return mutant


MUTANTS: list[dict] = [
    dict(family="ivf", query="embedding_ivf_topk",
         module=f"{_PKG}.operators.similarity", attr="ivf_assign",
         mutation="assignment dots a sign-flipped centroid matrix "
                  "(rows land in their farthest cell)", wrap=_w_ivf),
    dict(family="pq", query="embedding_pq_topk",
         module=f"{_PKG}.operators.similarity", attr="pq_assign_frame",
         mutation="codes assigned against reversed codebook order while "
                  "the ADC table keeps learned order", wrap=_w_pq),
    dict(family="lsh", query="embedding_lsh_topk",
         module=f"{_PKG}.operators.similarity", attr="make_planes",
         mutation="hyperplanes regenerate from seed+1 (engine drifts off "
                  "the pinned plane artifact)", wrap=_w_lsh),
    dict(family="pca", query="pca_component_variance",
         module=f"{_PKG}.operators.pca", attr="_centered_dot",
         mutation="projection drops mean-centering", wrap=_w_pca),
    dict(family="bpe", query="bpe_learned_merges",
         module=f"{_PKG}.operators.bpe", attr="bpe_learn",
         mutation="off-by-one merge count (table loses its last merge)",
         wrap=_w_bpe),
    dict(family="kmeans", query="kmeans_corpus_clusters",
         module=f"{_PKG}.operators.clustering", attr="kmeans_assign",
         mutation="distributed assignment dots a sign-flipped centroid "
                  "matrix", wrap=_w_kmeans),
    dict(family="pagerank", query="pagerank_supplier_rank",
         module=f"{_PKG}.graph.pagerank", attr="pagerank",
         mutation="off-by-one iteration count (4 instead of 5)",
         wrap=_w_pagerank),
    dict(family="lpa", query="lpa_supplier_communities",
         module=f"{_PKG}.graph.lpa", attr="F",
         mutation="flipped label-update aggregate (struct-max -> "
                  "struct-min)", wrap=_w_lpa),
    dict(family="kcore", query="kcore_supplier_stats",
         module=f"{_PKG}.graph.kcore", attr="kcore_edges",
         mutation="peel threshold doubled while reporting the clean k",
         wrap=_w_kcore),
    dict(family="kmv", query="kmv_returnflag_part_overlap",
         module=f"{_PKG}.operators.kmv", attr="kmv_sketch",
         mutation="off-by-one sketch size (k-1 smallest hashes kept)",
         wrap=_w_kmv),
    dict(family="lm", query="lm_source_perplexity",
         module=f"{_PKG}.operators.lm", attr="doc_nll",
         mutation="half the add-k smoothing mass (0.25 instead of 0.5)",
         wrap=_w_lm),
    dict(family="hll", query="hll_register_union",
         module=f"{_PKG}.operators.hll", attr="_bucket_and_rank",
         mutation="rho off-by-one (every register inflated by 1); "
                  "checked on the register-checksum query — the "
                  "estimate-only queries sit in the small-range regime "
                  "at test scale, where the estimate depends only on "
                  "bucket occupancy and is provably rho-insensitive",
         wrap=_w_hll),
    dict(family="winnow", query="winnow_fingerprint_stats",
         module=f"{_PKG}.operators.dedup", attr="winnow_fingerprints",
         mutation="window off-by-one (w=5 instead of 4)", wrap=_w_winnow),
    dict(family="zorder", query="zorder_write_audit",
         module=f"{_PKG}.operators.layout", attr="morton_z",
         mutation="transposed bit interleave (x and y lanes swapped)",
         wrap=_w_zorder),
]

# Shared numpy trainer cores the oracle generators use BY CONSTRUCTION
# ("bitwise identical floats" — see _ivf_topk_oracle_sql et al.): a bug
# inside these moves engine and oracle together, so no twin of this
# construction detects it. Recorded honestly as the audit's scope edge;
# their outputs are property-tested separately (tests/test_operators.py)
# and everything DOWNSTREAM of them is covered by the mutants above.
SHARED_CORE_EXCLUSIONS = {
    "ivf": "operators/similarity.py:spherical_kmeans_core",
    "pq": "operators/similarity.py:pq_codebooks_core + pq_adc_table",
    "pca": "operators/pca.py:pca_core",
}


def _patched(entry, on: bool, originals: dict):
    mod = importlib.import_module(entry["module"])
    key = (entry["module"], entry["attr"])
    if on:
        originals[key] = getattr(mod, entry["attr"])
        setattr(mod, entry["attr"], entry["wrap"](originals[key]))
    else:
        setattr(mod, entry["attr"], originals.pop(key))


def audit_family(spark, duck, entry, sf_dir, oracle_sql) -> dict:
    """clean-match -> mutate -> must-fail -> restore -> clean-match."""
    from neynar_parquet_importer_spark.plans.queries import reset_model_caches

    name = entry["query"]
    originals: dict = {}
    t0 = time.time()
    reset_model_caches()
    clean = compare_twin(spark, duck, name, sf_dir, oracle_sql)
    mutant = None
    try:
        _patched(entry, True, originals)
        reset_model_caches()
        mutant = compare_twin(spark, duck, name, sf_dir, oracle_sql)
    finally:
        if originals:
            _patched(entry, False, originals)
        reset_model_caches()
    detected_by = [k for k, ok in (mutant or {}).items() if not ok]
    return {
        "family": entry["family"],
        "query": name,
        "target": f"{entry['module'].removeprefix(_PKG + '.')}."
                  f"{entry['attr']}",
        "mutation": entry["mutation"],
        "clean_match": all(clean.values()),
        "killed": bool(mutant) and not all(mutant.values()),
        "detected_by": detected_by,
        "sec": round(time.time() - t0, 1),
    }


def run_audit(spark, sf_dir, families=None) -> dict:
    """The kill table: one row per family, plus the documented scope
    exclusions. Any row with killed=False is a harness hole."""
    import duckdb

    from neynar_parquet_importer_spark.catalog import TESTDATA_TABLE_NAMES
    from neynar_parquet_importer_spark.plans.queries import (
        ORACLE_SQL,
        build_artifact_oracles,
    )

    # oracle side fully built (and its generator caches warmed) BEFORE
    # any engine patch exists
    oracle_sql = {**ORACLE_SQL, **build_artifact_oracles(sf_dir)}
    duck = duckdb.connect()
    try:
        for t in TESTDATA_TABLE_NAMES:
            duck.sql(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        rows = [
            audit_family(spark, duck, e, sf_dir, oracle_sql)
            for e in MUTANTS
            if families is None or e["family"] in families
        ]
    finally:
        duck.close()
    return {
        "sf_dir": sf_dir,
        "mutants": rows,
        "killed": sum(r["killed"] for r in rows),
        "total": len(rows),
        "shared_core_exclusions": SHARED_CORE_EXCLUSIONS,
    }


if __name__ == "__main__":
    import sys

    from neynar_parquet_importer_spark.session import get_spark

    sf = "/root/testdata/sf0.01"
    families = None
    record = True
    argv = sys.argv[1:]
    while argv:
        a = argv.pop(0)
        if a == "--sf":
            sf = argv.pop(0)
        elif a == "--families":
            families = set(argv.pop(0).split(","))
        elif a == "--no-record":
            record = False
        else:
            raise SystemExit(f"unknown arg {a}")
    spark = get_spark(
        app_name="mutation-audit",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    table = run_audit(spark, sf, families)
    print(json.dumps(table, indent=1))
    if record and families is None and os.path.exists("BENCH_SCALING.json"):
        with open("BENCH_SCALING.json") as f:
            payload = json.load(f)
        checks = payload.setdefault("checks", {})
        checks["twin_sensitivity"] = table
        checks["twin_sensitivity_run_at"] = time.strftime("%Y%m%dT%H%M%S")
        with open("BENCH_SCALING.json", "w") as f:
            json.dump(payload, f, indent=1)
        print("merged into BENCH_SCALING.json checks.twin_sensitivity")
