"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints the
full JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...} followed by a compact FINAL line
(same contract fields; queries = the TPC-H core, plus per-family
subtotals over all timed queries) sized to fit whole inside the round
driver's ~2.2 KB stdout-tail capture.

Each query is executed to completion (count() of the result — forces the
full plan without driver-side materialization of wide rows). A warmup
run of q1 absorbs JVM/codegen startup so per-query numbers reflect
steady-state execution.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from neynar_parquet_importer_spark.operators.dedup import release_cached
from neynar_parquet_importer_spark.plans.queries import (
    QUERIES,
    reset_model_caches,
    reset_shingle_cache,
)
from neynar_parquet_importer_spark.session import get_spark

# Queries whose cost is dominated by a TRAINED in-process artifact
# (BPE merge table, k-means/IVF centroids, PQ codebooks, PCA basis, LSH
# planes+dim probe) memoized across passes in plans.queries. Min-of-N
# with the memo warm measures cache state, not code (r7 verdict #4), so
# the bench times these twice per pass: a COLD run right after
# reset_model_caches() (training included) and a WARM run with the memo
# populated (the documented train-once/reuse production path). The
# headline `queries`/`value` keep the warm figure — comparable with
# r<=7, whose min-of-3 was warm — and the cold figure is emitted
# alongside (full line + per-family in the tail line).
ARTIFACT_TRAINED = {
    "embedding_lsh_topk": "lsh",
    "embedding_ivf_topk": "ivf",
    "embedding_ivf_knn_join": "ivf",
    "embedding_pq_topk": "pq",
    "kmeans_corpus_clusters": "kmeans",
    "kmeans_domain_profile": "kmeans",
    "pca_label_compression": "pca",
    "pca_component_variance": "pca",
    "bpe_learned_merges": "bpe",
    "bpe_token_compression": "bpe",
    "bpe_stable_merges": "bpe",
}

# Queries that consume the per-corpus hot-shingle memo
# (plans._hot_shingles_cached): the driver-side stop-shingle list is
# computed once per (corpus, cap) per process, so min-of-N with the memo
# warm excludes a full corpus shingle aggregation from the timed region
# (r10 verdict "What's wrong #1": the memo grew from one consumer to
# eight with no cold leg recorded). Round-11 measurement fix — NOT a
# change to what any query computes: these are timed with the same
# cold/warm split as ARTIFACT_TRAINED, the cold leg paying the hot-list
# aggregation after reset_shingle_cache() (only that memo — the
# trained-model and dim-probe memos of OTHER queries stay warm). The
# headline `queries`/`value` keep the WARM figure, matching what r9/r10
# measured for these names, so round-over-round totals stay comparable;
# the cold figures land in artifact_cold_warm + the tail's cold_warm
# under family "shingle".
CORPUS_TRAINED = {
    "dedup_ngram_jaccard": "shingle",
    "dedup_ngram_jaccard_allpairs": "shingle",
    "dedup_clusters": "shingle",
    "contrastive_triplets": "shingle",
    "source_near_dup_matrix": "shingle",
    "split_leakage_pairs": "shingle",
    "split_cluster_safe": "shingle",
    "soft_dedup_weights": "shingle",
}

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_nation_revenue",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    "q2_min_cost_supplier",
    "q11_important_part_value",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q20_excess_shippers",
    "q21_late_shippers",
    "filter_dsl_in_gt",
    "filter_dsl_and_or",
    "backfill_time_range",
    "events_value_delta",
    "cube_order_stats",
    "distinct_buyers_per_segment",
    "semi_join_buyers",
    "anti_join_never_urgent",
    "window_topn_per_group",
    "top1_order",
    "set_intersect_buyers",
    "set_except_no_orders",
    "hex_projection",
    "graph_nodes",
    "dedup_ngram_jaccard",
    "join_left_ordered_agg",
    "latest_event_per_user",
    "tumbling_event_counts",
    "sessionize_events",
    "rollup_revenue",
    "range_join_shipments",
    "asof_latest_order_per_event",
    "exists_late_shipment_orders",
    "scalar_subquery_small_quantity_revenue",
    "moving_avg_user_value",
    "percentile_price_by_flag",
    "corr_price_quantity",
    "ntile_balance_quartiles",
    "pivot_revenue_by_year",
    "salted_event_stats",
    "sketch_order_stats",
    "q15_top_supplier",
    "q12_priority_shipping",
    "balance_distribution_by_segment",
    "user_first_last_event",
    "orders_export_sorted",
    "cohort_retention",
    "unigram_logprob_score",
    "bigram_logprob_score",
    "embedding_near_dup_pairs",
    "embedding_dedup_clusters",
    "embedding_dedup_clusters_lsh",
    "embedding_near_dup_lsh",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard_allpairs",
    "dedup_clusters",
    "dedup_simhash",
    "passage_dedup_docs",
    "boilerplate_chunk_removal",
    "epoch_shuffle_docs",
    "doc_novelty",
    "pack_training_sequences",
    "table_profile_orders",
    "events_interval_pairs",
    "weighted_sample_docs",
    "text_token_count",
    "text_quality",
    "text_lang_id",
    "text_fingerprint",
    "text_repetition",
    "text_pii_redaction",
    "text_gopher_repetition",
    "text_substring_dup_stats",
    "embedding_cosine_scores",
    "embedding_topk",
    "embedding_lsh_topk",
    "embedding_ivf_topk",
    "embedding_pq_topk",
    "embedding_semdedup",
    "embedding_knn_join",
    "json_extract_sum",
    "graph_edges",
    "graph_degrees",
    "multimodal_features",
    "sample_docs_hash",
    "train_val_test_counts",
    "split_leakage_pairs",
    "split_cluster_safe",
    "soft_dedup_weights",
    "bloom_incremental_dedup",
    "bloom_words_profile",
    "hll_distinct_users",
    "hll_register_union",
    "hll_intersection_users",
    "bm25_topk_docs",
    "bm25_term_stats",
    "cosupplier_triangle_stats",
    "cosupplier_triangle_nodes",
    "event_funnel_steps",
    "snapshot_diff_orders",
    "lpa_supplier_communities",
    "zorder_events_profile",
    "event_transition_matrix",
    "copurchase_part_pairs",
    "kcore_supplier_stats",
    "sliding_event_counts",
    "embedding_sq8_topk",
    "quality_classifier_scores",
    "heavy_hitters_cms",
    "lang_label_confusion",
    "contrastive_negative_samples",
    "contrastive_triplets",
    "source_near_dup_matrix",
    "length_curriculum_buckets",
    "stratified_sample_by_lang",
    "domain_capped_sample",
    "contamination_vs_benchmark",
    "kmv_distinct_buyers_per_segment",
    "kmv_returnflag_part_overlap",
    "lm_surprising_docs",
    "lm_source_perplexity",
    "pca_label_compression",
    "pca_component_variance",
    "bpe_learned_merges",
    "bpe_token_compression",
    "top_trigrams",
    "tfidf_top_terms",
    "token_count_histogram",
    "lang_mixing_weights",
    "lang_mixing_temperature",
    "dsir_importance_weights",
    "rag_passage_windows",
    "quality_filter_funnel",
    "embedding_norm_stats",
    "pretrain_curated_docs",
    "pretrain_corpus_summary",
    "kmeans_corpus_clusters",
    "kmeans_domain_profile",
    "winnow_plagiarism_pairs",
    "winnow_fingerprint_stats",
    "pagerank_supplier_rank",
    # round-6 fifth pass: resample/gap-fill, SCD2, quality audit, fuzzy
    # linkage, k-hop BFS
    "events_daily_resampled",
    "user_scd2_type_history",
    "orders_quality_audit",
    "fuzzy_customer_linkage",
    "linkage_self_match_rate",
    "khop_supplier_reach",
    "event_value_quantile_hist",
    # round-6 sixth pass: exact prefix-filter set-similarity join +
    # hybrid lexical/dense retrieval fusion + asymmetric containment
    "dedup_prefix_filter_pairs",
    "prefix_filter_candidate_stats",
    "hybrid_rrf_topk",
    "dedup_containment_pairs",
    "passjoin_doc_prefix_pairs",
    # round-7: measured dispatch, the z-order write path, batch ANN
    "fuzzy_linkage_auto_dispatch",
    "zorder_write_audit",
    "embedding_ivf_knn_join",
    # round-8: the measured finer-key linkage mitigation (distinct-text
    # two-pass blocking, sf0.1->sf1 exponent 0.10 vs 1.95 nation-block)
    "fuzzy_customer_linkage_fine_block",
    # round-10: the three-way dispatch decision row (budgets + argmin)
    "linkage_dispatch_3way",
    # round-9: the sequential-doubling sample validator as a gate query
    "bpe_stable_merges",
]


_TPCH_RE = re.compile(r"^q\d+_")

_FAMILY_PREFIXES = [
    ("embedding_", "embedding"),
    ("kmeans_", "embedding"),
    ("pca_", "embedding"),
    ("dedup_", "dedup"),
    # the two round-6 cluster ops only: split_leakage_pairs predates the
    # family map and stays 'relational' so cross-round subtotal diffs of
    # the tail line aren't perturbed by a reclassification
    ("split_cluster_", "dedup"),
    ("soft_dedup_", "dedup"),
    ("bloom_", "dedup"),
    ("winnow_", "dedup"),
    ("prefix_filter_", "dedup"),
    ("passjoin_", "dedup"),
    ("quality_classifier_", "text"),
    ("text_", "text"),
    ("lang_", "lang"),
    ("lm_", "text"),
    ("bpe_", "text"),
    ("contrastive_", "contrastive"),
    ("pretrain_", "pretrain"),
    ("graph_", "graph"),
    ("pagerank_", "graph"),
    ("filter_dsl", "filters"),
]


def _family(name: str) -> str:
    """Coarse query family for the tail-line subtotals: TPC-H core, the
    LLM-pipeline families by prefix, everything else 'relational'."""
    if _TPCH_RE.match(name):
        return "tpch"
    for prefix, fam in _FAMILY_PREFIXES:
        if name.startswith(prefix):
            return fam
    return "relational"


def _load1() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:
        return -1.0


# Spread-bounding (round-9 verdict #4): min-of-N absorbs transient
# spikes but not a persistently loaded host — BENCH_r08's closing window
# ran at loadavg p50 ~9.9 and heavy queries swung +-30% between same-day
# runs, degrading round-over-round tracking into load measurement. After
# the main passes, any query whose two FASTEST passes disagree by more
# than SPREAD_TARGET gets re-run (same cold/warm discipline) until its
# min is reproducible or the per-query extra budget is spent; the final
# line reports how much stabilizing was needed, so a reader can tell a
# clean record from a noisy one at a glance.
SPREAD_TARGET = 0.15
MAX_EXTRA_PASSES = 4


def _spread(ts: list[float]) -> float:
    """Relative gap between the two fastest passes — 0 when the min is
    confirmed by a near-identical second measurement."""
    s = sorted(ts)
    if len(s) < 2 or s[0] <= 0:
        return 0.0
    return (s[1] - s[0]) / s[0]


def _n_passes() -> int:
    """Parse+validate SPARK_GRAFT_BENCH_PASSES — called at startup so a
    bad value fails BEFORE the multi-minute warmup, not at min([])
    after it."""
    raw = os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")
    try:
        n = int(raw)
    except ValueError:
        raise SystemExit(f"SPARK_GRAFT_BENCH_PASSES must be an int, got {raw!r}")
    if n < 1:
        raise SystemExit(f"SPARK_GRAFT_BENCH_PASSES must be >= 1, got {n}")
    return n


def _quiet_threshold() -> float | None:
    """Parse+validate SPARK_GRAFT_BENCH_QUIET at startup (round-9
    advisor: a malformed value must fail BEFORE the multi-minute run,
    and '0' must mean OFF, not an unreachable threshold that silently
    sleeps the whole timeout). Default ON at loadavg 4.0 — round-9
    verdict #4: closing benches should wait (bounded) for a quiet host
    so round-over-round deltas measure code, not background load."""
    raw = os.environ.get("SPARK_GRAFT_BENCH_QUIET", "4")
    if raw.strip().lower() in ("", "0", "off", "no", "false", "none"):
        return None
    try:
        thr = float(raw)
    except ValueError:
        raise SystemExit(
            f"SPARK_GRAFT_BENCH_QUIET must be a loadavg threshold or "
            f"0/off, got {raw!r}"
        )
    if thr <= 0:
        return None
    return thr


def main() -> None:
    _n_passes()  # fail fast on a bad pass count before Spark startup
    quiet_thr = _quiet_threshold()  # ... and on a bad quiet threshold
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # optional subset (comma-separated names): scaling studies time one
    # operator family at a larger sf without paying the full suite
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    bench_queries = (
        [n for n in (q.strip() for q in only.split(",")) if n]
        if only
        else BENCH_QUERIES
    )
    # fail fast on a typo'd subset BEFORE paying Spark startup + warmup
    # (the warmup's bare except would otherwise swallow the KeyError and
    # the timed loop would die mid-run with no JSON line)
    unknown = [n for n in bench_queries if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown bench queries: {', '.join(unknown)}")
    # quiet-host gate (round-9 verdict #4, ON by default): wait for the
    # 1-min load average to drop under the threshold before paying Spark
    # startup, bounded by SPARK_GRAFT_BENCH_QUIET_TIMEOUT seconds
    # (default 600) so an unattended run can never block forever. The
    # observed load at release is recorded in both output lines either
    # way; SPARK_GRAFT_BENCH_QUIET=0/off disables the wait.
    quiet_wait = None
    if quiet_thr is not None:
        deadline = time.time() + float(
            os.environ.get("SPARK_GRAFT_BENCH_QUIET_TIMEOUT", "600")
        )
        w0 = time.time()
        while _load1() >= quiet_thr and time.time() < deadline:
            time.sleep(15)
        quiet_wait = round(time.time() - w0, 1)
        if _load1() >= quiet_thr:
            print(
                f"bench: quiet wait expired after {quiet_wait}s with "
                f"loadavg {_load1():.1f} >= {quiet_thr} — proceeding on "
                "a loud host; treat per-query deltas with suspicion",
                file=sys.stderr,
                flush=True,
            )
    load_at_start = round(_load1(), 1)
    # showConsoleProgress is read at SparkContext init: pass it through
    # the builder so progress bars never interleave with the JSON line
    spark = get_spark(
        app_name="bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: run every bench query once at the smallest sf so JVM/codegen
    # compilation and Python-worker spin-up are paid before timing starts —
    # the timed runs then measure data-proportional execution at the target
    # sf, which is the number that extrapolates to cluster scale.
    warm_dir = "/root/testdata/sf0.001"
    for name in bench_queries:
        try:
            QUERIES[name](spark, warm_dir).count()
        except Exception:
            pass  # a warmup failure surfaces in the timed run with a real trace

    release_cached()
    spark.catalog.clearCache()  # drop warmup's persisted LSH signatures

    # timed passes, per-query minimum: steady-state cost, robust to
    # transient host contention (a noisy-neighbor window during pass 1
    # hits different queries in later passes, so the min recovers the
    # true figure; measured contention inflated single-pass numbers up
    # to 14x). Default raised to THREE passes after the r5->r6 common-
    # query comparison drifted +11% on unchanged code with per-query
    # loadavg 4-16 recorded during both runs — two passes were not
    # enough to dodge sustained background load on this shared host.
    n_passes = _n_passes()
    passes: dict[str, list[float]] = {name: [] for name in bench_queries}
    # host 1-min load average sampled at each query start, one sample per
    # timed measurement: contention (the measured 4x noise source on a
    # shared host) is then visible IN the artifact — an inflated pass
    # with an inflated load sample is noise, not a regression
    loads: dict[str, list[float]] = {name: [] for name in bench_queries}

    cold_passes: dict[str, list[float]] = {
        name: []
        for name in bench_queries
        if name in ARTIFACT_TRAINED or name in CORPUS_TRAINED
    }

    def _quiesce():
        release_cached()
        spark.catalog.clearCache()  # queries are timed independently
        # force the context cleaner between queries: dead shuffle /
        # broadcast blocks from earlier queries otherwise accumulate
        # until a driver GC happens to run, squeezing execution
        # memory mid-sequence (measured 10x+ slowdowns)
        spark.sparkContext._jvm.System.gc()

    def _timed_pass(name: str) -> None:
        _quiesce()
        if name in ARTIFACT_TRAINED or name in CORPUS_TRAINED:
            # COLD leg: drop ONLY the memo this query's family owns —
            # trained-model memos for ARTIFACT_TRAINED (reset_corpus_caches
            # would also wipe the hot-shingle and dim-probe caches that
            # non-split queries consume, silently making THEIR headline
            # cold — round-8 review finding), the hot-shingle memo for
            # CORPUS_TRAINED (r10 verdict #2) — then a WARM leg with the
            # memo populated
            if name in ARTIFACT_TRAINED:
                reset_model_caches()
            else:
                reset_shingle_cache()
            loads[name].append(_load1())
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            cold_passes[name].append(round(time.perf_counter() - t0, 3))
            _quiesce()  # data caches only — the memo stays warm
        loads[name].append(_load1())
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        passes[name].append(round(time.perf_counter() - t0, 3))

    for _ in range(n_passes):
        for name in bench_queries:
            _timed_pass(name)

    # spread-bound the minima (round-9 verdict #4): re-run any query
    # whose two fastest passes disagree by > SPREAD_TARGET, up to
    # MAX_EXTRA_PASSES extra runs each, so per-query deltas across
    # rounds measure code, not the host's background load. On by
    # default; SPARK_GRAFT_BENCH_STABILIZE=0 restores the fixed-pass
    # behavior.
    extra_passes = 0
    if os.environ.get("SPARK_GRAFT_BENCH_STABILIZE", "1") != "0":
        for name in bench_queries:
            extra = 0
            # ARTIFACT_TRAINED queries stabilize BOTH legs (round-9
            # advisor: cold minima were reported with no spread bound,
            # so cold round-over-round deltas could still be host
            # noise) — a re-run pays cold+warm together, same as a
            # main pass.
            while (
                _spread(passes[name]) > SPREAD_TARGET
                or _spread(cold_passes.get(name, [])) > SPREAD_TARGET
            ) and extra < MAX_EXTRA_PASSES:
                _timed_pass(name)
                extra += 1
            extra_passes += extra
    unstable = sorted(
        n for n in bench_queries if _spread(passes[n]) > SPREAD_TARGET
    )
    unstable_cold = sorted(
        n for n, cs in cold_passes.items() if _spread(cs) > SPREAD_TARGET
    )
    timings = {name: min(ts) for name, ts in passes.items()}
    artifact_cold_warm = {
        name: {"cold": min(cs), "warm": timings[name]}
        for name, cs in cold_passes.items()
        if cs
    }

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    payload = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "artifact_cold_warm": artifact_cold_warm,
        "sf": sf_val,
    }
    # full per-query line first (humans + log scrapers), then a compact
    # FINAL line sized to fit the round driver's ~2.2 KB stdout-tail
    # window: the 111-query dict is ~3.3 KB, so a single full line always
    # starts before the capture window and parses as a fragment (BENCH_r4
    # and r5 both recorded parsed: null). The final line carries the
    # contract fields with the headline TPC-H core as `queries` plus
    # per-family subtotals covering every timed query — small enough that
    # the tail always contains it whole.
    print(json.dumps(payload, separators=(",", ":")), flush=True)
    tpch = {n: t for n, t in timings.items() if _TPCH_RE.match(n)}
    families: dict[str, float] = {}
    for n, t in timings.items():
        families[_family(n)] = round(families.get(_family(n), 0.0) + t, 3)
    # contention context in the driver-visible line: pass count + the
    # load-average spread across every timed measurement, so a reader of
    # BENCH_r{N} can tell noise (high load, inflated single passes) from
    # a real regression without digging into .benchmarks/
    all_loads = sorted(
        x for ls in loads.values() for x in ls if x >= 0
    )
    # per-family {train-included, memo-warm} seconds for the artifact-
    # trained queries — the tail-line view of artifact_cold_warm
    cw_fam: dict[str, list[float]] = {}
    for n, cw in artifact_cold_warm.items():
        fam = ARTIFACT_TRAINED.get(n) or CORPUS_TRAINED[n]
        c, w = cw_fam.get(fam, [0.0, 0.0])
        cw_fam[fam] = [round(c + cw["cold"], 3), round(w + cw["warm"], 3)]
    ts = time.strftime("%Y%m%dT%H%M%S")
    final = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": tpch,
        "families": families,
        "cold_warm": cw_fam,
        "n_queries": len(timings),
        "passes": n_passes,
        "extra_passes": extra_passes,
        "n_unstable": len(unstable),
        # name the still-unstable queries IN the driver-visible line
        # (round-9 verdict #4: the names previously lived only in the
        # .benchmarks run file); capped so the tail line stays inside
        # the driver's ~2.2 KB capture window
        "unstable": unstable[:8],
        "unstable_cold": unstable_cold[:4],
        "loadavg_start": load_at_start,
        "loadavg_max": all_loads[-1] if all_loads else None,
        "loadavg_p50": all_loads[len(all_loads) // 2] if all_loads else None,
        # pins this BENCH_r{N} record to its .benchmarks/bench-<ts> raw
        # artifact so round-over-round comparisons reference one run
        "run_at": ts,
        "sf": sf_val,
    }
    if quiet_wait is not None:
        final["quiet_wait_sec"] = quiet_wait
    print(json.dumps(final, separators=(",", ":")), flush=True)

    # append-only run history, one timestamped file per run, carrying the
    # RAW per-pass timings too — so "regression or noise?" questions are
    # answerable from artifacts (a real regression shows in both passes;
    # contention shows as one inflated pass). Written OUTSIDE version
    # control: .benchmarks/ is gitignored, or point SPARK_GRAFT_BENCH_DIR
    # anywhere else.
    hist_dir = os.environ.get(
        "SPARK_GRAFT_BENCH_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".benchmarks"),
    )
    os.makedirs(hist_dir, exist_ok=True)
    with open(os.path.join(hist_dir, f"bench-{ts}-sf{sf}.json"), "w") as f:
        json.dump(
            {
                **payload,
                "passes": passes,
                "cold_passes": cold_passes,
                "loadavg_1m": loads,
                "extra_passes": extra_passes,
                "unstable_after_extra": unstable,
                "unstable_cold_after_extra": unstable_cold,
                "loadavg_start": load_at_start,
                "quiet_wait_sec": quiet_wait,
                "run_at": ts,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
            },
            f,
            indent=1,
        )
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
