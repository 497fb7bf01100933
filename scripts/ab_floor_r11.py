"""Round-11 floor decomposition A/B (VERDICT r10 next-round #1).

Round 10 installed two session-wide partition-size floors
(AQE coalescePartitions.minPartitionSize=64k, files.openCostInBytes=128k)
that bought large wins on compute-dense families but taxed every tiny
query: the driver's BENCH_r10 regressed 19/22 tracked TPC-H queries
(geomean speedup 0.814, tpch family +25%, embedding +30%).

This script decomposes the tax/benefit per floor per family with the
interleaved same-JVM discipline (OPTIMIZATION_r10 §Measurement-
methodology): one JVM, arms flipped via spark.conf.set between timed
runs, arm order rotated per pass, pass 1 discarded (JIT-cold), min of
the remaining passes per (arm, query).

  python scripts/ab_floor_r11.py [small|heavy|both] [passes]
"""

from __future__ import annotations

import json
import sys
import time

from neynar_parquet_importer_spark.operators.dedup import release_cached
from neynar_parquet_importer_spark.plans.queries import QUERIES
from neynar_parquet_importer_spark.session import get_spark

# the driver's tracked TPC-H core + the small embedding/lang/text queries
# whose families regressed in BENCH_r10 on untouched code
SMALL = [
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_top_orders",
    "q4_order_priority", "q5_region_nation_revenue", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_part_value", "q12_priority_shipping",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_part_counts", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q19_discounted_revenue",
    "q20_excess_shippers", "q21_late_shippers", "q22_global_sales_opportunity",
    "embedding_sq8_topk", "embedding_semdedup", "embedding_dedup_clusters",
    "embedding_near_dup_pairs", "embedding_knn_join", "embedding_topk",
    "lang_label_confusion", "lm_surprising_docs", "text_gopher_repetition",
    "pretrain_curated_docs",
]

# paths round 10 credited to the floors (shuffle-rooted dense compute +
# scan-rooted cases not covered by fan_out)
HEAVY = [
    "pagerank_supplier_rank", "lpa_supplier_communities",
    "cosupplier_triangle_stats", "kcore_supplier_stats",
    "khop_supplier_reach",
    "fuzzy_customer_linkage", "fuzzy_linkage_auto_dispatch",
    "fuzzy_customer_linkage_fine_block",
    "dedup_ngram_jaccard", "dedup_clusters", "dedup_ngram_jaccard_allpairs",
    "dedup_simhash", "dedup_minhash_lsh", "dedup_containment_pairs",
    "dedup_prefix_filter_pairs", "passjoin_doc_prefix_pairs",
    "contrastive_triplets", "split_leakage_pairs", "source_near_dup_matrix",
    "zorder_write_audit", "embedding_near_dup_lsh", "copurchase_part_pairs",
    "winnow_plagiarism_pairs", "text_substring_dup_stats",
]

STOCK_AQE = "1m"       # Spark default minPartitionSize
STOCK_OPEN = str(4 * 1024 * 1024)  # Spark default openCostInBytes
R10_AQE = "64k"
R10_OPEN = str(128 * 1024)

ARMS = {
    "stock": (STOCK_AQE, STOCK_OPEN),
    "r10": (R10_AQE, R10_OPEN),
    "aqe64k": (R10_AQE, STOCK_OPEN),
    "open128k": (STOCK_AQE, R10_OPEN),
}


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    n_pass = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    names = {"small": SMALL, "heavy": HEAVY, "both": SMALL + HEAVY}[which]

    spark = get_spark(
        app_name="ab_floor_r11",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    warm = "/root/testdata/sf0.001"
    sf = "/root/testdata/sf0.1"
    for n in names:
        try:
            QUERIES[n](spark, warm).count()
        except Exception:
            pass

    def quiesce() -> None:
        release_cached()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    def set_arm(arm: str) -> None:
        aqe, opn = ARMS[arm]
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", aqe
        )
        spark.conf.set("spark.sql.files.openCostInBytes", opn)

    out: dict[str, dict[str, list[float]]] = {
        a: {n: [] for n in names} for a in ARMS
    }
    arm_list = list(ARMS)
    for p in range(n_pass):
        # rotate arm order per pass so slow host drift cancels across arms
        order = arm_list[p % len(arm_list):] + arm_list[: p % len(arm_list)]
        for arm in order:
            set_arm(arm)
            for n in names:
                quiesce()
                t0 = time.perf_counter()
                QUERIES[n](spark, sf).count()
                out[arm][n].append(round(time.perf_counter() - t0, 3))
        print(f"pass {p} done", file=sys.stderr, flush=True)

    # pass 1 is JIT-cold for the first arm's first touch of each plan
    # shape; min over passes >= 1 per (arm, query)
    mins = {
        a: {n: min(ts[1:] if len(ts) > 1 else ts) for n, ts in qd.items()}
        for a, qd in out.items()
    }
    hdr = "query".ljust(36) + "".join(a.rjust(11) for a in ARMS)
    print(hdr)
    for n in names:
        print(n.ljust(36) + "".join(f"{mins[a][n]:11.3f}" for a in ARMS))
    for tag, subset in (("SMALL", SMALL), ("HEAVY", HEAVY)):
        sub = [n for n in subset if n in names]
        if not sub:
            continue
        line = f"TOTAL {tag}".ljust(36) + "".join(
            f"{sum(mins[a][n] for n in sub):11.2f}" for a in ARMS
        )
        print(line)
    with open("/tmp/ab_floor_r11.json", "w") as f:
        json.dump({"mins": mins, "raw": out}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
