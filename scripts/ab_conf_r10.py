"""Config A/B harness (round 10): run a fixed query subset at sf0.1
under several candidate session configurations, fresh JVM per config,
same warmup/quiesce discipline as bench.py — prints per-config totals
and per-query deltas vs the first (baseline) config.

  python scripts/ab_conf_r10.py [pass_count]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HEAVY = [
    # linkage family
    "fuzzy_customer_linkage", "linkage_self_match_rate",
    "fuzzy_linkage_auto_dispatch", "fuzzy_customer_linkage_fine_block",
    "linkage_dispatch_3way",
    # graph
    "pagerank_supplier_rank", "cosupplier_triangle_stats",
    "cosupplier_triangle_nodes", "khop_supplier_reach",
    "lpa_supplier_communities", "kcore_supplier_stats",
    # prefix/containment + text dedup
    "dedup_containment_pairs", "dedup_prefix_filter_pairs",
    "prefix_filter_candidate_stats", "passjoin_doc_prefix_pairs",
    "dedup_simhash", "dedup_minhash_lsh", "dedup_clusters",
    "dedup_ngram_jaccard_allpairs", "winnow_plagiarism_pairs",
    "text_substring_dup_stats", "passage_dedup_docs",
    # embedding / contrastive / pretrain
    "embedding_near_dup_lsh", "source_near_dup_matrix",
    "split_leakage_pairs", "contrastive_triplets",
    "pretrain_curated_docs", "pretrain_corpus_summary",
    # layout + retrieval
    "zorder_write_audit", "zorder_events_profile", "hybrid_rrf_topk",
    # tpch spot checks (catch regressions from extra tasks)
    "q1_pricing_summary", "q2_min_cost_supplier", "q9_product_profit",
    "q21_late_shippers", "latest_event_per_user", "moving_avg_user_value",
]

CONFIGS: dict[str, dict[str, str]] = {
    "base": {},
    "floor64k": {
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    },
    "floor64k+shj": {
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
        "spark.sql.join.preferSortMergeJoin": "false",
    },
    "floor64k+wide": {
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
        "spark.sql.shuffle.partitions": str(
            2 * int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        ),
    },
}

RUNNER = r"""
import json, os, sys, time
from neynar_parquet_importer_spark.operators.dedup import release_cached
from neynar_parquet_importer_spark.plans.queries import QUERIES, reset_model_caches
from neynar_parquet_importer_spark.session import get_spark

conf = json.loads(sys.argv[1])
names = json.loads(sys.argv[2])
n_pass = int(sys.argv[3])
conf["spark.ui.showConsoleProgress"] = "false"
spark = get_spark(app_name="ab_conf", extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")
warm = "/root/testdata/sf0.001"
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
for n in names:
    try:
        QUERIES[n](spark, warm).count()
    except Exception:
        pass
def q():
    release_cached(); spark.catalog.clearCache(); spark.sparkContext._jvm.System.gc()
out = {n: [] for n in names}
for _ in range(n_pass):
    for n in names:
        q()
        reset_model_caches()
        t0 = time.perf_counter(); QUERIES[n](spark, sf).count()
        out[n].append(round(time.perf_counter() - t0, 3))
print("RESULT " + json.dumps({n: min(ts) for n, ts in out.items()}))
spark.stop()
"""


def main() -> None:
    n_pass = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    results: dict[str, dict[str, float]] = {}
    for tag, conf in CONFIGS.items():
        p = subprocess.run(
            [sys.executable, "-c", RUNNER, json.dumps(conf),
             json.dumps(HEAVY), str(n_pass)],
            capture_output=True, text=True,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(f"{tag}: FAILED\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
            continue
        results[tag] = json.loads(line[0][7:])
        print(f"{tag}: total {sum(results[tag].values()):.2f}s", flush=True)
    base = results.get("base", {})
    names = sorted(base, key=lambda n: -base[n])
    hdr = "query".ljust(36) + "".join(t.rjust(15) for t in results)
    print(hdr)
    for n in names:
        print(
            n.ljust(36)
            + "".join(f"{results[t].get(n, float('nan')):15.3f}" for t in results)
        )
    with open("/tmp/ab_conf_r10.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
