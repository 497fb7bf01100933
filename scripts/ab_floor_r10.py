"""AQE coalescing-floor A/B (round 10, post-full-bench): the 64 KiB
floor won the 37-query heavy subset 141.3s -> 119.5s, but the full
bench showed a broad tail/tpch regression (dedup_simhash +1.9s, lpa
+1.7s, q2 +0.4s, ...) — every small shuffle now coalesces to 3-32
partitions instead of 1-4, and iteration-heavy queries pay that task
overhead per round. This A/B sweeps floor values over a MIXED subset
(regressed queries + floor winners + tpch spot checks), fresh JVM per
config, to pick the floor that keeps the compute-dense wins without
taxing the tail.

  python scripts/ab_floor_r10.py [pass_count]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_conf_r10 import RUNNER  # noqa: E402

REGRESSED = [
    "dedup_simhash", "lpa_supplier_communities", "dedup_clusters",
    "contrastive_triplets", "passjoin_doc_prefix_pairs",
    "dedup_minhash_lsh", "bm25_topk_docs", "bigram_logprob_score",
    "embedding_near_dup_lsh", "contrastive_negative_samples",
    "lm_surprising_docs", "q2_min_cost_supplier",
    "q16_supplier_part_counts", "q7_volume_shipping",
]
WINNERS = [
    "fuzzy_customer_linkage", "fuzzy_linkage_auto_dispatch",
    "dedup_prefix_filter_pairs", "dedup_containment_pairs",
    "prefix_filter_candidate_stats", "zorder_write_audit",
    "split_leakage_pairs", "split_cluster_safe", "soft_dedup_weights",
    "pretrain_curated_docs", "cosupplier_triangle_stats",
    "khop_supplier_reach", "hybrid_rrf_topk", "linkage_dispatch_3way",
    "fuzzy_customer_linkage_fine_block",
]
OTHERS = [
    "pagerank_supplier_rank", "kcore_supplier_stats",
    "dedup_ngram_jaccard", "copurchase_part_pairs",
]
SUBSET = REGRESSED + WINNERS + OTHERS

CONFIGS: dict[str, dict[str, str]] = {
    "floor64k": {},  # session default this round — the baseline arm
    "floor128k": {
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "128k",
    },
    "floor256k": {
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "256k",
    },
    "floor1m": {
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m",
    },
}


def main() -> None:
    n_pass = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    results: dict[str, dict[str, float]] = {}
    for tag, conf in CONFIGS.items():
        p = subprocess.run(
            [sys.executable, "-c", RUNNER, json.dumps(conf),
             json.dumps(SUBSET), str(n_pass)],
            capture_output=True, text=True,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(f"{tag}: FAILED\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
            continue
        results[tag] = json.loads(line[0][7:])
        r = results[tag]
        print(
            f"{tag}: total {sum(r.values()):.2f}s  "
            f"(regressed {sum(r[n] for n in REGRESSED if n in r):.2f}  "
            f"winners {sum(r[n] for n in WINNERS if n in r):.2f})",
            flush=True,
        )
    base = results.get("floor64k", {})
    names = sorted(base, key=lambda n: -base[n])
    print("query".ljust(36) + "".join(t.rjust(12) for t in results))
    for n in names:
        print(
            n.ljust(36)
            + "".join(f"{results[t].get(n, float('nan')):12.3f}" for t in results)
        )
    with open("/tmp/ab_floor_r10.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
