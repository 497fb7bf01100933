"""Round-11 scale-inertness proof for the AQE coalescing floor
(r10 verdict next-round #5): at sf1 (10x corpus / 10x relational rows)
the 64 KiB minPartitionSize floor must be within noise of the stock
1 MiB value, because AQE's coalescing target
max(shuffleBytes/defaultParallelism, minPartitionSize) is governed by
the bytes term once shuffles carry MBs.

Same-JVM interleaved arms (conf flipped per pass, order rotated),
pass 1 discarded as JIT-cold.

  python scripts/ab_floor_scale_r11.py [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

from neynar_parquet_importer_spark.operators.dedup import release_cached
from neynar_parquet_importer_spark.plans.queries import QUERIES, reset_corpus_caches
from neynar_parquet_importer_spark.session import get_spark

SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")

QUERIES_SF1 = [
    "dedup_ngram_jaccard_allpairs",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "copurchase_part_pairs",
    "pagerank_supplier_rank",
    "lpa_supplier_communities",
    "q2_min_cost_supplier",
    "q21_late_shippers",
]

ARMS = {"stock1m": "1m", "floor64k": "64k"}


def main() -> None:
    n_pass = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(
        app_name="ab_floor_scale_r11",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in QUERIES_SF1:
        try:
            QUERIES[n](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass
    # per-corpus memos must key on the sf1 dir, not leak sf0.001 probes
    reset_corpus_caches()

    def quiesce() -> None:
        release_cached()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    out = {a: {n: [] for n in QUERIES_SF1} for a in ARMS}
    arm_list = list(ARMS)
    for p in range(n_pass):
        order = arm_list[p % 2:] + arm_list[: p % 2]
        for arm in order:
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.minPartitionSize",
                ARMS[arm],
            )
            for n in QUERIES_SF1:
                quiesce()
                t0 = time.perf_counter()
                QUERIES[n](spark, SF1).count()
                out[arm][n].append(round(time.perf_counter() - t0, 3))
        print(f"pass {p} done", file=sys.stderr, flush=True)

    mins = {
        a: {n: min(ts[1:] if len(ts) > 1 else ts) for n, ts in qd.items()}
        for a, qd in out.items()
    }
    print("query".ljust(34) + "".join(a.rjust(11) for a in ARMS))
    for n in QUERIES_SF1:
        print(n.ljust(34) + "".join(f"{mins[a][n]:11.3f}" for a in ARMS))
    print(
        "TOTAL".ljust(34)
        + "".join(f"{sum(mins[a].values()):11.2f}" for a in ARMS)
    )
    with open("/tmp/ab_floor_scale_r11.json", "w") as f:
        json.dump({"mins": mins, "raw": out}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
