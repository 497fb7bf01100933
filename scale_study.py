"""Order-of-magnitude scaling study (sf0.1 -> sf1) for the dedup / ANN /
corpus operator families.

The driver ships testdata up to sf0.1 (documents: 5k rows, embeddings:
2k vectors). This study synthesizes an sf1-scale corpus (10x rows) whose
distributions are fit from sf0.1 itself — empirical token frequencies,
token-count distribution, lang/source mix, the same planted exact/near
dup rates, and per-label Gaussian embedding clusters fit from the real
vectors — then measures each family query at both scales, each
(query, scale) pair in its own FRESH subprocess (round-6 methodology
fix: a long shared session contaminates successors' timings up to 16x,
and a shared per-query process would still run sf1 after sf0.1's debris
— see _measure_single), with bench.py's per-pass discipline (min of 2
passes, System.gc() between passes, loadavg stamped), and reports the
scaling exponent
``log10(t_sf1 / t_sf0.1)`` (1.0 = linear in corpus size; pair scans over
10x docs may exceed 1 where the PAIR population, not the row count, is
the true workload).

Beyond timings, three scale claims from the operator docs are checked
empirically at sf1:

- **crossover**: at 20k vectors the exact blocked-BLAS pair scan must
  still be at-or-under the forced multi-table LSH path's cost — i.e. the
  ~1e5 exact-below threshold is not yet crossed an order of magnitude up;
- **banding recall**: the MinHash->banding->est-filter->exact-rerank
  pipeline at jaccard >= 0.8 must reproduce the capped all-pairs ground
  truth (the Binom(64, 0.8) collision bound is corpus-size-free, so
  recall must not decay with scale);
- **fractional df-cap**: the >5%-of-corpus stop-shingle rule must name a
  comparable FRACTION of shingle mass at both scales (an absolute cap
  would silently stop capping at 10x).

Round 6 additions (r5 verdict tasks #6/#7):

- **relational core**: the TPC-H adaptations and the window/sessionize
  event queries get measured exponents too. The sf1 relational tables
  are key-shifted 10x replicas of sf0.1 (pyarrow, type-faithful — the
  events table keeps its TIMESTAMP(NANOS) physical type, which a DuckDB
  COPY would silently truncate to micros): per-replica key offsets keep
  PK/FK relationships intact, so join fanout and per-key group sizes
  are preserved while key cardinality scales 10x — exactly the shape a
  10x-bigger day of the same workload has. Dims (region/nation) stay
  fixed, as they do in real warehouses.
- **ANN recall at sf1**: per-index recall@20 vs the exact top-k ground
  truth (hyperplane-LSH bucket probe, IVF nprobe=6/16, PQ-ADC) over 10
  query vectors, plus pair-level recall of the multi-table LSH path at
  cos>=0.9 vs the exact blocked scan — the empirical row for the
  auto-plane/auto-table rule's >=0.98-recall design point.

Round 7 additions (r6 verdict tasks #1/#2/#4/#6):

- **--clustered-recall**: recall-targeted auto-tuning of all four ANN
  index families on a generated clustered corpus (the regime where the
  indexes earn their keep) — checks.ann_recall_clustered;
- **--linkage-ab**: PassJoin-vs-blocked A/B at sf1 on both key regimes
  with dispatch verdicts — checks.linkage_ab_sf1;
- **--zorder-skip**: row-group skip ratios of the z-order write path vs
  single-column-sorted and unsorted layouts — checks.zorder_skip_sf1;
- the linkage pair queries join the measured sf0.1->sf1 exponent list.

Writes BENCH_SCALING.json at the repo root (tracked — this is the
recorded evidence) and a copy of the generated corpus under
$SPARK_GRAFT_SF1_DIR (default /tmp/sf1, scratch).

Usage: python scale_study.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

SF01 = "/root/testdata/sf0.1"
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
SCALE = 10

# the doc/embedding-family queries measured at both scales (all read the
# documents/embeddings tables; heavy_hitters_cms also needs events — the
# SF1 corpus generator must cover all three)
FAMILY_QUERIES = [
    # text dedup family
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_allpairs",
    "dedup_simhash",
    "dedup_clusters",
    # embedding / ANN family
    "embedding_near_dup_pairs",
    "embedding_dedup_clusters",
    "embedding_dedup_clusters_lsh",
    "embedding_near_dup_lsh",
    "embedding_knn_join",
    "embedding_semdedup",
    "embedding_topk",
    "embedding_lsh_topk",
    "embedding_ivf_topk",
    "embedding_pq_topk",
    "embedding_ivf_knn_join",
    # corpus analysis family
    "doc_novelty",
    "passage_dedup_docs",
    "boilerplate_chunk_removal",
    "text_substring_dup_stats",
    "tfidf_top_terms",
    "dsir_importance_weights",
    "pack_training_sequences",
    "contrastive_triplets",
    "split_leakage_pairs",
    "split_cluster_safe",
    "soft_dedup_weights",
    "source_near_dup_matrix",
    # round-6 second-pass primitives
    "bloom_incremental_dedup",
    "bloom_words_profile",
    "embedding_sq8_topk",
    "quality_classifier_scores",
    "heavy_hitters_cms",
    # round-6 third pass
    "kmeans_corpus_clusters",
    "kmeans_domain_profile",
    "winnow_plagiarism_pairs",
    "winnow_fingerprint_stats",
    # round-6 fourth pass: sketches + retrieval
    "hll_distinct_users",
    "hll_register_union",
    "bm25_topk_docs",
    "bm25_term_stats",
    # round-6 sixth pass: exact prefix-filter set-similarity join +
    # hybrid retrieval fusion
    "dedup_prefix_filter_pairs",
    "prefix_filter_candidate_stats",
    "hybrid_rrf_topk",
    "dedup_containment_pairs",
    "passjoin_doc_prefix_pairs",
    # round-7: LM scoring + PCA compression + KMV sketches
    "lm_surprising_docs",
    "lm_source_perplexity",
    "pca_label_compression",
    "pca_component_variance",
    "bpe_learned_merges",
    "bpe_token_compression",
]


# headline relational queries measured at both scales: the TPC-H core
# shapes (scan-agg, join-agg, multi-join profit), plus the event-stream
# window/sessionize/interval family
RELATIONAL_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_nation_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q18_large_volume_customers",
    "window_topn_per_group",
    "moving_avg_user_value",
    "latest_event_per_user",
    "sessionize_events",
    "cohort_retention",
    "events_interval_pairs",
    "range_join_shipments",
    "asof_latest_order_per_event",
    "pagerank_supplier_rank",
    # round-6 fourth pass: correlated-subquery TPC-H shapes, graph,
    # funnel/diff/layout
    "q2_min_cost_supplier",
    "q11_important_part_value",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q20_excess_shippers",
    "q21_late_shippers",
    "event_funnel_steps",
    "kmv_distinct_buyers_per_segment",
    "kmv_returnflag_part_overlap",
    "snapshot_diff_orders",
    "cosupplier_triangle_stats",
    "lpa_supplier_communities",
    "zorder_events_profile",
    "event_transition_matrix",
    "copurchase_part_pairs",
    "kcore_supplier_stats",
    # round-6 fifth pass
    "events_daily_resampled",
    "user_scd2_type_history",
    "orders_quality_audit",
    "khop_supplier_reach",
    "event_value_quantile_hist",
    # round-7: the linkage pair queries, previously excluded on a cost
    # ARGUMENT (nation is a fixed-cardinality blocking key, so 10x rows
    # per block means ~100x in-block pairs — quadratic by design). The
    # r6 verdict asked for the measurement instead of the argument:
    # expect exponents near 2 (measured probe: 6.7 s -> ~490 s, 1.87),
    # the recorded evidence for the max_block cap + finer-key guidance
    # and for auto_pairs' dispatch (see checks.linkage_ab_sf1).
    "fuzzy_customer_linkage",
    "linkage_self_match_rate",
    # round-8: the finer-key mitigation itself (two-pass first-5/last-4
    # blocking), registered so the sublinearity claim is a measured
    # exponent, not module-doc guidance (r7 verdict #5)
    "fuzzy_customer_linkage_fine_block",
]

# per-replica key offsets (well above each key's sf0.1 max): PKs and the
# FKs that reference them shift together, so every replica is a disjoint,
# internally-consistent copy of the workload graph
_KEY_OFFSETS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 10**7},
    "supplier": {"s_suppkey": 10**6},
    "part": {"p_partkey": 10**7},
    "orders": {"o_orderkey": 10**9, "o_custkey": 10**7},
    "lineitem": {"l_orderkey": 10**9, "l_partkey": 10**7, "l_suppkey": 10**6},
    "events": {"event_id": 10**9, "user_id": 10**7},
}


def generate_sf1_relational(
    out_dir: str, src_dir: str = SF01, scale: int = SCALE
) -> None:
    """Key-shifted ``scale``x replication of ``src_dir``'s relational
    tables via pyarrow (type-faithful: preserves the events table's
    nanosecond timestamps, which catalog.load_table's nanosAsLong path
    depends on). Dims (region/nation) copy through unchanged."""
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for name in ("region", "nation"):
        shutil.copyfile(
            f"{src_dir}/{name}.parquet", f"{out_dir}/{name}.parquet"
        )
    for name, offsets in _KEY_OFFSETS.items():
        t = pq.read_table(f"{src_dir}/{name}.parquet")
        parts = [t]
        for i in range(1, scale):
            cols = []
            for col_name in t.column_names:
                col = t[col_name]
                if col_name in offsets:
                    col = pc.add(col, pa.scalar(i * offsets[col_name], type=col.type))
                cols.append(col)
            parts.append(pa.table(cols, names=t.column_names))
        pq.write_table(
            pa.concat_tables(parts),
            f"{out_dir}/{name}.parquet",
            # keep the source's physical timestamp resolution (events is
            # TIMESTAMP(NANOS); coercing would change the load path)
            coerce_timestamps=None,
        )


def generate_sf1(
    out_dir: str, src_dir: str = SF01, scale: int = SCALE, seed: int = 421
) -> None:
    """Deterministic ``scale``x corpus fit from ``src_dir``'s empirical
    distributions — parameterized so a SECOND SEED at the driver's gate
    scale can be generated for an independent oracle-harness pass
    (r5 verdict #1's 'ideally a second seed')."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text, lang, source FROM read_parquet('{src_dir}/documents.parquet') ORDER BY doc_id"
    ).fetch_df()
    rng = np.random.RandomState(seed)

    # empirical token distribution + doc-length distribution
    toks: list[str] = []
    lengths: list[int] = []
    for t in docs["text"]:
        w = t.split()
        lengths.append(len(w))
        toks.extend(w)
    vocab, counts = np.unique(toks, return_counts=True)
    tok_p = counts / counts.sum()
    lengths = np.array(lengths)
    langs, lang_c = np.unique(docs["lang"], return_counts=True)
    lang_p = lang_c / lang_c.sum()
    n_sources = docs["source"].nunique()

    n = len(docs) * scale
    # planted duplicate structure at sf0.1's rates: ~0.16% exact copies,
    # ~0.5% near copies (a few-token perturbation of a base doc)
    n_exact = int(round(n * 0.0016))
    n_near = int(round(n * 0.005))
    n_base = n - n_exact - n_near

    texts: list[str] = []
    for i in range(n_base):
        ln = int(rng.choice(lengths))
        texts.append(" ".join(rng.choice(vocab, size=ln, p=tok_p)))
    for i in range(n_exact):
        texts.append(texts[rng.randint(0, n_base)])
    for i in range(n_near):
        base = texts[rng.randint(0, n_base)].split()
        k = max(1, len(base) // 20)
        for _ in range(k):  # perturb ~5% of tokens
            base[rng.randint(0, len(base))] = str(rng.choice(vocab))
        texts.append(" ".join(base))
    order = rng.permutation(n)
    texts = [texts[i] for i in order]
    out = {
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(langs, size=n, p=lang_p),
        "source": np.array([f"src{i}" for i in rng.randint(0, n_sources, size=n)]),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }
    con.register("docs_out", __import__("pandas").DataFrame(out))
    con.execute(
        f"COPY docs_out TO '{out_dir}/documents.parquet' (FORMAT PARQUET)"
    )

    emb = con.execute(
        f"SELECT vec_id, embedding, label FROM read_parquet('{src_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetch_df()
    mat = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    labels = emb["label"].to_numpy()
    m = len(emb) * scale
    n_dup = int(round(m * 0.01))  # planted high-cos near-dups
    rows_v: list[np.ndarray] = []
    rows_l: list[int] = []
    for lab in np.unique(labels):
        sub = mat[labels == lab]
        mu, sd = sub.mean(axis=0), sub.std(axis=0)
        k = int(round(m * len(sub) / len(mat)))
        rows_v.append(mu + sd * rng.randn(k, mat.shape[1]))
        rows_l.extend([int(lab)] * k)
    vecs = np.vstack(rows_v)[: m - n_dup]
    labs = np.array(rows_l[: m - n_dup])
    picks = rng.randint(0, len(vecs), size=n_dup)
    dups = vecs[picks] + 0.02 * rng.randn(n_dup, vecs.shape[1])
    vecs = np.vstack([vecs, dups])
    labs = np.concatenate([labs, labs[picks]])
    order = rng.permutation(len(vecs))
    eout = __import__("pandas").DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [[float(x) for x in v] for v in vecs[order]],
            "label": labs[order].astype(np.int64),
        }
    )
    con.register("emb_out", eout)
    con.execute(f"COPY emb_out TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)")
    con.close()


# the -k expression selecting the pair-scan twin tests (the families
# whose DuckDB twin is quadratic in corpus size — excluded from the real
# sf1 probe, value-checked on the feasibility slice below instead)
PAIR_SCAN_K = (
    "dedup or linkage or winnow or prefix_filter or containment or "
    "passjoin or near_dup or pair or split_cluster_safe or knn or "
    # its twin hides an all-pairs doc-Jaccard scan behind a non-pair
    # name — found when the round-9 sf1 probe ground for 100+ minutes
    # inside its DuckDB leg (1.25e9 list_intersect pairs at 50k docs)
    "contrastive_triplets"
)


def generate_pair_scan_slice(out_dir: str, seed: int = 421) -> None:
    """sf1-DISTRIBUTION corpus at sf0.1 row counts — the feasibility
    slice for the pair-scan twins (round-9 verdict #2). The real sf1
    corpus is out of the quadratic DuckDB twins' reach (50k docs / 150k
    customers: the TWIN side is the blocker, the engine side carries
    measured sf1 exponents), so this slice keeps every distribution the
    sf1 corpus has while sizing the tables to the scale those twins
    already run at every round:

    - relational tables: the SAME key-shifted replication scheme as the
      sf1 build, applied 10x to sf0.01 — every name repeats 10x across
      disjoint key ranges (sf1's duplicate structure, the thing that
      changed the linkage regime there) at sf0.1's row counts;
    - documents/embeddings: ``generate_sf1`` with scale=1 — sf0.1's
      empirical length/vocab/label distributions and sf1's planted
      exact/near-dup rates at 5k docs / 2k vectors.

    Run the twins with:
        ORACLE_SF_DIR=<out_dir> python -m pytest \\
            tests/test_queries_oracle.py -q -k "$PAIR_SCAN_K"
    """
    generate_sf1_relational(
        out_dir, src_dir="/root/testdata/sf0.01", scale=10
    )
    generate_sf1(out_dir, src_dir=SF01, scale=1, seed=seed)


SF10_DIR = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/sf10")

# The bounded-state sketch families' registered build+fold queries (the
# streaming folds are the readStream legs in tests/; these batch queries
# carry the same register/sketch arithmetic): HLL (build + register-max
# fold), CMS, KMV (build + sketch-only pairwise fold), histogram, bloom.
# Several carry their EXACT witness in-row (countDistinct /
# confirmation join) — that leg is ~linear too, so exponents <= ~1.0
# remain the claim being measured.
# round-10 verdict #5: the most expensive bench families, one decade
# past sf1 — engine-side scaling only (no oracle at sf10). Each is the
# family's costliest registered query.
HEAVY_SF10_QUERIES = [
    "pagerank_supplier_rank",
    "cosupplier_triangle_stats",
    "fuzzy_customer_linkage_fine_block",
    "dedup_prefix_filter_pairs",
    "dedup_containment_pairs",
]

SKETCH_SF10_QUERIES = [
    "hll_distinct_users",
    "hll_register_union",
    "heavy_hitters_cms",
    "kmv_distinct_buyers_per_segment",
    "kmv_returnflag_part_overlap",
    "event_value_quantile_hist",
    "token_count_histogram",
    "bloom_incremental_dedup",
    "bloom_words_profile",
]


def generate_sf10(out_dir: str, seed: int = 431) -> None:
    """One-decade-further corpus for the sketch ladder (round-9 verdict
    #6): relational tables via the same key-shifted replication as sf1
    at scale=100 (events 10M, lineitem 60M rows), documents synthesized
    from sf0.1's empirical distributions at 500k rows. Token sampling is
    vectorized (ONE rng.choice over the whole 50M-token budget instead
    of generate_sf1's per-doc call, which recomputes the vocab CDF per
    document and would take ~an hour at this size). Embeddings are NOT
    generated — no sketch-family query reads them. No oracle runs here:
    this corpus feeds scaling measurements, not value checks."""
    import duckdb

    generate_sf1_relational(out_dir, src_dir=SF01, scale=100)

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT text, lang, source FROM "
        f"read_parquet('{SF01}/documents.parquet')"
    ).fetch_df()
    rng = np.random.RandomState(seed)
    toks: list[str] = []
    lengths: list[int] = []
    for t in docs["text"]:
        w = t.split()
        lengths.append(len(w))
        toks.extend(w)
    vocab, counts = np.unique(toks, return_counts=True)
    tok_p = counts / counts.sum()
    langs, lang_c = np.unique(docs["lang"], return_counts=True)
    lang_p = lang_c / lang_c.sum()
    n_sources = docs["source"].nunique()

    n = len(docs) * 100
    n_exact = int(round(n * 0.0016))
    n_near = int(round(n * 0.005))
    n_base = n - n_exact - n_near
    doc_lens = rng.choice(np.array(lengths), size=n_base)
    flat = rng.choice(vocab, size=int(doc_lens.sum()), p=tok_p)
    bounds = np.concatenate([[0], np.cumsum(doc_lens)])
    texts = [
        " ".join(flat[bounds[i]:bounds[i + 1]]) for i in range(n_base)
    ]
    for _ in range(n_exact):
        texts.append(texts[rng.randint(0, n_base)])
    for _ in range(n_near):
        base = texts[rng.randint(0, n_base)].split()
        for _ in range(max(1, len(base) // 20)):
            base[rng.randint(0, len(base))] = str(rng.choice(vocab))
        texts.append(" ".join(base))
    order = rng.permutation(n)
    texts = [texts[i] for i in order]
    out = __import__("pandas").DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(langs, size=n, p=lang_p),
            "source": np.array(
                [f"src{i}" for i in rng.randint(0, n_sources, size=n)]
            ),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    con.register("docs_out", out)
    con.execute(
        f"COPY docs_out TO '{out_dir}/documents.parquet' (FORMAT PARQUET)"
    )
    con.close()


def generate_clustered(
    out_dir: str,
    n: int = 20000,
    dim: int = 64,
    n_clusters: int = 100,
    sigma: float = 0.05,
    seed: int = 733,
) -> None:
    """Clustered embedding corpus — the regime real embedding models
    produce (text/image encoders map semantically-similar inputs to
    tight cones) and the one where IVF/LSH/PQ earn their keep. The
    uniform sf1 corpus is the documented worst case (top-k recall there
    tracks scanned fraction, see ann_recall_checks); this generator is
    the measured OTHER regime.

    Structure: ``n_clusters`` unit-sphere centers, cluster sizes ~
    Zipf-ish (real corpora are head-heavy), point = normalize(center +
    sigma * N(0, I)). sigma=0.05 at dim=64 puts intra-cluster cosine at
    ~0.92-0.95 and inter-cluster near 0 — k=20 neighborhoods live
    inside one cluster. Same generator discipline as generate_sf1
    (fixed RNG seed, duckdb COPY, identical embeddings schema)."""
    import pandas as _pd

    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # head-heavy sizes: weight_i ~ 1/(i+1), scaled to n
    w = 1.0 / np.arange(1, n_clusters + 1)
    sizes = np.maximum(1, np.round(n * w / w.sum()).astype(int))
    # trim/pad rounding drift onto the biggest cluster
    sizes[0] += n - sizes.sum()
    vecs = np.vstack([
        centers[c] + sigma * rng.randn(sizes[c], dim)
        for c in range(n_clusters)
    ])
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    labs = np.repeat(np.arange(n_clusters), sizes)
    order = rng.permutation(len(vecs))
    eout = _pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": [[float(x) for x in v] for v in vecs[order]],
        "label": labs[order].astype(np.int64),
    })
    con = duckdb.connect()
    con.register("emb_out", eout)
    con.execute(f"COPY emb_out TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)")
    con.close()


def clustered_recall_checks(spark, clustered_dir: str) -> dict:
    """Recall-targeted auto-tuning on the clustered corpus (r6 verdict
    #1): for each index family, ``tune_topk_index`` walks the knob
    ladder (LSH multiprobe radius / IVF nprobe / PQ+SQ8 exact-rerank
    shortlist) and records the cheapest rung with recall@20 >= 0.8 —
    the measured evidence that the indexes beat brute force on quality
    where corpora have structure, alongside the honest uniform-corpus
    worst-case rows in ann_recall_sf1."""
    from neynar_parquet_importer_spark.operators import similarity as sim
    from neynar_parquet_importer_spark.plans.queries import _t

    emb = _t(spark, clustered_dir, "embeddings")
    out: dict = {
        "corpus": {
            "kind": "mixture-of-gaussians on the unit sphere",
            "n": emb.count(),
            "generator": "scale_study.generate_clustered(seed=733)",
        }
    }
    for fam in ("lsh", "ivf", "pq", "sq8"):
        out[fam] = sim.tune_topk_index(
            emb, fam, k=20, target_recall=0.8, n_val_queries=10
        )
    return out


def ann_recall_tuned_checks(spark, sf1_dir: str) -> dict:
    """tune_topk_index on the UNIFORM sf1 corpus — the worst-case
    counterpart of the clustered block, separating the two failure
    modes the raw ann_recall_sf1 rows conflate:

    - PQ/SQ8 lose recall to QUANTIZATION error while scanning every
      code — the exact-rerank dial recovers it even here (recall -> 1
      as R grows, float reads stay R rows);
    - LSH/IVF lose recall to PRUNING — on structureless vectors the
      true top-k spreads uniformly over cells, so no probe set short of
      a large scan fraction can meet the target, and the tuner must
      report that honestly (met only at a large scan_frac, or not at
      all) rather than fake a pass."""
    from neynar_parquet_importer_spark.operators import similarity as sim
    from neynar_parquet_importer_spark.plans.queries import _t

    emb = _t(spark, sf1_dir, "embeddings")
    out: dict = {"corpus": "uniform sf1 embeddings (worst case)"}
    for fam in ("pq", "sq8", "lsh", "ivf"):
        out[fam] = sim.tune_topk_index(
            emb, fam, k=20, target_recall=0.8, n_val_queries=10
        )
    return out


def linkage_ab_checks(spark, sf1_dir: str) -> dict:
    """PassJoin-vs-blocked A/B at sf1 on both key regimes (r6 verdict
    #2/#4) — the measured row behind linkage.py's crossover doc and
    behind auto_pairs' dispatch rule.

    - LOW-ENTROPY regime: the registered linkage corpus (150k dirty
      customer-name suffixes vs 150k clean, nation-blocked, tau=2 —
      zero-padded digits, segments collide corpus-wide).
    - HIGH-ENTROPY regime: the registered passjoin corpus (50k
      perturbed 24-char doc prefixes vs 50k clean, NO blocking key,
      tau=2 — text segments near-unique).

    Each strategy runs ONCE per regime (single pass: the blocked legs
    are hundreds of seconds; loadavg is stamped so the reader can judge
    noise), result sets are count-compared (both joins are exact, so
    the counts must agree), and decide_pairs_strategy's verdict +
    statistics are recorded so the dispatch choice can be checked
    against the measured faster side."""
    from pyspark.sql import functions as F

    from neynar_parquet_importer_spark.operators import linkage as lk
    from neynar_parquet_importer_spark.plans.queries import (
        _PASSJOIN_DIRTY_EXPR,
        _dirty_customers,
        _t,
    )

    out: dict = {}

    def timed(fn):
        t0 = time.time()
        n = fn().count()
        return n, round(time.time() - t0, 1), round(_load1(), 1)

    # ---- low-entropy: customers, nation-blocked ------------------------
    # the SHARED corpus definition (queries._linkage_corpus) so this A/B
    # measures exactly the corpus the gate value-checks
    from neynar_parquet_importer_spark.plans.queries import _linkage_corpus

    dirty_c, clean_c = _linkage_corpus(spark, sf1_dir)
    args_low = dict(
        block_cols=["c_nationkey"], left_id="d_key", right_id="c_custkey",
        left_text="d_suffix", right_text="c_suffix", max_distance=2,
    )
    dec_low = lk.decide_pairs_strategy(dirty_c, clean_c, **args_low)
    nb, tb, lb = timed(lambda: lk.blocked_pairs(dirty_c, clean_c, **args_low))
    # the PassJoin leg in this regime is its documented failure mode:
    # zero-padded digit segments collide corpus-wide, so candidates
    # approach the in-block cross-product (~9e8 at sf1) — a full run
    # OOMs the default-8g local JVM in the candidate distinct (measured
    # this round). Measure on deterministic 1/5 hash slices of both
    # sides and project linearly in the ESTIMATED candidate count (the
    # same sampled estimator the dispatch uses, evaluated at both
    # sizes), which is the cost driver of every stage past the piece
    # join.
    frac_low = 5
    d_sl = dirty_c.filter(F.pmod(F.xxhash64("d_key"), F.lit(frac_low)) == 0)
    c_sl = clean_c.filter(
        F.pmod(F.xxhash64("c_custkey"), F.lit(frac_low)) == 0
    )
    dec_low_slice = lk.decide_pairs_strategy(d_sl, c_sl, **args_low)
    np_, tp, lp = timed(lambda: lk.passjoin_pairs(
        d_sl, c_sl, "d_key", "c_custkey", "d_suffix", "c_suffix", 2,
        block_cols=["c_nationkey"],
    ))
    cand_ratio = (
        dec_low["passjoin_est_candidates"]
        / max(dec_low_slice["passjoin_est_candidates"], 1.0)
    )
    tp_proj = round(tp * cand_ratio, 1)
    low_faster = (
        "blocked"
        if not dec_low["passjoin_feasible"] or tb <= tp_proj
        else "passjoin"
    )
    out["low_entropy_customers"] = {
        "blocked": {"pairs": nb, "sec": tb, "loadavg_1m": lb},
        "passjoin_slice": {
            "pairs": np_, "sec": tp, "loadavg_1m": lp,
            "slice_denominators": [frac_low, frac_low],
            "est_candidates_slice": dec_low_slice["passjoin_est_candidates"],
            "est_candidates_full": dec_low["passjoin_est_candidates"],
        },
        "passjoin_projected_sec": tp_proj,
        "passjoin_full_run": "OOM at 8g driver heap (candidate distinct"
                             " ~9e8 rows) — the regime boundary itself",
        "decision": dec_low,
        # the faster side among FEASIBLE strategies: PassJoin's ~9e8
        # estimated candidates exceed the heap-derived ceiling
        # (linkage.passjoin_candidate_ceiling — the measured OOM above
        # is what the ceiling encodes), so blocked is the only runnable
        # strategy at sf1 in this regime and its projected-350s rival
        # was never achievable (r7 verdict #3)
        "feasible_faster": low_faster,
        "decision_matches_faster": dec_low["strategy"] == low_faster,
        "note": (
            "at sf1 the two strategies converge in this regime (both do"
            " ~9e8 candidate-pair units); the dispatcher now rejects"
            " passjoin on the heap-derived candidate ceiling"
            " (passjoin_feasible=false) rather than winning the"
            " near-tie by the 2x overhead fudge — blocked streams the"
            " cross-product through the join while passjoin"
            " materializes candidates through a distinct (OOM at 8g"
            " measured above)"
        ),
    }

    # ---- low-entropy, THREE-WAY (round-10 verdict #2): the fine-key
    # arm measured against the same corpus, and the three-way decision
    # checked against the measured faster feasible side --------------------
    from neynar_parquet_importer_spark.plans.queries import (
        _LINKAGE_FINE_KEYS,
    )

    dec3 = lk.decide_pairs_strategy(
        dirty_c, clean_c, fine_keys=_LINKAGE_FINE_KEYS, **args_low
    )
    nf, tf, lf = timed(
        lambda: lk.fine_blocked_pairs(
            dirty_c, clean_c, ["c_nationkey"], "d_key", "c_custkey",
            "d_suffix", "c_suffix", 2, _LINKAGE_FINE_KEYS,
        )
    )
    three_way_times = {"blocked": tb, "fine_block": tf}
    if dec3["passjoin_feasible"]:
        three_way_times["passjoin"] = tp_proj
    faster3 = min(three_way_times, key=three_way_times.get)
    out["low_entropy_three_way"] = {
        "fine_block": {"pairs": nf, "sec": tf, "loadavg_1m": lf},
        "blocked_sec": tb,
        "passjoin_projected_sec": tp_proj,
        "passjoin_feasible": dec3["passjoin_feasible"],
        "decision": dec3,
        "feasible_faster": faster3,
        "decision_matches_faster": dec3["strategy"] == faster3,
    }

    # ---- high-entropy: doc prefixes, unblocked -------------------------
    docs = _t(spark, sf1_dir, "documents")
    clean_d = docs.select(
        F.col("doc_id").alias("c_id"),
        F.expr("substr(lower(text), 1, 24)").alias("c_prefix"),
    )
    dirty_d = docs.select(
        F.col("doc_id").alias("d_id"),
        F.expr(_PASSJOIN_DIRTY_EXPR).alias("d_prefix"),
    )
    args_high = dict(
        block_cols=[], left_id="d_id", right_id="c_id",
        left_text="d_prefix", right_text="c_prefix", max_distance=2,
    )
    dec_high = lk.decide_pairs_strategy(dirty_d, clean_d, **args_high)
    np2, tp2, lp2 = timed(lambda: lk.passjoin_pairs(
        dirty_d, clean_d, "d_id", "c_id", "d_prefix", "c_prefix", 2
    ))
    # the blocked leg here is the raw cross-product (2.5e9 banded
    # Levenshteins at 50k x 50k) — measured on a deterministic 1/5
    # slice of each side (1e8 pairs) and projected linearly in the pair
    # count, which is exact for a pairwise metric with no per-block
    # amortization
    frac = 5
    d_slice = dirty_d.filter(F.pmod(F.xxhash64("d_id"), F.lit(frac)) == 0)
    c_slice = clean_d.filter(F.pmod(F.xxhash64("c_id"), F.lit(frac)) == 0)
    n_ds, n_cs = d_slice.count(), c_slice.count()
    nb2, tb2, lb2 = timed(
        lambda: d_slice.crossJoin(c_slice)
        .filter(F.abs(F.length("d_prefix") - F.length("c_prefix")) <= 2)
        .withColumn("distance", F.levenshtein("d_prefix", "c_prefix", 2))
        .filter(F.col("distance") >= 0)
    )
    full_pairs = dec_high["blocked_budget"]
    slice_pairs = n_ds * n_cs
    high_faster = (
        "passjoin"
        if dec_high["passjoin_feasible"]
        and tp2 <= tb2 * full_pairs / slice_pairs
        else "blocked"
    )
    out["high_entropy_doc_prefixes"] = {
        "passjoin": {"pairs": np2, "sec": tp2, "loadavg_1m": lp2},
        "blocked_slice": {
            "pairs_found": nb2, "sec": tb2, "loadavg_1m": lb2,
            "slice_pair_budget": slice_pairs,
            "full_pair_budget": full_pairs,
        },
        "blocked_projected_sec": round(tb2 * full_pairs / slice_pairs, 1),
        "decision": dec_high,
        "feasible_faster": high_faster,
        "decision_matches_faster": dec_high["strategy"] == high_faster,
    }
    return out


def bpe_sufficiency_checks(spark) -> dict:
    """Measured sample-sufficiency for the BPE family (r7 verdict #7):
    the registered queries train on the first 1,024 docs by id
    (plans.queries._bpe_sample) and the 100 TB story claims a bounded
    sample suffices (operators/bpe.py:19-22) — this records the
    agreement between the 1,024-doc merge table and one trained on the
    FULL corpus, at sf0.1 and sf1, with the ENGINE's own distributed
    trainer on both sides. Agreement views: exact-prefix length (BPE
    merges are order-sensitive), set overlap of the merge pairs, and
    Spearman rank correlation over the common pairs. If this row ever
    breaks, the registered sample size is the bug to fix."""
    from neynar_parquet_importer_spark.operators import bpe
    from neynar_parquet_importer_spark.operators.dedup import _release_ckpt
    from neynar_parquet_importer_spark.plans.queries import (
        _BPE_N_MERGES,
        _BPE_SAMPLE,
        _bpe_sample,
        _t,
    )

    out: dict = {
        "sample_docs": _BPE_SAMPLE,
        "n_merges": _BPE_N_MERGES,
    }
    for label, d in (("sf0.1", SF01), ("sf1", SF1_DIR)):
        docs = _t(spark, d, "documents")
        n_docs = docs.count()
        t0 = time.time()
        m_sample, fin = bpe.bpe_learn(_bpe_sample(docs), "text", _BPE_N_MERGES)
        _release_ckpt(fin)
        t_sample = round(time.time() - t0, 1)
        t0 = time.time()
        m_full, fin2 = bpe.bpe_learn(docs, "text", _BPE_N_MERGES)
        _release_ckpt(fin2)
        t_full = round(time.time() - t0, 1)
        ps = [(a, b) for a, b, _ in m_sample]
        pf = [(a, b) for a, b, _ in m_full]
        prefix = 0
        for x, y in zip(ps, pf):
            if x != y:
                break
            prefix += 1
        common = sorted(set(ps) & set(pf))
        rs = {p: i for i, p in enumerate(ps)}
        rf = {p: i for i, p in enumerate(pf)}
        if len(common) >= 2:
            xs = [rs[p] for p in common]
            ys = [rf[p] for p in common]
            mx = sum(xs) / len(xs)
            my = sum(ys) / len(ys)
            num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
            den = (
                sum((x - mx) ** 2 for x in xs)
                * sum((y - my) ** 2 for y in ys)
            ) ** 0.5
            spearman = round(num / den, 4) if den else None
        else:
            spearman = None
        out[label] = {
            "n_docs_full": int(n_docs),
            "identical_tables": ps == pf,
            "prefix_agreement": prefix,
            "overlap": len(common),
            "overlap_frac": round(len(common) / max(len(pf), 1), 4),
            "spearman_common": spearman,
            "sample_merges": [f"{a}+{b}" for a, b in ps],
            "full_merges": [f"{a}+{b}:{c}" for a, b, c in m_full],
            "train_sec_sample": t_sample,
            "train_sec_full": t_full,
        }

    # Control: the gate corpus is uniform word soup, so its bigram
    # ranking is multinomial NOISE (the full-merge counts above sit a
    # fraction of a percent apart — no sample can reproduce a ranking
    # the corpus itself barely determines; even the sf0.1-full and
    # sf1-full tables disagree). An iid-Zipf draw is no better: w_i w_j
    # and w_j w_i have IDENTICAL expected counts, exact ties that stay
    # coin flips at any sample size (measured: never converges). The
    # 100 TB sample-sufficiency claim is about corpora with DIRECTED
    # bigram signal — natural language is a skewed Markov process — so
    # the control is a first-order Markov chain: after word i, with
    # p=0.6 the chain successor i+1, else an iid Zipf draw. Planted
    # bigram counts then follow the HEAD word's Zipf probability, so
    # consecutive merge decisions carry ~5-10% margins (a modulo-
    # scrambled successor map was tried first and left sub-1%
    # coincidental ties at rank 4+ — still unresolvable).
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(77)
    vocab = np.array([f"w{i}" for i in range(500)])
    p = 1.0 / (np.arange(500) + 10.0)
    p /= p.sum()
    n_docs_z = 50_000
    max_len = 120
    lengths = rng.randint(40, max_len, size=n_docs_z)
    words = np.empty((n_docs_z, max_len), dtype=np.int64)
    words[:, 0] = rng.choice(500, size=n_docs_z, p=p)
    for j in range(1, max_len):
        follow = rng.random(n_docs_z) < 0.6
        iid = rng.choice(500, size=n_docs_z, p=p)
        words[:, j] = np.where(follow, (words[:, j - 1] + 1) % 500, iid)
    texts = [
        " ".join(vocab[words[i, : lengths[i]]]) for i in range(n_docs_z)
    ]
    zdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(n_docs_z), "text": texts})
    )
    zs, fin = bpe.bpe_learn(
        zdf.orderBy("doc_id").limit(_BPE_SAMPLE), "text", _BPE_N_MERGES
    )
    _release_ckpt(fin)
    zf, fin2 = bpe.bpe_learn(zdf, "text", _BPE_N_MERGES)
    _release_ckpt(fin2)
    zps = [(a, b) for a, b, _ in zs]
    zpf = [(a, b) for a, b, _ in zf]
    zprefix = 0
    for x, y in zip(zps, zpf):
        if x != y:
            break
        zprefix += 1
    out["zipfian_control_sf1_scale"] = {
        "n_docs_full": n_docs_z,
        "distribution": "first-order Markov: p=0.6 chain successor"
                        " (i+1)%500, else iid Zipf 1/(rank+10),"
                        " 500-word vocab",
        "identical_tables": zps == zpf,
        "prefix_agreement": zprefix,
        "overlap": len(set(zps) & set(zpf)),
        "sample_merges": [f"{a}+{b}" for a, b in zps],
        "full_merges": [f"{a}+{b}:{c}" for a, b, c in zf],
    }

    # the round-8 FIX for the measured insufficiency: the sequential-
    # doubling validator (bpe.bpe_learn_stable) — record where it
    # converges on the signal corpus and that it refuses to claim
    # convergence on the noise corpus
    t0 = time.time()
    zr = bpe.bpe_learn_stable(
        zdf, "doc_id", "text", _BPE_N_MERGES, start=_BPE_SAMPLE,
        max_docs=n_docs_z,
    )
    out["doubling_validator_zipfian"] = {
        "converged": zr["converged"],
        "sample_docs": zr["sample_docs"],
        "agreed_with": zr["agreed_with"],
        "table_matches_full_corpus": [
            (a, b) for a, b, _ in zr["merges"]
        ] == zpf,
        "sec": round(time.time() - t0, 1),
    }
    t0 = time.time()
    docs1 = _t(spark, SF1_DIR, "documents")
    nr = bpe.bpe_learn_stable(
        docs1, "doc_id", "text", _BPE_N_MERGES, start=_BPE_SAMPLE,
        max_docs=50_000,
    )
    out["doubling_validator_wordsoup_sf1"] = {
        "converged": nr["converged"],
        "sample_docs": nr["sample_docs"],
        "agreed_with": nr["agreed_with"],
        "sec": round(time.time() - t0, 1),
    }
    return out


def daemon_soak_checks(
    spark,
    n_tables: int = 3,
    n_windows: int = 330,
    duration: int = 1,
    crash_after: int = 150,
    shuffle_partitions: int | None = None,
) -> dict:
    """Multi-table daemon soak at steady state with one induced
    crash/restart (r7 verdict #6): N tables each publish one 1-second
    window per second in REAL time for ~n_windows seconds; a
    run_tables_forever daemon (thread per table, shared session —
    reference main.py:154-238) imports them while a monitor records
    per-window import latency = ledger-commit observation time minus
    file publication time. Mid-run the daemon is killed (shutdown
    event + join — the supervisor-restart model of main.py:676-716)
    and restarted as FRESH pipelines over the persisted ledgers, so
    the restart replans from the ledger exactly like a process bounce.

    Publication writes parquet via pyarrow (no Spark job) so the
    publisher never competes with the importer for the scheduler.
    Reported: pooled + per-table p50/p95/p99/max latency, the count of
    windows above the window duration, and the measured outage. The
    SLA row the reference implies: p99 < the 1-second v3 window, WITH
    a crash inside the run."""
    import datetime as dt
    import shutil
    import threading

    import pyarrow as pa
    import pyarrow.parquet as papq

    from neynar_parquet_importer_spark.catalog import TableSpec
    from neynar_parquet_importer_spark.streaming import ImportPipeline
    from neynar_parquet_importer_spark.streaming.daemon import (
        run_tables_forever,
    )

    try:
        from pyspark.sql import types as T
    except ImportError:  # pragma: no cover
        raise

    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("fid", T.LongType()),
            T.StructField("target_fid", T.LongType()),
            T.StructField("updated_at", T.TimestampType()),
        ]
    )
    pa_schema = pa.schema(
        [
            ("id", pa.string()),
            ("fid", pa.int64()),
            ("target_fid", pa.int64()),
            ("updated_at", pa.timestamp("us")),
        ]
    )
    names = [f"soak{chr(ord('a') + i)}" for i in range(n_tables)]
    root = "/tmp/daemon_soak"
    shutil.rmtree(root, ignore_errors=True)
    srcs = {}
    for name in names:
        srcs[name] = os.path.join(root, f"src_{name}")
        os.makedirs(srcs[name])
    lake = os.path.join(root, "lake")

    t0 = int(time.time()) + 2  # windows start on a whole second, soon

    def _write(name: str, path: str, i: int) -> None:
        tbl = pa.table(
            {
                "id": [f"{name}-{i}"],
                "fid": [i],
                "target_fid": [2 * i],
                "updated_at": [
                    dt.datetime.utcfromtimestamp(t0 + i)
                ],
            },
            schema=pa_schema,
        )
        tmp = path + ".tmp"
        papq.write_table(tbl, tmp)
        os.replace(tmp, path)  # atomic publish, like the reference's S3 copy

    # full snapshot per table (start_ts 0 -> end t0), published up front
    for name in names:
        _write(name, os.path.join(srcs[name], f"nindexer-{name}-0-{t0}.parquet"), 0)

    def mk_pipes():
        # this harness's publisher lands files AT window close on local
        # fs, so the wait cadence is configured to match (the +1s/1s
        # defaults model the reference's S3 exporter — pipeline.py)
        return [
            ImportPipeline(
                spark,
                TableSpec(name=n, schema=schema, primary_key=("id",)),
                srcs[n],
                lake,
                incremental_duration=duration,
                publish_eta_offset=0.05,
                poll_interval=0.05,
            )
            for n in names
        ]

    pipes_ref: dict[str, ImportPipeline] = {p.spec.name: p for p in mk_pipes()}
    shutdown = threading.Event()
    daemon_box = {}

    def run_daemon(ev):
        daemon_box["reports"] = run_tables_forever(
            list(pipes_ref.values()),
            shutdown=ev,
            shuffle_partitions=shuffle_partitions,
        )

    daemon = threading.Thread(target=run_daemon, args=(shutdown,), daemon=True)
    daemon.start()

    pub_time: dict[str, dict[int, float]] = {n: {} for n in names}
    commit_lat: dict[str, dict[int, float]] = {n: {} for n in names}
    stop_monitor = threading.Event()

    def monitor():
        while not stop_monitor.is_set():
            now = time.time()
            for n in names:
                rp = pipes_ref[n].ledger.resume_point()
                if rp is None:
                    continue
                for i, tp in list(pub_time[n].items()):
                    if i in commit_lat[n]:
                        continue
                    if rp >= t0 + (i + 1) * duration:
                        commit_lat[n][i] = now - tp
            time.sleep(0.02)

    mon = threading.Thread(target=monitor, daemon=True)
    mon.start()

    def publisher():
        # real-time publication, UNAFFECTED by the crash: the reference's
        # exporter keeps publishing while the importer is down
        for i in range(n_windows):
            target = t0 + (i + 1) * duration
            nap = target - time.time()
            if nap > 0:
                time.sleep(nap)
            for name in names:
                fn = (
                    f"nindexer-{name}-{t0 + i * duration}"
                    f"-{t0 + (i + 1) * duration}.parquet"
                )
                _write(name, os.path.join(srcs[name], fn), i + 1)
                pub_time[name][i] = time.time()

    pub = threading.Thread(target=publisher, daemon=True)
    pub.start()

    # induced crash mid-stream: fence the daemon, join it, restart
    # FRESH pipelines over the persisted ledgers (supervisor model).
    # +0.15 lands the kill while the just-published window's import is
    # typically IN FLIGHT (imports take ~0.4-0.6 s), so the outage
    # includes draining an in-progress catch-up, not an idle wait
    crash_at = t0 + crash_after * duration + 0.15
    nap = crash_at - time.time()
    if nap > 0:
        time.sleep(nap)
    k0 = time.time()
    shutdown.set()
    daemon.join(timeout=30)
    for p in mk_pipes():
        pipes_ref[p.spec.name] = p
    shutdown = threading.Event()
    daemon = threading.Thread(target=run_daemon, args=(shutdown,), daemon=True)
    daemon.start()
    outage = round(time.time() - k0, 3)
    crash_meta = {
        "crash_after_window": crash_after,
        "outage_sec": outage,
        "daemon_joined": daemon_box.get("reports") is not None,
    }
    pub.join(timeout=n_windows * duration + 60)

    # drain: every published window must commit (bounded wait)
    deadline = time.time() + 60
    while time.time() < deadline:
        if all(
            len(commit_lat[n]) == n_windows for n in names
        ):
            break
        time.sleep(0.1)
    stop_monitor.set()
    shutdown.set()
    daemon.join(timeout=30)
    mon.join(timeout=5)

    def pct(sorted_xs, q):
        if not sorted_xs:
            return None
        k = min(len(sorted_xs) - 1, int(round(q * (len(sorted_xs) - 1))))
        return round(sorted_xs[k], 3)

    pooled = sorted(
        x for n in names for x in commit_lat[n].values()
    )
    # steady state = windows past the first 10 (session warm, snapshot
    # imported); the CRASH WINDOWS STAY INCLUDED — the SLA claim is
    # "p99 under the window duration with a crash inside the run"
    steady = sorted(
        x
        for n in names
        for i, x in commit_lat[n].items()
        if i >= 10
    )
    per_table = {
        n: {
            "n_committed": len(commit_lat[n]),
            "p50": pct(sorted(commit_lat[n].values()), 0.50),
            "p99": pct(sorted(commit_lat[n].values()), 0.99),
            "max": round(max(commit_lat[n].values()), 3)
            if commit_lat[n]
            else None,
        }
        for n in names
    }
    return {
        "n_tables": n_tables,
        "n_windows_per_table": n_windows,
        "window_duration_sec": duration,
        "n_committed_total": len(pooled),
        "n_published_total": n_tables * n_windows,
        "latency_p50": pct(pooled, 0.50),
        "latency_p95": pct(pooled, 0.95),
        "latency_p99": pct(pooled, 0.99),
        "latency_max": round(pooled[-1], 3) if pooled else None,
        "n_over_window": sum(1 for x in pooled if x > duration),
        "steady_state": {
            "from_window": 10,
            "n": len(steady),
            "p50": pct(steady, 0.50),
            "p99": pct(steady, 0.99),
            "max": round(steady[-1], 3) if steady else None,
            "crash_included": True,
        },
        "per_table": per_table,
        "crash": crash_meta,
        "met_p99_under_window": bool(steady) and pct(steady, 0.99) < duration,
        "monitor_poll_sec": 0.02,
        "shuffle_partitions": shuffle_partitions,
        "loadavg_1m_end": round(_load1(), 1),
    }


# --- process-sharded daemon soak (round-10 verdict #1) -------------------
# The round-9 soak measured one shared local driver saturating at ~8-12
# tables of 1-second windows (steady p99 2.42s at the reference's 18-table
# topology even with the shuffle_partitions=4 knob); the reference's own
# answer is scale-OUT — one importer process per table set
# (main.py:676-716 runs the full v3 table list per process and deployments
# add processes). This harness measures that story instead of asserting
# it: the 18 tables sharded across N OS processes, each owning its own
# SparkSession, same real-time publication + latency accounting + mid-run
# crash as the single-process soak.

_SOAK_SHARDED_ROOT = os.environ.get(
    "SPARK_GRAFT_SOAK_ROOT", "/tmp/daemon_soak_sharded"
)


def _soak_names(n_tables: int) -> list[str]:
    return [f"soak{chr(ord('a') + i)}" for i in range(n_tables)]


def _soak_pa_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("id", pa.string()),
            ("fid", pa.int64()),
            ("target_fid", pa.int64()),
            ("updated_at", pa.timestamp("us")),
        ]
    )


def _soak_write_window(name: str, path: str, i: int, t0: int) -> None:
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as papq

    tbl = pa.table(
        {
            "id": [f"{name}-{i}"],
            "fid": [i],
            "target_fid": [2 * i],
            "updated_at": [dt.datetime.utcfromtimestamp(t0 + i)],
        },
        schema=_soak_pa_schema(),
    )
    tmp = path + ".tmp"
    papq.write_table(tbl, tmp)
    os.replace(tmp, path)  # atomic publish, like the reference's S3 copy


def _pct(sorted_xs: list, q: float):
    if not sorted_xs:
        return None
    k = min(len(sorted_xs) - 1, int(round(q * (len(sorted_xs) - 1))))
    return round(sorted_xs[k], 3)


def soak_child_main(cfg_path: str) -> None:
    """One shard of the sharded soak: owns its SparkSession (the
    reference's deployment unit) and runs ``run_tables_forever`` over
    its table subset, appending one JSONL line per committed window to
    ``commits_out`` the moment its monitor observes the ledger advance.
    The log is a line-buffered append-only file, so it survives a
    SIGKILL mid-run; the parent joins it against its own publication
    log to compute end-to-end latency on one clock (same host).

    Crash protocol: a ``crash_flag`` file triggers the in-JVM
    supervisor bounce (fence + join + fresh pipelines over the
    persisted ledgers — the crash model of the single-process soak);
    in SIGKILL mode the parent kills the whole process instead and
    respawns it, and this function simply resumes from the ledgers
    (re-emitting commit lines it cannot know were already logged —
    the parent dedups first-line-wins, so pre-kill observations keep
    their original timestamps)."""
    import threading

    with open(cfg_path) as f:
        cfg = json.load(f)
    names = list(cfg["tables"])
    duration = int(cfg["duration"])
    n_windows = int(cfg["n_windows"])

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from neynar_parquet_importer_spark.catalog import TableSpec
    from neynar_parquet_importer_spark.session import get_spark
    from neynar_parquet_importer_spark.streaming import ImportPipeline
    from neynar_parquet_importer_spark.streaming.daemon import (
        run_tables_forever,
    )

    spark = get_spark(
        app_name=f"soak-shard-{cfg['shard']}",
        master=f"local[{cfg['cpus']}]",
        shuffle_partitions=int(cfg["shuffle_partitions"]),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "3g",
            "spark.sql.warehouse.dir": os.path.join(
                cfg["root"], f"wh-{cfg['shard']}"
            ),
            # daemon-session GC cadence: session.py's 5-min periodic
            # System.gc() exists for long ANALYTICS sequences (big dead
            # shuffle/broadcast blocks); a window daemon generates tiny
            # debris, and the measured ~1s Full-GC pause put an 8-11s
            # latency bump across every table at the 5-min mark. 30 min
            # bounds cleaner backlog while the pause lands on ~0.06% of
            # 1-second windows — below the p99 the SLA row tracks.
            "spark.cleaner.periodicGC.interval": "30min",
            # gc attribution for latency spikes: the shards start in the
            # same second and run identical workloads, so per-JVM pauses
            # land in lockstep and look like a host-global stall
            "spark.driver.extraJavaOptions": (
                "-Xlog:gc:file="
                + os.path.join(cfg["root"], f"gc-{cfg['shard']}.log")
                + ":time,uptime"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # pay codegen + shuffle machinery spin-up before declaring ready
    spark.range(100000).withColumn("b", F.col("id") % 7).groupBy(
        "b"
    ).count().collect()

    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("fid", T.LongType()),
            T.StructField("target_fid", T.LongType()),
            T.StructField("updated_at", T.TimestampType()),
        ]
    )

    def mk_pipes():
        return [
            ImportPipeline(
                spark,
                TableSpec(name=n, schema=schema, primary_key=("id",)),
                cfg["srcs"][n],
                cfg["lake"],
                incremental_duration=duration,
                publish_eta_offset=0.05,
                poll_interval=0.05,
            )
            for n in names
        ]

    pipes = {p.spec.name: p for p in mk_pipes()}

    def parent_alive() -> bool:
        # an aborted parent must not leave orphan importers: a stale
        # child sharing (recreated) harness paths with a later run is
        # two processes importing the same table — measured once as
        # same-epoch staging collisions before per-run roots + this
        # check existed
        try:
            os.kill(int(cfg["parent_pid"]), 0)
            return True
        except OSError:
            return False

    # readiness handshake: the parent writes snapshots and the shared t0
    # only after every shard reports a warm session
    with open(cfg["ready_flag"], "w") as f:
        f.write(str(time.time()))
    while not os.path.exists(cfg["t0_file"]):
        if os.path.exists(cfg["stop_flag"]) or not parent_alive():
            spark.stop()
            return
        time.sleep(0.05)
    with open(cfg["t0_file"]) as f:
        t0 = int(f.read().strip())

    commits = open(cfg["commits_out"], "a", buffering=1)
    done_upto = {n: 0 for n in names}
    stop_monitor = threading.Event()

    def sweep() -> None:
        now = time.time()
        for n in names:
            rp = pipes[n].ledger.resume_point()
            if rp is None:
                continue
            hi = min(int((rp - t0) // duration), n_windows)
            for i in range(done_upto[n], hi):
                commits.write(
                    json.dumps(
                        {
                            "table": n,
                            "i": i,
                            "t": now,
                            "pid": os.getpid(),
                            "thr": threading.current_thread().name,
                        }
                    )
                    + "\n"
                )
            done_upto[n] = max(done_upto[n], hi)

    def monitor():
        while not stop_monitor.is_set():
            sweep()
            time.sleep(0.02)

    mon_thread = threading.Thread(target=monitor, daemon=True)
    mon_thread.start()

    while True:
        shutdown = threading.Event()
        box: dict = {}

        def run(ev=shutdown):
            box["reports"] = run_tables_forever(
                list(pipes.values()), shutdown=ev
            )

        daemon = threading.Thread(target=run, daemon=True)
        daemon.start()
        action = None
        while action is None:
            if os.path.exists(cfg["stop_flag"]) or not parent_alive():
                action = "stop"
            elif os.path.exists(cfg["crash_flag"]):
                action = "crash"
            else:
                time.sleep(0.05)
        k0 = time.time()
        shutdown.set()
        daemon.join(timeout=30)
        if action == "stop":
            break
        # in-JVM supervisor bounce: fresh pipelines over the persisted
        # ledgers; the SIGKILL variant never reaches this branch
        for p in mk_pipes():
            pipes[p.spec.name] = p
        with open(cfg["outage_out"], "w") as f:
            json.dump(
                {
                    "outage_sec": round(time.time() - k0, 3),
                    "daemon_joined": box.get("reports") is not None,
                },
                f,
            )
        os.replace(cfg["crash_flag"], cfg["crash_flag"] + ".done")
    stop_monitor.set()
    mon_thread.join(timeout=5)  # never two writers racing in sweep()
    sweep()  # a commit landing between monitor polls must not be lost
    commits.close()
    spark.stop()


def daemon_soak_sharded_checks(
    n_tables: int = 18,
    n_shards: int = 3,
    n_windows: int = 330,
    duration: int = 1,
    crash_after: int = 150,
    crash_mode: str = "bounce",
    shuffle_partitions: int = 4,
    child_cpus: int = 8,
) -> dict:
    """Parent/supervisor of the sharded soak. Stays Spark-free: spawns
    one ``--soak-child`` process per shard, publishes every table's
    1-second windows in real time via pyarrow (never competing for any
    shard's scheduler), induces one mid-run crash in shard 0 ('bounce' =
    the in-JVM fence+join+fresh-pipelines crash model of the
    single-process soak; 'sigkill' = SIGKILL the whole shard process and
    respawn it cold, so the outage includes a full JVM+session start),
    then joins the shards' commit logs against its publication log.

    The SLA row mirrors the single-process soak: steady-state (window
    >= 10) pooled p99 across ALL tables, crash windows included, must
    come in under the 1-second window duration."""
    import shutil
    import subprocess
    import sys as _sys
    import threading

    if crash_mode not in ("bounce", "sigkill"):
        raise ValueError(f"unknown crash_mode {crash_mode!r}")
    load_start = round(_load1(), 1)
    names = _soak_names(n_tables)
    shards = [names[k::n_shards] for k in range(n_shards)]
    # per-RUN root: paths are never recreated across runs, so a stale
    # child from an aborted run can never alias a later run's tables
    # (measured once: two child sets importing the same table produced
    # same-epoch staging collisions); children also watch parent_pid and
    # exit when the supervisor dies, so stale runs self-clean
    shutil.rmtree(_SOAK_SHARDED_ROOT, ignore_errors=True)
    root = os.path.join(
        _SOAK_SHARDED_ROOT, time.strftime("run-%Y%m%dT%H%M%S")
    )
    os.makedirs(root)
    srcs = {n: os.path.join(root, f"src_{n}") for n in names}
    for d in srcs.values():
        os.makedirs(d)
    lake = os.path.join(root, "lake")
    here = os.path.abspath(__file__)

    cfgs = []
    for k, shard in enumerate(shards):
        cfg = {
            "shard": k,
            "tables": shard,
            "srcs": {n: srcs[n] for n in shard},
            "lake": lake,
            "root": root,
            "duration": duration,
            "n_windows": n_windows,
            "cpus": child_cpus,
            "shuffle_partitions": shuffle_partitions,
            "commits_out": os.path.join(root, f"commits-{k}.jsonl"),
            "ready_flag": os.path.join(root, f"ready-{k}"),
            "stop_flag": os.path.join(root, "stop"),
            "crash_flag": os.path.join(root, f"crash-{k}"),
            "outage_out": os.path.join(root, f"outage-{k}.json"),
            "t0_file": os.path.join(root, "t0"),
            "parent_pid": os.getpid(),
        }
        with open(os.path.join(root, f"cfg-{k}.json"), "w") as f:
            json.dump(cfg, f)
        cfgs.append(cfg)

    def spawn(k: int):
        log = open(os.path.join(root, f"shard-{k}.log"), "a")
        return subprocess.Popen(
            [
                _sys.executable,
                here,
                "--soak-child",
                os.path.join(root, f"cfg-{k}.json"),
            ],
            stdout=log,
            stderr=log,
            cwd=os.path.dirname(here),
        )

    procs = [spawn(k) for k in range(n_shards)]
    spawn_t = time.time()
    ready_deadline = spawn_t + 240
    while time.time() < ready_deadline and not all(
        os.path.exists(c["ready_flag"]) for c in cfgs
    ):
        time.sleep(0.2)
    ready_wait = round(time.time() - spawn_t, 1)
    if not all(os.path.exists(c["ready_flag"]) for c in cfgs):
        for p in procs:
            p.kill()
        raise SystemExit(
            f"sharded soak: shards not ready after {ready_wait}s; "
            f"see {root}/shard-*.log"
        )

    t0 = int(time.time()) + 3
    for n in names:
        _soak_write_window(
            n, os.path.join(srcs[n], f"nindexer-{n}-0-{t0}.parquet"), 0, t0
        )
    with open(cfgs[0]["t0_file"] + ".tmp", "w") as f:
        f.write(str(t0))
    os.replace(cfgs[0]["t0_file"] + ".tmp", cfgs[0]["t0_file"])

    pub_time: dict[str, dict[int, float]] = {n: {} for n in names}

    def publisher():
        # real-time publication, unaffected by the crash: the exporter
        # keeps shipping while an importer shard is down
        for i in range(n_windows):
            target = t0 + (i + 1) * duration
            nap = target - time.time()
            if nap > 0:
                time.sleep(nap)
            for name in names:
                fn = (
                    f"nindexer-{name}-{t0 + i * duration}"
                    f"-{t0 + (i + 1) * duration}.parquet"
                )
                _soak_write_window(
                    name, os.path.join(srcs[name], fn), i + 1, t0
                )
                pub_time[name][i] = time.time()

    pub = threading.Thread(target=publisher, daemon=True)
    pub.start()

    # induced crash in shard 0 while an import is typically in flight
    # (same +0.15 offset as the single-process soak); crash_after past
    # the run length = no crash (diagnostic mode)
    crash_meta: dict = {
        "mode": crash_mode,
        "crash_after_window": crash_after,
        "shard": 0,
        "tables": shards[0],
    }
    kill_window = None
    if crash_after >= n_windows:
        crash_meta["mode"] = "none"
        crash_mode = "none"
    else:
        crash_at = t0 + crash_after * duration + 0.15
        nap = crash_at - time.time()
        if nap > 0:
            time.sleep(nap)
    k0 = time.time()
    if crash_mode == "none":
        pass
    elif crash_mode == "bounce":
        with open(cfgs[0]["crash_flag"] + ".tmp", "w") as f:
            f.write("1")
        os.replace(cfgs[0]["crash_flag"] + ".tmp", cfgs[0]["crash_flag"])
        bounce_deadline = time.time() + 90
        while time.time() < bounce_deadline and not os.path.exists(
            cfgs[0]["crash_flag"] + ".done"
        ):
            time.sleep(0.05)
        try:
            with open(cfgs[0]["outage_out"]) as f:
                crash_meta.update(json.load(f))
        except OSError:
            crash_meta["outage_sec"] = None
    else:
        procs[0].kill()  # SIGKILL: no drain, no goodbye — supervisor model
        procs[0].wait(timeout=30)
        os.remove(cfgs[0]["ready_flag"])
        procs[0] = spawn(0)
        respawn_deadline = time.time() + 240
        while time.time() < respawn_deadline and not os.path.exists(
            cfgs[0]["ready_flag"]
        ):
            time.sleep(0.1)
        crash_meta["outage_sec"] = round(time.time() - k0, 3)
        crash_meta["outage_includes"] = "full JVM + SparkSession cold start"
        kill_window = (k0, time.time())
    pub.join(timeout=n_windows * duration + 300)

    def n_committed() -> int:
        seen = set()
        for c in cfgs:
            try:
                with open(c["commits_out"]) as f:
                    for ln in f:
                        if ln.strip():
                            rec = json.loads(ln)
                            seen.add((rec["table"], rec["i"]))
            except OSError:
                pass
        return len(seen)

    want = n_tables * n_windows
    drain_deadline = time.time() + 120
    while time.time() < drain_deadline and n_committed() < want:
        time.sleep(0.2)
    with open(os.path.join(root, "stop.tmp"), "w") as f:
        f.write("1")
    os.replace(os.path.join(root, "stop.tmp"), cfgs[0]["stop_flag"])
    for p in procs:
        try:
            p.wait(timeout=90)
        except subprocess.TimeoutExpired:
            p.kill()

    # join commit logs against the publication log; first line per
    # (table, window) wins, so a SIGKILL respawn's re-emissions never
    # overwrite pre-kill observations
    commit_lat: dict[str, dict[int, float]] = {n: {} for n in names}
    for c in cfgs:
        with open(c["commits_out"]) as f:
            for ln in f:
                if not ln.strip():
                    continue
                rec = json.loads(ln)
                tname, i = rec["table"], rec["i"]
                if i in pub_time[tname] and i not in commit_lat[tname]:
                    commit_lat[tname][i] = rec["t"] - pub_time[tname][i]

    with open(os.path.join(root, "pub_times.json"), "w") as f:
        json.dump(pub_time, f)  # post-hoc latency forensics per run

    pooled = sorted(x for n in names for x in commit_lat[n].values())
    steady = sorted(
        x
        for n in names
        for i, x in commit_lat[n].items()
        if i >= 10
    )
    per_shard = {}
    for k, shard in enumerate(shards):
        xs = sorted(
            x for n in shard for i, x in commit_lat[n].items() if i >= 10
        )
        per_shard[f"shard{k}"] = {
            "tables": len(shard),
            "n_steady": len(xs),
            "p50": _pct(xs, 0.50),
            "p99": _pct(xs, 0.99),
            "max": round(xs[-1], 3) if xs else None,
        }
    block = {
        "n_tables": n_tables,
        "n_shards": n_shards,
        "tables_per_shard": [len(s) for s in shards],
        "child_cpus": child_cpus,
        "shuffle_partitions": shuffle_partitions,
        "n_windows_per_table": n_windows,
        "window_duration_sec": duration,
        "n_committed_total": len(pooled),
        "n_published_total": want,
        "latency_p50": _pct(pooled, 0.50),
        "latency_p95": _pct(pooled, 0.95),
        "latency_p99": _pct(pooled, 0.99),
        "latency_max": round(pooled[-1], 3) if pooled else None,
        "n_over_window": sum(1 for x in pooled if x > duration),
        "steady_state": {
            "from_window": 10,
            "n": len(steady),
            "p50": _pct(steady, 0.50),
            "p95": _pct(steady, 0.95),
            "p99": _pct(steady, 0.99),
            "max": round(steady[-1], 3) if steady else None,
            "crash_included": True,
        },
        "per_shard": per_shard,
        "crash": crash_meta,
        "met_p99_under_window": bool(steady)
        and _pct(steady, 0.99) < duration,
        "shard_ready_wait_sec": ready_wait,
        "monitor_poll_sec": 0.02,
        "loadavg_1m_start": load_start,
        "loadavg_1m_end": round(_load1(), 1),
    }
    if kill_window is not None:
        # transparency row for the SIGKILL variant: the steady
        # distribution with the killed shard's outage-published windows
        # excluded, so the cold-restart pileup is separable from the
        # steady-state keep-up claim (both are reported; neither is
        # hidden)
        excl = set()
        for n in shards[0]:
            for i, tp in pub_time[n].items():
                if kill_window[0] <= tp <= kill_window[1]:
                    excl.add((n, i))
        kept = sorted(
            x
            for n in names
            for i, x in commit_lat[n].items()
            if i >= 10 and (n, i) not in excl
        )
        block["steady_excl_outage_windows"] = {
            "n_excluded": len(excl),
            "n": len(kept),
            "p50": _pct(kept, 0.50),
            "p99": _pct(kept, 0.99),
            "max": round(kept[-1], 3) if kept else None,
        }
    return block


def zorder_skip_checks(spark, sf1_dir: str) -> dict:
    """Measured row-group skip ratios of the z-order WRITE path at sf1
    (r6 verdict #6): the 1M-row events table written three ways —
    layout.write_zordered on (user_id, event seconds), a single-column
    range sort on seconds, and an unsorted hash repartition — then the
    mean footer-stats skip fraction over eight evenly-spaced 5%-of-
    domain range probes per dimension. The z-order claim in numbers:
    both dims prune (~1 - 1/sqrt(files) each), where the single-column
    sort prunes only its own dimension and the unsorted layout prunes
    neither."""
    from pyspark.sql import functions as F

    from neynar_parquet_importer_spark.operators import layout as lay
    from neynar_parquet_importer_spark.plans.queries import (
        _ntz_epoch_seconds,
        _t,
    )

    ev = _t(spark, sf1_dir, "events")
    base = ev.select(
        F.col("event_id").cast("long").alias("eid"),
        F.col("user_id").cast("long").alias("uid"),
        _ntz_epoch_seconds("ts").alias("secs"),
    )
    zdir, sdir, udir = "/tmp/zskip_z", "/tmp/zskip_secs", "/tmp/zskip_none"
    lay.write_zordered(base, zdir, "uid", "secs", bits=16, n_buckets=64)
    (
        base.repartitionByRange(64, "secs").sortWithinPartitions("secs")
        .write.mode("overwrite").parquet(sdir)
    )
    base.repartition(64).write.mode("overwrite").parquet(udir)

    lo = base.agg(
        F.min("uid"), F.max("uid"), F.min("secs"), F.max("secs")
    ).first()
    umin, umax, smin, smax = (int(x) for x in lo)
    n_rows = base.count()

    def probes(mn, mx, n=8, frac=0.05):
        span = mx - mn
        w = max(1, int(span * frac))
        step = max(1, (span - w) // (n - 1))
        return [(mn + i * step, mn + i * step + w) for i in range(n)]

    out: dict = {
        "n_rows": n_rows,
        "probe": "8 evenly spaced 5%-of-domain ranges per dim",
    }
    for name, path in (("zorder", zdir), ("secs_sorted", sdir),
                       ("unsorted", udir)):
        stats = lay.parquet_rowgroup_stats(path, ["uid", "secs"])
        u = [lay.skip_fraction(stats, "uid", a, b)
             for a, b in probes(umin, umax)]
        s = [lay.skip_fraction(stats, "secs", a, b)
             for a, b in probes(smin, smax)]
        out[name] = {
            "row_groups": len(stats),
            "skip_uid_mean": round(sum(u) / len(u), 4),
            "skip_secs_mean": round(sum(s) / len(s), 4),
        }
    return out


def _rows(parquet_path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(parquet_path).metadata.num_rows


def _load1() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:
        return -1.0


_RESULT_PREFIX = "##RESULT## "
_SCALE_DIRS = {"sf0.1": SF01, "sf1": SF1_DIR, "sf10": SF10_DIR}
# generous per-(query,scale) ceiling: the slowest clean measurement seen
# (forced-LSH probe at sf1) is ~150 s/pass; a subprocess past this is
# hung, not slow, and the study should fail with its captured output
_SINGLE_TIMEOUT_S = 1800


def _measure_single(name: str, scale: str, passes_n: int = 2) -> None:
    """Measure ONE query at ONE scale inside THIS (fresh) process and
    print a machine-readable result line.

    Why a process per (query, scale): measured in round 6, a query's
    in-session cost at sf1 depends on what ran before it —
    `embedding_semdedup` was 2.8 s standalone, 7.3 s after 11 family
    queries, and 46 s (both passes, 20 min apart) deep inside the old
    single-session sweep, with LOW loadavg during the slow passes.
    Predecessor queries' async shuffle cleanup, Python-worker pools, JVM
    heap fragmentation, and page-cache eviction pollute successors in
    ways release_cached() + System.gc() cannot undo, and min-of-2 cannot
    defend against a session that is PERSISTENTLY degraded by the time
    the query runs. A scaling exponent should measure the query, not the
    session debris — and both scales must be measured under the SAME
    state (a shared process would run sf1 after sf0.1's debris, biasing
    the ratio up) — so each (query, scale) pair gets its own fresh JVM:
    warmup at sf0.01, then `passes_n` timed passes. Per-pass raw timings
    + loadavg stay in the artifact so noise remains diagnosable."""
    from neynar_parquet_importer_spark.operators.dedup import release_cached
    from neynar_parquet_importer_spark.plans.queries import QUERIES
    from neynar_parquet_importer_spark.session import get_spark

    sf_dir = _SCALE_DIRS[scale]
    spark = get_spark(
        app_name=f"scale-{name}-{scale}",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        QUERIES[name](spark, "/root/testdata/sf0.01").count()
    except Exception:
        pass  # a warmup failure surfaces in the timed pass with a trace
    ps: list[float] = []
    ls: list[float] = []
    for _ in range(passes_n):
        release_cached()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        ls.append(_load1())
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        ps.append(round(time.perf_counter() - t0, 3))
    spark.stop()
    out = {"query": name, scale: {"passes": ps, "loadavg_1m": ls}}
    print(_RESULT_PREFIX + json.dumps(out), flush=True)


def time_queries_isolated(names: list[str], passes_n: int = 2) -> tuple[dict, dict]:
    """Run `--single` for every (query, scale) in its own subprocess;
    returns the (sf0.1, sf1) result dicts in the artifact's schema. A
    subprocess that exits non-zero, hangs past the per-measurement
    timeout, or produces no result line fails the study loudly with its
    captured output — a half-dead measurement must never enter
    BENCH_SCALING.json as a number."""
    import subprocess
    import sys

    r01: dict = {"passes": {}, "loadavg_1m": {}, "timings": {}}
    r1: dict = {"passes": {}, "loadavg_1m": {}, "timings": {}}
    here = os.path.abspath(__file__)
    for name in names:
        for res, scale in [(r01, "sf0.1"), (r1, "sf1")]:
            try:
                proc = subprocess.run(
                    [sys.executable, here, "--single", name, scale, str(passes_n)],
                    capture_output=True,
                    text=True,
                    cwd=os.path.dirname(here),
                    timeout=_SINGLE_TIMEOUT_S,
                )
            except subprocess.TimeoutExpired as exc:
                raise SystemExit(
                    f"measurement hung (> {_SINGLE_TIMEOUT_S}s) for"
                    f" {name} @ {scale}:\n"
                    f"{(exc.stdout or b'')[-2000:]}\n{(exc.stderr or b'')[-2000:]}"
                ) from exc
            line = next(
                (
                    ln
                    for ln in reversed(proc.stdout.splitlines())
                    if ln.startswith(_RESULT_PREFIX)
                ),
                None,
            )
            if proc.returncode != 0 or line is None:
                raise SystemExit(
                    f"measurement subprocess failed for {name} @ {scale}"
                    f" (returncode {proc.returncode}):\n"
                    f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
                )
            d = json.loads(line[len(_RESULT_PREFIX):])
            res["passes"][name] = d[scale]["passes"]
            res["loadavg_1m"][name] = d[scale]["loadavg_1m"]
            res["timings"][name] = min(d[scale]["passes"])
        print(
            f"{name}: sf0.1 {r01['timings'][name]}s  sf1 {r1['timings'][name]}s",
            flush=True,
        )
    return r01, r1


def scale_checks(spark, sf1_dir: str) -> dict:
    """The three empirical scale-claim checks at sf1 (see module doc)."""
    from pyspark.sql import functions as F

    from neynar_parquet_importer_spark.operators import dedup as dd
    from neynar_parquet_importer_spark.operators import similarity as sim
    from neynar_parquet_importer_spark.plans.queries import _t

    out: dict = {}
    emb = _t(spark, sf1_dir, "embeddings")
    dim = len(emb.select("embedding").head()[0])

    # crossover: exact vs forced-LSH wall time on the same 20k vectors
    t0 = time.perf_counter()
    n_exact = sim.exact_cosine_pairs_blocked(emb, 0.5).count()
    t_exact = round(time.perf_counter() - t0, 3)
    dd.release_cached()
    t0 = time.perf_counter()
    n_lsh = sim.lsh_near_dup_pairs(emb, dim, threshold=0.5).count()
    t_lsh = round(time.perf_counter() - t0, 3)
    dd.release_cached()
    out["crossover"] = {
        "n_vectors": emb.count(), "exact_sec": t_exact, "lsh_sec": t_lsh,
        "exact_pairs": n_exact, "lsh_pairs": n_lsh,
        "exact_still_cheaper": t_exact <= t_lsh,
    }

    # banding recall vs capped all-pairs ground truth at >= 0.8
    docs = _t(spark, sf1_dir, "documents")
    truth = dd.jaccard_all_pairs(
        docs, "text", "doc_id", threshold=0.8, max_shingle_df=0.05
    ).select("id_a", "id_b")
    hot = dd.hot_shingles(docs, 0.05, "text", "doc_id", 3)
    sigs = dd.minhash_signatures(docs, num_hashes=64, shingle_n=3, hot=hot)
    cand = (
        dd.minhash_lsh_candidates(sigs, bands=16, rows_per_band=4)
        .filter(F.col("est_jaccard") >= 0.5)
        .select("id_a", "id_b")
    )
    rerank = dd.ngram_jaccard_pairs(docs, cand, "text", "doc_id", hot=hot).filter(
        F.col("jaccard") >= 0.8
    ).select("id_a", "id_b")
    n_truth = truth.count()
    n_hit = truth.join(rerank, ["id_a", "id_b"], "left_semi").count()
    dd.release_cached()
    out["banding_recall"] = {
        "ground_truth_pairs": n_truth, "recovered": n_hit,
        "recall": round(n_hit / n_truth, 4) if n_truth else None,
    }

    # fractional df-cap: share of shingle MASS capped at each scale. Two
    # cap levels: the production 5% (names nothing on this boilerplate-
    # free synthetic corpus — itself a meaningful result: the cap only
    # fires on genuine hot mass) and a tight 0.2% that does fire, to
    # verify the FRACTION of capped posting mass stays comparable across
    # an order of magnitude (an absolute cap would collapse to 0 at 10x).
    def cap_stats(sf_dir, frac):
        d = _t(spark, sf_dir, "documents")
        dist = (
            dd._shingle_stream(d, "text", "doc_id", 3)
            .select("id", F.xxhash64("shingle").alias("shingle"))
            .distinct()
        )
        h = dd._hot_from_dist(dist, d, frac)
        total = dist.count()
        capped = dist.join(F.broadcast(h), "shingle", "left_semi").count()
        dd.release_cached()
        return {"hot_shingles": h.count(), "postings_total": total,
                "postings_capped": capped,
                "capped_mass_frac": round(capped / total, 4)}

    out["df_cap"] = {
        f"cap_{frac}": {"sf0.1": cap_stats(SF01, frac),
                        "sf1": cap_stats(sf1_dir, frac)}
        for frac in (0.05, 0.002)
    }
    return out


def ann_recall_checks(spark, sf1_dir: str) -> dict:
    """Per-index recall at sf1 vs exact ground truth (r5 verdict #6).

    Top-k: recall@20 over 10 query vectors for each index family, using
    the registered queries' own parameters (LSH: 8 planes, 1-bit
    multiprobe; IVF: nprobe=6 of 16 trained centroids; PQ: 8 subspaces x
    16 centroids, ADC). Ground truth = knn_join (exact, deterministic
    tie order). Pairs: multi-table LSH at cos>=0.9 vs the exact blocked
    scan — the auto-plane/auto-table rule's >=0.98-recall design point,
    measured where the planted near-dups actually live."""
    from pyspark.sql import functions as F

    from neynar_parquet_importer_spark.operators import dedup as dd
    from neynar_parquet_importer_spark.operators import similarity as sim
    from neynar_parquet_importer_spark.plans.queries import _t

    emb = _t(spark, sf1_dir, "embeddings")
    dim = len(emb.select("embedding").head()[0])
    n_q, k = 10, 20

    queries = emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth: dict[int, set[int]] = {q: set() for q in range(n_q)}
    for r in sim.knn_join(emb, queries, k=k).collect():
        truth[r["query_id"]].add(r["neighbor_id"])
    qvecs = {
        r["query_id"]: list(r["embedding"]) for r in queries.collect()
    }
    centroids = sim.ivf_centroids(emb, n_centroids=16)
    codebooks = sim.pq_codebooks(emb, n_sub=8)

    recalls: dict[str, list[float]] = {"lsh_topk": [], "ivf_topk": [], "pq_topk": []}
    for q in range(n_q):
        got = {
            r["vec_id"]
            for r in sim.lsh_bucketed_topk(
                emb, qvecs[q], k=k, n_planes=8
            ).collect()
        }
        recalls["lsh_topk"].append(len(got & truth[q]) / k)
        got = {
            r["vec_id"]
            for r in sim.ivf_topk(
                emb, qvecs[q], k=k, centroids=centroids, nprobe=6
            ).collect()
        }
        recalls["ivf_topk"].append(len(got & truth[q]) / k)
        got = {
            r["vec_id"]
            for r in sim.pq_topk(emb, qvecs[q], k=k, codebooks=codebooks).collect()
        }
        recalls["pq_topk"].append(len(got & truth[q]) / k)
    out = {
        name: {
            "recall_at_20": round(sum(rs) / len(rs), 4),
            "per_query": rs,
            "n_queries": n_q,
        }
        for name, rs in recalls.items()
    }
    # context for the reader: the sf1 corpus is a near-uniform Gaussian
    # mixture, the regime where (per the operator docs and
    # test_operators' two-regime measurements) single-query recall
    # tracks the SCANNED FRACTION — LSH 8-planes/1-probe scans ~9/256
    # of the corpus, PQ-ADC quantizes dim-64 into 8x16 cells. IVF's
    # adaptive probe (6/16 cells) is the one that exploits the cluster
    # structure, and the pair-level check below is the design point the
    # auto-rule actually targets (planted near-dups at cos >= 0.9).
    out["note"] = (
        "top-k recall tracks scanned fraction on this near-uniform "
        "corpus (documented regime); the auto-plane/auto-table design "
        "point is the pair-level check"
    )

    exact_pairs = {
        (r["id_a"], r["id_b"])
        for r in sim.exact_cosine_pairs_blocked(emb, 0.9)
        .select("id_a", "id_b")
        .collect()
    }
    dd.release_cached()
    lsh_pairs = {
        (r["id_a"], r["id_b"])
        for r in sim.lsh_near_dup_pairs(emb, dim, threshold=0.9)
        .select("id_a", "id_b")
        .collect()
    }
    dd.release_cached()
    hit = len(exact_pairs & lsh_pairs)
    out["lsh_pairs_cos09"] = {
        "exact_pairs": len(exact_pairs),
        "lsh_pairs": len(lsh_pairs),
        "recovered": hit,
        "recall": round(hit / len(exact_pairs), 4) if exact_pairs else None,
        "design_point": ">=0.98 recall at cos 0.9 (auto-plane/auto-table rule)",
    }
    return out


def main(only: list[str] | None = None) -> None:
    """Full study, or — with ``only`` — an incremental run that measures
    just the named queries (same fresh-JVM isolation) and merges their
    rows into the existing BENCH_SCALING.json, leaving every other
    query's numbers and the corpus-level checks untouched.  Adding an
    operator must not force re-measuring 45 unchanged ones."""
    if not os.path.exists(os.path.join(SF1_DIR, "documents.parquet")):
        print("generating sf1 corpus ...", flush=True)
        generate_sf1(SF1_DIR)
    if not os.path.exists(os.path.join(SF1_DIR, "lineitem.parquet")):
        print("generating sf1 relational tables ...", flush=True)
        generate_sf1_relational(SF1_DIR)

    if only:
        _main_incremental(only)
        return

    # timings first, each (query, scale) in its own fresh JVM — see
    # _measure_single for the measured session-contamination story
    all_queries = FAMILY_QUERIES + RELATIONAL_QUERIES
    r01, r1 = time_queries_isolated(all_queries)

    from neynar_parquet_importer_spark.session import get_spark

    spark = get_spark(
        app_name="scale-study",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    checks = scale_checks(spark, SF1_DIR)
    checks["ann_recall_sf1"] = ann_recall_checks(spark, SF1_DIR)

    import math

    exponents = {}
    for n in all_queries:
        a, b = r01["timings"][n], r1["timings"][n]
        exponents[n] = round(math.log10(max(b, 1e-3) / max(a, 1e-3)), 2)
    payload = {
        "sf0.1": r01, "sf1": r1,
        "scaling_exponent_log10": exponents,
        "relational_queries": RELATIONAL_QUERIES,
        "isolation": "fresh JVM per (query, scale); min of 2 passes"
                     " per scale (see scale_study._measure_single)",
        "checks": checks,
        # measured, not asserted: generate_sf1's per-label rounding can
        # drift the embedding total by a few rows
        "corpus": {
            "sf0.1": {"documents": _rows(f"{SF01}/documents.parquet"),
                      "embeddings": _rows(f"{SF01}/embeddings.parquet"),
                      "lineitem": _rows(f"{SF01}/lineitem.parquet"),
                      "events": _rows(f"{SF01}/events.parquet")},
            "sf1": {"documents": _rows(f"{SF1_DIR}/documents.parquet"),
                    "embeddings": _rows(f"{SF1_DIR}/embeddings.parquet"),
                    "lineitem": _rows(f"{SF1_DIR}/lineitem.parquet"),
                    "events": _rows(f"{SF1_DIR}/events.parquet")},
        },
        "run_at": time.strftime("%Y%m%dT%H%M%S"),
    }
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"exponents": exponents, "checks": checks}, indent=1))
    spark.stop()


def _main_incremental(names: list[str]) -> None:
    import math

    unknown = [n for n in names if n not in FAMILY_QUERIES + RELATIONAL_QUERIES]
    if unknown:
        raise SystemExit(f"not in the study's query lists: {unknown}")
    if not os.path.exists("BENCH_SCALING.json"):
        raise SystemExit("--only needs an existing BENCH_SCALING.json to merge into")
    with open("BENCH_SCALING.json") as f:
        payload = json.load(f)
    r01, r1 = time_queries_isolated(names)
    for res, section in [(r01, "sf0.1"), (r1, "sf1")]:
        for part in ("passes", "loadavg_1m", "timings"):
            payload[section][part].update(res[part])
    for n in names:
        a, b = r01["timings"][n], r1["timings"][n]
        payload["scaling_exponent_log10"][n] = round(
            math.log10(max(b, 1e-3) / max(a, 1e-3)), 2
        )
    payload["run_at_incremental"] = {
        "queries": names, "run_at": time.strftime("%Y%m%dT%H%M%S"),
    }
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(
        {n: payload["scaling_exponent_log10"][n] for n in names}, indent=1
    ))


if __name__ == "__main__":
    import sys

    if sys.argv[1:2] == ["--soak-child"]:
        # one shard of the sharded daemon soak, spawned by
        # daemon_soak_sharded_checks; owns its SparkSession
        soak_child_main(sys.argv[2])
    elif sys.argv[1:2] in (
        ["--daemon-soak-sharded"],
        ["--daemon-soak-sharded-sigkill"],
    ):
        # round-10 verdict #1: measure the scale-out story — the 18-table
        # topology sharded across 3 processes, each its own SparkSession
        if not os.path.exists("BENCH_SCALING.json"):
            raise SystemExit(
                "--daemon-soak-sharded needs an existing BENCH_SCALING.json"
            )
        mode = (
            "sigkill" if sys.argv[1] == "--daemon-soak-sharded-sigkill"
            else "bounce"
        )
        # quiet-host gate (same rationale as bench.py's): the soak is a
        # LATENCY measurement — one loadavg-20 background burst on this
        # shared host turns a 0.8s p99 into 4.4s (measured). Bounded
        # wait; proceeds loud with the start load stamped either way.
        thr = float(os.environ.get("SPARK_GRAFT_SOAK_QUIET", "4"))
        deadline = time.time() + 600
        while thr > 0 and _load1() >= thr and time.time() < deadline:
            time.sleep(15)
        block = daemon_soak_sharded_checks(crash_mode=mode)
        key = (
            "daemon_soak_18t_sharded"
            if mode == "bounce"
            else "daemon_soak_18t_sharded_sigkill"
        )
        with open("BENCH_SCALING.json") as f:
            payload = json.load(f)
        checks = payload.setdefault("checks", {})
        checks[key] = block
        checks[key + "_run_at"] = time.strftime("%Y%m%dT%H%M%S")
        with open("BENCH_SCALING.json", "w") as f:
            json.dump(payload, f, indent=1)
        print(json.dumps(block, indent=1))
    elif len(sys.argv) > 1 and sys.argv[1] == "--single":
        _measure_single(
            sys.argv[2],
            sys.argv[3],
            int(sys.argv[4]) if len(sys.argv) > 4 else 2,
        )
    elif sys.argv[1:2] == ["--only"]:
        # an explicit error, never a fall-through: a bare `--only` must not
        # silently run the full multi-hour study and overwrite the artifact
        if len(sys.argv) < 3 or not sys.argv[2]:
            raise SystemExit("--only needs a comma-separated query list")
        main(only=sys.argv[2].split(","))
    elif sys.argv[1:2] == ["--second-seed"]:
        # second-seed gate corpus (r5 verdict #1): documents/embeddings
        # REGENERATED at sf0.01 size from a different RNG seed (the
        # corpus-dependent branches — df-cap, auto-plane, exact-below
        # dispatch — see genuinely new data), relational tables copied
        # through (their oracle twins are deterministic transforms of
        # whatever data is present, so a reseed adds nothing there).
        # Run the harness against it with
        #   ORACLE_SF_DIR=/tmp/sf001_seed2 python -m pytest tests/test_queries_oracle.py
        import shutil

        seed = int(sys.argv[2]) if len(sys.argv) > 2 else 777
        out = os.environ.get("SPARK_GRAFT_SEED2_DIR", "/tmp/sf001_seed2")
        src = "/root/testdata/sf0.01"
        os.makedirs(out, exist_ok=True)
        for name in ("region", "nation", "customer", "supplier", "part",
                     "orders", "lineitem", "events"):
            shutil.copyfile(f"{src}/{name}.parquet", f"{out}/{name}.parquet")
        generate_sf1(out, src_dir=src, scale=1, seed=seed)
        print(json.dumps({
            "out": out, "seed": seed,
            "documents": _rows(f"{out}/documents.parquet"),
            "embeddings": _rows(f"{out}/embeddings.parquet"),
        }))
    elif sys.argv[1:2] == ["--pair-scan-slice"]:
        # round-9 verdict #2: materialize the sf1-distribution corpus
        # the 34 quadratic-twin (pair-scan) families ARE feasible on,
        # then print the harness command that value-checks them there
        out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_slice"
        generate_pair_scan_slice(out)
        print(json.dumps({
            "out": out,
            "documents": _rows(f"{out}/documents.parquet"),
            "embeddings": _rows(f"{out}/embeddings.parquet"),
            "customer": _rows(f"{out}/customer.parquet"),
            "events": _rows(f"{out}/events.parquet"),
            "run": (
                f'ORACLE_SF_DIR={out} python -m pytest '
                f'tests/test_queries_oracle.py -q -k "{PAIR_SCAN_K}"'
            ),
        }, indent=1))
    elif sys.argv[1:2] == ["--ann-recall"]:
        # incremental checks run: compute the per-index sf1 recall block
        # and merge it into the existing artifact without re-timing the
        # ~50-query study
        if not os.path.exists("BENCH_SCALING.json"):
            raise SystemExit("--ann-recall needs an existing BENCH_SCALING.json")
        from neynar_parquet_importer_spark.session import get_spark

        spark = get_spark(
            app_name="scale-study-ann-recall",
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        block = ann_recall_checks(spark, SF1_DIR)
        with open("BENCH_SCALING.json") as f:
            payload = json.load(f)
        checks = payload.setdefault("checks", {})
        checks["ann_recall_sf1"] = block
        checks["ann_recall_run_at"] = time.strftime("%Y%m%dT%H%M%S")
        with open("BENCH_SCALING.json", "w") as f:
            json.dump(payload, f, indent=1)
        print(json.dumps(block, indent=1))
        spark.stop()
    elif sys.argv[1:2] == ["--ann-recall-tuned"]:
        # incremental checks run: the tuner on the uniform worst case
        if not os.path.exists("BENCH_SCALING.json"):
            raise SystemExit("--ann-recall-tuned needs an existing BENCH_SCALING.json")
        from neynar_parquet_importer_spark.session import get_spark

        spark = get_spark(
            app_name="scale-study-ann-recall-tuned",
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        block = ann_recall_tuned_checks(spark, SF1_DIR)
        with open("BENCH_SCALING.json") as f:
            payload = json.load(f)
        checks = payload.setdefault("checks", {})
        checks["ann_recall_sf1_tuned"] = block
        checks["ann_recall_sf1_tuned_run_at"] = time.strftime("%Y%m%dT%H%M%S")
        with open("BENCH_SCALING.json", "w") as f:
            json.dump(payload, f, indent=1)
        print(json.dumps(block, indent=1))
        spark.stop()
    elif sys.argv[1:2] == ["--bpe-sufficiency"]:
        # incremental checks run: 1,024-doc sample vs full-corpus merges
        if not os.path.exists("BENCH_SCALING.json"):
            raise SystemExit("--bpe-sufficiency needs an existing BENCH_SCALING.json")
        if not os.path.exists(os.path.join(SF1_DIR, "documents.parquet")):
            print("generating sf1 corpus ...", flush=True)
            generate_sf1(SF1_DIR)
        from neynar_parquet_importer_spark.session import get_spark

        spark = get_spark(
            app_name="scale-study-bpe-sufficiency",
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        block = bpe_sufficiency_checks(spark)
        with open("BENCH_SCALING.json") as f:
            payload = json.load(f)
        checks = payload.setdefault("checks", {})
        checks["bpe_sample_sufficiency"] = block
        checks["bpe_sample_sufficiency_run_at"] = time.strftime("%Y%m%dT%H%M%S")
        with open("BENCH_SCALING.json", "w") as f:
            json.dump(payload, f, indent=1)
        print(json.dumps(block, indent=1))
        spark.stop()
    elif sys.argv[1:2] == ["--daemon-soak"]:
        # incremental checks run: multi-table real-time soak w/ crash
        if not os.path.exists("BENCH_SCALING.json"):
            raise SystemExit("--daemon-soak needs an existing BENCH_SCALING.json")
        from neynar_parquet_importer_spark.session import get_spark

        spark = get_spark(
            app_name="scale-study-daemon-soak",
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        block = daemon_soak_checks(spark)
        with open("BENCH_SCALING.json") as f:
            payload = json.load(f)
        checks = payload.setdefault("checks", {})
        checks["daemon_soak"] = block
        checks["daemon_soak_run_at"] = time.strftime("%Y%m%dT%H%M%S")
        with open("BENCH_SCALING.json", "w") as f:
            json.dump(payload, f, indent=1)
        print(json.dumps(block, indent=1))
        spark.stop()
    elif sys.argv[1:2] == ["--heavy-sf10"]:
        # round-10 verdict #5: sf1 -> sf10 exponents for the heavy
        # bench families (pagerank / triangles / fine-block linkage /
        # prefix-filter / containment), same fresh-JVM-per-(query,scale)
        # discipline as --sketch-sf10; longer per-subprocess ceiling
        # (the graph legs are minutes per pass at sf10).
        import math as _math
        import subprocess

        if not os.path.exists("BENCH_SCALING.json"):
            raise SystemExit(
                "--heavy-sf10 needs an existing BENCH_SCALING.json"
            )
        if not os.path.exists(os.path.join(SF1_DIR, "customer.parquet")):
            print("generating sf1 corpus ...", flush=True)
            generate_sf1_relational(SF1_DIR)
            generate_sf1(SF1_DIR)
        if not os.path.exists(os.path.join(SF10_DIR, "lineitem.parquet")):
            print("generating sf10 corpus ...", flush=True)
            generate_sf10(SF10_DIR)
        here = os.path.abspath(__file__)
        rows = {}
        for name in HEAVY_SF10_QUERIES:
            per_scale = {}
            for scale in ("sf1", "sf10"):
                proc = subprocess.run(
                    [sys.executable, here, "--single", name, scale, "2"],
                    capture_output=True, text=True,
                    cwd=os.path.dirname(here), timeout=3900,
                )
                line = next(
                    (ln for ln in proc.stdout.splitlines()
                     if ln.startswith(_RESULT_PREFIX)), None,
                )
                if proc.returncode != 0 or line is None:
                    raise SystemExit(
                        f"{name}@{scale} failed:\n{proc.stdout[-2000:]}"
                        f"\n{proc.stderr[-2000:]}"
                    )
                per_scale[scale] = json.loads(
                    line[len(_RESULT_PREFIX):]
                )[scale]
            t1 = min(per_scale["sf1"]["passes"])
            t10 = min(per_scale["sf10"]["passes"])
            rows[name] = {
                "sf1_sec": t1,
                "sf10_sec": t10,
                "exponent_log10": round(_math.log10(t10 / t1), 2),
                "loadavg_1m": {
                    s: per_scale[s]["loadavg_1m"] for s in per_scale
                },
            }
            print(f"{name}: {t1}s -> {t10}s "
                  f"exp {rows[name]['exponent_log10']}", flush=True)
        block = {"queries": rows}
        with open("BENCH_SCALING.json") as f:
            payload = json.load(f)
        checks = payload.setdefault("checks", {})
        checks["heavy_sf10"] = block
        checks["heavy_sf10_run_at"] = time.strftime("%Y%m%dT%H%M%S")
        with open("BENCH_SCALING.json", "w") as f:
            json.dump(payload, f, indent=1)
        print(json.dumps(block, indent=1))
    elif sys.argv[1:2] == ["--sketch-sf10"]:
        # round-9 verdict #6: one decade further for the bounded-state
        # sketch families. Measures each registered sketch build/fold
        # query at sf1 and sf10 in fresh per-(query,scale) JVMs (the
        # session-contamination discipline of _measure_single) and
        # records the log10 exponent of the one-decade step.
        import math as _math
        import subprocess

        if not os.path.exists("BENCH_SCALING.json"):
            raise SystemExit(
                "--sketch-sf10 needs an existing BENCH_SCALING.json"
            )
        if not os.path.exists(os.path.join(SF1_DIR, "events.parquet")):
            print("generating sf1 corpus ...", flush=True)
            generate_sf1_relational(SF1_DIR)
            generate_sf1(SF1_DIR)
        if not os.path.exists(os.path.join(SF10_DIR, "events.parquet")):
            print("generating sf10 corpus ...", flush=True)
            generate_sf10(SF10_DIR)
        here = os.path.abspath(__file__)
        rows: dict[str, dict] = {}
        for name in SKETCH_SF10_QUERIES:
            per_scale: dict[str, dict] = {}
            for scale in ("sf1", "sf10"):
                proc = subprocess.run(
                    [sys.executable, here, "--single", name, scale, "2"],
                    capture_output=True, text=True,
                    cwd=os.path.dirname(here), timeout=_SINGLE_TIMEOUT_S,
                )
                line = next(
                    (ln for ln in proc.stdout.splitlines()
                     if ln.startswith(_RESULT_PREFIX)), None,
                )
                if proc.returncode != 0 or line is None:
                    raise SystemExit(
                        f"{name}@{scale} failed:\n{proc.stdout[-2000:]}"
                        f"\n{proc.stderr[-2000:]}"
                    )
                per_scale[scale] = json.loads(
                    line[len(_RESULT_PREFIX):]
                )[scale]
            t1 = min(per_scale["sf1"]["passes"])
            t10 = min(per_scale["sf10"]["passes"])
            rows[name] = {
                "sf1_sec": t1,
                "sf10_sec": t10,
                "exponent_log10": round(_math.log10(t10 / t1), 2),
                "loadavg_1m": {
                    s: per_scale[s]["loadavg_1m"] for s in per_scale
                },
            }
            print(f"{name}: {t1}s -> {t10}s "
                  f"exp {rows[name]['exponent_log10']}", flush=True)
        block = {
            "queries": rows,
            "corpus": {
                "events_rows": _rows(f"{SF10_DIR}/events.parquet"),
                "lineitem_rows": _rows(f"{SF10_DIR}/lineitem.parquet"),
                "documents_rows": _rows(f"{SF10_DIR}/documents.parquet"),
            },
        }
        with open("BENCH_SCALING.json") as f:
            payload = json.load(f)
        checks = payload.setdefault("checks", {})
        checks["sketch_sf10"] = block
        checks["sketch_sf10_run_at"] = time.strftime("%Y%m%dT%H%M%S")
        with open("BENCH_SCALING.json", "w") as f:
            json.dump(payload, f, indent=1)
        print(json.dumps(block, indent=1))
    elif sys.argv[1:2] == ["--daemon-soak-18t"]:
        # round-9 verdict #3: the reference's REAL topology — it runs
        # its full v3 set of 17-18 tables in one process (main.py:46-89,
        # 676-716, per-table thread pools); prove the shared-session
        # design holds at that table count, not just the 3-table probe.
        # Same harness, same latency accounting, one mid-run kill.
        if not os.path.exists("BENCH_SCALING.json"):
            raise SystemExit(
                "--daemon-soak-18t needs an existing BENCH_SCALING.json"
            )
        from neynar_parquet_importer_spark.session import get_spark

        spark = get_spark(
            app_name="scale-study-daemon-soak-18t",
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        block = daemon_soak_checks(
            spark, n_tables=18, n_windows=150, crash_after=70,
            shuffle_partitions=4,
        )
        # the measured saturation story behind the knob (round-9 runs,
        # 18 tables x 60 real-time windows each unless noted): the
        # analytics default of 32-way shuffles on 1-row windows is pure
        # task-scheduling overhead times 18 concurrent tables
        block["knob_experiments"] = {
            "default_conf_18t_150w": {
                "steady_p50": 1.845, "steady_p99": 9.423,
                "note": "saturated: 18 tables x 2 Spark actions/window "
                        "x 32-way shuffles; all 2700 windows committed, "
                        "outage 0.94s",
            },
            "shuffle_partitions_4": {"steady_p50": 1.034, "steady_p99": 1.59},
            "shuffle_partitions_1": {"steady_p50": 1.177, "steady_p99": 1.776},
            "partitions_4_aqe_off": {"steady_p50": 1.107, "steady_p99": 1.661},
            "partitions_4_fair_sched": {
                "steady_p50": 1.193, "steady_p99": 1.858,
            },
            "partitions_4_12_tables": {
                "steady_p50": 0.884, "steady_p99": 1.134,
                "note": "the p99<1s knee sits at ~8-12 tables on this "
                        "host: the residual is the shared driver's job "
                        "throughput (2 actions/window/table, utilization "
                        "~1 at 18 jobs/s), the same per-process ceiling "
                        "that caps the reference at 17-18 tables; the "
                        "scale-out knob is the reference's own — more "
                        "processes — and the pipeline already batches "
                        "windows per job when behind (crash catch-up "
                        "proves it)",
            },
        }
        with open("BENCH_SCALING.json") as f:
            payload = json.load(f)
        checks = payload.setdefault("checks", {})
        checks["daemon_soak_18t"] = block
        checks["daemon_soak_18t_run_at"] = time.strftime("%Y%m%dT%H%M%S")
        with open("BENCH_SCALING.json", "w") as f:
            json.dump(payload, f, indent=1)
        print(json.dumps(block, indent=1))
        spark.stop()
    elif sys.argv[1:2] == ["--canon-sensitivity"]:
        # round-10 verdict #3: mutation-audit the COMPARE layer — seed
        # compare-side mutants (coarsened rounding, dropped column,
        # set-not-multiset, positional columns) and record that each is
        # killed: the real compare catches the paired defect, the
        # mutant provably misses it. Pure python, no Spark.
        if not os.path.exists("BENCH_SCALING.json"):
            raise SystemExit(
                "--canon-sensitivity needs an existing BENCH_SCALING.json"
            )
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
        from test_canon_sensitivity import run_audit

        block = run_audit()
        with open("BENCH_SCALING.json") as f:
            payload = json.load(f)
        checks = payload.setdefault("checks", {})
        checks["canon_sensitivity"] = block
        checks["canon_sensitivity_run_at"] = time.strftime("%Y%m%dT%H%M%S")
        with open("BENCH_SCALING.json", "w") as f:
            json.dump(payload, f, indent=1)
        print(json.dumps(block, indent=1))
    elif sys.argv[1:2] == ["--zorder-skip"]:
        # incremental checks run: z-order write-path skip ratios at sf1
        if not os.path.exists("BENCH_SCALING.json"):
            raise SystemExit("--zorder-skip needs an existing BENCH_SCALING.json")
        if not os.path.exists(os.path.join(SF1_DIR, "events.parquet")):
            print("generating sf1 relational tables ...", flush=True)
            generate_sf1_relational(SF1_DIR)
        from neynar_parquet_importer_spark.session import get_spark

        spark = get_spark(
            app_name="scale-study-zorder-skip",
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        block = zorder_skip_checks(spark, SF1_DIR)
        with open("BENCH_SCALING.json") as f:
            payload = json.load(f)
        checks = payload.setdefault("checks", {})
        checks["zorder_skip_sf1"] = block
        checks["zorder_skip_run_at"] = time.strftime("%Y%m%dT%H%M%S")
        with open("BENCH_SCALING.json", "w") as f:
            json.dump(payload, f, indent=1)
        print(json.dumps(block, indent=1))
        spark.stop()
    elif sys.argv[1:2] == ["--linkage-ab"]:
        # incremental checks run: the PassJoin-vs-blocked A/B at sf1 on
        # both key regimes, merged into the existing artifact
        if not os.path.exists("BENCH_SCALING.json"):
            raise SystemExit("--linkage-ab needs an existing BENCH_SCALING.json")
        if not os.path.exists(os.path.join(SF1_DIR, "customer.parquet")):
            print("generating sf1 relational tables ...", flush=True)
            generate_sf1_relational(SF1_DIR)
        if not os.path.exists(os.path.join(SF1_DIR, "documents.parquet")):
            print("generating sf1 corpus ...", flush=True)
            generate_sf1(SF1_DIR)
        from neynar_parquet_importer_spark.session import get_spark

        spark = get_spark(
            app_name="scale-study-linkage-ab",
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        block = linkage_ab_checks(spark, SF1_DIR)
        with open("BENCH_SCALING.json") as f:
            payload = json.load(f)
        checks = payload.setdefault("checks", {})
        checks["linkage_ab_sf1"] = block
        checks["linkage_ab_run_at"] = time.strftime("%Y%m%dT%H%M%S")
        with open("BENCH_SCALING.json", "w") as f:
            json.dump(payload, f, indent=1)
        print(json.dumps(block, indent=1))
        spark.stop()
    elif sys.argv[1:2] == ["--clustered-recall"]:
        # incremental checks run: generate the clustered corpus (if
        # absent), auto-tune each index family to recall >= 0.8 on it,
        # merge the block into the existing artifact (r6 verdict #1)
        if not os.path.exists("BENCH_SCALING.json"):
            raise SystemExit("--clustered-recall needs an existing BENCH_SCALING.json")
        cdir = os.environ.get(
            "SPARK_GRAFT_CLUSTERED_DIR", "/tmp/sf1_clustered"
        )
        if not os.path.exists(os.path.join(cdir, "embeddings.parquet")):
            print("generating clustered corpus ...", flush=True)
            generate_clustered(cdir)
        from neynar_parquet_importer_spark.session import get_spark

        spark = get_spark(
            app_name="scale-study-clustered-recall",
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        block = clustered_recall_checks(spark, cdir)
        with open("BENCH_SCALING.json") as f:
            payload = json.load(f)
        checks = payload.setdefault("checks", {})
        checks["ann_recall_clustered"] = block
        checks["ann_recall_clustered_run_at"] = time.strftime("%Y%m%dT%H%M%S")
        with open("BENCH_SCALING.json", "w") as f:
            json.dump(payload, f, indent=1)
        print(json.dumps(block, indent=1))
        spark.stop()
    else:
        main()
