"""Registry chunk split out of plans/queries.py (round-9 hygiene): original lines 2242-3880. Definitions land in the shared QUERIES/ORACLE_SQL dicts at import; the spine (plans.queries) imports every chunk in original order and re-exports all names, so `from ..plans.queries import X` keeps working for every X."""
from __future__ import annotations

from .q_relational import (  # noqa: E501
    _emb_cache_key,
    _embedding_count,
    _embedding_dim,
)
from .q_text_dedup import (  # noqa: E501
    _hot_shingles_cached,
)
from .queries import (  # noqa: E501
    DataFrame,
    F,
    SparkSession,
    _IVF_CENTROID_CACHE,
    _KMEANS_CENT_CACHE,
    _PQ_CODEBOOK_CACHE,
    _ntz_epoch_seconds,
    _t,
    aud,
    blm,
    clf,
    clu,
    cm,
    crp,
    dd,
    dff,
    documents_as_media,
    extract_features,
    hg,
    hl,
    kcr,
    kh,
    lay,
    lk,
    lpa,
    os,
    pgr,
    rtr,
    sc2,
    sim,
    smp,
    tri,
    tss,
    tx,
)
from ..operators.parallelism import fan_out


def _query_vec_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return F.broadcast(emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q")))


def _cosine_to_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, raw cosine vs vec_id=0) via broadcast one-row cross join —
    no driver collect; the dot/norm fold is a sequential JVM left-fold so
    it matches the oracle's list_dot_product bit-for-bit."""
    emb = _t(spark, sf_dir, "embeddings")
    joined = emb.crossJoin(_query_vec_df(spark, sf_dir))
    dot = sim._dot(F.col("embedding"), F.col("q"))
    denom = sim._norm(F.col("embedding")) * sim._norm(F.col("q"))
    score = F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))
    return joined.select("vec_id", score.alias("cos_raw"))


def embedding_cosine_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine of every vector against vec_id=0 (the exact
    baseline for similarity search; one narrow projection, no shuffle)."""
    return _cosine_to_query(spark, sf_dir).select(
        "vec_id", F.round("cos_raw", 6).alias("cos_sim")
    )


def embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 by cosine: TakeOrderedAndProject (per-partition heap,
    k-row driver merge — no global sort even at 100 TB)."""
    return (
        _cosine_to_query(spark, sf_dir)
        .orderBy(F.desc("cos_raw"), F.col("vec_id"))
        .limit(20)
        .select("vec_id", F.round("cos_raw", 6).alias("cos_sim"))
    )


def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-pruned embedding near-dup pairs (the scale path for
    embedding_near_dup_pairs; rows-only oracle — bucket membership depends
    on the engine's plane hashes). Candidate generation is multi-table
    hyperplane LSH with the constant-occupancy auto-plane rule
    (n_planes = max(8, log2(n/16)) — the sf1 scaling study measured
    exponent 1.7 at a fixed 8 planes before the rule, ~sublinear after);
    the exact-cosine rerank guarantees precision 1, so the only
    approximation is recall on borderline pairs (measured in
    tests/test_operators.py)."""
    emb = _t(spark, sf_dir, "embeddings")
    dim = _embedding_dim(emb, sf_dir)
    # NOTE: the auto-plane rule's corpus count is deliberately NOT fed
    # from the per-corpus count memo here — that would move a timed
    # count job out of this bench query's min-of-N with no cold leg
    # recorded, the exact r10-verdict pattern the shingle cold/warm
    # split unwinds (r11 review). The count is one tiny job per run.
    return sim.lsh_near_dup_pairs(emb, dim, threshold=0.5).orderBy("id_a", "id_b")


def embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-20 via random-hyperplane LSH bucket pruning
    (rows-only oracle: bucket membership isn't SQL-expressible)."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    out = sim.lsh_bucketed_topk(emb, list(qvec), k=20, n_planes=8)
    return out.select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))




def _ivf_centroids_cached(emb: DataFrame, sf_dir: str) -> list[list[float]]:
    key = _emb_cache_key(sf_dir)
    if key not in _IVF_CENTROID_CACHE:
        _IVF_CENTROID_CACHE[key] = sim.ivf_centroids(emb, n_centroids=16)
    return _IVF_CENTROID_CACHE[key]


def embedding_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN JOIN (the batch retrieval primitive: hard-negative
    mining, retrieval eval): top-10 cosine neighbors for each of the
    first five vectors as queries — ORACLE-CHECKED against the DuckDB
    cross-join + row_number twin. Execution: the query matrix broadcasts,
    each corpus partition keeps only its local top-k per query via one
    BLAS matmul (mapInPandas), and a per-query merge ranks the
    O(partitions x |Q| x k) partition winners — shuffle never carries
    the corpus (operators.similarity.knn_join)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sim.knn_join(emb, queries, k=10)


def embedding_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embedding corpus
    (the cached IVF coarse quantizer), detect near-dup pairs WITHIN each
    cell only, connect components, keep the min-id representative.
    Comparisons drop from n^2 to sum(|cell|^2) — the semantic-dedup scale
    shape. ORACLE-CHECKED via the corpus-size crossover
    (sim.semdedup_keepers_adaptive): below ~1e5 vectors the pair scan is
    the exact single-cell limit (deterministic — no trained-quantizer
    dependence — and strictly better recall than any cell partition), so
    the recursive-CTE closure twin value-checks the whole
    cluster-and-keep contract; above it the k-means-cell path engages,
    and tests/test_operators.py force it on planted dups to prove it
    matches the exact limit. Threshold 0.45 (vs clusters' 0.4/0.5) keeps
    the three clustering queries distinct result sets."""
    emb = _t(spark, sf_dir, "embeddings")
    return sim.semdedup_keepers_adaptive(
        emb,
        threshold=0.45,
        centroids=lambda: _ivf_centroids_cached(emb, sf_dir),
        n_rows=_embedding_count(emb, sf_dir),
    )


def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-20 via product quantization + asymmetric distance
    (ADC): each vector is its 8-byte PQ code, the query ships as one
    distance-table literal, and scoring is 8 table lookups per row — the
    compressed-domain regime a 100 TB ANN corpus queries in (no float
    vectors touched at query time). Completes the index family next to
    the LSH (data-oblivious) and IVF (adaptive-probe) paths. Rows-only
    oracle; recall properties in tests/test_operators.py."""
    emb = _t(spark, sf_dir, "embeddings")
    key = _emb_cache_key(sf_dir)
    if key not in _PQ_CODEBOOK_CACHE:
        _PQ_CODEBOOK_CACHE[key] = sim.pq_codebooks(emb, n_sub=8, n_centroids=16)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return sim.pq_topk(
        emb, list(qvec), k=20, codebooks=_PQ_CODEBOOK_CACHE[key]
    )


def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-20 via an IVF coarse quantizer (nprobe=6 of 16
    cells). The adaptive counterpart to embedding_lsh_topk: probes the
    centroids nearest the query instead of fixed hash buckets. Rows-only
    oracle; recall properties are asserted in tests/test_operators.py.
    Centroids are trained once per corpus and cached (in production they'd
    be a persisted artifact beside the partitioned-by-cell corpus)."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    out = sim.ivf_topk(
        emb, list(qvec), k=20, centroids=_ivf_centroids_cached(emb, sf_dir), nprobe=6
    )
    return out.select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))


# ---------------------------------------------------------------------------
# Graph projection (§2.9 U4-U6 shape on the events table)
# ---------------------------------------------------------------------------

def graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 FollowsGraphTransformer shape: interaction rows -> typed edges."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").alias("src_id"),
        F.get_json_object("props", "$.k").cast("long").alias("dst_id"),
        F.col("event_type").alias("rel_type"),
    ).filter(F.col("dst_id").isNotNull())


def graph_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 endpoint resolution: node set = distinct union of edge endpoints
    (neo4j_queries.py:88-93's implicit MERGE-created endpoints)."""
    e = graph_edges(spark, sf_dir)
    return (
        e.select(F.col("src_id").alias("node_id"))
        .union(e.select(F.col("dst_id").alias("node_id")))
        .distinct()
    )


def graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node out/in degree over the projected edge set — the profile
    query of any graph load (find hubs before a MERGE storm hits the graph
    sink). ONE scan: each edge explodes into its two endpoint rows tagged
    (out, in), then a single partial+final aggregate sums both counters
    per node. The earlier two-grouped-counts + full-outer-join plan read
    the events table (and re-parsed the JSON edge projection) twice and
    paid a third shuffle for the join; this shape pays one scan and one
    shuffle carrying a row per (node, partition)."""
    e = graph_edges(spark, sf_dir)
    ends = e.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src_id").alias("node_id"),
                    F.lit(1).alias("o"),
                    F.lit(0).alias("i"),
                ),
                F.struct(
                    F.col("dst_id").alias("node_id"),
                    F.lit(0).alias("o"),
                    F.lit(1).alias("i"),
                ),
            )
        ).alias("n")
    ).select("n.node_id", "n.o", "n.i")
    return ends.groupBy("node_id").agg(
        F.sum("o").alias("out_degree"), F.sum("i").alias("in_degree")
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (rows-only; decode stubbed per container limits)
# ---------------------------------------------------------------------------

def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-CHECKED multimodal plumbing: the fake decode derives the
    feature from sha256(payload), which DuckDB can recompute in SQL —
    so the whole mapInPandas path (schema, Arrow batching, vectorized
    body) is value-checked, not just row-counted. The float32 feature is
    projected through fixed %.4f formatting (a float32 is dyadic, so it
    never sits on a rounding boundary and both engines agree)."""
    docs = _t(spark, sf_dir, "documents")
    feats = extract_features(documents_as_media(docs), fake=True)
    return feats.select(
        "media_id",
        "mime_type",
        "n_bytes",
        "content_sha256",
        F.array_join(
            F.transform(
                F.col("feature"),
                lambda x: F.format_string("%.4f", x.cast("double")),
            ),
            ",",
        ).alias("feature_r4"),
    )


# ---------------------------------------------------------------------------
# Deterministic sampling / splits (training-data extensions)
# ---------------------------------------------------------------------------

def sample_docs_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% deterministic hash sample of the corpus — reproducible across
    engines, runs, and partition layouts (unlike rand()-based sampling);
    the predicate is a codegen'd filter at scan time, no shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return smp.hash_sample(docs, ["doc_id"], 0.1, seed="sample").select("doc_id", "lang")


_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def train_val_test_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by key hash, verified via the
    per-split counts. Assignment is a pure projection (one scan) and every
    engine computing the same md5 ranges agrees row-for-row."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", smp.split_column(["doc_id"], _SPLIT_WEIGHTS, seed="split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def contrastive_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negatives: 4 pseudo-random other-doc
    draws per anchor (md5-based, engine-portable, self-selection
    impossible) — ORACLE-CHECKED byte for byte. Rank assignment uses the
    two-phase range-partitioned prefix scan (operators.sampling.negative_samples)."""
    docs = _t(spark, sf_dir, "documents")
    return smp.negative_samples(docs, "doc_id", k=4, seed="neg")


def contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end contrastive training-pair materialization: positives
    are near-duplicate pairs (capped Jaccard >= 0.5, anchor = smaller
    id), negatives are the deterministic md5 draws (2 per anchor,
    negatives colliding with the positive filtered) — the triplet frame
    a contrastive trainer consumes. Pure composition of two
    oracle-checked operators and itself ORACLE-CHECKED."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.jaccard_all_pairs(
        docs, "text", "doc_id", threshold=0.5, max_shingle_df=None,
        hot=_hot_shingles_cached(spark, docs, sf_dir, 0.05),
    ).select(F.col("id_a").alias("anchor"), F.col("id_b").alias("positive"))
    negs = smp.negative_samples(docs, "doc_id", k=2, seed="neg").select(
        F.col("doc_id").alias("anchor"),
        "neg_idx",
        F.col("neg_doc_id").alias("negative"),
    )
    return pairs.join(negs, "anchor").filter(
        F.col("negative") != F.col("positive")
    ).select("anchor", "positive", "neg_idx", "negative")


def lang_label_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-quality audit: the confusion matrix between the corpus'
    declared ``lang`` labels and the n-gram language-ID prediction — the
    standard check before trusting either side for mixing/sampling
    decisions. One scan + one grouped count; ORACLE-CHECKED (the oracle
    recomputes the stopword-vote prediction in SQL)."""
    docs = _t(spark, sf_dir, "documents")
    # the stopword-panel regex votes are ~|panels| regex passes per
    # document INSIDE the scan stage — on a single-split corpus the
    # whole query ran as one task (r11 stage profile: 1 task / 1.7 s of
    # a 2.1 s wall); fan_out spreads the (lang, text) projection and
    # no-ops on multi-split inputs
    return (
        fan_out(docs.select("lang", "text"))
        .select(
            F.col("lang").alias("declared"),
            tx.language_id("text").alias("predicted"),
        )
        .groupBy("declared", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def source_near_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance audit: which SOURCES duplicate each other — near-dup
    pairs (capped Jaccard >= 0.5) aggregated into an unordered
    source-pair matrix with pair counts and mean similarity. The
    dedup-pipeline view a data vendor review starts from (a hot
    cross-source cell = one feed scraping another). Pair scan reused
    verbatim; the rollup is two tiny joins + one grouped aggregate;
    ORACLE-CHECKED."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.jaccard_all_pairs(
        docs, "text", "doc_id", threshold=0.5, max_shingle_df=None,
        hot=_hot_shingles_cached(spark, docs, sf_dir, 0.05),
    )
    src = docs.select("doc_id", "source")
    joined = (
        pairs.join(
            src.withColumnsRenamed({"doc_id": "id_a", "source": "src_a"}), "id_a"
        ).join(
            src.withColumnsRenamed({"doc_id": "id_b", "source": "src_b"}), "id_b"
        )
    )
    lo = F.least("src_a", "src_b")
    hi = F.greatest("src_a", "src_b")
    return (
        joined.select(lo.alias("source_a"), hi.alias("source_b"), "jaccard")
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
        )
    )


def length_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length curriculum: documents ranked into 8 equal-count
    token-length buckets (ties broken by doc_id), summarized per bucket
    — the batching/curriculum schedule input. The global rank comes from
    the SAME two-phase range-partitioned prefix scan as sequence packing
    (token_offsets with unit weights over a (n_tokens, doc_id) sort
    key), never an unpartitioned ntile window funneling the corpus
    through one task; bucket = rank*8 div N in exact integer math, the
    formula the DuckDB oracle mirrors. ORACLE-CHECKED."""
    from ..operators.packing import token_offsets

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.struct(
            tx.token_count("text").alias("n_tokens"), F.col("doc_id")
        ).alias("__ord"),
    ).withColumn("__one", F.lit(1))
    ranked = token_offsets(toks, id_col="__ord", token_col="__one")
    n = F.broadcast(ranked.agg(F.count(F.lit(1)).alias("n_total")))
    return (
        ranked.crossJoin(n)
        .select(
            F.col("id.n_tokens").alias("n_tokens"),
            F.expr("(offset * 8) div n_total + 1").alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
    )


def split_leakage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit: near-duplicate pairs (capped Jaccard >= 0.5)
    whose members landed in DIFFERENT train/val/test splits — the eval-
    contamination check every dedup-then-split pipeline must run (a val
    doc near-identical to a train doc inflates eval). Composes the
    inverted-index exact pair scan with the hash-split assignment; both
    pieces and the composition are ORACLE-CHECKED. At 100 TB the split
    lookup is two joins of the (tiny) pair set against a projection of
    the corpus — the pair scan dominates, nothing new shuffles."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.jaccard_all_pairs(
        docs, "text", "doc_id", threshold=0.5, max_shingle_df=None,
        hot=_hot_shingles_cached(spark, docs, sf_dir, 0.05),
    )
    splits = docs.select(
        F.col("doc_id"),
        smp.split_column(["doc_id"], _SPLIT_WEIGHTS, seed="split").alias("split"),
    )
    return (
        pairs.join(
            splits.withColumnsRenamed({"doc_id": "id_a", "split": "split_a"}),
            "id_a",
        )
        .join(
            splits.withColumnsRenamed({"doc_id": "id_b", "split": "split_b"}),
            "id_b",
        )
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "jaccard", "split_a", "split_b")
    )


def _near_dup_components(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(docs, components) for the cluster-unit operators. ONE definition
    of the cluster — capped-Jaccard pairs (>= 0.5, df-cap 0.05) ->
    connected components (min-id label), components keyed by `doc_id` —
    shared by `split_cluster_safe` and `soft_dedup_weights` so the split
    unit and the weight unit can never silently de-synchronize on a
    threshold tweak. The component frame is a tiny contraction of the
    corpus (clustered docs only), so joins back against it are
    AQE-broadcast when small, sort-merge when a pathological corpus
    makes it large."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.jaccard_all_pairs(
        docs, "text", "doc_id", threshold=0.5, max_shingle_df=None,
        hot=_hot_shingles_cached(spark, docs, sf_dir, 0.05),
    ).select("id_a", "id_b")
    comp = dd.connected_components(pairs, detach=True).withColumnsRenamed(
        {"id": "doc_id"}
    )
    return docs, comp


def split_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-FREE train/val/test split: the split unit is the near-dup
    CLUSTER, not the document. `split_leakage_pairs` shows the naive
    per-doc hash split leaks (a val doc near-identical to a train doc);
    the standard fix is to hash the cluster representative — every member
    of a connected near-dup component inherits one split, so cross-split
    near-dup pairs are zero BY CONSTRUCTION (asserted in
    tests/test_sampling_corpus.py). Pipeline: the shared
    `_near_dup_components` contraction -> split key = component for
    clustered docs, own id for singletons -> the shared md5 hash-range
    split. At 100 TB the pair scan dominates and the assignment itself
    stays one codegen'd projection. ORACLE-CHECKED end-to-end
    (recursive-CTE closure + the same CASE split in DuckDB)."""
    docs, comp = _near_dup_components(spark, sf_dir)
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("component", "doc_id").alias("split_key")
        )
        .withColumn(
            "split", smp.split_column(["split_key"], _SPLIT_WEIGHTS, seed="split")
        )
    )


def soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup: instead of DROPPING near-duplicates, every document
    gets training weight 1/|cluster| (singletons keep 1.0), so each
    distinct piece of content contributes exactly 1.0 to the training
    mix no matter how many copies the crawl collected — the reweighting
    alternative data-constrained LM training uses when hard dedup would
    discard too many tokens. The SAME `_near_dup_components` contraction
    as `split_cluster_safe` (one cluster definition for both), plus one
    tiny per-component count; both joins back are over the contraction
    and AQE-broadcast when it is small. ORACLE-CHECKED (recursive-CTE
    closure + the same size/weight arithmetic in DuckDB)."""
    docs, comp = _near_dup_components(spark, sf_dir)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .join(sizes, "component", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_size", F.lit(1)).alias("cluster_size"),
            F.round(
                F.lit(1.0) / F.coalesce("cluster_size", F.lit(1)), 6
            ).alias("weight"),
        )
    )


_STRAT_FRACTIONS = {"en": 0.05, "de": 0.5, "es": 0.5, "fr": 0.5, "zh": 1.0}


def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing downsample: per-language sampling fractions (keep all
    rare zh, 5% of dominant en) as one codegen'd CASE-threshold filter —
    no per-stratum scans, no shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return smp.stratified_sample(
        docs, "lang", _STRAT_FRACTIONS, ["doc_id"], seed="stratified"
    ).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# Corpus analysis: contamination, n-gram stats, mixing weights, funnel
# ---------------------------------------------------------------------------

def domain_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution cap: at most 15 documents per source,
    chosen deterministically by key hash — no source dominates the
    mixture, and every engine agrees on which rows survive."""
    docs = _t(spark, sf_dir, "documents")
    return smp.capped_per_group(docs, "source", ["doc_id"], cap=15, seed="cap").select(
        "doc_id", "source", "lang"
    )


def contamination_vs_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: every 20th document plays the eval
    benchmark; the rest of the corpus is scored by 3-gram overlap against
    the benchmark's (broadcast) shingle set. Corpus rows never shuffle —
    only per-doc counters do."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    return crp.ngram_contamination(corpus, bench, "text", "doc_id", shingle_n=3)


def rag_passage_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking: overlapping 32-token passages every 24 tokens per
    document (final passage may be shorter; docs below one window yield
    themselves) — ORACLE-CHECKED including the passage text. Pure
    codegen projection, zero shuffle (see operators.corpus.passage_windows)."""
    docs = _t(spark, sf_dir, "documents")
    out = crp.passage_windows(docs, "text", "doc_id", size=32, stride=24)
    return out.select(
        F.col("id").alias("doc_id"), "passage_idx", "passage", "n_tokens"
    )


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling log-weights: every 20th document plays
    the target domain (same convention as contamination_vs_benchmark),
    the rest are scored by summed unigram log-probability ratios with
    additive smoothing — ORACLE-CHECKED (DuckDB recomputes both count
    tables, the smoothed ratios, and the per-doc fold)."""
    docs = _t(spark, sf_dir, "documents")
    tgt = docs.filter(F.col("doc_id") % 20 == 0)
    src = docs.filter(F.col("doc_id") % 20 != 0)
    out = crp.dsir_log_weights(src, tgt, "text", "doc_id", alpha=0.5)
    return out.select(F.col("id").alias("doc_id"), "n_tokens", "log_weight")


def top_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide 20 most frequent trigrams (count + doc frequency),
    deterministic under ties; plans as partial agg + TakeOrderedAndProject."""
    docs = _t(spark, sf_dir, "documents")
    return crp.top_ngrams(docs, "text", "doc_id", shingle_n=3, k=20)


def token_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram (bucket width 10, capped at 200+): the
    length-distribution profile every corpus report starts with. One
    partial+final hash aggregate over a pure-projection bucket key."""
    docs = _t(spark, sf_dir, "documents")
    bucket = F.least(
        (F.floor(tx.token_count("text") / 10) * 10).cast("bigint"), F.lit(200)
    )
    return docs.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n_docs"))


def lang_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus share + inverse-frequency mixing weight (the
    rebalancing table a data-mixture scheduler consumes)."""
    docs = _t(spark, sf_dir, "documents")
    return crp.mixing_weights(docs, "lang")


def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel report in ONE scan: how many documents survive each
    successive quality gate (non-empty -> >=10 tokens -> quality >= 0.5 ->
    english). Conditional-sum aggregation, no per-stage scans — at 100 TB
    each extra funnel stage is one more codegen'd column, not another job."""
    docs = _t(spark, sf_dir, "documents")
    n_tokens = tx.token_count("text")
    quality = tx.quality_score("text")
    lang = tx.language_id("text")
    nonempty = F.length(F.trim("text")) > 0
    min_tok = nonempty & (n_tokens >= 10)
    good = min_tok & (quality >= 0.5)
    en = good & (lang == "en")
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return docs.agg(
        F.count(F.lit(1)).alias("n_total"),
        one_if(nonempty).alias("n_nonempty"),
        one_if(min_tok).alias("n_min_tokens"),
        one_if(good).alias("n_quality"),
        one_if(en).alias("n_english"),
    )


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm statistics over the embedding column — the sanity
    profile for a vector corpus (catches unnormalized or degenerate
    batches). The norm is a sequential JVM fold (aggregate over the array,
    each float widened to double) so it matches the oracle's
    list_dot_product bit-for-bit; one narrow aggregate, no shuffle of
    vectors beyond the per-label partials."""
    emb = _t(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return (
        emb.select("label", norm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
            F.round(F.min("nrm"), 4).alias("min_norm"),
            F.round(F.max("nrm"), 4).alias("max_norm"),
        )
    )


# ---------------------------------------------------------------------------
# End-to-end pre-training pipeline (composition of the operators above)
# ---------------------------------------------------------------------------

def _pretrain_curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pretrain import pretrain_pipeline

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    return pretrain_pipeline(corpus, benchmark=bench)


def pretrain_curated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline, row-level: quality gates -> exact dedup
    -> decontamination -> stratified downsample -> split assignment, as one
    lazy plan. Oracle-checked per document — the strongest end-to-end
    correctness signal in the suite."""
    return _pretrain_curated(spark, sf_dir)


def pretrain_corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (split, lang) doc/token/quality report over the curated corpus —
    what a data-mixture scheduler consumes."""
    from .pretrain import corpus_summary

    return corpus_summary(_pretrain_curated(spark, sf_dir))


def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key candidates via a count-min sketch (the detector feeding
    skew.salted_aggregate): build a 4x256 sketch over event user_ids —
    one bounded, skew-free groupBy regardless of key cardinality — then
    keep every key whose ESTIMATE clears the threshold. est >= true
    always, so no genuinely hot key is missed (the one-sided CMS
    guarantee); the narrow width deliberately forces collisions at bench
    scale so overcounts are visible and value-checked. true_count rides
    along to expose the estimation error per key."""
    ev = _t(spark, sf_dir, "events")
    sk = cm.cms_build(ev, "user_id", width=256, depth=4)
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    est = cm.cms_estimate(truth, sk, "user_id", width=256, depth=4)
    return est.filter(F.col("est_count") >= 60).select(
        "user_id", "true_count", "est_count"
    )


def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed-linear quality gate, inference side: tokens
    -> md5 hash buckets -> weight-table join -> mean weight as the keep/
    drop logit. Weights are integer milli-units so the per-doc sum is
    exact int64 and the logit one deterministic double division —
    value-checkable with no rounding tolerance (the gate projects the
    exact integer sum, not the float logit — a rounded logit sits on
    round-half boundaries engines break differently). The pseudo-trained
    weight table stands in for a real model; the join shape is identical
    (see operators/classifier.py)."""
    docs = _t(spark, sf_dir, "documents")
    w = clf.pseudo_weights(spark, 4096)
    out = clf.classify(docs, w, "text", "doc_id", n_buckets=4096)
    return out.select(
        "doc_id",
        "n_terms",
        "w_milli_sum",
        (F.col("logit") > 0).alias("keep"),
    )


def embedding_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-20 via 8-bit scalar quantization (SQ8), the fourth
    index family next to LSH (data-oblivious), IVF (adaptive-probe), and
    PQ (compressed-domain ADC). SQ8's entire training state is two
    plan-side aggregates (per-dimension min/max) — no driver sample, no
    seeded artifact, no collect — so unlike the other three families its
    oracle twin is static SQL, not a generated artifact replay. The scan
    scores dequantized reconstructions (1 byte/dim at rest), and the 20
    winners are exactly reranked so quantization error is visible
    per hit (sq_cos vs exact_cos)."""
    emb = _t(spark, sf_dir, "embeddings")
    top = sim.sq8_topk(emb, _query_vec_df(spark, sf_dir), k=20, rerank=True)
    return top.select(
        "vec_id",
        F.round("sq_cos_raw", 6).alias("sq_cos"),
        F.round("exact_cos_raw", 6).alias("exact_cos"),
    )


def bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: Bloom pre-filter + exact confirmation.

    History = even doc_ids, incoming = odd.  The history is folded into a
    Bloom words table (``bloom.bloom_build``); each incoming row pays k
    broadcast-join probes, and only the ``maybe`` slice is exactly
    confirmed against history — the join the filter exists to avoid never
    touches the definite-new rows.  The filter here is DELIBERATELY
    undersized (1024 bits for ~250 history docs, load ~1 bit/bit) so the
    false-positive path is exercised and value-checked at bench scale;
    production sizing comes from ``bloom.bloom_size_for`` (12 GB of bits
    covers 10 B documents at 1 % FPR).  Per-source accounting: candidate
    = flagged by the filter, true dup = exact text match in history,
    false positive = flagged but no match (resolved by the confirmation
    join).  No false negatives by construction — the oracle twin replays
    the identical md5/Kirsch-Mitzenmacher/bit arithmetic in DuckDB.
    """
    docs = _t(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    inc = docs.filter(F.col("doc_id") % 2 == 1)
    bl = blm.bloom_build(hist, "text", n_bits=1024, k=4)
    probed = blm.bloom_probe(
        inc, "text", bl, n_bits=1024, k=4, id_col="doc_id"
    )
    confirmed = (
        probed.filter(F.col("maybe_in_bloom"))
        .join(hist.select("text").distinct(), "text", "left_semi")
        .select("doc_id", F.lit(True).alias("is_dup"))
    )
    flagged = probed.join(confirmed, "doc_id", "left").withColumn(
        "is_dup", F.coalesce(F.col("is_dup"), F.lit(False))
    )
    maybe = F.col("maybe_in_bloom")
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_incoming"),
        F.sum((~maybe).cast("long")).alias("n_definite_new"),
        F.sum(maybe.cast("long")).alias("n_candidate_dup"),
        F.sum(F.col("is_dup").cast("long")).alias("n_true_dup"),
        F.sum((maybe & ~F.col("is_dup")).cast("long")).alias("n_false_pos"),
    )


def bloom_words_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-exact profile of a production-sized Bloom filter over the whole
    documents table: word count, set-bit population, and a positional
    checksum (``sum(word_idx * word)``, < 2^52 so exact in BIGINT on any
    engine).  A single flipped bit anywhere in the filter changes the
    checksum — this is the strongest value check of the build path."""
    docs = _t(spark, sf_dir, "documents")
    bl = blm.bloom_build(docs, "text", n_bits=1 << 15, k=4)
    return bl.agg(
        F.count("*").alias("n_words"),
        F.sum(F.bit_count("word")).alias("n_set_bits"),
        F.sum(F.col("word_idx") * F.col("word")).alias("words_checksum"),
        F.min("word_idx").alias("min_word_idx"),
        F.max("word_idx").alias("max_word_idx"),
    )


def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event type, checked
    against the exact distinct count in the same result row. The
    register build is ONE bounded hash-aggregate (at most
    ``n_types x 2^10`` shuffle rows regardless of user cardinality) —
    the shape that replaces ``countDistinct`` when the key space no
    longer fits a shuffle at 100 TB. The md5-derived registers replay
    bit-for-bit in the oracle (``hll.hll_oracle_sql``), so even the
    float estimate is value-checked, not tolerance-checked; the exact
    side here doubles as the accuracy witness (rel_err ~ 1.04/sqrt(m)
    ~ 3.2% at p=10)."""
    ev = _t(spark, sf_dir, "events")
    regs = hl.hll_registers(ev, "user_id", ["event_type"], p=10)
    est = hl.hll_estimate(regs, ["event_type"], p=10)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "estimate",
            "exact_distinct",
            F.round(
                F.abs(F.col("estimate") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


def hll_register_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability witness: per-event-type sketches union by
    register-wise max (``hll.hll_merge``) into a global sketch that must
    be IDENTICAL — register table and estimate — to one built directly
    from all rows (max of maxes). That lossless-union property is what
    lets per-source/per-day sketches persist independently and roll up
    later without rescanning history. Output pins both estimates, their
    equality, and a register checksum (sum(bucket*register), exact
    int64) of the union sketch."""
    ev = _t(spark, sf_dir, "events")
    per_type = hl.hll_registers(ev, "user_id", ["event_type"], p=10)
    union = hl.hll_merge(per_type, [])
    direct = hl.hll_registers(ev, "user_id", [], p=10)
    u_est = hl.hll_estimate(union, [], p=10).select(
        F.col("estimate").alias("union_estimate")
    )
    d_est = hl.hll_estimate(direct, [], p=10).select(
        F.col("estimate").alias("direct_estimate")
    )
    checksum = union.agg(
        F.sum(F.col("bucket") * F.col("register")).alias("register_checksum"),
        F.count(F.lit(1)).alias("n_registers"),
    )
    return (
        u_est.crossJoin(d_est)
        .crossJoin(checksum)
        .select(
            "union_estimate",
            "direct_estimate",
            (F.col("union_estimate") == F.col("direct_estimate")).alias(
                "union_equals_direct"
            ),
            "register_checksum",
            "n_registers",
        )
    )


_BM25_QUERIES = {
    "q_exec": ["spark", "window", "merge"],
    "q_io": ["scan", "batch"],
    "q_cust": ["customer", "vector"],
}

# the distinct literal term values, lowercased through query_frame's
# convention — fed to bm25_scores(prune_terms=...) so the term filter
# pushes BELOW the postings aggregate (an equivalent broadcast join
# cannot be pushed through it)
_BM25_TERMS = sorted(
    {t.strip().lower() for ts in _BM25_QUERIES.values() for t in ts}
)


def hll_intersection_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch algebra, the estimated leg: |A∩B| by inclusion-exclusion
    over two HLL sketches (est(A) + est(B) - est(A∪B)) — the union is
    EXACT on registers (max-merge), so intersection inherits only the
    two estimates' error. Audited in-row against the exact intersection
    (the thing that needs a full distinct shuffle the sketches avoid).
    Deterministic: all three estimates derive from the same md5
    registers the oracle replays."""
    ev = _t(spark, sf_dir, "events")
    viewers = ev.filter(F.col("event_type") == "view")
    buyers = ev.filter(F.col("event_type") == "purchase")
    ra = hl.hll_registers(viewers, "user_id", p=10)
    rb = hl.hll_registers(buyers, "user_id", p=10)
    est_a = hl.hll_estimate(ra, p=10).select(
        F.col("estimate").alias("est_viewers")
    )
    est_b = hl.hll_estimate(rb, p=10).select(
        F.col("estimate").alias("est_buyers")
    )
    est_u = hl.hll_estimate(hl.hll_merge(ra.unionByName(rb), []), p=10).select(
        F.col("estimate").alias("est_union")
    )
    exact = (
        viewers.select("user_id")
        .intersect(buyers.select("user_id"))
        .agg(F.count(F.lit(1)).alias("exact_both"))
    )
    return (
        est_a.crossJoin(est_b)
        .crossJoin(est_u)
        .crossJoin(exact)
        .select(
            "est_viewers",
            "est_buyers",
            "est_union",
            F.round(
                F.col("est_viewers")
                + F.col("est_buyers")
                - F.col("est_union"),
                4,
            ).alias("est_both"),
            "exact_both",
        )
    )


def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-5 per query over the documents corpus — the
    scored-retrieval primitive behind contamination triage and
    hard-negative mining (``operators/retrieval`` module doc). Scoring
    touches only the posting rows of query terms (broadcast equi-join =
    posting-list seek); scores round to 4 dp BEFORE ranking with doc_id
    tie-break, the cross-engine ranking contract."""
    docs = _t(spark, sf_dir, "documents")
    postings = rtr.term_postings(docs)
    # dl as a projection + literal-term prune below the aggregate: no
    # full-corpus (doc, term) aggregate remains in the plan (r11;
    # bm25_scores docstring) — identical scores, one corpus pass less
    return rtr.bm25_topk(
        postings,
        rtr.query_frame(spark, _BM25_QUERIES),
        k=5,
        doc_lengths=rtr.doc_lengths(docs),
        prune_terms=_BM25_TERMS,
    ).orderBy("query_id", "rank")


def bm25_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BM25 statistics path in isolation: per query-term document
    frequency and idf, plus corpus N/avgdl — value-checks the stats
    independently of the score composition so a regression localizes."""
    docs = _t(spark, sf_dir, "documents")
    postings = rtr.term_postings(docs)
    # same r11 restructure as bm25_topk_docs: dl is a projection (equal
    # to the postings sum by construction — doc_lengths docstring), and
    # the literal-term prune pushes below the (doc, term) aggregate
    dl = rtr.doc_lengths(docs)
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.round(F.avg("dl"), 4).alias("avgdl")
    )
    terms = rtr.query_frame(spark, _BM25_QUERIES).select("term").distinct()
    dfreq = (
        postings.filter(F.col("term").isin(_BM25_TERMS))
        .join(F.broadcast(terms), "term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    return (
        dfreq.crossJoin(F.broadcast(stats))
        .select(
            "term",
            "df",
            F.round(
                F.log(
                    1
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                ),
                6,
            ).alias("idf"),
            "n_docs",
            "avgdl",
        )
        .orderBy("term")
    )


def _cosupplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical co-supplier edge set: suppliers that shipped lines of
    the same order during 1997 Q1 (the window keeps the graph sparse
    enough that triangle structure is non-trivial rather than
    near-complete)."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    # persisted: the self-join below consumes this frame TWICE (probe +
    # broadcast build are distinct subtrees, so an unpersisted li pays
    # the lineitem scan + semi-join twice — r10 job breakdown)
    li = dd._persist(
        fan_out(
            _t(spark, sf_dir, "lineitem")
            .join(
                orders.select("o_orderkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
                "left_semi",
            )
            .select("l_orderkey", "l_suppkey")
        )
    )
    l2 = li.select(
        F.col("l_orderkey"), F.col("l_suppkey").alias("s2")
    )
    pairs = li.join(l2, "l_orderkey").filter(
        F.col("l_suppkey") != F.col("s2")
    )
    return tri.canonical_edges(pairs, "l_suppkey", "s2")


def cosupplier_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-oriented triangle count + global clustering coefficient
    over the co-supplier graph (``graph/triangles`` module doc: the
    orientation bounds the wedge join at O(m^1.5) regardless of hot
    nodes — the property that keeps this runnable on a follows graph
    with celebrity skew). Every column exact-integer except the final
    coefficient division."""
    return tri.triangle_stats(_cosupplier_edges(spark, sf_dir))


def cosupplier_triangle_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle membership over the same graph — the local
    density signal (bot rings and tight communities surface as high
    per-node triangle counts)."""
    return (
        tri.node_triangle_counts(_cosupplier_edges(spark, sf_dir))
        .orderBy(F.desc("n_triangles"), "node")
        .limit(25)
    )


def lpa_supplier_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation over the co-supplier
    graph (``graph/lpa`` module doc): 4 fixed rounds, most-common
    neighbor label, smallest label on ties — every update an exact
    integer aggregate, so the community assignment is value-checked by
    an INDEPENDENT single-process replay embedded as the oracle
    (pagerank discipline, not a shared artifact)."""
    edges = _cosupplier_edges(spark, sf_dir)
    # both directions from ONE subtree (explode of a 2-struct array):
    # a unionAll of two projections evaluates the co-supplier self-join
    # twice — the pagerank edge-build lesson (r10)
    directed = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # let lpa repartition by dst — one exchange of the small edge frame
    # buys four exchange-free rounds (lpa docstring plan shape)
    labels = lpa.label_propagation(directed, n_iter=4)
    return lpa.community_sizes(labels).orderBy(
        F.desc("n_members"), "community"
    )


def zorder_events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit over (user_id, event time): quantize both
    dims onto the full 16-bit budget from their global min/max, Morton-
    interleave, bucket by the top z-bits (the file boundaries a writer
    would cut), and report per-bucket bounding boxes. Tight boxes in
    BOTH dims are the direct evidence a filter on either column skips
    most files at 100 TB (``operators/layout`` module doc) — a
    single-column sort would show x_span ~ full domain in every bucket.
    Pure integer bit arithmetic end to end; static SQL replay."""
    ev = _t(spark, sf_dir, "events")
    secs = _ntz_epoch_seconds("ts")
    # Morton interleave = ~64 bitwise terms/row: spread the single-split
    # scan before the map stage (no-op on multi-split inputs)
    base = fan_out(
        ev.select(
            F.col("user_id").cast("long").alias("uid"), secs.alias("secs")
        )
    )
    rng = base.agg(
        F.min("uid").alias("umin"),
        F.max("uid").alias("umax"),
        F.min("secs").alias("smin"),
        F.max("secs").alias("smax"),
    )
    q = base.crossJoin(F.broadcast(rng)).select(
        lay.quantize_dim(
            F.col("uid"), F.col("umin"), F.col("umax"), 16
        ).alias("qx"),
        lay.quantize_dim(
            F.col("secs"), F.col("smin"), F.col("smax"), 16
        ).alias("qy"),
    )
    return lay.zorder_profile(q, "qx", "qy", bits=16, n_buckets=64)


def embedding_ivf_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN retrieval (``similarity.ivf_knn_join``): top-10 corpus
    neighbors for each of eight query vectors, searching only each
    query's nprobe=4 of 16 IVF cells — the index-accelerated form of
    embedding_knn_join (hard-negative mining / retrieval eval at 100 TB
    runs THIS shape: candidates are |Q| * n * nprobe/n_centroids
    instead of |Q| * n). Centroids are a deterministic function of the
    corpus sample, so the whole pipeline — assignment ties to the
    higher cell, probe selection, pruned cosine, (cos desc, neighbor
    asc) ranking — replays as generated DuckDB SQL with the centroid
    literals embedded (build_artifact_oracles)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = sim.ivf_centroids(emb, n_centroids=16)
    return sim.ivf_knn_join(
        emb, queries, k=10, centroids=cents, nprobe=4
    )


def zorder_write_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The z-order WRITE path end-to-end (``layout.write_zordered``):
    events (user_id, event time) are quantized, Morton-interleaved, cut
    into 64 equal-width z-range buckets, and physically written as one
    ``zbucket=<i>/`` partition directory each with rows z-sorted inside;
    the audit then READS THE FILES BACK and reports per-bucket row
    counts, raw-dimension bounding boxes, and an id-sum checksum. The
    oracle replays the identical quantize->interleave->bucket arithmetic
    as static SQL over the raw table — so a pass proves the files on
    disk realize exactly the layout the profile promises (bucket
    membership, counts, and boxes all value-checked through the
    write+read round trip). Equal-width z-buckets (not sampled range
    boundaries) are what make the writer oracle-replayable at all."""
    import hashlib

    ev = _t(spark, sf_dir, "events")
    secs = _ntz_epoch_seconds("ts")
    base = ev.select(
        F.col("event_id").cast("long").alias("eid"),
        F.col("user_id").cast("long").alias("uid"),
        secs.alias("secs"),
    )
    # per-process scratch path: keyed by corpus AND pid so two
    # concurrent runs (gate test + bench, xdist workers) can't race
    # overwrite-vs-read on the same directory. Dead processes' leftovers
    # are reaped here (pid-liveness probe) so /tmp stays bounded at one
    # copy per LIVE process instead of growing per run.
    import glob
    import shutil

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    for stale in glob.glob(f"/tmp/spark_graft_zorder_audit_{tag}_*"):
        try:
            pid = int(stale.rsplit("_", 1)[-1])
            if pid != os.getpid():
                os.kill(pid, 0)  # raises if the owner is gone
        except ValueError:
            continue
        except ProcessLookupError:
            # owner is gone — safe to reap
            shutil.rmtree(stale, ignore_errors=True)
        except PermissionError:
            # a LIVE process under another uid reused the pid: leave its
            # files alone and keep going (not a failure of THIS audit)
            continue
    path = f"/tmp/spark_graft_zorder_audit_{tag}_{os.getpid()}"
    lay.write_zordered(base, path, "uid", "secs", bits=16, n_buckets=64)
    back = spark.read.parquet(path)
    return (
        back.groupBy(F.col("zbucket").cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("uid").alias("u_min"),
            F.max("uid").alias("u_max"),
            F.min("secs").alias("s_min"),
            F.max("secs").alias("s_max"),
            F.sum("eid").alias("id_checksum"),
        )
        .orderBy("zbucket")
    )


def kcore_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core backbone of the co-supplier graph (``graph/kcore`` module
    doc): simultaneous degree peeling to the unique fixpoint, one
    bounded shuffle per round over a shrinking edge list. k is derived
    from the graph itself — 70% of the average degree, in exact integer
    arithmetic ``(14*E) // (10*N)`` — so the core stays non-empty (and
    proper wherever the degree distribution has a tail) at every test
    scale; the density of THIS graph varies 10x across sf. Two tiny
    driver-side count jobs fix k before peeling (the adaptive-dispatch
    pattern); the oracle re-derives the same k and independently
    re-peels the same edge set single-process."""
    edges = dd._persist(_cosupplier_edges(spark, sf_dir))
    n_edges = edges.count()
    n_nodes = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .distinct()
        .count()
    )
    k = max(1, (14 * n_edges) // (10 * max(n_nodes, 1)))
    # edges ARE canonical distinct (triangles.canonical_edges) and
    # persisted above — skip kcore's defensive re-distinct + copy
    return kcr.kcore_stats(edges, k=k, assume_canonical=True)


def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-snapshot diff audit (``operators/diff`` module doc): two
    deterministic versions of the orders table — rows keyed %7==6
    appear only in the new snapshot (added), %5==4 only in the old
    (removed), %11==0 get a price bump (changed) — classified by one
    full-outer join with null-safe column comparison, then reduced to
    per-status counts + key checksums. The operation a deployment runs
    on every fresh full snapshot before trusting it as an incremental
    source."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = orders.filter(F.col("o_orderkey") % 7 != 6)
    new = orders.filter(F.col("o_orderkey") % 5 != 4).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 11 == 0, F.col("o_totalprice") + 1.5
        ).otherwise(F.col("o_totalprice")),
    )
    d = dff.snapshot_diff(
        old, new, "o_orderkey", ["o_orderstatus", "o_totalprice"]
    )
    return dff.diff_summary(d, "o_orderkey")


def winnow_plagiarism_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style plagiarism detection (Schleimer et al. 2003 winnowing):
    per-window-minimum selection keeps ~2/(w+1) of the 5-gram hashes as
    position-robust fingerprints — any shared substring of >= w+k-1 = 8
    tokens is guaranteed a shared fingerprint — then a df-capped
    equi-join on fingerprint value surfaces pairs sharing >= 2. The
    engine-portable md5 hash makes the whole selection (window minima
    included) replay as static ANSI SQL; every output column is an
    exact integer."""
    docs = _t(spark, sf_dir, "documents")
    return dd.winnow_shared_pairs(
        docs, k=5, w=4, min_shared=2, max_df=50
    )


def winnow_fingerprint_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowing profile: gram count, selected-fingerprint
    count, and the selection fraction (expected ~2/(w+1) ~ 0.4 at w=4,
    lower when repeated text lets one minimum cover many windows — so
    the fraction itself is a cheap repetitiveness signal)."""
    docs = _t(spark, sf_dir, "documents")
    fps = dd.winnow_fingerprints(docs, k=5, w=4)
    n_fp = fps.groupBy("id").agg(F.count(F.lit(1)).alias("n_fp"))
    n_grams = (
        dd._shingle_stream(docs, "text", "doc_id", 5)
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_grams"))
    )
    return n_grams.join(n_fp, "id").select(
        F.col("id").alias("doc_id"),
        "n_grams",
        "n_fp",
        # UNROUNDED: one double division of the same exact int64s is
        # bitwise identical on every engine, while round() sits on
        # half-boundaries Spark (decimal HALF_UP) and DuckDB (binary)
        # break differently — the documented classifier lesson
        (F.col("n_fp") / F.col("n_grams")).alias("fp_frac"),
    )


def pagerank_supplier_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier influence via integer-exact distributed PageRank (the
    third iterative algorithm next to connected components and the
    fixed-point k-means): nodes are customers (2k) and suppliers (2k+1)
    on the who-buys-from-whom graph (distinct lineitem x orders pairs,
    both directions so no node dangles), 5 damped iterations of pure
    int64 mass arithmetic — partition-order invariant, so the oracle
    generator INDEPENDENTLY replays the identical recursion over the
    same edge set and the top-20 (mass desc, suppkey) must agree
    exactly (graph/pagerank.py). Top-k via orderBy+limit
    (TakeOrderedAndProject — no single-task window)."""
    li = fan_out(
        _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    raw = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        (F.col("o_custkey") * 2).alias("a"),
        (F.col("l_suppkey") * 2 + 1).alias("b"),
    )
    # both directions from ONE subtree (a union of pairs + reversed
    # pairs evaluates the join+distinct twice — r10 A/B: 3.5s -> 2.2s
    # edge build), deduped AFTER the dst repartition so the distinct
    # shares pagerank's partitioning (subset rule) instead of adding
    # its own (src, dst) exchange — dst is the symmetric fast path's
    # iteration key (the per-round inflow groupBy reuses it; zero
    # per-iteration exchanges)
    both = raw.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    par = spark.sparkContext.defaultParallelism
    edges = both.repartition(par, "dst").dropDuplicates()
    # symmetric=True: edges contains both directions by construction,
    # so the node set is distinct dst and every node receives inflow —
    # pagerank skips the per-iteration completion join
    # (value-identical; see pagerank docstring A/B)
    ranks = pgr.pagerank(
        edges, n_iter=5, symmetric=True, pre_partitioned=True
    )
    return (
        ranks.filter(F.col("node") % 2 == 1)
        .select(F.expr("(node - 1) div 2").alias("suppkey"), "mass")
        .orderBy(F.desc("mass"), "suppkey")
        .limit(20)
    )




def _kmeans_cents(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    """Distributed-k-means centroids for the corpus, cached per
    (path, mtime) like the other per-corpus artifacts so bench passes
    don't re-pay the Lloyd iterations."""
    key = _emb_cache_key(sf_dir)
    if key not in _KMEANS_CENT_CACHE:
        _KMEANS_CENT_CACHE[key] = clu.kmeans_fit(
            _t(spark, sf_dir, "embeddings"), k=8, n_iter=4
        )
    return _KMEANS_CENT_CACHE[key]


def kmeans_corpus_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus clustering with DISTRIBUTED Lloyd k-means (domain discovery
    for mixture balancing): unlike the sample-trained IVF quantizer, the
    iterations here run as Spark aggregations over every vector, made
    value-checkable by fixed-point quantization — per-cluster sums are
    exact int64, so the oracle generator recomputes the SAME training
    single-process and must land bitwise-identical centroids (an
    independent replay of training, a stronger check than the
    shared-artifact ANN twins; operators/clustering.py). Output:
    per-cluster membership count, exact id checksum, and mean squared
    distance to the centroid."""
    emb = _t(spark, sf_dir, "embeddings")
    a = clu.kmeans_assign(emb, _kmeans_cents(spark, sf_dir))
    return a.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("id").alias("sum_vec_id"),
        F.round(F.avg("dist2"), 6).alias("avg_dist2"),
    )


def kmeans_domain_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What a data-mixture scheduler reads off the clustering: per
    (cluster, source) document counts and exact char mass — the inputs
    to per-domain sampling weights. Joins the assignment frame to
    documents on the shared id space; every output is an exact integer,
    so the twin has zero float-parity surface."""
    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents")
    a = clu.kmeans_assign(emb, _kmeans_cents(spark, sf_dir))
    return (
        a.join(docs, a["id"] == docs["doc_id"])
        .groupBy("cluster", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


def events_daily_resampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward gap fill (``operators/timeseries``
    module doc): per-user daily grid from each user's own min to max
    observed day, exact event counts (0 on gap days), and the day's
    average value carried forward through gaps. The grid explode runs on
    the one-row-per-user span frame, AFTER aggregation; the fill window
    is partitioned by user (never a global window). The day average is
    computed in fixed point — sum of floor(value*1e6) BIGINTs (exact and
    summation-order-invariant, the k-means discipline) divided by
    count*1e6 — and deliberately NOT rounded: both engines perform the
    identical integer-to-double division, so the result is bit-equal by
    construction, whereas round() disagrees on exact half-boundaries
    (Spark HALF_UP vs DuckDB half-even flipped 67.49125 at sf0.1)."""
    ev = _t(spark, sf_dir, "events")
    day_avg = F.sum(F.floor(F.col("value") * 1000000)) / (
        F.count("value") * F.lit(1000000.0)
    )
    out = tss.resample_fill(
        ev.select("user_id", "ts", "value"),
        keys=["user_id"],
        epoch_col=_ntz_epoch_seconds("ts"),
        step=86400,
        aggs={"day_avg_value": day_avg},
        fill_cols=["day_avg_value"],
    )
    return out.select(
        "user_id",
        F.col("bucket_start").alias("day_start"),
        "n_events",
        F.col("day_avg_value").alias("filled_avg_value"),
    )


def user_scd2_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 rebuild (``operators/scd`` module doc): per-user
    event_type version history — consecutive same-type events collapse
    into one version, each version carries a half-open
    [valid_from, valid_to) epoch-second interval, the latest is flagged
    current. Ordering is (epoch second, event_id): a TOTAL order that
    both engines compute identically (raw ns timestamps would tie at
    different precisions cross-engine — the header's timestamp rule)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        _ntz_epoch_seconds("ts").alias("es"),
    )
    hist = sc2.scd2_history(
        ev,
        keys=["user_id"],
        valid_from=F.col("es"),
        order_cols=[F.col("es"), F.col("event_id")],
        attr_cols=["event_type"],
    )
    return hist.select(
        "user_id",
        "event_type",
        "valid_from",
        "valid_to",
        "version_n",
        "is_current",
    )


def orders_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint audit (``operators/audit`` module doc):
    the pre-import quality gate the reference delegates to Postgres
    constraints (schema/*.sql PKs and NOT NULLs), run as ONE aggregation
    pass over the fact table plus one broadcast RI join. The
    ``unique_probe`` constraint is deliberately strict (o_custkey is a
    foreign key, not a key) so the report exercises the failing branch
    on real data."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    checks = [
        aud.Check(
            "orders.o_custkey.complete", aud.completeness("o_custkey")
        ),
        aud.Check(
            "orders.o_orderkey.unique", aud.uniqueness("o_orderkey")
        ),
        aud.Check(
            "orders.o_custkey.unique_probe", aud.uniqueness("o_custkey")
        ),
        aud.Check(
            "orders.o_totalprice.positive",
            aud.satisfies(F.col("o_totalprice") > 0),
        ),
        aud.Check(
            "orders.o_orderstatus.domain",
            aud.satisfies(F.col("o_orderstatus").isin("O", "F", "P")),
        ),
    ]
    ri = aud.referential_integrity(
        orders,
        "o_custkey",
        customer,
        "c_custkey",
        "orders.o_custkey.ref_customer",
    )
    return aud.audit_suite([aud.table_audit(orders, checks), ri])


# deterministic "dirty" twin of the customer table for the linkage
# queries: per-key perturbation mode (substitute a digit with 'X' /
# delete a digit / append a char / identity) at a per-key position —
# the same arithmetic replays as SQL in the oracle
_DIRTY_NAME_EXPR = (
    "CASE CAST(c_custkey % 4 AS INT) "
    "WHEN 0 THEN concat(substr(c_name, 1, CAST(9 + c_custkey % 8 AS INT)), 'X', "
    "substr(c_name, CAST(9 + c_custkey % 8 AS INT) + 2)) "
    "WHEN 1 THEN concat(substr(c_name, 1, CAST(9 + c_custkey % 8 AS INT)), "
    "substr(c_name, CAST(9 + c_custkey % 8 AS INT) + 2)) "
    "WHEN 2 THEN concat(c_name, 'Z') "
    "ELSE c_name END"
)


def _dirty_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("d_key"),
        "c_nationkey",
        F.expr(_DIRTY_NAME_EXPR).alias("d_name"),
    )


def _linkage_corpus(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """THE (dirty, clean) linkage corpus — single definition shared by
    the blocked query, the auto-dispatch query, and (via import) the
    scale study's A/B, so the preprocessing can't silently diverge from
    the oracle twin. Every customer name carries the literal 'Customer#'
    prefix and the perturbations only touch the digit region, so both
    sides strip the constant prefix before the quadratic metric —
    standard Levenshtein preprocessing (identical common prefixes never
    contribute edits); measured ~2x on the pair scan. The oracle strips
    identically."""
    clean = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.expr("substr(c_name, 10)").alias("c_suffix"),
    )
    dirty = _dirty_customers(spark, sf_dir).select(
        "d_key",
        "c_nationkey",
        F.expr("substr(d_name, 10)").alias("d_suffix"),
    )
    return dirty, clean


def _linkage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    dirty, clean = _linkage_corpus(spark, sf_dir)
    return lk.blocked_pairs(
        dirty,
        clean,
        block_cols=["c_nationkey"],
        left_id="d_key",
        right_id="c_custkey",
        left_text="d_suffix",
        right_text="c_suffix",
        max_distance=2,
    )


def fuzzy_customer_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage (``operators/linkage`` module doc):
    a deterministically-perturbed "dirty" copy of the customer table is
    linked back to the clean table — equi-join on the nation blocking
    key, length pre-filter, Levenshtein <= 2 — and the match pairs are
    profiled per edit distance with id-sum checksums. Levenshtein is
    unit-cost in both engines, so the whole pipeline replays as SQL."""
    return (
        _linkage_pairs(spark, sf_dir)
        .groupBy("distance")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("d_key").alias("dirty_checksum"),
            F.sum("c_custkey").alias("clean_checksum"),
        )
        .orderBy("distance")
    )


def fuzzy_linkage_auto_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MEASURED blocked-vs-PassJoin dispatch as a first-class query
    (``linkage.auto_pairs``): decide_pairs_strategy compares the exact
    block-pair budget against a sampled estimate of PassJoin candidates
    (both in the shared candidate-pair currency), runs the cheaper
    side, and — because both operators are EXACT edit-distance joins —
    the result is strategy-independent: the oracle is the same
    all-pairs twin as fuzzy_customer_linkage, so the gate value-checks
    that dispatch can never change answers, only cost. On this
    zero-padded low-entropy corpus the blocked side wins (segments
    collide corpus-wide; plan-pinned in tests/test_linkage_dispatch)."""
    dirty, clean = _linkage_corpus(spark, sf_dir)
    pairs = lk.auto_pairs(
        dirty,
        clean,
        block_cols=["c_nationkey"],
        left_id="d_key",
        right_id="c_custkey",
        left_text="d_suffix",
        right_text="c_suffix",
        max_distance=2,
    )
    return (
        pairs.groupBy("distance")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("d_key").alias("dirty_checksum"),
            F.sum("c_custkey").alias("clean_checksum"),
        )
        .orderBy("distance")
    )


# the two-pass fine-key family shared by the fine-block query and the
# three-way dispatch: lossless for this corpus's perturbation family
# (one edit at suffix position k in [0,7], or an append) — see
# fuzzy_customer_linkage_fine_block's proof sketch
_LINKAGE_FINE_KEYS = [
    ("substr(d_suffix, 1, 5)", "substr(c_suffix, 1, 5)"),
    (
        "substr(d_suffix, length(d_suffix) - 3, 4)",
        "substr(c_suffix, length(c_suffix) - 3, 4)",
    ),
]


def linkage_dispatch_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The THREE-WAY measured linkage dispatch as a gate row (round-10
    verdict #2): ``decide_pairs_strategy`` with the fine-key arm
    declared, on the standard linkage corpus — returns the chosen
    strategy plus the two EXACT budgets that drive it (candidate-pair
    currency). The oracle twin recomputes both budgets in SQL and
    re-derives the argmin (3*fine < 2*blocked <=> 1.5-overhead rule),
    so the gate value-checks the DECISION FUNCTION itself at every
    scale — the winner legitimately flips from blocked at sf<=0.01 to
    fine_block at sf0.1 (budget ratio crosses the 1.5x handicap), and
    the twin tracks the flip instead of pinning one answer.

    PassJoin's sampled estimate stays engine-side: on this zero-padded
    low-entropy corpus every name-segment collides corpus-wide, so the
    estimate tracks the blocked budget within sampling noise (measured
    0.3% at sf0.1) and the 2x overhead keeps that arm out of
    contention at every scale — the twin's two-arm argmin is the whole
    decision (asserted by tests/test_linkage_dispatch)."""
    dirty, clean = _linkage_corpus(spark, sf_dir)
    d = lk.decide_pairs_strategy(
        dirty,
        clean,
        ["c_nationkey"],
        "d_key",
        "c_custkey",
        "d_suffix",
        "c_suffix",
        2,
        fine_keys=_LINKAGE_FINE_KEYS,
    )
    return spark.createDataFrame(
        [
            (
                d["strategy"],
                int(d["blocked_budget"]),
                int(d["fine_budget"]),
            )
        ],
        "strategy string, blocked_budget bigint, fine_budget bigint",
    )


def fuzzy_customer_linkage_fine_block(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The linkage module's documented mitigation for the quadratic
    nation-block regime (``operators/linkage`` module doc: "a block
    that big means the blocking key is underspecified, and the fix is a
    finer key"), measured instead of asserted (round-7 verdict #5):
    two-pass multi-pass blocking (Hernández & Stolfo sorted-
    neighborhood discipline) on (nation, first-5 suffix chars) UNION
    (nation, last-4 suffix chars), pair-distinct, then the same
    distance profile as fuzzy_customer_linkage plus an ``n_true``
    column making recall visible in the gate.

    The two keys are chosen LOSSLESS for this corpus's perturbation
    family (one edit at suffix position k in [0,7], or an append):
    substitution/deletion at k <= 4 leaves the last 4 characters
    counted from the END intact (a deletion before position 5 shifts
    the tail left exactly one, so dirty[-4:] == clean[-4:]);
    substitution/deletion at k >= 5 and the append leave the first 5
    intact — so every true pair survives at least one pass, which the
    oracle twin and test_linkage.py's recall check both pin. Cross-
    block distance<=2 coincidences ARE dropped relative to the
    all-pairs query — that is the documented trade; n_true is what the
    fine key promises to keep.

    The quadratic core runs on DISTINCT (nation, suffix) texts
    (``lk.fine_blocked_text_pairs`` — the three-way dispatch's arm IS
    the code this query proves), and the row-level profile is computed
    by aggregating THROUGH the expansion: per-(nation, text) weights
    (row count + id sum per side) joined against the text pairs and
    multiplied, plus a per-key true-pair probe — every term linear in
    the corpus, never the expanded row-pair stream. On duplicate-heavy
    corpora the row-pair population is quadratic in the duplication
    factor (measured 1.5e9 expanded pairs on the 100x-replicated sf10
    study corpus — the naive expand-then-aggregate form took >580s
    there; this form stays seconds) while every value here is
    identical: sum over text pairs of cnt_l*cnt_r == count over row
    pairs, etc. The oracle twin replays raw-row blocking and must
    agree."""
    dirty, clean = _linkage_corpus(spark, sf_dir)
    tp = lk.fine_blocked_text_pairs(
        dirty,
        clean,
        ["c_nationkey"],
        "d_suffix",
        "c_suffix",
        2,
        _LINKAGE_FINE_KEYS,
    )
    lw = dirty.groupBy("c_nationkey", "d_suffix").agg(
        F.count(F.lit(1)).alias("_cl"), F.sum("d_key").alias("_sl")
    )
    rw = clean.groupBy("c_nationkey", "c_suffix").agg(
        F.count(F.lit(1)).alias("_cr"), F.sum("c_custkey").alias("_sr")
    )
    weighted = tp.join(lw, ["c_nationkey", "d_suffix"]).join(
        rw, ["c_nationkey", "c_suffix"]
    )
    profile = weighted.groupBy("distance").agg(
        F.sum(F.col("_cl") * F.col("_cr")).alias("n_pairs"),
        F.sum(F.col("_sl") * F.col("_cr")).alias("dirty_checksum"),
        F.sum(F.col("_cl") * F.col("_sr")).alias("clean_checksum"),
    )
    # true pairs (d_key == c_custkey): each key contributes its one
    # (dirty text, clean text) combination — count the keys whose
    # combination is an accepted text pair, per distance
    true_keys = dirty.join(
        clean,
        (F.col("d_key") == F.col("c_custkey"))
        & (dirty["c_nationkey"] == clean["c_nationkey"]),
    ).select(
        dirty["c_nationkey"].alias("c_nationkey"), "d_suffix", "c_suffix"
    )
    n_true = true_keys.join(
        tp, ["c_nationkey", "d_suffix", "c_suffix"]
    ).groupBy("distance").agg(F.count(F.lit(1)).alias("n_true"))
    return (
        profile.join(n_true, ["distance"], "left")
        .select(
            "distance",
            "n_pairs",
            "dirty_checksum",
            "clean_checksum",
            F.coalesce("n_true", F.lit(0)).alias("n_true"),
        )
        .orderBy("distance")
    )


def linkage_self_match_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linkage resolution quality: per dirty record keep the best match
    (min distance, then min clean key — deterministic), then measure how
    often the best match is the record's true source. Single-digit name
    collisions make this genuinely < 1: a substituted digit is
    equidistant from several neighboring customer names, and the
    smallest-key tiebreak sometimes picks a neighbor — exactly the
    ambiguity a real linkage pipeline has to quantify."""
    best = lk.best_match(
        _linkage_pairs(spark, sf_dir), "d_key", "c_custkey"
    )
    is_self = (F.col("d_key") == F.col("c_custkey")).cast("double")
    return best.agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum(is_self.cast("bigint")).alias("n_self"),
        F.round(F.avg(is_self), 6).alias("self_match_rate"),
    )


def event_value_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles (``operators/histogram`` module doc):
    per-event-type p50/p90/p99 of value answered from a 64-bin
    equi-width histogram — the distribution member of the mergeable
    sketch trio (HLL distinct / CMS frequency / histogram quantile).
    The estimate is the selected bin's upper edge, over the true
    quantile by at most one bin width; bin assignment, cumulative
    ranks, and edges are identical IEEE arithmetic cross-engine, so
    the whole chain replays as static SQL (unlike percentile sketches
    with engine-specific interpolation)."""
    ev = _t(spark, sf_dir, "events")
    hist = hg.histogram_build(
        ev, ["event_type"], "value", lo=0.0, width=8.0, n_bins=64
    )
    return hg.histogram_quantiles(
        hist, ["event_type"], [0.5, 0.9, 0.99], lo=0.0, width=8.0
    )


def khop_supplier_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS (``graph/khop`` module doc): hop-distance rings
    around the three smallest co-supplier-graph nodes, k=3 — per (root,
    dist) node counts with id-sum checksums. Level-synchronous
    frontier expansion with per-round eager localCheckpoints (the
    k-core/CC lineage discipline); the oracle replays min-dist
    reachability as a recursive CTE over the same canonical edges."""
    edges = dd._persist(_cosupplier_edges(spark, sf_dir))
    nodes = (
        edges.select(F.col("a").alias("root"))
        .unionAll(edges.select(F.col("b").alias("root")))
        .distinct()
    )
    seeds = nodes.orderBy("root").limit(3)
    return kh.khop_summary(kh.khop_reach(edges, seeds, k=3))
