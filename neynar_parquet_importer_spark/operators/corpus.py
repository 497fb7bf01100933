"""Corpus-level analysis operators for training-data pipelines:
benchmark-contamination detection, frequent-n-gram statistics, and
language/source mixing weights.

All three are shapes a 100 TB pre-training pipeline runs routinely:
- **contamination**: flag training documents sharing n-grams with an
  evaluation benchmark (the GPT-3-style 13-gram rule generalized to any
  n). The benchmark side is small by construction (eval suites are
  thousands of documents), so its distinct shingle set is broadcast and
  the check is a map-side semi-join — the corpus is scanned once, no
  shuffle of corpus data;
- **top n-grams**: partial (map-side) count aggregation per shingle,
  then TakeOrderedAndProject for the top-k — the shuffle carries one row
  per distinct shingle per partition, never raw text;
- **mixing weights**: per-stratum counts plus inverse-frequency weights;
  a two-level aggregate whose second level is a single-row broadcast.

Shingling reuses the codegen'd stream from :mod:`.dedup` so the
tokenization contract (split on whitespace runs of the trimmed,
lowercased text; whole-text shingle for docs shorter than n tokens) is
identical across the dedup and contamination families — and identical to
the DuckDB oracle SQL in ``plans/queries.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .parallelism import fan_out

from .dedup import _shingle_stream


def distinct_shingles(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int
) -> DataFrame:
    """(id, shingle) with per-document duplicates removed — the set form
    used by Jaccard, contamination, and frequency statistics."""
    return _shingle_stream(df, text_col, id_col, shingle_n).select("id", "shingle").distinct()


def shingle_array(text_col, shingle_n: int = 3):
    """Row-local shingle ARRAY expression — same contract as
    ``dedup._shingle_stream`` (whitespace tokens of trim(lower(text));
    complete n-grams, or one whole-text shingle for short docs) but with
    no window/explode, so it is legal in Structured Streaming plans and
    other row-at-a-time contexts. Array lambdas are interpreted (not
    codegen'd): prefer the exploded stream form for batch corpus scans."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(F.trim(F.lower(c)), r"\s+")
    whole = F.array(F.array_join(toks, " "))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (shingle_n - 1)),
        lambda i: F.array_join(F.slice(toks, i, shingle_n), " "),
    )
    return F.when(F.size(toks) < shingle_n, whole).otherwise(grams)


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-corpus-document benchmark overlap:
    (doc_id, n_shingles, n_contaminated, contamination ratio).

    The benchmark's distinct shingle set is broadcast — the plan is one
    corpus scan + shingle explode + broadcast left-semi-style join +
    hash aggregate on doc id. Corpus rows never shuffle; only per-doc
    counters do. Decontamination is then a filter on the ratio (or on
    ``n_contaminated > 0`` for the strict rule).
    """
    corpus_sh = distinct_shingles(corpus, text_col, id_col, shingle_n)
    bench_sh = F.broadcast(
        distinct_shingles(benchmark, text_col, id_col, shingle_n)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    joined = corpus_sh.join(bench_sh, "shingle", "left")
    return (
        joined.groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__hit").alias("n_contaminated"),
        )
        .withColumn(
            "contamination",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6),
        )
    )


def top_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    k: int = 20,
) -> DataFrame:
    """Corpus-wide k most frequent n-grams: (shingle, n_occurrences,
    n_docs), deterministic under ties (ordered by count desc, shingle asc).

    Occurrences count every appearance; ``n_docs`` counts documents
    containing the shingle at least once — both from one aggregate pass.
    The top-k plans as TakeOrderedAndProject: per-partition heaps of k
    rows, a k-row driver merge, no global sort.
    """
    sh = _shingle_stream(df, text_col, id_col, shingle_n)
    return (
        sh.groupBy("shingle")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("shingle"))
        .limit(k)
    )


def mixing_weights(
    df: DataFrame,
    strata_col: str = "lang",
    round_to: int = 6,
) -> DataFrame:
    """Per-stratum corpus share and inverse-frequency mixing weight:
    (stratum, n_docs, share, weight) with weight = total/(n_strata * n) —
    the uniform-over-strata target used to rebalance skewed corpora
    (weights > 1 upsample rare strata, < 1 downsample dominant ones).

    Two-level aggregate: the per-stratum count shuffles one row per
    stratum; the corpus total arrives via an unpartitioned window over
    that tiny frame (strata counts fit on any node at any corpus size).
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(strata_col)).agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy()
    total = F.sum("n_docs").over(w)
    n_strata = F.count(F.lit(1)).over(w)
    return counts.select(
        strata_col,
        "n_docs",
        F.round(F.col("n_docs") / total, round_to).alias("share"),
        F.round(total / (n_strata * F.col("n_docs")), round_to).alias("weight"),
    )


def mixing_weights_temperature(
    df: DataFrame,
    strata_col: str = "lang",
    alpha: float = 0.3,
    round_to: int = 6,
) -> DataFrame:
    """Temperature-scaled sampling weights (the multilingual alpha-
    sampling rule of mBERT/XLM-R/mT5): stratum share p_l = n_l/N is
    flattened to q_l = p_l^alpha / sum(p^alpha), and each stratum's
    per-document sampling weight is q_l/p_l — alpha=1 reproduces natural
    proportions, alpha->0 approaches uniform-over-strata (the limit
    :func:`mixing_weights` computes exactly).

    Same execution shape as mixing_weights: one shuffled count per
    stratum, then unpartitioned windows over the provably tiny strata
    frame for the two normalizers.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(strata_col)).agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy()
    total = F.sum("n_docs").over(w)
    p = F.col("n_docs") / total
    pa = F.pow(p, F.lit(alpha))
    q = pa / F.sum(pa).over(w)
    return counts.select(
        strata_col,
        "n_docs",
        F.round(p, round_to).alias("share"),
        F.round(q, round_to).alias("temp_share"),
        F.round(q / p, round_to).alias("sample_weight"),
    )


def gopher_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_top_bigram_frac: float = 0.20,
    max_dup_trigram_frac: float = 0.30,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, table A1 shape)
    adapted to n-gram positions: per document, the fraction of bigram
    positions occupied by the single most frequent bigram, and the
    fraction of trigram positions whose trigram occurs more than once in
    the document. ``repetition_ok`` applies the thresholds (defaults in
    the spirit of Gopher's 0.20 top-2-gram / 0.30 dup-n-gram rules).

    Execution shape: each n-gram stream aggregates (id, gram) -> count
    (partial+final, one shuffle on the pair key), then a doc-level
    aggregate folds max/total/dup-covered counts; the two doc-cardinality
    frames join on id. No text ever shuffles — only 8-byte gram hashes.
    Tokenization reuses :func:`~.dedup._shingle_stream`, so the oracle
    SQL mirrors the same whole-text-shingle-for-short-docs contract.
    """

    def _per_doc(n: int, prefix: str) -> DataFrame:
        grams = _shingle_stream(df, text_col, id_col, n).select(
            "id", F.xxhash64("shingle").alias("g")
        )
        per_gram = grams.groupBy("id", "g").agg(F.count(F.lit(1)).alias("c"))
        return per_gram.groupBy("id").agg(
            F.max("c").alias(f"{prefix}_top"),
            F.sum("c").alias(f"{prefix}_n"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
                f"{prefix}_dup"
            ),
        )

    bi = _per_doc(2, "b")
    tri = _per_doc(3, "t")
    top_bigram_frac = F.round(F.col("b_top") / F.col("b_n"), 6)
    dup_trigram_frac = F.round(F.col("t_dup") / F.col("t_n"), 6)
    return bi.join(tri, "id").select(
        "id",
        top_bigram_frac.alias("top_bigram_frac"),
        dup_trigram_frac.alias("dup_trigram_frac"),
        (
            (top_bigram_frac <= max_top_bigram_frac)
            & (dup_trigram_frac <= max_dup_trigram_frac)
        ).alias("repetition_ok"),
    )


def passage_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping fixed-size passage extraction (the RAG/retrieval
    chunking shape: ``size``-token windows every ``stride`` tokens, so
    consecutive passages overlap by ``size - stride``). Returns
    (id, passage_idx, passage, n_tokens); the final passage may be
    shorter, and a document shorter than ``size`` yields exactly one
    passage (itself) — every token belongs to >= 1 passage.

    Pure codegen projection: tokenized once per row, start offsets from
    a ``sequence`` explode, each passage via ``slice`` + ``array_join``
    (ordinary expressions, not interpreted lambda HOFs). No shuffle at
    all — chunking 100 TB is embarrassingly parallel and plans as one
    scan stage."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    if stride > size:
        # a gap between consecutive windows would leave tokens uncovered
        # and generate phantom out-of-range starts (empty passages with
        # negative n_tokens) — the overlap contract requires stride <= size
        raise ValueError(
            f"stride ({stride}) must be <= size ({size}): windows must "
            "overlap or tile so every token is covered"
        )
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(toks)
    # number of windows: 1 + ceil((n - size) / stride) when n > size
    n_pass = F.greatest(
        (F.ceil((n - F.lit(size)) / F.lit(stride)) + 1).cast("int"), F.lit(1)
    )
    starts = F.sequence(
        F.lit(0), (n_pass - 1) * F.lit(stride), F.lit(stride)
    )
    exploded = df.select(
        F.col(id_col).alias("id"), toks.alias("__toks"), F.explode(starts).alias("__start")
    )
    return exploded.select(
        "id",
        (F.col("__start") / stride).cast("int").alias("passage_idx"),
        F.array_join(
            F.slice(F.col("__toks"), F.col("__start") + 1, size), " "
        ).alias("passage"),
        F.least(F.lit(size), F.size("__toks") - F.col("__start")).alias(
            "n_tokens"
        ),
    )


def dsir_log_weights(
    source: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    round_to: int = 4,
) -> DataFrame:
    """DSIR-style importance log-weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling", unigram
    feature family): per source document,
    ``sum over tokens of ln p_target(tok) - ln p_source(tok)`` with
    additive-``alpha`` smoothing over the joint vocabulary. High weight
    = the document looks like the target domain; resampling source docs
    proportional to exp(weight) shifts the corpus toward the target.

    Execution shape: both corpora aggregate to token-count tables (one
    shuffle each on the token key), a full-outer join + one-row totals
    frame turn them into a per-token log-ratio table (O(vocab), the
    small side at any corpus scale), and each source document folds its
    token stream through one join + grouped sum. No text shuffles —
    only tokens and counters."""
    def toks(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("tok"),
        )

    src, tgt = toks(source), toks(target)
    sc = src.groupBy("tok").agg(F.count(F.lit(1)).alias("ns"))
    tc = tgt.groupBy("tok").agg(F.count(F.lit(1)).alias("nt"))
    stats = (
        sc.join(tc, "tok", "full_outer")
        .select(
            "tok",
            F.coalesce("ns", F.lit(0)).alias("ns"),
            F.coalesce("nt", F.lit(0)).alias("nt"),
        )
    )
    # Spark resolves names case-insensitively by default, so the totals
    # must not collide with ns/nt
    totals = F.broadcast(
        stats.agg(
            F.sum("ns").alias("tot_s"),
            F.sum("nt").alias("tot_t"),
            F.count(F.lit(1)).alias("vocab"),
        )
    )
    ratio = (
        F.log((F.col("nt") + alpha) / (F.col("tot_t") + alpha * F.col("vocab")))
        - F.log((F.col("ns") + alpha) / (F.col("tot_s") + alpha * F.col("vocab")))
    )
    scored = src.join(stats, "tok").crossJoin(totals)
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        # + 0.0 normalizes IEEE negative zero: a log-ratio sum can round
        # to -0.0, which formats as "-0" and breaks value-parity against
        # an engine that landed on +0.0 (caught by the second-seed
        # corpus run; -0.0 + 0.0 = +0.0, any other value is unchanged)
        (F.round(F.sum(ratio), round_to) + F.lit(0.0)).alias("log_weight"),
    )


def substring_dup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_n: int = 10,
) -> DataFrame:
    """Exact-substring duplication statistics per document (the
    Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    Better" signal, at k-gram granularity): a position is DUPLICATED if
    its ``gram_n``-token window occurs more than once in the corpus
    (another document, or elsewhere in the same one). Emits per doc the
    window count, duplicated-window count and fraction, and the longest
    RUN of consecutive duplicated positions — the run length is what
    distinguishes a quoted paragraph (long run, cut it) from scattered
    idiom overlap (short runs, keep).

    Execution shape: one positional k-gram stream (the codegen
    posexplode+lead form), one aggregate on the 8-byte gram hash for
    global occurrence counts, one equi-join back on that hash (1:1 per
    position — no pair fanout, so no df-cap is needed here), then
    per-doc windows: consecutive duplicated positions grouped by the
    classic ``pos - row_number`` gap trick and folded into the doc
    aggregate. Suffix-automaton exactness at arbitrary lengths is not
    attempted — k-gram granularity is the standard distributed
    compromise (a duplicated substring of length >= gram_n tokens is
    exactly a run of >= 1 duplicated windows).
    """
    from pyspark.sql import Window

    from .dedup import _persist, _shingle_stream

    pos = _persist(
        _shingle_stream(df, text_col, id_col, gram_n).select(
            "id", "pos", F.xxhash64("shingle").alias("g")
        )
    )
    counts = pos.groupBy("g").agg(F.count(F.lit(1)).alias("occ"))
    marked = pos.join(counts, "g").select(
        "id", "pos", (F.col("occ") > 1).alias("dup")
    )
    wd = Window.partitionBy("id", "dup").orderBy("pos")
    runs = marked.withColumn(
        "grp", F.col("pos") - F.row_number().over(wd)
    )
    per_run = runs.groupBy("id", "dup", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    run_stats = per_run.groupBy("id").agg(
        F.max(F.when(F.col("dup"), F.col("run_len")).otherwise(0)).alias(
            "max_dup_run"
        )
    )
    doc_stats = marked.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.col("dup").cast("long")).alias("dup_grams"),
    )
    return doc_stats.join(run_stats, "id").select(
        "id",
        "n_grams",
        "dup_grams",
        F.round(F.col("dup_grams") / F.col("n_grams"), 6).alias("dup_fraction"),
        "max_dup_run",
    )


def passage_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 10,
) -> DataFrame:
    """(id, chunk_idx, chunk) — fixed-size word windows ("passages") per
    document, the granularity of passage-level dedup (SlimPajama-style
    line/passage dedup generalized to fixed word windows).

    Pure Column expressions: split → sequence → transform → posexplode,
    all inside whole-stage codegen. No shuffle on multi-split inputs;
    each document expands in place on its own partition. A single-split
    input is fanned out first (r11): the chunking arithmetic runs inside
    the scan stage and its consumers (the dedup aggregate build AND the
    probe side) each re-run it, so one split serializes two full
    chunking passes through one core (stage profile: 2 stages x 1 task
    x ~0.6 s at sf0.1); the conditional repartition moves (id, text)
    rows once and no-ops at any real corpus scale.
    """
    w = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.ceil(F.size(w) / F.lit(chunk_words)).cast("int")
    idxs = F.sequence(F.lit(0), F.greatest(n, F.lit(1)) - 1)
    chunks = F.transform(
        idxs,
        lambda i: F.array_join(F.slice(w, i * chunk_words + 1, chunk_words), " "),
    )
    return fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("id"), F.posexplode(chunks).alias("chunk_idx", "chunk")
    )


def passage_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 10,
) -> DataFrame:
    """Corpus-wide passage-level exact dedup: a passage survives only at
    its first occurrence (smallest (doc_id, chunk_idx)); every later
    repetition anywhere in the corpus is dropped. Returns per-document
    (id, n_chunks, kept_chunks, kept_text) where kept_text is the
    document reassembled from its surviving passages in order.

    Scale shape: passages are keyed by md5 (the 128-bit identity used by
    exact_dedup) so the global group-by shuffles 16-byte keys + two
    longs, never passage text; the rejoin carries passage text only as
    far as the per-document reassembly, which is co-partitioned by id.
    The first occurrence is min(struct(id, chunk_idx)) — lexicographic
    struct ordering, no arithmetic key that could overflow 64-bit ids or
    collide past 1M chunks.
    """
    key = F.struct(F.col("id"), F.col("chunk_idx")).alias("k")
    chunks = passage_chunks(df, text_col, id_col, chunk_words).select(
        "id", "chunk_idx", "chunk", key, F.md5(F.col("chunk")).alias("chash")
    )
    firsts = chunks.groupBy("chash").agg(F.min("k").alias("first_key"))
    joined = chunks.join(firsts, "chash")
    kept = F.col("k") == F.col("first_key")
    return (
        joined.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(kept.cast("long")).alias("kept_chunks"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(kept, F.struct(F.col("chunk_idx"), F.col("chunk")))
                        )
                    ),
                    lambda s: s.getField("chunk"),
                ),
                " ",
            ).alias("kept_text"),
        )
    )


def remove_boilerplate_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 10,
    max_chunk_df: int = 2,
) -> DataFrame:
    """CCNet/C4-style boilerplate removal generalized to fixed word
    windows: a chunk whose exact content appears in more than
    ``max_chunk_df`` DISTINCT documents is boilerplate (headers, footers,
    cookie banners, license blurbs) and is dropped from EVERY document;
    each document is reassembled from its surviving chunks in order.
    Returns (id, n_chunks, kept_chunks, kept_text).

    The frequency-based complement of :func:`passage_dedup`: passage
    dedup keeps the FIRST occurrence of repeated content (dedup
    semantics); boilerplate removal drops ALL occurrences once the
    cross-document frequency crosses the threshold (cleaning semantics —
    boilerplate carries no training signal anywhere it appears).

    Scale shape: chunks are keyed by md5 (16-byte shuffle keys, never
    chunk text), the per-chunk document frequency is one partial+final
    aggregate, the hot list is the df > threshold tail — tiny by
    construction, shipped as a broadcast anti-join exactly like the
    stop-shingle cap — and reassembly is co-partitioned by id.
    """
    chunks = passage_chunks(df, text_col, id_col, chunk_words).select(
        "id", "chunk_idx", "chunk", F.md5(F.col("chunk")).alias("chash")
    )
    hot = (
        chunks.groupBy("chash")
        .agg(F.countDistinct("id").alias("df"))
        .filter(F.col("df") > max_chunk_df)
        .select("chash")
        .withColumn("__hot", F.lit(1))
    )
    marked = chunks.join(F.broadcast(hot), "chash", "left")
    kept = F.col("__hot").isNull()
    return marked.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(kept.cast("long")).alias("kept_chunks"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(kept, F.struct(F.col("chunk_idx"), F.col("chunk")))
                    )
                ),
                lambda s: s.getField("chunk"),
            ),
            " ",
        ).alias("kept_text"),
    )


def shingle_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document novelty: the fraction of the document's distinct
    n-gram shingles that are globally first-seen in this document
    (min doc id over the corpus). 1.0 = contributes only new n-grams;
    0.0 = everything appeared in an earlier document. The standard
    ordering-based proxy for "marginal contribution" when curating with
    a fixed ingestion order.

    Execution shape: a shingle with min-id m contributes one "novel"
    credit to doc m and nothing to anyone else, so novelty folds into two
    DOC-cardinality aggregates over one persisted distinct stream —
    per-doc set size, and per-doc count of shingles it is first owner of
    (min-id per shingle re-grouped by owner). The final join is between
    two one-row-per-doc frames, NOT the shingle-cardinality
    stream-vs-firsts join (which shuffled the full shingle stream a
    second time and re-ran the explode per side). At 100 TB this removes
    the largest shuffle of the query outright.

    Reuses :func:`~.dedup._shingle_stream` so the tokenization contract
    matches the dedup/contamination family and the DuckDB oracles.
    """
    from .dedup import _persist  # shared persist registry (release_cached)

    sh = _persist(
        _shingle_stream(df, text_col, id_col, shingle_n)
        .select("id", F.md5(F.col("shingle")).alias("sh"))
        .distinct()
    )
    per_doc = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    novel = (
        sh.groupBy("sh")
        .agg(F.min("id").alias("first_doc"))
        .groupBy(F.col("first_doc").alias("id"))
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return per_doc.join(novel, "id", "left").select(
        "id",
        "n_shingles",
        # exact-integer sums, so count/count == the oracle's avg(0/1) to
        # the last ulp
        (
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("double")
            / F.col("n_shingles")
        ).alias("novelty"),
    )
