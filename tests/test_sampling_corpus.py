"""Properties of the deterministic sampling / corpus-analysis operators
beyond oracle parity (which tests/test_queries_oracle.py covers):
reproducibility, layout-invariance, threshold nesting, stratification,
contamination semantics, and tie-break determinism.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neynar_parquet_importer_spark.operators.corpus import (
    mixing_weights,
    ngram_contamination,
    top_ngrams,
)
from neynar_parquet_importer_spark.operators.sampling import (
    capped_per_group,
    hash_sample,
    split_column,
    stratified_sample,
    threshold_hex,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_hash_sample_reproducible_and_layout_invariant(docs):
    a = _ids(hash_sample(docs, ["doc_id"], 0.3))
    b = _ids(hash_sample(docs, ["doc_id"], 0.3))
    c = _ids(hash_sample(docs.repartition(17), ["doc_id"], 0.3))
    assert a == b == c and a, "sample must not depend on run or layout"


def test_hash_sample_thresholds_nest(docs):
    """Raising the fraction only ADDS rows — the resumability property:
    a 1% pilot sample is a strict subset of the later 10% run."""
    s10 = _ids(hash_sample(docs, ["doc_id"], 0.1))
    s30 = _ids(hash_sample(docs, ["doc_id"], 0.3))
    assert s10 <= s30
    n = docs.count()
    assert abs(len(s30) / n - 0.3) < 0.08  # binomial tolerance at n=500


def test_hash_sample_seed_changes_sample(docs):
    a = _ids(hash_sample(docs, ["doc_id"], 0.3, seed="a"))
    b = _ids(hash_sample(docs, ["doc_id"], 0.3, seed="b"))
    assert a != b


def test_threshold_hex_bounds():
    assert threshold_hex(0.0) == "00000000"
    assert threshold_hex(1.0) == "ffffffff"
    with pytest.raises(ValueError):
        threshold_hex(1.5)


def test_split_column_partitions_corpus(docs):
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = docs.withColumn("split", split_column(["doc_id"], weights))
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(weights)
    n = docs.count()
    assert sum(counts.values()) == n, "every row lands in exactly one split"
    assert counts["train"] / n > 0.7


def test_stratified_sample_respects_fractions(docs):
    frac = {"en": 0.0, "zh": 1.0}
    out = stratified_sample(docs, "lang", frac, ["doc_id"])
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert "en" not in langs, "fraction 0 strata must be dropped"
    n_zh = docs.filter(F.col("lang") == "zh").count()
    assert out.filter(F.col("lang") == "zh").count() == n_zh


def test_capped_per_group_deterministic_and_bounded(docs):
    out = capped_per_group(docs, "source", ["doc_id"], cap=5)
    per = out.groupBy("source").agg(F.count("*").alias("n")).collect()
    assert all(r.n <= 5 for r in per)
    # small groups pass through untouched; selection is reproducible
    again = capped_per_group(docs.repartition(13), "source", ["doc_id"], cap=5)
    assert _ids(out) == _ids(again)


def test_ngram_contamination_flags_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),  # shares 'the quick brown' etc.
            (2, "totally novel words here now"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox sleeps")], ["doc_id", "text"]
    )
    rows = {
        r.doc_id: r
        for r in ngram_contamination(corpus, bench, "text", "doc_id", 3).collect()
    }
    assert rows[1].n_contaminated == 2  # 'the quick brown', 'quick brown fox'
    assert rows[1].n_shingles == 3
    assert rows[2].n_contaminated == 0
    assert rows[2].contamination == 0.0


def test_top_ngrams_counts_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c"), (3, "x y z")], ["doc_id", "text"]
    )
    out = top_ngrams(df, "text", "doc_id", shingle_n=3, k=3).collect()
    assert (out[0].shingle, out[0].n_occurrences, out[0].n_docs) == ("a b c", 3, 2)
    # ties (count 1) break alphabetically
    assert [r.shingle for r in out[1:]] == sorted(r.shingle for r in out[1:])


def test_hash_thresholds_portable_to_duckdb():
    """The md5-range predicate must produce the IDENTICAL verdict in any
    SQL engine — checked against DuckDB over random keys, seeds, and
    fractions (the portability claim the oracle queries rely on)."""
    import hashlib

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from neynar_parquet_importer_spark.operators.sampling import (
        hash_hex_sql,
        split_case_sql,
    )

    con = duckdb.connect()

    @settings(max_examples=50, deadline=None)
    @given(
        key=st.integers(min_value=-(2**62), max_value=2**62),
        seed=st.text(
            alphabet=st.characters(whitelist_categories=("L", "N")), min_size=1, max_size=8
        ),
        frac=st.floats(min_value=0.0, max_value=1.0),
    )
    def check(key, seed, frac):
        # python reference of hash_hex (what the Spark Column computes)
        py_hex = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:8]
        duck_hex = con.execute(
            f"SELECT {hash_hex_sql(['?'], seed)}", [key]
        ).fetchone()[0]
        assert py_hex == duck_hex
        t = threshold_hex(frac)
        assert (py_hex < t) == (duck_hex < t)

    check()

    # split CASE agrees with the python-side cumulative thresholds
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    case = split_case_sql(["doc_id"], weights, seed="split")
    rows = con.execute(
        f"SELECT doc_id, {case} AS split FROM (SELECT unnest(range(1000)) AS doc_id)"
    ).fetchall()
    import hashlib as hl

    for doc_id, split in rows:
        h = hl.md5(f"split:{doc_id}".encode()).hexdigest()[:8]
        if h < threshold_hex(0.8):
            assert split == "train"
        elif h < threshold_hex(0.9):
            assert split == "val"
        else:
            assert split == "test"


def test_pii_redaction_replaces_matches(spark):
    """Synthetic corpus docs carry no PII, so the oracle check alone can't
    witness replacement — this does, on planted matches."""
    from neynar_parquet_importer_spark.operators.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [(1, "contact bob@example.com or 10.0.0.1 today"), (2, "clean text")],
        ["doc_id", "text"],
    )
    counts = pii_counts(F.col("text"))
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            counts["email"].alias("e"),
            counts["ipv4"].alias("i"),
            redact_pii("text").alias("red"),
        ).collect()
    }
    assert (rows[1].e, rows[1].i) == (1, 1)
    assert rows[1].red == "contact <EMAIL> or <IPV4> today"
    assert (rows[2].e, rows[2].i) == (0, 0)
    assert rows[2].red == "clean text"


def test_repetition_score_flags_boilerplate(spark):
    from neynar_parquet_importer_spark.operators.text import repetition_score

    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "all words here differ"), (3, "  ")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r.rep for r in df.select("doc_id", repetition_score("text").alias("rep")).collect()}
    assert rows[1] == 0.75
    assert rows[2] == 0.0
    assert rows[3] == 0.0


def test_mixing_weights_balance(docs):
    rows = mixing_weights(docs, "lang").collect()
    total = sum(r.n_docs for r in rows)
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    for r in rows:
        # weight * share * n_strata == 1 (inverse-frequency balance)
        assert abs(r.weight * r.n_docs * len(rows) / total - 1.0) < 1e-3


# ---------------------------------------------------------------------------
# Passage-level dedup + shingle novelty (first-occurrence semantics)
# ---------------------------------------------------------------------------

def test_passage_dedup_first_occurrence_wins(spark):
    """A passage repeated across documents survives only at its smallest
    (doc_id, chunk_idx); a full duplicate document keeps nothing."""
    from neynar_parquet_importer_spark.operators.corpus import passage_dedup

    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"          # chunk A (10 words)
    b = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"          # chunk B
    docs = spark.createDataFrame(
        [
            (0, f"{a} {b}"),      # defines A then B
            (1, f"{b} {a}"),      # both already seen -> keeps nothing
            (2, f"{a} y1 y2"),    # A seen; trailing short chunk is new
        ],
        "doc_id long, text string",
    )
    rows = {
        r["id"]: r
        for r in passage_dedup(docs, "text", "doc_id", chunk_words=10).collect()
    }
    assert rows[0]["kept_chunks"] == 2 and rows[0]["kept_text"] == f"{a} {b}"
    assert rows[1]["kept_chunks"] == 0 and rows[1]["kept_text"] == ""
    assert rows[2]["kept_chunks"] == 1 and rows[2]["kept_text"] == "y1 y2"


def test_shingle_novelty_order_semantics(spark):
    """First doc scores 1.0; an exact copy scores 0.0; a half-overlapping
    doc scores the fraction of its distinct shingles it introduced."""
    from neynar_parquet_importer_spark.operators.corpus import shingle_novelty

    docs = spark.createDataFrame(
        [
            (0, "a b c d"),       # shingles: {a b c, b c d} -> both new
            (1, "a b c d"),       # exact copy -> nothing new
            (2, "b c d e"),       # {b c d, c d e} -> one of two new
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in shingle_novelty(docs, "text", "doc_id", 3).collect()}
    assert out[0]["novelty"] == 1.0
    assert out[1]["novelty"] == 0.0
    assert out[2]["novelty"] == 0.5


def test_passage_dedup_matches_python_reference(spark):
    """Hypothesis: passage_dedup's first-occurrence-wins semantics match
    a direct Python reference over random small-alphabet corpora (tiny
    vocab forces chunk collisions within and across docs)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from neynar_parquet_importer_spark.operators.corpus import passage_dedup

    CH = 3  # chunk_words

    def reference(texts):
        seen = set()
        out = {}
        for doc_id, text in enumerate(texts):
            words = text.split()
            chunks = [
                " ".join(words[i : i + CH]) for i in range(0, len(words), CH)
            ]
            kept = [c for c in chunks if c not in seen and not seen.add(c)]
            out[doc_id] = (len(chunks), len(kept), " ".join(kept))
        return out

    @settings(max_examples=8, deadline=None)
    @given(
        texts=st.lists(
            st.lists(
                st.sampled_from(["a", "b", "c"]), min_size=1, max_size=12
            ).map(" ".join),
            min_size=1,
            max_size=6,
        )
    )
    def check(texts):
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            r["id"]: (r["n_chunks"], r["kept_chunks"], r["kept_text"])
            for r in passage_dedup(docs, "text", "doc_id", chunk_words=CH).collect()
        }
        assert got == reference(texts)

    check()


def test_sequence_packing_partition_invariant(spark):
    """The two-phase prefix sum must give identical offsets for any
    partition count — including 1 (degenerate) and more partitions than
    rows."""
    from neynar_parquet_importer_spark.operators.packing import token_offsets

    rows = [(i, (i * 7) % 13 + 1) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")

    def run(n):
        return sorted(
            tuple(r) for r in token_offsets(df, num_partitions=n).collect()
        )

    expected = []
    acc = 0
    for i, t in rows:
        expected.append((i, t, acc))
        acc += t
    assert run(1) == run(4) == run(64) == sorted(expected)


def test_sequence_packing_spans(spark):
    """Documents straddling a sequence boundary report every sequence
    they touch; zero-token docs keep a defined position."""
    from neynar_parquet_importer_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(0, 10), (1, 0), (2, 25), (3, 5)], "doc_id long, n_tokens long"
    )
    got = {r["id"]: r for r in pack_sequences(df, seq_len=16).collect()}
    assert (got[0]["first_seq"], got[0]["last_seq"]) == (0, 0)   # [0,10)
    assert (got[1]["first_seq"], got[1]["last_seq"]) == (0, 0)   # empty at 10
    assert (got[2]["first_seq"], got[2]["last_seq"]) == (0, 2)   # [10,35) spans 3
    assert got[2]["n_seqs"] == 3
    assert (got[3]["first_seq"], got[3]["last_seq"]) == (2, 2)   # [35,40)


def test_weighted_sample_properties(spark, docs):
    """Weighted sampling: deterministic across repartitionings, excludes
    non-positive weights, and heavier rows win more often (measured over
    seeds on a two-weight population)."""
    from neynar_parquet_importer_spark.operators.sampling import weighted_sample

    rows = [(i, 100 if i < 20 else 1) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, w long")

    a = {r["doc_id"] for r in weighted_sample(df, ["doc_id"], "w", 30).collect()}
    b = {
        r["doc_id"]
        for r in weighted_sample(df.repartition(7), ["doc_id"], "w", 30).collect()
    }
    assert a == b  # layout-invariant

    zero = spark.createDataFrame([(1, 0), (2, -3), (3, 5)], "doc_id long, w long")
    got = {r["doc_id"] for r in weighted_sample(zero, ["doc_id"], "w", 3).collect()}
    assert got == {3}

    heavy_wins = 0
    for seed in ("s1", "s2", "s3"):
        s = {
            r["doc_id"]
            for r in weighted_sample(df, ["doc_id"], "w", 30, seed=seed).collect()
        }
        heavy_wins += len([i for i in s if i < 20])
    # 20 heavy rows at 100x weight should dominate the 30-row sample
    assert heavy_wins / 3 >= 15, heavy_wins


def test_corpus_caches_invalidate_on_rewrite(spark, tmp_path):
    """Per-corpus derived-artifact caches key on (path, mtime): rewriting
    a corpus dir's embeddings file must invalidate, not serve stale dims."""
    import os
    import shutil

    from neynar_parquet_importer_spark.plans import queries as Q

    d = str(tmp_path / "corpus")
    os.makedirs(d)
    shutil.copy("/root/testdata/sf0.001/embeddings.parquet", f"{d}/embeddings.parquet")
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    assert Q._embedding_dim(emb, d) == 64

    spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<double>"
    ).toPandas().to_parquet(f"{d}/embeddings.parquet")
    os.utime(f"{d}/embeddings.parquet", (1, 2_000_000_000))  # force mtime change
    emb2 = spark.read.parquet(f"{d}/embeddings.parquet")
    assert Q._embedding_dim(emb2, d) == 2


def test_token_offsets_persist_registered_for_release(spark):
    """token_offsets pins its pid-stamped frame (one materialization for
    both the bases collect and the phase-3 join); the pin must be
    registered with the shared release hook so long-lived sessions can
    free it."""
    from neynar_parquet_importer_spark.operators import dedup as dd
    from neynar_parquet_importer_spark.operators.packing import token_offsets

    sc = spark.sparkContext
    dd.release_cached()
    baseline = len(sc._jsc.sc().getRDDStorageInfo())  # other suites' frames
    df = spark.createDataFrame(
        [(i, i % 5 + 1) for i in range(100)], "doc_id long, n_tokens long"
    )
    rows = token_offsets(df, num_partitions=4).collect()
    assert len(rows) == 100
    assert len(sc._jsc.sc().getRDDStorageInfo()) >= baseline + 1
    dd.release_cached()
    assert len(sc._jsc.sc().getRDDStorageInfo()) <= baseline


def test_remove_boilerplate_chunks_semantics(spark):
    """A 10-word block shared by 4 documents is boilerplate (df > 2) and
    must vanish from ALL of them — including its first occurrence, the
    difference from passage_dedup — while content in <= 2 docs stays."""
    from neynar_parquet_importer_spark.operators.corpus import (
        remove_boilerplate_chunks,
    )

    boiler = "one two three four five six seven eight nine ten"
    rows = [
        (i, f"{boiler} unique{i}a unique{i}b unique{i}c unique{i}d unique{i}e "
            f"unique{i}f unique{i}g unique{i}h unique{i}i unique{i}j")
        for i in range(4)
    ]
    rows.append((10, "standalone words that appear nowhere else in this corpus at all"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.id: r
        for r in remove_boilerplate_chunks(
            df, "text", "doc_id", chunk_words=10, max_chunk_df=2
        ).collect()
    }
    for i in range(4):
        assert out[i].n_chunks == 2 and out[i].kept_chunks == 1, out[i]
        assert boiler not in out[i].kept_text  # dropped everywhere
        assert f"unique{i}a" in out[i].kept_text
    # 11 words -> 2 chunks, both unique -> both kept
    assert out[10].kept_chunks == out[10].n_chunks == 2
    assert "standalone" in out[10].kept_text


def test_epoch_shuffle_is_deterministic_and_seed_sensitive(spark):
    """Same seed -> identical permutation regardless of partition layout;
    different seed -> a different permutation of the same rows."""
    from neynar_parquet_importer_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = [r.doc_id for r in epoch_shuffle(df, ["doc_id"], "epoch-1").collect()]
    b = [
        r.doc_id
        for r in epoch_shuffle(df.repartition(7), ["doc_id"], "epoch-1").collect()
    ]
    c = [r.doc_id for r in epoch_shuffle(df, ["doc_id"], "epoch-2").collect()]
    assert a == b, "permutation must be layout-invariant"
    assert sorted(a) == sorted(c) == list(range(500))
    assert a != c, "a new epoch seed must yield a new permutation"


def test_substring_dup_stats_planted_span(spark):
    """A 15-token span shared verbatim by two documents must surface as
    a run of exactly 15-5+1=11 duplicated 5-gram positions in each,
    while fully-unique documents report zero duplication; an internal
    repeat within ONE document also counts (occurrence > 1 is
    corpus-wide, same-doc included)."""
    from neynar_parquet_importer_spark.operators.corpus import (
        substring_dup_stats,
    )

    span = " ".join(f"shared{i}" for i in range(15))
    rows = [
        (0, " ".join(f"a{i}" for i in range(10)) + " " + span),
        (1, span + " " + " ".join(f"b{i}" for i in range(10))),
        (2, " ".join(f"c{i}" for i in range(25))),
        # internal repetition: the same 5 tokens twice in one doc
        (3, " ".join(f"d{i % 5}" for i in range(10))
            + " " + " ".join(f"e{i}" for i in range(10))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.id: r for r in substring_dup_stats(df, "text", "doc_id", gram_n=5).collect()
    }
    # docs 0/1: 25 tokens -> 21 windows; the shared span contributes 11
    # consecutive duplicated positions
    for d in (0, 1):
        assert out[d].n_grams == 21
        assert out[d].dup_grams == 11
        assert out[d].max_dup_run == 11
    assert out[2].dup_grams == 0 and out[2].max_dup_run == 0
    assert out[3].dup_grams > 0  # internal repeat detected


def test_text_stats_degenerate_docs(spark):
    """Empty and sub-n-token documents follow the whole-text-shingle
    contract everywhere: they contribute exactly one window at pos 0,
    and two empty documents are duplicates OF EACH OTHER."""
    from neynar_parquet_importer_spark.operators.corpus import (
        gopher_repetition,
        substring_dup_stats,
    )

    rows = [
        (0, ""),                      # empty -> one '' window
        (1, ""),                      # its duplicate
        (2, "lonely"),                # single token
        (3, "two words"),             # below trigram width
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sub = {r.id: r for r in substring_dup_stats(df, "text", "doc_id", gram_n=5).collect()}
    assert all(sub[i].n_grams == 1 for i in range(4))
    assert sub[0].dup_grams == 1 and sub[1].dup_grams == 1  # '' == ''
    assert sub[0].max_dup_run == 1
    assert sub[2].dup_grams == 0 and sub[3].dup_grams == 0

    gop = {r.id: r for r in gopher_repetition(df, "text", "doc_id").collect()}
    for i in range(4):
        # one whole-text window per n-gram family -> top fraction is 1,
        # nothing repeats within the doc
        assert gop[i].top_bigram_frac == 1.0
        assert gop[i].dup_trigram_frac == 0.0


def test_passage_windows_cover_every_token(spark):
    """Overlapping chunking contract: every token position lands in >= 1
    passage, consecutive passages overlap by size - stride, the final
    passage may be short, and sub-window docs yield themselves."""
    from neynar_parquet_importer_spark.operators.corpus import passage_windows

    text100 = " ".join(f"w{i}" for i in range(100))
    rows = [(0, text100), (1, "a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        (r.id, r.passage_idx, r.passage, r.n_tokens)
        for r in passage_windows(df, "text", "doc_id", size=32, stride=24).collect()
    )
    doc0 = [r for r in out if r[0] == 0]
    assert [r[1] for r in doc0] == [0, 1, 2, 3]
    assert [r[3] for r in doc0] == [32, 32, 32, 28]  # last window short
    covered = set()
    for _, idx, passage, n in doc0:
        toks = passage.split(" ")
        assert len(toks) == n
        assert toks[0] == f"w{idx * 24}"  # stride placement
        covered |= set(toks)
    assert covered == {f"w{i}" for i in range(100)}
    doc1 = [r for r in out if r[0] == 1]
    assert doc1 == [(1, 0, "a b c", 3)]


def test_passage_windows_rejects_gapped_stride(spark):
    """stride > size would leave tokens uncovered and emit phantom
    out-of-range windows (empty text, negative n_tokens) — rejected."""
    import pytest

    from neynar_parquet_importer_spark.operators.corpus import passage_windows

    df = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride .* must be <= size"):
        passage_windows(df, "text", "doc_id", size=2, stride=10)


def test_negative_samples_single_doc_fails_loudly(spark):
    """A 1-document corpus has no valid negative: the in-plan guard must
    raise at execution instead of silently returning an empty frame."""
    import pytest

    from neynar_parquet_importer_spark.operators.sampling import negative_samples

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(Exception, match="corpus of >= 2 documents"):
        negative_samples(df, "doc_id", k=2).collect()


def test_cluster_safe_split_has_zero_leakage(spark):
    """The cluster-aware split's defining property, asserted directly:
    every near-dup pair (the same >= 0.5 capped-Jaccard scan the query
    composes) lands WITHIN one split, every connected component maps to
    exactly one split, and singleton docs get the identical assignment
    the naive per-doc hash split would give them (so the fix changes
    only what it must)."""
    from neynar_parquet_importer_spark.operators import dedup as dd
    from neynar_parquet_importer_spark.plans.queries import (
        _SPLIT_WEIGHTS,
        split_cluster_safe,
    )

    assigned = split_cluster_safe(spark, SF)
    rows = assigned.collect()
    split_of = {r.doc_id: r.split for r in rows}
    key_of = {r.doc_id: r.split_key for r in rows}

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = dd.jaccard_all_pairs(
        docs, "text", "doc_id", threshold=0.5, max_shingle_df=0.05
    ).select("id_a", "id_b").collect()
    assert pairs, "fixture must contain near-dup pairs for the test to bite"
    leaked = [(p.id_a, p.id_b) for p in pairs if split_of[p.id_a] != split_of[p.id_b]]
    assert leaked == [], "near-dup pair crossed splits under the cluster split"

    # one split per component (stronger than pairwise: transitive members)
    by_key: dict[int, set[str]] = {}
    for d, k in key_of.items():
        by_key.setdefault(k, set()).add(split_of[d])
    assert all(len(s) == 1 for s in by_key.values())

    clustered = {p.id_a for p in pairs} | {p.id_b for p in pairs}
    naive = docs.select(
        "doc_id", split_column(["doc_id"], _SPLIT_WEIGHTS, seed="split").alias("s")
    ).collect()
    for r in naive:
        if r.doc_id not in clustered:
            assert key_of[r.doc_id] == r.doc_id
            assert split_of[r.doc_id] == r.s


def test_soft_dedup_weights_conserve_content_mass(spark):
    """Soft dedup's defining invariant: weights within one near-dup
    cluster sum to exactly 1.0 (each distinct piece of content
    contributes 1.0 to the training mix regardless of copy count), and
    every singleton keeps weight 1.0."""
    from collections import defaultdict

    from neynar_parquet_importer_spark.plans.queries import soft_dedup_weights

    rows = soft_dedup_weights(spark, SF).collect()
    docs_n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == docs_n
    multi = [r for r in rows if r.cluster_size > 1]
    assert multi, "fixture must contain near-dup clusters for the test to bite"
    by_size = defaultdict(list)
    for r in rows:
        if r.cluster_size == 1:
            assert r.weight == 1.0
        else:
            by_size[r.cluster_size].append(r.weight)
    for size, ws in by_size.items():
        # every member of every size-k cluster carries weight 1/k, and the
        # member count is a multiple of k (whole clusters, no partial)
        assert len(ws) % size == 0
        assert all(abs(w - 1.0 / size) < 1e-6 for w in ws)


def test_cluster_ops_on_pair_free_corpus(spark):
    """A corpus with no near-dup pairs (all-unique texts) must degrade
    both cluster-based operators to the naive behavior: every doc is a
    singleton — split == the per-doc hash split, every weight == 1.0.
    Pins the empty-edge-set path of connected_components (driver
    union-find over zero rows) end to end."""
    from neynar_parquet_importer_spark.operators import dedup as dd
    from neynar_parquet_importer_spark.plans.queries import _SPLIT_WEIGHTS

    docs = spark.createDataFrame(
        [(i, f"totally unique document number {i} about topic {i * 17}") for i in range(20)],
        "doc_id long, text string",
    )
    pairs = dd.jaccard_all_pairs(
        docs, "text", "doc_id", threshold=0.5, max_shingle_df=0.05
    ).select("id_a", "id_b")
    assert pairs.count() == 0
    comp = dd.connected_components(pairs, detach=True)
    assert comp.count() == 0
    assigned = (
        docs.select("doc_id")
        .join(comp.withColumnsRenamed({"id": "doc_id"}), "doc_id", "left")
        .select("doc_id", F.coalesce("component", "doc_id").alias("split_key"))
        .withColumn("split", split_column(["split_key"], _SPLIT_WEIGHTS, seed="split"))
        .collect()
    )
    naive = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id", split_column(["doc_id"], _SPLIT_WEIGHTS, seed="split").alias("s")
        ).collect()
    }
    for r in assigned:
        assert r.split_key == r.doc_id and r.split == naive[r.doc_id]
