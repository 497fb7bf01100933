"""Distributed BPE merge learning: tokenizer induction ON the corpus
(Sennrich et al., "Neural Machine Translation of Rare Words with
Subword Units", 2016) as iterated Spark aggregations — the training
half of a tokenizer pipeline, the part that must see all the data.

Shape per merge step (the Lloyd-iteration discipline of
``clustering.kmeans_fit``): one adjacent-pair count (explode +
hash-aggregate, shuffle bounded by pair-vocabulary size), one driver-side
argmax over the top row, one corpus rewrite applying the winning merge.
The rewrite is inherently sequential WITHIN a sequence (left-to-right,
non-overlapping — "a a a" under merge (a,a) becomes ("aa", "a")), so it
runs as an Arrow-batched pandas UDF over the symbol arrays; everything
ACROSS sequences stays distributed. Each iteration materializes via
localCheckpoint — the measured PageRank lesson (plans/queries
pagerank A/B): per-iteration pinning beats a lazily chained 20-deep
plan by >2x and keeps lineage flat.

At 100 TB you train on a bounded sample — but sufficiency is a
property of the corpus, not a constant (measured, round 8: merge
ranking is decided by pair-count MARGINS, and a fixed sample is enough
only while its counting noise ~1/sqrt(count) sits under them; Zipfian
corpora resolve quickly, near-uniform ones never do —
BENCH_SCALING.checks.bpe_sample_sufficiency). Use
:func:`bpe_learn_stable` to VALIDATE a size by sequential doubling
instead of asserting one. Nothing here requires sampling: state after
every step is just the corpus symbol arrays plus an ``n_merges x 2``
merge table.

Determinism/oracle scope: counts are exact integers; the winner is
``max by (count, then lexicographically smallest (w1, w2))``; ties and
all arithmetic replay bit-identically in a single-process reference
implementation (:func:`bpe_learn_py`) — the independent-replay oracle
discipline of the kmeans twins. No floats anywhere.
"""

from __future__ import annotations

import re
from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import _ckpt, _release_ckpt

MERGE_JOIN = "▁"  # visible joiner so merged symbols stay unambiguous


# Java regex \s is ASCII-only: [ \t\n\x0b\f\r]. Python's \s (Unicode)
# and str.strip() (all Unicode whitespace) are NOT twins of the Spark
# expression — a NBSP or trailing newline would tokenize differently.
_JAVA_WS = re.compile("[ \t\n\x0b\f\r]+")


def _tok_py(text: str) -> list[str]:
    """Python twin of the Spark tokenizer ``split(trim(lower(t)),
    '\\s+')``: Java-\\s splitting, SPACE-only trim (Spark ``trim``
    strips spaces, not all whitespace), and the [''] result on empty
    text that a bare ``str.split()`` would drop."""
    return _JAVA_WS.split(text.lower().strip(" "))


def _merge_seq(seq: list, a: str, b: str, joined: str) -> list:
    """Left-to-right non-overlapping single-merge application."""
    out = []
    i, n = 0, len(seq)
    while i < n:
        if i + 1 < n and seq[i] == a and seq[i + 1] == b:
            out.append(joined)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _apply_merge_udf(a: str, b: str, joined: str):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def apply(col: pd.Series) -> pd.Series:
        return col.map(
            lambda s: None if s is None else _merge_seq(list(s), a, b, joined)
        )

    return apply


def pair_counts(df: DataFrame, sym_col: str = "syms") -> DataFrame:
    """(w1, w2, cnt) adjacent-pair occurrence counts — the per-step
    aggregate. Map-side partial combine bounds the shuffle at pair-
    vocabulary width."""
    syms = F.col(sym_col)
    n = F.size(syms)
    pairs = F.arrays_zip(
        F.slice(syms, 1, n - 1).alias("w1"),
        F.slice(syms, 2, n - 1).alias("w2"),
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def top_pair(counts: DataFrame) -> tuple[str, str, int] | None:
    """The merge winner: max count, ties to the lexicographically
    smallest (w1, w2). One driver-side row."""
    row = counts.orderBy(
        F.col("cnt").desc(), F.col("w1"), F.col("w2")
    ).head()
    if row is None:
        return None
    return row["w1"], row["w2"], row["cnt"]


def bpe_learn(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_count: int = 2,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` merges over whitespace-token symbol sequences.

    Returns ``(merges, final_df)`` where merges is
    ``[(w1, w2, count_at_merge_time), ...]`` in learned order and
    ``final_df`` holds the post-merge symbol arrays (column ``syms``) —
    the tokenized corpus under the learned vocabulary. Stops early when
    the best remaining pair falls below ``min_count`` (merging singleton
    pairs is noise)."""
    cur = _ckpt(
        # NULL text has no symbol sequence: dropped, matching the other
        # text operators and the single-process replay
        df.filter(F.col(text_col).isNotNull()).select(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("syms")
        )
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = top_pair(pair_counts(cur))
        if best is None or best[2] < min_count:
            break
        a, b, cnt = best
        merges.append((a, b, cnt))
        joined = a + MERGE_JOIN + b
        nxt = _ckpt(
            cur.select(
                _apply_merge_udf(a, b, joined)(F.col("syms")).alias("syms")
            )
        )
        # free the superseded iteration's blocks through the shared
        # registry (visible to release_cached(), one unpersist idiom)
        _release_ckpt(cur)
        cur = nxt
    return merges, cur


def bpe_learn_py(
    texts: Iterable[str], n_merges: int, min_count: int = 2
) -> list[tuple[str, str, int]]:
    """Single-process reference replay (no Spark): the independent
    oracle for the learned merge table — same tokenizer, same counts,
    same tie rule, same early stop."""
    seqs = [_tok_py(t) for t in texts if t is not None]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for s in seqs:
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + 1
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        joined = a + MERGE_JOIN + b
        seqs = [_merge_seq(s, a, b, joined) for s in seqs]
    return merges


def apply_merges(
    df: DataFrame,
    text_col: str,
    merges: Sequence[tuple[str, str]] | Sequence[tuple[str, str, int]],
    out_col: str = "syms",
) -> DataFrame:
    """Tokenize a corpus under a LEARNED merge table: whitespace
    symbols, then every merge applied in learned order (the standard
    BPE inference rule) — ONE Arrow-batched pass over the data however
    long the table is, which is why inference scales where training
    iterates."""
    rules = [(m[0], m[1], m[0] + MERGE_JOIN + m[1]) for m in merges]

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def tok(col: pd.Series) -> pd.Series:
        def run(text):
            if text is None:
                return None
            seq = _tok_py(text)
            for a, b, joined in rules:
                seq = _merge_seq(seq, a, b, joined)
            return seq

        return col.map(run)

    return df.filter(F.col(text_col).isNotNull()).select(
        tok(F.col(text_col)).alias(out_col)
    )


def token_occurrences(
    df: DataFrame,
    text_col: str,
    merges: Sequence[tuple[str, str]] | Sequence[tuple[str, str, int]],
) -> DataFrame:
    """(pos, s): one row per symbol occurrence under the learned table,
    via ONE mapInPandas stage. This exists because `posexplode` over a
    pandas-UDF column plans the UDF TWICE in the executed plan (measured
    on this Spark: two stacked ArrowEvalPython both computing the
    tokenizer) — generating the rows inside the Python stage guarantees
    exactly one tokenization pass."""
    rules = [(m[0], m[1], m[0] + MERGE_JOIN + m[1]) for m in merges]

    def gen(batches):
        for pdf in batches:
            pos: list[int] = []
            syms: list[str] = []
            for text in pdf[text_col]:
                if text is None:
                    continue
                seq = _tok_py(text)
                for a, b, joined in rules:
                    seq = _merge_seq(seq, a, b, joined)
                pos.extend(range(len(seq)))
                syms.extend(seq)
            yield pd.DataFrame({"pos": pos, "s": syms})

    return df.select(text_col).mapInPandas(gen, "pos int, s string")


def token_length_stats(occurrences: DataFrame) -> DataFrame:
    """One row (n_seqs, total_symbols, distinct_symbols) from a
    :func:`token_occurrences` stream — the compression evidence a merge
    table is judged by: symbol total = row count, sequence count =
    pos==0 rows (the tokenizer emits [''] for empty text, so every
    sequence has one), vocabulary = distinct symbols."""
    return occurrences.agg(
        # count(when(...)) not sum(when(...)): sum over an EMPTY stream
        # is NULL, while the replay oracle states literal 0
        F.count(F.when(F.col("pos") == 0, 1)).alias("n_seqs"),
        F.count(F.lit(1)).alias("total_symbols"),
        F.countDistinct("s").alias("distinct_symbols"),
    )


def bpe_learn_stable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int,
    start: int = 1024,
    max_docs: int = 65536,
    min_count: int = 2,
) -> dict:
    """Sequential-doubling sample validation for the module doc's "a
    bounded sample suffices" claim — which round 8 MEASURED to be
    corpus-dependent (BENCH_SCALING.checks.bpe_sample_sufficiency): the
    merge ranking is decided by count margins, and a fixed sample is
    sufficient only while its counting noise (~1/sqrt(pair count)) sits
    below those margins. Word-soup corpora with sub-percent margins
    defeat ANY bounded sample; Zipfian corpora converge quickly. So
    instead of asserting a size, VALIDATE one: train on ``s`` docs and
    ``2s`` docs (deterministic id-ordered prefixes, so the smaller
    sample is nested in the larger); identical merge tables mean the
    ranking is resolved at this noise level — return that table. On
    disagreement double ``s`` until ``max_docs``, then return the
    largest table with ``converged=False`` — the honest signal that
    this corpus's ranking needs the full pass (or doesn't exist).

    Cost: geometric — the final doubling dominates at ~2x the cost of
    training once at the converged size; every pass is the bounded
    distributed trainer (:func:`bpe_learn`), nothing is collected.

    When a sample already covers the WHOLE corpus the table is exact,
    not sampled — the doubled pass would retrain on identical rows and
    report a vacuous agreement (round-8 advisor finding), so the loop
    short-circuits and flags it via ``covered_corpus=True``
    (``agreed_with`` stays honest: ``None`` unless a genuinely smaller
    sample produced the same table)."""
    n_total = df.count()
    s = min(max(1, start), max_docs)  # never train past the declared cap
    prev: list | None = None
    prev_size = 0
    while True:
        covered = s >= n_total
        cur_df = df.orderBy(id_col).limit(s)
        merges, fin = bpe_learn(cur_df, text_col, n_merges, min_count)
        _release_ckpt(fin)
        table = [(a, b) for a, b, _ in merges]
        trained_docs = min(s, n_total)
        if prev is not None and table == prev:
            return {
                "merges": merges,
                "sample_docs": trained_docs,
                "converged": True,
                "agreed_with": prev_size,
                "covered_corpus": covered,
            }
        if covered:
            # full-corpus training is exact: doubling adds no rows, so a
            # second pass could only "agree" with itself — skip it
            return {
                "merges": merges,
                "sample_docs": trained_docs,
                "converged": True,
                "agreed_with": None,
                "covered_corpus": True,
            }
        prev, prev_size = table, trained_docs
        if s >= max_docs:
            return {
                "merges": merges,
                "sample_docs": trained_docs,
                "converged": False,
                "agreed_with": None,
                "covered_corpus": False,
            }
        s = min(2 * s, max_docs)
