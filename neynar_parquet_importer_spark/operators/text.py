"""Text-analysis operators for training-data pipelines.

All four are pure Column expressions (JVM, whole-stage codegen) so they
run at scan speed and never leave the executor: language-ID (stopword
n-gram heuristic), quality scoring (length/alpha/punct/stopword ratios),
token counting (whitespace + BPE-ish regex), and document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword panels for the ratio heuristic
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "et", "les", "des", "en", "un", "du", "que", "pour"],
}


def _tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column | str, mode: str = "whitespace") -> Column:
    """Token count. ``whitespace`` splits on runs of spaces; ``bpe`` uses a
    GPT-style pre-tokenizer regex (word pieces, numbers, punctuation runs)
    as a cheap proxy for BPE token counts."""
    c = F.col(text) if isinstance(text, str) else text
    if mode == "whitespace":
        return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
            F.size(_tokens(c))
        )
    if mode == "bpe":
        pieces = F.regexp_extract_all(
            c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"), 0
        )
        return F.size(pieces)
    raise ValueError(f"unknown token_count mode: {mode}")


def _stopword_hits(text: Column, lang: str) -> Column:
    pattern = r"\b(" + "|".join(_STOPWORDS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pattern), 0))


def language_id(text: Column | str) -> Column:
    """Pick the language whose stopword panel has the most hits (ties break
    by panel order); 'und' when nothing matches. A classic n-gram/stopword
    heuristic — deterministic and fully JVM-side."""
    c = F.col(text) if isinstance(text, str) else text
    hits = [(lang, _stopword_hits(c, lang)) for lang in _STOPWORDS]
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    # forward iteration + strict > means the earliest panel wins ties
    for lang, h in hits:
        better = h > best_hits
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(better, h).otherwise(best_hits)
    return best_lang


def quality_score(text: Column | str) -> Column:
    """Composite quality score in [0,1]: mean of
    - length score: min(1, n_tokens/20)
    - alpha ratio: alphabetic chars / non-space chars
    - non-punct ratio: 1 - punctuation chars / non-space chars
    - stopword signal: min(1, 5 * english stopword hits / n_tokens)
    """
    c = F.col(text) if isinstance(text, str) else text
    n_tokens = token_count(c).cast("double")
    nonspace = F.length(F.regexp_replace(c, r"\s", "")).cast("double")
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
    punct = F.length(
        F.regexp_replace(c, r"[^!-/:-@\[-`{-~]", "")
    ).cast("double")
    sw = _stopword_hits(c, "en").cast("double")

    safe_nonspace = F.when(nonspace > 0, nonspace).otherwise(F.lit(1.0))
    safe_tokens = F.when(n_tokens > 0, n_tokens).otherwise(F.lit(1.0))
    length_score = F.least(F.lit(1.0), n_tokens / 20.0)
    alpha_ratio = alpha / safe_nonspace
    non_punct = F.lit(1.0) - punct / safe_nonspace
    sw_signal = F.least(F.lit(1.0), F.lit(5.0) * sw / safe_tokens)
    return F.round((length_score + alpha_ratio + non_punct + sw_signal) / 4.0, 6)


def repetition_score(text: Column | str) -> Column:
    """Repetitiveness in [0,1]: 1 - distinct_tokens/tokens (0 for empty
    docs). High values flag boilerplate/spam — the cheap stand-in for
    compression-ratio quality filters, fully JVM-side."""
    c = F.col(text) if isinstance(text, str) else text
    toks = _tokens(c)
    score = F.lit(1.0) - F.size(F.array_distinct(toks)) / F.size(toks).cast("double")
    return F.round(
        F.when(F.length(F.trim(c)) == 0, F.lit(0.0)).otherwise(score), 6
    )


# PII patterns kept deliberately simple and RE2-compatible (portable to
# DuckDB/Trino): production panels would be larger, the plumbing identical
_PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-category PII match counts (email, ipv4) — codegen'd regex."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        for name, pat in _PII_PATTERNS.items()
    }


def redact_pii(text: Column | str) -> Column:
    """Replace every PII match with a typed placeholder (<EMAIL>, <IPV4>).
    The redaction step every public-web corpus runs before training; one
    chained regexp_replace, scan-speed, no shuffle."""
    c = F.col(text) if isinstance(text, str) else text
    for name, pat in _PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"<{name.upper()}>")
    return c


def fingerprint(text: Column | str, normalize: bool = True) -> Column:
    """Content fingerprint: md5 over whitespace-normalized lowercase text.
    (The rolling-hash variant for shingle fingerprints lives in
    operators.dedup.minhash_signatures.)"""
    c = F.col(text) if isinstance(text, str) else text
    if normalize:
        c = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    return F.md5(c)
