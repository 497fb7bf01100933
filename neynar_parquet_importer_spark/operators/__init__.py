from .dedup import (
    exact_dedup,
    last_writer_wins,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_duplicates,
)
from .similarity import brute_force_topk, cosine_scores, lsh_bucketed_topk
from .text import (
    language_id,
    quality_score,
    token_count,
    fingerprint,
)

__all__ = [
    "exact_dedup",
    "last_writer_wins",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_duplicates",
    "brute_force_topk",
    "cosine_scores",
    "lsh_bucketed_topk",
    "language_id",
    "quality_score",
    "token_count",
    "fingerprint",
]
