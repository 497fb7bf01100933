from .dedup import (
    connected_components,
    dedup_cluster_keepers,
    exact_dedup,
    jaccard_all_pairs,
    last_writer_wins,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    release_cached,
    simhash,
    simhash_near_duplicates,
)
from .similarity import (
    brute_force_topk,
    cosine_scores,
    ivf_assign,
    ivf_centroids,
    ivf_topk,
    lsh_bucketed_topk,
    lsh_near_dup_pairs,
)
from .corpus import passage_chunks, passage_dedup, shingle_novelty
from .packing import pack_sequences, token_offsets
from .skew import salted_aggregate
from .text import (
    language_id,
    quality_score,
    token_count,
    fingerprint,
)

__all__ = [
    "connected_components",
    "dedup_cluster_keepers",
    "exact_dedup",
    "jaccard_all_pairs",
    "last_writer_wins",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "release_cached",
    "simhash",
    "simhash_near_duplicates",
    "brute_force_topk",
    "cosine_scores",
    "ivf_assign",
    "ivf_centroids",
    "ivf_topk",
    "lsh_bucketed_topk",
    "lsh_near_dup_pairs",
    "passage_chunks",
    "passage_dedup",
    "shingle_novelty",
    "pack_sequences",
    "token_offsets",
    "salted_aggregate",
    "language_id",
    "quality_score",
    "token_count",
    "fingerprint",
]
