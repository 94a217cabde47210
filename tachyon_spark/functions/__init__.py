from tachyon_spark.functions.dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_pairs,
)
from tachyon_spark.functions.similarity import brute_force_cosine_topk, lsh_cosine_topk
from tachyon_spark.functions.textstats import (
    doc_fingerprint,
    language_id,
    quality_score,
    text_stats,
)

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash64",
    "simhash_pairs",
    "brute_force_cosine_topk",
    "lsh_cosine_topk",
    "doc_fingerprint",
    "language_id",
    "quality_score",
    "text_stats",
]
