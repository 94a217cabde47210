from tachyon_spark.functions.dedup import (
    dedup_clusters,
    dedup_keep_best,
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_pairs,
)
from tachyon_spark.functions.similarity import (
    brute_force_cosine_topk,
    ivf_cosine_topk,
    lsh_cosine_topk,
    train_ivf_centroids,
)
from tachyon_spark.functions.multimodal import (
    extract_features,
    media_from_documents,
    resize_images,
    sample_frames,
)
from tachyon_spark.functions.textstats import (
    bpe_tokens,
    doc_fingerprint,
    language_id,
    quality_score,
    repetition_score,
    text_stats,
    unigram_logprob,
)
from tachyon_spark.functions.histogram import bucket_quantile
from tachyon_spark.functions.pii import pii_density, scrub_pii
from tachyon_spark.functions.sampling import (
    chunk_documents,
    hash_split,
    pack_sequences,
    stratified_sample,
)
from tachyon_spark.functions.util import spread
from tachyon_spark.functions.codecs import (
    png_decode,
    png_encode,
    wav_decode,
    wav_encode,
)

__all__ = [
    "exact_dedup",
    "dedup_clusters",
    "dedup_keep_best",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash64",
    "simhash_pairs",
    "brute_force_cosine_topk",
    "lsh_cosine_topk",
    "ivf_cosine_topk",
    "train_ivf_centroids",
    "doc_fingerprint",
    "bpe_tokens",
    "extract_features",
    "media_from_documents",
    "resize_images",
    "sample_frames",
    "language_id",
    "quality_score",
    "repetition_score",
    "text_stats",
    "unigram_logprob",
    "bucket_quantile",
    "hash_split",
    "stratified_sample",
    "pack_sequences",
    "chunk_documents",
    "scrub_pii",
    "pii_density",
    "spread",
    "png_decode",
    "png_encode",
    "wav_decode",
    "wav_encode",
]
