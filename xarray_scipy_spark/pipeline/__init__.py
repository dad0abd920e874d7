"""LLM-training-data pipeline operators over Spark DataFrames.

The reference library (/root/reference/xarray_scipy) has no analog —
this package is the engine's north-star extension scope: the
operations a large-scale training-data pipeline needs, built
Spark-first so every plan is a bucketed join / single shuffle, never
an all-pairs comparison:

- :mod:`~xarray_scipy_spark.pipeline.dedup` — exact, MinHash+LSH,
  SimHash, n-gram Jaccard, embedding-cosine near-duplicate detection;
- :mod:`~xarray_scipy_spark.pipeline.similarity` — brute-force and
  IVF-bucketed cosine top-k search over embedding columns;
- :mod:`~xarray_scipy_spark.pipeline.text` — language ID, quality
  scoring, token counting, document fingerprinting;
- :mod:`~xarray_scipy_spark.pipeline.multimodal` — opaque binary
  columns with typed metadata and Arrow-batched decode plumbing.

Every op is expressed with JVM-side builtins (split / transform /
aggregate / md5 / conv) so the hot path stays inside whole-stage
codegen; Python appears only in the multimodal decode UDF, which is
Arrow-batched by design.
"""

from .dedup import (
    edit_distance_pairs,
    apply_cdc,
    latest_by_key,
    exact_duplicates,
    minhash_signatures,
    minhash_pairs,
    minhash_pairs_cross,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_pairs,
    embedding_dup_pairs,
    duplicate_clusters,
    duplicated_ngram_spans,
)
from .similarity import (
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_lsh,
    kmeans_cells,
    quantize_embeddings,
    embedding_moments,
    pca_from_moments,
    pca_project,
    fit_pca,
    embedding_pca,
    label_outliers,
)
from .text import (
    postings,
    bm25_scores,
    sparse_knn,
    naive_bayes_lang,
    token_label_mi,
    canonical_url,
    winsorize_by_group,
    clean_text,
    char_entropy,
    ngram_counts,
    decontaminate,
    hashed_tfidf_vectors,
    fingerprint,
    lang_id,
    quality_score,
    redact,
    url_stats,
    chunk_documents,
    bigram_logprob,
    repetition_stats,
    tfidf_top_tokens,
    token_stats,
    unigram_logprob,
    vocabulary,
)
from .bpe import apply_bpe, train_bpe, word_counts, segment_words, encode_with_merges
from .curate import curation_report
from .features import target_encoding, event_transitions, auc_exact
from .quality import (
    constraint_check,
    data_profile,
    frequent_values,
    windowed_constraints,
)
from .linear import fit_logistic, fit_ridge, grouped_ols, predict_linear
from .pack import pack_documents
from .sketches import (
    bloom_bits,
    bloom_decontaminate,
    countmin_lookup,
    countmin_sketch,
    filter_by_quantile,
    histogram_sketch,
    hll_distinct,
    hll_estimate,
    hll_state,
    hll_registers,
    hll_merge,
    quantile_from_histogram,
)
from .sample import (
    sample_negatives,
    group_quantiles,
    quantile_normalize,
    kfold_assign,
    class_weights,
    cap_per_group,
    hash_uniform,
    robust_zscore,
    mix_datasets,
    pack_sequences,
    weighted_sample,
    temperature_mix,
    split_assign,
    stratified_sample,
)
from .multimodal import (
    audio_decoder,
    decode_features,
    decode_jpeg,
    decode_text,
    encode_jpeg,
    gzip_text_decoder,
    gzip_text_encoder,
    decode_bmp,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_gif,
    decode_gif,
    frame_sample,
    image_decoder,
    resize_payload,
    with_binary,
)
from .webp import (
    decode_webp,
    encode_webp_lossless,
)
from .graph import pagerank, triangle_count

__all__ = [
    "data_profile",
    "constraint_check",
    "frequent_values",
    "windowed_constraints",
    "canonical_url",
    "winsorize_by_group",
    "clean_text",
    "char_entropy",
    "ngram_counts",
    "exact_duplicates",
    "latest_by_key",
    "minhash_signatures",
    "minhash_pairs",
    "duplicate_clusters",
    "duplicated_ngram_spans",
    "tfidf_top_tokens",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "simhash_pairs",
    "embedding_dup_pairs",
    "cosine_topk",
    "quantize_embeddings",
    "embedding_moments",
    "pca_from_moments",
    "pca_project",
    "fit_pca",
    "embedding_pca",
    "label_outliers",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    "kmeans_cells",
    "token_stats",
    "quality_score",
    "lang_id",
    "fingerprint",
    "decontaminate",
    "redact",
    "url_stats",
    "chunk_documents",
    "bigram_logprob",
    "repetition_stats",
    "vocabulary",
    "unigram_logprob",
    "decode_text",
    "decode_jpeg",
    "encode_jpeg",
    "gzip_text_decoder",
    "gzip_text_encoder",
    "with_binary",
    "decode_features",
    "decode_ppm",
    "decode_wav",
    "image_decoder",
    "decode_png",
    "encode_png",
    "encode_gif",
    "decode_gif",
    "decode_bmp",
    "encode_bmp",
    "decode_webp",
    "encode_webp_lossless",
    "pagerank",
    "audio_decoder",
    "frame_sample",
    "resize_payload",
    "curation_report",
    "hash_uniform",
    "mix_datasets",
    "sample_negatives",
    "group_quantiles",
    "quantile_normalize",
    "kfold_assign",
    "class_weights",
    "split_assign",
    "stratified_sample",
    "pack_sequences",
    "pack_documents",
    "grouped_ols",
    "triangle_count",
    "postings",
    "bm25_scores",
    "sparse_knn",
    "naive_bayes_lang",
    "token_label_mi",
    "target_encoding",
    "event_transitions",
    "auc_exact",
    "edit_distance_pairs",
    "apply_cdc",
    "weighted_sample",
    "temperature_mix",
]
