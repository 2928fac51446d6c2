"""LLM training-data pipeline operators — the beyond-reference surface.

Import pattern: ``from quality_spark.llm import exact_dedup,
contamination_flags, …`` — every operator also remains importable from
its own module (dedup / similarity / textstats / repetition / pii /
urls / decontam / vocab / packing / sampling / pipeline / multimodal).
"""

from .dedup import (
    connected_components,
    exact_dedup,
    exact_dedup_keep_best,
    exact_dup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    with_minhash,
    with_shingles,
    with_simhash,
)
from .decontam import contamination_flags
from .multimodal import (
    as_media_column,
    extract_media_features,
    resize_media,
    sample_frames,
)
from .packing import chunk_documents, pack_sequences
from .pii import redact_pii, with_pii_stats
from .pipeline import filter_documents, filter_summary, kept_documents
from .repetition import top_ngram_coverage, with_repetition_stats
from .sampling import (
    hash_sample,
    stratified_hash_sample,
    weighted_mix,
)
from .similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_assign,
    ivf_flat_topk,
    kmeans_centroids,
    lsh_bucket_topk,
    with_lsh_bucket,
    with_norm,
)
from .textstats import (
    with_fingerprint,
    with_lang_id,
    with_text_stats,
    with_token_estimate,
)
from .urls import domain_histogram, flag_blocked_domains, with_url_stats
from .vocab import (
    tfidf_scores,
    tfidf_top_terms,
    vocab_counts,
    vocab_doc_frequency,
    vocab_topk,
)

__all__ = [n for n in dir() if not n.startswith("_")]
