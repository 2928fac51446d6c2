"""LLM training-data pipeline operators — the beyond-reference surface.

Import pattern: ``from quality_spark.llm import exact_dedup,
contamination_flags, …`` — every operator also remains importable from
its own module (dedup / similarity / textstats / repetition / pii /
urls / decontam / vocab / packing / sampling / pipeline / multimodal).

Exports are LAZY (PEP 562): importing one operator does not pull the
other eleven modules (multimodal alone imports numpy+pandas at module
scope), so `from quality_spark.llm.dedup import exact_dedup`-style
imports — and bench-timed query construction — pay only for what they
use.
"""

from __future__ import annotations

from importlib import import_module

_EXPORTS = {
    # dedup
    "bucket_candidate_pairs": "dedup",
    "connected_components": "dedup",
    "exact_dedup": "dedup",
    "exact_dedup_keep_best": "dedup",
    "exact_dup_groups": "dedup",
    "minhash_dedup_against_index": "dedup",
    "minhash_lsh_pairs": "dedup",
    "write_minhash_index": "dedup",
    "ngram_jaccard_pairs": "dedup",
    "simhash_pairs": "dedup",
    "with_minhash": "dedup",
    "with_shingles": "dedup",
    "with_simhash": "dedup",
    # decontam
    "contamination_flags": "decontam",
    # multimodal
    "as_media_column": "multimodal",
    "decode_bmp": "multimodal",
    "decode_ppm": "multimodal",
    "encode_bmp": "multimodal",
    "encode_ppm": "multimodal",
    "extract_media_features": "multimodal",
    "resize_media": "multimodal",
    "sample_frames": "multimodal",
    # packing
    "chunk_documents": "packing",
    "pack_sequences": "packing",
    # pii
    "redact_pii": "pii",
    "with_pii_stats": "pii",
    # pipeline
    "corpus_report": "pipeline",
    "filter_documents": "pipeline",
    "filter_summary": "pipeline",
    "kept_documents": "pipeline",
    # retrieval
    "append_bm25_index": "retrieval",
    "bm25_scores": "retrieval",
    "bm25_scores_indexed": "retrieval",
    "bm25_topk": "retrieval",
    "bm25_topk_indexed": "retrieval",
    "retrieve": "retrieval",
    "write_bm25_index": "retrieval",
    # repetition
    "top_ngram_coverage": "repetition",
    "with_repetition_stats": "repetition",
    # sampling
    "cap_per_group": "sampling",
    "cluster_balanced_sample": "sampling",
    "hash_sample": "sampling",
    "keep_top_fraction": "sampling",
    "stratified_hash_sample": "sampling",
    "token_budget_sample": "sampling",
    "weighted_mix": "sampling",
    "weighted_sample": "sampling",
    # similarity
    "cosine_topk": "similarity",
    "embedding_near_dup_pairs": "similarity",
    "ivf_assign": "similarity",
    "ivf_flat_topk": "similarity",
    "kmeans_centroids": "similarity",
    "lsh_bucket_topk": "similarity",
    "with_lsh_bucket": "similarity",
    "with_norm": "similarity",
    # textstats
    "with_fingerprint": "textstats",
    "with_lang_id": "textstats",
    "with_text_stats": "textstats",
    "with_token_estimate": "textstats",
    # urls
    "domain_histogram": "urls",
    "flag_blocked_domains": "urls",
    "with_url_stats": "urls",
    # vocab
    "collocation_pmi": "vocab",
    "tfidf_scores": "vocab",
    "tfidf_top_terms": "vocab",
    "vocab_counts": "vocab",
    "vocab_doc_frequency": "vocab",
    "vocab_topk": "vocab",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    value = getattr(import_module(f".{mod}", __name__), name)
    globals()[name] = value  # cache for subsequent lookups
    return value


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
