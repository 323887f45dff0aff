"""Training-data pipeline operations (beyond the reference's scope).

Deduplication, similarity search, text analysis, multimodal plumbing —
the ops a 100 TB training-data pipeline needs, expressed Spark-first:
built-in column functions and one-shuffle LSH joins; Arrow-batched pandas
UDFs only where bit-twiddling (SimHash) genuinely needs them.
"""

from .bpe import bpe_encode, bpe_encode_word, train_bpe_merges
from .curation import (clean_lines, cluster_safe_split,
                       dedup_lines_across_corpus,
                       strip_data_uris, url_stats, domain_counts,
                       contamination_overlap, hash_split,
                       sample_k_per_group,
                       normalize_text,
                       pack_sequences, redact_text, stratified_sample,
                       temperature_mix, weighted_mix)
from .dedup import (exact_duplicates, exact_digest_index,
                    edit_distance_pairs,
                    hamming_duplicate_pairs,
                    exact_dedup_against, update_digest_index,
                    minhash_signatures,
                    lsh_duplicate_pairs, lsh_pairs_against,
                    ngram_jaccard_pairs,
                    simhash_signatures, embedding_duplicate_pairs,
                    near_dup_clusters, deduplicate_by_clusters,
                    deduplicate_by_clusters_best,
                    dedup_chunks, portable_hash64,
                    repo_overlap_pairs, repo_overlap_pairs_minhash)
from .similarity import (brute_force_topk, cosine_topk_for_query,
                         deterministic_kmeans, hyperplane_lsh_topk,
                         ivf_topk, normalize_embeddings,
                         semantic_dedup, train_ivf_centroids)
from .codescan import (SECRET_PATTERNS, code_shape_stats, extract_imports,
                       import_edges, code_profile, comment_stats, detect_code_lang,
                       extract_imports_by_lang, normalize_code,
                       path_flags,
                       extract_symbols,
                       high_entropy_tokens,
                       module_document_frequency,
                       repo_license_rollup, scan_licenses, scan_secrets)
from .multimodal import image_duplicate_pairs, image_phash
from .mp4 import mp4_sample_index, scan_mp4_samples
from .probe import probe_media, probe_metadata
from .eventlog import cohort_retention, funnel
from .timeseries import (asof_join, epoch_micros, merge_intervals,
                         range_join, resample, rolling_agg, sessionize,
                         staleness)
from .textstats import (bigram_counts, bigram_lm_scores,
                        bm25_topk, encode_tokens, language_id,
                        quality_filter,
                        quality_scores,
                        repetition_stats, token_counts, unigram_logprob,
                        vocabulary, winnow_fingerprints)

__all__ = [
    "exact_duplicates", "exact_digest_index", "exact_dedup_against",
    "update_digest_index",
    "minhash_signatures", "lsh_duplicate_pairs",
    "lsh_pairs_against",
    "ngram_jaccard_pairs", "simhash_signatures", "embedding_duplicate_pairs",
    "hamming_duplicate_pairs", "image_phash", "image_duplicate_pairs",
    "edit_distance_pairs",
    "near_dup_clusters", "deduplicate_by_clusters",
    "deduplicate_by_clusters_best",
    "brute_force_topk", "cosine_topk_for_query", "hyperplane_lsh_topk",
    "normalize_embeddings", "deterministic_kmeans", "train_ivf_centroids",
    "ivf_topk",
    "language_id", "quality_scores", "token_counts", "winnow_fingerprints",
    "mp4_sample_index", "scan_mp4_samples",
    "portable_hash64", "probe_media", "probe_metadata",
    "contamination_overlap", "hash_split", "stratified_sample",
    "weighted_mix", "redact_text", "pack_sequences", "dedup_chunks",
    "semantic_dedup", "repetition_stats", "quality_filter",
    "vocabulary", "unigram_logprob", "bm25_topk", "clean_lines",
    "dedup_lines_across_corpus", "bigram_counts", "bigram_lm_scores",
    "bpe_encode", "bpe_encode_word", "train_bpe_merges",
    "temperature_mix",
    "encode_tokens", "normalize_text", "strip_data_uris",
    "url_stats", "domain_counts",
    "sample_k_per_group",
    "cluster_safe_split", "repo_overlap_pairs",
    "repo_overlap_pairs_minhash",
    "sessionize", "asof_join", "range_join", "resample", "epoch_micros",
    "merge_intervals", "rolling_agg", "staleness",
    "cohort_retention", "funnel",
    "SECRET_PATTERNS", "scan_secrets", "code_shape_stats",
    "extract_imports", "import_edges", "module_document_frequency",
    "scan_licenses", "extract_symbols", "repo_license_rollup",
    "extract_imports_by_lang", "high_entropy_tokens",
    "detect_code_lang", "normalize_code", "path_flags",
    "comment_stats", "code_profile",
]
