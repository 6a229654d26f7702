"""Large-scale training-data pipeline operators (beyond the reference's surface).

Deduplication, similarity search, text analysis, and multimodal-column
plumbing — the operators a 100 TB LLM data pipeline needs, built on the
same DataFrame-first principles as the featurization engine.
"""

from caspr_spark.llm.text import (
    add_token_counts, add_quality_signals, add_language_id, add_fingerprint,
    chunk_documents,
)
from caspr_spark.llm.lm import (
    fit_bigram_model, score_perplexity, perplexity_buckets,
)
from caspr_spark.llm.dedup import (
    exact_dedup, minhash_signatures, minhash_lsh_dedup, simhash, ngram_jaccard_pairs,
)
from caspr_spark.llm.similarity import (
    cosine_topk, cosine_topk_lsh, add_lsh_bucket, add_lsh_buckets,
    embedding_near_duplicates, lsh_plan, quantize_embeddings,
    dequantize_embeddings,
)
from caspr_spark.llm.multimodal import (
    attach_binary_payload, extract_features, sample_frames,
)
from caspr_spark.llm.curate import (
    curate_corpus, curation_report, curate_corpus_v2,
)
from caspr_spark.llm.filtering import (
    repetition_signals, redact_pii, ngram_hashes, decontaminate,
    decontaminate_from_census,
    quality_score_hashed_bow,
)
from caspr_spark.llm.clean import (
    split_units, paragraph_dedup, remove_boilerplate,
)
from caspr_spark.llm.dedup import (
    connected_components, dedup_by_components, dedup_keep_best,
    winnow_fingerprints, winnow_pairs,
)
from caspr_spark.llm.search import (
    bm25_topk, rrf_fuse, tfidf_weights, related_documents,
)
from caspr_spark.llm.mixture import (
    mixture_sample, pack_sequences_offset, pack_sequences_nextfit,
    cluster_balanced_sample,
)

__all__ = [
    "add_token_counts", "add_quality_signals", "add_language_id", "add_fingerprint",
    "exact_dedup", "minhash_signatures", "minhash_lsh_dedup", "simhash",
    "ngram_jaccard_pairs",
    "cosine_topk", "cosine_topk_lsh", "add_lsh_bucket", "add_lsh_buckets",
    "embedding_near_duplicates", "lsh_plan", "quantize_embeddings",
    "dequantize_embeddings",
    "attach_binary_payload", "extract_features", "sample_frames",
    "curate_corpus", "curation_report", "curate_corpus_v2",
    "repetition_signals", "redact_pii", "ngram_hashes", "decontaminate",
    "decontaminate_from_census",
    "quality_score_hashed_bow",
    "split_units", "paragraph_dedup", "remove_boilerplate",
    "connected_components", "dedup_by_components", "dedup_keep_best",
    "winnow_fingerprints", "winnow_pairs",
    "bm25_topk", "rrf_fuse", "tfidf_weights", "related_documents",
    "mixture_sample", "pack_sequences_offset", "pack_sequences_nextfit",
    "cluster_balanced_sample",
    "chunk_documents", "fit_bigram_model", "score_perplexity",
    "perplexity_buckets",
]
