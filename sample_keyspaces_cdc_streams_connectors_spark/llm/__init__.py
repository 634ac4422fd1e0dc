"""LLM-training-data pipeline operators (north-star extensions).

The reference's only ML-adjacent path is Bedrock embedding generation
feeding S3 Vectors (S3VectorTargetMapper.java:87-177).  This package
generalizes that into the operations a 100 TB training-data pipeline
needs: embedding generation (pluggable, deterministic local default),
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding cosine) with connected-components cluster closure and
survivor selection, eval-set decontamination, similarity search
(exact, LSH-bucketed, IVF — in-memory and as a persisted
cell-partitioned index with incremental appends), config-driven
corpus curation (PII scrub / language / quality / decontaminate /
dedup), deterministic data mixing + sequence packing, and multimodal
column plumbing.
"""

from sample_keyspaces_cdc_streams_connectors_spark.llm.embedding import hash_embed
from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import (
    embedding_near_dup_pairs,
    release_ngram_cache,
    exact_duplicates,
    minhash_signatures,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
    with_minhash_signature,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import (
    append_to_ivf_index,
    ivf_index_topk,
    load_codebook,
    write_ivf_index,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.kmeans import (
    kmeans_assign,
    kmeans_fit,
    kmeans_inertia,
    kmeans_seed,
    kmeans_seed_parallel,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import (
    annotate_corpus,
    assign_split,
    build_corpus_pipeline,
    corpus_stats,
    deterministic_sample,
    mixture_weights_temperature,
    pack_chunks,
    pack_sequences,
    sample_corpus_mixture,
    shard_corpus,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.quant import (
    dequantize_col,
    quantize_embeddings,
    quantized_topk,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.bpe import (
    BpeModel,
    bpe_segment,
    bpe_token_count,
    train_bpe,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.ngram_lm import (
    NgramLm,
    lm_perplexity,
    score_lm,
    train_ngram_lm,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.decontaminate import (
    contamination_flags,
    decontaminate,
    eval_gram_hashes,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.components import (
    connected_components,
    dedup_survivors,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.semdedup import (
    append_to_semantic_index,
    semantic_dedup,
    semantic_dedup_against_index,
    semantic_dedup_annotate,
    write_semantic_index,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import (
    append_to_text_index,
    bm25_score_table,
    bm25_topk,
    bm25_topk_many,
    rrf_fuse,
    write_text_index,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.maintenance import (
    compact_text_index,
    rebalance_ivf_index,
    rebalance_semantic_index,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.langid import (
    LangIdModel,
    load_langid_model,
    save_langid_model,
    score_langid,
    train_langid,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import (
    ivf_index_topk_many,
    ivf_int8_topk,
    ivf_int8_topk_many,
    write_ivf_int8_index,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.similarity import (
    brute_force_topk,
    brute_force_topk_many,
    ivf_topk,
    lsh_bucket_topk,
)

__all__ = [
    "LangIdModel",
    "append_to_text_index",
    "compact_text_index",
    "rebalance_ivf_index",
    "rebalance_semantic_index",
    "ivf_int8_topk",
    "load_langid_model",
    "rrf_fuse",
    "save_langid_model",
    "score_langid",
    "train_langid",
    "write_ivf_int8_index",
    "BpeModel",
    "bpe_segment",
    "bpe_token_count",
    "train_bpe",
    "NgramLm",
    "lm_perplexity",
    "score_lm",
    "train_ngram_lm",
    "shard_corpus",
    "append_to_ivf_index",
    "contamination_flags",
    "decontaminate",
    "eval_gram_hashes",
    "connected_components",
    "dedup_survivors",
    "hash_embed",
    "embedding_near_dup_pairs",
    "release_ngram_cache",
    "exact_duplicates",
    "minhash_signatures",
    "minhash_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "with_minhash_signature",
    "ivf_index_topk",
    "load_codebook",
    "write_ivf_index",
    "kmeans_assign",
    "kmeans_fit",
    "kmeans_inertia",
    "kmeans_seed",
    "kmeans_seed_parallel",
    "annotate_corpus",
    "assign_split",
    "build_corpus_pipeline",
    "corpus_stats",
    "deterministic_sample",
    "mixture_weights_temperature",
    "pack_chunks",
    "pack_sequences",
    "sample_corpus_mixture",
    "brute_force_topk",
    "brute_force_topk_many",
    "ivf_index_topk_many",
    "ivf_int8_topk_many",
    "dequantize_col",
    "quantize_embeddings",
    "quantized_topk",
    "ivf_topk",
    "lsh_bucket_topk",
    "append_to_semantic_index",
    "bm25_score_table",
    "bm25_topk",
    "bm25_topk_many",
    "semantic_dedup",
    "semantic_dedup_against_index",
    "semantic_dedup_annotate",
    "write_semantic_index",
    "write_text_index",
]
