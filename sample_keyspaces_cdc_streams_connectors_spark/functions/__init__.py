from sample_keyspaces_cdc_streams_connectors_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    lang_id_multi,
    normalize_text,
    quality_score,
    token_count,
    tokens,
)
from sample_keyspaces_cdc_streams_connectors_spark.functions.bloom import (
    BloomFilter,
    build_bloom,
    load_bloom,
    might_contain,
    optimal_params,
    save_bloom,
)
from sample_keyspaces_cdc_streams_connectors_spark.functions.pii import (
    pii_counts,
    scrub_pii,
    with_pii_scrubbed,
)
from sample_keyspaces_cdc_streams_connectors_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "BloomFilter",
    "build_bloom",
    "load_bloom",
    "might_contain",
    "optimal_params",
    "save_bloom",
    "pii_counts",
    "scrub_pii",
    "with_pii_scrubbed",
    "tokens",
    "token_count",
    "normalize_text",
    "lang_id",
    "lang_id_multi",
    "quality_score",
    "doc_fingerprint",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
