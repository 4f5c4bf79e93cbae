"""LLM-data-pipeline function library: text analysis, deduplication,
similarity search, multimodal column plumbing.

These go beyond the reference's own operator surface (BASELINE.json
north_star): the operations a large-scale training-data pipeline needs,
built as column expressions / DataFrame compositions so they run JVM-side
and scale like any other operator.
"""

from database_stream_processor_spark.functions import dedup, scalar, similarity, text
from database_stream_processor_spark.functions.scalar import (
    haversine_km,
    register_sql_macros,
    split_index,
    st_distance,
    st_point,
)
from database_stream_processor_spark.functions.dedup import (
    exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from database_stream_processor_spark.functions.similarity import (
    cosine_topk,
    lsh_bucketed_topk,
)
from database_stream_processor_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
)

__all__ = [
    "cosine_topk",
    "haversine_km",
    "register_sql_macros",
    "scalar",
    "split_index",
    "st_distance",
    "st_point",
    "dedup",
    "doc_fingerprint",
    "exact_dedup",
    "language_id",
    "lsh_bucketed_topk",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "quality_score",
    "simhash",
    "similarity",
    "text",
    "token_count",
]
