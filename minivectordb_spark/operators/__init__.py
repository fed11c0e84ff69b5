from minivectordb_spark.operators.dedup import (
    connected_components,
    dedup_survivors,
    embedding_neardup_pairs,
    exact_dedup,
    exact_dedup_groups,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    simhash_fingerprints,
    simhash_fingerprints64,
    simhash_pairs,
)
from minivectordb_spark.operators.prep import (
    chunk_documents,
    scrub_text,
    stratified_sample,
)
from minivectordb_spark.operators.text import (
    fingerprints,
    lang_id,
    quality_score,
    text_stats,
    token_count,
)
from minivectordb_spark.operators.ann import (
    default_projection_planes,
    ivf_assign,
    ivf_search,
    kmeans_centroids,
    mllib_lsh_neighbors,
    random_projection_buckets,
    seed_centroids,
)
from minivectordb_spark.operators.multimodal import (
    ASSET_SCHEMA,
    extract_features,
    sample_frames,
)
from minivectordb_spark.operators.partitioning import (
    repartition_for_write,
    salted_join,
    save_bucketed,
)
from minivectordb_spark.operators.util import materialize

__all__ = [
    "chunk_documents",
    "scrub_text",
    "stratified_sample",
    "connected_components",
    "dedup_survivors",
    "embedding_neardup_pairs",
    "exact_dedup",
    "exact_dedup_groups",
    "jaccard_pairs",
    "lsh_candidate_pairs",
    "minhash_dedup_pairs",
    "minhash_signatures",
    "simhash_fingerprints",
    "simhash_fingerprints64",
    "simhash_pairs",
    "fingerprints",
    "lang_id",
    "quality_score",
    "text_stats",
    "token_count",
    "default_projection_planes",
    "ivf_assign",
    "ivf_search",
    "kmeans_centroids",
    "mllib_lsh_neighbors",
    "random_projection_buckets",
    "seed_centroids",
    "ASSET_SCHEMA",
    "extract_features",
    "sample_frames",
    "repartition_for_write",
    "salted_join",
    "save_bucketed",
    "materialize",
]
