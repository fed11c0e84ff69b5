"""minivectordb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of cnmoro/MiniVectorDB (reference read-only at
/root/reference), re-expressed Spark-first.

The reference is a single-process, in-memory, exact-kNN vector store with a
Mongo-like metadata filter DSL, hybrid reranking, autocut truncation and
pickle persistence (see SURVEY.md).  This package keeps the *semantics* and
replaces the execution model with DataFrame/Catalyst plans over Parquet:

- ``filters``   : Mongo-dict DSL -> Catalyst ``Column`` compiler
                  (reference: minivectordb/vector_database.py:157-386)
- ``scoring``   : exact cosine top-k as filter -> score -> TakeOrderedAndProject
                  (reference: minivectordb/vector_database.py:466-536)
- ``autocut``   : relative-drop truncation (vector_database.py:443-464)
- ``rerank``    : hybrid dense+hash+fuzzy rerank (vector_database.py:388-441)
- ``embedder``  : pluggable embedding extraction with a deterministic
                  test double (minivectordb/embedding_model.py)
- ``table``     : VectorTable — ingest/delete/lookup/persist surface
                  (vector_database.py:49-155, 538-548)
- ``operators`` : scale-out extensions (dedup, similarity search, text
                  analysis, ANN, multimodal plumbing)
"""

from minivectordb_spark.session import get_spark
from minivectordb_spark.filters import (
    compile_filters,
    ColumnResolver,
    CompositeResolver,
    JsonResolver,
    TypedMapResolver,
)
from minivectordb_spark.scoring import (
    CosineMatmulScorer,
    Int8MatmulScorer,
    cosine_sim,
    cosine_sim_cols,
    knn,
    knn_batch,
)
from minivectordb_spark.autocut import autocut_df, autocut_scores, autocut_distances
from minivectordb_spark.rerank import hybrid_rerank_results, rerank_df
from minivectordb_spark.embedder import HashProjectionEmbedder, embed_column, get_embedder
from minivectordb_spark.table import VectorTable
from minivectordb_spark.durable import DurableVectorTable

__all__ = [
    "get_spark",
    "compile_filters",
    "ColumnResolver",
    "CompositeResolver",
    "JsonResolver",
    "TypedMapResolver",
    "cosine_sim",
    "cosine_sim_cols",
    "knn",
    "knn_batch",
    "CosineMatmulScorer",
    "Int8MatmulScorer",
    "autocut_df",
    "autocut_scores",
    "autocut_distances",
    "hybrid_rerank_results",
    "rerank_df",
    "HashProjectionEmbedder",
    "embed_column",
    "get_embedder",
    "VectorTable",
    "DurableVectorTable",
]

__version__ = "0.2.0"
