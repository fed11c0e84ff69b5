"""Pluggable embedding extraction (reference:
minivectordb/embedding_model.py — ONNX-quantized USE-multilingual default,
e5-small/large and bge-m3 alternatives, E:11-35).

The reference's ONNX weights are declared package data but absent from the
checkout (.MISSING_LARGE_BLOBS), so per SURVEY.md §2.5 the embedder here is
an interface with a deterministic test double as the default.  Real model
backends are registered behind import-guards and raise a clear error when
their runtime dependency is missing (onnxruntime / torch are not in this
environment).

Spark integration: ``embed_column`` runs the embedder as an Arrow-batched
pandas UDF — the model is instantiated once per executor process (module
global cache), the per-row Python cost is one dict lookup + numpy ops over
the whole batch.  This is the predict_batch_udf pattern
(embedding_model.py:37-48's session-per-process, made executor-local).
"""

from __future__ import annotations

import math
import zlib
from typing import Iterable, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType


class Embedder:
    """Interface: dim + batch text -> (n, dim) float32."""

    dim: int

    def embed_batch(self, texts: Sequence[str]) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError

    def embed(self, text: str) -> np.ndarray:
        return self.embed_batch([text])[0]


class HashProjectionEmbedder(Embedder):
    """Deterministic test-double embedder (SURVEY.md §2.5, §7 Phase 0.3).

    Each token maps to a fixed pseudo-random unit-ish vector seeded by
    crc32(token) ^ seed; a text embeds to the L2-normalized token-vector
    sum.  Properties that make it a faithful stand-in for semantic tests:
    deterministic across processes, shared tokens => higher cosine, and
    bag-of-words compositionality (texts with overlapping vocabulary rank
    closer, matching the reference's ranking-style assertions,
    tests/test_vector_database.py:195-218).
    """

    def __init__(self, dim: int = 64, seed: int = 42):
        self.dim = dim
        self.seed = seed
        self._cache: dict[str, np.ndarray] = {}

    def _token_vec(self, token: str) -> np.ndarray:
        v = self._cache.get(token)
        if v is None:
            rng = np.random.default_rng((zlib.crc32(token.encode("utf-8")) ^ self.seed) & 0xFFFFFFFF)
            v = rng.standard_normal(self.dim).astype(np.float32)
            self._cache[token] = v
        return v

    def embed_batch(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, text in enumerate(texts):
            tokens = (text or "").lower().split()
            if not tokens:
                continue
            acc = np.zeros(self.dim, dtype=np.float32)
            for t in tokens:
                acc += self._token_vec(t)
            n = float(np.linalg.norm(acc))
            out[i] = acc / n if n > 0 else acc
        return out


class OnnxEmbedder(Embedder):
    """ONNX-quantized USE-multilingual backend (embedding_model.py:37-48,
    :81-82; 512-dim).  Requires onnxruntime + onnxruntime_extensions and the
    model file — not available in this environment."""

    dim = 512

    def __init__(self, model_path: str | None = None, cpu_cores: int | None = None):
        try:
            import onnxruntime  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "OnnxEmbedder requires onnxruntime (+ onnxruntime_extensions); "
                "not installed in this environment. Use HashProjectionEmbedder."
            ) from e
        raise NotImplementedError("ONNX model weights not bundled; supply model_path on a host with onnxruntime.")


class E5Embedder(Embedder):
    """intfloat/multilingual-e5 backend (embedding_model.py:55-71): 'passage '
    prefix, 512-token truncation, attention-masked mean-pool, L2 normalize.
    384-dim (small) / 1024-dim (large).  Requires torch + transformers."""

    def __init__(self, size: str = "small"):
        self.dim = 384 if size == "small" else 1024
        try:
            import torch  # noqa: F401
            import transformers  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "E5Embedder requires torch + transformers; not installed. "
                "Use HashProjectionEmbedder."
            ) from e


class BGEM3Embedder(Embedder):
    """BAAI/bge-m3 backend (embedding_model.py:73-79), 1024-dim."""

    dim = 1024

    def __init__(self):
        try:
            import FlagEmbedding  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "BGEM3Embedder requires FlagEmbedding; not installed. "
                "Use HashProjectionEmbedder."
            ) from e


_MODELS = {
    "hash64": lambda: HashProjectionEmbedder(dim=64),
    "hash512": lambda: HashProjectionEmbedder(dim=512),
    "onnx_use_multilingual": OnnxEmbedder,
    "e5_small": lambda: E5Embedder("small"),
    "e5_large": lambda: E5Embedder("large"),
    "bge_m3": BGEM3Embedder,
}

_EXECUTOR_CACHE: dict[str, Embedder] = {}


def get_embedder(name: str = "hash64") -> Embedder:
    """Model registry (embedding_model.py:16-35's dispatch, by name)."""
    if name not in _MODELS:
        raise ValueError(f"Unknown embedder: {name!r}; available: {sorted(_MODELS)}")
    if name not in _EXECUTOR_CACHE:
        _EXECUTOR_CACHE[name] = _MODELS[name]()
    return _EXECUTOR_CACHE[name]


def embed_column(df: DataFrame, text_col: str, out_col: str = "embedding", model: str = "hash64") -> DataFrame:
    """Attach an embedding column via an Arrow-batched pandas UDF.

    The embedder loads once per executor (module-global ``_EXECUTOR_CACHE``);
    each Arrow batch is embedded in one vectorized call — the
    predict_batch_udf pattern from SURVEY.md §2.5.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(FloatType()))
    def _embed(texts):
        import pandas as pd

        emb = get_embedder(model)
        mat = emb.embed_batch(texts.fillna("").tolist())
        return pd.Series([row.tolist() for row in mat])

    return df.withColumn(out_col, _embed(F.col(text_col)))
