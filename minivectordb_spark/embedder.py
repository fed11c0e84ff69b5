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


def masked_mean_pool(last_hidden: np.ndarray, attention_mask: np.ndarray) -> np.ndarray:
    """Attention-masked mean pooling (embedding_model.py:51-54's
    ``average_pool``): zero out padding positions, sum over the sequence
    axis, divide by the per-row count of attended tokens.

    Pure numpy so the math is backend-agnostic (torch outputs are converted
    before pooling) and unit-testable without torch installed.
    """
    mask = attention_mask.astype(np.float32)[..., None]  # (n, seq, 1)
    summed = (last_hidden.astype(np.float32) * mask).sum(axis=1)  # (n, dim)
    counts = np.clip(mask.sum(axis=1), 1e-9, None)  # (n, 1)
    return summed / counts


def l2_normalize(mat: np.ndarray) -> np.ndarray:
    """Row-wise L2 normalization (torch.nn.functional.normalize(p=2, dim=1),
    embedding_model.py:70) with the same zero-row guard."""
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return (mat / np.clip(norms, 1e-12, None)).astype(np.float32)


def _to_numpy(x) -> np.ndarray:
    """Accept torch tensors or numpy arrays from an injected double."""
    if hasattr(x, "detach"):  # torch.Tensor
        x = x.detach().cpu().numpy()
    return np.asarray(x)


class OnnxEmbedder(Embedder):
    """ONNX-quantized USE-multilingual backend (embedding_model.py:37-48:
    session options pin inter/intra-op threads to the core count and
    register the onnxruntime_extensions custom-ops library; :81-82: the
    session graph takes raw strings — ``run(["outputs"], {"inputs":
    texts})`` — so there is no Python-side tokenizer).  512-dim.

    ``session`` injects a prebuilt session double for tests; otherwise
    onnxruntime(+extensions) and a ``model_path`` are required (the
    reference's weights are package data absent from the checkout —
    .MISSING_LARGE_BLOBS).
    """

    dim = 512

    def __init__(
        self,
        model_path: str | None = None,
        cpu_cores: int | None = None,
        session=None,
    ):
        if session is not None:
            self._session = session
            return
        try:
            import onnxruntime as ort
            from onnxruntime_extensions import get_library_path
        except ImportError as e:
            raise NotImplementedError(
                "OnnxEmbedder requires onnxruntime + onnxruntime_extensions; "
                "not installed in this environment. Use HashProjectionEmbedder."
            ) from e
        if model_path is None:
            raise NotImplementedError(
                "ONNX model weights are not bundled (.MISSING_LARGE_BLOBS); "
                "supply model_path to the quantized USE-multilingual graph."
            )
        import os

        cores = cpu_cores if cpu_cores is not None else (os.cpu_count() or 1)
        opts = ort.SessionOptions()
        opts.inter_op_num_threads = cores
        opts.intra_op_num_threads = cores
        opts.register_custom_ops_library(get_library_path())
        self._session = ort.InferenceSession(
            path_or_bytes=model_path, sess_options=opts,
            providers=["CPUExecutionProvider"],
        )

    def embed_batch(self, texts: Sequence[str]) -> np.ndarray:
        if not len(texts):
            return np.zeros((0, self.dim), dtype=np.float32)
        # one session.run for the whole batch (the reference runs one text
        # per call, embedding_model.py:81-82 — batched here because the
        # pandas-UDF path hands us whole Arrow batches)
        out = self._session.run(
            output_names=["outputs"], input_feed={"inputs": list(texts)}
        )[0]
        return _to_numpy(out).astype(np.float32)


class E5Embedder(Embedder):
    """intfloat/multilingual-e5 backend (embedding_model.py:55-71): 'passage '
    prefix, 512-token truncation, attention-masked mean-pool, L2 normalize.
    384-dim (small) / 1024-dim (large).

    ``tokenizer``/``model`` inject test doubles (tokenizer(texts, ...) ->
    mapping with ``attention_mask``; model(**batch) -> object with
    ``last_hidden_state``); otherwise torch + transformers are required and
    the pretrained weights are fetched by name.
    """

    def __init__(self, size: str = "small", tokenizer=None, model=None):
        self.dim = 384 if size == "small" else 1024
        if tokenizer is not None and model is not None:
            self._tokenizer, self._model = tokenizer, model
            return
        try:
            import torch  # noqa: F401
            from transformers import AutoModel, AutoTokenizer
        except ImportError as e:
            raise NotImplementedError(
                "E5Embedder requires torch + transformers; not installed. "
                "Use HashProjectionEmbedder."
            ) from e
        name = f"intfloat/multilingual-e5-{size}"
        self._tokenizer = AutoTokenizer.from_pretrained(name)
        self._model = AutoModel.from_pretrained(name)

    def embed_batch(self, texts: Sequence[str]) -> np.ndarray:
        if not len(texts):
            return np.zeros((0, self.dim), dtype=np.float32)
        batch = self._tokenizer(
            [f"passage {t}" for t in texts],
            max_length=512, padding=True, truncation=True, return_tensors="pt",
        )
        outputs = self._model(**batch)
        pooled = masked_mean_pool(
            _to_numpy(outputs.last_hidden_state), _to_numpy(batch["attention_mask"])
        )
        return l2_normalize(pooled)


class BGEM3Embedder(Embedder):
    """BAAI/bge-m3 backend (embedding_model.py:73-79): dense vectors from
    BGEM3FlagModel.encode with max_length=512.  1024-dim.

    ``model`` injects a test double (model.encode(texts, ...) -> mapping
    with ``dense_vecs``); otherwise FlagEmbedding is required.
    """

    dim = 1024

    def __init__(self, model=None):
        if model is not None:
            self._model = model
            return
        try:
            from FlagEmbedding import BGEM3FlagModel
        except ImportError as e:
            raise NotImplementedError(
                "BGEM3Embedder requires FlagEmbedding; not installed. "
                "Use HashProjectionEmbedder."
            ) from e
        self._model = BGEM3FlagModel("BAAI/bge-m3")

    def embed_batch(self, texts: Sequence[str]) -> np.ndarray:
        if not len(texts):
            return np.zeros((0, self.dim), dtype=np.float32)
        dense = self._model.encode(
            list(texts), batch_size=len(texts), max_length=512
        )["dense_vecs"]
        return _to_numpy(dense).astype(np.float32)


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
