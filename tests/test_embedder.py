"""Real-model backend tests (no Spark session needed).

The container has no torch/onnxruntime/FlagEmbedding, so each backend is
driven through its injected test double; the pooling/normalization math
(reference embedding_model.py:51-54, :70) is asserted against hand-computed
values.  The import gates themselves are asserted to raise cleanly.
"""

import numpy as np
import pytest

from minivectordb_spark.embedder import (
    BGEM3Embedder,
    E5Embedder,
    HashProjectionEmbedder,
    OnnxEmbedder,
    l2_normalize,
    masked_mean_pool,
)


def test_masked_mean_pool_hand_computed():
    # 1 row, seq=3, dim=2; third position is padding and must not count
    hidden = np.array([[[1.0, 2.0], [3.0, 4.0], [100.0, 100.0]]])
    mask = np.array([[1, 1, 0]])
    out = masked_mean_pool(hidden, mask)
    np.testing.assert_allclose(out, [[2.0, 3.0]], rtol=1e-6)


def test_masked_mean_pool_all_padding_is_finite():
    hidden = np.ones((1, 2, 4), dtype=np.float32)
    mask = np.zeros((1, 2), dtype=np.int64)
    out = masked_mean_pool(hidden, mask)
    assert np.isfinite(out).all() and (out == 0).all()


def test_l2_normalize_unit_rows_and_zero_guard():
    mat = np.array([[3.0, 4.0], [0.0, 0.0]], dtype=np.float32)
    out = l2_normalize(mat)
    np.testing.assert_allclose(out[0], [0.6, 0.8], rtol=1e-6)
    assert np.isfinite(out[1]).all() and (out[1] == 0).all()
    assert out.dtype == np.float32


class _FakeTokenizer:
    """Deterministic 'tokenizer': one token per whitespace word, capped at
    max_length; records call kwargs for contract assertions."""

    def __init__(self):
        self.calls = []

    def __call__(self, texts, **kwargs):
        self.calls.append((list(texts), kwargs))
        max_len = kwargs["max_length"]
        lens = [min(len(t.split()), max_len) for t in texts]
        seq = max(lens)
        mask = np.array(
            [[1] * n + [0] * (seq - n) for n in lens], dtype=np.int64
        )
        return {"input_ids": mask.copy(), "attention_mask": mask}


class _FakeE5Model:
    """'Forward pass' whose hidden state at position j of row i is
    (i + j + 1) * ones(dim) — padding positions get a poison value so any
    unmasked pooling is caught."""

    def __init__(self, dim=4):
        self.dim = dim

    def __call__(self, input_ids=None, attention_mask=None, **kw):
        n, seq = attention_mask.shape
        h = np.zeros((n, seq, self.dim), dtype=np.float32)
        for i in range(n):
            for j in range(seq):
                h[i, j] = (i + j + 1.0) if attention_mask[i, j] else 1e9

        class Out:
            last_hidden_state = h

        return Out()


def test_e5_embed_batch_prefix_pooling_normalization():
    tok = _FakeTokenizer()
    emb = E5Embedder("small", tokenizer=tok, model=_FakeE5Model(dim=4))
    out = emb.embed_batch(["a b", "a b c"])

    texts, kwargs = tok.calls[0]
    # reference embedding_model.py:64 — 'passage ' prefix, 512 truncation
    assert texts == ["passage a b", "passage a b c"]
    assert kwargs["max_length"] == 512 and kwargs["truncation"] is True

    # row 0: 3 attended tokens ('passage a b') -> mean of (1,2,3)*ones = 2
    # row 1: 4 attended tokens -> mean of (2,3,4,5)*ones = 3.5; both rows
    # L2-normalize to the same unit vector [0.5]*4
    assert out.shape == (2, 4) and out.dtype == np.float32
    np.testing.assert_allclose(out, np.full((2, 4), 0.5), rtol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), [1.0, 1.0], rtol=1e-6)


def test_e5_embed_single_matches_batch():
    emb = E5Embedder("small", tokenizer=_FakeTokenizer(), model=_FakeE5Model())
    np.testing.assert_array_equal(emb.embed("x y"), emb.embed_batch(["x y"])[0])


class _FakeOnnxSession:
    def __init__(self):
        self.calls = []

    def run(self, output_names=None, input_feed=None):
        self.calls.append((output_names, input_feed))
        texts = input_feed["inputs"]
        return [np.array([[float(len(t))] * 512 for t in texts])]


def test_onnx_embed_batch_session_contract():
    sess = _FakeOnnxSession()
    emb = OnnxEmbedder(session=sess)
    out = emb.embed_batch(["ab", "abcd"])
    # reference embedding_model.py:81-82 — raw strings into the graph
    assert sess.calls == [(["outputs"], {"inputs": ["ab", "abcd"]})]
    assert out.shape == (2, 512) and out.dtype == np.float32
    assert out[0, 0] == 2.0 and out[1, 0] == 4.0


class _FakeBGEM3:
    def __init__(self):
        self.calls = []

    def encode(self, texts, **kwargs):
        self.calls.append((list(texts), kwargs))
        return {"dense_vecs": np.ones((len(texts), 1024)) * 0.25}


def test_bgem3_embed_batch_contract():
    model = _FakeBGEM3()
    emb = BGEM3Embedder(model=model)
    out = emb.embed_batch(["x", "y", "z"])
    texts, kwargs = model.calls[0]
    # reference embedding_model.py:73-79 — dense_vecs, max_length=512
    assert texts == ["x", "y", "z"] and kwargs["max_length"] == 512
    assert out.shape == (3, 1024) and out.dtype == np.float32


def test_empty_batch_all_backends():
    for emb in (
        OnnxEmbedder(session=_FakeOnnxSession()),
        E5Embedder(tokenizer=_FakeTokenizer(), model=_FakeE5Model()),
        BGEM3Embedder(model=_FakeBGEM3()),
        HashProjectionEmbedder(dim=8),
    ):
        out = emb.embed_batch([])
        assert out.shape == (0, emb.dim)


def test_import_gates_raise_cleanly_when_deps_absent():
    """In this container torch/onnxruntime/FlagEmbedding are absent: the
    un-injected constructors must raise NotImplementedError (not ImportError
    mid-batch).  Skip any gate whose dep happens to be installed."""
    for ctor, dep in (
        (lambda: OnnxEmbedder(), "onnxruntime"),
        (lambda: E5Embedder("small"), "torch"),
        (lambda: BGEM3Embedder(), "FlagEmbedding"),
    ):
        try:
            __import__(dep)
        except ImportError:
            with pytest.raises(NotImplementedError):
                ctor()
