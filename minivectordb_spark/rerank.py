"""Hybrid rerank pipeline (reference: minivectordb/vector_database.py:388-441).

Pipeline: combined = w0*search_score + w1*char-ngram-hash cosine + w2*fuzzy
partial-ratio, sort desc, top-k (weights default (0.80, 0.15, 0.05),
vector_database.py:413, :423-424).

Parity contract is RANK ORDER, not bit-for-bit scores (SURVEY.md §7 "what's
hard" #2): the reference's hash features come from sklearn's
HashingVectorizer (signed murmurhash3, vector_database.py:9) and its fuzzy
score from thefuzz.partial_ratio — both replaced with deterministic
equivalents (crc32-signed hashing; a difflib-based partial_ratio with the
same best-matching-substring semantics on a 0-100 scale).

DOCUMENTED DIVERGENCE (deliberate, SURVEY.md §2.4 op 27): the reference
sorts a numpy array of [sentence, score] strings, i.e. LEXICOGRAPHICALLY on
stringified floats (vector_database.py:427-432), and swallows any failure
into "return input order" (:439-441).  We sort numerically.

Two surfaces:
- ``hybrid_rerank_results(sentences, scores, query, k, weights)`` —
  reference-parity list API, driver-side (operates on an already-collected
  top-k, <= k rows).
- ``rerank_df`` — distributed DataFrame variant: hash features as built-in
  JVM expressions, partial_ratio as an Arrow-batched pandas UDF; used when
  candidates stay distributed (batch multi-query pipelines).
"""

from __future__ import annotations

import difflib
import math
import zlib
from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

N_HASH_FEATURES = 64
NGRAM_RANGE = (1, 6)  # char n-grams, vector_database.py:9
DEFAULT_WEIGHTS = (0.80, 0.15, 0.05)


# ---------------- char-n-gram signed hash features ----------------

def _char_ngrams(text: str, lo: int = NGRAM_RANGE[0], hi: int = NGRAM_RANGE[1]):
    # sklearn's char analyzer lowercases and collapses the document to one
    # string; n-grams are sliding windows of length lo..hi
    t = (text or "").lower()
    for n in range(lo, hi + 1):
        for i in range(len(t) - n + 1):
            yield t[i : i + n]


def hash_text_features(text: str) -> np.ndarray:
    """64-dim signed-hash char-n-gram features
    (vector_database.py:388-393's HashingVectorizer re-expressed with crc32;
    alternate_sign from the hash's top bit)."""
    vec = np.zeros(N_HASH_FEATURES, dtype=np.float64)
    for g in _char_ngrams(text):
        h = zlib.crc32(g.encode("utf-8"))
        sign = 1.0 if (h >> 31) & 1 == 0 else -1.0
        vec[h % N_HASH_FEATURES] += sign
    return vec


def text_hash_scores(query: str, documents: Sequence[str]) -> list[float]:
    """Cosine between query features and each doc's features
    (vector_database.py:395-408)."""
    if len(documents) == 0:
        return []
    q = hash_text_features(query)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    out = []
    for doc in documents:
        d = hash_text_features(doc)
        dn = np.linalg.norm(d)
        out.append(float(np.dot(q, d / dn)) if dn > 0 else 0.0)
    return out


# ---------------- fuzzy partial ratio ----------------

def partial_ratio(a: str, b: str) -> float:
    """Best-matching-substring similarity on a 0-100 scale
    (thefuzz.fuzz.partial_ratio semantics, vector_database.py:410-411):
    slide the shorter string over the longer at the alignments suggested by
    difflib matching blocks; return the best window ratio * 100."""
    a = a or ""
    b = b or ""
    if a == b:
        return 100.0
    if not a or not b:
        return 0.0
    shorter, longer = (a, b) if len(a) <= len(b) else (b, a)
    sm = difflib.SequenceMatcher(None, shorter, longer, autojunk=False)
    best = 0.0
    for block in sm.get_matching_blocks():
        start = max(block.b - block.a, 0)
        window = longer[start : start + len(shorter)]
        r = difflib.SequenceMatcher(None, shorter, window, autojunk=False).ratio()
        if r > best:
            best = r
        if best == 1.0:
            break
    return round(best * 100)


def fuzzy_ratios(query: str, documents: Sequence[str]) -> list[float]:
    return [partial_ratio(query, d) for d in documents]


# ---------------- hybrid rerank ----------------

def hybrid_rerank_results(
    sentences: Sequence[str],
    search_scores: Sequence[float],
    query: str,
    k: int = 5,
    weights: tuple[float, float, float] = DEFAULT_WEIGHTS,
):
    """Reference-parity list API (vector_database.py:413-441), numerically
    correct sort.  Empty input -> empty output (tests/test_vector_database.py:554-570)."""
    sentences = list(sentences)
    search_scores = [float(s) for s in search_scores]
    if not sentences:
        return [], []
    hash_scores = text_hash_scores(query, sentences)
    fuzz_scores = fuzzy_ratios(query, sentences)
    w0, w1, w2 = weights
    combined = [
        w0 * s + w1 * h + w2 * fz
        for s, h, fz in zip(search_scores, hash_scores, fuzz_scores)
    ]
    order = sorted(range(len(sentences)), key=lambda i: -combined[i])[:k]
    return [sentences[i] for i in order], [combined[i] for i in order]


def rerank_df(
    df: DataFrame,
    query: str,
    text_col: str = "text",
    search_score_col: str = "score",
    k: int = 5,
    weights: tuple[float, float, float] = DEFAULT_WEIGHTS,
    id_col: str | None = None,
) -> DataFrame:
    """Distributed rerank over a candidate DataFrame.

    hash-cosine + partial_ratio run as ONE Arrow-batched pandas UDF pair per
    candidate batch (query features computed once per task), then the
    combined score sorts via TakeOrderedAndProject.  Candidates are already
    top-N per query, so this is cheap; the UDF exists because neither
    signed-hash features nor partial_ratio are expressible as built-ins
    (SURVEY.md §2.4 ops 24-26).
    """
    from pyspark.sql.functions import pandas_udf

    q_feat = hash_text_features(query)
    qn = np.linalg.norm(q_feat)
    if qn > 0:
        q_feat = q_feat / qn
    q_str = query

    @pandas_udf(DoubleType())
    def _hash_score(texts):
        import pandas as pd

        out = []
        for t in texts.fillna(""):
            d = hash_text_features(t)
            dn = np.linalg.norm(d)
            out.append(float(np.dot(q_feat, d / dn)) if dn > 0 else 0.0)
        return pd.Series(out)

    @pandas_udf(DoubleType())
    def _fuzzy(texts):
        import pandas as pd

        return pd.Series([float(partial_ratio(q_str, t)) for t in texts.fillna("")])

    w0, w1, w2 = weights
    scored = df.withColumn("hash_score", _hash_score(F.col(text_col))).withColumn(
        "fuzzy_score", _fuzzy(F.col(text_col))
    )
    scored = scored.withColumn(
        "combined_score",
        F.lit(w0) * F.col(search_score_col)
        + F.lit(w1) * F.col("hash_score")
        + F.lit(w2) * F.col("fuzzy_score"),
    )
    order = [F.col("combined_score").desc()]
    if id_col:
        order.append(F.col(id_col).asc())
    return scored.orderBy(*order).limit(k)
