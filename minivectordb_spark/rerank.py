"""Hybrid rerank pipeline (reference: minivectordb/vector_database.py:388-441).

Pipeline: combined = w0*search_score + w1*char-ngram-hash cosine + w2*fuzzy,
sort desc, top-k (weights default (0.80, 0.15, 0.05), vector_database.py:413,
:423-424).

Parity contract is RANK ORDER, not bit-for-bit scores (SURVEY.md §7 "what's
hard" #2), and every default-path feature is ENGINE-PORTABLE DETERMINISTIC so
the whole rerank is oracle-checkable against DuckDB:

- hash features: the reference's sklearn HashingVectorizer (signed
  murmurhash3, vector_database.py:9, :388-393) re-expressed with the repo's
  standard md5-based 32-bit hash (operators/hashing.py): char 1..6-grams of
  the lowercased text, bucket = h % 64, sign = +1 if h < 2^31 else -1.
  Scores are exact-integer dot products divided by exact-integer norms, so
  Spark, DuckDB and numpy produce bit-identical doubles.
- fuzzy: the reference's thefuzz.fuzz.partial_ratio (vector_database.py:
  410-411) is replaced BY DEFAULT with a char-trigram overlap coefficient
  ``100 * |T(a) ∩ T(b)| / min(|T(a)|, |T(b)|)`` (pg_trgm-style), which is
  set algebra — SQL-expressible and deterministic.  The sliding
  best-substring ``partial_ratio`` (rapidfuzz when importable, difflib
  fallback) remains available via ``fuzzy="partial"`` for users comparing
  against thefuzz-era numbers; it is NOT SQL-expressible and therefore not
  the oracle path.

DOCUMENTED DIVERGENCE (deliberate, SURVEY.md §2.4 op 27): the reference
sorts a numpy array of [sentence, score] strings, i.e. LEXICOGRAPHICALLY on
stringified floats (vector_database.py:427-432), and swallows any failure
into "return input order" (:439-441).  We sort numerically.

Two surfaces:
- ``hybrid_rerank_results(sentences, scores, query, k, weights)`` —
  reference-parity list API, driver-side (operates on an already-collected
  top-k, <= k rows).
- ``rerank_df`` — distributed DataFrame variant: ALL features are built-in
  JVM expressions (nested higher-order functions over the gram array; no
  Python in the hot path), staged behind a Generate-node barrier
  (operators/util.py) so Catalyst cannot recompute the O(64·G) feature fold
  per consumer.
- ``rerank_oracle_tail`` — the DuckDB CTE chain that reproduces
  ``rerank_df`` bit-for-bit, for the driver's correctness oracle.
"""

from __future__ import annotations

import hashlib
import math
from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HASH_FEATURES = 64
NGRAM_RANGE = (1, 6)  # char n-grams, vector_database.py:9
TRIGRAM_N = 3
DEFAULT_WEIGHTS = (0.80, 0.15, 0.05)

_SIGN_FLIP = 1 << 31  # top bit of the 32-bit hash decides the feature sign


def _md5i32_py(s: str) -> int:
    """Python twin of operators/hashing.md5i32 (first 8 md5 hex chars)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


# ---------------- char-n-gram signed hash features ----------------

def _char_ngrams(text: str, lo: int = NGRAM_RANGE[0], hi: int = NGRAM_RANGE[1]):
    # sklearn's char analyzer lowercases and collapses the document to one
    # string; n-grams are sliding windows of length lo..hi
    t = (text or "").lower()
    for n in range(lo, hi + 1):
        for i in range(len(t) - n + 1):
            yield t[i : i + n]


def hash_text_features(text: str) -> np.ndarray:
    """64-dim signed-hash char-n-gram features as EXACT int64 counts
    (vector_database.py:388-393's HashingVectorizer re-expressed with the
    engine-portable md5 hash; alternate_sign from the hash's top bit)."""
    vec = np.zeros(N_HASH_FEATURES, dtype=np.int64)
    for g in _char_ngrams(text):
        h = _md5i32_py(g)
        vec[h % N_HASH_FEATURES] += 1 if h < _SIGN_FLIP else -1
    return vec


def text_hash_scores(query: str, documents: Sequence[str]) -> list[float]:
    """Cosine between query features and each doc's features
    (vector_database.py:395-408).  dot and squared norms are exact integers;
    the only float ops are two sqrts, one multiply and one divide — the
    same IEEE ops the Spark and DuckDB twins perform, so all three engines
    agree bitwise."""
    if len(documents) == 0:
        return []
    q = hash_text_features(query)
    q2 = int(q @ q)
    if q2 == 0:
        return [0.0 for _ in documents]
    out = []
    for doc in documents:
        d = hash_text_features(doc)
        d2 = int(d @ d)
        dot = int(q @ d)
        out.append(dot / (math.sqrt(q2) * math.sqrt(d2)) if d2 > 0 else 0.0)
    return out


# ---------------- fuzzy scores ----------------

def trigram_set(text: str) -> set[str]:
    t = (text or "").lower()
    return {t[i : i + TRIGRAM_N] for i in range(len(t) - TRIGRAM_N + 1)}


def trigram_overlap(a: str, b: str) -> float:
    """Char-trigram overlap coefficient on a 0-100 scale — the DEFAULT
    deterministic stand-in for thefuzz.partial_ratio (see module doc).
    Exact equality (lowercased) short-circuits to 100."""
    ta_s = (a or "").lower()
    tb_s = (b or "").lower()
    if ta_s == tb_s:
        return 100.0
    ta, tb = trigram_set(a), trigram_set(b)
    m = min(len(ta), len(tb))
    if m == 0:
        return 0.0
    return 100.0 * len(ta & tb) / m


try:  # pragma: no cover - rapidfuzz absent in the target container
    from rapidfuzz.fuzz import partial_ratio as _rf_partial_ratio
except Exception:  # pragma: no cover
    _rf_partial_ratio = None


def partial_ratio(a: str, b: str) -> float:
    """Best-matching-substring similarity on a 0-100 scale
    (thefuzz.fuzz.partial_ratio semantics, vector_database.py:410-411).
    Uses rapidfuzz when importable (bit-parity with thefuzz's backend and
    ~100x faster than difflib); otherwise a difflib sliding-window
    approximation with the same best-substring semantics."""
    a = a or ""
    b = b or ""
    if a == b:
        return 100.0
    if not a or not b:
        return 0.0
    if _rf_partial_ratio is not None:
        return float(round(_rf_partial_ratio(a, b)))
    import difflib

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


def fuzzy_ratios(
    query: str, documents: Sequence[str], mode: str = "trigram"
) -> list[float]:
    fn = trigram_overlap if mode == "trigram" else partial_ratio
    return [fn(query, d) for d in documents]


# ---------------- hybrid rerank (driver-side list API) ----------------

def hybrid_rerank_results(
    sentences: Sequence[str],
    search_scores: Sequence[float],
    query: str,
    k: int = 5,
    weights: tuple[float, float, float] = DEFAULT_WEIGHTS,
    fuzzy: str = "trigram",
):
    """Reference-parity list API (vector_database.py:413-441), numerically
    correct sort.  Empty input -> empty output (tests/test_vector_database.py:554-570).
    ``fuzzy`` picks the third feature: "trigram" (default, deterministic,
    matches ``rerank_df`` and the SQL oracle) or "partial" (thefuzz-like)."""
    sentences = list(sentences)
    search_scores = [float(s) for s in search_scores]
    if not sentences:
        return [], []
    hash_scores = text_hash_scores(query, sentences)
    fuzz_scores = fuzzy_ratios(query, sentences, mode=fuzzy)
    w0, w1, w2 = weights
    combined = [
        w0 * s + w1 * h + w2 * fz
        for s, h, fz in zip(search_scores, hash_scores, fuzz_scores)
    ]
    order = sorted(range(len(sentences)), key=lambda i: -combined[i])[:k]
    return [sentences[i] for i in order], [combined[i] for i in order]


# ---------------- distributed DataFrame rerank (JVM-side) ----------------

_SIGN_SQL = "(CASE WHEN h < 2147483648 THEN 1 ELSE -1 END)"

# 64 signed bucket counts in ONE pass over the gram-hash array: the
# accumulator is the running 64-vector, each gram bumps its bucket (the same
# array-accumulator shape minhash_signatures uses, operators/dedup.py).
_HF_EXPR = f"""
aggregate(
  transform(
    flatten(transform(sequence(1, {NGRAM_RANGE[1]}), n ->
      CASE WHEN length(__t) >= n
           THEN transform(sequence(1, length(__t) - n + 1), i -> substring(__t, i, n))
           ELSE cast(array() as array<string>) END)),
    g -> cast(conv(substr(md5(g), 1, 8), 16, 10) as bigint)),
  array_repeat(cast(0 as bigint), {N_HASH_FEATURES}),
  (acc, h) -> transform(acc, (v, j) -> v + CASE WHEN pmod(h, {N_HASH_FEATURES}) = j THEN {_SIGN_SQL} ELSE cast(0 as bigint) END))
""".strip()

_DT_EXPR = """
CASE WHEN length(__t) >= 3
     THEN array_distinct(transform(sequence(1, length(__t) - 2), i -> substring(__t, i, 3)))
     ELSE cast(array() as array<string>) END
""".strip()


def _sql_str_lit(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def rerank_df(
    df: DataFrame,
    query: str,
    text_col: str = "text",
    search_score_col: str = "score",
    k: int = 5,
    weights: tuple[float, float, float] = DEFAULT_WEIGHTS,
    id_col: str | None = None,
) -> DataFrame:
    """Distributed rerank over a candidate DataFrame — 100% JVM-side.

    The O(64·G) signed-feature fold runs ONCE per row behind a Generate
    barrier; hash-cosine, trigram overlap and the combined score are then
    cheap column expressions, and the final top-k is TakeOrderedAndProject.
    Bit-identical to ``hybrid_rerank_results(..., fuzzy="trigram")`` and to
    ``rerank_oracle_tail``'s DuckDB SQL.
    """
    qf = hash_text_features(query)
    q2 = int(qf @ qf)
    qt = sorted(trigram_set(query))
    nq = len(qt)
    qlow = (query or "").lower()

    qf_csv = ", ".join(str(int(x)) for x in qf)
    qt_lit = (
        "array(" + ", ".join(_sql_str_lit(s) for s in qt) + ")"
        if qt
        else "cast(array() as array<string>)"
    )

    keep = list(df.columns)
    staged = df.withColumn(
        "__t", F.lower(F.coalesce(F.col(text_col).cast("string"), F.lit("")))
    )
    # one Generate barrier materializes the expensive feature fold per row
    staged = staged.select(
        *keep, "__t", F.explode(F.array(F.expr(_HF_EXPR))).alias("__hf")
    ).withColumn("__dt", F.expr(_DT_EXPR))

    dot = F.expr(
        f"aggregate(zip_with(__hf, array({qf_csv}), (a, b) -> a * cast(b as bigint)), "
        "cast(0 as bigint), (a, x) -> a + x)"
    )
    d2 = F.expr(
        "aggregate(transform(__hf, v -> v * v), cast(0 as bigint), (a, x) -> a + x)"
    )
    icnt = F.expr(f"size(array_intersect(__dt, {qt_lit}))")
    nb = F.size(F.col("__dt"))

    scored = staged.withColumn("__dot", dot).withColumn("__d2", d2)
    if q2 == 0:
        hash_score = F.lit(0.0)
    else:
        hash_score = F.when(
            F.col("__d2") > 0,
            F.col("__dot").cast("double")
            / (F.sqrt(F.lit(float(q2))) * F.sqrt(F.col("__d2").cast("double"))),
        ).otherwise(F.lit(0.0))
    fuzzy_score = (
        F.when(F.col("__t") == F.lit(qlow), F.lit(100.0))
        .when(F.least(F.lit(nq), nb) == 0, F.lit(0.0))
        .otherwise(F.lit(100.0) * icnt / F.least(F.lit(nq), nb))
    )
    w0, w1, w2 = weights
    scored = (
        scored.withColumn("hash_score", hash_score)
        .withColumn("fuzzy_score", fuzzy_score)
        .withColumn(
            "combined_score",
            F.lit(w0) * F.col(search_score_col)
            + F.lit(w1) * F.col("hash_score")
            + F.lit(w2) * F.col("fuzzy_score"),
        )
        .drop("__t", "__hf", "__dt", "__dot", "__d2")
    )
    order = [F.col("combined_score").desc()]
    if id_col:
        order.append(F.col(id_col).asc())
    return scored.orderBy(*order).limit(k)


# ---------------- DuckDB oracle twin ----------------

def rerank_oracle_tail(
    query: str,
    k: int = 5,
    weights: tuple[float, float, float] = DEFAULT_WEIGHTS,
    cand: str = "cand",
    id_col: str = "doc_id",
) -> str:
    """DuckDB CTE chain reproducing ``rerank_df`` bit-for-bit over a prior
    CTE ``cand(id_col, text, score)``.  Returns the ", h AS (...) ... SELECT"
    tail to append after the caller's WITH chain; output columns are
    (id_col, combined_score) with combined_score rounded to 6."""
    qf = hash_text_features(query)
    q2 = int(qf @ qf)
    qt = sorted(trigram_set(query))
    nq = len(qt)
    qlow = (query or "").lower().replace("'", "''")
    qf_sql = "[" + ", ".join(str(int(x)) for x in qf) + "]"
    qt_sql = (
        "[" + ", ".join("'" + s.replace("'", "''") + "'" for s in qt) + "]"
        if qt
        else "[]::VARCHAR[]"
    )
    dsign = "(CASE WHEN h < 2147483648 THEN 1 ELSE -1 END)"
    w0, w1, w2 = weights
    return f""",
rr_t AS (SELECT {id_col}, score, lower(coalesce(text, '')) AS tt FROM {cand}),
rr_h AS (SELECT {id_col}, score, tt,
  list_transform(
    flatten(list_transform(range(1, {NGRAM_RANGE[1] + 1}), n ->
      list_transform(range(1, length(tt) - n + 2), i -> substr(tt, i, n)))),
    g -> ('0x' || substr(md5(g), 1, 8))::BIGINT) AS hs
  FROM rr_t),
rr_f AS (SELECT {id_col}, score, tt,
  list_transform(range(0, {N_HASH_FEATURES}), b ->
    coalesce(list_sum(list_transform(hs, h -> CASE WHEN h % {N_HASH_FEATURES} = b THEN {dsign} ELSE 0 END)), 0)::BIGINT) AS hf,
  CASE WHEN length(tt) >= 3
       THEN list_distinct(list_transform(range(1, length(tt) - 1), i -> substr(tt, i, 3)))
       ELSE []::VARCHAR[] END AS dt
  FROM rr_h),
rr_s AS (SELECT {id_col}, score,
  coalesce(list_sum(list_transform(range(1, {N_HASH_FEATURES + 1}), j -> hf[j] * ({qf_sql})[j])), 0)::BIGINT AS dot,
  coalesce(list_sum(list_transform(hf, v -> v * v)), 0)::BIGINT AS d2,
  len(list_intersect(dt, {qt_sql}))::BIGINT AS icnt,
  len(dt)::BIGINT AS nb, tt
  FROM rr_f),
rr_c AS (SELECT {id_col}, score,
  CASE WHEN d2 > 0 THEN dot::DOUBLE / (sqrt({q2}::DOUBLE) * sqrt(d2::DOUBLE)) ELSE 0.0 END AS hash_score,
  CASE WHEN tt = '{qlow}' THEN 100.0 WHEN least({nq}, nb) = 0 THEN 0.0
       ELSE 100.0 * icnt / least({nq}, nb) END AS fuzzy_score
  FROM rr_s)
SELECT {id_col}, round({w0!r} * score + {w1!r} * hash_score + {w2!r} * fuzzy_score, 6) AS combined_score
FROM rr_c
ORDER BY {w0!r} * score + {w1!r} * hash_score + {w2!r} * fuzzy_score DESC, {id_col} ASC
LIMIT {k}"""
