"""BM25 keyword retrieval — the sparse leg of hybrid search.

The reference is dense-only (FAISS cosine + hash/fuzzy rerank); a vector
engine replacing it at corpus scale needs the classic keyword ranker next
to the dense path so callers can fuse both (dense kNN from scoring.py,
BM25 here, rerank.py on top).

Shape: Okapi BM25 with the standard k1/b defaults.

    score(D, Q) = sum_t idf(t) * tf(t, D) * (k1 + 1)
                  / (tf(t, D) + k1 * (1 - b + b * |D| / avgdl))
    idf(t) = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)

Plan: two tiny driver-side stats (N + sum of doc lengths in one agg; df_t
for the handful of query tokens in one agg) collected like IVF centroids,
then ONE map-only pass over the corpus — per-doc tf via size(filter(...))
on the staged token array — into TakeOrderedAndProject.  No shuffle of the
corpus, no inverted index to maintain; at 100 TB the scan is the cost and
it parallelizes perfectly.  (A pre-built inverted index would beat it for
low-latency serving — that is a different storage trade, like ann.py's
persisted IVF.)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minivectordb_spark.operators.text import tokens
from minivectordb_spark.operators.util import materialize

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def corpus_stats(df: DataFrame, text_col: str = "text") -> tuple[int, float]:
    """(N, avgdl) in one aggregation.  avgdl = sum(dl)/N (exact integer sum
    then one division — reproducible bit-for-bit in any engine, unlike a
    streaming avg())."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(tokens(F.col(text_col)))).alias("sdl"),
    ).collect()[0]
    n = int(row["n"])
    return n, (float(row["sdl"]) / n if n else 0.0)


def doc_frequencies(
    df: DataFrame, query_tokens: list[str], text_col: str = "text"
) -> dict[str, int]:
    """df_t for each query token in one pass: explode the per-doc DISTINCT
    tokens, keep the query set, count."""
    if not query_tokens:
        return {}
    qset = sorted(set(query_tokens))
    rows = (
        df.select(F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("t"))
        .filter(F.col("t").isin(qset))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    )
    found = {r["t"]: int(r["df"]) for r in rows}
    return {t: found.get(t, 0) for t in qset}


def bm25_search(
    df: DataFrame,
    query_tokens: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> DataFrame:
    """Top-k documents by BM25 — (id, bm25) with the global (score desc,
    id asc) tie order shared by every ranked operator in the engine."""
    n, avgdl = corpus_stats(df, text_col)
    dfs = doc_frequencies(df, query_tokens, text_col)
    staged = materialize(df, tokens(F.col(text_col)), "__toks", [id_col])
    dl = F.size(F.col("__toks")).cast("double")

    def tf_expr(tok: str):
        # factory closure, NOT `lambda x, _t=tok:` — PySpark infers HOF
        # arity from the Python signature, so a defaulted second arg turns
        # the lambda into (element, index) and breaks the predicate
        return F.size(F.filter(F.col("__toks"), lambda x: x == F.lit(tok))).cast(
            "double"
        )

    score = F.lit(0.0)
    for t in sorted(set(query_tokens)):
        idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
        tf = tf_expr(t)
        denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl))
        score = score + F.lit(idf) * tf * F.lit(k1 + 1.0) / denom
    return (
        staged.select(F.col(id_col), F.round(score, 6).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )
