"""Hybrid retrieval fusion: combine ranked lists from the dense leg
(scoring.knn) and the sparse leg (bm25.bm25_search) — or any two ranked
frames — with Reciprocal Rank Fusion.

RRF (Cormack/Clarke/Buettcher, SIGIR'09):

    rrf(d) = sum over lists L of 1 / (C + rank_L(d)),   C = 60

Rank-based fusion needs no score normalization (cosine and BM25 live on
incomparable scales), which is why it is the standard first fusion every
hybrid search ships.

Plan: each leg is already a top-n (TakeOrderedAndProject); ranking adds a
single-partition window over n rows per leg (bounded by construction, same
contract as autocut), then one full-outer join of two n-row frames and a
final top-k.  Corpus-side cost is entirely inside the legs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_C = 60


def _with_rank(df: DataFrame, score_col: str, id_col: str) -> DataFrame:
    # constant partition key (same trick as autocut_df): tiny input by
    # contract, and an explicit partitionSpec keeps WindowExec quiet
    pkey = F.coalesce(
        F.pmod(F.length(F.col(id_col).cast("string")), F.lit(1)), F.lit(0)
    )
    w = Window.partitionBy(pkey).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return df.select(F.col(id_col), F.row_number().over(w).alias("__rank"))


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    score_a: str,
    score_b: str,
    k: int = 10,
    id_a: str = "id",
    id_b: str = "id",
    c: int = RRF_C,
) -> DataFrame:
    """(id, rrf) top-k from two ranked frames.  Ids present in only one
    list contribute that list's term alone (full-outer union of the legs).
    Ranks are (score desc, id asc) — the engine-wide tie order."""
    a = _with_rank(ranked_a, score_a, id_a).withColumnRenamed("__rank", "__ra")
    if id_a != "id":
        a = a.withColumnRenamed(id_a, "id")
    b = _with_rank(ranked_b, score_b, id_b).withColumnRenamed("__rank", "__rb")
    if id_b != "id":
        b = b.withColumnRenamed(id_b, "id")
    joined = a.join(b, "id", "full_outer")
    rrf = _rrf_term("__ra", c) + _rrf_term("__rb", c)
    return (
        joined.select(F.col("id"), F.round(rrf, 6).alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col("id").asc())
        .limit(k)
    )


def _rrf_term(rank_col: str, c: int):
    return F.when(
        F.col(rank_col).isNotNull(),
        F.lit(1.0) / (F.lit(float(c)) + F.col(rank_col)),
    ).otherwise(F.lit(0.0))


def rrf_fuse_batch(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    score_a: str,
    score_b: str,
    k: int = 10,
    id_a: str = "id",
    id_b: str = "id",
    query_col: str = "query_id",
    c: int = RRF_C,
) -> DataFrame:
    """Batch RRF: fuse two PER-QUERY ranked frames (query_id, id, score)
    into per-query top-k (query_id, id, rrf) — the hybrid completion of
    the reference's find_most_similar_batch contract
    (minivectordb/vector_database.py:538-563, batch = loop over queries;
    here one plan for the whole batch).

    Both legs are bounded (leg_k rows per query) by construction, so the
    rank windows and the full-outer fuse join move |Q| * leg_k rows — the
    corpus never appears.  Ranks are per-query (score desc, id asc)."""
    wa = Window.partitionBy(query_col).orderBy(
        F.col(score_a).desc(), F.col(id_a).asc()
    )
    a = ranked_a.select(
        F.col(query_col),
        F.col(id_a).alias("id"),
        F.row_number().over(wa).alias("__ra"),
    )
    wb = Window.partitionBy(query_col).orderBy(
        F.col(score_b).desc(), F.col(id_b).asc()
    )
    b = ranked_b.select(
        F.col(query_col),
        F.col(id_b).alias("id"),
        F.row_number().over(wb).alias("__rb"),
    )
    # union + min-agg instead of a full-outer join (r15): both legs carry
    # at most ONE row per (query, id) (row_number ranks), so
    # FULL OUTER JOIN on (query, id) == union the legs and take min() of
    # each rank column per (query, id) — min over one non-null value is
    # that value, both-absent cannot occur.  Same rows, one
    # hash-aggregate exchange instead of two join exchanges plus their
    # sort-merge sorts; rank-null semantics unchanged (_rrf_term treats
    # the absent leg as rank NULL either way).
    joined = (
        a.withColumn("__rb", F.lit(None).cast("int"))
        .unionByName(b.withColumn("__ra", F.lit(None).cast("int")))
        .groupBy(query_col, "id")
        .agg(F.min("__ra").alias("__ra"), F.min("__rb").alias("__rb"))
    )
    rrf = _rrf_term("__ra", c) + _rrf_term("__rb", c)
    wk = Window.partitionBy(query_col).orderBy(
        F.col("rrf").desc(), F.col("id").asc()
    )
    return (
        joined.select(F.col(query_col), F.col("id"), F.round(rrf, 6).alias("rrf"))
        .withColumn("__rk", F.row_number().over(wk))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
