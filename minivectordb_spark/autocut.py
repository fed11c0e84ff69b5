"""Autocut truncation (reference: minivectordb/vector_database.py:443-464,
distance variant sharded_vector_database_usearch.py:573-594).

Given a desc-sorted score list, compute relative drops
``(s[i-1] - s[i]) / s[i-1]``; if the maximum drop exceeds 0.2, cut
everything AFTER the first position attaining that maximum (``list.index``
returns the first occurrence).  Applied only when >= 2 results
(vector_database.py:528).

Two implementations:
- driver-side list ops (exact reference algorithm; the input is the already
  collected top-k, <= k rows, so this is O(k) on the driver);
- a window-function DataFrame variant for fully-distributed pipelines and
  for the SQL correctness oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def autocut_scores(score_list: Sequence[float]) -> list[int]:
    """Indices to REMOVE for similarity scores (higher=better).

    Mirrors vector_database.py:443-464: max relative decrease, first
    occurrence, threshold strictly > 0.2.
    """
    if len(score_list) < 2:
        return []
    drops = [
        (score_list[i - 1] - score_list[i]) / score_list[i - 1]
        for i in range(1, len(score_list))
    ]
    max_drop = max(drops)
    if max_drop > 0.2:
        return list(range(drops.index(max_drop) + 1, len(score_list)))
    return []


def autocut_distances(distance_list: Sequence[float]) -> list[int]:
    """Indices to REMOVE for distances (lower=better) — the sign-flipped
    variant (sharded_vector_database_usearch.py:573-594): largest relative
    INCREASE ``(d[i] - d[i-1]) / d[i-1]``."""
    if len(distance_list) < 2:
        return []

    def rise(prev: float, cur: float) -> float:
        if prev == 0.0:
            # guard the reference's bare division (an exact match has
            # distance 0): any increase from zero is an infinite relative
            # rise, no increase is none
            return float("inf") if cur > prev else 0.0
        return (cur - prev) / prev

    rises = [
        rise(distance_list[i - 1], distance_list[i])
        for i in range(1, len(distance_list))
    ]
    max_rise = max(rises)
    if max_rise > 0.2:
        return list(range(rises.index(max_rise) + 1, len(distance_list)))
    return []


def apply_autocut(items: list, scores: list[float], *extra_lists: list):
    """Apply autocut to parallel result lists (vector_database.py:528-534)."""
    remove = set(autocut_scores(scores))
    if not remove:
        return (items, scores, *extra_lists)
    keep = [i for i in range(len(scores)) if i not in remove]
    out = tuple(
        [lst[i] for i in keep] for lst in (items, scores, *extra_lists)
    )
    return out


def autocut_df(
    df: DataFrame,
    score_col: str = "score",
    id_col: str = "id",
    partition_cols: Sequence[str] = (),
    threshold: float = 0.2,
) -> DataFrame:
    """Distributed autocut: keep rows up to and including the first maximal
    relative drop, iff that drop exceeds ``threshold``.

    The input is expected to be a (per-partition) top-k — a handful of rows
    per group — so the windows here are tiny; this exists so autocut can run
    inside a fully-distributed pipeline (e.g. batch multi-query kNN) without
    a driver round-trip.
    """
    part = list(partition_cols)
    order = [F.col(score_col).desc(), F.col(id_col).asc()]
    w = Window.partitionBy(*part).orderBy(*order) if part else Window.orderBy(*order)
    wall = (
        Window.partitionBy(*part) if part else Window.partitionBy()
    )
    with_drop = (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__prev", F.lag(score_col).over(w))
        .withColumn(
            "__drop",
            F.when(
                F.col("__prev").isNotNull(),
                (F.col("__prev") - F.col(score_col)) / F.col("__prev"),
            ),
        )
    )
    with_max = with_drop.withColumn("__maxdrop", F.max("__drop").over(wall)).withColumn(
        "__cutpos",
        F.min(
            F.when(F.col("__drop") == F.col("__maxdrop"), F.col("__rn"))
        ).over(wall),
    )
    kept = with_max.filter(
        (F.col("__maxdrop").isNull())
        | (F.col("__maxdrop") <= threshold)
        | (F.col("__rn") < F.col("__cutpos"))
    )
    return kept.drop("__rn", "__prev", "__drop", "__maxdrop", "__cutpos")
