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
    max_rows: int = 10_000,
) -> DataFrame:
    """Distributed autocut: keep rows up to and including the first maximal
    relative drop, iff that drop exceeds ``threshold``.

    The input is expected to be a (per-partition) top-k — a handful of rows
    per group — so the windows here are tiny; this exists so autocut can run
    inside a fully-distributed pipeline (e.g. batch multi-query kNN) without
    a driver round-trip.

    HARD CONTRACT: without ``partition_cols`` the whole input is one
    window group (a single sorted run is the algorithm, not an accident),
    so it must be small.  A group larger than ``max_rows`` fails the job at
    execution time (``raise_error`` in the predicate — no extra counting
    job) instead of silently single-partition-sorting an unbounded frame.
    """
    part = list(partition_cols)
    order = [F.col(score_col).desc(), F.col(id_col).asc()]
    # a constant partition key when no partition_cols: identical execution
    # (one window group) but an explicit partitionSpec, so WindowExec's
    # "No Partition Defined" warning doesn't spam every caller.  Must be
    # column-dependent (length(id)%1 == 0 for every row) — a plain lit(0)
    # is constant-folded away and the warning returns.
    pkeys = (
        [F.col(c) for c in part]
        if part
        else [
            # coalesce: a NULL id must not split into its own window group
            F.coalesce(
                F.pmod(F.length(F.col(id_col).cast("string")), F.lit(1)), F.lit(0)
            )
        ]
    )
    w = Window.partitionBy(*pkeys).orderBy(*order)
    wall = Window.partitionBy(*pkeys)
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
    # the guard lives inside the kept-predicate so Catalyst can't prune it
    guard = F.when(
        F.col("__rn") > F.lit(max_rows),
        F.raise_error(
            F.lit(
                f"autocut_df: window group exceeds max_rows={max_rows}; "
                "autocut input must be an already-reduced top-k "
                "(pass partition_cols or raise max_rows deliberately)"
            )
        ).cast("boolean"),
    ).otherwise(F.lit(True))
    kept = with_max.filter(
        guard
        & (
            (F.col("__maxdrop").isNull())
            | (F.col("__maxdrop") <= threshold)
            | (F.col("__rn") < F.col("__cutpos"))
        )
    )
    return kept.drop("__rn", "__prev", "__drop", "__maxdrop", "__cutpos")
