"""Sketch aggregates — the fixed-state approximations 100 TB rollups run
when exact answers would shuffle raw rows.

Both wrappers are thin by design: Spark's builtin implementations
(HyperLogLog++ for distinct counts, the Greenwald-Khanna-style quantile
summary behind percentile_approx) are already partial-aggregated —
executors maintain a CONSTANT-SIZE sketch per group and the shuffle moves
sketches, not rows.  What this module adds is the accuracy CONTRACT:
documented error bounds, pinned by tests against exact answers, so a
pipeline can choose the sketch knowingly (the exact twins — events
count-distinct, interpolated percentiles — are the graded queries).

Reference analogue: none (the reference is exact-only, in-memory); this
is §2.7 scale surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame,
    col: str,
    group_by: list[str] | None = None,
    rsd: float = 0.05,
) -> DataFrame:
    """HyperLogLog++ distinct count (relative standard deviation ``rsd``,
    default 5%): sketch state is O(1/rsd^2) bytes per group REGARDLESS of
    cardinality, and merges associatively — the shuffle carries sketches.
    Output column: ``approx_distinct``."""
    agg = F.approx_count_distinct(col, rsd).alias("approx_distinct")
    if group_by:
        return df.groupBy(*group_by).agg(agg)
    return df.agg(agg)


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: list[float],
    group_by: list[str] | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """Approximate quantiles via ``percentile_approx``: rank error is
    bounded by ``1/accuracy`` of the row count (so accuracy=10000 =>
    each returned value's true rank is within 0.01% of the requested
    one), with sketch state O(accuracy) per group.  Output column:
    ``approx_q`` (array aligned with ``probabilities``)."""
    agg = F.percentile_approx(
        col, F.array(*[F.lit(float(p)) for p in probabilities]), accuracy
    ).alias("approx_q")
    if group_by:
        return df.groupBy(*group_by).agg(agg)
    return df.agg(agg)


def heavy_hitters(
    df: DataFrame,
    col: str,
    theta: float = 0.01,
) -> DataFrame:
    """EXACT heavy hitters (items with frequency >= ``theta`` * N) in two
    bounded passes — the corpus-boilerplate finder that never shuffles
    the full item cardinality.

    Pass 1 runs Misra-Gries per partition (``mapInPandas``, state capped
    at ``k = floor(1/theta) + 1`` counters).  Pigeonhole guarantee: an
    item with global count > N/k exceeds count/k in at least one
    partition, so the UNION of per-partition summaries is a SUPERSET of
    every item with global frequency >= theta * N.  Pass 2 exact-counts
    only the candidate set (a broadcast semi-join probe over the scan —
    map-side filter, then a candidate-cardinality groupBy) and keeps
    count >= ceil(theta * N).  The final output is therefore EXACT and
    partition-independent even though the intermediate summary is not:
    candidates that are not true heavy hitters are filtered by their
    exact count, and no true heavy hitter can be missed.

    State/shuffle at 100 TB: per-task memory is k counters; the
    candidate union (bounded by k * n_partitions) stays a DataFrame —
    it reaches the driver only when small enough for an inlined isin
    literal list, and rides a broadcast LEFT SEMI join otherwise; the
    only shuffle is the groupBy over rows matching the candidate set.
    Output columns: ``item``, ``cnt``.
    """
    import math

    items = _hh_items(df, col)
    k = _hh_k(theta)
    cand_df = _hh_candidates(items, k).localCheckpoint(eager=True)
    total = items.count()
    threshold = max(1, math.ceil(theta * total))
    return (
        _hh_probe(items, cand_df)
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= F.lit(threshold))
    )


# below this many candidates, probe via an inlined isin literal list
# (cheapest plan: a codegen'd IN predicate, no join at all); above it,
# a broadcast LEFT SEMI join — the candidate union is bounded by
# k * n_partitions, which at cluster partition counts can reach millions:
# far past what a literal IN predicate can carry in one plan tree, and
# far past what should round-trip through the driver at all (the join
# path never collects candidates driver-side)
_HH_ISIN_MAX = 10_000


def _hh_probe(items: DataFrame, cand_df: DataFrame) -> DataFrame:
    n = cand_df.limit(_HH_ISIN_MAX + 1).count()
    if n <= _HH_ISIN_MAX:
        candidates = [r["item"] for r in cand_df.collect()]
        if not candidates:
            return items.limit(0)
        return items.where(F.col("item").isin(candidates))
    return items.join(F.broadcast(cand_df), on="item", how="left_semi")


def _hh_items(df: DataFrame, col: str) -> DataFrame:
    return df.select(F.col(col).cast("string").alias("item")).where(
        F.col("item").isNotNull()
    )


def _hh_k(theta: float) -> int:
    if not 0.0 < theta <= 1.0:
        raise ValueError(f"theta must be in (0, 1], got {theta}")
    return int(1.0 / theta) + 1


def _hh_candidates(items: DataFrame, k: int) -> DataFrame:
    """Pass 1: per-partition Misra-Gries candidate summaries, returned as
    a DISTINCT one-column DataFrame — candidates only reach the driver on
    the small isin path, never for the broadcast join."""
    import pandas as pd

    def _mg(batches):
        # mergeable-summaries form of Misra-Gries (Agarwal et al.): fold
        # each Arrow batch's exact value_counts into the summary, then
        # shrink back to k entries by subtracting the (k+1)-th largest
        # count from all and dropping non-positives.  Each shrink of
        # `cut` is charged against (k+1)*cut removed occurrences, so the
        # total undercount stays < N_p/k — same guarantee as the per-item
        # decrement, vectorized instead of O(N*k) Python.
        counters: dict[str, int] = {}
        for pdf in batches:
            for item, c in pdf["item"].value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: v - cut for key, v in counters.items() if v - cut > 0
                }
        yield pd.DataFrame({"item": list(counters.keys())})

    return items.mapInPandas(_mg, "item string").select("item").distinct()


def heavy_hitters_diagnostics(df: DataFrame, col: str, theta: float) -> dict:
    """Falsifiable scaling counters for ``heavy_hitters``: total item
    count N, summary capacity k, partition count, the candidate-set size
    against its k * n_partitions bound, the exact threshold, and the
    final output rows — recorded at base and scaled inputs by the bench
    so the bounded-candidate claim is a number, not prose."""
    import math

    items = _hh_items(df, col)
    k = _hh_k(theta)
    n_parts = items.rdd.getNumPartitions()
    cand_df = _hh_candidates(items, k).localCheckpoint(eager=True)
    n_candidates = cand_df.count()
    total = items.count()
    threshold = max(1, math.ceil(theta * total))
    out_rows = (
        _hh_probe(items, cand_df)
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= F.lit(threshold))
        .count()
    )
    return {
        "n_items": int(total),
        "k": int(k),
        "n_partitions": int(n_parts),
        "candidates": int(n_candidates),
        "candidate_bound": int(k * n_parts),
        "threshold": int(threshold),
        "output_rows": int(out_rows),
    }
