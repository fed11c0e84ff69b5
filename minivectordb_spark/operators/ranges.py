"""Range (interval) join: match point values to [lo, hi) intervals.

The enrichment shape every pipeline hits (value -> band, timestamp ->
maintenance window, IP -> CIDR block owner).  Spark has no native range
-join optimization: a plain ``ON v >= lo AND v < hi`` theta-join plans as
BroadcastNestedLoopJoin (fine for a small band table) or, when both
sides are large, a cartesian — the 100 TB killer.

The scale path here is the standard **bucket decomposition**: pick a
bucket width ``w``; each interval explodes into the buckets it covers
(fan-out bounded by interval_length / w + 1), each point computes its
single bucket, and the match becomes a hash EQUI-join on the bucket id
followed by the residual ``lo <= v < hi`` filter inside the join.  Both
sides shuffle-partition by bucket — no nested loop, no cartesian, and
skew follows bucket population, which ``w`` controls.

Correctness does not depend on ``w`` (the residual predicate is exact);
only the fan-out / bucket-occupancy trade-off does.  Pick ``w`` near the
median interval length.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1000.0,
    point_cols: Optional[Sequence[str]] = None,
    interval_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Inner range join: one output row per (point, interval) pair with
    ``lo <= value < hi``.  Intervals may overlap (multi-match) and points
    outside every interval are dropped.

    Output columns: ``point_cols`` (default: all point columns) followed
    by ``interval_cols`` (default: all interval columns except lo/hi).
    """
    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    p_cols = list(point_cols) if point_cols is not None else points.columns
    i_cols = (
        list(interval_cols)
        if interval_cols is not None
        else [c for c in intervals.columns if c not in (lo_col, hi_col)]
    )
    pt = points.withColumn(
        "__bkt", F.floor(F.col(value_col) / F.lit(w)).cast("long")
    )
    # [lo, hi) covers buckets floor(lo/w) .. floor(hi/w); the top bucket
    # is included even when hi is on the boundary — the residual filter
    # discards the empty overlap, so the bound errs only on fan-out.
    iv = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(w)).cast("long"),
            )
        ),
    )
    joined = pt.join(iv, "__bkt").filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    )
    return joined.select(*[pt[c] for c in p_cols], *[iv[c] for c in i_cols])


def range_join_diagnostics(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1000.0,
) -> dict:
    """Falsifiable counters: exploded interval rows (the fan-out cost),
    max points / max interval-replicas per bucket (the skew exposure of
    the equi-join), and the candidate pair count the residual filter
    actually sees.  Constant-size result."""
    w = float(bucket_width)
    pb = (
        points.groupBy(
            F.floor(F.col(value_col) / F.lit(w)).cast("long").alias("__bkt")
        ).agg(F.count(F.lit(1)).alias("np"))
    )
    ib = (
        intervals.withColumn(
            "__bkt",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
                    F.floor(F.col(hi_col) / F.lit(w)).cast("long"),
                )
            ),
        )
        .groupBy("__bkt")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    row = (
        pb.join(ib, "__bkt")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.col("np") * F.col("ni")).alias("cand"),
            F.max("np").alias("mxp"),
            F.max("ni").alias("mxi"),
        )
        .collect()[0]
    )
    n_exploded = int(
        intervals.select(
            F.sum(
                F.floor(F.col(hi_col) / F.lit(w)).cast("long")
                - F.floor(F.col(lo_col) / F.lit(w)).cast("long")
                + F.lit(1)
            )
        ).collect()[0][0]
        or 0
    )
    return {
        "n_intervals": int(intervals.count()),
        "exploded_interval_rows": n_exploded,
        "n_joint_buckets": int(row["n_buckets"]),
        "candidate_pairs": int(row["cand"] or 0),
        "max_points_per_bucket": int(row["mxp"] or 0),
        "max_intervals_per_bucket": int(row["mxi"] or 0),
    }


# ---------------------------------------------------------------------------
# interval x interval overlap join
# ---------------------------------------------------------------------------

def _bucket_start(col, w: int):
    """Start of the width-``w`` bucket containing ``col``: the value
    minus its nonnegative remainder — pure int64 add/mod, NO division at
    all, so it is exact on epoch-nanos (~1.7e18, where a double-divide
    floor corrupts the bucket id past 2^53) and floors correctly for
    negative values (the ohlc_bars discipline).  Bucket IDENTITY is the
    start value itself; ``sequence(start_lo, start_hi, step w)``
    enumerates covered buckets without ever computing a quotient."""
    c = col.cast("long")
    return c - ((c % F.lit(w)) + F.lit(w)) % F.lit(w)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: int = 1_000_000_000,
    partition_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Interval x interval OVERLAP join: one row per (left, right) pair of
    half-open int64 intervals with ``l.lo < r.hi AND r.lo < l.hi`` —
    the co-occurrence shape (user activity windows, maintenance vs
    outage windows, ad exposure vs conversion windows) that a plain
    theta-join plans as a nested loop.  Returns ``(partition_cols...,
    left_id, right_id, overlap_lo, overlap_hi)``; degenerate intervals
    (hi <= lo) never match.

    Scale design — the ``bucketed_range_join`` decomposition, both sides
    interval-valued: each interval explodes into the width-``w`` buckets
    it covers (fan-out bounded by len/w + 1), the match becomes a hash
    EQUI-join on (partition_cols..., bucket) with the exact overlap
    predicate as the residual, and — the part that matters — each
    overlapping pair is emitted from exactly ONE bucket: the bucket
    containing ``greatest(l.lo, r.lo)`` (both intervals provably cover
    it when the overlap is nonempty).  That first-common-bucket gate
    replaces the pair-``distinct`` a naive bucketing needs, so the plan
    has NO dedup shuffle at all: explode, one equi-join, done.
    Correctness is independent of ``w`` (the residual is exact); only
    fan-out vs bucket occupancy trades off — pick ``w`` near the median
    interval length.

    All bucket arithmetic is exact int64 add/mod (bucket identity is the
    bucket's START value — no quotient is ever computed: epoch-nanos are
    ~1.7e18 and a double-divide floor corrupts the bucket id past 2^53),
    so the same expressions replay exactly in any engine.
    """
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    keys = list(partition_cols) if partition_cols is not None else []

    def side(df: DataFrame, id_col: str, tag: str) -> DataFrame:
        lo, hi = F.col(lo_col).cast("long"), F.col(hi_col).cast("long")
        return (
            df.filter(hi > lo)
            .select(
                *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
                F.col(id_col).alias(f"__{tag}id"),
                lo.alias(f"__{tag}lo"),
                hi.alias(f"__{tag}hi"),
            )
            .withColumn(
                "__bkt",
                F.explode(
                    F.sequence(
                        _bucket_start(F.col(f"__{tag}lo"), w),
                        _bucket_start(F.col(f"__{tag}hi") - F.lit(1), w),
                        F.lit(w).cast("long"),
                    )
                ),
            )
        )

    L = side(left, left_id, "l")
    R = side(right, right_id, "r")
    join_keys = [f"__k{i}" for i in range(len(keys))] + ["__bkt"]
    pairs = L.join(R, join_keys).filter(
        (F.col("__llo") < F.col("__rhi"))
        & (F.col("__rlo") < F.col("__lhi"))
        # first-common-bucket gate: emit only from the bucket holding
        # greatest(l.lo, r.lo) — exactly-once without a distinct
        & (F.col("__bkt") == _bucket_start(F.greatest("__llo", "__rlo"), w))
    )
    return pairs.select(
        *[F.col(f"__k{i}").alias(k) for i, k in enumerate(keys)],
        F.col("__lid").alias(left_id),
        F.col("__rid").alias(right_id),
        F.greatest("__llo", "__rlo").alias("overlap_lo"),
        F.least("__lhi", "__rhi").alias("overlap_hi"),
    )


def interval_overlap_diagnostics(
    left: DataFrame,
    right: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: int = 1_000_000_000,
    partition_cols: Optional[Sequence[str]] = None,
) -> dict:
    """Falsifiable counters for the overlap join: per-side exploded rows
    (fan-out = sum over intervals of len/w + 1), joint-bucket candidate
    pairs (what the residual filter actually sees), and the max per-side
    replicas in any one (keys, bucket) cell — the skew exposure of the
    equi-join.  Constant-size collects."""
    w = int(bucket_width)
    keys = list(partition_cols) if partition_cols is not None else []

    def occ(df: DataFrame) -> DataFrame:
        lo, hi = F.col(lo_col).cast("long"), F.col(hi_col).cast("long")
        return (
            df.filter(hi > lo)
            .select(
                *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
                F.explode(
                    F.sequence(
                        _bucket_start(lo, w),
                        _bucket_start(hi - F.lit(1), w),
                        F.lit(w).cast("long"),
                    )
                ).alias("__bkt"),
            )
            .groupBy(*[f"__k{i}" for i in range(len(keys))], "__bkt")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    lb, rb = occ(left), occ(right)
    join_keys = [f"__k{i}" for i in range(len(keys))] + ["__bkt"]
    row = (
        lb.join(rb.withColumnRenamed("n", "nr"), join_keys)
        .agg(
            F.count(F.lit(1)).alias("n_joint"),
            F.sum(F.col("n") * F.col("nr")).alias("cand"),
            F.max("n").alias("mxl"),
            F.max("nr").alias("mxr"),
        )
        .collect()[0]
    )
    return {
        "n_left": int(left.count()),
        "n_right": int(right.count()),
        "exploded_left_rows": int(
            lb.agg(F.sum("n")).collect()[0][0] or 0
        ),
        "exploded_right_rows": int(
            rb.agg(F.sum("n")).collect()[0][0] or 0
        ),
        "n_joint_cells": int(row["n_joint"]),
        "candidate_pairs": int(row["cand"] or 0),
        "max_left_per_cell": int(row["mxl"] or 0),
        "max_right_per_cell": int(row["mxr"] or 0),
    }


def coalesce_intervals(
    df: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    partition_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Merge overlapping-or-touching half-open int64 intervals per key
    into maximal disjoint spans — the coverage rollup (total user
    activity time, merged maintenance windows, consolidated exposure
    spans) that pairs with ``interval_overlap_join``: the join finds
    co-occurrences, this collapses a set into its union.  Touching
    intervals ([0,10) + [10,20)) DO merge (the union is contiguous);
    degenerate intervals (hi <= lo) are dropped.  Returns
    ``(partition_cols..., span_lo, span_hi, n_merged)``.

    Plan: the classic sweep as ONE keyed window pass — order by (lo, hi)
    within each key, a span boundary opens wherever lo exceeds the
    running max of all previous his (exact int64 compares, no floats) —
    followed by one combiner-reduced groupBy on (keys, span#).  Both
    exchanges hash on the partition keys, so a 100 TB run shuffles each
    row twice and nothing is ever quadratic; the result is a pure
    function of the interval SET (ties in the sweep order cannot change
    where a gap falls)."""
    from pyspark.sql import Window

    keys = list(partition_cols) if partition_cols is not None else []
    lo, hi = F.col(lo_col).cast("long"), F.col(hi_col).cast("long")
    base = df.filter(hi > lo).select(
        *[F.col(k) for k in keys],
        lo.alias("__lo"),
        hi.alias("__hi"),
    )
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col("__lo").asc(), F.col("__hi").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = base.withColumn(
        "__new_span",
        F.when(
            F.col("__lo") > F.coalesce(
                F.max("__hi").over(w), F.lit(-(1 << 62))
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    w_run = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col("__lo").asc(), F.col("__hi").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    spans = flagged.withColumn("__span", F.sum("__new_span").over(w_run))
    return (
        spans.groupBy(*[F.col(k) for k in keys], F.col("__span"))
        .agg(
            F.min("__lo").alias("span_lo"),
            F.max("__hi").alias("span_hi"),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("__span")
    )
