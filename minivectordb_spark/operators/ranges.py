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

import warnings
from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, functions as F

#: per-interval bucket fan-out above which the auto knob warns: at this
#: point one row explodes into thousands of join keys and the exploded
#: side stops being "a small constant times the input" (the engine's own
#: hard wall is sequence()'s 2^31 elements, hit far later but fatally)
FANOUT_WARN = 4096


def choose_bucket_width(
    median_len: int,
    max_len: int,
    fanout_warn: int = FANOUT_WARN,
) -> tuple[int, int, bool]:
    """Pick the bucket width for the interval-join decompositions from
    a measured interval-length distribution (VERDICT r9 item 2 — the
    ``choose_qgram_q`` discipline applied to the ``w`` knob): fan-out
    per interval is ``len/w + 1`` and candidate pairs grow as buckets
    get denser, so ``w ~= the median interval length`` keeps typical
    fan-out at ~2 while holding co-bucket density near the data's own
    overlap density.  Correctness never depends on ``w`` (the residual
    predicate is exact); this knob only trades fan-out vs occupancy.

    Returns ``(w, predicted_max_fanout, saturated)`` where
    ``predicted_max_fanout = max_len // w + 1`` is the WORST single
    row's explosion and ``saturated`` flags ``predicted_max_fanout >
    fanout_warn`` — one pathological mega-interval (a years-long
    "session", an unclosed maintenance window) then dominates the
    exploded side, and the caller should clamp/split such intervals
    upstream rather than pay the fan-out."""
    w = max(1, int(median_len))
    predicted = int(max_len) // w + 1
    return w, predicted, predicted > fanout_warn


def _auto_bucket_width(
    sides: Sequence[tuple[DataFrame, str, str]],
    fanout_warn: int = FANOUT_WARN,
    op_name: str = "interval join",
) -> int:
    """Resolve ``bucket_width="auto"``: ONE constant-size aggregate per
    side (median + max interval length — combiner-reduced scalars,
    never a row collect), then ``choose_bucket_width`` on the smaller
    side-median (the fixture-pinned choice: the narrower interval
    family sets the grain).  Warns loudly when the measured max length
    predicts a per-row fan-out beyond ``fanout_warn`` — a silent
    mega-interval is the one way this decomposition degrades at scale
    (the diagnostics' ``exploded_*_rows`` counters record the same
    exposure after the fact; this is the before-the-fact gate)."""
    medians, max_lens = [], []
    for df, lo_col, hi_col in sides:
        ln = F.col(hi_col).cast("long") - F.col(lo_col).cast("long")
        row = (
            df.filter(ln > 0)
            .agg(
                F.percentile_approx(ln, 0.5).alias("med"),
                F.max(ln).alias("mx"),
            )
            .collect()[0]
        )
        if row["med"] is not None:
            medians.append(int(row["med"]))
            max_lens.append(int(row["mx"]))
    if not medians:
        return 1  # no nondegenerate intervals: any width is vacuous
    w, predicted, saturated = choose_bucket_width(
        min(medians), max(max_lens), fanout_warn
    )
    if saturated:
        warnings.warn(
            f"{op_name}: one interval explodes into ~{predicted} buckets "
            f"at the chosen width w={w} (max interval length "
            f"{max(max_lens)} vs median {min(medians)}) — a mega-interval "
            "is dominating the fan-out. Clamp or split outlier intervals "
            "upstream, or pass an explicit larger bucket_width.",
            stacklevel=3,
        )
    return w


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: Union[float, str] = 1000.0,
    point_cols: Optional[Sequence[str]] = None,
    interval_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Inner range join: one output row per (point, interval) pair with
    ``lo <= value < hi``.  Intervals may overlap (multi-match) and points
    outside every interval are dropped.

    ``bucket_width="auto"`` measures the interval-length distribution
    (one constant-size aggregate) and picks the median length via
    ``choose_bucket_width``, warning when a mega-interval predicts a
    per-row fan-out beyond ``FANOUT_WARN``.

    Output columns: ``point_cols`` (default: all point columns) followed
    by ``interval_cols`` (default: all interval columns except lo/hi).
    """
    if bucket_width == "auto":
        bucket_width = _auto_bucket_width(
            [(intervals, lo_col, hi_col)], op_name="bucketed_range_join"
        )
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
    bucket_width: Union[int, str] = 1_000_000_000,
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
    interval length, or pass ``bucket_width="auto"`` to have
    ``choose_bucket_width`` measure the length distribution and pick it
    (one constant-size aggregate per side; warns when a mega-interval
    predicts per-row fan-out beyond ``FANOUT_WARN`` — the one way this
    decomposition degrades at scale).

    All bucket arithmetic is exact int64 add/mod (bucket identity is the
    bucket's START value — no quotient is ever computed: epoch-nanos are
    ~1.7e18 and a double-divide floor corrupts the bucket id past 2^53),
    so the same expressions replay exactly in any engine.
    """
    if bucket_width == "auto":
        bucket_width = _auto_bucket_width(
            [(left, lo_col, hi_col), (right, lo_col, hi_col)],
            op_name="interval_overlap_join",
        )
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
    pairs (what the residual filter actually sees), the max per-side
    replicas in any one (keys, bucket) cell — the skew exposure of the
    equi-join — and ``max_left/right_per_key`` (VERDICT r9 item 6), the
    raw mega-key exposure BEFORE bucketing: one key holding 10^8
    intervals concentrates that key's candidate generation however fine
    the buckets are, and is the signal to split or salt that key
    upstream.  Constant-size collects."""
    w = int(bucket_width)
    keys = list(partition_cols) if partition_cols is not None else []

    def per_key_max(df: DataFrame) -> int:
        lo, hi = F.col(lo_col).cast("long"), F.col(hi_col).cast("long")
        if not keys:
            return int(df.filter(hi > lo).count())
        return int(
            df.filter(hi > lo)
            .groupBy(*[F.col(k) for k in keys])
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n"))
            .collect()[0][0]
            or 0
        )

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
        "max_left_per_key": per_key_max(left),
        "max_right_per_key": per_key_max(right),
    }


def coalesce_diagnostics(
    df: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    partition_cols: Optional[Sequence[str]] = None,
) -> dict:
    """Skew counters for ``coalesce_intervals`` (VERDICT r9 item 6): the
    keyed window sweep serializes each key in ONE task, so the scale
    exposure is ``max_intervals_per_key`` — fine at millions, a straggler
    at 10^8.  Constant-size collect (one combiner-reduced groupBy)."""
    keys = list(partition_cols) if partition_cols is not None else []
    lo, hi = F.col(lo_col).cast("long"), F.col(hi_col).cast("long")
    base = df.filter(hi > lo)
    if not keys:
        n = int(base.count())
        return {"n_intervals": n, "n_keys": 1, "max_intervals_per_key": n}
    row = (
        base.groupBy(*[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("nk"),
            F.sum("n").alias("ni"),
            F.max("n").alias("mx"),
        )
        .collect()[0]
    )
    return {
        "n_intervals": int(row["ni"] or 0),
        "n_keys": int(row["nk"] or 0),
        "max_intervals_per_key": int(row["mx"] or 0),
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
    where a gap falls).

    Mega-key escape hatch: the window serializes each key in one task
    (``coalesce_diagnostics``'s ``max_intervals_per_key`` is the
    exposure).  When one key holds ~10^8 intervals, run the sweep
    TWO-LEVEL: first coalesce within ``(keys, coarse time bucket)`` —
    parallel across buckets — then re-run this same sweep on the (far
    fewer) bucket-level spans to merge the ones that cross a bucket
    boundary.  Same algebra (interval union is associative), two bounded
    passes; implemented as ``coalesce_intervals_bucketed``.  Not the
    default because the single pass is cheaper whenever keys are even
    mildly plural."""
    keys = list(partition_cols) if partition_cols is not None else []
    lo, hi = F.col(lo_col).cast("long"), F.col(hi_col).cast("long")
    base = df.filter(hi > lo).select(
        *[F.col(k) for k in keys],
        lo.alias("__lo"),
        hi.alias("__hi"),
    )
    return _coalesce_sweep(base, keys)


def _coalesce_sweep(
    base: DataFrame, group_cols: Sequence[str], weight_col: Optional[str] = None
) -> DataFrame:
    """The shared interval sweep: ``base`` carries ``group_cols`` +
    ``__lo``/``__hi`` (+ optionally ``weight_col`` — the number of
    original intervals each row already represents, for the two-level
    variant).  Returns (group_cols..., span_lo, span_hi, n_merged)."""
    from pyspark.sql import Window

    gcols = [F.col(c) for c in group_cols]
    order = [F.col("__lo").asc(), F.col("__hi").asc()]
    w = (
        Window.partitionBy(*gcols)
        .orderBy(*order)
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
        Window.partitionBy(*gcols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    spans = flagged.withColumn("__span", F.sum("__new_span").over(w_run))
    n_merged = (
        F.sum(weight_col) if weight_col is not None else F.count(F.lit(1))
    )
    return (
        spans.groupBy(*gcols, F.col("__span"))
        .agg(
            F.min("__lo").alias("span_lo"),
            F.max("__hi").alias("span_hi"),
            n_merged.cast("long").alias("n_merged"),
        )
        .drop("__span")
    )


def coalesce_intervals_bucketed(
    df: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    partition_cols: Optional[Sequence[str]] = None,
    bucket_width: Union[int, str] = "auto",
) -> DataFrame:
    """``coalesce_intervals`` for MEGA-KEYS (the escape hatch the plain
    operator's docstring describes, as a real operator): the single-pass
    sweep serializes each key in one window task, so one key holding
    ~10^8 intervals becomes a straggler.  Here the sweep runs TWO-LEVEL:

    1. each interval is assigned to the width-``w`` bucket containing
       its ``lo`` (ONE bucket per row — no explosion), and the sweep
       runs per ``(keys, bucket)`` — parallelism = keys x buckets;
    2. the level-1 spans (pre-counted via ``n_merged``) go through the
       SAME keyed sweep, summing the counts — merging only the spans
       that cross a bucket boundary.

    Identical result to ``coalesce_intervals`` for every input (interval
    union is associative: level-1 spans preserve the union within each
    bucket subset, and sweeping a set of intervals with the same union
    yields the same maximal spans), pinned by the equivalence test.
    Cost: two window passes instead of one — worth it exactly when
    ``coalesce_diagnostics`` shows ``max_intervals_per_key`` in straggler
    territory and level 1 actually collapses (dense keys); on sparse
    keys the level-2 input is as big as the original and the plain sweep
    is cheaper.  ``bucket_width="auto"`` picks the median interval
    length (``choose_bucket_width``)."""
    if bucket_width == "auto":
        bucket_width = _auto_bucket_width(
            [(df, lo_col, hi_col)], op_name="coalesce_intervals_bucketed"
        )
    w_ = int(bucket_width)
    if w_ <= 0:
        raise ValueError("bucket_width must be positive")
    keys = list(partition_cols) if partition_cols is not None else []
    lo, hi = F.col(lo_col).cast("long"), F.col(hi_col).cast("long")
    base = df.filter(hi > lo).select(
        *[F.col(k) for k in keys],
        lo.alias("__lo"),
        hi.alias("__hi"),
    ).withColumn("__bkt", _bucket_start(F.col("__lo"), w_))
    level1 = _coalesce_sweep(base, keys + ["__bkt"]).select(
        *[F.col(k) for k in keys],
        F.col("span_lo").alias("__lo"),
        F.col("span_hi").alias("__hi"),
        F.col("n_merged").alias("__n"),
    )
    return _coalesce_sweep(level1, keys, weight_col="__n")
