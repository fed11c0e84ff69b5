"""Temporal operators — as-of joins (SURVEY.md §2.7 lists as-of among the
join types the reference has no notion of; training-data and event
pipelines need them constantly: "latest feature value as of event time").

``asof_join`` implements the classic union+window plan:

  1. tag left/right rows and union them (no join!),
  2. one window per join key ordered by (ts, side): ``last(right_value,
     ignoreNulls)`` carries the most recent right-side payload forward,
  3. keep left rows whose carried value is non-null (inner semantics).

Cost: ONE shuffle on the join key for both inputs together — the same as a
co-partitioned equi-join, with no range-explosion.  Skewed keys get AQE's
skew handling; at 100 TB this is the standard streaming-feature-join shape
(same plan Flink/KDB-style asof joins lower to).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    how: str = "inner",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``key``.

    Ties (right.ts == left.ts) match, and among equal right timestamps the
    union order is made deterministic by sorting (ts, side) with the right
    side first at equal ts.

    ``tolerance`` (same unit as the ts columns — epoch-nanos under the
    engine contract) bounds how stale a match may be, pandas
    ``merge_asof``-style: a carried right row with
    ``left.ts - right.ts > tolerance`` is treated as NO match (row
    dropped under ``how='inner'``, right columns nulled under
    ``how='left'``).  The bound is applied AFTER the single union+window
    pass, so it adds zero shuffles.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_ts)]

    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ats", F.col(left_ts))
    rhs = right.select(
        F.col(key),
        F.col(right_ts).alias("__ats"),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    # unionByName null-fills each side's missing columns
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ats").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__c_{c}")
            for c in right_cols
        ],
        F.last(F.col("__r_ts"), ignorenulls=True).over(w).alias("__c_ts"),
    )
    out = carried.filter(F.col("__side") == 1)
    matched = F.col("__c_ts").isNotNull()
    if tolerance is not None:
        matched = matched & (
            (F.col("__ats") - F.col("__c_ts")) <= F.lit(tolerance)
        )
    if how == "inner":
        out = out.filter(matched)
    elif how != "left":
        raise ValueError(f"asof_join supports 'inner' or 'left', got {how!r}")
    keep = [c for c in left.columns]
    proj = [F.col(c) for c in keep]
    if how == "left" and tolerance is not None:
        proj += [
            F.when(matched, F.col(f"__c_{c}")).alias(f"r_{c}")
            for c in right_cols
        ]
        proj.append(F.when(matched, F.col("__c_ts")).alias("r_ts"))
    else:
        proj += [F.col(f"__c_{c}").alias(f"r_{c}") for c in right_cols]
        proj.append(F.col("__c_ts").alias("r_ts"))
    return out.select(*proj)


def ewma(
    df: DataFrame,
    alpha: float = 0.3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key exponentially weighted moving average — the ordered-fold
    RECURRENCE s_t = a*x_t + (1-a)*s_{t-1} (s_0 = first observation)
    that a window aggregate cannot express (each step depends on the
    previous step's OUTPUT, not on a frame of inputs).

    Expressed as a higher-order array fold (the MinHash pattern): one
    groupBy collects each key's (ts, tiebreak, value-micro) structs,
    ``sort_array`` pins the event order, ``aggregate`` folds the exact
    integer recurrence

        s' = trunc_div(a_u * x_u + (1e6 - a_u) * s, 1e6)

    with truncation-toward-zero made EXPLICIT via a sign split (Spark
    ``DIV`` truncates; DuckDB ``//`` floors on negatives — the CASE keeps
    both engines on nonnegative operands, where they agree), so the
    whole series is bit-identical on any engine.  At scale this is one
    shuffle on the key and a per-row fold — state per key is one long.

    Output: (key, n_events, ewma) with ewma = s_final / 1e6.
    """
    a_u = int(round(alpha * 1_000_000))
    b_u = 1_000_000 - a_u
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(tiebreak_col).alias("i"),
                F.round(F.round(F.col(value_col), 6) * 1_000_000, 0)
                .cast("long")
                .alias("x"),
            )
        )
    )
    step = (
        f"CASE WHEN ({a_u}L * e.x + {b_u}L * s) >= 0 "
        f"THEN ({a_u}L * e.x + {b_u}L * s) DIV 1000000 "
        f"ELSE -((-({a_u}L * e.x + {b_u}L * s)) DIV 1000000) END"
    )
    # element_at is 1-based like slice; bracket indexing would be 0-based
    # (Spark's one inconsistency here) and silently seed the fold with the
    # SECOND observation
    fold = F.expr(
        f"aggregate(slice(__arr, 2, size(__arr) - 1), "
        f"element_at(__arr, 1).x, (s, e) -> {step})"
    )
    return (
        df.groupBy(key_col)
        .agg(arr.alias("__arr"))
        .select(
            key_col,
            F.size("__arr").alias("n_events"),
            (fold.cast("double") / F.lit(1_000_000.0)).alias("ewma"),
        )
    )


def ohlc_bars(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    key_col: str,
    id_col: str,
    bucket_ns: int = 3_600_000_000_000,
) -> DataFrame:
    """OHLC candlestick bars per (key, time bucket): open / high / low /
    close / n_obs — the time-series downsampling staple (market bars,
    metric rollups, sensor summarization).  ``ts_col`` is the engine's
    int64 epoch-nanos contract; buckets are FLOOR(ts / bucket_ns) —
    floor, not truncate-toward-zero: Spark's integer ``div`` truncates
    while DuckDB's ``//`` floors, so pre-epoch (negative) timestamps
    would land in different buckets per engine and ts in
    (-bucket_ns, bucket_ns) would collapse into one bucket 0 (ADVICE
    r8).  Floor is synthesized from div with a remainder-sign correction
    — pure int64 arithmetic, engine-portable.

    Open and close need a DETERMINISTIC first/last: rows are ordered by
    the total key ``(ts, id)`` (ids unique), and open/close are
    extracted via min/max over the struct ``(ts, id, value)`` — a pure
    aggregate, lexicographic on a total order, so both engines pick the
    identical row with NO window pass.  High/low/n are plain min/max/
    count.  ONE combiner-reduced shuffle: each map partition collapses
    to one candidate struct per (key, bucket) before the exchange — a
    hot key's bars arrive pre-combined, the same skew armor as every
    aggregate in this engine.  Values pass through untouched (no
    arithmetic), so the bars are engine-exact trivially."""
    bns = int(bucket_ns)
    if bns <= 0:
        raise ValueError(f"bucket_ns must be positive, got {bucket_ns}")
    b = df.select(
        F.col(key_col).alias("__key"),
        F.expr(
            f"({ts_col} div {bns}) - "
            f"(CASE WHEN {ts_col} % {bns} < 0 THEN 1 ELSE 0 END)"
        ).alias("__bucket"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(value_col).alias("__v"),
    )
    s = F.struct(
        F.col("__ts").alias("t"), F.col("__id").alias("e"), F.col("__v").alias("v")
    )
    return (
        b.groupBy("__key", "__bucket")
        .agg(
            F.min(s).getField("v").alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max(s).getField("v").alias("close"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .select(
            F.col("__key").alias(key_col),
            F.expr(
                f"(__bucket * {bns}L div 1000000000L) - (CASE WHEN "
                f"__bucket * {bns}L % 1000000000L < 0 THEN 1 ELSE 0 END)"
            )
            .cast("long")
            .alias("bucket_epoch"),
            "open",
            "high",
            "low",
            "close",
            "n_obs",
        )
    )
