"""Exact-integer anomaly detection over keyed event streams.

The monitoring staple: flag rows whose value sits more than ``z``
population standard deviations from their key's mean.  The naive
formulation (``abs(x - avg) > z * stddev``) runs through float division
and a square root — both engine-divergent at round boundaries.  Here the
test is algebraically cleared of both:

    |x - mu| > z * sigma
      <=>  (n*x - S)^2 > z^2 * (n*Q - S^2)

with ``S = sum(v)``, ``Q = sum(v^2)`` over integer-scaled values
``v = floor(value * scale)`` — every quantity an exact integer, so the
flag decision is bit-identical on any engine at any scale (no float is
ever formed).  ``floor`` (not cast) makes the scaling itself
engine-portable: DuckDB rounds on DOUBLE->BIGINT casts while Spark
truncates, but both floor identically.

Scale design: one combiner-reduced groupBy on the key builds the
3-number-per-key stats table (tiny for any realistic key cardinality —
it is broadcast back), then a map-only flagging pass.  At 100 TB this is
one scan + one broadcast join; the only shuffle carries |keys| rows.
Magnitudes: all intermediates are DECIMAL(38,0); exact while
``(n * max|v|)^2 < 1e38`` — e.g. 1e9 rows per key at |v| <= 1e9.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

_D = "decimal(38,0)"


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    key_col: str,
    id_cols: Sequence[str],
    z: int = 2,
    min_n: int = 5,
    scale: int = 100,
) -> DataFrame:
    """Rows whose scaled value deviates from their key's mean by more than
    ``z`` population standard deviations (strict inequality, exact
    integer arithmetic — see module doc).  Keys with fewer than
    ``min_n`` rows are never flagged (degenerate variance).  Returns
    ``(*id_cols, key_col, value_scaled, side)`` with ``side`` in
    {'high', 'low'}.  ``z`` is an integer so ``z^2`` stays exact.
    """
    if not id_cols:
        raise ValueError("id_cols must be non-empty")
    v = F.floor(F.col(value_col) * F.lit(scale)).cast("long")
    base = df.select(
        *[F.col(c) for c in id_cols],
        F.col(key_col).alias("__key"),
        v.alias("__v"),
    )
    stats = base.groupBy("__key").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__v").cast(_D)).alias("__s"),
        F.sum((F.col("__v").cast(_D) * F.col("__v").cast(_D))).alias("__q"),
    )
    j = base.join(F.broadcast(stats), "__key")
    is_out, side = _outlier_exprs(z, min_n)
    return (
        j.filter(is_out)
        .select(
            *[F.col(c) for c in id_cols],
            F.col("__key").alias(key_col),
            F.col("__v").alias("value_scaled"),
            side.alias("side"),
        )
    )


def _outlier_exprs(z: int, min_n: int):
    """The shared flag decision over the canonical (__v, __n, __s, __q)
    columns — one definition for the self-fit batch pass AND the
    frozen-stats deployment path (zscore_flag / the streaming gate), so
    the two can never drift.

    Overflow is LOUD, not silent: in non-ANSI Spark a DECIMAL(38,0)
    product past 1e38 nulls out, which would silently un-flag rows the
    exactness contract says are outliers (DuckDB's HUGEINT keeps going
    to ~1.7e38).  Each product is therefore wrapped so that a null
    result from non-null operands raises at execution time instead of
    propagating."""
    n_ = F.col("__n").cast(_D)
    s_ = F.col("__s").cast(_D)
    q_ = F.col("__q").cast(_D)
    x_ = F.col("__v").cast(_D)
    inputs_ok = (
        n_.isNotNull() & s_.isNotNull() & q_.isNotNull() & x_.isNotNull()
    )
    dev = n_ * x_ - s_
    lhs = _checked_overflow(dev * dev, inputs_ok, "(n*x - S)^2")
    rhs = _checked_overflow(
        F.lit(z * z).cast(_D) * (n_ * q_ - s_ * s_),
        inputs_ok,
        "z^2 * (n*Q - S^2)",
    )
    is_out = (F.col("__n") >= F.lit(min_n)) & (lhs > rhs)
    side = F.when(dev > F.lit(0), F.lit("high")).otherwise(F.lit("low"))
    return is_out, side


def _checked_overflow(product, inputs_ok, what: str):
    """DECIMAL(38,0) product with a runtime overflow trap: non-null
    operands that yield a null product mean the arithmetic left the
    exactness envelope ((n*max|v|)^2 < 1e38, the bound
    ``zscore_diagnostics`` measures) — raise rather than let
    null-propagation silently un-flag the row."""
    return F.when(
        inputs_ok & product.isNull(),
        F.raise_error(
            F.lit(
                f"zscore overflow: {what} exceeded DECIMAL(38,0) — "
                "(n*max|v|)^2 >= 1e38; lower `scale` or shard the key "
                "(see zscore_diagnostics for the measured bound)"
            )
        ).cast(_D),
    ).otherwise(product)


def frozen_key_stats(
    df: DataFrame,
    value_col: str,
    key_col: str,
    scale: int = 100,
) -> list[tuple]:
    """Fit the per-key ``(key, n, S, Q)`` stats table and collect it —
    |keys| rows, the deployable "model" a streaming anomaly gate freezes
    at wiring time (the quality gate's frozen-classifier pattern).  The
    collect is key-cardinality-bounded, never the row stream.

    Keys are cast to STRING here, mirroring ``zscore_flag``'s probe-side
    cast, so a non-string ``key_col`` round-trips through the frozen
    table identically in both deployment modes (the stats schema is
    pinned at ``__key string``)."""
    v = F.floor(F.col(value_col) * F.lit(scale)).cast("long")
    rows = (
        df.select(F.col(key_col).cast("string").alias("__key"), v.alias("__v"))
        .groupBy("__key")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("__v").cast(_D)).alias("__s"),
            F.sum(F.col("__v").cast(_D) * F.col("__v").cast(_D)).alias("__q"),
        )
        .collect()
    )
    return [
        (r["__key"], int(r["__n"]), int(r["__s"]), int(r["__q"])) for r in rows
    ]


def zscore_flag(
    df: DataFrame,
    stats: list[tuple],
    value_col: str,
    key_col: str,
    z: int = 2,
    min_n: int = 5,
    scale: int = 100,
) -> DataFrame:
    """Flag every row against a FROZEN stats table (from
    ``frozen_key_stats``): returns the input columns plus
    ``(value_scaled, is_outlier, side)``.  Keys absent from the frozen
    table are never flagged (left join; unseen-key rows pass).  Shares
    ``_outlier_exprs`` with the self-fit batch pass — the decision
    cannot drift between deployment modes.  Map-only: the stats frame is
    |keys| rows, broadcast."""
    from decimal import Decimal

    spark = df.sparkSession
    stats_df = spark.createDataFrame(
        [(k, n, Decimal(s), Decimal(q)) for k, n, s, q in stats],
        "__key string, __n long, __s decimal(38,0), __q decimal(38,0)",
    )
    v = F.floor(F.col(value_col) * F.lit(scale)).cast("long")
    base = df.withColumn("__v", v).withColumn(
        "__key", F.col(key_col).cast("string")
    )
    j = base.join(F.broadcast(stats_df), "__key", "left")
    is_out, side = _outlier_exprs(z, min_n)
    flagged = F.coalesce(is_out, F.lit(False))
    return (
        j.withColumn("is_outlier", flagged)
        .withColumn(
            "side", F.when(flagged, side).otherwise(F.lit(None).cast("string"))
        )
        .withColumnRenamed("__v", "value_scaled")
        .drop("__key", "__n", "__s", "__q")
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    key_col: str,
    id_cols: Sequence[str],
    z: int = 3,
    min_n: int = 5,
    scale: int = 100,
) -> DataFrame:
    """Robust keyed outliers via Median Absolute Deviation: flag rows with
    ``|v - median| > z * MAD`` where ``MAD = median(|v - median|)`` —
    the robust companion to ``zscore_outliers`` (a z-test's mean and
    variance are themselves dragged by the outliers being hunted; the
    median/MAD pair has a 50% breakdown point — Hampel's classic
    recommendation).  Returns ``(*id_cols, key_col, value_scaled, dev,
    side)``.

    Engine-exactness is stronger than the z-score's: values are integer
    cents (``floor(value*scale)``), the median is the LOWER median — the
    ((n+1) div 2)-th order statistic, a VALUE that is well-defined no
    matter how an engine breaks sort ties — and the flag inequality is
    pure integer comparison.  No float, no product, no overflow envelope
    at all (|dev| <= 2*max|v|).  Degenerate gates: keys with fewer than
    ``min_n`` rows or ``MAD == 0`` (no spread) never flag.

    Plan: exact medians need a per-key sort — TWO keyed window shuffles
    (order statistic of v, then of |v - med|), each combiner-free but
    moving only (key, value) pairs; both median tables are |keys| rows
    and broadcast back, so flagging itself is map-only.  That second
    pass is the honest price of the robust estimator vs the z-score's
    single aggregate; at 100 TB both windows partition on the same key,
    so AQE coalesces them into the same exchange layout."""
    from pyspark.sql import Window

    if not id_cols:
        raise ValueError("id_cols must be non-empty")
    v = F.floor(F.col(value_col) * F.lit(scale)).cast("long")
    base = df.select(
        *[F.col(c) for c in id_cols],
        F.col(key_col).alias("__key"),
        v.alias("__v"),
    )
    w = Window.partitionBy("__key").orderBy("__v")
    wc = Window.partitionBy("__key")
    meds = (
        base.select(
            "__key",
            "__v",
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(wc).alias("__n"),
        )
        .filter(F.col("__rn") == F.expr("(__n + 1) div 2"))
        .select("__key", F.col("__v").alias("__med"), "__n")
    )
    devs = base.join(F.broadcast(meds), "__key").withColumn(
        "__dev", F.abs(F.col("__v") - F.col("__med"))
    )
    wd = Window.partitionBy("__key").orderBy("__dev")
    mads = (
        devs.select(
            "__key",
            "__dev",
            "__n",
            F.row_number().over(wd).alias("__rn"),
        )
        .filter(F.col("__rn") == F.expr("(__n + 1) div 2"))
        .select("__key", F.col("__dev").alias("__mad"))
    )
    is_out, side = _mad_exprs(z, min_n)
    out = devs.join(F.broadcast(mads), "__key").filter(is_out)
    return out.select(
        *[F.col(c) for c in id_cols],
        F.col("__key").alias(key_col),
        F.col("__v").alias("value_scaled"),
        F.col("__dev").alias("dev"),
        side.alias("side"),
    )


def _mad_exprs(z: int, min_n: int):
    """The shared MAD flag decision over canonical (__v, __med, __mad,
    __n, __dev) columns — one definition for the self-fit batch pass AND
    the frozen-stats deployment (``mad_flag``), so the two cannot drift
    (the zscore ``_outlier_exprs`` discipline).  Pure integer compares:
    no float, no overflow envelope."""
    is_out = (
        (F.col("__n") >= F.lit(min_n))
        & (F.col("__mad") > F.lit(0))
        & (F.col("__dev") > F.lit(z) * F.col("__mad"))
    )
    side = (
        F.when(F.col("__v") > F.col("__med"), F.lit("high"))
        .otherwise(F.lit("low"))
    )
    return is_out, side


def frozen_mad_stats(
    df: DataFrame,
    value_col: str,
    key_col: str,
    scale: int = 100,
) -> list[tuple]:
    """Fit the per-key ``(key, median, mad, n)`` table and collect it —
    the robust twin of ``frozen_key_stats``, the deployable model a
    monitoring gate freezes at wiring time.  Keys cast to STRING
    (matching ``mad_flag``'s probe-side cast).  The collect is
    key-cardinality-bounded."""
    from pyspark.sql import Window

    v = F.floor(F.col(value_col) * F.lit(scale)).cast("long")
    base = df.select(
        F.col(key_col).cast("string").alias("__key"), v.alias("__v")
    )
    w = Window.partitionBy("__key").orderBy("__v")
    wc = Window.partitionBy("__key")
    meds = (
        base.select(
            "__key",
            "__v",
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(wc).alias("__n"),
        )
        .filter(F.col("__rn") == F.expr("(__n + 1) div 2"))
        .select("__key", F.col("__v").alias("__med"), "__n")
    )
    devs = base.join(F.broadcast(meds), "__key").withColumn(
        "__dev", F.abs(F.col("__v") - F.col("__med"))
    )
    wd = Window.partitionBy("__key").orderBy("__dev")
    rows = (
        devs.select(
            "__key", "__med", "__n", "__dev",
            F.row_number().over(wd).alias("__rn"),
        )
        .filter(F.col("__rn") == F.expr("(__n + 1) div 2"))
        .select("__key", "__med", F.col("__dev").alias("__mad"), "__n")
        .collect()
    )
    return [
        (r["__key"], int(r["__med"]), int(r["__mad"]), int(r["__n"]))
        for r in rows
    ]


def mad_flag(
    df: DataFrame,
    stats: list[tuple],
    value_col: str,
    key_col: str,
    z: int = 3,
    min_n: int = 5,
    scale: int = 100,
) -> DataFrame:
    """Flag every row against a FROZEN MAD table (from
    ``frozen_mad_stats``): input columns plus ``(value_scaled,
    is_outlier, side)``; unseen keys pass (left join).  Shares
    ``_mad_exprs`` with the self-fit pass — deployment modes cannot
    drift.  Map-only: the stats frame is |keys| rows, broadcast."""
    spark = df.sparkSession
    stats_df = spark.createDataFrame(
        [(k, int(m), int(d), int(n)) for k, m, d, n in stats],
        "__key string, __med long, __mad long, __n long",
    )
    v = F.floor(F.col(value_col) * F.lit(scale)).cast("long")
    base = df.withColumn("__v", v).withColumn(
        "__key", F.col(key_col).cast("string")
    )
    j = base.join(F.broadcast(stats_df), "__key", "left").withColumn(
        "__dev", F.abs(F.col("__v") - F.col("__med"))
    )
    is_out, side = _mad_exprs(z, min_n)
    flagged = F.coalesce(is_out, F.lit(False))
    return (
        j.withColumn("is_outlier", flagged)
        .withColumn(
            "side",
            F.when(flagged, side).otherwise(F.lit(None).cast("string")),
        )
        .withColumnRenamed("__v", "value_scaled")
        .drop("__key", "__med", "__mad", "__n", "__dev")
    )


def zscore_diagnostics(
    df: DataFrame,
    value_col: str,
    key_col: str,
    scale: int = 100,
) -> dict:
    """Falsifiable scale counters for the outlier pass: per-key row counts
    and the max ``|n * max|v||`` product that bounds the DECIMAL(38,0)
    exactness contract.  Constant-size aggregate — never the row stream.
    """
    v = F.floor(F.col(value_col) * F.lit(scale)).cast("long")
    row = (
        df.select(F.col(key_col).alias("__key"), v.alias("__v"))
        .groupBy("__key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.abs(F.col("__v"))).alias("mx"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.max("n").alias("max_key_n"),
            F.max(F.col("n").cast(_D) * F.col("mx").cast(_D)).alias("max_nv"),
        )
        .collect()[0]
    )
    return {
        "n_keys": int(row["n_keys"]),
        "max_key_n": int(row["max_key_n"] or 0),
        "max_n_times_maxv": int(row["max_nv"] or 0),
    }


def winsorize(
    df: DataFrame,
    value_col: str,
    key_col: str,
    id_cols: Sequence[str],
    p_lo_pct: int = 5,
    p_hi_pct: int = 95,
    scale: int = 100,
) -> DataFrame:
    """Per-key winsorization: clip each value to its key's exact
    [p_lo, p_hi] percentile band — the outlier-TAMING companion to the
    flagging operators (training pipelines clip reward/quality/length
    signals rather than drop rows; Tukey's classic robustification).
    Returns ``(*id_cols, key_col, value_scaled, value_clipped)`` for
    every input row.

    Exactness: the bound is the ``ceil(p*n/100)``-th smallest scaled
    value — an order STATISTIC, not an interpolated quantile, so it is
    a value from the data and engine-portable regardless of sort-tie
    order (the mad_outliers discipline); ``ceil`` is integer
    ``(p*n + 99) div 100``, clamped to >= 1.  No floats anywhere.

    Plan: ONE keyed window pass (row_number + count) — the same
    exchange serves both bounds; the bounds table is |keys| rows,
    broadcast back; clipping is map-only ``least(greatest(v, lo),
    hi)``."""
    from pyspark.sql import Window

    if not id_cols:
        raise ValueError("id_cols must be non-empty")
    if not (0 <= p_lo_pct <= p_hi_pct <= 100):
        raise ValueError("need 0 <= p_lo_pct <= p_hi_pct <= 100")
    v = F.floor(F.col(value_col) * F.lit(scale)).cast("long")
    base = df.select(
        *[F.col(c) for c in id_cols],
        F.col(key_col).alias("__key"),
        v.alias("__v"),
    )
    w = Window.partitionBy("__key").orderBy("__v")
    wc = Window.partitionBy("__key")
    ranked = base.select(
        "__key",
        "__v",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wc).alias("__n"),
    )
    k_lo = F.expr(f"greatest(({p_lo_pct} * __n + 99) div 100, 1)")
    k_hi = F.expr(f"greatest(({p_hi_pct} * __n + 99) div 100, 1)")
    bounds = (
        ranked.withColumn("__klo", k_lo)
        .withColumn("__khi", k_hi)
        .filter((F.col("__rn") == F.col("__klo")) | (F.col("__rn") == F.col("__khi")))
        .groupBy("__key")
        .agg(
            F.max(F.when(F.col("__rn") == F.col("__klo"), F.col("__v"))).alias("__lo"),
            F.max(F.when(F.col("__rn") == F.col("__khi"), F.col("__v"))).alias("__hi"),
        )
    )
    return (
        base.join(F.broadcast(bounds), "__key")
        .select(
            *[F.col(c) for c in id_cols],
            F.col("__key").alias(key_col),
            F.col("__v").alias("value_scaled"),
            F.least(F.greatest(F.col("__v"), F.col("__lo")), F.col("__hi")).alias(
                "value_clipped"
            ),
        )
    )


def value_histogram(
    df: DataFrame,
    value_col: str,
    key_col: str,
    n_bins: int = 10,
    scale: int = 100,
) -> DataFrame:
    """Per-key equi-width histogram over integer cents — the
    observability companion to the profiler (distribution shape per
    event type / source / feature, the input a drift monitor compares
    run-over-run).  Returns ``(key_col, bin, bin_lo, bin_hi, n)`` for
    NON-EMPTY bins; ``bin = (v - min) div width`` with ``width =
    ceil((max - min + 1) / n_bins)`` — all integer arithmetic on
    nonnegative operands, so bin edges are bit-identical on any engine
    (float-width histograms put boundary values in different bins per
    engine's rounding).  Degenerate key (min == max): width 1, one bin.

    Plan: one combiner-reduced per-key min/max aggregate (|keys| rows,
    broadcast back), then the binning groupBy — also combiner-reduced,
    keyed on (key, bin) so a hot key's rows pre-combine map-side into at
    most ``n_bins`` partials per partition."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    v = F.floor(F.col(value_col) * F.lit(scale)).cast("long")
    base = df.select(F.col(key_col).alias("__key"), v.alias("__v"))
    rng = base.groupBy("__key").agg(
        F.min("__v").alias("__lo"), F.max("__v").alias("__hi")
    )
    j = base.join(F.broadcast(rng), "__key")
    # width = ceil((hi - lo + 1) / n_bins), integer; bin = (v - lo) div width
    binned = j.select(
        "__key",
        "__lo",
        F.expr(f"(__hi - __lo + {n_bins}) div {n_bins}").alias("__w"),
        F.expr(
            f"(__v - __lo) div ((__hi - __lo + {n_bins}) div {n_bins})"
        ).alias("__bin"),
    )
    return (
        binned.groupBy("__key", "__bin", "__lo", "__w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("__key").alias(key_col),
            F.col("__bin").cast("long").alias("bin"),
            (F.col("__lo") + F.col("__bin") * F.col("__w")).alias("bin_lo"),
            (F.col("__lo") + (F.col("__bin") + 1) * F.col("__w") - 1).alias(
                "bin_hi"
            ),
            "n",
        )
    )


def distribution_drift(
    df: DataFrame,
    value_col: str,
    group_col: str,
    bucket_width: int,
    scale: int = 1,
) -> DataFrame:
    """Per-group distribution drift vs the whole corpus (r11): the
    total-variation distance between each group's value distribution and
    the global one, over fixed-width integer buckets —
    ``TV(g) = 0.5 * sum_b |p_gb - q_b|`` in [0, 1].  The monitoring
    question a training-data pipeline asks per ingest source / per
    snapshot: "does this slice's shape still look like the corpus?"
    (the histogram operator shows the shapes; this scores the gap).

    Engine-portable by construction: proportions are frozen to EXACT
    integer parts-per-million (``cnt * 1_000_000 div n`` — floor
    division, identical on any engine), so ``tv_ppm`` never rides a
    float rounding boundary; values are scaled to integers first like
    the z-score family.  Output: ``(group_col, n, tv_ppm)`` with
    ``tv_ppm = sum_b |p_ppm - q_ppm| div 2`` (0 = identical shape,
    1_000_000 = disjoint support).

    Plan: ONE corpus pass — the combiner-reduced (group, bucket) count —
    then group totals, bucket totals and the corpus total all derive
    from that aggregate (|groups| x |buckets| rows), so the source is
    scanned exactly once; the scoring join runs on the GROUPS x BUCKETS
    grid only (a cross join of two aggregate dims, bounded by their
    product, never row-scale; the grid is needed so a bucket the group
    MISSES still contributes |0 - q_b|), one broadcast of the one-row
    corpus total, and one final per-group sum."""
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    PPM = 1_000_000
    v = F.floor(F.col(value_col) * F.lit(scale)).cast("long")
    base = df.select(
        F.col(group_col).alias("__g"),
        (v - (v % F.lit(bucket_width))).alias("__b"),
    )
    from minivectordb_spark.operators.dedup import _reused

    gb = _reused(
        base.groupBy("__g", "__b").agg(F.count(F.lit(1)).alias("__cgb"))
    )
    g = gb.groupBy("__g").agg(F.sum("__cgb").alias("__ng"))
    b = gb.groupBy("__b").agg(F.sum("__cgb").alias("__cb"))
    total = b.agg(F.sum("__cb").alias("__n"))
    grid = (
        g.crossJoin(b)  # dims: |groups| x |buckets| rows, by construction
        .join(gb, ["__g", "__b"], "left")
        .crossJoin(F.broadcast(total))
        .select(
            "__g",
            "__ng",
            (
                F.coalesce(F.col("__cgb"), F.lit(0)) * F.lit(PPM)
            ).alias("__pn"),
            (F.col("__cb") * F.lit(PPM)).alias("__qn"),
            "__n",
        )
    )
    scored = grid.select(
        "__g",
        "__ng",
        F.abs(F.expr("__pn div __ng - __qn div __n")).alias("__t"),
    )
    return (
        scored.groupBy("__g", "__ng")
        .agg(F.expr("sum(__t) div 2").alias("tv_ppm"))
        .select(
            F.col("__g").alias(group_col),
            F.col("__ng").alias("n"),
            F.col("tv_ppm"),
        )
    )


def distribution_shift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    bucket_width: int,
    scale: int = 1,
) -> DataFrame:
    """Snapshot-over-snapshot drift (r11): ONE ROW with the
    total-variation distance between two frames' value distributions —
    the companion to ``distribution_drift`` (group vs corpus within one
    frame) for the other monitoring question: "does TODAY's ingest look
    like yesterday's?" / "does slice A look like slice B?".

    Same exact-integer discipline: values scale to integers, buckets
    are fixed-width, proportions freeze to floor-divided ppm, so
    ``tv_ppm`` (0 = identical shape, 1_000_000 = disjoint support) is
    bit-identical on any engine.  Output: ``(n_a, n_b, tv_ppm)``.

    Plan: one combiner-reduced bucket count per side (each side's only
    scan), a FULL outer join of the two bucket dims (a bucket one side
    misses still contributes its whole ppm mass), two one-row totals
    broadcast in, and a final global sum over |buckets| rows."""
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    PPM = 1_000_000

    def counts(df: DataFrame, cnt: str) -> DataFrame:
        v = F.floor(F.col(value_col) * F.lit(scale)).cast("long")
        return (
            df.select((v - (v % F.lit(bucket_width))).alias("__b"))
            .groupBy("__b")
            .agg(F.count(F.lit(1)).alias(cnt))
        )

    a = counts(df_a, "__ca")
    b = counts(df_b, "__cb")
    na = a.agg(F.coalesce(F.sum("__ca"), F.lit(0)).alias("__na"))
    nb = b.agg(F.coalesce(F.sum("__cb"), F.lit(0)).alias("__nb"))
    grid = (
        a.join(b, "__b", "full")
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "__na",
            "__nb",
            F.abs(
                F.expr(f"coalesce(__ca, 0) * {PPM} div greatest(__na, 1)")
                - F.expr(f"coalesce(__cb, 0) * {PPM} div greatest(__nb, 1)")
            ).alias("__t"),
        )
    )
    return grid.groupBy("__na", "__nb").agg(
        F.expr("sum(__t) div 2").alias("tv_ppm")
    ).select(
        F.col("__na").alias("n_a"),
        F.col("__nb").alias("n_b"),
        F.col("tv_ppm"),
    )
