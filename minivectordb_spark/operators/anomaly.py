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
    n_ = F.col("__n").cast(_D)
    s_ = F.col("__s").cast(_D)
    q_ = F.col("__q").cast(_D)
    x_ = F.col("__v").cast(_D)
    dev = n_ * x_ - s_
    lhs = dev * dev
    rhs = F.lit(z * z).cast(_D) * (n_ * q_ - s_ * s_)
    return (
        j.filter((F.col("__n") >= F.lit(min_n)) & (lhs > rhs))
        .select(
            *[F.col(c) for c in id_cols],
            F.col("__key").alias(key_col),
            F.col("__v").alias("value_scaled"),
            F.when(dev > F.lit(0), F.lit("high"))
            .otherwise(F.lit("low"))
            .alias("side"),
        )
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
