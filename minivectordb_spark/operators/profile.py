"""Single-pass table profiler — the ``ANALYZE`` / dataset-card shape.

Per column: non-null count, exact distinct count, min/max (numerics
native, timestamps as epoch microseconds, strings verbatim), and the
exact 6-decimal average string length.  The whole profile is ONE aggregate over
ONE scan: every per-column statistic is an expression in a single
``agg`` (Spark plans the multi-column distinct counts with a single
Expand + partial aggregate — still one pass over the data, with map-side
reduction before any shuffle), and the one-row result is unpivoted with
``stack`` into the long (column, stat...) form.  A naive profiler runs
one scan per column; at 100 TB that difference is the whole game.

For very wide tables the exact distinct Expand multiplies map-side rows
by the column count; ``exact_distinct=False`` switches to
``approx_count_distinct`` (HLL++, one pass, no Expand) at the cost of the
oracle bit-match — the default stays exact because the driver gate
hash-compares values.

Engine-exactness: numeric min/max are emitted as DOUBLE of the native
value — no arithmetic touches them (a stored double is returned
verbatim; an integer upcasts by the IEEE round-to-nearest rule both
engines share, exact up to 2^53), timestamps surface as epoch
microseconds, and the average length uses the exact-rational rounding of
``operators/text._exact_avg_micros``.  An earlier integer-micro scaling
(value * 1e6 as BIGINT) overflowed int64 on epoch-nano columns — the
native-value contract has no such cliff.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ByteType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

from minivectordb_spark.operators.text import _exact_avg_micros

_INT_TYPES = (ByteType, ShortType, IntegerType, LongType)
_FLOAT_TYPES = (FloatType, DoubleType)


def profile_table(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``columns`` (default: all supported columns) of ``df``.

    Returns one row per column::

        column        string
        n_rows        long   -- table row count (repeated per row)
        n_nonnull     long
        n_distinct    long   -- exact (or HLL++ if exact_distinct=False)
        min_num       double -- numeric cols: native value; timestamps: epoch us; else null
        max_num       double
        min_str       string -- string cols: min value; else null
        max_str       string
        avg_len       double -- string cols: exact 6dp avg length; else null
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [
            n
            for n, t in fields.items()
            if isinstance(
                t,
                _INT_TYPES
                + _FLOAT_TYPES
                + (StringType, TimestampType, TimestampNTZType, DateType),
            )
        ]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        t = fields[c]
        q = f"`{c}`"
        aggs.append(F.count(q).alias(f"__nn_{c}"))
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
        if isinstance(t, _INT_TYPES + _FLOAT_TYPES):
            lo, hi = f"CAST(min({q}) AS DOUBLE)", f"CAST(max({q}) AS DOUBLE)"
        elif isinstance(t, (TimestampType, TimestampNTZType)):
            # NTZ casts through the session timezone; the engine pins it
            # to UTC (session.py:37) so this equals DuckDB's epoch_us on
            # the same naive timestamp.
            lo = f"CAST(unix_micros(CAST(min({q}) AS TIMESTAMP)) AS DOUBLE)"
            hi = f"CAST(unix_micros(CAST(max({q}) AS TIMESTAMP)) AS DOUBLE)"
        elif isinstance(t, DateType):
            lo = f"CAST(datediff(min({q}), DATE '1970-01-01') AS DOUBLE) * 86400000000"
            hi = f"CAST(datediff(max({q}), DATE '1970-01-01') AS DOUBLE) * 86400000000"
        else:
            lo = hi = "CAST(NULL AS DOUBLE)"
        aggs.append(F.expr(lo).alias(f"__lo_{c}"))
        aggs.append(F.expr(hi).alias(f"__hi_{c}"))
        if isinstance(t, StringType):
            aggs.append(F.expr(f"min({q})").alias(f"__smin_{c}"))
            aggs.append(F.expr(f"max({q})").alias(f"__smax_{c}"))
            aggs.append(
                F.sum(F.length(q).cast("long")).alias(f"__lsum_{c}")
            )
        else:
            aggs.append(F.expr("CAST(NULL AS STRING)").alias(f"__smin_{c}"))
            aggs.append(F.expr("CAST(NULL AS STRING)").alias(f"__smax_{c}"))
            aggs.append(F.expr("CAST(NULL AS BIGINT)").alias(f"__lsum_{c}"))
    one = df.agg(*aggs)
    # exact-rational avg length on the one-row frame (null-safe: string
    # cols with zero non-null rows keep avg_len null via the nn guard)
    proj = [F.col("__n")]
    for c in columns:
        t = fields[c]
        if isinstance(t, StringType):
            proj.append(
                F.when(
                    F.col(f"__nn_{c}") > 0,
                    _exact_avg_micros(f"__lsum_{c}", f"__nn_{c}"),
                ).alias(f"__alen_{c}")
            )
        else:
            proj.append(F.expr("CAST(NULL AS DOUBLE)").alias(f"__alen_{c}"))
        for p in ("__nn_", "__nd_", "__lo_", "__hi_", "__smin_", "__smax_"):
            proj.append(F.col(f"{p}{c}"))
    one = one.select(*proj)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __lo_{c}, __hi_{c}, __smin_{c}, __smax_{c}, __alen_{c}"
        for c in columns
    )
    return one.selectExpr(
        "__n AS n_rows",
        f"stack({len(columns)}, {stack_args}) AS "
        "(column, n_nonnull, n_distinct, min_num, max_num, min_str, max_str, avg_len)",
    ).select(
        "column",
        "n_rows",
        "n_nonnull",
        "n_distinct",
        "min_num",
        "max_num",
        "min_str",
        "max_str",
        "avg_len",
    )
