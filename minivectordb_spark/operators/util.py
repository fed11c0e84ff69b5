"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def materialize(df: DataFrame, expr: Column, name: str, keep: list[str]) -> DataFrame:
    """Materialize ``expr`` as a real column behind a Generate node.

    Two Catalyst behaviors make expensive per-row expressions (higher-order
    functions, nested element_at over computed arrays) silently recompute:
    (1) HOFs run outside whole-stage codegen, so subexpression elimination
    never sees them; (2) CollapseProject inlines a projected expression into
    every downstream use — and ``element_at(<expr>, i)`` inside a lambda
    re-evaluates ``<expr>`` per element.  ``explode(array(expr))`` is
    row-preserving but introduces a Generate node that CollapseProject will
    not cross, so the expression is evaluated exactly once per row and
    consumers read a cheap column reference.
    """
    return df.select(*keep, F.explode(F.array(expr)).alias(name))


def ensure_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Guarantee a CPU-heavy map stage can use every core.

    Parquet scans parallelize by row group; a source written as one big
    row group per file (exactly the shape of the bench tables) yields ONE
    input split no matter what ``maxPartitionBytes`` says, so an
    interpreted higher-order fold downstream (MinHash, SimHash votes,
    shingle hashing) runs single-threaded.  When the observed input split
    count is below ``defaultParallelism * factor`` this inserts one
    round-robin repartition (shuffles the rows once — at the sizes where
    the gate can fire this is milliseconds against a multi-core speedup of
    the fold); when the input is already wider — every real deployment at
    scale, where split count >> core count — it is the identity and adds
    NO shuffle.  Mirrors the planner's own AQE philosophy: decide from the
    observed stats, not the logical plan."""
    if df.isStreaming:
        # micro-batch partitioning is the stream source's concern; .rdd is
        # illegal on an unbound frame anyway
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
