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
