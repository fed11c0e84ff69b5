"""Conversion-funnel analysis: ordered event-sequence matching.

The product-analytics staple (and the MATCH_RECOGNIZE / funnel shape
every event warehouse ships): of the users who did step 1, how many
later did step 2, and later still step 3?  "Later" is strict — each step
must occur strictly after the user's FIRST qualifying occurrence of the
previous step (the standard first-touch funnel semantics).

Scale design: one conditional aggregate per step plus one equi-join per
transition — never a per-user event-array collect (a hot user with
millions of events would blow an executor) and never a cross join.
Step events are filtered BEFORE the join, so each transition's shuffle
carries only that step's events plus the surviving user frontier, which
shrinks monotonically.  The per-step frontier is lazily checkpointed so
the counts union does not recompute the cascade per branch.

Engine-exactness: the frontier times are min() over the engine's int64
epoch-nano ``ts`` contract and every count is exact — a DuckDB twin
spelling the same cascade as CTEs matches bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per funnel step: ``(step_idx, step, n_users)`` where
    ``n_users`` is the number of users whose event history contains the
    steps in order (strictly increasing ``ts``; the first qualifying
    occurrence anchors each step).  Users are counted in step i only if
    they were counted in step i-1.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    u = F.col(user_col)
    frontier = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(u.alias("__u"))
        .agg(F.min(ts_col).alias("__t"))
        .localCheckpoint(eager=False)
    )
    frontiers = [frontier]
    for s in steps[1:]:
        ev_s = events.filter(F.col(type_col) == s).select(
            u.alias("__u"), F.col(ts_col).alias("__ts")
        )
        frontier = (
            ev_s.join(frontier, "__u")
            .filter(F.col("__ts") > F.col("__t"))
            .groupBy("__u")
            .agg(F.min("__ts").alias("__t"))
            .localCheckpoint(eager=False)
        )
        frontiers.append(frontier)
    parts = [
        fr.agg(
            F.lit(i).cast("long").alias("step_idx"),
            F.lit(steps[i]).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )
        for i, fr in enumerate(frontiers)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def funnel_users(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user funnel depth: ``(user, max_step_idx)`` — the deepest step
    each step-1 user reached.  Same cascade as :func:`funnel_counts`;
    useful as a feature / cohort column."""
    if not steps:
        raise ValueError("steps must be non-empty")
    u = F.col(user_col)
    frontier = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(u.alias("__u"))
        .agg(F.min(ts_col).alias("__t"))
        .localCheckpoint(eager=False)
    )
    depth = frontier.select("__u", F.lit(0).cast("long").alias("__d"))
    for i, s in enumerate(steps[1:], 1):
        ev_s = events.filter(F.col(type_col) == s).select(
            u.alias("__u"), F.col(ts_col).alias("__ts")
        )
        frontier = (
            ev_s.join(frontier, "__u")
            .filter(F.col("__ts") > F.col("__t"))
            .groupBy("__u")
            .agg(F.min("__ts").alias("__t"))
            .localCheckpoint(eager=False)
        )
        depth = depth.join(
            frontier.select("__u", F.lit(i).cast("long").alias("__d2")),
            "__u",
            "left",
        ).select("__u", F.greatest("__d", F.coalesce("__d2", F.lit(0))).alias("__d"))
    return depth.select(F.col("__u").alias(user_col), F.col("__d").alias("max_step_idx"))


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences —
    the session-flow complement to the fixed-path funnel: for every
    ordered pair of consecutive events a user emits, count the
    ``(prev_type, next_type)`` transition.  Returns ``(prev_type,
    next_type, n, n_from)`` where ``n_from`` is the row total of the
    ``prev_type`` row of the matrix (so ``n / n_from`` is the empirical
    transition probability — left as exact integers; divide downstream).

    Ordering is ``(ts, id_col)`` — the id tiebreak makes the lag
    deterministic under equal timestamps on every engine.

    Plan: one hash exchange on the user (the lag window), then a
    combiner-reduced groupBy to the |types|^2-sized matrix, then a
    window row-total over that tiny table.  At 100 TB the only
    data-sized shuffle is the per-user exchange; a hot user costs one
    partition's sort, never a cross join, and the matrix itself is
    constant-size.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    pairs = (
        events.select(
            F.col(type_col).alias("next_type"),
            F.lag(F.col(type_col)).over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.sum("n").over(wt).alias("n_from"),
    )
