"""Funnel semantics pins: strict ordering, first-occurrence anchoring,
monotone frontier shrinkage (operators/funnel)."""

import pytest

from minivectordb_spark.operators.funnel import funnel_counts, funnel_users


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_type string, ts long")


def _counts(df):
    return {r["step"]: r["n_users"] for r in df.collect()}


def test_funnel_strictly_after_first_occurrence(spark):
    # u1 converts in order; u2 clicked BEFORE viewing (not counted at
    # click); u3 views only.
    ev = _ev(spark, [
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        (2, "click", 5), (2, "view", 10),
        (3, "view", 10),
    ])
    c = _counts(funnel_counts(ev, ["view", "click", "purchase"]))
    assert c == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_anchors_at_first_view_not_any_view(spark):
    # u1's click is after their SECOND view but before nothing — click at
    # 15 is after first view (10): counted.  u2's click (5) precedes
    # their first view (10): not counted even though a later view (20)
    # exists — first-touch anchoring.
    ev = _ev(spark, [
        (1, "view", 10), (1, "view", 40), (1, "click", 15),
        (2, "click", 5), (2, "view", 10), (2, "view", 20),
    ])
    c = _counts(funnel_counts(ev, ["view", "click"]))
    assert c == {"view": 2, "click": 1}


def test_funnel_equal_ts_not_counted(spark):
    # strict inequality: click at the same instant as the view does not
    # advance the funnel
    ev = _ev(spark, [(1, "view", 10), (1, "click", 10)])
    c = _counts(funnel_counts(ev, ["view", "click"]))
    assert c == {"view": 1, "click": 0}


def test_funnel_users_depth(spark):
    ev = _ev(spark, [
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        (2, "view", 10), (2, "click", 20),
        (3, "view", 10),
        (4, "click", 10),  # never viewed: not in the cohort at all
    ])
    d = {r["user_id"]: r["max_step_idx"] for r in
         funnel_users(ev, ["view", "click", "purchase"]).collect()}
    assert d == {1: 2, 2: 1, 3: 0}


def test_funnel_empty_steps_rejected(spark):
    ev = _ev(spark, [(1, "view", 10)])
    with pytest.raises(ValueError):
        funnel_counts(ev, [])
