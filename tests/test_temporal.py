"""As-of join semantics against hand-computed expectations."""

import pytest

from minivectordb_spark.operators.temporal import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (1, 5, "p0"), (2, 15, "q1")],
        ["key", "ts", "name"],
    )
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 10, 200.0), (1, 18, 300.0), (3, 1, 999.0)],
        ["key", "ts", "val"],
    )
    return left, right


def test_asof_inner(frames):
    left, right = frames
    out = {r["name"]: (r["r_val"], r["r_ts"]) for r in asof_join(left, right, "key").collect()}
    assert out == {
        "p1": (200.0, 10),  # tie: right.ts == left.ts matches
        "p2": (300.0, 18),
    }  # p0 (no prior right) and q1 (no key match) dropped


def test_asof_left(frames):
    left, right = frames
    rows = {r["name"]: r["r_val"] for r in asof_join(left, right, "key", how="left").collect()}
    assert rows["p0"] is None and rows["q1"] is None
    assert rows["p1"] == 200.0


def test_asof_bad_how(frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, "key", how="outer")


def test_asof_join_tolerance(spark):
    """pandas merge_asof-style tolerance: a carried match staler than the
    bound is no match — dropped under inner, nulled under left — while
    in-bound matches and the no-tolerance default are unchanged."""
    from minivectordb_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 500)], ["k", "ts"]
    )
    right = spark.createDataFrame(
        [(1, 95, "a"), (1, 120, "b"), (2, 100, "c")], ["k", "ts", "v"]
    )

    base = {
        (r["k"], r["ts"]): r["r_v"]
        for r in asof_join(left, right, "k").collect()
    }
    assert base == {(1, 100): "a", (1, 200): "b", (2, 500): "c"}

    # tolerance 80: (1,200)->b is 80 stale (kept, boundary inclusive);
    # (2,500)->c is 400 stale (dropped)
    inner = {
        (r["k"], r["ts"]): r["r_v"]
        for r in asof_join(left, right, "k", tolerance=80).collect()
    }
    assert inner == {(1, 100): "a", (1, 200): "b"}

    outer = {
        (r["k"], r["ts"]): (r["r_v"], r["r_ts"])
        for r in asof_join(left, right, "k", how="left", tolerance=80).collect()
    }
    assert outer[(2, 500)] == (None, None)
    assert outer[(1, 100)] == ("a", 95) and outer[(1, 200)] == ("b", 120)


# ---------------- incremental rollup maintenance ----------------


def test_incremental_rollup_monoid_law(spark):
    """state(A ∪ B ∪ C) == state(A) ⊕ state(B) ⊕ state(C) for an
    arbitrary (hash-based, uneven) partition of the input — including
    keys absent from some batches."""
    from minivectordb_spark.operators.incremental import (
        finalize_rollup,
        incremental_rollup,
        rollup_state,
    )
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "event_type", "value"
    )
    # uneven 3-way split on a hash nobody aligned with the grouping key
    part = F.abs(F.hash("event_id")) % 7
    batches = [
        ev.filter(part < 4),
        ev.filter(part == 4),
        ev.filter(part > 4),
    ]
    inc = incremental_rollup(
        batches, [F.col("event_type")], ["event_type"], "value"
    ).toPandas()
    full = finalize_rollup(
        rollup_state(ev, [F.col("event_type")], "value"), ["event_type"]
    ).toPandas()
    a = inc.sort_values("event_type").reset_index(drop=True)
    b = full.sort_values("event_type").reset_index(drop=True)
    assert a.equals(b)


def test_incremental_rollup_empty_batch(spark):
    """An empty delta batch is the monoid identity: merging it changes
    nothing (the streaming no-new-data micro-batch case)."""
    from pyspark.sql import functions as F

    from minivectordb_spark.operators.incremental import (
        finalize_rollup,
        incremental_rollup,
        rollup_state,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    empty = ev.filter(F.lit(False))
    inc = incremental_rollup(
        [ev, empty], [F.col("event_type")], ["event_type"], "value"
    ).toPandas()
    full = finalize_rollup(
        rollup_state(ev, [F.col("event_type")], "value"), ["event_type"]
    ).toPandas()
    assert inc.sort_values("event_type").reset_index(drop=True).equals(
        full.sort_values("event_type").reset_index(drop=True)
    )


def test_ewma_matches_python_recurrence(spark):
    """The fold replays the exact integer recurrence — independent
    pure-Python oracle, including negative values (sign-split truncating
    division) and single-event keys (ewma == the one observation)."""
    from pyspark.sql import functions as F

    from minivectordb_spark.operators.temporal import ewma

    rows = [
        (1, 1, 10.0), (1, 2, -5.0), (1, 3, 3.333333),
        (2, 4, -7.5),                      # single event
        (3, 5, 0.000001), (3, 6, -0.000001),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    df = df.withColumn("ts", F.col("event_id") * 1_000_000_000)

    def py(xs, a_u=300000):
        s = xs[0]
        for x in xs[1:]:
            v = a_u * x + (1_000_000 - a_u) * s
            s = v // 1_000_000 if v >= 0 else -((-v) // 1_000_000)
        return s / 1e6

    series = {1: [10_000_000, -5_000_000, 3_333_333], 2: [-7_500_000],
              3: [1, -1]}
    want = {k: py(v) for k, v in series.items()}
    got = {r["user_id"]: r["ewma"] for r in ewma(df, alpha=0.3).collect()}
    assert got == want


def test_ewma_order_pinned_by_tiebreak(spark):
    """Same timestamp, different event ids: the tiebreak pins the fold
    order (the recurrence is order-sensitive, so this matters)."""
    from pyspark.sql import functions as F

    from minivectordb_spark.operators.temporal import ewma

    rows = [(1, 2, 100.0), (1, 1, 0.0)]  # same ts, ids reversed
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    df = df.withColumn("ts", F.lit(5_000_000_000))
    out = ewma(df, alpha=0.5).collect()[0]
    # order by (ts, event_id): x = [0, 100] -> s = 0 then 50
    assert out["ewma"] == 50.0


def test_ohlc_bucketing_matches_python_floor_division(spark):
    # property pin for the r9 floor-bucketing fix: the operator's bucket
    # epoch equals python's // (true floor) for timestamps on both sides
    # of the epoch and around bucket edges
    from minivectordb_spark.operators.temporal import ohlc_bars

    B = 7_000_000_000  # deliberately NOT a divisor of 1e9 multiples
    ts_vals = [
        -2 * B, -B - 1, -B, -B + 1, -1, 0, 1, B - 1, B, B + 1,
        -3, 2 * B + 17, -(2 * B) - 17,
    ]
    rows = [(i, "k", t, float(i)) for i, t in enumerate(ts_vals)]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts long, value double"
    )
    got = {
        r["bucket_epoch"]
        for r in ohlc_bars(
            df, "value", "ts", "event_type", "event_id", bucket_ns=B
        ).collect()
    }
    want = {(t // B) * B // 1_000_000_000 for t in ts_vals}
    assert got == want
