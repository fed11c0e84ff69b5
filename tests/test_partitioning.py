"""Partitioning toolkit: bucketed joins must be shuffle-free; salted joins
must preserve exact join semantics."""

import pytest
from pyspark.sql import functions as F

from minivectordb_spark.operators.partitioning import (
    repartition_for_write,
    salted_join,
    save_bucketed,
)
from minivectordb_spark.plans import exchange_count, physical_plan


def test_bucketed_join_no_shuffle(spark, sf_dir):
    # tables land in the default spark-warehouse dir (gitignored), dropped below
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    save_bucketed(emb.select("vec_id", "label"), "b_left", "vec_id", n_buckets=4)
    save_bucketed(emb.select("vec_id", "embedding"), "b_right", "vec_id", n_buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = spark.table("b_left").join(spark.table("b_right"), "vec_id")
        assert exchange_count(joined) == 0, physical_plan(joined)
        assert joined.count() == emb.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")


def test_salted_join_preserves_semantics(spark):
    big = spark.createDataFrame(
        [(k, i) for k in ["hot", "cold"] for i in range(50 if k == "hot" else 3)],
        ["key", "payload"],
    )
    small = spark.createDataFrame(
        [("hot", "H1"), ("hot", "H2"), ("cold", "C"), ("never", "N")], ["key", "val"]
    )
    plain = big.join(small, "key").groupBy("key").count().collect()
    salted = salted_join(big, small, "key", n_salt=4).groupBy("key").count().collect()
    assert {r["key"]: r["count"] for r in salted} == {r["key"]: r["count"] for r in plain}
    # left join keeps unmatched big rows exactly once
    plain_l = big.join(small, "key", "left").count()
    salted_l = salted_join(big, small, "key", n_salt=4, how="left").count()
    assert salted_l == plain_l


def test_salted_join_rejects_unsafe_how(spark):
    import pytest

    big = spark.createDataFrame([("k", 1)], ["key", "payload"])
    small = spark.createDataFrame([("k", "v")], ["key", "val"])
    for how in ("right", "full", "left_anti", "outer"):
        with pytest.raises(ValueError, match="inner"):
            salted_join(big, small, "key", how=how)


def test_repartition_for_write(spark):
    df = spark.range(1000)
    out = repartition_for_write(df, target_rows_per_file=300)
    assert out.rdd.getNumPartitions() == 4


def test_salted_join_accepts_left_aliases(spark):
    big = spark.createDataFrame([("k", 1)], ["key", "payload"])
    small = spark.createDataFrame([("k", "v")], ["key", "val"])
    for how in ("left_outer", "leftouter", "LEFT"):
        assert salted_join(big, small, "key", how=how).count() == 1


def test_zorder_key_matches_python_morton(spark):
    """zorder_key == bit-interleave reference for random pairs, and
    out-of-range inputs clamp instead of overflowing."""
    import random

    from pyspark.sql import functions as F

    from minivectordb_spark.operators.partitioning import zorder_key

    def morton(a, b, bits=21):
        a = min(max(a, 0), (1 << bits) - 1)
        b = min(max(b, 0), (1 << bits) - 1)
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    rng = random.Random(41)
    rows = [(rng.randrange(0, 1 << 21), rng.randrange(0, 1 << 21)) for _ in range(64)]
    rows += [(-5, 3), (1 << 40, 7), (0, 0), ((1 << 21) - 1, (1 << 21) - 1)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    for r in got:
        assert r["z"] == morton(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_key_null_inputs_coalesce_to_zero(spark):
    """NULL inputs must yield a usable (non-NULL) key — otherwise
    save_zordered strands null-keyed rows unclustered in one range
    partition with no warning, silently weakening the skipping
    guarantee."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from minivectordb_spark.operators.partitioning import zorder_key

    schema = StructType(
        [StructField("x", LongType(), True), StructField("y", LongType(), True)]
    )
    df = spark.createDataFrame(
        [(None, 3), (5, None), (None, None), (5, 3)], schema
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    assert all(v is not None for v in got.values())
    # NULL behaves exactly like 0 in that dimension
    assert got[(None, 3)] == got.get((None, 3))  # non-null key
    ref = {
        (r["x"], r["y"]): r["z"]
        for r in spark.createDataFrame(
            [(0, 3), (5, 0), (0, 0)], ["x", "y"]
        ).select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z"))
        .collect()
    }
    assert got[(None, 3)] == ref[(0, 3)]
    assert got[(5, None)] == ref[(5, 0)]
    assert got[(None, None)] == ref[(0, 0)]


def test_save_zordered_skips_files_on_both_dimensions(spark, tmp_path):
    """Z-order layout proof via parquet footer stats: a narrow filter on
    EITHER dimension intersects only a minority of the written files'
    min/max ranges — the two-column data-skipping property a single-sort
    layout cannot give (sorting by x alone leaves y unclustered)."""
    import glob

    import pyarrow.parquet as pq

    from minivectordb_spark.operators.partitioning import save_zordered

    side = 64
    rows = [(x, y, x * side + y) for x in range(side) for y in range(side)]
    df = spark.createDataFrame(rows, ["x", "y", "payload"])
    out = str(tmp_path / "zorder")
    save_zordered(df, out, "x", "y", n_files=16)

    files = glob.glob(f"{out}/*.parquet")
    assert len(files) >= 8

    def ranges(col):
        out_r = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            mn = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            mx = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            out_r.append((mn, mx))
        return out_r

    for col in ("x", "y"):
        rs = ranges(col)
        lo, hi = 0, side // 8  # a narrow 1/8 slice of one dimension
        touched = sum(1 for mn, mx in rs if not (mx < lo or mn > hi))
        assert touched <= len(files) // 2, (col, touched, rs)

    # correctness: the layout is a pure reorder
    got = spark.read.parquet(out)
    assert got.count() == side * side
    assert got.agg({"payload": "sum"}).first()[0] == sum(p for _, _, p in rows)


def test_salted_skew_join_fans_hot_key(spark):
    """The graded events_salted_skew row's scale claim: the deliberately
    hot key must actually fan out across n_salt distinct (key, salt)
    groups (a plain hash join would send every hot row to ONE reducer),
    and the physical join must key on (ukey, __salt) — the salt is in
    the shuffle key, not cosmetic."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    out = entry.q_events_salted_skew(spark, sf)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # join/exchange keys carry the salt

    # numeric fan-out: hot-key rows spread over all n_salt salts
    ev = entry._t(spark, sf, "events")
    big = ev.select(
        F.when(F.col("user_id") % entry.SKEW_HOT_MOD < 5, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("ukey"),
        F.col("value").cast("decimal(18,4)").alias("val"),
    )
    salt = F.pmod(
        F.abs(F.xxhash64(*[F.col(c) for c in big.columns])),
        F.lit(entry.SKEW_N_SALT),
    )
    hot_salts = (
        big.filter(F.col("ukey") == 0)
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert hot_salts == entry.SKEW_N_SALT
    # and the hot key really is hot: ~half the corpus
    total = big.count()
    hot = big.filter(F.col("ukey") == 0).count()
    assert hot >= total * 0.4
