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
