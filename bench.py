"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is forced through the `noop` sink so the FULL plan executes
(collect-side pruning can't skip the measured work).  The per-query wall
times are the feedback loop for plan tuning — compare against BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry
from minivectordb_spark.session import get_spark


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="bench", cores=cpus, shuffle_partitions=int(cpus))

    # warmup: pay JVM/codegen/noop-sink initialization and prime the file
    # listing before any query is timed
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    for t in ("embeddings", "documents", "events", "lineitem"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).write.format("noop").mode(
            "overwrite"
        ).save()

    timings: dict[str, float] = {}
    t_all = time.time()
    for name, fn in entry.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # a failing query counts as missing, not 0s
            print(f"bench error in {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
    total = round(time.time() - t_all, 3)

    print(
        json.dumps(
            {
                "metric": "total_wall_sec_all_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
