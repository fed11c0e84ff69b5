"""Third-decade spot-check: sf0.1 x 100 — 1000x the oracle gate's data.

The per-round bench already records two decades (sf0.01 x10 inside
`scaled`, sf0.1 x10 inside `scaled2`).  This one-off harness replicates
the sf0.1 tables 100x through the SAME scaling machinery and times the
bounded-output scan/aggregate queries whose 100 TB story is "cost is one
pass, output is answer-sized" — the claim a third decade can falsify
cheapest.  Candidate-generating pair queries (dedup/LSH/setsim) are
deliberately excluded: 100x replication makes every original doc a
100-clique, so their OUTPUT grows ~5000x by construction and the wall
measures answer size, not plan quality (their two-decade counter records
are the right evidence; see PLANS).

Results are recorded by hand into PLANS.md ("third decade" section) —
this is a spot-check tool, not a per-round bench stage (building the
x100 dir costs minutes and ~10 GB of scratch).

Usage: python tools/decade3_bench.py [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_RUNS (default 2).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# one pass over the data, output bounded by keys/bins/buckets/top-k —
# the shapes whose third-decade wall should track the scan ~linearly
DEFAULT_QUERIES = [
    "tpch_q1",
    "events_histogram",
    "events_ohlc",
    "events_mad",
    "heavy_hitters",
    "quality_classifier",
]


def main() -> None:
    from minivectordb_spark.session import get_spark
    from tools.scaling_bench import scaled_section

    names = sys.argv[1:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "2"))
    spark = get_spark(
        app_name="decade3_bench", cores=cpus, shuffle_partitions=int(cpus)
    )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    out = scaled_section(spark, sf_dir, factor=100, runs=runs, queries=names)
    out["metric"] = "third_decade_wall_sec"
    out["base_sf_dir"] = sf_dir
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
