"""Capture `.explain("formatted")` for graded queries to plans/r15/.

Usage: python tools/capture_plans_r15.py <suffix> [query ...]
  suffix = "before" | "after"; with no query list, captures every
  graded query.  Queries whose builder performs eager work (index
  builds, streaming gates) still run that work; the captured plan is
  the returned (final) frame's — the piece the judge checks claims
  against.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from minivectordb_spark.session import get_spark


def main():
    suffix = sys.argv[1]
    only = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name=f"plans_{suffix}", cores=cpus, shuffle_partitions=int(cpus)
    )
    from __spark_entry__ import _fixed_index_dir

    for kind in ("ivf", "ddidx", "ndidx"):
        shutil.rmtree(_fixed_index_dir(kind, sf_dir), ignore_errors=True)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    qs = entry.queries()
    names = only or list(qs)
    for name in names:
        fn = qs.get(name) or entry.demoted_queries()[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # capture the failure instead of dying
            plan = f"ERROR building {name}: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
