"""Standalone-cold per-query walls: run ONLY the named queries in a fresh
Spark session (this process), min-of-N each, and print one JSON line.

Purpose: attribute in-loop bench regressions.  The full bench runs 50+
queries in one session; later queries get billed for accumulated session
context (heap/codegen/ContextCleaner pressure).  Running a suspect query
in a cold process isolates the operator's own cost — the semantic_dedup
protocol from the r7 PLANS.  Invoke once per "session"; repeat the
invocation for independent cold sessions.

Usage: python tools/standalone_bench.py q1 [q2 ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_RUNS (default 2).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from minivectordb_spark.session import get_spark


def main():
    names = sys.argv[1:]
    if not names:
        print("usage: standalone_bench.py <query> [<query> ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "2"))
    spark = get_spark(
        app_name="standalone_bench", cores=cpus, shuffle_partitions=int(cpus)
    )
    # same environment warmup as bench.py: codegen/noop/file-listing and
    # Python-worker fork costs are paid before any query is timed, and the
    # cross-process IVF index cache is cleared so run 1 prices a cold build
    from __spark_entry__ import _fixed_index_dir

    shutil.rmtree(_fixed_index_dir("ivf", sf_dir), ignore_errors=True)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    for t in ("embeddings", "documents", "events", "lineitem"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).write.format(
            "noop"
        ).mode("overwrite").save()

    def _py_identity(batches):
        for pdf in batches:
            yield pdf

    spark.range(0, 10000, 1, 32).selectExpr("id").mapInPandas(
        _py_identity, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    qs = entry.queries()
    timings = {}
    for name in names:
        if name in ("ivf_index_build", "ivf_probe_only"):
            # synthetic bench rows: the registry entry is
            # ivf_search_indexed (build+probe); mirror bench.py's split
            from minivectordb_spark.operators.ann import (
                ivf_search_indexed,
                save_ivf_index,
                seed_centroids,
            )

            e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            idx = tempfile.mkdtemp(prefix="standalone_ivf_")
            best = None
            for _ in range(runs):
                t0 = time.time()
                if name == "ivf_index_build":
                    save_ivf_index(
                        e, seed_centroids(e, entry.N_CENTROIDS), idx
                    )
                else:
                    save_ivf_index(
                        e, seed_centroids(e, entry.N_CENTROIDS), idx
                    )
                    t0 = time.time()
                    ivf_search_indexed(
                        spark, idx, entry.QVEC, k=10, nprobe=entry.NPROBE
                    ).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            shutil.rmtree(idx, ignore_errors=True)
            timings[name] = round(best, 3)
            continue
        fn = qs.get(name)
        if fn is None:
            # demoted rows are timed by tools/demoted_bench.py which tells
            # users to confirm wall jumps HERE — resolve them too
            demoted = getattr(entry, "demoted_queries", lambda: {})()
            fn = demoted.get(name)
        if fn is None:
            known = sorted(set(qs) | set(demoted))
            print(
                f"unknown query {name!r}; known: {', '.join(known)}",
                file=sys.stderr,
            )
            sys.exit(2)
        best = None
        for _ in range(runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
    print(
        json.dumps(
            {
                "metric": "standalone_cold_wall_sec",
                "queries": timings,
                "runs_per_query": runs,
                "sf": sf_dir.rstrip("/").split("sf")[-1],
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
