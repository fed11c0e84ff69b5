"""Per-query profiler (r14): run ONE query in a fresh session with the
Spark UI enabled and print a per-job / per-stage wall breakdown from the
UI REST API — the guide-§1 "where is the time" answer when eyeballing
`explain` is not enough.  Pure measurement; never used by the bench.

Usage: python tools/profile_query.py <query> [runs]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from minivectordb_spark.session import get_spark


def main():
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name=f"profile_{name}",
        cores=cpus,
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    from __spark_entry__ import _fixed_index_dir

    for kind in ("ivf", "ddidx", "ndidx"):
        shutil.rmtree(_fixed_index_dir(kind, sf_dir), ignore_errors=True)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # same warmup as bench.py
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

    fn = entry.queries().get(name) or entry.demoted_queries()[name]
    walls = []
    marks = []  # job-id watermark before each run
    api = "http://localhost:4050/api/v1"
    app_id = spark.sparkContext.applicationId
    for i in range(runs):
        jobs_before = json.load(
            urllib.request.urlopen(f"{api}/applications/{app_id}/jobs")
        )
        marks.append(max((j["jobId"] for j in jobs_before), default=-1))
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 3))
    jobs = json.load(urllib.request.urlopen(f"{api}/applications/{app_id}/jobs"))
    stages = {
        s["stageId"]: s
        for s in json.load(
            urllib.request.urlopen(
                f"{api}/applications/{app_id}/stages?status=complete"
            )
        )
    }
    print(f"\n=== {name}  walls={walls}  (min {min(walls)}) ===")
    for run_idx, lo in enumerate(marks):
        hi = marks[run_idx + 1] if run_idx + 1 < len(marks) else 10**9
        run_jobs = sorted(
            (j for j in jobs if lo < j["jobId"] <= hi), key=lambda j: j["jobId"]
        )
        if run_idx != len(marks) - 1:
            continue  # print only the LAST (warm) run in detail
        print(f"--- run {run_idx} ({len(run_jobs)} jobs) ---")
        def _ts(s: str) -> float:
            # "2026-08-17T09:34:34.123GMT" -> epoch seconds (ms precision)
            base = time.mktime(time.strptime(s[:19], "%Y-%m-%dT%H:%M:%S"))
            frac = s[19:].rstrip("GMT")
            return base + (float(frac) if frac else 0.0)

        for j in run_jobs:
            try:
                dur = _ts(j["completionTime"]) - _ts(j["submissionTime"])
            except Exception:
                dur = -1
            desc = (j.get("description") or j.get("name", ""))[:90]
            sids = j.get("stageIds", [])
            stage_bits = []
            for sid in sids:
                s = stages.get(sid)
                if s:
                    stage_bits.append(
                        f"s{sid}:{s['numCompleteTasks']}t/"
                        f"{s.get('executorRunTime', 0)}ms"
                        + (
                            f"/shW{s.get('shuffleWriteBytes', 0) // 1024}K"
                            if s.get("shuffleWriteBytes")
                            else ""
                        )
                    )
            print(f"  job {j['jobId']:>4} {dur:7.2f}s  {desc}")
            if stage_bits:
                print(f"        {' '.join(stage_bits)}")
    spark.stop()


if __name__ == "__main__":
    main()
