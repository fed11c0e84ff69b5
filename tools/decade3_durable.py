"""Non-replicated decade counters for the durable CoW table.

The durable family's 100 TB claim (README, durable.py): "a delete of
D ids rewrites ~(D/n_buckets) of the table, never all of it".  The
wave profile (bench) measures WHERE one mutation spends its time; this
harness measures the claim's SCALING — the rewritten fraction must be
set by which buckets the ids hash into, independent of corpus size,
while untouched buckets carry their generation forward by pointer.

Per decade: create a table (n rows, 64 buckets), delete D=8 ids,
upsert D=8 fresh rows, and record for each mutation:

    touched buckets / total, rows rewritten (sum of touched buckets'
    row counts) and their fraction of n, generations advanced only on
    touched buckets (manifest diff), wall.

Usage: python tools/decade3_durable.py [n ...]   (default 5e4 5e5 5e6)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N_BUCKETS = 64
D = 8


def synth(spark, n: int):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(1000)) / 100.0).alias(
            "score"
        ),
        F.concat(F.lit("row_"), F.col("id").cast("string")).alias("text"),
    )


def bucket_rows(manifest: dict) -> dict[str, dict]:
    return {k: dict(v) for k, v in manifest["buckets"].items()}


def mutation_counters(before: dict, after: dict, n: int) -> dict:
    touched = [k for k in after if after[k]["gen"] != before[k]["gen"]]
    # rows rewritten = the NEW generation's row counts of touched buckets
    rewritten = sum(after[k]["rows"] for k in touched)
    untouched_advanced = [
        k for k in after
        if k not in touched and after[k] != before[k]
    ]
    return {
        "touched_buckets": len(touched),
        "total_buckets": len(after),
        "rows_rewritten": int(rewritten),
        "rewritten_fraction": round(rewritten / n, 4),
        "untouched_changed": len(untouched_advanced),  # MUST be 0
    }


def main() -> None:
    from minivectordb_spark.durable import DurableVectorTable
    from minivectordb_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 500_000, 5_000_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="decade3_durable", cores=cpus, shuffle_partitions=int(cpus)
    )
    out = {}
    for n in sizes:
        root = tempfile.mkdtemp(prefix=f"durable_decade_{n}_")
        path = os.path.join(root, "tbl")
        try:
            t0 = time.time()
            t = DurableVectorTable.create(
                synth(spark, n), path, id_col="id", n_buckets=N_BUCKETS
            )
            create_wall = round(time.time() - t0, 1)

            before = bucket_rows(t.manifest)
            del_ids = [int(i * (n // D) + 1) for i in range(D)]
            t0 = time.time()
            t = t.delete_embeddings_batch(del_ids)
            del_wall = round(time.time() - t0, 1)
            after_del = bucket_rows(t.manifest)
            d_del = mutation_counters(before, after_del, n)

            ups = synth(spark, n + D).filter(f"id >= {n}")
            t0 = time.time()
            t = t.store_embeddings_batch(ups)
            ups_wall = round(time.time() - t0, 1)
            after_ups = bucket_rows(t.manifest)
            d_ups = mutation_counters(after_del, after_ups, n)

            d = {
                "n": n,
                "n_buckets": N_BUCKETS,
                "create_wall_sec": create_wall,
                "delete": {**d_del, "wall_sec": del_wall, "d_ids": D},
                "upsert": {**d_ups, "wall_sec": ups_wall, "d_rows": D},
                "final_count": int(t.count()),
            }
            assert d["final_count"] == n, d
            assert d_del["untouched_changed"] == 0
            assert d_ups["untouched_changed"] == 0
        finally:
            shutil.rmtree(root, ignore_errors=True)
        out[n] = d
        print(json.dumps({str(n): d}, separators=(",", ":")), flush=True)
    print("decade3_durable: " + json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
