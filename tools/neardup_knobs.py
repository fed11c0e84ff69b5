"""Flattening-knob sweep for the embedding near-dup LSH plan.

The r11 decade run (PLANS.md "third decade for embedding near-dup")
measured candidates/row DOUBLING per decade on cube-uniform vectors
(71.7 -> 145.9 -> 322.6) because hash-uniform bucket codes are not
sphere-uniform: occupancy skew grows with n (max bucket 100 -> 231 ->
989 against target_block_size=32).  PLANS.md names the flattening
knobs — target_block_size (more planes) and max_probes — but until
this harness they were ASSERTED, not measured.  This sweeps the knob
grid at a fixed corpus size and records, per setting:

    planes, probes/row, cand/row, max bucket occupancy,
    recall over the PLANTED twin set (exact membership join,
    not output_pairs/planted arithmetic), wall seconds.

Recall here is exact: the planted pairs are (id-1, id) for
id % TWIN_EVERY == 1 (cos ~0.9999 vs threshold 0.995), so a twin is
"found" iff that ordered pair appears in the operator's output.

Usage: python tools/neardup_knobs.py [n] [target:probes ...]
Default n=500000, grid 32:4 (the r11 baseline), 16:4, 8:4, 32:8.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(__file__))

from decade3_pairs import TWIN_EVERY, synth_vecs  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from minivectordb_spark.operators.dedup import (
        embedding_neardup_diagnostics,
        embedding_neardup_pairs,
    )
    from minivectordb_spark.session import get_spark

    args = sys.argv[1:]
    n = int(args[0]) if args else 500_000
    grid = [
        tuple(int(x) for x in a.split(":")) for a in args[1:]
    ] or [(32, 4), (16, 4), (8, 4), (32, 8)]

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="neardup_knobs", cores=cpus, shuffle_partitions=int(cpus)
    )
    vecs = synth_vecs(spark, n).localCheckpoint()
    planted = (
        spark.range(n)
        .filter((F.col("id") % TWIN_EVERY == 1) & (F.col("id") > 0))
        .select(
            (F.col("id") - 1).alias("id_a"), F.col("id").alias("id_b")
        )
        .localCheckpoint()
    )
    n_planted = planted.count()

    out = {}
    for target, probes in grid:
        t0 = time.time()
        d = embedding_neardup_diagnostics(
            vecs, threshold=0.995, max_probes=probes, target_block_size=target
        )
        pairs = embedding_neardup_pairs(
            vecs, threshold=0.995, max_probes=probes, target_block_size=target
        )
        found = planted.join(
            pairs.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
        ).count()
        wall = round(time.time() - t0, 1)
        key = f"target{target}_probes{probes}"
        out[key] = {
            "n": n,
            "target_block_size": target,
            "max_probes": probes,
            "n_planes": d["n_planes"],
            "probes_per_row": d["probes_per_row"],
            "cand_per_row": round(d["candidate_pairs"] / n, 1),
            "candidate_pairs": d["candidate_pairs"],
            "max_bucket_occupancy": d["max_bucket_occupancy"],
            "recall_found": found,
            "recall_planted": n_planted,
            "wall_sec": wall,
        }
        print(json.dumps({key: out[key]}, separators=(",", ":")), flush=True)
    print("neardup_knobs: " + json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
