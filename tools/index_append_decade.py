"""Append-cost decade for the persisted-index lifecycle (r13).

The ingest loop's scale contract says the UPDATE step — append a probed
batch's survivors under the index's frozen parameters — costs O(batch),
never O(corpus): banding/shingling/bucketing run on the batch alone and
the parquet append never reads existing files.  tools/index_staleness.py
pinned the PROBE side of the lifecycle (cost linear in occupancy,
rebuild economics); tools/index_pruning.py pinned probe bytes at rest;
this harness pins the remaining axis with numbers: for corpus sizes one
decade apart, append the SAME fixed batch into a fresh index of each
size and record the append wall — flat walls across decades falsify any
hidden corpus-sized scan in the update path.  The mechanized staleness
check (``neardup_index_staleness``) is timed at each size too: it is a
parquet metadata-count, so pipelines can afford it every ingest cycle
at any corpus size.

Usage: python tools/index_append_decade.py [batch] [sizes...]
       (default: 500 5000 50000 500000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from decade3_pairs import synth_docs, synth_vecs


def main() -> None:
    from minivectordb_spark.operators.dedup import (
        dedup_against_indexed,
        neardup_against_indexed,
        neardup_index_staleness,
        save_dedup_index,
        save_neardup_index,
        update_dedup_index,
        update_neardup_index,
    )
    from minivectordb_spark.session import get_spark

    args = [int(a) for a in sys.argv[1:]]
    batch_n = args[0] if args else 500
    sizes = args[1:] or [5_000, 50_000, 500_000]

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="index_append_decade", cores=cpus,
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus)),
    )
    root = tempfile.mkdtemp(prefix="idx_append_")
    try:
        for n in sizes:
            didx = os.path.join(root, f"dd_{n}")
            nidx = os.path.join(root, f"nd_{n}")
            t0 = time.time()
            save_dedup_index(synth_docs(spark, n), didx)
            dd_build = round(time.time() - t0, 1)
            t0 = time.time()
            save_neardup_index(synth_vecs(spark, n), nidx)
            nd_build = round(time.time() - t0, 1)

            # fixed batch of NOVEL rows (ids disjoint from every corpus)
            doc_batch = (
                synth_docs(spark, 20_000_000 + batch_n)
                .filter(F.col("doc_id") >= 20_000_000)
                .localCheckpoint()
            )
            vec_batch = (
                synth_vecs(spark, 20_000_000 + batch_n)
                .filter(F.col("vec_id") >= 20_000_000)
                .localCheckpoint()
            )
            t0 = time.time()
            update_dedup_index(doc_batch, didx)
            dd_append = round(time.time() - t0, 1)
            t0 = time.time()
            update_neardup_index(vec_batch, nidx)
            nd_append = round(time.time() - t0, 1)

            # the per-cycle staleness check a pipeline would run
            t0 = time.time()
            st = neardup_index_staleness(spark, nidx)
            stale_wall = round(time.time() - t0, 1)

            # a fixed probe after the append (fresh-occupancy index, so
            # flat walls here complement the staleness tool's linear-
            # in-occupancy curve)
            t0 = time.time()
            dd_kept = dedup_against_indexed(
                doc_batch.select(
                    (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text"
                ),
                didx,
                threshold=0.5,
            ).count()
            dd_probe = round(time.time() - t0, 1)
            t0 = time.time()
            nd_kept = neardup_against_indexed(
                vec_batch.select(
                    (F.col("vec_id") + 1_000_000_000).alias("vec_id"),
                    "embedding",
                ),
                nidx,
                threshold=0.999,
                max_probes=4,
            ).count()
            nd_probe = round(time.time() - t0, 1)

            rec = {
                "n_corpus": n,
                "batch": batch_n,
                "dedup": {
                    "build_sec": dd_build,
                    "append_sec": dd_append,
                    "probe_sec": dd_probe,
                    "probe_kept": int(dd_kept),
                },
                "neardup": {
                    "build_sec": nd_build,
                    "append_sec": nd_append,
                    "probe_sec": nd_probe,
                    "probe_kept": int(nd_kept),
                    "staleness_check_sec": stale_wall,
                    "occupancy_ratio": round(st["occupancy_ratio"], 2),
                },
            }
            print(json.dumps({str(n): rec}, separators=(",", ":")), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
