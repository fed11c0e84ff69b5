"""Non-replicated decade counters for the IVF-ANN family.

Every other heavy family (setsim/LSH/simhash/neardup pairs, intervals,
graphs, bounded streams) carries measured decade laws; this harness
records the IVF ones.  The falsifiable claims:

  (1) scan fraction — a probe touches ~nprobe/K of the corpus ROWS
      (file-level partition pruning over the save_ivf_index layout),
      and that fraction is FLAT across decades;
  (2) cluster balance — max/avg cluster size stays near 1 on the
      clustered regime IVF assumes (skew here is the IVF analogue of
      LSH bucket occupancy);
  (3) recall@10 vs EXACT brute-force ground truth (knn_batch over the
      same frame) under the pinned >=0.95 contract
      (tests/test_operators.py::test_ivf_recall_contract).

Corpus: deterministic clustered vectors — vector i belongs to true
cluster (i % n_centers); center components are xxhash-derived in
[-1, 1], per-vector noise in [-0.05, 0.05].  Because cluster ids cycle
through the lowest ids, lloyd_kmeans_fit's lowest-id seeding starts
with exactly one seed per true cluster — the clustered, well-seeded
regime the operator's recall contract documents.  Queries: one per
true cluster for the first n_queries clusters, center + a DIFFERENT
deterministic noise draw.

Usage: python tools/decade3_ann.py [n ...]   (default 5k 50k 500k)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N_CENTERS = 64
DIM = 16
K_TOP = 10
NPROBE = 2
N_QUERIES = 20



def _live_data(idx: str, name: str, sub: str) -> str:
    """Live-generation data dir of an index layout (r14 generations)."""
    from minivectordb_spark import fsio

    try:
        m, _ = fsio.load_index_manifest(idx, name)
    except (OSError, ValueError):
        m = {}
    return fsio.gen_data(idx, m, sub)


def _live_manifest(idx: str, name: str) -> dict:
    from minivectordb_spark import fsio

    m, _ = fsio.load_index_manifest(idx, name)
    return m

def _hash_unit(col_expr, j: int, seed: int, scale: float):
    """Deterministic value in [-scale, scale] from (expr, j, seed)."""
    from pyspark.sql import functions as F

    return (
        (
            F.pmod(
                F.xxhash64(col_expr * F.lit(1_048_576) + F.lit(j), F.lit(seed)),
                F.lit(2001),
            )
            - F.lit(1000)
        ).cast("double")
        / F.lit(1000.0)
        * F.lit(scale)
    )


def synth_clustered_vecs(spark, n: int):
    from pyspark.sql import functions as F

    c = F.col("id") % N_CENTERS
    vec = F.array(
        *[
            _hash_unit(c, j, 31, 1.0) + _hash_unit(F.col("id"), j, 37, 0.05)
            for j in range(DIM)
        ]
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), vec.cast("array<float>").alias("embedding")
    )


def synth_queries(spark, n_queries: int = N_QUERIES):
    from pyspark.sql import functions as F

    c = F.col("id")  # query i targets true cluster i
    vec = F.array(
        *[
            _hash_unit(c, j, 31, 1.0) + _hash_unit(F.col("id"), j, 41, 0.05)
            for j in range(DIM)
        ]
    )
    return spark.range(n_queries).select(
        F.col("id").alias("query_id"),
        vec.cast("array<float>").alias("query_embedding"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from minivectordb_spark.operators.ann import (
        ivf_search_indexed,
        lloyd_kmeans_fit,
        save_ivf_index,
    )
    from minivectordb_spark.scoring import knn_batch
    from minivectordb_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [5_000, 50_000, 500_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="decade3_ann", cores=cpus, shuffle_partitions=int(cpus)
    )
    queries = synth_queries(spark).localCheckpoint()
    q_rows = {r["query_id"]: r["query_embedding"] for r in queries.collect()}

    out = {}
    for n in sizes:
        vecs = synth_clustered_vecs(spark, n).localCheckpoint()
        t0 = time.time()
        centroids, _ = lloyd_kmeans_fit(vecs, N_CENTERS, iters=2)
        fit_wall = round(time.time() - t0, 1)

        # exact ground truth: one broadcast-join batch pass for all queries
        t0 = time.time()
        truth_df = knn_batch(
            queries, vecs, k=K_TOP, corpus_id_col="vec_id"
        ).collect()
        truth = {}
        for r in truth_df:
            truth.setdefault(r["query_id"], set()).add(r["vec_id"])
        brute_wall = round(time.time() - t0, 1)

        idx_dir = tempfile.mkdtemp(prefix=f"ivf_decade_{n}_")
        try:
            t0 = time.time()
            save_ivf_index(vecs, centroids, idx_dir)
            build_wall = round(time.time() - t0, 1)

            sizes_row = (
                spark.read.parquet(_live_data(idx_dir, "_index_manifest.json", "assignments"))
                .groupBy("centroid_id")
                .count()
                .agg(
                    F.count("*").alias("k_used"),
                    F.avg("count").alias("avg"),
                    F.max("count").alias("mx"),
                )
                .first()
            )
            cluster_sizes = {
                r["centroid_id"]: r["n"]
                for r in spark.read.parquet(_live_data(idx_dir, "_index_manifest.json", "assignments"))
                .groupBy("centroid_id")
                .agg(F.count("*").alias("n"))
                .collect()
            }

            from minivectordb_spark.operators.ann import (
                _collect_centroids,
                _rank_probes,
            )

            cents = _collect_centroids(centroids)
            t0 = time.time()
            hits = 0
            probed_rows_total = 0
            for qid, q in q_rows.items():
                got = {
                    r["vec_id"]
                    for r in ivf_search_indexed(
                        spark, idx_dir, list(q), k=K_TOP, nprobe=NPROBE
                    ).collect()
                }
                hits += len(got & truth[qid])
                probed_rows_total += sum(
                    cluster_sizes.get(c, 0)
                    for c in _rank_probes(cents, list(q), NPROBE)
                )
            probe_wall = round((time.time() - t0) / len(q_rows), 2)
        finally:
            shutil.rmtree(idx_dir, ignore_errors=True)

        d = {
            "n": n,
            "k_centroids": N_CENTERS,
            "nprobe": NPROBE,
            "fit_wall_sec": fit_wall,
            "build_wall_sec": build_wall,
            "brute_truth_wall_sec": brute_wall,
            "clusters_used": int(sizes_row["k_used"]),
            "cluster_avg": round(float(sizes_row["avg"]), 1),
            "cluster_max": int(sizes_row["mx"]),
            "probed_rows_per_query": probed_rows_total // len(q_rows),
            "scan_fraction": round(probed_rows_total / (len(q_rows) * n), 4),
            "recall_at_10": round(hits / (len(q_rows) * K_TOP), 4),
            "probe_wall_sec_per_query": probe_wall,
        }
        out[n] = d
        print(json.dumps({str(n): d}, separators=(",", ":")), flush=True)
    print("decade3_ann: " + json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
