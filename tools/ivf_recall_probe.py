"""Recall axis for the IVF drift trigger (VERDICT r13 item 5).

``ivf_index_balance`` bounds the COST of centroid drift (max/mean
cluster ratio = worst-case probe scan factor) but honestly documents
that drift also degrades RECALL query-dependently.  This harness
measures that axis so the refit trigger's economics cite both:

  1. build a clustered corpus, fit centroids, persist the index;
  2. measure recall@k of ``ivf_search_indexed`` against EXACT
     brute-force ground truth (``scoring.knn_batch`` — the reference's
     exactness contract, vector_database.py:508-523, is what ANN
     trades away, so the trade is MEASURED, not assumed);
  3. drift: append an out-of-hull blob via ``update_ivf_index``
     (frozen centroids — the appended region scatters across clusters
     that were never fit for it), re-measure recall for base queries
     AND drifted-region queries;
  4. refit via ``rebuild_ivf_index_if_unbalanced(force=True)`` (the
     generation rebuild) and re-measure — the table should show the
     refit restoring drifted-region recall.

Ground truth is recomputed per stage over the CURRENT corpus, so every
stage's recall is against its own exact answer.

Usage: python tools/ivf_recall_probe.py [n_base] [n_drift]
       (default 20000 8000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from decade3_ann import DIM, N_CENTERS, _hash_unit, synth_clustered_vecs

K_TOP = 10
NPROBE = 2
N_QUERIES = 20


def synth_drift_vecs(spark, n: int, offset: int):
    """Out-of-hull drift: centers hashed with a DIFFERENT seed at 3x the
    base scale, noise 0.3 — far from every frozen centroid, so nearest-
    frozen-centroid assignment scatters the region across clusters that
    were never fit for it (the regime where frozen-centroid probing
    loses recall, not just balance)."""
    from pyspark.sql import functions as F

    c = F.col("id") % 32
    vec = F.array(
        *[
            _hash_unit(c, j, 131, 3.0) + _hash_unit(F.col("id"), j, 137, 0.3)
            for j in range(DIM)
        ]
    )
    return spark.range(offset, offset + n).select(
        F.col("id").alias("vec_id"), vec.cast("array<float>").alias("embedding")
    )


def synth_queries_at(spark, n_queries: int, center_seed: int, scale: float,
                     noise_seed: int, noise: float, id_offset: int = 0):
    from pyspark.sql import functions as F

    c = F.col("id") % (N_CENTERS if center_seed == 31 else 32)
    vec = F.array(
        *[
            _hash_unit(c, j, center_seed, scale)
            + _hash_unit(F.col("id") + F.lit(id_offset), j, noise_seed, noise)
            for j in range(DIM)
        ]
    )
    return spark.range(n_queries).select(
        F.col("id").alias("query_id"),
        vec.cast("array<float>").alias("query_embedding"),
    )


def recall_at_k(spark, corpus, idx_dir: str, queries) -> float:
    """Mean |indexed top-k ∩ exact top-k| / k over the query set."""
    from minivectordb_spark.operators.ann import ivf_search_indexed
    from minivectordb_spark.scoring import knn_batch

    exact = {
        qid: {r["vec_id"] for r in rows}
        for qid, rows in _group_topk(
            knn_batch(
                queries, corpus, k=K_TOP,
                query_id_col="query_id", query_emb_col="query_embedding",
                corpus_id_col="vec_id", corpus_emb_col="embedding",
            ).collect()
        ).items()
    }
    total = 0.0
    q_rows = {r["query_id"]: r["query_embedding"] for r in queries.collect()}
    for qid, qvec in q_rows.items():
        got = {
            r["vec_id"]
            for r in ivf_search_indexed(
                spark, idx_dir, [float(x) for x in qvec], k=K_TOP, nprobe=NPROBE
            ).collect()
        }
        total += len(got & exact[qid]) / float(K_TOP)
    return round(total / len(q_rows), 4)


def _group_topk(rows):
    out: dict = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append(r)
    return out


def main() -> None:
    from minivectordb_spark.operators.ann import (
        ivf_index_balance,
        lloyd_kmeans_fit,
        rebuild_ivf_index_if_unbalanced,
        save_ivf_index,
        update_ivf_index,
    )
    from minivectordb_spark.session import get_spark

    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_drift = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ivf_recall_probe", cores=cpus, shuffle_partitions=int(cpus)
    )
    root = tempfile.mkdtemp(prefix="ivf_recall_")
    idx = os.path.join(root, "ivf")
    out: dict = {"n_base": n_base, "n_drift": n_drift, "k": K_TOP,
                 "nprobe": NPROBE}
    try:
        base = synth_clustered_vecs(spark, n_base).localCheckpoint()
        cents, _ = lloyd_kmeans_fit(base, N_CENTERS)
        save_ivf_index(base, cents, idx)
        base_q = synth_queries_at(spark, N_QUERIES, 31, 1.0, 41, 0.05)
        base_q = base_q.localCheckpoint()

        t0 = time.time()
        out["fresh"] = {
            "recall_base": recall_at_k(spark, base, idx, base_q),
            "balance_ratio": round(
                ivf_index_balance(spark, idx)["balance_ratio"], 2
            ),
            "wall_sec": round(time.time() - t0, 1),
        }
        print(json.dumps({"fresh": out["fresh"]}), flush=True)

        drift = synth_drift_vecs(spark, n_drift, 10_000_000).localCheckpoint()
        update_ivf_index(drift, idx)
        grown = base.unionAll(drift).localCheckpoint()
        drift_q = synth_queries_at(
            spark, N_QUERIES, 131, 3.0, 151, 0.3
        ).localCheckpoint()
        t0 = time.time()
        out["drifted"] = {
            "recall_base": recall_at_k(spark, grown, idx, base_q),
            "recall_drift_region": recall_at_k(spark, grown, idx, drift_q),
            "balance_ratio": round(
                ivf_index_balance(spark, idx)["balance_ratio"], 2
            ),
            "wall_sec": round(time.time() - t0, 1),
        }
        print(json.dumps({"drifted": out["drifted"]}), flush=True)

        assert rebuild_ivf_index_if_unbalanced(spark, idx, force=True)
        t0 = time.time()
        out["refit"] = {
            "recall_base": recall_at_k(spark, grown, idx, base_q),
            "recall_drift_region": recall_at_k(spark, grown, idx, drift_q),
            "balance_ratio": round(
                ivf_index_balance(spark, idx)["balance_ratio"], 2
            ),
            "wall_sec": round(time.time() - t0, 1),
        }
        print(json.dumps({"refit": out["refit"]}), flush=True)
        print("ivf_recall_probe:", json.dumps(out, separators=(",", ":")))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
