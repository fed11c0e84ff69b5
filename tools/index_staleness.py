"""Frozen-index staleness law (VERDICT r11 item 4) + replay compaction
counter (item 7).

``save_neardup_index`` freezes its projection planes at build time; the
corpus then grows past the build point via ``update_neardup_index``
appends.  The bucket count is fixed at 2^P by the frozen planes, so
average occupancy — and with it probe cost — grows LINEARLY with the
corpus, while recall stays high (a sign-bit LSH with more collisions
generates MORE candidates, not fewer; the exact verify keeps the answer
right).  The staleness failure mode is therefore COST, not correctness:
the opposite of IVF, whose frozen centroids lose recall.  This harness
measures the curve so "rebuild when the corpus outgrows the planes" has
a number instead of prose:

  for growth in {1x, 10x, 100x}:
      stale  = index built at n0, grown to n by appends
      fresh  = index rebuilt at n (planes re-resolved, P grows)
      record occupancy (avg/max), candidates per probe row, probe wall,
      recall on planted exact duplicates, false drops on novel rows

The DEDUP (MinHash band) index is the contrast case: its parameters
(n_hashes, band_size, shingle k) are scale-free and band buckets live in
md5 hash space, so occupancy stays flat as appends grow the corpus — no
rebuild is ever needed for cost OR correctness; rebuilds only compact
replay bytes.  The harness records its occupancy at the same growth
points to pin that claim.

Replay compaction (item 7): re-appending a batch (the documented-benign
crash-replay case) duplicates its bucket rows.  The harness re-appends
one growth chunk, then records index bytes before/after, candidate
count before/after (identical — candidates are DISTINCT-ed), and
survivor identity — so "replay costs bytes only, reclaimed at rebuild"
carries numbers.

Usage: python tools/index_staleness.py [n0] [growths...]
       (default: 5000 1 10 100)
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


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.stat(os.path.join(root, f)).st_size
    return total



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


def bucket_occupancy(spark, path: str, keys=("bucket",), manifest_name=None) -> dict:
    b = (
        _live_data(path, manifest_name, "buckets")
        if manifest_name
        else f"{path}/buckets"
    )
    occ = (
        spark.read.parquet(b)
        .groupBy(*keys)
        .count()
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.avg("count").alias("avg"),
            F.max("count").alias("mx"),
        )
        .first()
    )
    return {
        "buckets_used": int(occ["nb"]),
        "avg_occupancy": round(float(occ["avg"]), 1),
        "max_occupancy": int(occ["mx"]),
    }


def probe_neardup(spark, idx: str, n_corpus: int, q_half: int) -> dict:
    """Probe batch: q_half exact copies of indexed rows (planted dups,
    cosine 1.0 — must be rejected) + q_half novel rows from disjoint id
    space (should survive).  Returns recall/false-drop/candidate/wall."""
    from minivectordb_spark.operators.dedup import (
        neardup_against_indexed,
        neardup_index_candidates,
    )

    stride = max(1, n_corpus // q_half)
    dups = (
        synth_vecs(spark, n_corpus)
        .filter((F.col("vec_id") % stride == 0) & (F.col("vec_id") % 50 != 1))
        .limit(q_half)
        .select((F.col("vec_id") + 10_000_000_000).alias("vec_id"), "embedding")
    )
    novel = synth_vecs(spark, 10_000_000 + q_half).filter(
        F.col("vec_id") >= 10_000_000
    )
    batch = dups.unionAll(novel).localCheckpoint()
    t0 = time.time()
    cand = neardup_index_candidates(batch, idx, max_probes=4).count()
    surv = neardup_against_indexed(batch, idx, threshold=0.999, max_probes=4)
    kept = [r["vec_id"] for r in surv.select("vec_id").collect()]
    wall = round(time.time() - t0, 1)
    kept_dups = sum(1 for v in kept if v >= 10_000_000_000)
    kept_novel = sum(1 for v in kept if v < 10_000_000_000)
    q_total = batch.count()
    return {
        "probe_rows": int(q_total),
        "candidates": int(cand),
        "cand_per_row": round(cand / max(q_total, 1), 1),
        "recall_planted": round((q_half - kept_dups) / q_half, 4),
        "false_drops_novel": int(q_half - kept_novel),
        "probe_wall_sec": wall,
    }


def probe_dedup(spark, idx: str, n_corpus: int, q_half: int) -> dict:
    from minivectordb_spark.operators.dedup import dedup_against_indexed

    stride = max(1, n_corpus // q_half)
    dups = (
        synth_docs(spark, n_corpus)
        .filter((F.col("doc_id") % stride == 0) & (F.col("doc_id") % 50 != 1))
        .limit(q_half)
        .select((F.col("doc_id") + 10_000_000_000).alias("doc_id"), "text")
    )
    novel = synth_docs(spark, 10_000_000 + q_half).filter(
        F.col("doc_id") >= 10_000_000
    )
    batch = dups.unionAll(novel).localCheckpoint()
    t0 = time.time()
    surv = dedup_against_indexed(batch, idx, threshold=0.5)
    kept = [r["doc_id"] for r in surv.select("doc_id").collect()]
    wall = round(time.time() - t0, 1)
    kept_dups = sum(1 for v in kept if v >= 10_000_000_000)
    kept_novel = sum(1 for v in kept if v < 10_000_000_000)
    return {
        "probe_rows": int(batch.count()),
        "recall_planted": round((q_half - kept_dups) / q_half, 4),
        "false_drops_novel": int(q_half - kept_novel),
        "probe_wall_sec": wall,
    }


def main() -> None:
    from minivectordb_spark.operators.dedup import (
        save_dedup_index,
        save_neardup_index,
        update_dedup_index,
        update_neardup_index,
    )
    from minivectordb_spark.session import get_spark

    args = [int(a) for a in sys.argv[1:]]
    n0 = args[0] if args else 5_000
    growths = args[1:] or [1, 10, 100]
    q_half = 100

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="index_staleness", cores=cpus,
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus)),
    )
    root = tempfile.mkdtemp(prefix="idx_staleness_")
    out: dict = {"n0": n0, "neardup": {}, "dedup": {}, "replay": {}}

    # --- neardup: stale (grown by appends) vs fresh (rebuilt) ---
    stale = os.path.join(root, "nd_stale")
    save_neardup_index(synth_vecs(spark, n0), stale)
    prev_n = n0
    for g in growths:
        n = n0 * g
        if n > prev_n:
            chunk = synth_vecs(spark, n).filter(F.col("vec_id") >= prev_n)
            update_neardup_index(chunk, stale)
            prev_n = n
        rec = {"n": n, "stale": bucket_occupancy(spark, stale, manifest_name="_neardup_index_manifest.json")}
        rec["stale"].update(probe_neardup(spark, stale, n, q_half))
        if g > 1:
            fresh = os.path.join(root, f"nd_fresh_{g}")
            save_neardup_index(synth_vecs(spark, n), fresh)
            rec["fresh"] = bucket_occupancy(spark, fresh, manifest_name="_neardup_index_manifest.json")
            rec["fresh"].update(probe_neardup(spark, fresh, n, q_half))
            rec["fresh"]["n_planes"] = len(
                _live_manifest(fresh, "_neardup_index_manifest.json")["planes"]
            )
            shutil.rmtree(fresh)
        rec["stale"]["n_planes"] = len(
            _live_manifest(stale, "_neardup_index_manifest.json")["planes"]
        )
        out["neardup"][f"{g}x"] = rec
        print(json.dumps({f"neardup_{g}x": rec}, separators=(",", ":")), flush=True)

    # --- replay compaction: re-append the last chunk, nothing changes but bytes ---
    last_g = growths[-1]
    n = n0 * last_g
    pre_bytes = dir_bytes(stale)
    pre_probe = probe_neardup(spark, stale, n, q_half)
    replay_chunk = synth_vecs(spark, n).filter(
        F.col("vec_id") >= (n0 * (growths[-2] if len(growths) > 1 else 1))
    )
    update_neardup_index(replay_chunk, stale)
    post_bytes = dir_bytes(stale)
    post_probe = probe_neardup(spark, stale, n, q_half)
    out["replay"] = {
        "replayed_rows": int(replay_chunk.count()),
        "bytes_before": pre_bytes,
        "bytes_after": post_bytes,
        "bytes_growth_pct": round(100 * (post_bytes - pre_bytes) / pre_bytes, 1),
        "candidates_before": pre_probe["candidates"],
        "candidates_after": post_probe["candidates"],
        "recall_before": pre_probe["recall_planted"],
        "recall_after": post_probe["recall_planted"],
        "false_drops_after": post_probe["false_drops_novel"],
    }
    print(json.dumps({"replay": out["replay"]}, separators=(",", ":")), flush=True)

    # --- dedup contrast: scale-free parameters, occupancy stays flat ---
    dstale = os.path.join(root, "dd_stale")
    save_dedup_index(synth_docs(spark, n0), dstale)
    prev_n = n0
    for g in growths:
        n = n0 * g
        if n > prev_n:
            chunk = synth_docs(spark, n).filter(F.col("doc_id") >= prev_n)
            update_dedup_index(chunk, dstale)
            prev_n = n
        rec = {"n": n}
        rec.update(bucket_occupancy(spark, dstale, keys=("band_idx", "band_hash"), manifest_name="_dedup_index_manifest.json"))
        rec.update(probe_dedup(spark, dstale, n, q_half))
        out["dedup"][f"{g}x"] = rec
        print(json.dumps({f"dedup_{g}x": rec}, separators=(",", ":")), flush=True)

    print("index_staleness:", json.dumps(out, separators=(",", ":")))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
