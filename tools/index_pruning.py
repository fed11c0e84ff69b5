"""File-level pruning counters for the persisted-index probes (r12).

The promoted probe rows' 100 TB story is "a small batch against a huge
index reads a small fraction of the index's bytes at rest" — plan-locked
(PartitionFilters on the layout column) but, until now, never measured.
This harness builds each index with a PRODUCTION-shaped directory count
(dedup prefix_len=3 -> 4096 band-hash-prefix dirs; neardup n_dirs=1024),
derives each probe batch's touched directories exactly the way the probe
does (same manifest parameters, same prefix/pmod expressions), and
records touched-vs-total directories and bytes at rest.

The law it checks: batch bands/probes hash uniformly over D dirs, so
expected coverage after k keys is D * (1 - (1 - 1/D)^k) — a SMALL batch
touches ~k dirs of D regardless of index size, and the fraction of index
bytes read falls as the index grows while the batch stays fixed.

Usage: python tools/index_pruning.py [n_corpus] [batch_sizes...]
       (default: 100000 10 100 1000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from decade3_pairs import synth_docs, synth_vecs



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

def dir_stats(bucket_root: str) -> dict:
    sizes = {}
    for d in os.listdir(bucket_root):
        p = os.path.join(bucket_root, d)
        if not os.path.isdir(p) or "=" not in d:
            continue
        sizes[d.split("=", 1)[1]] = sum(
            os.stat(os.path.join(p, f)).st_size
            for f in os.listdir(p)
            if not f.endswith(".crc")
        )
    return sizes


def expected_dirs(d_total: int, k_keys: int) -> float:
    return d_total * (1.0 - (1.0 - 1.0 / d_total) ** k_keys)


def main() -> None:
    from minivectordb_spark.operators.dedup import (
        _band_buckets,
        _shingle_frame,
        save_dedup_index,
        save_neardup_index,
    )
    from minivectordb_spark.operators.ann import random_projection_probes
    from minivectordb_spark.session import get_spark

    args = [int(a) for a in sys.argv[1:]]
    n_corpus = args[0] if args else 100_000
    batches = args[1:] or [10, 100, 1000]

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="index_pruning", cores=cpus,
                      shuffle_partitions=int(cpus))
    root = tempfile.mkdtemp(prefix="idx_pruning_")
    out: dict = {"n_corpus": n_corpus, "dedup": [], "neardup": []}

    # --- dedup index at production dir width ---
    didx = os.path.join(root, "didx")
    save_dedup_index(synth_docs(spark, n_corpus), didx, prefix_len=3)
    dm = _live_manifest(didx, "_dedup_index_manifest.json")
    dsizes = dir_stats(_live_data(didx, "_dedup_index_manifest.json", "buckets"))
    d_total_bytes = sum(dsizes.values())
    for b in batches:
        batch = synth_docs(spark, 10_000_000 + b).filter(
            F.col("doc_id") >= 10_000_000
        )
        sh = _shingle_frame(batch, "text", "doc_id", dm["k"])
        nb = _band_buckets(sh, "doc_id", dm["n_hashes"], dm["band_size"], dm["seed"])
        prefixes = {
            r["bp"]
            for r in nb.select(
                F.substring(F.col("band_hash"), 1, dm["prefix_len"]).alias("bp")
            ).distinct().collect()
        }
        touched = {p for p in prefixes if p in dsizes}
        t_bytes = sum(dsizes[p] for p in touched)
        n_bands = nb.count()
        out["dedup"].append({
            "batch_rows": b,
            "batch_bands": int(n_bands),
            "dirs_total": len(dsizes),
            "dirs_touched": len(touched),
            "dirs_expected": round(expected_dirs(16 ** dm["prefix_len"],
                                                 int(n_bands)), 1),
            "bytes_total": d_total_bytes,
            "bytes_touched": t_bytes,
            "bytes_frac": round(t_bytes / d_total_bytes, 4),
        })
        print(json.dumps({"dedup": out["dedup"][-1]}, separators=(",", ":")),
              flush=True)

    # --- neardup index at production dir width ---
    nidx = os.path.join(root, "nidx")
    save_neardup_index(synth_vecs(spark, n_corpus), nidx, n_dirs=1024)
    nm = _live_manifest(nidx, "_neardup_index_manifest.json")
    nsizes = dir_stats(_live_data(nidx, "_neardup_index_manifest.json", "buckets"))
    n_total_bytes = sum(nsizes.values())
    for b in batches:
        batch = synth_vecs(spark, 10_000_000 + b).filter(
            F.col("vec_id") >= 10_000_000
        )
        probes = random_projection_probes(
            batch, nm["planes"], id_col="vec_id", emb_col="embedding",
            max_probes=4,
        ).select(F.explode("probes").alias("p"))
        dirs = {
            str(r["bp"])
            for r in probes.select(
                F.pmod(F.col("p"), F.lit(nm["n_dirs"])).alias("bp")
            ).distinct().collect()
        }
        n_probes = probes.count()
        touched = {d for d in dirs if d in nsizes}
        t_bytes = sum(nsizes[d] for d in touched)
        out["neardup"].append({
            "batch_rows": b,
            "batch_probes": int(n_probes),
            "dirs_total": len(nsizes),
            "dirs_touched": len(touched),
            "dirs_expected": round(expected_dirs(nm["n_dirs"], int(n_probes)), 1),
            "bytes_total": n_total_bytes,
            "bytes_touched": t_bytes,
            "bytes_frac": round(t_bytes / n_total_bytes, 4),
        })
        print(json.dumps({"neardup": out["neardup"][-1]}, separators=(",", ":")),
              flush=True)

    print("index_pruning:", json.dumps(out, separators=(",", ":")))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
