"""Migration sources: read the reference's on-disk formats into a
VectorTable, so an existing MiniVectorDB deployment can switch engines
without re-ingesting.

Reference formats (studied, not executed — no reference code imported):

- single-file pickle (vector_database.py:538-548):
  ``{embeddings: np.ndarray(N,D) float32, metadata: list[dict],
     id_map: {row->uid}, inverse_id_map: {uid->row}, inverted_index}``
- sharded directory (sharded_vector_database.py:134-154): ``shard_{i}.pkl``
  files, each ``{embeddings, metadata, unique_ids, inverted_index}``,
  loaded in shard-number order (sharded_vector_database.py:41-71).

The id/inverted-index structures are positional artifacts of the reference's
execution model and are dropped — identity is the id column; the inverted
index's job is done by Parquet stats + pushdown (SURVEY.md §1.5).

Scale note: pickles are inherently single-process blobs, so migration is a
one-time driver-side read per file; for large sharded dirs the per-shard
loop could be parallelized with a binaryFile scan + mapInPandas unpickle,
but the target format (Parquet) is what the engine runs on afterwards.
"""

from __future__ import annotations

import glob
import os
import pickle
import re

from pyspark.sql import SparkSession

from minivectordb_spark.table import VectorTable


def _rows_from_arrays(embeddings, unique_ids, metadata_dicts):
    ids = [str(u) for u in unique_ids]
    vecs = [[float(x) for x in row] for row in embeddings]
    mds = [dict(m or {}) for m in metadata_dicts]
    return ids, vecs, mds


def load_reference_pickle(spark: SparkSession, path: str) -> VectorTable:
    """Read a single-file reference database (``db.pkl``) into a
    VectorTable.  Row order follows id_map's row numbering."""
    with open(path, "rb") as f:
        data = pickle.load(f)
    embeddings = data.get("embeddings")
    metadata = data.get("metadata") or []
    id_map = data.get("id_map") or {}
    if embeddings is None or len(id_map) == 0:
        return VectorTable.empty(spark)
    n = embeddings.shape[0]
    unique_ids = [id_map[row] for row in sorted(id_map)]
    if len(unique_ids) != n or len(metadata) != n:
        raise ValueError(
            f"Corrupt reference pickle: {n} embeddings, {len(unique_ids)} ids, "
            f"{len(metadata)} metadata rows"
        )
    ids, vecs, mds = _rows_from_arrays(embeddings, unique_ids, metadata)
    return VectorTable.empty(spark).store_embeddings_batch(ids, vecs, mds)


def load_reference_sharded_dir(spark: SparkSession, storage_dir: str) -> VectorTable:
    """Read a sharded reference directory (``shard_*.pkl``) into a
    VectorTable, shards in numeric order like the reference's loader."""
    shard_files = glob.glob(os.path.join(storage_dir, "shard_*.pkl"))

    def shard_no(p: str) -> int:
        m = re.search(r"shard_(\d+)\.pkl$", p)
        return int(m.group(1)) if m else -1

    all_ids: list = []
    all_vecs: list = []
    all_mds: list = []
    for path in sorted(shard_files, key=shard_no):
        with open(path, "rb") as f:
            data = pickle.load(f)
        if data.get("embeddings") is None or len(data.get("unique_ids") or []) == 0:
            continue
        ids, vecs, mds = _rows_from_arrays(
            data["embeddings"], data["unique_ids"], data.get("metadata") or [{}] * len(data["unique_ids"])
        )
        all_ids.extend(ids)
        all_vecs.extend(vecs)
        all_mds.extend(mds)
    if not all_ids:
        return VectorTable.empty(spark)
    return VectorTable.empty(spark).store_embeddings_batch(all_ids, all_vecs, all_mds)


def migrate_parquet(spark: SparkSession, src: str, dst: str, max_records_per_file: int | None = None) -> None:
    """Storage-format migration (≙ _convert_from_non_sharded_db,
    sharded_vector_database.py:26-33): one read, one write."""
    VectorTable.load(spark, src).save(dst, max_records_per_file=max_records_per_file)
