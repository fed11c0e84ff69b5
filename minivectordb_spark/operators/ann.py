"""Approximate-nearest-neighbor operators over an embedding column.

Brute-force exact cosine (scoring.knn) is the correctness baseline; the
scale path is IVF-style partitioning:

- ``ivf_assign``: every vector joins to its nearest of K centroids — a
  broadcast nested-loop join (centroids are tiny) + per-vector argmin via a
  window.  At 100 TB the output would be WRITTEN partitioned by
  ``centroid_id`` so probes read only nprobe/K of the data (partition
  pruning does the index's job).
- ``ivf_search``: rank centroids for the query, scan only the nprobe
  nearest clusters, exact top-k within them.

Centroids here are seed rows (deterministic; a KMeans|| fit via MLlib drops
in without changing the query shape — the operators only assume a
(centroid_id, embedding) frame).

A random-projection LSH variant (sign-bit bucketing) gives the
hash-bucketed alternative: map-only bucket assignment, candidate = same
bucket, exactly the MinHash-LSH join shape but for dense vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from minivectordb_spark.scoring import cosine_sim, cosine_sim_cols


def seed_centroids(df: DataFrame, n: int, id_col: str = "vec_id", emb_col: str = "embedding") -> DataFrame:
    """Deterministic centroid set: the n lowest-id vectors.  Swap in
    MLlib KMeans centers for data-adaptive clustering; the contract is just
    (centroid_id, centroid_emb)."""
    return (
        df.orderBy(F.col(id_col).asc())
        .limit(n)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(emb_col).alias("centroid_emb"),
        )
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id, cos) — nearest centroid per vector.

    broadcast(centroids) cross-join + row_number window partitioned by the
    vector id: the corpus never shuffles for the join; the window
    repartitions by id only (and with AQE + small K this collapses to a
    cheap local top-1 per vector)."""
    joined = df.select(F.col(id_col), F.col(emb_col)).crossJoin(F.broadcast(centroids))
    sim = cosine_sim_cols(F.col(emb_col), F.col("centroid_emb"))
    w = Window.partitionBy(id_col).orderBy(F.col("__cos").desc(), F.col("centroid_id").asc())
    return (
        joined.withColumn("__cos", sim)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(id_col),
            F.col("centroid_id"),
            F.round(F.col("__cos"), 6).alias("centroid_cos"),
        )
    )


def ivf_search(
    df: DataFrame,
    centroids: DataFrame,
    query: list[float],
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Probe the nprobe nearest clusters, exact top-k within them.

    With the corpus persisted partitioned-by-centroid, the semi-join below
    becomes partition pruning and the scan reads nprobe/K of the files —
    the IVF speedup, expressed declaratively."""
    top_centroids = (
        centroids.withColumn("__qc", cosine_sim(F.col("centroid_emb"), query))
        .orderBy(F.col("__qc").desc(), F.col("centroid_id").asc())
        .limit(nprobe)
        .select("centroid_id")
    )
    assigned = ivf_assign(df, centroids, id_col, emb_col)
    probe_ids = assigned.join(F.broadcast(top_centroids), "centroid_id").select(id_col)
    candidates = df.join(F.broadcast(probe_ids), id_col, "left_semi")
    return (
        candidates.withColumn("score", F.round(cosine_sim(F.col(emb_col), query), 6))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(F.col(id_col), F.col("score"))
    )


def random_projection_buckets(
    df: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Sign-bit LSH bucket per vector: bit i = (embedding . plane_i) >= 0.
    Map-only; same-bucket rows are ANN candidates.  ``planes`` are
    deterministic literals so the oracle reproduces the bucketing."""
    bit_terms = []
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(F.col(emb_col).cast("array<double>"), arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit_terms.append(F.when(dot >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long")))
    bucket = bit_terms[0]
    for t in bit_terms[1:]:
        bucket = bucket + t
    return df.select(F.col(id_col), bucket.alias("bucket"))
