"""Partitioning / co-location / skew toolkit — the knobs that decide whether
a plan survives a 100x scale-up.

- ``save_bucketed`` / bucketed joins: two tables bucketed+sorted on the join
  key join with ZERO shuffle (bucket-local sort-merge).  This is how the
  engine co-locates repeated big-big joins (e.g. a vector table joined to a
  metadata table on id, or LSH bucket frames reused across runs) — pay the
  shuffle once at write time, never again at read time.
  tests/test_partitioning.py asserts the no-Exchange plan.
- ``salted_join``: for skewed join keys, explode the small side ``n_salt``
  ways and spray the big side's hot keys across salts, so no single reducer
  owns a hot key.  AQE's skew-join handles sort-merge skew adaptively;
  salting is the explicit fallback for broadcast-ineligible hot keys and
  for groupBy skew.
- ``repartition_for_write``: sizes output files (the shard_size analogue,
  sharded_vector_database.py:9) so downstream scans get uniform splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def save_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 32,
) -> None:
    """Persist bucketed+sorted on ``key`` via the session catalog.  Joins
    and aggregations on ``key`` between tables bucketed the same way skip
    the shuffle entirely."""
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the big side gets a deterministic salt in
    [0, n_salt) per row; the small side is replicated n_salt times; the join
    key becomes (key, salt).  Row multiplicity is preserved exactly — each
    big row matches exactly one replica of its key's small rows.

    Only ``inner`` and ``left`` are supported: for right/full/anti joins an
    unmatched small row would surface once per replica (n_salt copies),
    breaking the exact-multiplicity guarantee.
    """
    if how.lower().replace("_", "") not in ("inner", "left", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (got {how!r}): "
            "replicating the small side would emit unmatched small rows "
            "n_salt times under right/full/anti semantics"
        )
    salt = F.pmod(F.abs(F.xxhash64(*[F.col(c) for c in big.columns])), F.lit(n_salt))
    big_salted = big.withColumn("__salt", salt.cast("int"))
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out = big_salted.join(small_salted, [key, "__salt"], how)
    return out.drop("__salt")


def repartition_for_write(
    df: DataFrame,
    target_rows_per_file: int,
    total_rows: int | None = None,
) -> DataFrame:
    """Pick a file count from the data size (one pass if ``total_rows`` not
    given) so output files land near the target size — uniform splits for
    the next scan."""
    if total_rows is None:
        total_rows = df.count()
    n = max(1, (total_rows + target_rows_per_file - 1) // target_rows_per_file)
    return df.repartition(n)


def zorder_key(c1, c2, bits: int = 21) -> "Column":
    """Z-order (Morton) interleave of two non-negative integer columns —
    the lakehouse multi-column data-skipping key: rows sorted by this key
    cluster on BOTH dimensions at once, so parquet row-group min/max
    stats prune scans filtered on either column (Delta's OPTIMIZE ZORDER
    on plain parquet).  ``bits`` per dimension (default 21, so the
    interleaved key fits a signed 64-bit long with room to spare);
    values are clamped into [0, 2^bits) and NULLs coalesce to 0 — a NULL
    input must not yield a NULL key, or ``save_zordered`` would strand
    every null-keyed row unclustered in one range partition and silently
    weaken the skipping guarantee.

    Pure bit arithmetic, zero UDFs; pair with ``repartitionByRange`` +
    ``sortWithinPartitions(zorder_key(...))`` before a write."""
    from pyspark.sql import functions as F

    lo, hi = F.lit(0), F.lit((1 << bits) - 1)
    a = F.least(F.greatest(F.coalesce(c1.cast("long"), lo), lo), hi)
    b = F.least(F.greatest(F.coalesce(c2.cast("long"), lo), lo), hi)
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def save_zordered(
    df,
    path: str,
    c1: str,
    c2: str,
    n_files: int = 8,
    bits: int = 21,
) -> None:
    """Write ``df`` as parquet laid out in Z-order on (c1, c2): range-
    partition by the Morton key (each output file owns a contiguous key
    range = a square-ish tile of the 2-D space), sort within partitions,
    write.  A scan filtered on EITHER column then prunes most files via
    parquet min/max stats — the two-column generalization of
    ``VectorTable.save(cluster_by=...)``'s single-column clustering."""
    from pyspark.sql import functions as F

    keyed = df.withColumn("__z", zorder_key(F.col(c1), F.col(c2), bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
