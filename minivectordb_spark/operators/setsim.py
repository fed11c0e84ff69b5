"""Exact set-similarity self-join via prefix filtering (AllPairs / PPJoin
family: Bayardo et al. WWW'07, Xiao et al. WWW'08).

The exact counterpart to MinHash-LSH (`operators/dedup.py`): LSH trades
recall for candidate sparsity; prefix filtering keeps EXACT recall — every
pair with Jaccard >= tau is emitted, provably — while still never going
all-pairs.  The pruning theorem: order the token universe by any fixed
total order; if J(A, B) >= tau then A and B must share at least one token
inside their length-(|S| - ceil(tau*|S|) + 1) prefixes under that order.
So an equi-join on prefix tokens is a COMPLETE candidate generator, and
ordering by ascending document frequency (rarest first) makes the prefix
postings lists short: globally frequent tokens sit at the tail of every
ordered set and never enter a prefix, so no posting list is corpus-sized.
That is the 100 TB story — candidate volume is driven by rare-token
co-occurrence (near-dups), not by N^2 and not by stop-token skew.

Pipeline (all declarative, three shuffles total):

  1. postings:   explode distinct per-doc element hashes  ->  (id, h)
  2. df:         groupBy(h).count  (partial-aggregated)   ->  (h, df)
  3. order key:  k = df * 2^33 + h  — injective (h < 2^32), ascending df
                 with hash tiebreak gives one global total order both
                 engines reproduce bit-exactly
  4. ordered set: groupBy(id) sort_array(collect_list(k)); n = |set|
  5. prefix:     p = n - ceil(tau*n) + 1 (exact integer arithmetic on
                 micro-units); explode slice(arr, 1, p)
  6. candidates: prefix self-join on k with id_a < id_b and the symmetric
                 size filter tau*n_a <= n_b (J >= tau  =>  min/max >= tau),
                 DISTINCT pairs
  7. verify:     join the full ordered arrays back, exact intersection;
                 keep inter * 1e6 >= tau_micro * (n_a + n_b - inter)
                 — an integer predicate, identical on any engine.

Reference analogue: none (the reference's only dedup surface is
brute-force cosine, `vector_database.py:466-536`); this extends the
corpus-dedup family the way a 100 TB training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minivectordb_spark.operators.dedup import _shingle_frame, _reused

MICRO = 1_000_000
# df * 2^33 + h keeps the key injective (h < 2^32) and sortable well under
# the int64 boundary for any corpus below 2^30 distinct-bearing documents.
_KEY_BASE = 1 << 33


def _ordered_set_frame(
    sets_df: DataFrame, id_col: str, side_col: str | None = None
) -> DataFrame:
    """(id[, side], arr, n): each row's element-hash set as an array of
    composite order keys sorted by (global document frequency asc, hash
    asc).

    ``sets_df`` is (id, sh: array<long>) with DISTINCT element hashes.
    One explode feeds both the df aggregate and the re-group; the join on
    h is a plain hash equi-join (broadcast when the vocabulary is small,
    shuffle otherwise — AQE's call, not ours).  ``side_col`` (for the
    cross-corpus variant) is carried through via first() — ids must be
    unique across sides.
    """
    carry = [side_col] if side_col else []
    posting = sets_df.select(
        F.col(id_col), *carry, F.explode("sh").alias("__h")
    )
    df_tbl = posting.groupBy("__h").agg(F.count("*").alias("__df"))
    keyed = posting.join(df_tbl, "__h").select(
        id_col,
        *carry,
        (F.col("__df") * F.lit(_KEY_BASE) + F.col("__h")).alias("__k"),
    )
    aggs = [
        F.sort_array(F.collect_list("__k")).alias("arr"),
        F.count("*").alias("n"),
    ]
    if side_col:
        aggs.append(F.first(side_col).alias(side_col))
    return keyed.groupBy(id_col).agg(*aggs)


def _prefix_frame(ordered: DataFrame, id_col: str, tau_micro: int) -> DataFrame:
    """(id, n, __k): the first p = n - ceil(tau*n) + 1 order keys of each
    ordered set, exploded into prefix postings.  ceil on micro-units is
    exact integer arithmetic: ceil(tau*n) = (n*tau_u + MICRO-1) DIV MICRO
    — Spark's integer ``DIV``, identical to DuckDB's ``//`` on BIGINT
    (never a float quotient, so no floor-of-rounded-ratio edge)."""
    p = F.expr(
        f"CAST(n + 1 - (n * {tau_micro}L + {MICRO - 1}) DIV {MICRO} AS INT)"
    )
    carry = [c for c in ordered.columns if c not in (id_col, "arr", "n")]
    return ordered.select(
        F.col(id_col),
        F.col("n"),
        *carry,
        F.explode(F.slice("arr", 1, p)).alias("__k"),
    )


def setsim_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs with exact word-k-gram-shingle Jaccard >= ``threshold``.

    Output: (id_a, id_b, jaccard) with id_a < id_b — the same shape as
    ``minhash_dedup_pairs`` but with EXACT recall (no banding misses) and
    candidates bounded by the prefix-filter theorem instead of LSH bucket
    collisions.  ``threshold`` is frozen to integer micro-units so the
    prefix length, the size filter, and the verify predicate are all
    integer arithmetic — bit-identical across engines.
    """
    tau_micro = int(round(threshold * MICRO))
    sets = _reused(_shingle_frame(df, text_col, id_col, k))
    ordered = _reused(_ordered_set_frame(sets, id_col))
    prefix = _prefix_frame(ordered, id_col, tau_micro)

    left = prefix.select(
        F.col(id_col).alias("id_a"), F.col("n").alias("n_a"), "__k"
    )
    right = prefix.select(
        F.col(id_col).alias("id_b"), F.col("n").alias("n_b"), "__k"
    )
    cand = (
        left.join(right, "__k")
        .where(
            (F.col("id_a") < F.col("id_b"))
            # J >= tau  =>  min(n_a,n_b) >= tau * max(n_a,n_b); both
            # directions as one symmetric integer predicate
            & (F.col("n_a") * F.lit(MICRO) >= F.col("n_b") * F.lit(tau_micro))
            & (F.col("n_b") * F.lit(MICRO) >= F.col("n_a") * F.lit(tau_micro))
        )
        .select("id_a", "id_b")
        .distinct()
    )

    arr_a = ordered.select(
        F.col(id_col).alias("id_a"), F.col("arr").alias("__aa"), F.col("n").alias("n_a")
    )
    arr_b = ordered.select(
        F.col(id_col).alias("id_b"), F.col("arr").alias("__ab"), F.col("n").alias("n_b")
    )
    verified = (
        cand.join(arr_a, "id_a")
        .join(arr_b, "id_b")
        .withColumn("__i", F.size(F.array_intersect("__aa", "__ab")))
        .where(
            F.col("__i") * F.lit(MICRO)
            >= F.lit(tau_micro) * (F.col("n_a") + F.col("n_b") - F.col("__i"))
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("__i") / (F.col("n_a") + F.col("n_b") - F.col("__i")), 6
            ).alias("jaccard"),
        )
    )
    return verified


def setsim_diagnostics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> dict[str, int]:
    """Falsifiable scale counters for the prefix filter: corpus size,
    prefix-posting volume, candidate pairs (post size-filter, pre-verify),
    output pairs, and the largest prefix-posting list (the skew bound —
    at any scale this must stay << n_docs for the 100 TB claim to hold).
    Mirrors ``range_join_diagnostics`` / linkage counters in bench."""
    tau_micro = int(round(threshold * MICRO))
    sets = _reused(_shingle_frame(df, text_col, id_col, k))
    ordered = _reused(_ordered_set_frame(sets, id_col))
    prefix = ordered.select(
        F.col(id_col),
        F.col("n"),
        F.explode(
            F.slice(
                "arr",
                1,
                (
                    F.col("n")
                    - F.floor(
                        (F.col("n") * F.lit(tau_micro) + F.lit(MICRO - 1))
                        / F.lit(MICRO)
                    )
                    + F.lit(1)
                ).cast("int"),
            )
        ).alias("__k"),
    )
    prefix = _reused(prefix)
    n_docs = ordered.count()
    postings = prefix.count()
    max_posting = (
        prefix.groupBy("__k").count().agg(F.max("count")).collect()[0][0]
    )
    left = prefix.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"), "__k")
    right = prefix.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"), "__k")
    cand = (
        left.join(right, "__k")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("n_a") * F.lit(MICRO) >= F.col("n_b") * F.lit(tau_micro))
            & (F.col("n_b") * F.lit(MICRO) >= F.col("n_a") * F.lit(tau_micro))
        )
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    out = setsim_pairs(df, text_col, id_col, k, threshold).count()
    return {
        "n_docs": int(n_docs),
        "prefix_postings": int(postings),
        "max_posting_list": int(max_posting or 0),
        "candidate_pairs": int(cand),
        "output_pairs": int(out),
    }


def setsim_against(
    new_df: DataFrame,
    ref_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Cross-corpus EXACT dedup: rows of ``new_df`` minus every row whose
    exact shingle Jaccard against ANY ``ref_df`` row reaches
    ``threshold`` — the exact-recall twin of ``dedup.dedup_against``
    (which uses approximate MinHash banding).

    One global (df, hash) order is computed over the COMBINED corpus
    (required by the prefix theorem: both prefixes must come from the
    same total order), then candidate generation is a new-prefix x
    ref-prefix hash equi-join — never new x new or ref x ref, and at
    real scale the reference side's ordered/prefix frames are computed
    once and persisted.  Ids must be unique across the two frames."""
    tau_micro = int(round(threshold * MICRO))
    sets_n = _shingle_frame(new_df, text_col, id_col, k).withColumn(
        "__side", F.lit("n")
    )
    sets_r = _shingle_frame(ref_df, text_col, id_col, k).withColumn(
        "__side", F.lit("r")
    )
    ordered = _reused(
        _ordered_set_frame(sets_n.unionByName(sets_r), id_col, "__side")
    )
    prefix = _prefix_frame(ordered, id_col, tau_micro)
    pn = prefix.where(F.col("__side") == "n").select(
        F.col(id_col).alias("id_n"), F.col("n").alias("n_n"), "__k"
    )
    pr = prefix.where(F.col("__side") == "r").select(
        F.col(id_col).alias("id_r"), F.col("n").alias("n_r"), "__k"
    )
    cand = (
        pn.join(pr, "__k")
        .where(
            (F.col("n_n") * F.lit(MICRO) >= F.col("n_r") * F.lit(tau_micro))
            & (F.col("n_r") * F.lit(MICRO) >= F.col("n_n") * F.lit(tau_micro))
        )
        .select("id_n", "id_r")
        .distinct()
    )
    arr_n = ordered.select(
        F.col(id_col).alias("id_n"), F.col("arr").alias("__an"), F.col("n").alias("n_n")
    )
    arr_r = ordered.select(
        F.col(id_col).alias("id_r"), F.col("arr").alias("__ar"), F.col("n").alias("n_r")
    )
    flagged = (
        cand.join(arr_n, "id_n")
        .join(arr_r, "id_r")
        .withColumn("__i", F.size(F.array_intersect("__an", "__ar")))
        .where(
            F.col("__i") * F.lit(MICRO)
            >= F.lit(tau_micro) * (F.col("n_n") + F.col("n_r") - F.col("__i"))
        )
        .select(F.col("id_n").alias(id_col))
        .distinct()
    )
    return new_df.join(flagged, id_col, "left_anti")
