"""Measure mapInArrow kernel cost vs partition width (r15 item 1).

The r14 verdict's inverse 8c/32c scaling on every Arrow-kernel row points
at per-task boundary overhead dominating tiny sf0.1 batches.  This probe
times each kernel (and its retained Catalyst twin) at widths 1..32 over
the real bench tables so the ensure_parallelism width policy can be
derived from measurement, not guessed (guide §1).

Usage: python tools/width_probe.py [sf_dir] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from minivectordb_spark.session import get_spark


def timeit(df, runs=3):
    best = None
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    spark = get_spark(app_name="width_probe", cores=cpus, shuffle_partitions=int(cpus))
    sc = spark.sparkContext

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # warmup: fork workers, codegen, noop init
    docs.limit(1).write.format("noop").mode("overwrite").save()

    def _ident(batches):
        for b in batches:
            yield b

    spark.range(0, 10000, 1, 32).mapInArrow(_ident, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    from minivectordb_spark.operators import kernels
    from minivectordb_spark.operators.dedup import shingle_hashes
    from minivectordb_spark.operators.prep import _dsir_feature_buckets
    from minivectordb_spark.operators.text import tokens

    widths = [1, 2, 4, 8, 16, 32]
    out: dict = {"sf_dir": sf_dir, "cpus": cpus}

    id_field = docs.schema["doc_id"]
    sh_schema = T.StructType(
        [id_field, T.StructField("sh", T.ArrayType(T.LongType()), True)]
    )
    b_schema = T.StructType(
        [id_field, T.StructField("__b", T.ArrayType(T.LongType()), True)]
    )

    res = {}
    for w in widths:
        base = docs.select("doc_id", "text").repartition(w)
        sc.setJobDescription(f"shingle kernel w={w}")
        k = timeit(base.mapInArrow(kernels.shingle_mapper("text", "doc_id", 5), sh_schema))
        sc.setJobDescription(f"dsir kernel w={w}")
        d = timeit(
            base.mapInArrow(
                kernels.dsir_bucket_mapper("text", "doc_id", 10000), b_schema
            )
        )
        sc.setJobDescription(f"identity mapInArrow w={w}")
        i = timeit(base.mapInArrow(_ident, docs.select("doc_id", "text").schema))
        res[w] = {"shingle_kernel": k, "dsir_kernel": d, "identity": i}
    out["kernel_by_width"] = res

    # Catalyst twins (width as repartitioned too, for apples-to-apples)
    twin = {}
    for w in (8, 32):
        base = docs.select("doc_id", "text").repartition(w)
        sc.setJobDescription(f"shingle twin w={w}")
        s = timeit(base.select("doc_id", shingle_hashes(F.col("text"), 5).alias("sh")))
        sc.setJobDescription(f"dsir twin w={w}")
        d = timeit(
            base.select(
                "doc_id",
                _dsir_feature_buckets(tokens(F.col("text")), 10000).alias("__b"),
            )
        )
        twin[w] = {"shingle_twin": s, "dsir_twin": d}
    out["catalyst_twin_by_width"] = twin

    # no-repartition variants: kernel straight on the 1-split scan
    sc.setJobDescription("shingle kernel no-repartition")
    out["shingle_kernel_noreparts"] = timeit(
        docs.select("doc_id", "text").mapInArrow(
            kernels.shingle_mapper("text", "doc_id", 5), sh_schema
        )
    )

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
