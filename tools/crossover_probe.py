"""Find the corpus-size crossover between the Arrow kernel chain and the
retained Catalyst expression chain (r15 item 1: size-gated dispatch).

Replicates the sf0.1 documents table x{1,4,10,30} (distinct ids) and times
the full shingle -> band pass both ways, at the width policy each side
would use.  Usage: python tools/crossover_probe.py [sf_dir] [cpus]
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
    spark = get_spark(app_name="crossover", cores=cpus, shuffle_partitions=int(cpus))
    sc = spark.sparkContext

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.limit(1).write.format("noop").mode("overwrite").save()

    def _ident(b):
        yield from b

    spark.range(0, 10000, 1, 32).mapInArrow(_ident, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    from minivectordb_spark.operators import kernels
    from minivectordb_spark.operators.dedup import (
        minhash_from_hashes,
        shingle_hashes,
    )
    from minivectordb_spark.operators.util import materialize

    N_HASHES, BAND_SIZE, K = 16, 2, 5
    n_bands = N_HASHES // BAND_SIZE

    id_field = docs.schema["doc_id"]
    sh_schema = T.StructType(
        [id_field, T.StructField("sh", T.ArrayType(T.LongType()), True)]
    )

    out = {}
    for mult in (1, 4, 10, 30):
        rep = docs.select("doc_id", "text")
        if mult > 1:
            rep = rep.crossJoin(
                spark.range(mult).select(F.col("id").alias("__m"))
            ).select(
                (F.col("doc_id") * mult + F.col("__m")).alias("doc_id"), "text"
            )
        n_rows = 5000 * mult
        # width each side would use: kernel ~96KB/task, expr widened to cores
        kb = 594 * mult
        kw = max(1, min(int(cpus), (kb + 95) // 96))
        rep_k = rep.repartition(kw)
        rep_e = rep.repartition(int(cpus))

        # kernel chain: shingle kernel -> band kernel (2 crossings)
        sh_k = rep_k.mapInArrow(
            kernels.shingle_mapper("text", "doc_id", K), sh_schema
        )
        band_k = sh_k.mapInArrow(
            kernels.band_mapper("doc_id", N_HASHES, BAND_SIZE, 42),
            T.StructType(
                [
                    id_field,
                    T.StructField("band_idx", T.IntegerType(), False),
                    T.StructField("band_hash", T.StringType(), False),
                ]
            ),
        )
        sc.setJobDescription(f"kernel chain x{mult} w={kw}")
        t_k = timeit(band_k)

        # expr chain: staged shingles -> minhash -> band digests (0 crossings)
        sh_e = materialize(
            rep_e, shingle_hashes(F.col("text"), K), "sh", ["doc_id"]
        )
        sig_df = materialize(
            sh_e, minhash_from_hashes(F.col("sh"), N_HASHES, 42), "__sig", ["doc_id"]
        )
        bands = F.array(
            *[
                F.md5(
                    F.concat_ws(
                        "_",
                        F.lit(b),
                        *[
                            F.element_at(
                                F.col("__sig"), b * BAND_SIZE + j + 1
                            ).cast("string")
                            for j in range(BAND_SIZE)
                        ],
                    )
                )
                for b in range(n_bands)
            ]
        )
        band_e = sig_df.select(
            F.col("doc_id"), F.posexplode(bands).alias("band_idx", "band_hash")
        )
        sc.setJobDescription(f"expr chain x{mult}")
        t_e = timeit(band_e)
        out[mult] = {"rows": n_rows, "kb": kb, "kernel": t_k, "expr": t_e, "kw": kw}
        print(json.dumps({mult: out[mult]}), flush=True)

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
