"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB over
the same parquet tables, compare row count + (name-sorted) columns +
order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Retired r7: the GATE_PINNED skip class is empty.  The formerly pinned
# twins are now scale-parameterized (neardup_lsh: prefix-stable plane
# literals + np computed from count(*); semantic_dedup: adaptive-K seed
# LIMIT as a scalar subquery) or ulp-stable (bigram_lm / lm_score: exact
# integer-micro average instead of a float round that could sit on a
# .5e-6 boundary), so every oracle compare runs at every scale.
GATE_SF = ("sf0.001", "sf0.01")
GATE_PINNED: dict[str, str] = {}


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(ddf):
        problems.append(f"rowcount spark={len(sdf)} duck={len(ddf)}")
    sc, dc = sorted(sdf.columns), sorted(ddf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    # strict-ish dtype check: kind (int/float/object) must agree per column
    for c in sc:
        ks, kd = sdf[c].dtype.kind, ddf[c].dtype.kind
        if len(sdf) and len(ddf) and ks != kd and {ks, kd} != {"i", "O"}:
            problems.append(f"dtype {c}: spark {sdf[c].dtype} vs duck {ddf[c].dtype}")
    if problems:
        return problems
    a, b = canon(sdf), canon(ddf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            import numpy as np

            eq = (av.values == bv.values) | (pd.isna(av.values) & pd.isna(bv.values))
            if not eq.all():
                bad = (~eq).sum()
                i = (~eq).argmax()
                problems.append(
                    f"col {c}: {bad} mismatches e.g. row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}"
                )
        else:
            if not av.astype(str).equals(bv.astype(str)):
                neq = (av.astype(str) != bv.astype(str))
                i = neq.idxmax()
                problems.append(
                    f"col {c}: {neq.sum()} mismatches e.g. row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from minivectordb_spark.session import get_spark

    spark = get_spark(app_name="check-oracle", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    # explicitly-named queries resolve from the demoted set too (demoted
    # rows run the same compare via tests/test_demoted_queries.py; naming
    # one here runs it on demand at any sf)
    if only:
        qs = {**entry.demoted_queries(), **qs}
        unknown = only - set(qs)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}")
            sys.exit(2)
    oracles = entry.oracle_sql()
    failed = []
    import os

    at_gate = os.path.basename(sf_dir.rstrip("/")) in GATE_SF
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if not at_gate and name in GATE_PINNED and name not in only:
            print(f"skip  {name}: gate-scale-pinned oracle — {GATE_PINNED[name]}")
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle (rows-only: {len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            failed.append(name)
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"ok    {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
    print()
    if failed:
        print(f"{len(failed)} FAILED: {failed}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
