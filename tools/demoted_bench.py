"""Per-round walls for the demoted registry (VERDICT r7 item 3).

The 60+ demoted queries run the full oracle compare every round
(tests/test_demoted_queries.py) but were never TIMED — a rotation could
park a perf regression where the bench can't see it.  This records a
single-run wall per demoted query at the gate scale (sf0.01), through
the same noop sink the main bench uses, into DEMOTED_WALLS.json.

Single-run is deliberate: the goal is a committed trend line that flags
a query whose wall jumps round-over-round, not a steady-state benchmark
(the graded window already gets min-of-2).  Absolute values therefore
carry cold-codegen noise; compare ROUND-OVER-ROUND, and confirm any
jump with tools/standalone_bench.py before acting on it.

Usage: python tools/demoted_bench.py            (standalone)
       bench.py calls demoted_walls_section()    (per round)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


DRIFT_RATIO = 2.0
DRIFT_FLOOR_SEC = 0.5  # sub-half-second walls are scheduler noise at 1 run


def drift_section(
    walls: dict,
    prev_path: str,
    sf_dir: str | None = None,
    attribute: bool = True,
) -> dict:
    """Round-over-round drift gate (VERDICT r8 item 4): compare this
    round's demoted walls against the previously COMMITTED
    DEMOTED_WALLS.json and list every row whose wall grew more than
    DRIFT_RATIO x — a rotation can no longer park a regression where
    only a human diff would see it.  Rows under DRIFT_FLOOR_SEC on both
    sides are skipped (single-run sub-second walls flap with cold
    codegen, documented above).

    r11: flagged rows are AUTO-ATTRIBUTED standalone-cold (a fresh
    process, min-of-3, via the graded gate's shared helper) — the two
    catches this gate made in r10/r11 (corpus_pipeline, insert_unique)
    both needed the same manual protocol, so it is now mechanical:
    ``noise`` if the cold wall is back inside the ratio band of the
    previous round, ``reproduced`` otherwise."""
    try:
        with open(prev_path) as f:
            prev = json.load(f).get("queries", {})
    except (OSError, ValueError):
        return {"prev_found": False, "flagged": {}}
    flagged = {}
    for name, wall in walls.items():
        p = prev.get(name)
        if p is None or p <= 0 or wall <= 0:
            continue
        if max(p, wall) < DRIFT_FLOOR_SEC:
            continue
        # sub-floor prevs cannot support a ratio test (see
        # tools/graded_drift.py — the r11 fingerprints false catch): the
        # new wall must exceed ratio x max(prev, floor)
        if wall > DRIFT_RATIO * max(p, DRIFT_FLOOR_SEC):
            flagged[name] = {"prev": p, "now": wall,
                             "ratio": round(wall / p, 2)}
    if flagged and attribute and sf_dir:
        from tools.graded_drift import MAX_ATTRIBUTED, _standalone_cold

        by_ratio = sorted(flagged, key=lambda n: -flagged[n]["ratio"])
        names = by_ratio[:MAX_ATTRIBUTED]
        cold = _standalone_cold(
            names, sf_dir, os.environ.get("SPARK_GRAFT_CPUS", "32")
        )
        for name in names:
            c = cold.get(name)
            row = flagged[name]
            if c is None:
                row["attribution"] = "attribution_failed"
                continue
            row["standalone_cold"] = c
            row["attribution"] = (
                "noise" if c <= DRIFT_RATIO * row["prev"] else "reproduced"
            )
        for name in by_ratio[MAX_ATTRIBUTED:]:
            flagged[name]["attribution"] = "not_attributed_cap"
    return {"prev_found": True, "ratio_gate": DRIFT_RATIO,
            "floor_sec": DRIFT_FLOOR_SEC, "flagged": flagged}


def demoted_walls_section(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entry

    # queries whose builder accepts _wave_walls: the recorded wall is
    # split into named phases (VERDICT r8 item 5 — durable_cdc's wall is
    # three CoW streaming MERGE commits + one read; one number made the
    # "IO, not plan" claim unfalsifiable)
    WAVE_TIMED = {"durable_cdc"}
    walls = {}
    waves: dict[str, dict] = {}
    t_all = time.time()
    for name, fn in entry.demoted_queries().items():
        t0 = time.time()
        try:
            if name in WAVE_TIMED:
                wv: dict[str, float] = {}
                fn(spark, sf_dir, _wave_walls=wv).write.format("noop").mode(
                    "overwrite"
                ).save()
                total = round(time.time() - t0, 3)
                # the remainder after the TOP-LEVEL wave walls only:
                # embed_*/commit_* are sub-phases OF ingest_* (r10), so
                # summing every key would double-count them (the first
                # r10 run derived final_read = -2.97 s that way)
                wv["final_read"] = round(
                    total
                    - sum(v for k, v in wv.items() if k.startswith("ingest_")),
                    3,
                )
                walls[name] = total
                waves[name] = wv
            else:
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls[name] = round(time.time() - t0, 3)
        except Exception as e:
            print(f"demoted bench error in {name}: {e}", file=sys.stderr)
            walls[name] = -1.0
    prev_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DEMOTED_WALLS.json",
    )
    return {
        "metric": "demoted_wall_sec_single_run",
        "sf_dir": sf_dir,
        "n_queries": len(walls),
        "total_wall_sec": round(time.time() - t_all, 3),
        "drift": drift_section(walls, prev_path, sf_dir=sf_dir),
        "waves": waves,
        "queries": walls,
    }


def main():
    from minivectordb_spark.session import get_spark

    sf_dir = os.environ.get(
        "SPARK_GRAFT_DEMOTED_SF_DIR", "/root/testdata/sf0.01"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="demoted_bench", cores=cpus, shuffle_partitions=int(cpus)
    )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    # the same load-context sentinel the graded gate carries (r11: three
    # consecutive standalone runs read 98 -> 115 -> 135 s for the same
    # 88 rows with zero query changes — host load, visible only if the
    # artifact records it)
    from tools.graded_drift import IDLE_JVM_CALIB

    best = None
    for _ in range(3):
        t0 = time.time()
        spark.range(0, 1_200_000_000, 1, int(cpus)).selectExpr(
            "sum((id * id) % 1000003) AS s"
        ).write.format("noop").mode("overwrite").save()
        best = min(best or 9e9, time.time() - t0)
    out = demoted_walls_section(spark, sf_dir)
    out["jvm_calib"] = round(best, 3)
    out["host_load_factor"] = round(best / IDLE_JVM_CALIB, 2)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DEMOTED_WALLS.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
