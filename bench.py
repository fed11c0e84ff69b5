"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is forced through the `noop` sink so the FULL plan executes
(collect-side pruning can't skip the measured work).  The per-query wall
times are the feedback loop for plan tuning — compare against BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry
from minivectordb_spark.session import get_spark


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="bench", cores=cpus, shuffle_partitions=int(cpus))

    # warmup: pay one-time environment costs before any query is timed —
    # JVM/codegen/noop-sink init, file-listing, and Python-worker startup
    # (the first pandas-UDF/mapInPandas query otherwise gets billed for
    # forking the executor-side Python workers)
    # ivf_search_indexed's freshness-reuse index lives under tempdir and
    # would otherwise survive across bench PROCESSES, silently excluding
    # the build from even nominally-cold runs — clear it so run 1 prices a
    # cold build and min-of-2 records the warm probe (the intended
    # build-once / probe-many accounting, per-run instead of per-machine;
    # the separate ivf_index_build entry keeps the cold cost visible too)
    import shutil
    import tempfile

    from __spark_entry__ import _fixed_index_dir

    for kind in ("ivf", "ddidx", "ndidx"):
        shutil.rmtree(_fixed_index_dir(kind, sf_dir), ignore_errors=True)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    for t in ("embeddings", "documents", "events", "lineitem"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).write.format("noop").mode(
            "overwrite"
        ).save()

    def _py_identity(batches):
        for pdf in batches:
            yield pdf

    spark.range(0, 10000, 1, 32).selectExpr("id").mapInPandas(
        _py_identity, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # machine-load calibration sentinel (r8): a FIXED data-independent
    # workload timed after warmup — one JVM whole-stage-codegen burn and
    # one Arrow/Python-worker round-trip.  Query walls on this host vary
    # ~20-40% round-to-round with driver machine load (the r7
    # "regressions" were exactly this, attributed via standalone-cold
    # runs); the sentinel makes that skew visible IN the same JSON, so a
    # future round can normalize or discount totals before diagnosing
    # operators.  min-of-3 of a ~1 s workload.
    def _measure_calib() -> dict:
        c = {}
        best = None
        for _ in range(3):
            t0 = time.time()
            spark.range(0, 1_200_000_000, 1, 32).selectExpr(
                "sum((id * id) % 1000003) AS s"
            ).write.format("noop").mode("overwrite").save()
            best = min(best or 9e9, time.time() - t0)
        c["jvm_codegen_wall"] = round(best, 3)
        best = None
        for _ in range(3):
            t0 = time.time()
            spark.range(0, 2_000_000, 1, 32).selectExpr("id").mapInPandas(
                _py_identity, schema="id long"
            ).write.format("noop").mode("overwrite").save()
            best = min(best or 9e9, time.time() - t0)
        c["arrow_python_wall"] = round(best, 3)
        return c

    calib = _measure_calib()

    # min-of-3 for the graded window (VERDICT r8 item 2): two runs left
    # a single co-scheduled host spike able to dominate a query's min
    # (the unreproducible 8.08 s quality_classifier driver wall — its
    # standalone-cold x3 walls are 1.27-1.43 s); a third sample makes one
    # spike survivable.  Scaled/demoted sections keep their own run counts.
    RUNS = 3
    timings: dict[str, float] = {}
    t_all = time.time()
    for name, fn in entry.queries().items():
        # free the previous query's checkpoint blocks BEFORE timing this
        # one: ContextCleaner discovers dead RDDs via JVM weak refs, so
        # without a GC nudge blocks pile up across the 50-query loop and
        # later queries get billed for the heap pressure (their standalone
        # walls are lower than their in-loop walls).  Driver-side hygiene
        # of the harness, not of any query's plan.
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        best = None
        for _ in range(RUNS):
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            except Exception as e:  # a failing query counts as missing, not 0s
                print(f"bench error in {name}: {e}", file=sys.stderr)
                best = -1.0
                break
        timings[name] = round(best, 3)
    loop_wall = round(time.time() - t_all, 3)
    # calib AFTER the loop too: load during the measured window, not just
    # before it — the pre/post pair brackets the loop so a spike that
    # arrives mid-loop still shows in the artifact
    calib_post = _measure_calib()

    # The graded number is the SUM OF PER-QUERY MINS, not the loop wall:
    # with min-of-3 the loop wall includes two discarded runs per query
    # plus GC nudges, i.e. harness cost, not operator cost.  (Semantics
    # change r9 — r8 and earlier reported the loop wall; loop_wall_sec
    # keeps the old number for continuity.)
    total = round(sum(v for v in timings.values() if v > 0), 3)
    # errored queries (timing -1) must make the headline WORSE, not
    # quietly smaller (ADVICE r9): surface them as explicit fields so a
    # consumer comparing rounds can't mistake "one query broke" for
    # "the engine got faster".
    failed = sorted(k for k, v in timings.items() if v < 0)

    # calib-normalized total (VERDICT r8 item 2): scale by measured idle
    # sentinel / this run's sentinel so a judge can separate operator
    # regressions from host load without archaeology.  0.21 s is the
    # jvm_codegen idle baseline measured when the sentinel was built
    # (PLANS.md r8); the factor is clamped to <= 1 so normalization can
    # only DISCOUNT load, never flatter a fast machine.
    # use the MIN of the pre/post sentinels: the pre measurement runs
    # right after session warmup and can itself read high (measured
    # 0.555 pre vs 0.258 post on an idle machine), and normalizing by an
    # inflated sentinel would overstate the load discount — min is the
    # conservative load estimate
    IDLE_JVM_CALIB = 0.21
    run_calib = min(calib["jvm_codegen_wall"], calib_post["jvm_codegen_wall"])
    norm_factor = min(1.0, IDLE_JVM_CALIB / run_calib) if run_calib > 0 else 1.0
    total_norm = round(total * norm_factor, 3)

    # ivf_search_indexed's registry entry rebuilds the index every run (the
    # oracle contract covers build+probe); report the two costs separately
    # so probe-side regressions aren't hidden under build noise (VERDICT r3
    # item 8).  Expected: ivf_probe_only ~= ivf_search.
    try:
        import shutil
        import tempfile

        from minivectordb_spark.operators.ann import (
            ivf_search_indexed,
            save_ivf_index,
            seed_centroids,
        )

        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        idx = tempfile.mkdtemp(prefix="bench_ivf_")
        b_best = p_best = None
        for _ in range(RUNS):
            t0 = time.time()
            save_ivf_index(e, seed_centroids(e, entry.N_CENTROIDS), idx)
            dt = time.time() - t0
            b_best = dt if b_best is None else min(b_best, dt)
        for _ in range(RUNS):
            t0 = time.time()
            ivf_search_indexed(
                spark, idx, entry.QVEC, k=10, nprobe=entry.NPROBE
            ).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            p_best = dt if p_best is None else min(p_best, dt)
        timings["ivf_index_build"] = round(b_best, 3)
        timings["ivf_probe_only"] = round(p_best, 3)
        shutil.rmtree(idx, ignore_errors=True)
    except Exception as e:
        print(f"bench ivf split error: {e}", file=sys.stderr)

    # crash insurance: emit the main-loop line BEFORE the (long) scaled
    # section — the driver keeps the tail of stdout, so if the scaled run
    # is cut off by a timeout the per-query numbers still land; when the
    # bench completes, the final combined line below supersedes this one
    early = {
        # metric renamed r10 (ADVICE r9): the value has been the sum of
        # per-query mins since r9, not a loop wall — the name now says so.
        # Consumers keyed on the old name must check metric_prev.
        "metric": "sum_per_query_min_sec",
        "metric_prev": "total_wall_sec_all_queries",
        "value": total,
        "value_def": "sum_of_per_query_min",
        "n_failed": len(failed),
        "failed": failed,
        "partial": bool(failed),
        "value_norm": total_norm,
        "loop_wall_sec": loop_wall,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "runs_per_query": RUNS,
        "per_query_stat": "min",
        "sf": float(sf),
        "calib": calib,
        "calib_post": calib_post,
    }
    print(json.dumps(early, separators=(",", ":")), flush=True)

    # graded-row drift gate (VERDICT r10 item 3): the demoted registry
    # has had a ratio+floor drift flag since r8, but graded rows'
    # round-over-round movement was only visible to a human diffing
    # BENCH_r{N}.json files.  Compare vs the last committed round and
    # auto-attribute each flagged row standalone-cold (fresh process,
    # min-of-3) — "noise" if the cold wall is back in band, else
    # "reproduced".  Disable with SPARK_GRAFT_GRADED_DRIFT=0.
    graded_drift = None
    if os.environ.get("SPARK_GRAFT_GRADED_DRIFT", "1") != "0":
        try:
            from tools.graded_drift import graded_drift_section

            graded_drift = graded_drift_section(
                {k: v for k, v in timings.items()},
                float(sf),
                sf_dir,
                cpus,
                jvm_calib=run_calib,
            )
        except Exception as e:
            print(f"bench graded-drift error: {e}", file=sys.stderr)

    # measured-scaling section (factor-x replicated inputs through the same
    # query builders) — the mechanical regression check for plan shapes
    # whose cost must stay ~linear; disable with SPARK_GRAFT_SCALED=0
    scaled = None
    scaled2 = None
    if os.environ.get("SPARK_GRAFT_SCALED", "1") != "0":
        try:
            from tools.scaling_bench import default_scaled_base, scaled_section

            # ratios are the signal, not absolute seconds: run the scaled
            # comparison from the small base (sf0.01 when available) so the
            # whole bench stays bounded — sf0.1 x10 alone would take longer
            # than the entire main loop
            base_dir = os.environ.get(
                "SPARK_GRAFT_SCALED_BASE", default_scaled_base(sf_dir)
            )
            scaled = scaled_section(spark, base_dir, factor=10, runs=RUNS)
        except Exception as e:
            print(f"bench scaled-section error: {e}", file=sys.stderr)
        # second-decade check (VERDICT r5 stretch 7): sf0.1 x10 — 100x the
        # oracle gate's data — for the counter-instrumented queries only
        # (the ones whose 100 TB grade rests on recorded candidate/
        # occupancy counters).  ~4 min; disable with SPARK_GRAFT_SCALED2=0
        if os.environ.get("SPARK_GRAFT_SCALED2", "1") != "0":
            try:
                from tools.scaling_bench import scaled_section

                names = list(entry.scaling_counters().keys())
                # min-of-2 like every other number here: a single run
                # prices cold codegen into the ratio (measured: dedup_
                # groups 5.6 at runs=1 vs 2.2 at min-of-2)
                scaled2 = scaled_section(
                    spark, sf_dir, factor=10, runs=RUNS, queries=names
                )
            except Exception as e:
                print(f"bench scaled2-section error: {e}", file=sys.stderr)

    # demoted-registry walls (VERDICT r7 item 3): the demoted rows are
    # oracle-compared every round but were never timed — a rotation could
    # park a perf regression where the bench can't see it.  Single-run at
    # the gate scale (sf0.01); full detail to DEMOTED_WALLS.json +
    # BENCH_LOCAL.json, only the (count, total) summary on the compact
    # line.  Disable with SPARK_GRAFT_DEMOTED=0.
    demoted = None
    if os.environ.get("SPARK_GRAFT_DEMOTED", "1") != "0":
        try:
            from tools.demoted_bench import demoted_walls_section
            from tools.scaling_bench import default_scaled_base

            demoted = demoted_walls_section(
                spark, default_scaled_base(sf_dir)
            )
            with open(
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "DEMOTED_WALLS.json",
                ),
                "w",
            ) as f:
                json.dump(demoted, f, indent=1)
        except Exception as e:
            print(f"bench demoted-section error: {e}", file=sys.stderr)

    out = {
        # metric renamed r10 (ADVICE r9): the value has been the sum of
        # per-query mins since r9, not a loop wall — the name now says so.
        # Consumers keyed on the old name must check metric_prev.
        "metric": "sum_per_query_min_sec",
        "metric_prev": "total_wall_sec_all_queries",
        "value": total,
        "value_def": "sum_of_per_query_min",
        "n_failed": len(failed),
        "failed": failed,
        "partial": bool(failed),
        "value_norm": total_norm,
        "loop_wall_sec": loop_wall,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "runs_per_query": RUNS,
        "per_query_stat": "min",
        "sf": float(sf),
        "calib": calib,
        "calib_post": calib_post,
    }
    # The driver records only the LAST 2000 chars of stdout (BENCH_r03
    # lost the line head to this).  Keep the final line compact: tight
    # separators, 2-decimal timings, and only the RATIO per scaled query;
    # the full-precision detail goes to BENCH_LOCAL.json + an earlier
    # (sacrificial) stdout line.
    full = dict(out, queries=timings)
    if scaled is not None:
        out["scaled"] = {
            "factor": scaled.get("factor"),
            "ratios": {
                k: v["ratio"] for k, v in scaled.get("queries", {}).items()
            },
        }
        full["scaled"] = scaled
    if scaled2 is not None:
        # second decade = base sf0.1 (the bench sf itself) x 10.  Record
        # the WALLS, not just the ratio: in a full bench session the base
        # side is warm from the main loop (file-listing + codegen caches)
        # so its wall halves while the x10 wall is unchanged — a ratio
        # alone would read as a scaling regression when the numerator is
        # steady (measured: dedup_groups x10 8.7 s both standalone and
        # in-session, base 3.7 s cold vs 1.5 s warm).
        def _s2(queries: dict) -> dict:
            return {
                k: {"r": v["ratio"], "b": v["base"], "s": v["scaled"]}
                for k, v in queries.items()
            }

        out["scaled2"] = {
            "base_sf": float(sf),
            "factor": scaled2.get("factor"),
            "walls": _s2(scaled2.get("queries", {})),
        }
        full["scaled2"] = scaled2
    if graded_drift is not None:
        # compact line: name -> attribution only; prev/now/cold detail
        # lands in BENCH_LOCAL.json
        out["drift"] = {
            k: v.get("attribution", "flagged")
            for k, v in graded_drift.get("flagged", {}).items()
        }
        full["drift"] = graded_drift
    if demoted is not None:
        out["demoted"] = {
            "n": demoted["n_queries"],
            "total": demoted["total_wall_sec"],
            # round-over-round drift gate: names only on the compact
            # line, prev/now detail in DEMOTED_WALLS.json
            "drift": sorted(demoted.get("drift", {}).get("flagged", {})),
        }
        full["demoted"] = demoted
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_LOCAL.json"), "w") as f:
        json.dump(full, f, indent=1)
    print("bench full detail: " + json.dumps(full, separators=(",", ":")))
    line = json.dumps(out, separators=(",", ":"))
    trimmed = []
    for trim in ("scaled2", "scaled"):  # never let the head get cut; drop
        # the second-decade extra before the primary ratio block
        if len(line) > 1900 and trim in out:
            trimmed.append(trim)
            del out[trim]
            line = json.dumps(out, separators=(",", ":"))
    # a block trimmed from the compact line still lands inside the
    # driver's 2000-char stdout tail as its own SHORT line right before
    # the final one.  The tail is a hard 2000-char budget shared by ALL
    # final lines, so the scaled fallback keeps only the signal — ratios
    # >= 1.5 (the ones worth an explanation) — plus the count it elided;
    # the full block always lands in BENCH_LOCAL.json (committed).
    if "scaled" in trimmed and scaled is not None:
        ratios = {
            k: v["ratio"] for k, v in scaled.get("queries", {}).items()
        }
        high = {k: r for k, r in ratios.items() if r is not None and r >= 1.5}
        print(
            json.dumps(
                {
                    "scaled": {
                        "factor": scaled.get("factor"),
                        "ratios_ge_1.5": high,
                        "n_below_1.5": len(ratios) - len(high),
                    }
                },
                separators=(",", ":"),
            ),
            flush=True,
        )
    if "scaled2" in trimmed and scaled2 is not None:
        print(
            json.dumps(
                {
                    "scaled2": {
                        "base_sf": float(sf),
                        "factor": scaled2.get("factor"),
                        "walls": _s2(scaled2.get("queries", {})),
                    }
                },
                separators=(",", ":"),
            ),
            flush=True,
        )
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
