"""Round-over-round drift gate for the GRADED window (VERDICT r10 item 3).

The demoted registry has had a ratio+floor drift flag since r8, but the
graded rows' round-over-round movement was only visible to a human
diffing BENCH_r{N}.json files — three sub-second graded rows moved
1.3-1.6x in r10 with no code change and nobody but the judge noticed.
This module compares this run's graded walls against the most recent
committed ``BENCH_r*.json`` (the driver's own artifact) and flags every
row whose min-of-3 wall grew more than GRADED_DRIFT_RATIO x, skipping
rows under GRADED_DRIFT_FLOOR_SEC on both sides.

Auto-attribution: a flagged graded row is re-timed STANDALONE-COLD in a
fresh Python/JVM process (tools/standalone_bench.py, min-of-3) — the
r9 events_winsorized protocol, mechanized.  If the cold wall is back
inside the ratio band of the previous round's wall, the in-loop reading
was session/host noise and the row is attributed ``noise``; otherwise
it is attributed ``reproduced`` and needs a plan-level look.  Either
way the gate's catch never dangles unexplained in the artifact.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

# The graded window is min-of-3, so its noise band is tighter than the
# single-run demoted gate's 2.0x: r10's unattributed movements were
# 1.34-1.59x, all of which this gate must catch.
GRADED_DRIFT_RATIO = 1.3
GRADED_DRIFT_FLOOR_SEC = 0.4  # min-of-3 sub-0.4s walls still flap
MAX_ATTRIBUTED = 8  # cold-process attribution is ~1 min each; cap it


def latest_round_walls(repo_dir: str) -> tuple[dict, float | None, int | None]:
    """(walls, sf, round) from the newest committed BENCH_r{N}.json, or
    ({}, None, None) when no prior round artifact exists."""
    best_n, best_path = None, None
    for p in glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m and (best_n is None or int(m.group(1)) > best_n):
            best_n, best_path = int(m.group(1)), p
    if best_path is None:
        return {}, None, None
    try:
        with open(best_path) as f:
            d = json.load(f)
        parsed = d.get("parsed") or {}
        return (
            dict(parsed.get("queries") or {}),
            parsed.get("sf", d.get("sf")),
            best_n,
        )
    except (OSError, ValueError):
        return {}, None, None


def _standalone_cold(names: list[str], sf_dir: str, cpus: str) -> dict:
    """min-of-3 walls for the named queries in a FRESH process."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_RUNS="3",
    )
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "standalone_bench.py"),
             *names],
            env=env,
            capture_output=True,
            text=True,
            timeout=900,
            cwd=repo,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            try:
                return json.loads(line).get("queries", {})
            except ValueError:
                continue
    except (subprocess.TimeoutExpired, OSError) as e:
        print(f"graded-drift standalone attribution failed: {e}",
              file=sys.stderr)
    return {}


#: idle jvm_codegen_wall sentinel (PLANS.md r8) — the load yardstick
IDLE_JVM_CALIB = 0.21


def graded_drift_section(
    timings: dict,
    sf: float,
    sf_dir: str,
    cpus: str,
    attribute: bool = True,
    repo_dir: str | None = None,
    jvm_calib: float | None = None,
) -> dict:
    """Compare this run's graded walls vs the last committed round and
    auto-attribute each flagged row via a standalone-cold re-run."""
    repo = repo_dir or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    prev, prev_sf, prev_round = latest_round_walls(repo)
    base = {
        "ratio_gate": GRADED_DRIFT_RATIO,
        "floor_sec": GRADED_DRIFT_FLOOR_SEC,
        "prev_round": prev_round,
    }
    if jvm_calib is not None and jvm_calib > 0:
        # context for the reader: a load factor well above 1 means the
        # whole loop ran on a busy host and a crop of 1.3-1.9x "noise"
        # flags is the expected signature (r11's first run: factor 2.3,
        # 18 flags, every attributed one standalone-cold back in band)
        base["host_load_factor"] = round(jvm_calib / IDLE_JVM_CALIB, 2)
    if not prev:
        return dict(base, prev_found=False, flagged={})
    if prev_sf is not None and float(prev_sf) != float(sf):
        # walls at different scale factors are not comparable
        return dict(base, prev_found=True, prev_sf_mismatch=float(prev_sf),
                    flagged={})
    flagged: dict[str, dict] = {}
    for name, wall in timings.items():
        p = prev.get(name)
        if p is None or p <= 0 or wall <= 0:
            continue  # new/rotated-in or errored rows have no trend line
        if max(p, wall) < GRADED_DRIFT_FLOOR_SEC:
            continue
        # a prev below the noise floor cannot support a ratio test: a
        # 0.18s map-only row reading 0.72s is scheduler noise, not a 4x
        # regression (r11: the fingerprints "reproduced" false catch —
        # protocol reruns spanned 0.46-0.68s with no code change on the
        # row's path).  The new wall must exceed ratio x max(prev, floor).
        if wall > GRADED_DRIFT_RATIO * max(p, GRADED_DRIFT_FLOOR_SEC):
            flagged[name] = {"prev": p, "now": round(wall, 3),
                             "ratio": round(wall / p, 2)}
    if flagged and attribute:
        # attribute the WORST movements first — the cap must never leave
        # the biggest ratio unexplained while explaining smaller ones
        by_ratio = sorted(flagged, key=lambda n: -flagged[n]["ratio"])
        names = by_ratio[:MAX_ATTRIBUTED]
        cold = _standalone_cold(names, sf_dir, cpus)
        for name in names:
            c = cold.get(name)
            row = flagged[name]
            if c is None:
                row["attribution"] = "attribution_failed"
                continue
            row["standalone_cold"] = c
            if c <= GRADED_DRIFT_RATIO * row["prev"]:
                row["attribution"] = "noise"  # cold wall back in band
            else:
                row["attribution"] = "reproduced"  # real; needs a plan look
        for name in by_ratio[MAX_ATTRIBUTED:]:
            flagged[name]["attribution"] = "not_attributed_cap"
    return dict(base, prev_found=True, flagged=flagged)
