"""Oracle verification for the queries trimmed out of the driver's
50-entry window (VERDICT r3 item 1 sanctioned the trim: "trim or merge
redundant entries so the registry is ≤50").

demoted_queries() entries are near-duplicates of still-registered queries
but remain part of the engine's public surface, so every round this test
runs the SAME compare the driver gate runs — Spark result vs DuckDB
oracle, row count + name-sorted columns + order-insensitive values — at
sf0.01, the driver gate's own scale (VERDICT r6 item 3: rotation must
never reduce evidence strength).
"""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


GATE_SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{GATE_SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", sorted(entry.demoted_queries()))
def test_demoted_query_matches_oracle(spark, duck, name):
    oracles = entry.oracle_sql()
    assert name in oracles, f"demoted query {name} lost its oracle"
    sdf = entry.demoted_queries()[name](spark, GATE_SF_DIR).toPandas()
    ddf = duck.sql(oracles[name]).df()
    assert len(sdf) == len(ddf), f"rowcount spark={len(sdf)} duck={len(ddf)}"
    assert sorted(sdf.columns) == sorted(ddf.columns)
    a, b = _canon(sdf), _canon(ddf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            eq = (av.values == bv.values) | (
                pd.isna(av.values) & pd.isna(bv.values)
            )
            assert eq.all(), f"col {c}: {(~eq).sum()} float mismatches"
        else:
            assert av.astype(str).equals(bv.astype(str)), f"col {c} mismatch"


def test_demoted_disjoint_from_registry():
    qs, dq = entry.queries(), entry.demoted_queries()
    assert not set(qs) & set(dq)
    assert len(qs) <= 50, "driver verifies only the first 50 entries"


def test_rotation_registry_invariants():
    """VERDICT r9 item 9: the rotation ledger is machine-checkable —
    every demoted row appears exactly once, every claimed sibling
    resolves in the combined registry, every ROTATED row names at least
    one covering sibling, and tools/registry_report.py (which emits
    REGISTRY.json for the judge) reports zero problems."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from registry_report import build_report

    ledger = entry.rotation_registry()
    graded, demoted = set(entry.queries()), set(entry.demoted_queries())
    assert set(ledger) == demoted
    for name, row in ledger.items():
        assert row["kind"] in ("rotated", "capability", "unit_pinned"), name
        for s in row["siblings"]:
            assert s in graded | demoted, f"{name}: dangling sibling {s}"
        if row["kind"] == "rotated":
            assert row["siblings"], f"{name}: rotated without a sibling"
    report = build_report()
    assert report["problems"] == []
    assert report["n_graded"] == len(graded)
    # the committed artifact must match the live registry — a rotation
    # that forgets `python tools/registry_report.py` fails here, the
    # same discipline as the doc-count check
    import json
    from pathlib import Path

    on_disk = json.loads(
        (Path(__file__).resolve().parents[1] / "REGISTRY.json").read_text()
    )
    assert on_disk == report, "REGISTRY.json is stale — rerun tools/registry_report.py"


def test_doc_counts_match_registry():
    """ADVICE r9: README/COVERAGE registry counts drifted from HEAD once
    already — derive them from the registry so the docs CANNOT drift
    silently (a rotation that forgets the doc bump now fails the suite).
    The docs state the counts as 'G graded + D demoted' and 'T/T DuckDB
    twins'; both files must carry the registry's actual numbers."""
    import re
    from pathlib import Path

    g = len(entry.queries())
    d = len(entry.demoted_queries())
    t = len({**entry.queries(), **entry.demoted_queries()}.keys()
            & set(entry.oracle_sql()))
    root = Path(__file__).resolve().parents[1]
    for doc in ("README.md", "COVERAGE.md"):
        text = (root / doc).read_text()
        m = re.search(r"(\d+) graded .*?\+?\s*(\d+) demoted", text)
        assert m, f"{doc}: no registry-count sentence found"
        assert (int(m.group(1)), int(m.group(2))) == (g, d), (
            f"{doc} says {m.group(0)!r}, registry is {g} graded + {d} demoted"
        )
        m2 = re.search(r"(\d+)\s*(?:/\s*\d+\s*)?DuckDB", text)
        assert m2 and int(m2.group(1)) == t, (
            f"{doc} DuckDB-twin count != {t}"
        )


def test_drift_section_flags_only_real_jumps(tmp_path):
    # VERDICT r8 item 4: the round-over-round demoted-wall gate.  Pure
    # function, no Spark: flags >2x growth, skips sub-floor noise rows,
    # missing rows, and error (-1) rows; handles a missing prev file.
    import json

    from tools.demoted_bench import drift_section

    prev = tmp_path / "DEMOTED_WALLS.json"
    prev.write_text(json.dumps({"queries": {
        "slow_grew": 3.0,      # 3.0 -> 7.0: flag (2.33x)
        "steady": 3.0,         # 3.0 -> 3.2: no flag
        "noise": 0.1,          # 0.1 -> 0.3: under floor both sides
        "was_err": -1.0,       # prev errored: skip
        "rotated_out": 1.0,    # absent now: skip
    }}))
    walls = {
        "slow_grew": 7.0,
        "steady": 3.2,
        "noise": 0.3,
        "was_err": 5.0,
        "brand_new": 9.0,      # no prev: skip
        "now_err": -1.0,
    }
    d = drift_section(walls, str(prev))
    assert d["prev_found"] is True
    assert set(d["flagged"]) == {"slow_grew"}
    assert d["flagged"]["slow_grew"]["ratio"] == 2.33
    # sub-floor prevs can't support a ratio test (r11: the fingerprints
    # false catch — a 0.18s map-only row reading 0.72s is scheduler
    # noise): a 0.1 prev flags only past ratio x floor = 1.0
    d2 = drift_section({"noise": 0.6}, str(prev))
    assert d2["flagged"] == {}
    d2b = drift_section({"noise": 1.2}, str(prev))
    assert set(d2b["flagged"]) == {"noise"}
    # no previous artifact: report prev_found False, flag nothing
    d3 = drift_section(walls, str(tmp_path / "missing.json"))
    assert d3 == {"prev_found": False, "flagged": {}}


def test_graded_drift_section_flags_and_scale_guard(tmp_path):
    # VERDICT r10 item 3: the graded-window drift gate.  Pure function,
    # no Spark: reads the newest BENCH_r{N}.json's parsed.queries, flags
    # >1.3x growth over the floor, skips rotated-in rows (no prev) and
    # errored rows, and refuses to compare across scale factors.
    import json

    from tools.graded_drift import graded_drift_section

    (tmp_path / "BENCH_r03.json").write_text(json.dumps({
        "parsed": {"sf": 0.1, "queries": {"old": 9.0}}}))
    (tmp_path / "BENCH_r07.json").write_text(json.dumps({
        "parsed": {"sf": 0.1, "queries": {
            "grew": 1.0,     # 1.0 -> 1.5: flag (1.5x)
            "steady": 1.0,   # 1.0 -> 1.2: inside band
            "tiny": 0.1,     # 0.1 -> 0.2: under floor both sides
            "was_err": -1.0,
        }}}))
    walls = {"grew": 1.5, "steady": 1.2, "tiny": 0.2, "was_err": 2.0,
             "rotated_in": 5.0, "now_err": -1.0}
    d = graded_drift_section(walls, 0.1, "/nonexistent", "8",
                             attribute=False, repo_dir=str(tmp_path))
    assert d["prev_found"] is True and d["prev_round"] == 7
    assert set(d["flagged"]) == {"grew"}
    assert d["flagged"]["grew"]["ratio"] == 1.5
    # different sf: walls are not comparable, flag nothing
    d2 = graded_drift_section(walls, 0.01, "/nonexistent", "8",
                              attribute=False, repo_dir=str(tmp_path))
    assert d2["prev_sf_mismatch"] == 0.1 and d2["flagged"] == {}
    # no BENCH_r artifacts at all
    d3 = graded_drift_section(walls, 0.1, "/nonexistent", "8",
                              attribute=False, repo_dir=str(tmp_path / "x"))
    assert d3["prev_found"] is False and d3["flagged"] == {}
    # host-load context: calib 0.42 vs idle 0.21 -> factor 2.0
    d4 = graded_drift_section(walls, 0.1, "/nonexistent", "8",
                              attribute=False, repo_dir=str(tmp_path),
                              jvm_calib=0.42)
    assert d4["host_load_factor"] == 2.0


def test_coverage_registry_section_is_derived():
    """VERDICT r10 item 9: COVERAGE.md's registry section is GENERATED
    from the live registry — a rotation that forgets to rerun
    tools/registry_report.py fails here, exactly like a stale
    REGISTRY.json."""
    from pathlib import Path

    from tools.registry_report import (
        COVERAGE_BEGIN,
        COVERAGE_END,
        build_report,
        coverage_markdown,
    )

    text = (Path(__file__).resolve().parents[1] / "COVERAGE.md").read_text()
    lo, hi = text.find(COVERAGE_BEGIN), text.find(COVERAGE_END)
    assert lo >= 0 and hi > lo, "COVERAGE.md lost its REGISTRY markers"
    on_disk = text[lo:hi + len(COVERAGE_END)]
    assert on_disk == coverage_markdown(build_report()), (
        "COVERAGE.md registry section is stale — rerun "
        "tools/registry_report.py"
    )


def test_demoted_drift_auto_attribution(tmp_path, monkeypatch):
    """r11: the demoted gate auto-attributes its catches standalone-cold
    like the graded gate — 'noise' when the cold wall is back in band,
    'reproduced' when it is not."""
    import json

    import tools.demoted_bench as db

    prev = tmp_path / "DEMOTED_WALLS.json"
    prev.write_text(json.dumps({"queries": {"a": 1.0, "b": 1.0}}))
    monkeypatch.setattr(
        "tools.graded_drift._standalone_cold",
        lambda names, sf_dir, cpus: {"a": 1.1, "b": 4.5},
    )
    d = db.drift_section(
        {"a": 3.0, "b": 5.0}, str(prev), sf_dir="/x", attribute=True
    )
    assert d["flagged"]["a"]["attribution"] == "noise"
    assert d["flagged"]["b"]["attribution"] == "reproduced"
    assert d["flagged"]["b"]["standalone_cold"] == 4.5
    # no sf_dir (standalone tool use): flags only, no subprocess
    d2 = db.drift_section({"a": 3.0}, str(prev))
    assert "attribution" not in d2["flagged"]["a"]
