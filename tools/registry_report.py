"""Emit the query-registry ledger as REGISTRY.json (VERDICT r9 item 9):
graded window, demoted rows with their rotation kind + covering siblings,
and oracle-twin accounting — so "every demoted row has a named covering
sibling" is verifiable by script instead of archaeology.

Usage: python tools/registry_report.py [out_path]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_report() -> dict:
    import __spark_entry__ as entry

    graded = list(entry.queries())
    demoted = list(entry.demoted_queries())
    oracles = set(entry.oracle_sql())
    ledger = entry.rotation_registry()
    all_names = set(graded) | set(demoted)

    problems: list[str] = []
    if set(ledger) != set(demoted):
        missing = sorted(set(demoted) - set(ledger))
        extra = sorted(set(ledger) - set(demoted))
        problems.append(f"ledger/demoted mismatch: missing={missing} extra={extra}")
    for name, row in ledger.items():
        for s in row["siblings"]:
            if s not in all_names:
                problems.append(f"{name}: sibling {s!r} not in any registry")
        if row["kind"] == "rotated" and not row["siblings"]:
            problems.append(f"{name}: rotated row with no covering sibling")

    def enriched(name: str) -> dict:
        row = dict(ledger[name])
        row["siblings_graded"] = [s for s in row["siblings"] if s in graded]
        row["has_oracle"] = name in oracles
        return row

    kinds: dict[str, int] = {}
    for row in ledger.values():
        kinds[row["kind"]] = kinds.get(row["kind"], 0) + 1

    return {
        "graded": graded,
        "n_graded": len(graded),
        "n_demoted": len(demoted),
        "n_oracle_twins": len(oracles & all_names),
        "kinds": kinds,
        "demoted": {n: enriched(n) for n in demoted},
        "problems": problems,
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "REGISTRY.json",
    )
    report = build_report()
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(
        f"{report['n_graded']} graded + {report['n_demoted']} demoted, "
        f"{report['n_oracle_twins']} oracle twins; kinds {report['kinds']}; "
        f"{len(report['problems'])} problems -> {out_path}"
    )
    if report["problems"]:
        for p in report["problems"]:
            print("PROBLEM:", p)
        sys.exit(1)


if __name__ == "__main__":
    main()
