"""Emit the per-query driver-certification table for COVERAGE.md.

Mechanically derived from the CORRECTNESS_r0*.json files the driver
wrote each round (r4 verdict item 10): for every ``queries()`` entry,
which rounds certified it (name present AND rows+schema+hash all true —
or rows-only true for oracle-less queries), whether it carries a DuckDB
oracle, and its current slot. Re-run after each round and paste the
output over the table in COVERAGE.md (or pipe:
``python tools/gen_certification_table.py``).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def certified(rec: dict) -> bool:
    if rec.get("err"):
        return False
    checks = [rec.get("rows_match"), rec.get("schema_match"),
              rec.get("hash_match")]
    present = [c for c in checks if c is not None]
    return bool(present) and all(present)


def main() -> None:
    import __spark_entry__ as entrymod

    rounds: dict[int, dict] = {}
    # NOT "r0*.json": a literal-'0' glob never matches r10+ files
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.match(r"CORRECTNESS_r0*(\d+)\.json$", os.path.basename(path))
        if m:
            with open(path) as fh:
                rounds[int(m.group(1))] = json.load(fh)

    names = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    print("| # | query | oracle | driver-certified rounds |")
    print("|---|---|---|---|")
    for i, name in enumerate(names, 1):
        certs = [str(r) for r in sorted(rounds)
                 if name in rounds[r] and certified(rounds[r][name])]
        print(f"| {i} | `{name}` | {'yes' if name in oracles else 'rows-only'}"
              f" | {', '.join(certs) if certs else '—'} |")
    n_cert = sum(1 for n in names if any(
        n in rounds[r] and certified(rounds[r][n]) for r in rounds))
    print(f"\n{len(names)} queries ({len(oracles)} oracle-bearing); "
          f"{n_cert} driver-certified at least once through round "
          f"{max(rounds) if rounds else 0}.")


if __name__ == "__main__":
    main()
