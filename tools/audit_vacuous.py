"""Vacuous-green audit: find oracle-backed queries with 0 rows at a gate SF.

VERDICT r10 found the first contentless green row: `q_text_good_turing`
returned 0 rows in BOTH engines at sf0.01, so its driver hash-match proved
nothing. A green gate row only carries evidence when the compared result is
non-empty. This tool walks every ORACLE-BACKED query at the given SF dir,
executes the Spark side with `take(1)` (the cheapest action that proves
non-emptiness), and reports every query that produces 0 rows — each is
either a bug (fix the query) or needs a documented justification.

The same walk is frozen as a contract test
(`tests/test_registry_contract.py::test_no_vacuous_oracle_rows`) so the
class cannot recur silently; this tool is the standalone/reporting form
(per-query timing, any-SF).

Usage: python tools/audit_vacuous.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_etl_project_spark.queries import ORACLES, QUERIES
from mini_etl_project_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("audit-vacuous")
    vacuous: list[str] = []
    errors: list[str] = []
    t_all = time.time()
    for i, name in enumerate(sorted(ORACLES)):
        t0 = time.time()
        try:
            rows = QUERIES[name](spark, sf_dir).take(1)
        except Exception as e:  # noqa: BLE001 — report, don't abort the walk
            errors.append(f"{name}: {type(e).__name__}: {e}")
            print(f"ERROR {name}: {type(e).__name__}", flush=True)
            continue
        dt = time.time() - t0
        status = "ok" if rows else "VACUOUS"
        if not rows:
            vacuous.append(name)
        print(f"[{i + 1}/{len(ORACLES)}] {status:7s} {name} [{dt:.1f}s]", flush=True)
    print(f"\n{len(ORACLES)} oracle-backed queries in {time.time() - t_all:.0f}s")
    print(f"vacuous at {sf_dir}: {len(vacuous)}")
    for n in vacuous:
        print(f"  {n}")
    if errors:
        print(f"errors: {len(errors)}")
        for e in errors:
            print(f"  {e}")
    sys.exit(1 if (vacuous or errors) else 0)


if __name__ == "__main__":
    main()
