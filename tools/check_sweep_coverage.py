"""Coverage-by-name check for a (possibly multi-attempt) sweep.

The r8 process lesson, mechanized: when a sweep is split into slices
and some slices are re-run (a shard OOM-killed, a query re-verified
after a fix), "did every query pass somewhere?" must be derived BY
NAME across all the attempt logs, never from per-shard counts. This
tool unions the PASS names across every log matching the prefix and
diffs them against the (optionally filtered) registry. A query that
FAILed in one attempt and PASSed in a later one counts as covered —
the per-attempt logs keep the full history.

Usage:
    python tools/check_sweep_coverage.py <log_glob> [name_filter ...]
    # e.g. python tools/check_sweep_coverage.py 'logs/r11_sweep_sf1_s*.log' dd sim tx dp st9 st10 st12

Exit 0 iff every filtered registry query has at least one PASS.
"""

from __future__ import annotations

import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    log_glob = sys.argv[1]
    filters = sys.argv[2:]
    from mining_data_integration_spark.queries import registry
    q, _ = registry()
    want = {n for n in q
            if not filters or any(f in n for f in filters)}
    passed: set[str] = set()
    failed_somewhere: set[str] = set()
    files = sorted(glob.glob(log_glob))
    for fn in files:
        with open(fn, errors="replace") as f:
            txt = f.read().replace("\r", "\n")
        passed |= set(re.findall(r"(?m)^(?:PASS|OK\?)\s+(\w+):", txt))
        failed_somewhere |= set(re.findall(r"(?m)^FAIL\s+(\w+):", txt))
    missing = sorted(want - passed)
    recovered = sorted((failed_somewhere & passed) & want)
    print(f"logs: {len(files)} files ({log_glob})")
    print(f"registry (filtered): {len(want)}; PASS somewhere: "
          f"{len(want & passed)}; missing: {missing or 'none'}")
    if recovered:
        print(f"failed in one attempt, PASSed in a later one: {recovered}")
    print("COVERAGE PASS" if not missing else "COVERAGE FAIL")
    return 0 if not missing else 1


if __name__ == "__main__":
    raise SystemExit(main())
