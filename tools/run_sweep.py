"""Sharded full-registry oracle sweep driver (the r8 battery shape).

Splits the registry into N shards (check_oracle's ORACLE_SLICE=k/m
round-robin) and runs them as parallel subprocesses, one log each:

    python tools/run_sweep.py <sf_dir> <log_prefix> [n_shards=4]

Exit code 0 iff every shard printed `0 failures`. ORACLE_EXCLUDE and
ORACLE_SHUFFLE_PARTITIONS in the environment propagate to the shards
(adversarial-shuffle sweeps, sf0.1 recursive-oracle exclusions).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1]
PREFIX = sys.argv[2]
N = int(sys.argv[3]) if len(sys.argv) > 3 else 4


def main() -> int:
    procs = []
    for i in range(N):
        log = f"{PREFIX}_s{i}.log"
        fh = open(log, "w")
        env = os.environ.copy()
        env["ORACLE_SLICE"] = f"{i}/{N}"
        procs.append((log, fh, subprocess.Popen(
            [sys.executable, "tools/check_oracle.py", SF_DIR],
            stdout=fh, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env)))
    ok = True
    for log, fh, p in procs:
        p.wait()
        fh.close()
        txt = open(log, errors="replace").read()
        # match the zero-failure summary line EXACTLY: endswith("0
        # failures") would also accept "10 failures" if check_oracle
        # ever printed a bare count (today it appends ": [names]" to
        # nonzero counts — a coupling this regex removes)
        good = re.search(r"(?m)^0 failures\s*$", txt) is not None
        print(f"{'PASS' if good else 'FAIL'} {log}")
        ok &= good
    print("SWEEP PASS" if ok else "SWEEP FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
