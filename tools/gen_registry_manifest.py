"""Commit a per-round registry manifest (round-12 VERDICT hygiene #6 /
"what's wrong" #2): the CORRECTNESS_r* union contains names retired by
later renames (dp5a/b/c, replaced in round 2), so cross-round coverage
accounting was a hand-diff against the live registry. This makes it
mechanical: logs/r<N>_registry.json records the live query names, which
have DuckDB oracles vs rows-only checks, and every name that appears in
any historical CORRECTNESS_r*.json but is no longer registered.

Usage: python tools/gen_registry_manifest.py r12
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    prefix = sys.argv[1] if len(sys.argv) > 1 else "r0"
    import __spark_entry__ as e

    names = list(e.queries())
    oracles = set(e.oracle_sql())
    seen_historic: set[str] = set()
    for fn in sorted(os.listdir(REPO)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            with open(os.path.join(REPO, fn)) as f:
                seen_historic.update(json.load(f))
    live = set(names)
    manifest = {
        "round": prefix,
        "n_queries": len(names),
        "n_oracle_backed": len(live & oracles),
        "names": names,
        "rows_only": sorted(live - oracles),
        "retired": sorted(seen_historic - live),
    }
    out = os.path.join(REPO, "logs", f"{prefix}_registry.json")
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"{out}: {len(names)} live ({len(manifest['rows_only'])} "
          f"rows-only), {len(manifest['retired'])} retired")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
