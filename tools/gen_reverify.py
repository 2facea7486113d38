"""Mechanically derive the driver re-verification head (_REVERIFY_FIRST).

Round-10 VERDICT "what's wrong #1": the head was maintained BY HAND and
went stale — the driver burned its 50-query sample re-checking the
previous round's set while a query whose internals changed (w6) was
never driver-sampled. The registry's own policy is "changed queries
re-verify first — never last"; this tool makes that mechanical:

1. Boundary: the latest driver round-marker commit (subject `round N:`).
2. Dirty symbols: `git diff -U0 <boundary>` line ranges intersected
   with every top-level def span in the package (ast), then propagated
   to a FIXED POINT over the reference graph (a def that references a
   dirty def's name — bare or attribute-qualified — is dirty too), so
   a change to operators/scalable.global_lag marks every query whose
   call chain reaches it, not just queries in the changed file.
3. Head = queries never seen in any CORRECTNESS_r*.json (new), then
   dirty queries, then the longest-unverified tail (ascending by the
   last round the driver sampled them), capped at HEAD_CAP.
4. Emits mining_data_integration_spark/queries/_reverify.py (imported
   by the registry). `--check` verifies the committed head: every
   currently-dirty or never-sampled query must already be listed —
   the subset property tests/test_driver_contract.py pins, which stays
   green after the driver's round commit empties the diff.

Usage: python tools/gen_reverify.py [--check]
"""

from __future__ import annotations

import ast
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "mining_data_integration_spark")
OUT = os.path.join(PKG, "queries", "_reverify.py")
HEAD_CAP = 64


def round_boundary() -> tuple[str, str]:
    """Latest driver round-marker commit (sha, subject)."""
    out = subprocess.run(
        ["git", "log", "--grep", r"^round [0-9]\+:", "-n", "1",
         "--format=%H %s"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    if not out:
        # first round: everything is "changed" relative to the empty tree
        empty = subprocess.run(
            ["git", "hash-object", "-t", "tree", "/dev/null"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.strip()
        return empty, "<empty tree>"
    sha, _, subject = out.partition(" ")
    return sha, subject


def changed_lines(boundary: str) -> dict[str, set[int]]:
    """Worktree-vs-boundary changed line numbers (new side) per
    package .py file."""
    diff = subprocess.run(
        ["git", "diff", "-U0", boundary, "--",
         "mining_data_integration_spark"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    out: dict[str, set[int]] = {}
    cur = None
    for line in diff.splitlines():
        if line.startswith("+++ b/"):
            cur = line[6:]
            out.setdefault(cur, set())
        elif line.startswith("@@") and cur is not None:
            m = re.search(r"\+(\d+)(?:,(\d+))?", line)
            start = int(m.group(1))
            n = int(m.group(2)) if m.group(2) is not None else 1
            # a pure deletion (n=0) still dirties the surrounding def:
            # count the anchor line
            out[cur].update(range(start, start + max(n, 1)))
    return {f: ls for f, ls in out.items() if f.endswith(".py")}


class _Refs(ast.NodeVisitor):
    def __init__(self) -> None:
        self.names: set[str] = set()

    def visit_Name(self, node: ast.Name) -> None:
        self.names.add(node.id)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        self.names.add(node.attr)
        self.generic_visit(node)


def collect_defs() -> list[dict]:
    """Every top-level def/class in the package, plus QUERIES[...] /
    ORACLES[...] assignments as pseudo-defs carrying their query key."""
    defs = []
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, REPO)
            with open(path) as f:
                src = f.read()
            tree = ast.parse(src)
            for node in tree.body:
                entry = None
                if isinstance(node, (ast.FunctionDef,
                                     ast.AsyncFunctionDef, ast.ClassDef)):
                    entry = {"name": node.name, "query": None}
                elif isinstance(node, ast.Assign) and len(node.targets) == 1:
                    t = node.targets[0]
                    if (isinstance(t, ast.Subscript)
                            and isinstance(t.value, ast.Name)
                            and t.value.id in ("QUERIES", "ORACLES")
                            and isinstance(t.slice, ast.Constant)):
                        entry = {"name": None, "query": t.slice.value}
                if entry is None:
                    continue
                r = _Refs()
                r.visit(node)
                entry.update({
                    "file": rel,
                    "span": (node.lineno, node.end_lineno),
                    "refs": r.names,
                })
                defs.append(entry)
    return defs


def dirty_queries(boundary: str) -> set[str]:
    lines = changed_lines(boundary)
    defs = collect_defs()
    dirty_names: set[str] = set()
    dirty: set[int] = set()
    for i, d in enumerate(defs):
        file_lines = lines.get(d["file"])
        if file_lines and any(
                d["span"][0] <= ln <= d["span"][1] for ln in file_lines):
            dirty.add(i)
            if d["name"]:
                dirty_names.add(d["name"])
    changed = True
    while changed:
        changed = False
        for i, d in enumerate(defs):
            if i in dirty:
                continue
            if d["refs"] & dirty_names:
                dirty.add(i)
                if d["name"] and d["name"] not in dirty_names:
                    dirty_names.add(d["name"])
                changed = True
    out: set[str] = set()
    for i in dirty:
        d = defs[i]
        if d["query"]:
            out.add(d["query"])
        elif d["name"]:
            # a dirty top-level function that IS a registered query fn
            out.add(d["name"])
    return out


def last_sampled() -> dict[str, int]:
    """query -> last round it appeared in a CORRECTNESS_r*.json."""
    seen: dict[str, int] = {}
    for fn in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(os.path.join(REPO, fn)) as f:
            data = json.load(f)
        for name in data:
            seen[name] = max(seen.get(name, 0), rnd)
    return seen


def derive() -> tuple[list[str], str, str]:
    sys.path.insert(0, REPO)
    os.environ.setdefault("SPARK_GRAFT_NO_SESSION", "1")
    from mining_data_integration_spark import queries as qmod
    registry_names = []
    for mod in qmod._MODULES:
        registry_names.extend(getattr(mod, "QUERIES", {}).keys())
    registry = set(registry_names)

    boundary, subject = round_boundary()
    dirty = dirty_queries(boundary) & registry
    sampled = last_sampled()
    never = [n for n in registry_names if n not in sampled]
    head: list[str] = []
    for n in never:                                   # new this round
        if n not in head:
            head.append(n)
    for n in sorted(dirty, key=registry_names.index):  # changed
        if n not in head:
            head.append(n)
    # longest-unverified tail fills the remainder
    tail = sorted((n for n in registry_names if n not in head),
                  key=lambda n: (sampled.get(n, 0), registry_names.index(n)))
    for n in tail:
        if len(head) >= HEAD_CAP:
            break
        head.append(n)
    return head[:HEAD_CAP], boundary, subject


def render(head: list[str], boundary: str, subject: str) -> str:
    body = "\n".join(f'    "{n}",' for n in head)
    return f'''"""AUTOGENERATED by tools/gen_reverify.py — do not edit by hand.

Driver re-verification head for the registry (see queries/__init__.py):
new-this-round queries first, then queries whose code (or any symbol
their call chain references) changed since the round boundary, then the
longest-unverified tail. Regenerate each round AFTER the last code
change:

    python tools/gen_reverify.py

Derived against boundary {boundary[:12]} ({subject}).
"""

_REVERIFY_FIRST = (
{body}
)
'''


def main() -> int:
    head, boundary, subject = derive()
    text = render(head, boundary, subject)
    if "--check" in sys.argv:
        # subset property: every never-sampled or currently-dirty query
        # must already be in the committed head (order/tail may differ —
        # the tail rotates; staleness means a MISSING changed query)
        from mining_data_integration_spark.queries._reverify import (
            _REVERIFY_FIRST as committed)
        sampled = last_sampled()
        sys.path.insert(0, REPO)
        from mining_data_integration_spark import queries as qmod
        registry = set()
        for mod in qmod._MODULES:
            registry |= set(getattr(mod, "QUERIES", {}).keys())
        must = (dirty_queries(boundary) & registry) \
            | {n for n in registry if n not in sampled}
        missing = sorted(must - set(committed))
        if missing:
            print("STALE _REVERIFY_FIRST — changed/new queries missing "
                  f"from the committed head: {missing}")
            print("run: python tools/gen_reverify.py")
            return 1
        print(f"_REVERIFY_FIRST fresh: {len(must)} changed/new queries "
              f"all present (boundary {boundary[:12]})")
        return 0
    with open(OUT, "w") as f:
        f.write(text)
    print(f"wrote {OUT}: {len(head)} entries "
          f"(boundary {boundary[:12]} — {subject})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
