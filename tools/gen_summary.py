"""Machine-derive the round battery summary from the logs.

Round-10 VERDICT "what's wrong #2": the hand-written r10_SUMMARY.md
misreported the plan-audit ok/ok* split (196+10 vs the log's actual
140+66) — a summary a judge must re-derive will eventually hide a
regression. This tool counts EVERYTHING from the artifacts:

* plan-audit log: ok / ok* / FAIL / final failure line
* pytest log: the `N passed` summary line
* sweep shard logs: per-shard PASS query counts + the `0 failures` gate
* bench *.json: headline/extended medians straight from the JSON
* scale-check logs (index/cc/walk/cold-variance): PASS/FAIL verdicts

Usage: python tools/gen_summary.py <round-prefix>   # e.g. r11
Writes logs/<prefix>_SUMMARY.md (a "What landed" prose section may be
prepended by hand afterwards — the COUNTS in the table are generated).
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGS = os.path.join(REPO, "logs")


def read(path: str) -> str:
    with open(path, errors="replace") as f:
        # Spark progress bars emit \r-terminated frames; a status line
        # glued behind one would escape every ^-anchored count
        return f.read().replace("\r", "\n")


def _live_registry_size() -> int | None:
    """Size of the CURRENT queries() registry — the audit-parity
    baseline. None if the entry module can't import here."""
    try:
        sys.path.insert(0, os.path.dirname(LOGS))
        import __spark_entry__ as e
        return len(e.queries())
    except Exception:
        return None


def plan_audit_row(path: str) -> str:
    txt = read(path)
    ok = len(re.findall(r"(?m)^ok   ", txt))
    okw = len(re.findall(r"(?m)^ok\* ", txt))
    fail = len(re.findall(r"(?m)^(FAIL|ERROR)", txt))
    final = re.search(r"(?m)^(\d+) failures", txt)
    row = (f"{ok + okw + fail} queries: {ok} ok + {okw} whitelisted ok* "
           f"+ {fail} FAIL; final line: "
           f"{final.group(0) if final else 'MISSING'}")
    # count-parity gate (round-12 judge hygiene #1): the audit log must
    # cover the registry AS IT STANDS NOW — a query registered after
    # the audit ran (sim29's r12 slip) shows up as audited < live here
    live = _live_registry_size()
    if live is not None:
        audited = ok + okw + fail
        row += (f"; AUDIT-PARITY {'OK' if audited >= live else 'FAIL'} "
                f"({audited} audited vs {live} registered)")
    return row


def pytest_row(path: str) -> str:
    txt = read(path)
    m = re.findall(r"(\d+) passed(?:, (\d+) failed)?[^\n]*in ([\d:.]+m?s?)",
                   txt)
    if not m:
        return "NO pytest summary line found"
    passed, failed, dur = m[-1]
    return f"{passed} passed, {failed or 0} failed ({dur})"


def sweep_rows(prefix: str) -> list[tuple[str, str]]:
    """One row per sweep group `<prefix>_<tag>_s*.log`."""
    groups: dict[str, list[str]] = {}
    for fn in sorted(os.listdir(LOGS)):
        m = re.fullmatch(rf"{prefix}_(\w+)_s(\d+)\.log", fn)
        if m:
            groups.setdefault(m.group(1), []).append(fn)
    rows = []
    for tag, files in sorted(groups.items()):
        total_pass = total_fail = 0
        gate = True
        for fn in files:
            txt = read(os.path.join(LOGS, fn))
            total_pass += len(re.findall(r"(?m)^PASS ", txt))
            total_pass += len(re.findall(r"(?m)^OK\?", txt))
            total_fail += len(re.findall(r"(?m)^FAIL ", txt))
            gate &= re.search(r"(?m)^0 failures\s*$", txt) is not None
        verdict = "SWEEP PASS" if (gate and total_fail == 0) else "SWEEP FAIL"
        detail = ("all shards 0 failures" if gate
                  else "a shard missing 0-failures line")
        # a multi-attempt sweep (re-run shards) carries its verdict in
        # the by-name coverage log (tools/check_sweep_coverage.py) —
        # per-shard count arithmetic cannot see recovered queries
        cov = os.path.join(LOGS, f"{prefix}_{tag}_coverage.log")
        if os.path.exists(cov):
            ctxt = read(cov)
            m = re.search(r"(?m)^registry .*$", ctxt)
            cverdict = ("COVERAGE PASS" if "COVERAGE PASS" in ctxt
                        else "COVERAGE FAIL")
            verdict = cverdict
            detail += f"; by-name: {m.group(0) if m else '?'}"
        rows.append((f"sweep {tag} ({len(files)} shards)",
                     f"{verdict}: {total_pass} PASS / {total_fail} FAIL "
                     f"attempt-lines ({detail})"))
    return rows


def bench_rows(prefix: str) -> list[tuple[str, str]]:
    rows = []
    for fn in sorted(os.listdir(LOGS)):
        if not (fn.startswith(prefix + "_bench")
                and (fn.endswith(".json") or fn.endswith(".log"))):
            continue
        txt = read(os.path.join(LOGS, fn)).strip().splitlines()
        line = next((ln for ln in reversed(txt)
                     if ln.startswith("{")), None)
        if line is None:
            rows.append((fn, "NO json line"))
            continue
        d = json.loads(line)
        if d.get("metric") == "e1_refresh_wall":
            rows.append((fn, f"e1 cold {d['value']} s / warm "
                         f"{d.get('warm_full_refresh_sec')} s / tick "
                         f"{d.get('incremental_tick_bucketed_bronze_sec')} s "
                         f"@ {d.get('n_blocks')} blocks "
                         f"(spreads: {d.get('run_spreads')})"))
        else:
            rows.append((fn, f"headline {d.get('value')} s "
                         f"(sf {d.get('sf')}, "
                         f"sp_exchanges {d.get('single_partition_exchanges')})"))
        # unified stage schema (round 13): every bench JSON —
        # bench.py and tools/bench_e1.py alike — carries one
        # {scenario: {stage: sec}} map, rendered here identically so
        # round-over-round stage diffs come from ONE structure
        for scen, st in sorted((d.get("stages") or {}).items()):
            detail = " ".join(f"{k}={v}" for k, v in sorted(st.items()))
            rows.append((f"{fn} stages/{scen}", detail))
    return rows


def verdict_rows(prefix: str) -> list[tuple[str, str]]:
    """Scale-check logs that self-report PASS/FAIL lines."""
    rows = []
    for fn in sorted(os.listdir(LOGS)):
        if not fn.startswith(prefix + "_") or not fn.endswith(".log"):
            continue
        if re.search(r"_(s\d+|driver|coverage)\.log$", fn) \
                or "_bench" in fn \
                or "plan_audit" in fn or "pytest" in fn:
            continue
        txt = read(os.path.join(LOGS, fn))
        n_pass = len(re.findall(r"(?m)^.*\bPASS\b", txt))
        n_fail = len(re.findall(r"(?m)^.*\bFAIL\b", txt))
        if n_pass == 0 and n_fail == 0 and "{" not in txt:
            continue          # chain/driver noise log, nothing to count
        jl = next((ln for ln in reversed(txt.splitlines())
                   if ln.startswith("{")), None)
        extra = ""
        if jl:
            try:
                d = json.loads(jl)
                keys = [k for k in ("metric", "median_sec", "spread_ratio",
                                    "max_sec") if k in d]
                extra = " — " + ", ".join(f"{k}={d[k]}" for k in keys)
            except json.JSONDecodeError:
                pass
        rows.append((fn, f"{n_pass} PASS / {n_fail} FAIL lines{extra}"))
    return rows


def main() -> int:
    prefix = sys.argv[1] if len(sys.argv) > 1 else "r11"
    lines = [f"# {prefix} battery summary (GENERATED by "
             f"tools/gen_summary.py — counts are mechanical)", "",
             "| check | result |", "|---|---|"]

    pa = os.path.join(LOGS, f"{prefix}_plan_audit.log")
    if os.path.exists(pa):
        lines.append(f"| plan audit | {plan_audit_row(pa)} |")
    for fn in sorted(os.listdir(LOGS)):
        if re.fullmatch(rf"{prefix}_pytest\w*\.log", fn):
            lines.append(
                f"| pytest ({fn}) | "
                f"{pytest_row(os.path.join(LOGS, fn))} |")
    for name, result in sweep_rows(prefix):
        lines.append(f"| {name} | {result} |")
    for name, result in bench_rows(prefix):
        lines.append(f"| {name} | {result} |")
    for name, result in verdict_rows(prefix):
        lines.append(f"| {name} | {result} |")
    out = os.path.join(LOGS, f"{prefix}_SUMMARY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
