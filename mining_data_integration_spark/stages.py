"""Per-query stage-timing hooks for the bench's index-lifecycle
entries (round-12 VERDICT #5).

Lifecycle queries (sim26/sim27/st12/dd16/dd18/...) pay their
artifact's construction inside one query by design — the DuckDB
oracle must replay it — which lumps train/build/setup into the bench
wall and makes probe-side regressions invisible. These hooks let the
query/operator code attribute its EAGER phases (driver-side k-means
training, index staging, stream drains) to named stages; bench.py
then reports the split and derives the lazy probe side as the
residual (total − eager stages).

Off by default: attribution only happens while a bench has called
set_current(name) — in production paths record()/timed() are no-ops,
so the hot path carries zero bookkeeping.
"""

from __future__ import annotations

import contextlib
import time

STAGES: dict[str, dict[str, float]] = {}
_current: str | None = None


def set_current(query: str | None) -> None:
    """Begin attributing stage timings to `query` (None disables)."""
    global _current
    _current = query
    if query is not None:
        STAGES.pop(query, None)     # fresh per run


def record(stage: str, sec: float) -> None:
    if _current is None:
        return
    d = STAGES.setdefault(_current, {})
    d[stage] = round(d.get(stage, 0.0) + sec, 3)


@contextlib.contextmanager
def timed(stage: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        record(stage, time.perf_counter() - t0)


def snapshot(query: str) -> dict[str, float]:
    return dict(STAGES.get(query, {}))
