"""Oracle-checkable operator inventory (SURVEY.md §2) on the driver tables.

Each submodule exposes two dicts:
  QUERIES: dict[name -> callable(spark, sf_dir) -> DataFrame]   (PySpark)
  ORACLES: dict[name -> ANSI SQL string]                        (DuckDB)

`registry()` merges them; `__spark_entry__.py` re-exports the merged
dicts as the driver contract. Names are prefixed with the SURVEY §2
operator ids they exercise (e.g. ``a1_``, ``j6_``, ``w4_``).

Registry order: modules merge in a fixed alphabetical order; on top of
that, queries whose OUTPUT changed recently or that have never received
a driver verdict are listed first (``_REVERIFY_FIRST``), so a capped
verification pass re-checks exactly the entries whose green status is
least established. Changed queries re-verify first — never last.

Determinism rules (driver compares row count + schema + order-insensitive
value hash, so values must be bit-exact across Spark and DuckDB):
  * money aggregates go through DECIMAL(18,2) sums (exact, order-independent),
    then round, then cast to DOUBLE — both engines produce identical bits;
  * LIMIT/top-k queries always order by a full deterministic key set;
  * timestamps surface as DATE or formatted strings;
  * collect_list arrays are sorted (`sort_array` ↔ `list_sort`).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import aggregates, joins, scans, scalars, windows
from . import dedup, deltaq, e1, graph, multimodal, pipeline_q
from . import similarity, text

# stable, neutral ordering: alphabetical by module name
_MODULES = (aggregates, dedup, deltaq, e1, graph, joins, multimodal,
            pipeline_q, scalars, scans, similarity, text, windows)

# Queries that must be (re-)verified before anything else: new this
# round, then queries whose code (or any symbol their call chain
# references) changed since the round boundary, then the
# longest-unverified tail. MECHANICALLY DERIVED since round 11
# (round-10 VERDICT #1: the hand-maintained head went stale and the
# driver sample skipped a changed query) — regenerate after the
# round's last code change with `python tools/gen_reverify.py`;
# `--check` (pinned in tests/test_driver_contract.py) fails when a
# changed/new query is missing from the committed head.
from ._reverify import _REVERIFY_FIRST


def registry() -> tuple[
    dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]
]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in _MODULES:
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in merged:
                raise ValueError(f"duplicate query name: {name}")
            merged[name] = fn
        oracles.update(getattr(mod, "ORACLES", {}))
    missing = [n for n in _REVERIFY_FIRST if n not in merged]
    if missing:
        raise ValueError(f"_REVERIFY_FIRST names not in registry: {missing}")
    queries = {n: merged[n] for n in _REVERIFY_FIRST}
    queries.update(merged)
    return queries, oracles
