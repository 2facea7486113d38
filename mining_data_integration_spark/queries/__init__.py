"""Oracle-checkable operator inventory (SURVEY.md §2) on the driver tables.

Each submodule exposes two dicts:
  QUERIES: dict[name -> callable(spark, sf_dir) -> DataFrame]   (PySpark)
  ORACLES: dict[name -> ANSI SQL string]                        (DuckDB)

`registry()` merges them; `__spark_entry__.py` re-exports the merged
dicts as the driver contract. Names are prefixed with the SURVEY §2
operator ids they exercise (e.g. ``a1_``, ``j6_``, ``w4_``).

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
from . import dedup, multimodal, pipeline_q, similarity, text

# never-driver-checked modules first: if the driver caps the number of
# entries it verifies per round, the LLM-pipeline suite + scalars get
# their verdict before the already-green r01 modules re-run
_MODULES = (dedup, similarity, text, multimodal, pipeline_q, scalars,
            scans, joins, aggregates, windows)


def registry() -> tuple[
    dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]
]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in _MODULES:
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name: {name}")
            queries[name] = fn
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles
