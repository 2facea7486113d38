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
from . import dedup, multimodal, pipeline_q, similarity, text

# stable, neutral ordering: alphabetical by module name
_MODULES = (aggregates, dedup, joins, multimodal, pipeline_q, scalars,
            scans, similarity, text, windows)

# Queries that must be (re-)verified before anything else:
#  * round-3 output-affecting changes (dp5's plan-independent cumsum is
#    shared by dp8/o6/o7/o8/w14; dd8's alignment-invariant span hashing);
#  * round-2 output changes the driver has not re-sampled (j2/a6 array
#    serialization, j17 fp_rate formula, w10/j14/j15 NTZ fix, w12 exact
#    HALF_UP average, a16);
#  * queries that have never received a driver verdict (aj1, w11-w13,
#    w16-w19).
_REVERIFY_FIRST = (
    # round-3 additions (no driver verdict yet)
    "dd9_semantic_dedup", "w20_zscore_outliers",
    "dp11_curriculum_epochs", "a20_scalable_median",
    "tx11_gopher_filter", "dp12_fuzzy_decontaminate",
    "dp5_sequence_pack", "dp8_global_shuffle", "o6_tail_slice",
    "o7_offset_pagination", "o8_range_slice", "w14_scalable_cumsum",
    "dd8_substring_dup_spans",
    "j2_group_join", "a6_order_rollup", "j17_bloom_prune",
    "w10_sessionize", "j14_band_join", "j15_interval_overlap_join",
    "w12_sliding_window", "a16_approx_stats",
    "aj1_asof_join", "w11_tumbling_window", "w13_session_window_native",
    "w16_funnel", "w17_ewma", "w18_cohort_retention",
    "w19_rolling_active_users",
)


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
