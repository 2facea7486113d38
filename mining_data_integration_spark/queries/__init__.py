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

# Queries that must be (re-)verified before anything else (trimmed each
# round to: output changed since last verdict, or never driver-checked):
#  * dp5 + its round-4 localization diagnostics (oracle HUGEINT->BIGINT
#    casts; dp5a/b/c isolate the divergent stage if the cast isn't it);
#  * the scalable-cumsum engine family (round-4 boundary-sampler change:
#    deterministic distinct pick + bounded (key,count) sample — values
#    are boundary-independent by design, but this is dp5's engine);
#  * w20 (round-4 decimal-from-the-start overflow fix).
_REVERIFY_FIRST = (
    "dp5_sequence_pack", "dp5a_token_counts", "dp5b_token_cumsum",
    "dp5c_pack_columns",
    # round-4 sketch suite — never driver-checked:
    "a21_hll_distinct", "tx12_heavy_hitter_langs", "tx13_countmin_tokens",
    "dp13_token_budget_mix", "tx14_bpe_merges",
    "tx15_surprisal_score", "dp14_length_buckets",
    "dd10_containment_pairs", "sim13_recall_eval", "dp15_dataset_card",
    "mm6_png_decode", "st1_stream_tumbling_counts",
    "st2_stream_sliding_totals", "st3_stream_dedup", "sim14_mmr_rerank",
    "tx16_mojibake_repair", "j18_salted_skew_join",
    "w21_activity_streaks", "a22_mode_per_group", "a23_exact_corr",
    "tx17_vocab_stats", "o9_keyset_pagination",
    "st4_stream_stateful_stats", "u4_scd2_history",
    "dp16_shard_writer_plan", "mm7_wav_decode", "w22_rolling_trend",
    "dp17_pipeline_funnel", "sim15_knn_graph", "st5_stream_band_join",
    "tx18_collocations", "a25_hll_merge", "dp18_exact_k_sample",
    "dd11_novelty_scores", "j19_null_safe_join", "w23_cusum_alarms",
    "dp19_dataset_diff", "sim16_int_pq_topk", "x16_try_cast_quarantine",
    "mm5_ppm_decode", "w7_ranking", "sim11_int_ivf_topk",
    "dp8_global_shuffle", "o6_tail_slice", "o7_offset_pagination",
    "o8_range_slice", "w14_scalable_cumsum", "dp11_curriculum_epochs",
    "a20_scalable_median",
    "w20_zscore_outliers",
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
