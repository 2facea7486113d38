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
from . import dedup, e1, graph, multimodal, pipeline_q, similarity, text

# stable, neutral ordering: alphabetical by module name
_MODULES = (aggregates, dedup, e1, graph, joins, multimodal, pipeline_q,
            scalars, scans, similarity, text, windows)

# Queries that must be (re-)verified before anything else (trimmed each
# round to: output changed since last verdict, or never driver-checked,
# then the longest-unverified tail). Round-6 head:
#  * new: e1_miner_info / e1_mining_info (E1 DAG through the oracle for
#    the first time), mm9 (baseline-JPEG decode);
#  * restructured outputs: a16 / sim4 / sim9 (exact companions + bounds
#    verdicts — previously permanent no_oracle rows), a26 (decimal sums
#    + moments_safe), u5 (negative insert-key domain), w23 (alarm-lane
#    guard in lane_safe), x18 (non-object malformed alignment);
#  * plan-changed (output identical, re-pin anyway): w1.
# The remainder is the r1-verified tail — green status least recently
# re-established (driver samples 50/round; the rest of the sample
# window falls through to registry order).
_REVERIFY_FIRST = (
    # round-9 head: new queries (g4 star contraction, dd16 index
    # append+compact, sim24 occupancy audit) + queries whose
    # internals changed this round (st9 eager-and-clean + idempotent
    # batch_id sink; st10 retry marker; dd15 shares the tagged index
    # path helper; dd-family keep-min now rides the star kernel)
    "g4_star_components", "dd16_lsh_index_append_probe",
    "sim24_ivfpq_cell_occupancy", "dd17_star_dedup_clusters",
    "sim25_ivfpq_rebalanced_probe", "a4_win_totals",
    "st11_stream_components",
    "st9_stream_ingest_dedup", "st10_stream_index_append",
    "dd15_persisted_lsh_probe", "dd6_dup_clusters", "dd14_survivorship",
    # round-8 head continues (sim17 routes through the shared
    # _ivfpq_train/_ivfpq_probe halves that sim19 persists)
    "sim22_ivfpq_refined_topk", "mm13_mjpeg_avi_decode",
    "j20_bucketed_colocated_join",
    "g3_label_components", "u7_schema_evolution",
    "sim23_ivfpq_filtered_topk", "tx22_bigram_surprisal",
    "sim19_ivfpq_persisted_topk", "sim20_ivfpq_append_probe",
    "sim21_ivfpq_recall_eval",
    "dd15_persisted_lsh_probe", "dd3_minhash_lsh",
    "sim17_int_ivfpq_topk", "mm11_adpcm_decode",
    "mm12_codec_dispatch",
    "e1_miner_info", "e1_mining_info", "mm9_jpeg_decode",
    "sim16_int_pq_topk",
    "g2_triangle_census", "dp21_chunked_pack",
    "st8_stream_outer_band_join", "a28_ddsketch_quantiles",
    "mm10_gif_decode", "tx20_zipf_octaves", "tx21_heaps_growth",
    "dd14_survivorship", "w28_autocorrelation", "u6_format_roundtrip",
    "sim18_binary_hamming_topk",
    "a16_approx_stats", "sim4_ivf_topk", "sim9_pq_topk",
    "a26_mergeable_moments", "u5_changelog_apply",
    "w23_cusum_alarms", "x18_json_shred_stats", "w1_trailing_mean",
    "e2_burn_fee_area", "f3_range_filter", "f8_prefix_until_sentinel",
    "j10_scalar_enrichment", "j11_semi_join", "j12_anti_join",
    "j13_left_outer_count", "j16_recursive_cte_walk",
    "j8_computed_key_join", "o3_argmax", "s11_filtered_scan",
    "s12_filtered_top1", "u1_set_ops", "u2_unpivot", "u3_upsert",
    "w15_range_frame", "w2_cumulative_sum", "w3_keep_last",
    "w4_forward_fill", "w6_lag_delta", "w9_topk_per_group",
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
