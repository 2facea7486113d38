"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query on sf0.001; `queries()` /
`oracle_sql()` expose the oracle-checked operator inventory from
`mining_data_integration_spark.queries` (SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mining_data_integration_spark.queries import registry

_QUERIES, _ORACLES = registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The A1 pricing-summary aggregate — the per-miner-stats shape at the
    heart of the reference's E1 pipeline (rpc.js:244-275)."""
    return _QUERIES["a1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per queries() key (omitted for
    non-SQL-expressible ops -> rows-only check)."""
    return dict(_ORACLES)
