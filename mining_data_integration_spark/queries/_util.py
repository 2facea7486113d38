"""Shared helpers for the oracle-checked query inventory."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent exact sum: cast to DECIMAL(18,s) first so the
    shuffle/partial-agg order can't perturb low-order float bits."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})"))


def money(col: Column, ndigits: int = 2) -> Column:
    """Exact decimal -> round -> double: bit-identical in Spark and DuckDB."""
    return F.round(col, ndigits).cast("double")


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition a small-file scan before CPU-heavy per-row work
    (shingling, hashing, embedding math). The driver tables are single
    parquet files -> one input partition -> one core; at 100 TB the
    scan has natural parallelism and this becomes a no-op-sized
    shuffle of the (tiny) upstream table, not the expanded rows."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, *cols) if cols else df.repartition(n)
