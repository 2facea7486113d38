"""SparkSession factory.

Local testing runs on local[N]; the configs are chosen so the same code
scales to a multi-executor cluster: AQE on (runtime join re-planning,
skew-join splitting, partition coalescing), Arrow on (Pandas-UDF fast
path), UTC session timezone (bit-exact DuckDB-oracle comparison).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "mining-data-integration-spark",
              shuffle_partitions: str | int | None = None) -> SparkSession:
    """Build (or fetch) the session.

    At 100 TB the same plan runs on a real cluster: shuffle partitions are
    sized by AQE (`advisoryPartitionSizeInBytes`) rather than this local
    default, and the broadcast threshold keeps dimension tables
    (region/nation/supplier/leader_keys/prices) out of shuffles.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sp = str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", sp)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # driver writes events.ts as TIMESTAMP(NANOS); read as long up
        # front (io.py rebuilds a microsecond timestamp) instead of
        # letting the first scan fail and retry
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
