"""Storage-layout operators: Z-order (Morton) clustering and
small-file compaction.

Neither exists in the reference (it serves everything from the JS heap
/ Redis, rpc.js:60-75, server.js:295-299); both are what turn the same
query plans into fast plans at 100 TB:

* **Z-order**: a single-key sort clusters files perfectly on that key
  and not at all on any other, so a predicate on the second dimension
  reads every file. Interleaving the bits of two (bucketized) keys
  gives files a bounded min/max box on BOTH dimensions — parquet
  row-group / file skipping then prunes on either predicate. The key
  is plain integer arithmetic (shift/mask), exact in any engine.
* **Compaction**: a streaming ingest / per-tick dynamic overwrite
  leaves many small files; listing + footer reads then dominate scan
  setup. Compaction bin-packs to a target file size with one
  repartitionByRange on the sort key (keeps the clustering the layout
  was built for).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of two non-negative bucketized longs (x in
    even bit positions, y in odd): z = Σ ((x>>i)&1)<<2i | ((y>>i)&1)
    <<(2i+1). 2*bits result bits — 16+16 fits comfortably in int64.
    Callers bucketize raw values into [0, 2^bits) first (range-rank or
    fixed-width buckets); interleaving only makes sense on bounded
    integer grids."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (z
             + (F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
             + (F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)),
                            2 * i + 1)))
    return z


def zorder_layout(df: DataFrame, x: Column, y: Column,
                  bits: int = 16, n_files: int | None = None) -> DataFrame:
    """Return df ordered for a Z-clustered write: repartitionByRange +
    sortWithinPartitions on the Morton key, so each output file covers
    a compact box in (x, y) space. Write with .write.parquet(...) —
    the layout survives because range partitions are contiguous in z."""
    keyed = df.withColumn("_z", zorder_key(x, y, bits))
    n = n_files or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return keyed.repartitionByRange(n, F.col("_z")) \
        .sortWithinPartitions("_z")


def compact_table(spark: SparkSession, path: str, out_path: str,
                  sort_key: str | None = None,
                  target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Bin-pack a many-small-files parquet dir into ~target-size files,
    preserving (or establishing) clustering on sort_key. Returns the
    output file count. Sizing reads only filesystem metadata (no data
    scan); the rewrite is one range shuffle. The 128 MiB default
    matches one HDFS/S3-friendly scan split — the standard compaction
    target for streaming sinks."""
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f))
                     for f in files if f.endswith(".parquet"))
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if sort_key:
        df = df.repartitionByRange(n, F.col(sort_key)) \
            .sortWithinPartitions(sort_key)
    else:
        df = df.coalesce(n)
    df.write.mode("overwrite").parquet(out_path)
    return n
