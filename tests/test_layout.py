"""Storage-layout operator tests: Z-order clustering gives every
output partition a bounded box in BOTH dimensions (single-key sort
does not), and compaction bin-packs small files."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mining_data_integration_spark.operators.layout import (
    compact_table, zorder_key, zorder_layout,
)


def _partition_boxes(df):
    """[(min_x, max_x, min_y, max_y)] per partition — the min/max
    stats parquet would record per file for skipping."""
    boxes = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
             F.min("y").alias("y0"), F.max("y").alias("y1"))
        .collect()
    )
    return [(r.x0, r.x1, r.y0, r.y1) for r in boxes]


def _surviving(boxes, lo, hi, dim):
    """Files a min/max-pruning scan must read for dim ∈ [lo, hi]."""
    return sum(1 for b in boxes
               if not (b[2 * dim + 1] < lo or b[2 * dim] > hi))


def test_zorder_key_known_values(spark):
    rows = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (255, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = {(r.x, r.y): r.z for r in df.select(
        "x", "y", zorder_key(F.col("x"), F.col("y"), 8).alias("z")
    ).collect()}
    # interleave: x even bits, y odd bits
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1
    assert out[(0, 1)] == 2
    assert out[(1, 1)] == 3
    assert out[(2, 3)] == 0b1110          # x=10 -> bits 1,3? no: x@even=100, y=11@odd=1010 -> 1110
    assert out[(255, 255)] == 65535


def test_zorder_layout_bounds_both_dims(spark):
    # a 64x64 grid: single-key sort gives partitions the FULL y range;
    # z-order bounds both dimensions
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y"))
    n = 16
    z = zorder_layout(grid, F.col("x"), F.col("y"), bits=6, n_files=n)
    boxes_z = _partition_boxes(z)
    by_x = grid.repartitionByRange(n, F.col("x"))
    boxes_x = _partition_boxes(by_x)
    # a selective y predicate: x-sorted files ALL span the full y range
    # (zero skipping); z-ordered files have bounded y boxes, so most
    # are pruned by min/max stats
    assert _surviving(boxes_x, 0, 7, dim=1) == len(boxes_x)
    assert _surviving(boxes_z, 0, 7, dim=1) <= len(boxes_z) // 2
    # and the x predicate still prunes under z-order (both dims bounded)
    assert _surviving(boxes_z, 0, 7, dim=0) <= len(boxes_z) // 2
    # worst-case y-extent of any z file is a quadrant, not the grid
    assert max(b[3] - b[2] for b in boxes_z) <= 24
    assert max(b[3] - b[2] for b in boxes_x) == 63


def test_compact_table_bin_packs(spark, tmp_path):
    src = str(tmp_path / "small_files")
    out = str(tmp_path / "compacted")
    spark.range(20000).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("v")
    ).repartition(50).write.parquet(src)
    n_src = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_src == 50
    total = sum(os.path.getsize(os.path.join(src, f))
                for f in os.listdir(src) if f.endswith(".parquet"))
    n = compact_table(spark, src, out, sort_key="k",
                      target_file_bytes=total // 4)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == n <= 6
    # same data, now range-clustered on k
    assert spark.read.parquet(out).count() == 20000
