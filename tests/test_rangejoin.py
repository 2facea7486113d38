"""Bucketed band/interval joins vs the naive cross-filter join:
identical match sets (incl. boundary-exact deltas), no duplicate pairs
from the bucket fanout."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mining_data_integration_spark.operators.rangejoin import (
    band_join,
    interval_overlap_join,
)


@pytest.fixture(scope="module")
def sides(spark):
    rng = random.Random(11)
    # timestamps cluster inside a small range so bands straddle bucket
    # boundaries often; include exact-boundary deltas (multiples of 10)
    left = [(i, rng.randrange(0, 5), rng.randrange(0, 500) * 10)
            for i in range(300)]
    right = [(1000 + i, rng.randrange(0, 5), rng.randrange(0, 500) * 10)
             for i in range(300)]
    l = spark.createDataFrame(left, "lid long, k long, lts long")
    r = spark.createDataFrame(right, "rid long, k long, rts long")
    return l, r


@pytest.mark.parametrize("band", [10, 95, 1000])
@pytest.mark.parametrize("fanout", ["left", "right"])
def test_band_join_equivalence(sides, band, fanout):
    l, r = sides
    got = band_join(l, r, ["k"], "lts", "rts", band, fanout=fanout) \
        .select("lid", "rid")
    ref = (
        l.join(r, "k")
        .filter(F.abs(F.col("lts") - F.col("rts")) <= band)
        .select("lid", "rid")
    )
    assert got.exceptAll(ref).isEmpty() and ref.exceptAll(got).isEmpty()


@pytest.mark.parametrize("bucket", [40, 130, 5000])
def test_interval_overlap_equivalence(spark, sides, bucket):
    l, r = sides
    rng = random.Random(13)
    li = l.withColumn("lhi", F.col("lts") + rng.randrange(5, 300))
    ri = r.withColumn("rhi", F.col("rts") + rng.randrange(5, 300))
    got = interval_overlap_join(
        li, ri, ["k"], "lts", "lhi", "rts", "rhi", bucket_us=bucket
    ).select("lid", "rid")
    ref = (
        li.join(ri, "k")
        .filter((F.col("lts") <= F.col("rhi"))
                & (F.col("rts") <= F.col("lhi")))
        .select("lid", "rid")
    )
    assert got.exceptAll(ref).isEmpty() and ref.exceptAll(got).isEmpty()


def test_band_join_rejects_bad_args(sides):
    l, r = sides
    with pytest.raises(ValueError):
        band_join(l, r, ["k"], "lts", "rts", 0)
    with pytest.raises(ValueError):
        band_join(l, r, ["k"], "lts", "rts", 10, fanout="both")
