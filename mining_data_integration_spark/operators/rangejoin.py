"""Band (range) joins, bucketed for scale.

Spark has no native inequality-join fast path: a join whose condition
is `|l.ts - r.ts| <= band` (plus optional equi keys) plans as a
broadcast nested-loop or cartesian product — O(|L|·|R|) at 100 TB.
The standard fix is bucketing: quantize time into band-width buckets,
equi-join on (keys…, bucket) — a plain shuffled hash/sort-merge join —
then apply the exact band predicate. One side keeps its single bucket;
the other fans out to the (at most 3) buckets its band can reach, so
the join cost is ~3× an equi join instead of a cross product.

A pair can only meet in the right row's single home bucket, so the
fanout introduces no duplicates and no dedup pass is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "_bj_bucket"


def band_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str, band_us: int,
              fanout: str = "left") -> DataFrame:
    """Inner-join rows with equal `on` keys and
    |left_ts - right_ts| <= band_us (timestamps in epoch microseconds,
    inclusive bounds). `fanout` names the side that explodes to its
    candidate buckets — pick the smaller input.
    """
    if band_us <= 0:
        raise ValueError("band_us must be positive")
    band = F.lit(band_us)

    def home(ts: str) -> F.Column:
        return F.floor(F.col(ts) / band)

    def candidates(ts: str) -> F.Column:
        # every bucket the [ts-band, ts+band] window overlaps (<= 3)
        return F.sequence(
            F.floor((F.col(ts) - band) / band),
            F.floor((F.col(ts) + band) / band),
        )

    if fanout == "left":
        lk = left.withColumn(_BUCKET, F.explode(candidates(left_ts)))
        rk = right.withColumn(_BUCKET, home(right_ts))
    elif fanout == "right":
        lk = left.withColumn(_BUCKET, home(left_ts))
        rk = right.withColumn(_BUCKET, F.explode(candidates(right_ts)))
    else:
        raise ValueError(f"fanout must be 'left' or 'right': {fanout!r}")

    return (
        lk.join(rk, [*on, _BUCKET])
        .filter(
            F.abs(F.col(left_ts) - F.col(right_ts)) <= band
        )
        .drop(_BUCKET)
    )


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          on: list[str],
                          left_lo: str, left_hi: str,
                          right_lo: str, right_hi: str,
                          bucket_us: int) -> DataFrame:
    """Join interval pairs that overlap: l.lo <= r.hi AND r.lo <= l.hi
    (inclusive). Both sides fan out to every bucket their interval
    touches; candidate pairs share a bucket. A pair sharing several
    buckets would duplicate, so each match is kept only in the FIRST
    shared bucket (the bucket containing the later of the two interval
    starts) — an O(1) per-row predicate, no dedup shuffle.

    `bucket_us` trades fanout (long intervals touch many buckets)
    against candidate selectivity; set it near the typical interval
    length.
    """
    b = F.lit(bucket_us)

    def fan(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            _BUCKET,
            F.explode(F.sequence(F.floor(F.col(lo) / b),
                                 F.floor(F.col(hi) / b))),
        )

    lk = fan(left, left_lo, left_hi)
    rk = fan(right, right_lo, right_hi)
    first_shared = F.floor(
        F.greatest(F.col(left_lo), F.col(right_lo)) / b)
    return (
        lk.join(rk, [*on, _BUCKET])
        .filter(
            (F.col(left_lo) <= F.col(right_hi))
            & (F.col(right_lo) <= F.col(left_hi))
            & (F.col(_BUCKET) == first_shared)
        )
        .drop(_BUCKET)
    )
