"""Mergeable summary sketches for frequency problems.

Misra-Gries heavy hitters (Misra & Gries 1982; merge rule from
Agarwal et al. 2013, "Mergeable summaries"): each partition folds its
rows into at most `s` (key, lower-bound) counters — the undercount is
bounded by n_p/(s+1) — so every key with global frequency > n/(s+1)
is guaranteed to survive in at least one partition's summary
(pigeonhole over partitions). The union of summaries is therefore a
small SUPERSET of the heavy hitters, and one exact counting pass
restricted to that candidate set (a broadcast semi-join) returns
exact frequencies.

Why this matters at 100 TB: a plain `groupBy(term).count()` shuffles
one row per distinct term — for web-scale token streams that is
billions of shuffle keys to answer a question about a few hundred.
Here the shuffle carries at most s × #partitions candidate summaries
plus the (candidate-filtered) exact counts; everything else dies
map-side. The summaries themselves are Arrow-batched pandas
`value_counts` merges, not per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_summaries(df: DataFrame, col: str, s: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: ≤ s rows per partition of
    (col, lb) where lb is a lower bound on the partition-local count
    undercounting by at most n_p/(s+1). State lives across the Arrow
    batches of one partition (mapInPandas receives the full partition
    as a batch iterator)."""
    field = df.schema[col]
    out_schema = f"`{col}` {field.dataType.simpleString()}, lb long"

    def summarize(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for key, c in pdf[col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > s:
                # subtract the (s+1)-th largest count from everything;
                # ≤ s keys can exceed it, and each reduction removes
                # ≥ d·(s+1) total mass → Σ decrements ≤ n_p/(s+1)
                d = sorted(counters.values(), reverse=True)[s]
                counters = {k: c - d for k, c in counters.items() if c > d}
        if counters:
            yield pd.DataFrame(
                {col: list(counters.keys()), "lb": list(counters.values())})

    return df.select(col).mapInPandas(summarize, out_schema)


def heavy_hitters_exact(df: DataFrame, col: str, s: int) -> DataFrame:
    """Exact frequencies of every value with count > n/s, computed
    without shuffling the full distinct-key space: Misra-Gries
    candidates (a guaranteed superset, since n/s > n/(s+1)) prune the
    stream before the exact groupBy; a single-row total joins in as a
    broadcast literal, never a driver-side collect."""
    cands = misra_gries_summaries(df, col, s).select(col).distinct()
    total = df.select(F.count("*").alias("_n"))
    counts = (
        df.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * s > F.col("_n"))
        .drop("_n")
    )


# --- Deterministic HyperLogLog (Flajolet et al. 2007) -----------------------
#
# Unlike `approx_count_distinct` (engine-specific HLL++ registers, not
# reproducible outside Spark), this sketch derives every register from
# md5 — so the identical register table, harmonic sum, and estimate can
# be recomputed by ANY engine, and the driver's value-hash check applies
# to an *approximate* operator. The price is md5 instead of xxhash64 —
# fine for a correctness-auditable variant; the scale story is identical
# (one map-side pass + a 64-row shuffle).

HLL_M_LOG2 = 8            # m = 256 registers (bucket = first hex byte)
HLL_RHO_HEX = 12          # rho read from 48 hash bits
HLL_RHO_MAX = 4 * HLL_RHO_HEX + 1


def hll_alpha_numerator() -> float:
    """alpha_m * m^2 * 2^RHO_MAX-1 exponent scaling, precomputed in Python
    so BOTH engines receive the same double literal (single IEEE division
    at the end keeps the estimate bit-identical)."""
    m = 1 << HLL_M_LOG2
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(1 << (HLL_RHO_MAX - 1))


def _rho(hexcol):
    """Position of the first 1-bit in the 4*HLL_RHO_HEX-bit value spelled
    by `hexcol` (1-based; all-zero -> HLL_RHO_MAX). Pure string ops so
    the identical computation is expressible in ANSI SQL: leading '0'
    hex chars contribute 4 zero bits each, the first non-zero hex char
    contributes 0-3 via a 15-way CASE."""
    trimmed = F.expr(f"trim(LEADING '0' FROM {hexcol})")
    z = F.lit(HLL_RHO_HEX) - F.length(trimmed)
    first = F.substring(trimmed, 1, 1)
    extra = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return (
        F.when(F.length(trimmed) == 0, F.lit(HLL_RHO_MAX))
        .otherwise(4 * z + extra + 1)
        .cast("int")
    )


def hll_distinct(df: DataFrame, col: str) -> DataFrame:
    """One-row deterministic-HLL distinct estimate: (m, v_zero,
    harmonic_scaled, hll_estimate, exact_distinct).

    harmonic_scaled = sum_j 2^(RHO_MAX-1-M[j]) over all m buckets
    (M=0 for empty buckets) — the harmonic mean's denominator as an
    EXACT integer (max m*2^48 = 2^54, inside int64), so the only float
    op is the final division. exact_distinct is carried for error
    auditing; at fleet scale you would drop it (that is the point of
    the sketch) — the estimate itself never depends on it."""
    h = F.md5(F.col(col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("bigint") % (
        1 << HLL_M_LOG2)
    df = df.select(
        bucket.alias("bucket"),
        F.substring(h, 3, HLL_RHO_HEX).alias("_rh"),
        F.col(col).alias("_v"),
    ).withColumn("rho", _rho("_rh"))
    regs = df.groupBy("bucket").agg(F.max("rho").alias("register"))
    m = 1 << HLL_M_LOG2
    agg = regs.agg(
        F.count("*").alias("_np"),
        F.sum(F.expr(
            f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX - 1} - register)"
        )).alias("_sp"),
    )
    exact = df.agg(F.countDistinct("_v").alias("exact_distinct"))
    numer = hll_alpha_numerator()
    return (
        agg.crossJoin(F.broadcast(exact))
        .select(
            F.lit(m).cast("bigint").alias("m"),
            (F.lit(m) - F.col("_np")).cast("bigint").alias("v_zero"),
            (F.col("_sp") + (F.lit(m) - F.col("_np"))
             * F.lit(1 << (HLL_RHO_MAX - 1)).cast("bigint")
             ).alias("harmonic_scaled"),
            "exact_distinct",
        )
        .withColumn(
            "hll_estimate",
            F.lit(numer) / F.col("harmonic_scaled").cast("double"),
        )
        .select("m", "v_zero", "harmonic_scaled", "hll_estimate",
                "exact_distinct")
    )


# --- Deterministic Count-Min (Cormode & Muthukrishnan 2005) -----------------

CM_DEPTH = 4
CM_WIDTH = 64


def _cm_hash(col, i: int):
    """Row-i Count-Min column: first 16 bits of md5('i:'||value) mod w."""
    h = F.md5(F.concat(F.lit(f"{i}:"), col.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % CM_WIDTH


def countmin_sketch(df: DataFrame, col: str) -> DataFrame:
    """The d x w counter table as rows (r, c, cnt) — one scan: each input
    row explodes into d (row, col) cells, then a map-side-combinable
    groupBy. At 100 TB the shuffle carries at most d*w = 256 keys."""
    cells = F.array(*[
        F.struct(F.lit(i).alias("r"), _cm_hash(F.col(col), i).alias("c"))
        for i in range(CM_DEPTH)
    ])
    return (
        df.select(F.explode(cells).alias("rc"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .agg(F.count("*").alias("cnt"))
    )


def countmin_estimates(df: DataFrame, col: str) -> DataFrame:
    """Per-distinct-value (value, exact_cnt, cm_estimate): estimate =
    min over rows of the counter at hash_i(value). The sketch is tiny
    (<= d*w rows) so the probe join broadcasts it; exact counts ride
    along to audit the overestimate (cm_estimate >= exact_cnt always —
    pinned in tests)."""
    sketch = countmin_sketch(df, col)
    keys = df.groupBy(F.col(col).alias("value")).agg(
        F.count("*").alias("exact_cnt"))
    probes = keys.select(
        "value", "exact_cnt",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("r"),
                     _cm_hash(F.col("value"), i).alias("c"))
            for i in range(CM_DEPTH)
        ])).alias("rc"),
    )
    return (
        probes.join(F.broadcast(sketch),
                    (probes["rc.r"] == sketch["r"])
                    & (probes["rc.c"] == sketch["c"]))
        .groupBy("value", "exact_cnt")
        .agg(F.min("cnt").alias("cm_estimate"))
    )
