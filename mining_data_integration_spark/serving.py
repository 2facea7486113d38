"""Serving-layer semantics (SURVEY §2.6 O5-O8, X12, A10, ST6):
the Express endpoint behaviors re-expressed as DataFrame transforms.

The reference serves from Redis-cached JSON arrays and slices in JS
(server.js:127-278); here each slice is a window/limit over a gold
table. Reference quirks are preserved deliberately and documented:

* tail_slice keeps `latest + 1` rows — the reference's
  `resp.slice(-latest - 1)` off-by-one (server.js:152, 184);
* mining_info is tip-first by construction (rpc.js:300), so its
  head-slice returns the *newest* rows (O5);
* RR is served rounded to 3 decimals (server.js:293 `toFixed(3)`) —
  kept numeric here, formatted at the JSON boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .core import GAS, STX_REWARD, STX_REWARD_BONUS


def head_slice(df: DataFrame, latest: int, order) -> DataFrame:
    """O5 (server.js:133-139): first `latest` rows in the given order."""
    return df.orderBy(*order).limit(latest)


def tail_slice(df: DataFrame, latest: int, order) -> DataFrame:
    """O6 (server.js:151-152, 183-184): the reference's
    `slice(-latest-1)` — the last `latest+1` rows, original order."""
    w = Window.orderBy(*[c.desc() if hasattr(c, "desc") else F.col(c).desc()
                         for c in order])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= latest + 1)
        .drop("_rn")
    )


def paginate(df: DataFrame, page: int, size: int, order) -> DataFrame:
    """O7 (server.js:153-155): offset pagination
    `slice(size*(page-1), size*page)`."""
    w = Window.orderBy(*order)
    lo, hi = size * (page - 1) + 1, size * page
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn").between(lo, hi))
        .drop("_rn")
    )


def range_slice(df: DataFrame, start: int, end: int, order) -> DataFrame:
    """O8 (server.js:175-187): 1-based inclusive `slice(start-1, end)`."""
    w = Window.orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn").between(start, end))
        .drop("_rn")
    )


def with_rr(miner_info: DataFrame, btc_price: float, stx_price: float,
            gas: int = GAS, ndigits: int = 3) -> DataFrame:
    """X12 (utils.js:1-11 + server.js:290-294): rate of return.

        earn = bonus_wins*2466*stx + (wins - bonus_wins)*1000*stx
        cost = (mined*gas + burned) * btc / 1e8
        RR   = earn/cost - 1            (0 cost -> NULL, JS yields NaN)

    Prices are scalars per refresh (J10's broadcast enrichment —
    server.js:162-171); passing them as literals keeps the plan free of
    a cross join."""
    earn = (
        F.col("actual_win_bonus") * STX_REWARD_BONUS * stx_price
        + (F.col("actual_win") - F.col("actual_win_bonus"))
        * STX_REWARD * stx_price
    )
    cost = (
        (F.col("total_mined") * gas + F.col("miner_burned")) * btc_price / 1e8
    )
    return miner_info.withColumn(
        "RR",
        F.when(cost != 0, F.round(earn / cost - 1, ndigits)),
    )


def trailing_miner_info(tables, n: int,
                        prepared=None) -> DataFrame:
    """A10 (server.js:304-331): the r100/r1000 views — the full miner
    pipeline restricted to the last n stacks blocks. A parameterized
    `between` on the same DAG (F4/F5), not a separate pipeline; the
    range filter lands on the enriched-commits scan."""
    from . import core

    p = prepared or core.prepare(tables)
    tip = p["snap"].agg(
        F.max("stacks_block_height").alias("t")).collect()[0].t
    if tip is None:
        return core.miner_info(tables, prepared=p)
    return core.miner_info(
        tables, start_height=max(0, tip - n), end_height=tip, prepared=p)


def btc_total(miner_info: DataFrame) -> DataFrame:
    """A8 (server.js:334-352): global sum(miner_burned)/1e8, 2 dp."""
    return miner_info.agg(
        F.round(F.sum("miner_burned") / F.lit(1e8), 2).alias("btc_total"))


def is_staged_synced(local_staging: DataFrame,
                     remote_staging: DataFrame) -> DataFrame:
    """ST6 (server.js:210-244): freshness gate — the local chain may
    mine only when its max processed stage height matches the peer's."""
    def stage_height(df: DataFrame):
        return (
            df.filter((F.col("processed") == 1) & (F.col("orphaned") == 0))
            .agg(F.max("height").alias("h"))
        )
    l, r = stage_height(local_staging), stage_height(remote_staging)
    return l.crossJoin(r.withColumnRenamed("h", "remote_h")).select(
        F.col("h").alias("local_height"),
        F.col("remote_h").alias("remote_height"),
        (F.col("h") == F.col("remote_h")).alias("can_mine"),
    )
