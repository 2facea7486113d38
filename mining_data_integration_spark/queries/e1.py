"""E1 DAG parity queries, oracle-backed (VERDICT r5 #7).

Until round 6 the E1 gold tables (core.miner_info / core.mining_info —
the reference's actual dashboard outputs, rpc.js:244-308, 435-457)
were pinned by golden tests only; the driver's DuckDB gate never saw
them because the mining tables have no driver parquet. These queries
close that: the synthetic mining world (synthworld.synth_mining_world
— pure closed-form expressions) is generated INSIDE the query, the
full E1 DAG runs over it (F1/F2 canonical walk -> A2 lag-delta ->
J2/J6/J7 enrichment -> J9 stacks walk -> A1/A3 aggregates -> F11/F12
projections), and the oracle replays every step in DuckDB SQL with the
F2 and J9 walks as genuine WITH RECURSIVE ancestor chains.

Fixture shape: 3000 burn blocks with pox-invalid and dead-fork twins
at 1% of heights (the walks do real exclusion work), 4 commits/block,
50 miners. The bonus-era boundary is overridden to stacks height 2500
so BOTH reward eras are exercised inside the 0..2999 height range
(the reference constant 8387, rpc.js:303-304, sits above this world's
tip; core.BONUS_HEIGHT remains the default everywhere else).

Hash-string note: Spark renders the synthetic hashes via conv() in
UPPERCASE hex, DuckDB via printf('%064x') in lowercase. Hashes are
join keys only — never output columns — and each engine is internally
consistent, so parity is unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

E1_BLOCKS = 3000
E1_CPB = 4
E1_MINERS = 50
E1_BONUS = 2500


def _world(spark: SparkSession):
    from ..synthworld import synth_mining_world

    return synth_mining_world(spark, E1_BLOCKS, E1_CPB,
                              n_miners=E1_MINERS)


def e1_miner_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship E1 output end-to-end (F11, rpc.js:435-444), driver
    hash-checked against a full SQL replay: per-miner mined/burned/won
    counters over the canonical chain, canonical-fork wins split at
    the (overridden) bonus boundary. sf_dir is unused — the world is
    generated, not read — so the check is sf-invariant by design."""
    from ..core import miner_info

    mi = miner_info(_world(spark), bonus_height=E1_BONUS)
    return mi.select(
        "stx_address",
        F.col("actual_win").cast("long").alias("actual_win"),
        F.col("actual_win_bonus").cast("long").alias("actual_win_bonus"),
        F.col("total_win").cast("long").alias("total_win"),
        F.col("total_mined").cast("long").alias("total_mined"),
        F.col("miner_burned").cast("long").alias("miner_burned"),
    ).orderBy("stx_address")


def e1_mining_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 (rpc.js:449-457): the winning commit of every canonical
    Stacks block, tip-first — J9 walk output joined back to the
    enriched commits, driver hash-checked against the recursive-CTE
    replay."""
    from ..core import mining_info

    return mining_info(_world(spark)).select(
        F.col("stacks_block_height").cast("long")
        .alias("stacks_block_height"),
        "stx_address",
        F.col("burn_fee").cast("long").alias("burn_fee"),
    ).orderBy(F.desc("stacks_block_height"))


QUERIES = {
    "e1_miner_info": e1_miner_info,
    "e1_mining_info": e1_mining_info,
}

# Shared oracle scaffold: the synthetic world + both canonical walks,
# replayed in DuckDB. printf('%064x', n) is DuckDB's h(n).
_E1_WORLD = f"""
    WITH RECURSIVE
    blocks AS (SELECT range + 1000 AS bh FROM range({E1_BLOCKS})),
    snaps AS (
        SELECT bh AS block_height, printf('%064x', bh) AS bhh,
               printf('%064x', bh - 1) AS parent, 1 AS pox_valid,
               bh * 1000 AS total_burn,
               printf('%064x', bh * {E1_CPB}) AS win_txid,
               bh AS sbh
        FROM blocks
        UNION ALL
        SELECT bh, printf('%064x', bh + 40000000), printf('%064x', bh - 1),
               1, bh * 1000, printf('%064x', bh * {E1_CPB}), bh
        FROM blocks WHERE bh % 100 = 13
        UNION ALL
        SELECT bh, printf('%064x', bh + 20000000), printf('%064x', bh - 1),
               0, bh * 1000, printf('%064x', bh * {E1_CPB}), bh
        FROM blocks WHERE bh % 100 = 13
    ),
    valid AS (SELECT * FROM snaps WHERE pox_valid = 1),
    tip AS (
        SELECT bhh FROM valid ORDER BY block_height DESC, bhh LIMIT 1
    ),
    walk AS (
        SELECT bhh, parent FROM valid WHERE bhh IN (SELECT bhh FROM tip)
        UNION ALL
        SELECT v.bhh, v.parent
        FROM valid v JOIN walk w ON v.bhh = w.parent
    ),
    canon AS (
        SELECT * FROM valid WHERE bhh IN (SELECT bhh FROM walk)
    ),
    burn AS (
        SELECT bhh, block_height, sbh, win_txid,
               total_burn - coalesce(
                   lag(total_burn) OVER (ORDER BY block_height), 0
               ) AS actual_burn
        FROM canon
    ),
    commits AS (
        SELECT printf('%064x', bh) AS bhh,
               printf('%064x', bh * {E1_CPB} + c) AS txid,
               (bh + c) % 9999 + 1 AS burn_fee,
               (bh + c) % {E1_MINERS} AS key_vtxindex
        FROM blocks, range({E1_CPB}) r(c)
    ),
    enr AS (
        SELECT 'MINER_' || c2.key_vtxindex AS addr, c2.burn_fee,
               b.sbh, b.bhh, (c2.txid = b.win_txid) AS is_winner
        FROM commits c2 JOIN burn b USING (bhh)
    ),
    heads AS (
        SELECT printf('%064x', bh) AS bhh,
               printf('%064x', bh + 30000000) AS shash,
               CASE WHEN bh = 1000 THEN repeat('0', 64)
                    ELSE printf('%064x', bh - 1 + 30000000)
               END AS sparent,
               bh - 1000 AS sheight
        FROM blocks
    ),
    stip AS (
        SELECT shash FROM heads ORDER BY sheight DESC, shash LIMIT 1
    ),
    swalk AS (
        SELECT shash, sparent FROM heads
        WHERE shash IN (SELECT shash FROM stip)
        UNION ALL
        SELECT h.shash, h.sparent
        FROM heads h JOIN swalk w ON h.shash = w.sparent
    ),
    schain AS (
        SELECT bhh, sheight FROM heads
        WHERE shash IN (SELECT shash FROM swalk)
    )
"""

ORACLES = {
    "e1_miner_info": _E1_WORLD + f""",
    stats AS (
        SELECT addr, count(*) AS total_mined,
               sum(burn_fee) AS miner_burned,
               sum(CASE WHEN is_winner THEN 1 ELSE 0 END) AS total_win
        FROM enr GROUP BY addr
    ),
    wins AS (
        SELECT e.addr, count(*) AS actual_win,
               sum(CASE WHEN s.sheight < {E1_BONUS} THEN 1 ELSE 0 END)
                   AS actual_win_bonus
        FROM enr e JOIN schain s ON s.bhh = e.bhh
        WHERE e.is_winner GROUP BY e.addr
    )
    SELECT s.addr AS stx_address,
           CAST(coalesce(w.actual_win, 0) AS BIGINT) AS actual_win,
           CAST(coalesce(w.actual_win_bonus, 0) AS BIGINT)
               AS actual_win_bonus,
           CAST(s.total_win AS BIGINT) AS total_win,
           CAST(s.total_mined AS BIGINT) AS total_mined,
           CAST(s.miner_burned AS BIGINT) AS miner_burned
    FROM stats s LEFT JOIN wins w ON s.addr = w.addr
    ORDER BY stx_address
""",
    "e1_mining_info": _E1_WORLD + """
    SELECT CAST(s.sheight AS BIGINT) AS stacks_block_height,
           e.addr AS stx_address,
           CAST(e.burn_fee AS BIGINT) AS burn_fee
    FROM enr e JOIN schain s ON s.bhh = e.bhh
    WHERE e.is_winner
    ORDER BY stacks_block_height DESC
""",
}


def a4_win_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 (rpc.js:271, 305) — the LAST SURVEY §2 operator id: the
    reference computes two global running counters while it loops —
    win_total (winning commits on the canonical burn chain) and
    actual_win_total (wins that also landed on the canonical Stacks
    fork) — and only ever console.logs them; no served output reads
    them. Implemented anyway as a 1-row query over the synthetic E1
    world so the id flips from partial-by-design to oracle-checked:
    two count aggregates off the shared prepared intermediates (the
    exact frames A1/A3 consume), combined by a 1-row broadcast
    cross-join (the g2 pattern, plan-audit whitelisted)."""
    from ..core import prepare

    p = prepare(_world(spark))
    a = p["enriched"].filter(F.col("is_winner")).agg(
        F.count("*").cast("long").alias("win_total"))
    b = p["winners"].agg(
        F.count("*").cast("long").alias("actual_win_total"))
    return a.crossJoin(F.broadcast(b))


QUERIES["a4_win_totals"] = a4_win_totals

ORACLES["a4_win_totals"] = _E1_WORLD + """
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM enr
            WHERE is_winner) AS win_total,
           (SELECT CAST(count(*) AS BIGINT)
            FROM enr e JOIN schain s ON s.bhh = e.bhh
            WHERE e.is_winner) AS actual_win_total
"""
