"""Incremental gold refresh (ST5 extension).

The reference recomputes everything every 120 s (server.js:280-302);
`streaming.refresh_once` reproduces that. For a steadily-growing chain
the full recompute is mostly wasted work: blocks below
`tip - reorg_depth` can no longer change (the standard bounded-reorg
assumption; the full recompute remains available as the fallback for
anything deeper).

Scheme — gold tables partitioned by height bucket, refreshed with
dynamic partition overwrite:

* `mining_info` / `block_info` are per-height outputs: recompute only
  rows with height >= tip - reorg_depth and overwrite just the
  affected `hbucket=` partitions. The height filter sits directly on
  the enriched-commits join output, so Catalyst prunes the untouched
  span.
* `miner_info` is a whole-history aggregate, so it keeps per-bucket
  *partial* aggregates (sums/counts decompose by bucket): affected
  buckets are re-aggregated and overwritten, then the final per-miner
  merge reads all partials — a table of O(miners x buckets) rows,
  thousands of times smaller than the commits it summarizes.

Every write stays atomic per partition; a crash mid-refresh leaves
whole old partitions, never torn rows.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import core

HEIGHTS_PER_BUCKET = 1000

# Layout/axis version of the persisted canonical-chain state. Version 2
# buckets canonical_chain on STACKS height (round 9 changed the axis
# from burn height). The marker gates every warm read: a gold_dir
# written by a previous layout — or by any build that predates the
# marker — fails the check and forces a COLD rebuild that deletes and
# rewrites the state. Without the gate, dynamic partition overwrite
# would rewrite only new-axis buckets and leave stale old-axis rows in
# place, silently duplicating join keys in prepare_full_with_gold's
# members union (round-10 ADVICE).
STATE_LAYOUT_VERSION = 2

# hard ceiling on the driver-side window-walk collect regardless of
# reorg_depth: above this the tick uses the distributed segmented walk
WALK_COLLECT_CAP = 1_000_000


def _hb(col: str = "stacks_block_height") -> F.Column:
    return (F.col(col) / HEIGHTS_PER_BUCKET).cast("long").alias("hbucket")


def _prune_buckets_above(path: str, max_bucket: int) -> None:
    """Delete hbucket partitions above the CURRENT tip's bucket.

    Dynamic partition overwrite only rewrites buckets present in the
    new frame — after a reorg that LOWERS the tip, a bucket above the
    new tip gets no new rows and would silently keep the abandoned
    fork's rows (phantom gold rows above the tip; for miner_partials,
    phantom per-miner stats that the merge would fold into miner_info).
    Runs after every refresh's writes; in the steady state (tip never
    lower than last refresh) it deletes nothing."""
    try:
        names = os.listdir(path)
    except OSError:
        return
    for n in names:
        if n.startswith("hbucket="):
            try:
                b = int(n.split("=", 1)[1])
            except ValueError:
                continue
            if b > max_bucket:
                shutil.rmtree(os.path.join(path, n), ignore_errors=True)


def _write_dynamic(df: DataFrame, path: str) -> None:
    # one file per bucket partition (not one per shuffle task): the
    # partials/state tables are read back whole every tick, and a
    # files-per-bucket factor multiplies straight into that listing
    # and scheduling cost
    (df.repartition("hbucket").write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("hbucket")
     .parquet(path))


def miner_partials(prepared: dict[str, DataFrame],
                   bonus_height: int = core.BONUS_HEIGHT) -> DataFrame:
    """Per-(hbucket, miner) partials of every A1/A3 measure. All of
    them are sums/counts, so bucket partials merge exactly."""
    enriched = prepared["enriched"].withColumn("hbucket", _hb())
    stats = enriched.groupBy("hbucket", "leader_key_address").agg(
        F.count("*").alias("total_mined"),
        F.sum("burn_fee").alias("miner_burned"),
        F.sum("actual_burn").alias("total_burn"),
        F.sum(F.when(F.col("is_winner"), 1).otherwise(0)).alias("total_win"),
    )
    wins = (
        prepared["winners"]
        .withColumn("hbucket", _hb("stacks_height"))
        .groupBy("hbucket", "leader_key_address")
        .agg(F.count("*").alias("actual_win"),
             F.sum(F.when(F.col("stacks_height") < bonus_height, 1)
                   .otherwise(0)).alias("actual_win_bonus"))
    )
    return stats.join(wins, ["hbucket", "leader_key_address"], "full") \
        .na.fill(0, ["total_mined", "total_win", "actual_win",
                     "actual_win_bonus"])


def merge_miner_partials(partials: DataFrame) -> DataFrame:
    """Final per-miner merge -> the exact miner_info projection."""
    return (
        partials.groupBy("leader_key_address")
        .agg(F.sum("actual_win").alias("actual_win"),
             F.sum("actual_win_bonus").alias("actual_win_bonus"),
             F.sum("total_win").alias("total_win"),
             F.sum("total_mined").alias("total_mined"),
             F.sum("miner_burned").alias("miner_burned"))
        .select(
            F.col("leader_key_address").alias("stx_address"),
            "actual_win", "actual_win_bonus",
            "total_win", "total_mined", "miner_burned",
        )
        .orderBy("stx_address")
    )


def _state_layout_ok(gold_dir: str) -> bool:
    """True iff the persisted chain state was written by THIS layout
    version (see STATE_LAYOUT_VERSION)."""
    try:
        with open(os.path.join(gold_dir, "STATE_LAYOUT")) as f:
            return int(f.read().strip()) == STATE_LAYOUT_VERSION
    except (OSError, ValueError):
        return False


def reset_state_for_layout(gold_dir: str) -> None:
    """Before a FULL state rewrite: if the layout marker is missing or
    mismatched, DELETE the state directories. Dynamic partition
    overwrite only rewrites buckets present in the new frame, so
    stale buckets written on a different axis would otherwise survive
    the rewrite."""
    if _state_layout_ok(gold_dir):
        return
    shutil.rmtree(os.path.join(gold_dir, "canonical_chain"),
                  ignore_errors=True)
    shutil.rmtree(os.path.join(gold_dir, "canonical_stacks"),
                  ignore_errors=True)


def mark_state_layout(gold_dir: str) -> None:
    """After a successful FULL state write: record the layout version
    (atomic replace — a crash between the state write and the marker
    leaves the marker absent, which just forces one more cold
    rebuild)."""
    os.makedirs(gold_dir, exist_ok=True)
    marker = os.path.join(gold_dir, "STATE_LAYOUT")
    tmp = f"{marker}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(str(STATE_LAYOUT_VERSION))
    os.replace(tmp, marker)


def _window_chain_state(spark: SparkSession, tables: dict[str, DataFrame],
                        gold_dir: str, reorg_depth: int) -> dict | None:
    """Boundary-verified window chain state — the shared walk half of
    both incremental ticks (_windowed_prepare) and warm full
    refreshes (prepare_full_with_gold): probe the tips, walk ONLY the
    last `reorg_depth` blocks of both chains, and verify each window
    floor's parent against the persisted canonical state one height
    below. Returns None when the anchor fails (no state yet, empty
    window, or a reorg deeper than the window) — callers fall back
    to the from-scratch walk.

    Returns {'wchain', 'wstacks' (window rows joined to their walk
    membership, lazily checkpointed), 'floors', 'prev_total',
    'aligned_floor', 'tip_stacks', 'stored_chain', 'stored_stacks'}."""
    from .chain import chain_members_segmented
    from .schemas import ZERO64

    # layout gate FIRST: state written on a different bucket axis must
    # never anchor a warm path (the floor-1 boundary probe cannot
    # detect axis-mixed buckets — round-10 ADVICE)
    if not _state_layout_ok(gold_dir):
        return None
    try:
        stored_chain = spark.read.parquet(f"{gold_dir}/canonical_chain")
        stored_stacks = spark.read.parquet(f"{gold_dir}/canonical_stacks")
    except Exception:
        return None

    # scalar probes are BATCHED: each 1-row collect is its own Spark
    # job, and on a small tick those fixed job floors — not data —
    # dominate the latency. Independent probes union into one job
    # (three probe jobs per tick: tips, floors, boundary anchors).
    valid = tables["snapshots"].filter(F.col("pox_valid") != 0)
    headers = tables["block_headers"]
    tip_probe = (
        valid.orderBy(F.desc("block_height"), F.col("burn_header_hash"))
        .limit(1)
        .select(F.lit("burn").alias("side"),
                F.col("burn_header_hash").alias("id"),
                F.col("stacks_block_height"))
        .unionByName(
            headers.orderBy(F.desc("block_height"), F.col("block_hash"))
            .limit(1)
            .select(F.lit("stacks").alias("side"),
                    F.col("block_hash").alias("id"),
                    F.lit(None).cast("long").alias("stacks_block_height")))
    ).collect()
    tips = {r.side: r for r in tip_probe}
    if "burn" not in tips or "stacks" not in tips:
        return None
    # bucket-ALIGNED window on the stacks-height axis: dynamic
    # overwrite rewrites whole hbucket partitions, so the window must
    # fully cover every bucket it touches — a mid-bucket floor would
    # drop the bucket's below-window rows on rewrite
    tip_stacks = tips["burn"].stacks_block_height or 0
    aligned_floor = (max(0, tip_stacks - reorg_depth)
                     // HEIGHTS_PER_BUCKET) * HEIGHTS_PER_BUCKET
    window = valid.filter(F.col("stacks_block_height") >= aligned_floor)

    # stacks side windows on the same aligned floor (its height IS the
    # mining_info bucket axis; a burn row's stacks_block_height is >=
    # its anchored header's height, so enriched covers these wins)
    wheaders = headers.filter(F.col("block_height") >= aligned_floor)

    # chain walks: the window holds O(reorg_depth) rows — a
    # CONFIG-bounded driver artifact, same class as the k-centroid and
    # shard-summary collects — so BOTH walks run driver-side off ONE
    # collect job (the distributed segmented walk costs 2-3 jobs per
    # chain, pure fixed overhead at window size). The cap enforces the
    # bound; a window above it (misconfigured reorg_depth) falls back
    # to the distributed engine, result-identical.
    cap = min(4 * reorg_depth + 20_000, WALK_COLLECT_CAP)
    edge_rows = (
        window.select(F.lit("burn").alias("side"),
                      F.col("burn_header_hash").alias("id"),
                      F.col("parent_burn_header_hash").alias("parent"),
                      F.col("block_height").alias("h"))
        .unionByName(
            wheaders.select(F.lit("stacks").alias("side"),
                            F.col("block_hash").alias("id"),
                            F.col("parent_block").alias("parent"),
                            F.col("block_height").alias("h")))
        .limit(cap + 1)
    ).collect()

    floors = {}
    if len(edge_rows) <= cap:
        from types import SimpleNamespace

        # driver walk: follow parent pointers from each tip; the walk
        # leaves the window exactly where the parent id is absent
        member_dfs = {}
        id_field = {"burn": "burn_header_hash", "stacks": "block_hash"}
        for side in ("burn", "stacks"):
            by_id = {r.id: r for r in edge_rows if r.side == side}
            mem, cur, seen = [], tips[side].id, set()
            while cur in by_id and cur not in seen:
                seen.add(cur)
                mem.append(by_id[cur])
                cur = by_id[cur].parent
            if not mem:
                return None
            floor_row = mem[-1]           # deepest = lowest height
            floors[side] = SimpleNamespace(
                parent=floor_row.parent, block_height=floor_row.h)
            member_dfs[side] = F.broadcast(spark.createDataFrame(
                [(r.id,) for r in mem], f"{id_field[side]} string"))
        members, smembers = member_dfs["burn"], member_dfs["stacks"]
    else:
        members = chain_members_segmented(
            window, tips["burn"].id,
            id_col="burn_header_hash",
            parent_col="parent_burn_header_hash",
            height_col="block_height")
        smembers = chain_members_segmented(
            wheaders, tips["stacks"].id,
            id_col="block_hash", parent_col="parent_block",
            height_col="block_height")

    # checkpoint the (small) windowed chains: lag-delta, enrichment
    # and the state write all consume them — without this the walk
    # join re-executes once per downstream action. LAZY: the first
    # consumer materializes it inside its own job (no extra barrier).
    wchain = window.join(members, "burn_header_hash") \
        .localCheckpoint(eager=False)
    wstacks = wheaders.join(smembers, "block_hash") \
        .localCheckpoint(eager=False)

    if not floors:
        # distributed-walk fallback: probe both window floors, one job
        floor_probe = (
            wchain.orderBy("block_height").limit(1)
            .select(F.lit("burn").alias("side"),
                    F.col("parent_burn_header_hash").alias("parent"),
                    F.col("block_height"))
            .unionByName(
                wstacks.orderBy("block_height").limit(1)
                .select(F.lit("stacks").alias("side"),
                        F.col("parent_block").alias("parent"),
                        F.col("block_height")))
        ).collect()
        floors = {r.side: r for r in floor_probe}
        if "burn" not in floors or "stacks" not in floors:
            return None

    # boundary verify, both chains in one job: each window floor's
    # parent must be the stored canonical row one height below —
    # otherwise the reorg is deeper than the window -> full recompute
    prev_probe = (
        stored_chain.filter(
            F.col("block_height") == floors["burn"].block_height - 1)
        .select(F.lit("burn").alias("side"),
                F.col("burn_header_hash").alias("id"),
                F.col("total_burn"))
        .unionByName(
            stored_stacks.filter(
                F.col("block_height") == floors["stacks"].block_height - 1)
            .select(F.lit("stacks").alias("side"),
                    F.col("block_hash").alias("id"),
                    F.lit(None).cast("long").alias("total_burn")))
    ).collect()
    prevs = {r.side: r for r in prev_probe}
    if floors["burn"].parent != ZERO64:
        if "burn" not in prevs or prevs["burn"].id != floors["burn"].parent:
            return None
    prev_total = prevs["burn"].total_burn if "burn" in prevs else 0
    if floors["stacks"].parent != ZERO64:
        if "stacks" not in prevs or \
                prevs["stacks"].id != floors["stacks"].parent:
            return None
    return {"wchain": wchain, "wstacks": wstacks, "floors": floors,
            "prev_total": prev_total, "aligned_floor": aligned_floor,
            "tip_stacks": tip_stacks, "stored_chain": stored_chain,
            "stored_stacks": stored_stacks}


def _windowed_prepare(spark: SparkSession, tables: dict[str, DataFrame],
                      gold_dir: str, reorg_depth: int) -> dict | None:
    """Window-bounded version of core.prepare: walk only the last
    `reorg_depth` blocks, anchored on the persisted canonical-chain
    state at the window floor. Returns None when the incremental
    anchor fails — callers fall back to the full recompute.

    This is where the incremental tick stops paying for history: the
    chain walks, the lag-delta and the commit-enrichment join all see
    only O(reorg_depth) snapshot rows. (The commits scan itself prunes
    at the storage layer when bronze is partitioned by burn-height
    bucket; the join keeps only window rows either way.)"""
    from pyspark.sql import Window

    st = _window_chain_state(spark, tables, gold_dir, reorg_depth)
    if st is None:
        return None
    wchain, wstacks = st["wchain"], st["wstacks"]
    floors, prev_total = st["floors"], st["prev_total"]
    aligned_floor, tip_stacks = st["aligned_floor"], st["tip_stacks"]

    # single-partition lag is FINE here: wchain holds only the
    # O(reorg_depth) window, not history (the full-history paths use
    # the sharded core.with_actual_burn)
    w = Window.orderBy("block_height")
    snap = core._ckpt(wchain.withColumn(
        "actual_burn",
        F.col("total_burn") - F.lag("total_burn", 1, prev_total).over(w),
    ))

    commits = tables["block_commits"]
    if "hbucket" in commits.columns:
        # height-bucketed bronze (io.write_bronze_commits): the window
        # floor's BURN height prunes whole commit partitions at the
        # scan — the windowed tick's last O(history) input goes away
        commits = commits.filter(
            F.col("hbucket")
            >= floors["burn"].block_height // HEIGHTS_PER_BUCKET)
    enriched = core.commits_enriched(
        snap, commits.drop("hbucket"), tables["leader_keys"]).cache()
    chain_cols = wstacks.select(
        "burn_header_hash", F.col("block_height").alias("stacks_height"))
    winners = core._ckpt(
        enriched.filter(F.col("is_winner"))
        .join(F.broadcast(chain_cols), "burn_header_hash")
    )
    return {"snap": snap, "enriched": enriched, "winners": winners,
            "wchain": wchain, "wstacks": wstacks,
            "aligned_floor": aligned_floor, "tip_stacks": tip_stacks}


def prepare_full_with_gold(spark: SparkSession,
                           tables: dict[str, DataFrame],
                           gold_dir: str,
                           reorg_depth: int = 100,
                           stage_timings: dict | None = None
                           ) -> dict | None:
    """WARM full-refresh prepare (round-9 VERDICT #7): core.prepare's
    exact output contract, but the canonical-chain membership is
    persisted state below the window floor UNION a freshly walked
    reorg window — so the walk stage costs O(reorg_depth) instead of
    re-walking from genesis, while the E1 join DAG still covers full
    history and the outputs stay byte-identical to core.prepare
    (golden equivalence in tests/test_incremental.py).

    Soundness is the same boundary argument as the windowed tick: the
    window floor's parent is verified against the stored canonical
    row one height below (_window_chain_state), and rows below the
    floor are immutable under the bounded-reorg assumption; state
    buckets align with the window floor's axis, so windowed overwrite
    can never leave holes in the stored history this reads. Returns
    None when the anchor fails (no state yet, or a deeper reorg) —
    callers fall back to the from-scratch core.prepare."""
    from time import perf_counter as _pc

    _t0 = _pc()
    st = _window_chain_state(spark, tables, gold_dir, reorg_depth)
    if st is None:
        return None
    if stage_timings is not None:
        # the part the warm path actually shrinks: O(reorg_depth)
        # probes + walks, comparable to the tick's walk stage. The
        # remainder of the prepare (full snap join + lag + eager
        # checkpoint) is O(history) and identical in the cold path.
        stage_timings["window_walk"] = round(_pc() - _t0, 3)
    _t0 = _pc()
    floor = st["aligned_floor"]
    # full canonical membership: stored history strictly below the
    # floor (disjoint from the window by construction) + window walk
    members = (
        st["stored_chain"]
        .filter(F.col("stacks_block_height") < floor)
        .select("burn_header_hash")
        .unionByName(st["wchain"].select("burn_header_hash"))
    )
    valid = tables["snapshots"].filter(F.col("pox_valid") != 0)
    # the A2 lag-delta over FULL history rides the sharded global_lag
    # (core.with_actual_burn) — the warm path must not reintroduce the
    # single-partition window the cold path removed (round-9 VERDICT
    # #1). Lazy-checkpoint the membership join first: the lag's
    # boundary sampling is the first consumer and materializes it once.
    joined = core._ckpt(
        valid.join(members, "burn_header_hash"), eager=False)
    # lazy (round-14, VERDICT #9): the winners build below is the
    # warm refresh's first action over snap and materializes the lag
    # blocks inside a job it runs anyway — the eager form paid one
    # extra full pass (history_materialize carried a dedicated
    # lag+checkpoint job). The lag's boundary sampling reads `joined`,
    # whose own lazy checkpoint the first sampling job populates.
    snap = core._ckpt(core.with_actual_burn(joined), eager=False)
    commits = tables["block_commits"]
    if "hbucket" in commits.columns:
        commits = commits.drop("hbucket")  # full history — no pruning
    enriched = core.commits_enriched(
        snap, commits, tables["leader_keys"]).cache()
    chain_cols = (
        st["stored_stacks"]
        .filter(F.col("block_height") < floor)
        .select("burn_header_hash",
                F.col("block_height").alias("stacks_height"))
        .unionByName(st["wstacks"].select(
            "burn_header_hash",
            F.col("block_height").alias("stacks_height")))
    )
    winners = (
        enriched.filter(F.col("is_winner"))
        .join(F.broadcast(chain_cols), "burn_header_hash")
        .localCheckpoint(eager=True)
    )
    if stage_timings is not None:
        stage_timings["history_materialize"] = round(_pc() - _t0, 3)
    return {"snap": snap, "enriched": enriched, "winners": winners,
            "wchain": st["wchain"], "wstacks": st["wstacks"],
            "aligned_floor": floor, "tip_stacks": st["tip_stacks"]}


def chain_state_frames(prepared: dict) -> tuple[DataFrame, DataFrame]:
    """The two canonical-chain state frames (burn chain, stacks
    chain) from a prepared dict carrying wchain/wstacks — shared by
    the incremental tick and refresh_once's state maintenance.

    canonical_chain state buckets on the STACKS height axis — the
    SAME axis the window floor aligns on. Bucketing on burn height
    would let a window overwrite straddle a bucket whose low side
    holds sub-floor rows, silently dropping them from state; the
    boundary probe only reads floor-1 so windowed ticks never
    noticed, but prepare_full_with_gold reads the WHOLE stored
    history and needs it hole-free."""
    chain_df = prepared["wchain"].select(
        "burn_header_hash", "parent_burn_header_hash",
        "block_height", "stacks_block_height", "total_burn") \
        .withColumn("hbucket", (F.col("stacks_block_height")
                                / HEIGHTS_PER_BUCKET).cast("long"))
    stacks_df = prepared["wstacks"].select(
        "block_hash", "parent_block", "block_height",
        "burn_header_hash") \
        .withColumn("hbucket", (F.col("block_height")
                                / HEIGHTS_PER_BUCKET).cast("long"))
    return chain_df, stacks_df


def incremental_refresh(spark: SparkSession, tables: dict[str, DataFrame],
                        gold_dir: str, reorg_depth: int = 100,
                        stage_timings: dict | None = None) -> dict:
    """One incremental tick: windowed when persisted state + boundary
    anchors allow it, full recompute otherwise. Returns
    {'tip', 'lo_height', 'buckets_from', 'mode'}.

    Pass a dict as `stage_timings` to receive the tick's phase
    breakdown (seconds): 'walk' (window prepare — the reorg-depth
    chain walks and anchor probes), 'gold_writes' (the five
    concurrent gold writes, which also execute the join DAG — Spark
    is lazy, so join and write cost are one phase here), 'merge'
    (partials fold + miner_info rewrite). Zero overhead beyond two
    perf_counter calls per phase."""
    from time import perf_counter as _pc

    _t0 = _pc()
    prepared = _windowed_prepare(spark, tables, gold_dir, reorg_depth)
    mode = "windowed"
    if prepared is None:
        mode = "full"
        # bucketed-bronze commits carry an hbucket partition column the
        # core DAG must not see (miner_partials derives its own)
        tables = dict(tables)
        tables["block_commits"] = tables["block_commits"].drop("hbucket")
        prepared = core.prepare(tables)
        # prepare() already walked + checkpointed the stacks chain
        # (round-13) — reuse it instead of walking headers again
        prepared["wchain"] = prepared["snap"]
        prepared["wstacks"] = prepared["stacks_chain"]
    if stage_timings is not None:
        # covers the windowed prepare AND the full-recompute fallback's
        # core.prepare (whose eager localCheckpoints run the walks)
        stage_timings["walk"] = round(_pc() - _t0, 3)

    try:
        # the windowed tick already knows its tip from the probe batch;
        # only the full path pays the extra 1-row aggregate job
        tip = prepared.get("tip_stacks")
        if tip is None:
            tip = prepared["snap"].agg(
                F.max("stacks_block_height").alias("t")).collect()[0].t
        lo = prepared.get("aligned_floor", 0) if mode == "windowed" else 0
        lo_bucket = lo // HEIGHTS_PER_BUCKET
        affected = F.col("hbucket") >= lo_bucket

        mi = core.mining_info(tables, prepared=prepared) \
            .withColumn("hbucket", _hb()).filter(affected)
        bi = core.block_info(tables, prepared=prepared) \
            .withColumn("hbucket", _hb()).filter(affected)
        pt = miner_partials(prepared).filter(affected)

        # the five gold writes hit DIFFERENT paths off shared cached/
        # checkpointed intermediates — submit them concurrently (Spark's
        # scheduler interleaves jobs from multiple threads; the block
        # manager serializes any racing cache fill). On a small tick the
        # wall cost drops from the SUM of five write jobs to the MAX.
        from concurrent.futures import ThreadPoolExecutor

        chain_df, stacks_df = chain_state_frames(prepared)
        writes = [
            (mi, f"{gold_dir}/mining_info"),
            (bi, f"{gold_dir}/block_info"),
            (pt, f"{gold_dir}/miner_partials"),
            (chain_df, f"{gold_dir}/canonical_chain"),
            (stacks_df, f"{gold_dir}/canonical_stacks"),
        ]
        _t0 = _pc()
        if mode == "full":
            # a full rewrite covers every bucket of the CURRENT axis;
            # stale buckets from a different layout must be deleted
            # first, and the marker written only after the writes land
            reset_state_for_layout(gold_dir)
        with ThreadPoolExecutor(max_workers=len(writes)) as pool:
            futures = [pool.submit(_write_dynamic, df, path)
                       for df, path in writes]
            for f in futures:
                f.result()   # surface the first failure
        if mode == "full":
            mark_state_layout(gold_dir)
        # reorg-shrink guard: a tip LOWER than the previous refresh's
        # leaves its old high buckets unrewritten by dynamic overwrite
        # — drop every bucket above the new tip, in the outputs AND
        # the chain state (a stale state bucket would re-enter the
        # members union once a later floor passes it). Two bounds, two
        # axes: tables keyed by SNAPSHOT stacks height (block_info,
        # partials' stats side, canonical_chain) prune above the burn
        # tip's stacks height; tables keyed by the STACKS HEADER chain
        # (mining_info winners, canonical_stacks) prune above the
        # header tip, which can sit below the snapshot-side height.
        stip = prepared["wstacks"].agg(
            F.max("block_height")).collect()[0][0]
        tip_bucket = (tip or 0) // HEIGHTS_PER_BUCKET
        stip_bucket = (stip or 0) // HEIGHTS_PER_BUCKET
        for p, b in (("mining_info", stip_bucket),
                     ("canonical_stacks", stip_bucket),
                     ("block_info", tip_bucket),
                     ("miner_partials", tip_bucket),
                     ("canonical_chain", tip_bucket)):
            _prune_buckets_above(f"{gold_dir}/{p}", b)
        if stage_timings is not None:
            stage_timings["gold_writes"] = round(_pc() - _t0, 3)

        _t0 = _pc()
        merged = merge_miner_partials(
            spark.read.parquet(f"{gold_dir}/miner_partials"))
        # O(miners) rows: one output file, not one per shuffle task —
        # the gold is re-read whole every serving call
        merged.coalesce(1).write.mode("overwrite") \
            .parquet(f"{gold_dir}/miner_info")
        if stage_timings is not None:
            stage_timings["merge"] = round(_pc() - _t0, 3)
        return {"tip": tip, "lo_height": lo, "buckets_from": lo_bucket,
                "mode": mode}
    finally:
        prepared["enriched"].unpersist()
