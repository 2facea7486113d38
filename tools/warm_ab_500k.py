"""Targeted warm-refresh A/B at 500k blocks (round-14): time ONLY the
warm full refresh (prepare_full_with_gold path) on the already-landed
/tmp/bench_e1_bronze world, 3 runs + 1 discarded warm-up, printing the
stage split per run. Flip the snap checkpoint in
incremental.prepare_full_with_gold between runs of this script to A/B.

Usage: python tools/warm_ab_500k.py [n_blocks] [tag]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mining_data_integration_spark import streaming
from mining_data_integration_spark.session import get_spark
from mining_data_integration_spark.synthworld import (
    land_as_parquet,
    synth_mining_world,
)


def main() -> None:
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    tag = sys.argv[2] if len(sys.argv) > 2 else "run"
    spark = get_spark("warm-ab")
    tables = synth_mining_world(spark, n_blocks, 10, n_miners=200)
    tables = land_as_parquet(tables, "/tmp/bench_e1_bronze", spark)

    gold_w = "/tmp/warm_ab_gold"
    shutil.rmtree(gold_w, ignore_errors=True)
    streaming.refresh_once(tables, gold_w, reuse_gold=True)  # cold bootstrap

    runs = []
    for i in range(4):  # run 0 = discarded warm-up
        st: dict = {}
        t0 = time.perf_counter()
        mode = streaming.refresh_once(tables, gold_w, reuse_gold=True,
                                      reorg_depth=1000, stage_timings=st)
        wall = round(time.perf_counter() - t0, 2)
        assert mode == "warm", mode
        runs.append({"wall": wall, "stages": st})
    print(json.dumps({"tag": tag, "n_blocks": n_blocks,
                      "warmup": runs[0], "runs": runs[1:]}))


if __name__ == "__main__":
    main()
