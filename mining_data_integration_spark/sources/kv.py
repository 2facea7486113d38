"""Gold snapshot store — the Redis-equivalent serving layer
(SURVEY S19/S20, server.js:47-125, 295-299) plus the status flag file
(S18, rpc.js:583-590).

The reference materializes every result as a JSON string under a fixed
Redis key and serves reads straight from the cache. The Spark-native
equivalent keeps each key as a parquet snapshot directory with an
atomic pointer swap:

    <root>/<key>/v=<n>/...parquet      (immutable snapshot versions)
    <root>/<key>/CURRENT               (tiny pointer file -> v=<n>)

Readers resolve CURRENT then read one immutable directory, so a reader
never observes a half-written refresh (the reference gets this for free
from Redis SET atomicity; plain overwrite-in-place would not). Old
versions are pruned, keeping one behind for in-flight readers.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class GoldStore:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _key_dir(self, key: str) -> str:
        return os.path.join(self.root, key)

    def set(self, key: str, df: DataFrame) -> str:
        """Write a new snapshot version and swap the pointer (the
        `client.set(key, JSON)` of server.js:295-299)."""
        kdir = self._key_dir(key)
        os.makedirs(kdir, exist_ok=True)
        cur = self._current_version(kdir)
        nxt = cur + 1
        path = os.path.join(kdir, f"v={nxt}")
        df.write.mode("overwrite").parquet(path)
        tmp = os.path.join(kdir, "CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(str(nxt))
        os.replace(tmp, os.path.join(kdir, "CURRENT"))  # atomic swap
        self._prune(kdir, keep_from=nxt - 1)
        return path

    def get(self, spark: SparkSession, key: str) -> DataFrame:
        kdir = self._key_dir(key)
        cur = self._current_version(kdir)
        if cur == 0:
            raise KeyError(f"no snapshot for key {key}")
        return spark.read.parquet(os.path.join(kdir, f"v={cur}"))

    def _current_version(self, kdir: str) -> int:
        try:
            with open(os.path.join(kdir, "CURRENT")) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _prune(self, kdir: str, keep_from: int) -> None:
        for name in os.listdir(kdir):
            if name.startswith("v=") and int(name[2:]) < keep_from:
                shutil.rmtree(os.path.join(kdir, name), ignore_errors=True)


def read_mining_flag(path: str) -> bool:
    """S18 (rpc.js:583-590): one-byte on/off flag file."""
    try:
        with open(path) as f:
            return f.read(1) == "1"
    except FileNotFoundError:
        return False


def write_mining_flag(path: str, on: bool) -> None:
    with open(path, "w") as f:
        f.write("1" if on else "0")
