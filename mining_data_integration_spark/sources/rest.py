"""External-feed ingestion (SURVEY S13-S17 + S16 JSON-RPC).

The reference polls three public HTTP feeds and a Bitcoin Core RPC and
drops the scalars into Redis (server.js:355-435, rpc.js:558-580). Here
each feed lands as a one-row *parameter DataFrame* — the broadcast-side
of J10's price/height enrichment.

Transport is injectable (`fetch=`): tests and offline runs pass a fake;
production passes `http_fetch`. The engine itself never blocks a query
on the network — feeds are ingested by a side job on the 600 s cadence
(ST2) and read as tables.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

Fetch = Callable[[str], dict]

BTC_LATEST_URL = "https://blockchain.info/latestblock"
BTC_STATS_URL = "https://blockchain.info/stats"
BINANCE_TICKER_URL = "https://api.binance.com/api/v3/ticker/price?symbol={}"


def http_fetch(url: str, timeout: float = 10.0) -> dict:
    """Stdlib transport (no extra deps). Split out so every feed
    function is testable without a network."""
    from urllib.request import urlopen

    with urlopen(url, timeout=timeout) as resp:  # noqa: S310 (fixed URLs)
        return json.loads(resp.read().decode())


def btc_latest_block(spark: SparkSession, fetch: Fetch = http_fetch) -> DataFrame:
    """S13 (server.js:355-377): current Bitcoin chain height."""
    height = int(fetch(BTC_LATEST_URL)["height"])
    return spark.createDataFrame([(height,)], "btc_height long")


def prices(spark: SparkSession, fetch: Fetch = http_fetch,
           symbols: tuple[str, ...] = ("BTCUSDT", "STXUSDT")) -> DataFrame:
    """S14 (server.js:379-414): spot prices as the `prices` parameter
    table (schemas.PRICES)."""
    rows = [(s, float(fetch(BINANCE_TICKER_URL.format(s))["price"]))
            for s in symbols]
    return spark.createDataFrame(rows, "symbol string, price double")


def network_hash_rate(spark: SparkSession, fetch: Fetch = http_fetch) -> DataFrame:
    """S15 (server.js:416-435): BTC network hash rate, scaled /1e9 to
    EH/s as the reference serves it (server.js:424)."""
    rate = float(fetch(BTC_STATS_URL)["hash_rate"]) / 1e9
    return spark.createDataFrame([(rate,)], "hash_power double")


def peer_stage_height(spark: SparkSession, peer_url: str,
                      fetch: Fetch = http_fetch) -> DataFrame:
    """S17 (server.js:210-244): a peer's staging height for the ST6
    freshness gate (serving.is_staged_synced compares it to local)."""
    height = int(fetch(f"{peer_url}/getLatestStage")["height"])
    return spark.createDataFrame([(height,)], "remote_height long")


def bitcoin_core_rpc(method: str, params: list | None = None,
                     transport: Callable[[str, dict], dict] | None = None) -> dict:
    """S16 (rpc.js:558-580): Bitcoin Core JSON-RPC connector stub.

    The engine only proxies `getblockchaininfo` (SURVEY: out of engine
    scope); a real deployment injects a transport bound to the node's
    auth. Without one this raises — deliberately, instead of a fake
    default endpoint."""
    if transport is None:
        raise NotImplementedError(
            "bitcoin_core_rpc requires an injected transport "
            "(no node credentials in this environment)")
    return transport(method, {"params": params or []})
