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


def jsonrpc_transport(url: str, user: str | None = None,
                      password: str | None = None,
                      timeout: float = 10.0) -> Callable[[str, dict], dict]:
    """RUNNABLE default transport for Bitcoin-Core-style JSON-RPC
    (stdlib only): HTTP POST of a JSON-RPC 1.0 envelope with optional
    basic auth — exactly what the reference's client sends
    (rpc.js:558-580). Returns the `result` member; raises ValueError
    on an RPC-level error object. Bind it to a node URL and pass it
    as `transport=`:

        rpc = bitcoin_core_rpc("getblockchaininfo",
                               transport=jsonrpc_transport(
                                   "http://127.0.0.1:8332", u, p))
    """
    import base64
    from urllib.request import Request, urlopen

    def transport(method: str, opts: dict) -> dict:
        body = json.dumps({
            "jsonrpc": "1.0", "id": "mining-spark",
            "method": method, "params": opts.get("params", []),
        }).encode()
        req = Request(url, data=body,
                      headers={"Content-Type": "application/json"})
        if user is not None:
            tok = base64.b64encode(
                f"{user}:{password or ''}".encode()).decode()
            req.add_header("Authorization", f"Basic {tok}")
        with urlopen(req, timeout=timeout) as resp:  # noqa: S310
            payload = json.loads(resp.read().decode())
        if payload.get("error"):
            raise ValueError(f"RPC error: {payload['error']}")
        return payload.get("result", {})

    return transport


def bitcoin_core_rpc(method: str, params: list | None = None,
                     transport: Callable[[str, dict], dict] | None = None) -> dict:
    """S16 (rpc.js:558-580): Bitcoin Core JSON-RPC connector.

    The engine only proxies `getblockchaininfo` (SURVEY: out of engine
    scope). A deployment binds the RUNNABLE stdlib transport to its
    node (`jsonrpc_transport(url, user, password)`) or injects its
    own; with neither this raises — deliberately, instead of inventing
    a fake default endpoint (this environment has no node and no
    credentials)."""
    if transport is None:
        raise NotImplementedError(
            "bitcoin_core_rpc requires a transport: bind the runnable "
            "default with jsonrpc_transport(url, user, password), or "
            "inject your own (no node credentials in this environment)")
    return transport(method, {"params": params or []})
