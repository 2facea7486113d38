"""Explicit StructType schemas for the mining-domain tables (FIXTURES.md §1).

The reference reads SQLite with ``SELECT *`` and coerces column types ad
hoc in JS (``parseInt`` on TEXT satoshi amounts at rpc.js:250, 267, 475).
Here every table has one declared schema and every cast happens once at
ingest (`cast_amounts`), so downstream operators and the DuckDB oracle
see identical, explicit types.

Hash columns stay STRING (64-char lowercase hex) to preserve equality
semantics with the ZERO64 genesis sentinel (rpc.js:94, 282, 510).
Satoshi amounts become DECIMAL(20,0): exact, order-independent sums at
any scale (a 100-TB shuffle must not perturb money totals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ZERO64 = "0" * 64

_HASH = T.StringType()
_SATOSHI_TEXT = T.StringType()  # as stored by the reference's SQLite
SATOSHI_DECIMAL = "decimal(20,0)"

SNAPSHOTS = T.StructType([
    T.StructField("block_height", T.LongType()),          # rpc.js:163, 248
    T.StructField("burn_header_hash", _HASH),              # rpc.js:162-164
    T.StructField("parent_burn_header_hash", _HASH),       # rpc.js:162
    T.StructField("consensus_hash", _HASH),                # rpc.js:165
    T.StructField("pox_valid", T.IntegerType()),           # rpc.js:159
    T.StructField("total_burn", _SATOSHI_TEXT),            # rpc.js:250-252
    T.StructField("winning_block_txid", _HASH),            # rpc.js:269, 510
    T.StructField("stacks_block_height", T.LongType()),    # rpc.js:249, 291
])

BLOCK_COMMITS = T.StructType([
    T.StructField("burn_header_hash", _HASH),              # rpc.js:201
    T.StructField("txid", _HASH),                          # rpc.js:269
    T.StructField("burn_fee", _SATOSHI_TEXT),              # rpc.js:267, 475
    T.StructField("key_block_ptr", T.LongType()),          # rpc.js:144
    T.StructField("key_vtxindex", T.IntegerType()),        # rpc.js:144
    T.StructField("apparent_sender", T.StringType()),      # display only
])

LEADER_KEYS = T.StructType([
    T.StructField("burn_header_hash", _HASH),              # rpc.js:190-191
    T.StructField("block_height", T.LongType()),           # rpc.js:130 (ptr target)
    T.StructField("vtxindex", T.IntegerType()),            # rpc.js:130
    T.StructField("address", T.StringType()),              # rpc.js:145 (c32)
])

BLOCK_HEADERS = T.StructType([
    T.StructField("burn_header_hash", _HASH),              # rpc.js:236
    T.StructField("block_hash", _HASH),                    # rpc.js:238, 315
    T.StructField("parent_block", _HASH),                  # rpc.js:282-307
    T.StructField("consensus_hash", _HASH),                # rpc.js:414
    T.StructField("block_height", T.LongType()),           # rpc.js:108-121, 285
])

PAYMENTS = T.StructType([
    T.StructField("consensus_hash", _HASH),                # rpc.js:214-215
    T.StructField("stacks_block_height", T.LongType()),    # rpc.js:407-408
    T.StructField("address", T.StringType()),
])

STAGING_BLOCKS = T.StructType([
    T.StructField("consensus_hash", _HASH),                # rpc.js:226-227
    T.StructField("processed", T.IntegerType()),           # rpc.js:549, 604
    T.StructField("orphaned", T.IntegerType()),            # rpc.js:549, 604
    T.StructField("height", T.LongType()),                 # rpc.js:604
])

TRANSACTIONS = T.StructType([
    T.StructField("index_block_hash", _HASH),              # rpc.js:328-335
    T.StructField("txid", _HASH),                          # rpc.js:415
])

BURNCHAIN_OPS = T.StructType([
    T.StructField("block_hash", _HASH),                    # rpc.js:348
    T.StructField("op", T.StringType()),                   # JSON, rpc.js:351-366
])

# parsed shape of the `op` JSON column (rpc.js:351-366)
OP_JSON_SCHEMA = T.StructType([
    T.StructField("LeaderBlockCommit", T.StructType([
        T.StructField("burn_header_hash", T.ArrayType(T.IntegerType())),
        T.StructField("apparent_sender", T.StructType([
            T.StructField("public_keys", T.ArrayType(T.StructType([
                T.StructField("key", T.StringType()),
                T.StructField("compressed", T.BooleanType()),
            ]))),
        ])),
    ])),
    T.StructField("LeaderKeyRegister", T.StructType([
        T.StructField("address", T.StructType([
            T.StructField("version", T.IntegerType()),
            T.StructField("bytes", T.StringType()),
        ])),
        T.StructField("block_height", T.LongType()),
        T.StructField("vtxindex", T.IntegerType()),
    ])),
])

PRICES = T.StructType([
    T.StructField("symbol", T.StringType()),   # BTCUSDT / STXUSDT
    T.StructField("price", T.DoubleType()),    # server.js:379-414
])

MINING_SCHEMAS = {
    "snapshots": SNAPSHOTS,
    "block_commits": BLOCK_COMMITS,
    "leader_keys": LEADER_KEYS,
    "block_headers": BLOCK_HEADERS,
    "payments": PAYMENTS,
    "staging_blocks": STAGING_BLOCKS,
    "transactions": TRANSACTIONS,
    "burnchain_ops": BURNCHAIN_OPS,
    "prices": PRICES,
}

# TEXT satoshi columns -> DECIMAL(20,0), cast once at ingest
_AMOUNT_CASTS = {
    "snapshots": ("total_burn",),
    "block_commits": ("burn_fee",),
}


def cast_amounts(name: str, df: DataFrame) -> DataFrame:
    """Ingest-time cast of TEXT satoshi columns to exact decimals —
    the one place the reference's parseInt coercion happens."""
    for col in _AMOUNT_CASTS.get(name, ()):
        df = df.withColumn(col, F.col(col).cast(SATOSHI_DECIMAL))
    return df
