"""Source/sink connectors (SURVEY §2.1 S13-S21).

The reference's world: SQLite files (better-sqlite3, rpc.js:39-57),
REST feeds (server.js:355-435), Bitcoin Core JSON-RPC (rpc.js:558-580),
Redis materialized views (server.js:47-125, 295-299), a one-byte flag
file (rpc.js:583-590). Re-expressed here as:

  sqlite.py - executor-parallel SQLite table extraction (bronze ingest)
  rest.py   - external-feed ingestion with injectable transport
  kv.py     - gold snapshot store (the Redis-equivalent serving layer)
"""
