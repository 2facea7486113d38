"""Synthesize the sf1 tier for the heavy-family sweep (round-10
VERDICT #7): the driver ships sf0.001/0.01/0.1 only, but the design
brief is 100 TB — one more measured tier upgrades "designed for scale"
to "measured at scale" for the dd/sim/tx/dp families.

documents and embeddings (the tables those families read) are scaled
10x from sf0.1 DETERMINISTICALLY: replica k of a document keeps its
text's word multiset but ROTATES the word order by k*7 positions
(every shingle/n-gram changes, so replicas are genuinely distinct
documents to the dedup/text operators, not degenerate copies — while
k=0 keeps the originals so the corpus still contains sf0.1's real
near-dup structure); replica k of an embedding rotates the vector by
k lanes (norm-preserving, direction-distinct). Ids extend contiguously
(doc_id + k*N) so the registry's id-parity predicates keep their
semantics. The other eight TPC-H-ish tables are symlinked from sf0.1 —
the swept families never read them, and the symlinks keep the
directory a complete sf dir for check_oracle's view registration.

Usage: python tools/make_sf1.py [out_dir=/tmp/sg_sf1]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sg_sf1"
REPLICAS = 10


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    n_vecs = con.execute(
        f"SELECT count(*) FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT doc_id + k * {n_docs} AS doc_id,
                 CASE WHEN k = 0 OR r = 0 THEN text
                      ELSE array_to_string(
                          words[r + 1:] || words[1:r], ' ')
                 END AS text,
                 lang, source,
                 CAST(CASE WHEN k = 0 OR r = 0 THEN n_chars
                      ELSE length(array_to_string(
                          words[r + 1:] || words[1:r], ' '))
                 END AS BIGINT) AS n_chars
          FROM (
            SELECT d.*, t.k,
                   string_split(d.text, ' ') AS words,
                   CAST((t.k * 7) % greatest(
                       len(string_split(d.text, ' ')), 1) AS BIGINT) AS r
            FROM read_parquet('{SRC}/documents.parquet') d
            CROSS JOIN (SELECT unnest(range({REPLICAS})) AS k) t
          )
          ORDER BY doc_id
        ) TO '{OUT}/documents.parquet' (FORMAT parquet)
    """)
    con.execute(f"""
        COPY (
          SELECT vec_id + k * {n_vecs} AS vec_id,
                 CASE WHEN k = 0 THEN embedding
                      ELSE embedding[k + 1:] || embedding[1:k]
                 END AS embedding,
                 label
          FROM read_parquet('{SRC}/embeddings.parquet')
          CROSS JOIN (SELECT unnest(range({REPLICAS})) AS k) t
          ORDER BY vec_id
        ) TO '{OUT}/embeddings.parquet' (FORMAT parquet)
    """)
    # Round-12 (VERDICT #2): the sweep now covers ALL families at sf1,
    # so the TPC-H-ish fact tables are scaled 10x too — previously
    # symlinked, which made a "sf1" scan/join/agg/window run identical
    # to sf0.1. Scaling is TPC-H-faithful: every fact AND its
    # dimension replicate together with key offsets (replica k of an
    # order references replica k of its customer), so per-key group
    # sizes, join fan-outs, and chain depths stay CONSTANT while row
    # counts grow 10x — the shape that stresses shuffles without
    # changing per-group semantics. region/nation stay fixed (TPC-H
    # keeps them constant at every sf). k=0 keeps the original rows.
    maxes = {}
    for t, key in (("orders", "o_orderkey"), ("customer", "c_custkey"),
                   ("supplier", "s_suppkey"), ("part", "p_partkey"),
                   ("events", "event_id")):
        maxes[t] = con.execute(
            f"SELECT max({key}) + 1 FROM "
            f"read_parquet('{SRC}/{t}.parquet')").fetchone()[0]
    max_user = con.execute(
        f"SELECT max(user_id) + 1 FROM "
        f"read_parquet('{SRC}/events.parquet')").fetchone()[0]
    ks = f"(SELECT unnest(range({REPLICAS})) AS k) t"
    scaled = {
        "customer": f"""
            SELECT c_custkey + k * {maxes['customer']} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM read_parquet('{SRC}/customer.parquet') CROSS JOIN {ks}
            ORDER BY c_custkey""",
        "supplier": f"""
            SELECT s_suppkey + k * {maxes['supplier']} AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM read_parquet('{SRC}/supplier.parquet') CROSS JOIN {ks}
            ORDER BY s_suppkey""",
        "part": f"""
            SELECT p_partkey + k * {maxes['part']} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM read_parquet('{SRC}/part.parquet') CROSS JOIN {ks}
            ORDER BY p_partkey""",
        "orders": f"""
            SELECT o_orderkey + k * {maxes['orders']} AS o_orderkey,
                   o_custkey + k * {maxes['customer']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM read_parquet('{SRC}/orders.parquet') CROSS JOIN {ks}
            ORDER BY o_orderkey""",
        "lineitem": f"""
            SELECT l_orderkey + k * {maxes['orders']} AS l_orderkey,
                   l_partkey + k * {maxes['part']} AS l_partkey,
                   l_suppkey + k * {maxes['supplier']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus,
                   l_shipdate
            FROM read_parquet('{SRC}/lineitem.parquet') CROSS JOIN {ks}
            ORDER BY l_orderkey, l_linenumber""",
        "events": f"""
            SELECT event_id + k * {maxes['events']} AS event_id,
                   ts, user_id + k * {max_user} AS user_id,
                   event_type, value, props
            FROM read_parquet('{SRC}/events.parquet') CROSS JOIN {ks}
            ORDER BY event_id""",
    }
    for t, sql in scaled.items():
        dst = os.path.join(OUT, f"{t}.parquet")
        if os.path.islink(dst):
            os.unlink(dst)          # upgrade a pre-round-12 sf1 dir
        if not os.path.exists(dst):
            con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT parquet)")
    for t in ("region", "nation"):
        dst = os.path.join(OUT, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)
    for t in ("documents", "embeddings", "orders", "lineitem",
              "events"):
        n = con.execute(f"SELECT count(*) FROM "
                        f"read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"sf1 tier at {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
