"""Local replica of the driver's DuckDB-oracle correctness check.

Runs every (queries()[name], oracle_sql()[name]) pair at a given sf dir and
compares row count, sorted column names, and an order-insensitive value
hash. Values are canonicalized conservatively (floats via repr, nested
lists recursively) so a pass here strongly implies a pass under any
reasonable driver hash.

Usage: python tools/check_oracle.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FILTERS = sys.argv[2:]

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def canon(v):
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return repr(int(v))  # 3.0 and 3 hash alike
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    if v is None:
        return "NULL"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    import __spark_entry__ as e
    from mining_data_integration_spark.session import get_spark

    import os
    # adversarial-determinism knob: ORACLE_SHUFFLE_PARTITIONS=7 reruns
    # the whole sweep under a different parallelism — any query whose
    # result depends on the physical partitioning (the dp5 bug class)
    # fails here before the driver sees it
    spark = get_spark("oracle-check",
                      shuffle_partitions=os.environ.get(
                          "ORACLE_SHUFFLE_PARTITIONS"))
    con = duckdb.connect()
    # DuckDB defaults its memory_limit to ~80% of PHYSICAL RAM — four
    # sharded sweeps each replaying a graph-build oracle at sf1 hit
    # 4 x ~100 GB and the kernel OOM-killer took the whole battery
    # down (round 13). Cap per-process and give it a disk spill dir;
    # ORACLE_DUCKDB_MEM overrides for single-process runs.
    con.execute(f"SET memory_limit='"
                f"{os.environ.get('ORACLE_DUCKDB_MEM', '20GB')}'")
    con.execute("SET temp_directory='/tmp/sg_duckdb_spill'")
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )

    queries = e.queries()
    oracles = e.oracle_sql()
    # ORACLE_EXCLUDE=name1,name2 — skip the ORACLE for these (Spark side
    # still runs, reported rows-only). For the sf0.1 sweep, where the
    # j9/j16 DuckDB recursive-CTE oracles are infeasible (30k chain
    # iterations over 150k rows); their cross-check at that scale is the
    # exact agreement of the pointer-doubling and segmented engines.
    excluded = set(filter(None, os.environ.get(
        "ORACLE_EXCLUDE", "").split(",")))
    # ORACLE_SLICE=k/m — run only every m-th query starting at k, so a
    # full sweep can be split across time-boxed runs (k in 0..m-1
    # covers the registry exactly once)
    slice_spec = os.environ.get("ORACLE_SLICE")
    sk, sm = (int(x) for x in slice_spec.split("/")) if slice_spec \
        else (0, 1)
    failures = []
    for qi, (name, fn) in enumerate(queries.items()):
        if qi % sm != sk:
            continue
        if FILTERS and not any(f in name for f in FILTERS):
            continue
        if name in excluded:
            oracles = {k: v for k, v in oracles.items() if k != name}
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"OK?   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s) — no oracle")
            continue
        try:
            # fetch via Arrow, not fetchall(): a typed driver sees DuckDB's
            # widened types (HUGEINT -> decimal128) that fetchall() hides as
            # plain Python ints — the exact local-green/driver-red class that
            # bit dp5 in rounds 2-3. Any decimal column is an immediate FAIL.
            res = con.execute(oracles[name])
            atbl = res.arrow()
            dcols = list(atbl.column_names)
            import pyarrow as pa
            widened = {c: str(t) for c, t in zip(dcols, atbl.schema.types)
                       if pa.types.is_decimal(t)}
            if widened:
                print(f"FAIL  {name}: oracle emits widened DuckDB types "
                      f"(add CASTs): {widened}")
                failures.append(name)
                continue
            drows = [tuple(d[c] for c in dcols) for d in atbl.to_pylist()]
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        ok_count = len(srows) == len(drows)
        ok_schema = sorted(scols) == sorted(dcols)
        ok_hash = table_hash(scols, srows) == table_hash(dcols, drows)
        status = "PASS" if (ok_count and ok_schema and ok_hash) else "FAIL"
        print(f"{status}  {name}: rows {len(srows)}/{len(drows)} "
              f"schema={ok_schema} hash={ok_hash} ({time.time()-t0:.1f}s)")
        if status == "FAIL":
            failures.append(name)
            if not ok_schema:
                print(f"      spark cols:  {sorted(scols)}")
                print(f"      duckdb cols: {sorted(dcols)}")
            elif not ok_hash and srows and drows:
                so = sorted(
                    ["|".join(canon(r[i]) for i in sorted(
                        range(len(scols)), key=lambda i: scols[i])) for r in srows])
                do = sorted(
                    ["|".join(canon(r[i]) for i in sorted(
                        range(len(dcols)), key=lambda i: dcols[i])) for r in drows])
                for a, b in zip(so, do):
                    if a != b:
                        print(f"      spark : {a[:200]}")
                        print(f"      duckdb: {b[:200]}")
                        break
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
