"""SQL-API surface parity: the engine is DataFrame-first, but every
driver table registers as a temp view (io.register_views) and plain
`spark.sql` must agree with the DataFrame pipelines — same Catalyst
plans, two front ends."""

from __future__ import annotations

import pytest

from mining_data_integration_spark.io import register_views

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    register_views(spark, SF)


def rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


class TestSqlSurface:
    def test_sql_equals_dataframe_aggregate(self, spark):
        import __spark_entry__ as e
        df_api = e.queries()["a1_pricing_summary"](spark, SF)
        sql = spark.sql("""
            SELECT l_returnflag, l_linestatus,
                   count(*) AS n_items,
                   CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2)
                        AS DOUBLE) AS sum_qty,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
                        AS DOUBLE) AS sum_base_price,
                   CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
                   sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)
                       AS n_discounted
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """)
        assert rows(sql) == rows(df_api)

    def test_sql_window_equals_dataframe(self, spark):
        import __spark_entry__ as e
        df_api = e.queries()["w9_topk_per_group"](spark, SF)
        sql = spark.sql("""
            WITH ranked AS (
                SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
                       row_number() OVER (PARTITION BY l_suppkey
                           ORDER BY l_extendedprice DESC, l_orderkey,
                                    l_linenumber) AS rn
                FROM lineitem
            )
            SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_extendedprice
            FROM ranked WHERE rn <= 3
            ORDER BY l_suppkey, rn
        """)
        assert rows(sql) == rows(df_api)

    def test_sql_over_mining_fixture(self, spark):
        from mining_data_integration_spark import fixtures
        tabs = fixtures.mining_tables(spark)
        tabs["block_commits"].createOrReplaceTempView("mv_commits")
        out = spark.sql("""
            SELECT count(*) AS n, sum(burn_fee) AS burned
            FROM mv_commits
        """).collect()[0]
        assert out.n == 14 and int(out.burned) == 27500


class TestOracleTypedSurface:
    """Every oracle output column must reach a typed (Arrow) driver as a
    narrow type — ints/floats/bool/varchar/date/timestamp — never
    decimal128. DuckDB widens sum() and window sums over BIGINT to
    HUGEINT, and integer `//` / `%` keep the width; via Arrow that
    surfaces as decimal128, which canonicalizes differently from
    Spark's BIGINT even when the values are equal (the dp5 r2/r3
    local-green/driver-red class). `fetchall()` hides this by returning
    plain Python ints, so the gate must read the Arrow schema."""

    def test_no_widened_duckdb_types(self):
        import duckdb
        import pyarrow as pa
        import __spark_entry__ as e

        con = duckdb.connect()
        for name in ("region", "nation", "customer", "supplier", "part",
                     "orders", "lineitem", "events", "documents",
                     "embeddings"):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM "
                f"read_parquet('{SF}/{name}.parquet')"
            )
        offenders = {}
        for qname, sql in e.oracle_sql().items():
            # LIMIT 0 wrap: schema-only, runs in milliseconds per oracle
            tbl = con.execute(
                f"SELECT * FROM (\n{sql}\n) _typed_surface LIMIT 0"
            ).arrow()
            bad = {c: str(t)
                   for c, t in zip(tbl.column_names, tbl.schema.types)
                   if pa.types.is_decimal(t)}
            if bad:
                offenders[qname] = bad
        assert not offenders, (
            f"oracles emit widened DuckDB types (add CAST(... AS "
            f"BIGINT/DOUBLE)): {offenders}")
