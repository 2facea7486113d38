"""Text-corpus ingest/egress connectors: JSONL (+gzip) and CSV.

The reference's only bulk format is SQLite (rpc.js:60-75); a
training-data pipeline's interchange formats are JSONL ("one JSON
object per line" — the lingua franca of LLM corpora: The Pile,
RedPajama, DCLM all ship it) and CSV. Both map onto Spark's native
text sources, so ingest is distributed, schema-checked, and
predicate-pushdown-friendly from line one.

Design rules for 100 TB ingest:

* **Explicit schema, never inference.** Schema inference reads the
  whole dataset once before the real scan (2x I/O at any size) and
  can silently type-drift between drops. Readers here REQUIRE a
  schema; `documents_schema()` ships the canonical one.
* **Corrupt-record quarantine, not job failure.** A 100 TB crawl
  always contains malformed lines; PERMISSIVE mode routes them to a
  `_corrupt_record` column that `read_jsonl` surfaces (count it,
  sink it, never crash the run).
* **Splittable compression.** Plain .jsonl and .csv split by line;
  .jsonl.gz does NOT (one task per file) — the writer therefore
  shards output so each gzip member stays a reasonable task size;
  readers accept a directory of shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def documents_schema() -> T.StructType:
    """The canonical documents-table schema (TESTDATA.md)."""
    return T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType,
               keep_corrupt: bool = True) -> DataFrame:
    """Read a JSONL file/directory with an explicit schema. Malformed
    lines land in `_corrupt_record` instead of failing the job; pass
    keep_corrupt=False to drop them.

    Implemented as text-scan + `from_json` rather than the native JSON
    source: the native reader forbids filtering on ONLY its corrupt
    column without caching the scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN
    — a non-starter at corpus scale), while `from_json` is an ordinary
    codegen'd expression, so the quarantine filter pushes like any
    other predicate. Text scan also handles .gz members transparently."""
    full = T.StructType(
        list(schema.fields)
        + [T.StructField("_corrupt_record", T.StringType())])
    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_json(
            F.col("value"), full,
            {"mode": "PERMISSIVE",
             "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("_r")
    ).select("_r.*")
    if not keep_corrupt:
        parsed = parsed.filter(F.col("_corrupt_record").isNull()) \
                       .drop("_corrupt_record")
    return parsed


def write_jsonl(df: DataFrame, path: str, shards: int | None = None,
                compress: bool = False) -> None:
    """Write JSONL shards. `shards` bounds the file count (and, for
    gzip, the per-task decompression unit on read-back — gzip members
    are unsplittable, so shard size IS the read parallelism)."""
    if shards:
        df = df.repartition(shards)
    w = df.write.mode("overwrite")
    if compress:
        w = w.option("compression", "gzip")
    w.json(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType,
             header: bool = True, delimiter: str = ",") -> DataFrame:
    """CSV reader with explicit schema + corrupt-line quarantine
    (multiLine stays OFF: multiline CSV is unsplittable)."""
    full = T.StructType(
        list(schema.fields)
        + [T.StructField("_corrupt_record", T.StringType())])
    return (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, header: bool = True,
              shards: int | None = None) -> None:
    if shards:
        df = df.repartition(shards)
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)
