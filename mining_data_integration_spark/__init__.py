"""PySpark-native analytics engine with the query and data-processing
capabilities of Daemon-Technologies/Mining-Data-Integration, rebuilt
Spark-first (DataFrame/SQL/Catalyst/Structured Streaming).

Layout (SURVEY.md §7.1):
  session.py    - SparkSession factory tuned for local[N] and cluster scale
  schemas.py    - explicit StructType schemas (mining domain, FIXTURES.md)
  io.py         - bronze readers / gold writers
  chain.py      - canonical-chain walks: segmented list-ranking +
                  pointer doubling (SURVEY F2/J9, rpc.js:152-183/277-309)
  core.py       - E1 ETL DAG: joins J1-J8, aggregates A1-A8
  monitor.py    - E2 dashboard shapers: W1-W5, A9-A11, F14-F15
  serving.py    - O5-O8 slicing semantics, X12 rate-of-return, A10 views
  streaming.py  - ST1-ST6 micro-batch refresh + event-time operators
  addresses.py  - crypto codecs as pandas UDFs (X1-X5)
  plans.py      - physical-plan introspection (pushdown/pruning tests)
  pipelines.py  - end-to-end corpus-cleaning composition (§7.4)
  fixtures.py   - deterministic mining-domain test fixture
  sources/      - SQLite / REST / gold-KV connectors (S13-S21)
  operators/    - extension operators: dedup, similarity, text,
                  sessionize, multimodal, skew utilities
  queries/      - DuckDB-oracle-checked operator inventory (driver tables)
"""

__version__ = "0.1.0"
