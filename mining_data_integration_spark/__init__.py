"""PySpark-native analytics engine with the query and data-processing
capabilities of Daemon-Technologies/Mining-Data-Integration, rebuilt
Spark-first (DataFrame/SQL/Catalyst/Structured Streaming).

Layout (SURVEY.md §7.1):
  session.py    - SparkSession factory tuned for local[N] and cluster scale
  schemas.py    - explicit StructType schemas (mining domain + driver tables)
  io.py         - bronze readers / gold writers
  chain.py      - canonical-chain walk (SURVEY F2/J9, rpc.js:152-183/277-309)
  core.py       - E1 ETL DAG: joins J1-J8, aggregates A1-A8
  monitor.py    - E2 dashboard shapers: W1-W5, A9-A11, F14-F15
  serving.py    - O5-O8 slicing semantics, X12 rate-of-return
  streaming.py  - ST1-ST6 micro-batch refresh orchestration
  functions/    - scalar fns: address codecs (X1-X5), text analysis
  operators/    - extension operators: dedup, similarity, sessionize, multimodal
  queries/      - oracle-checkable operator inventory on the driver tables
"""

__version__ = "0.1.0"
