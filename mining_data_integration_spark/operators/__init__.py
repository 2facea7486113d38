"""Extension operators for large-scale training-data pipelines
(BASELINE.json north star): deduplication, similarity search,
sessionization, multimodal column plumbing.

These are library functions over arbitrary DataFrames; the
queries/ package wraps them over the driver tables for the
DuckDB-oracle correctness gate.
"""
