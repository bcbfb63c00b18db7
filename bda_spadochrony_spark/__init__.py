"""bda_spadochrony_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing capability surface of the reference
project ``m-majchrzak/BDA_Spadochrony`` (a lambda-architecture pipeline over
weather / traffic / stock feeds; see SURVEY.md) as a library of named, tested,
idiomatic Spark DataFrame / Structured Streaming / pyspark.ml operators —
plus the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) such an engine needs at 100 TB.

Design rules (SURVEY.md §1.4, §4):
- DataFrame-native everywhere; zero row-at-a-time Python UDFs in hot paths
  (the reference itself uses none — SURVEY.md §2.9).
- Single multi-file scans instead of the reference's per-file glob/union
  (reference ``pyspark/batch_stock.py:18-36``).
- Catalyst does the optimizing: declared schemas, pushed filters, pruned
  columns, AQE on, broadcast hints only where cardinality is known-small.
- Executor-side sinks (``foreachPartition``) — never driver ``collect()``
  loops (reference ``pyspark/batch_stock.py:94-132``).
"""

__version__ = "0.1.0"
