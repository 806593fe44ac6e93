"""experts_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of UMNLibraries/experts-etl (reference studied read-only at
/root/reference; see SURVEY.md for the operator inventory).  Three layers:

- ``operators/`` — pure DataFrame→DataFrame operator functions (windows,
  snapshot diffs, CDC compaction, merges, joins, error quarantine).
- ``functions/`` — scalar column expressions (multi-format date parse,
  URI tails, locale picks, partial-precision dates, stable ids).
- ``plans/`` / ``streaming/`` / ``sources/`` — pipeline compositions,
  incremental/streaming variants, and IO (parquet, XML sink, watermarks).
- ``llm/`` — large-scale training-data-pipeline operators (dedup,
  similarity search, text analysis, multimodal column plumbing).

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection, and AQE; Python UDFs appear only where the
semantics genuinely require them (XML templating, stubbed media decode).
"""

__version__ = "0.1.0"
