"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference `axlnet/nessus-client-etl-scripts`
(single-node Nessus ETL + MySQL stored-procedure query layer), rebuilt
Spark-first: DataFrame/SQL logical plans, Catalyst/Tungsten physical
execution, Structured Streaming for incremental modes, and Pandas UDFs
only where built-ins genuinely can't express the semantics.

Layout
------
- ``session``    — tuned SparkSession factory (AQE, Arrow, UTC).
- ``catalog``    — test-table loading / temp-view registration.
- ``functions``  — scalar function layer (SURVEY.md §2.7 F1-F12).
- ``operators``  — relational + pipeline operators (joins, aggregates,
  windows, predicates, dedup, similarity, text, multimodal).
- ``sources``    — REST JSON source, nested-JSON lake reader/writer,
  warehouse (parquet table) source/sink (SURVEY.md §2.1 S1-S6).
- ``pipeline``   — bronze→silver normalization of nested scan-run
  documents (SURVEY.md §3.1-3.2).
- ``plans``      — the public query API mirroring the reference's four
  stored procedures (SURVEY.md §3.3).
- ``streaming``  — incremental watermark/lookback batch + Structured
  Streaming variants (SURVEY.md §2.9).
"""

__version__ = "0.1.0"
