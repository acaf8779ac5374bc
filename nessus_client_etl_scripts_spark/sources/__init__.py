"""Sources & sinks (SURVEY.md §2.1 S1-S6): REST JSON source, nested
JSON lake reader/writer, warehouse parquet tables."""
