"""Sources & sinks: manifest-committed parquet tables + legacy format parsers."""
