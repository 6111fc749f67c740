"""Sources & sinks (SURVEY.md §2.1 S1-S7): GeoJSON normalization, REST
ingestion, JDBC, and the Parquet catalog (catalog.py)."""
