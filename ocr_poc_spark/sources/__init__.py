"""Sources/sinks: pages table reader (Iceberg-gated, parquet fallback)."""
