"""Sources & sinks (SURVEY.md §2.1): testdata readers, stage
checkpoint catalog (Iceberg-shaped, parquet-backed in the sandbox)."""
