"""Sources and sinks: parquet/Iceberg-style staged tables, testdata loaders."""
