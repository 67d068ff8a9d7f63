"""Sources & sinks: format-agnostic readers and the Lance/Parquet sink."""
