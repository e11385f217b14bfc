"""IO: snapshot-commit parquet writer with lineage + resume."""
