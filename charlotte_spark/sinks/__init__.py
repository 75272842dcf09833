"""Sinks: JDBC append/overwrite with retry, parquet/CSV/JSON writers."""
