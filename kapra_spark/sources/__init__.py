"""Readers/writers: parquet/Iceberg-shaped storage + CSV compatibility."""
