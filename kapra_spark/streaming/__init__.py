"""Structured Streaming variants of the rollup cascade."""
