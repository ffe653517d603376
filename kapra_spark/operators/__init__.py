"""Relational + clustering operators (DataFrame-first)."""
