"""Numeric kernels (NumPy, Arrow-vectorized) + pandas UDF wrappers."""
