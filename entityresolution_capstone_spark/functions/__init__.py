"""Scalar / kernel functions (Column expressions, pandas-UDF kernels, SQL parity text)."""
