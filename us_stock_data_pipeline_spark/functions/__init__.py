"""Reusable column-expression helpers and Pandas-UDF kernels."""
