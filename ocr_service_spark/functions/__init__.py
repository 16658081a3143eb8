"""Scalar/array column-function library (SURVEY.md §2.8) — pure
pyspark.sql.functions compositions, no UDFs."""
