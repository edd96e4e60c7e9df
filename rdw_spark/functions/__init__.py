"""Scalar/scoring function library (SURVEY.md §2.9) — thin, JVM-side-first:
everything here composes pyspark.sql.functions; Python UDFs appear only for
the documented gaps (HTML unescape)."""
