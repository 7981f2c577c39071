"""Operator library: relational helpers + LLM-pipeline operators.

Everything here returns lazy DataFrames built from pyspark.sql
built-ins (JVM-side, whole-stage-codegen'd) — Python/pandas UDFs only
where built-ins cannot express the semantics (documented per use).
"""
