"""Column-expression function library (SURVEY.md §2.7).

Everything here returns Spark Column expressions built from
``pyspark.sql.functions`` built-ins — JVM-side, whole-stage-codegen
eligible, no Python UDFs in any hot path.
"""
