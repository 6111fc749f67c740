"""seng550_a3_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL+analytics pipeline
(``pi-sister/seng550_a3-etl``): relational operators, temporal and spatial
joins, windowed dedup / conditional upsert, plus large-scale
training-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing).

Design principles (SURVEY.md §7):

- DataFrame / Spark SQL end-to-end; Catalyst + Tungsten pick the physical
  strategy. No RDDs.
- Built-in ``pyspark.sql.functions`` (JVM-side, whole-stage-codegen) for
  everything expressible, including point-in-polygon via higher-order
  functions; Pandas UDFs only where genuinely needed (multimodal decode).
- Scale-first physical design: pre-aggregate before joining dimensions,
  broadcast small sides, grid-cell prefilter for spatial joins, salting /
  AQE for skew.
"""

__version__ = "0.1.0"

from seng550_a3_etl_spark.session import get_spark  # noqa: F401
from seng550_a3_etl_spark.catalog import TABLES, load_tables  # noqa: F401
