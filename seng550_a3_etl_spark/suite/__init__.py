"""Oracle-checked query suite.

Every operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) is exercised by a named query: a PySpark DataFrame program in
``QUERIES`` paired — where ANSI-SQL-expressible — with a DuckDB oracle in
``ORACLES``. The driver compares row count + schema + order-insensitive
value hash at sf=0.01.

Importing this package populates the registries.
"""

from seng550_a3_etl_spark.suite.registry import ORACLES, QUERIES  # noqa: F401

# Import for registration side effects.
from seng550_a3_etl_spark.suite import (  # noqa: E402,F401
    analytics,
    multimodal,
    quality,
    relational,
    sampling,
    sketch,
    spatial,
    streaming_suite,
    text,
    vectors,
    windows,
)
