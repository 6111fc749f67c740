"""Data-quality suite queries (SURVEY.md §2.10 X50) — the declarative
replacement for the reference's ad-hoc row-count verification
(/root/reference/etl.py:214-218)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seng550_a3_etl_spark.catalog import load_tables
from seng550_a3_etl_spark.operators.quality import check_rules, fk_violations
from seng550_a3_etl_spark.suite.registry import query

_N_ROWS = "(SELECT COUNT(*) FROM orders)"


@query(
    "orders_quality_report",
    oracle=f"""
    SELECT 'totalprice_positive' AS check_name,
           COUNT(*) FILTER (WHERE NOT COALESCE(o_totalprice > 0, FALSE))
             AS n_violations,
           {_N_ROWS} AS n_rows
    FROM orders
    UNION ALL
    SELECT 'totalprice_below_cap',
           COUNT(*) FILTER (WHERE NOT COALESCE(o_totalprice < 400000, FALSE)),
           {_N_ROWS}
    FROM orders
    UNION ALL
    SELECT 'status_in_domain',
           COUNT(*) FILTER
             (WHERE NOT COALESCE(o_orderstatus IN ('O', 'F', 'P'), FALSE)),
           {_N_ROWS}
    FROM orders
    UNION ALL
    SELECT 'orderdate_in_range',
           COUNT(*) FILTER (WHERE NOT COALESCE(
             CAST(o_orderdate AS DATE) BETWEEN DATE '1992-01-01'
                                           AND DATE '1998-12-31', FALSE)),
           {_N_ROWS}
    FROM orders
    UNION ALL
    SELECT 'custkey_in_customer',
           COUNT(*) FILTER (WHERE NOT EXISTS
             (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
           {_N_ROWS}
    FROM orders o
    """,
)
def orders_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative DQ report over orders: four single-table rules
    (positivity, cap, domain membership, date range) evaluated in ONE
    scan via conditional aggregates, plus a referential-integrity check
    (orders→customer orphans) as a broadcast-able anti join. NULL
    predicate results count as violations.

    Scale: rule count never adds jobs (one shared scan, one wide row
    shuffled); the FK check moves only the parent's key column. The
    oracle replays each rule as a FILTER aggregate and the FK check as
    NOT EXISTS.
    """
    t = load_tables(spark, sf_dir)
    rules = {
        "totalprice_positive": F.col("o_totalprice") > 0,
        "totalprice_below_cap": F.col("o_totalprice") < 400000,
        "status_in_domain": F.col("o_orderstatus").isin("O", "F", "P"),
        "orderdate_in_range": F.col("o_orderdate")
        .cast("date")
        .between("1992-01-01", "1998-12-31"),
    }
    report = check_rules(t.orders, rules)
    n_rows = t.orders.count()
    orphans = fk_violations(
        t.orders,
        F.broadcast(t.customer.select("c_custkey")),
        on=[("o_custkey", "c_custkey")],
    )
    fk_row = orphans.agg(
        F.lit("custkey_in_customer").alias("check_name"),
        F.count(F.lit(1)).alias("n_violations"),
        F.lit(n_rows).alias("n_rows"),
    )
    return report.unionByName(fk_row)
