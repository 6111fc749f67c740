"""Parquet table catalog for the synthetic test fixtures.

Replaces the reference's PostgreSQL table access (read: pd.read_sql /
gpd.read_postgis at /root/reference/viz.py:50,78,97,116; write:
DataFrame.to_sql at /root/reference/etl.py:177) with columnar Parquet scans
— predicate pushdown, column pruning, and min/max file skipping come free
from the Parquet DataSource.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Resolved-DataFrame cache keyed (applicationId, sf_dir, table) — the
# session-scoped analog of a catalog/metastore entry (r15 optimization).
# ``spark.read.parquet`` re-lists the path and re-reads the footer on
# EVERY call (~100 ms of driver work measured on the fixture files);
# with ~280 suite queries each touching 1-4 tables that is tens of
# seconds of identical metadata re-resolution per bench run. A real
# deployment resolves tables through a catalog whose schema/file-list
# metadata is cached per session (guide §6: file-listing caches /
# manifest-based table formats exist for exactly this reason). Only the
# resolved PLAN (schema + file index) is reused — every action still
# scans the parquet; no row data is cached. The fixture dirs are
# immutable inputs; writers in this repo never write into an sf_dir.
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _evict_stopped(cache: dict) -> None:
    """Drop entries whose owning SparkSession has been stopped — a new
    session in the same process must re-resolve, not inherit dead
    plans (same contract as suite.text._evict_stopped_sessions)."""
    for key, df in list(cache.items()):
        try:
            sc = df.sparkSession.sparkContext
            stopped = sc._jsc is None or sc._jsc.sc().isStopped()
        except Exception:
            stopped = True
        if stopped:
            del cache[key]


class Tables:
    """Lazy per-table loader: parquet footers are only read for tables a
    query actually touches (spark.read.parquet is eager about schema, so
    eagerly loading all 10 tables costs ~10 driver round-trips per query),
    and each (session, dir, table) resolves ONCE per session via the
    module-level catalog cache above.
    """

    region: DataFrame
    nation: DataFrame
    customer: DataFrame
    supplier: DataFrame
    part: DataFrame
    orders: DataFrame
    lineitem: DataFrame
    events: DataFrame
    documents: DataFrame
    embeddings: DataFrame

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise AttributeError(name)
        key = (
            self._spark.sparkContext.applicationId, self._sf_dir, name
        )
        df = _DF_CACHE.get(key)
        if df is None:
            _evict_stopped(_DF_CACHE)
            df = _load_one(self._spark, self._sf_dir, name)
            _DF_CACHE[key] = df
        return df

    def __iter__(self):
        return ((name, getattr(self, name)) for name in TABLES)


def _load_one(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) (rejected by
        # the vectorized reader; nanosAsLong surfaces epoch-nanos longs)
        # and as TIMESTAMP(MICROS). Normalize both to plain TIMESTAMP:
        # DuckDB reads the same values as naive-UTC, so the oracle
        # agrees under a UTC session zone.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def set_parquet_ts_confs(spark: SparkSession) -> None:
    """Timestamp-read confs every fixture consumer needs, settable on ANY
    session at runtime — the driver runs a plain SparkSession, not our
    tuned factory, so these cannot live only in session.py defaults:

    - nanosAsLong: TIMESTAMP(NANOS) parquet (early fixture vintage) reads
      as epoch-nanos longs instead of throwing PARQUET_TYPE_ILLEGAL;
    - inferTimestampNTZ off: timezone-less parquet timestamps (current
      fixture vintage) load as plain TIMESTAMP, which watermarks and
      unix_micros require, with values matching the naive-UTC oracle.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def load_tables(spark: SparkSession, sf_dir: str) -> Tables:
    """Lazy catalog over every fixture table in ``sf_dir``."""
    set_parquet_ts_confs(spark)
    return Tables(spark, sf_dir)


def register_views(spark: SparkSession, sf_dir: str) -> Tables:
    """Load tables and register them as temp views for spark.sql use."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables:
        df.createOrReplaceTempView(name)
    return tables


def ensure_database(spark: SparkSession, name: str) -> bool:
    """Idempotent database bootstrap (SURVEY §2.1 S7 — the reference's
    create_database_if_not_exists + CREATE EXTENSION dance at
    etl.py:33-59 collapses to one catalog DDL; no extension needed).
    Returns True when the database already existed."""
    existed = spark.catalog.databaseExists(name)
    if not existed:
        # Identifier is quoted via the catalog, not interpolated raw —
        # the reference's f-string DDL (etl.py:44-50) is injection-prone.
        spark.sql(f"CREATE DATABASE IF NOT EXISTS `{name}`")
    return existed


def table_exists(spark: SparkSession, name: str) -> bool:
    """Existence probe (SURVEY §2.2 P11 — the reference's pg_database /
    information_schema SELECTs, etl.py:44-48,295-302)."""
    return spark.catalog.tableExists(name)


def save_table_if_absent(df: DataFrame, name: str, **options: str) -> bool:
    """Create-if-absent persisted table (SURVEY §2.5 W3 — the
    reference's fact table is created once and preserved across reruns,
    etl.py:290-315). Returns True when this call created the table;
    False leaves the existing table untouched, making reruns no-ops so
    the incremental refresh (plans/gold.py) owns all subsequent writes.
    """
    spark = df.sparkSession
    if table_exists(spark, name):
        return False
    writer = df.write
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.saveAsTable(name)
    return True
