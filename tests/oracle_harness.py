"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a suite query in Spark and its oracle SQL in DuckDB over the same
parquet fixtures, then compares row count + column names + an
order-insensitive canonical value set — so parity failures surface in
`pytest` before the driver's CORRECTNESS gate sees them.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from seng550_a3_etl_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for name in TABLES:
            con.sql(
                f"CREATE VIEW {name} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def _canon_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return "<NULL>" if math.isnan(f) else repr(f)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return "<NULL>" if pd.isna(v) else v.isoformat()
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, float) and math.isnan(v):
        return "<NULL>"
    try:
        if pd.isna(v):
            return "<NULL>"
    except (TypeError, ValueError):
        pass
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    out.sort()
    return out


def assert_parity(spark_df, oracle_sql: str, sf_dir: str, name: str = "?") -> None:
    got = spark_df.toPandas()
    want = run_oracle(oracle_sql, sf_dir)
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch spark={sorted(got.columns)} "
        f"oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), (
        f"{name}: row count spark={len(got)} oracle={len(want)}"
    )
    g, w = canonical_rows(got), canonical_rows(want)
    if g != w:
        diffs = [(a, b) for a, b in zip(g, w) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
