"""REST API ingestion (SURVEY.md §2.1 S1).

The reference GETs a Socrata-style endpoint with a ``$limit`` param on
the driver (/root/reference/etl.py:62-83) — fine for 50k rows, not for
100 TB. Two paths:

- ``fetch_json`` — driver-side fetch (stdlib urllib; supports file:// for
  offline tests) → ``spark.createDataFrame``. Use for small dims.
- ``fetch_paginated`` — the scale path: plan (offset, limit) pages as a
  DataFrame, fan the HTTP calls out to executors with ``mapInPandas``
  (one page per row, Arrow-batched), parse JSON on the executor. The
  driver never holds the payload; parallelism = number of pages.

Both return raw JSON-string rows; downstream parsing goes through
``spark.read.json`` / ``from_json`` so schema handling matches the
bronze-ingest path (SURVEY.md §3 E1 stage 2-3).
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _get(url: str, timeout: float) -> str:
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        return resp.read().decode("utf-8")


def fetch_json(
    spark: SparkSession, url: str, timeout: float = 60.0
) -> DataFrame:
    """Driver-side GET → DataFrame of one JSON-string row per element
    (list payload) or a single row (object payload)."""
    payload = json.loads(_get(url, timeout))
    rows = payload if isinstance(payload, list) else [payload]
    return spark.createDataFrame(
        [(json.dumps(r),) for r in rows], "raw string"
    )


def plan_pages(
    spark: SparkSession, base_url: str, total: int, page_size: int
) -> DataFrame:
    """One row per (offset, limit) page — the Socrata $offset/$limit
    pagination of the reference's single $limit call."""
    pages = [
        (f"{base_url}&$offset={off}&$limit={page_size}"
         if "?" in base_url
         else f"{base_url}?$offset={off}&$limit={page_size}",)
        for off in range(0, total, page_size)
    ]
    return spark.createDataFrame(pages, "url string")


def fetch_paginated(
    pages: DataFrame, timeout: float = 60.0
) -> DataFrame:
    """Executor-side fetch of every planned page; output one JSON-string
    row per payload element. Repartition the page plan first if pages ≫
    partitions."""

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url in pdf["url"]:
                payload = json.loads(_get(url, timeout))
                rows = payload if isinstance(payload, list) else [payload]
                out.extend(json.dumps(r) for r in rows)
            yield pd.DataFrame({"raw": out})

    return pages.mapInPandas(fetch, "raw string")
