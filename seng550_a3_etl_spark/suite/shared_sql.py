"""Oracle SQL shared across suite modules.

Some streaming queries are execution twins of a batch query (same
contract, streaming runtime) and must be checked against the SAME
oracle. Both registrations import the SQL from here — a single source of
truth — instead of one module resolving the other's registry entry
(registration order makes that fragile) or carrying a verbatim copy
(which silently drifts; ADVICE r4).
"""

from __future__ import annotations

from seng550_a3_etl_spark.functions.hashing import duck_hash64

# Canonical timestamp-to-string formats (Spark / DuckDB spellings of the
# same rendering) — timestamps are emitted as strings so the driver's
# column hash compares identical text on both engines.
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"

# ~20% hash split standing in for "today's crawl" in the incremental
# dedup twins (X64 batch / X74 streaming).
DELTA_SPLIT = f"{duck_hash64('CAST(doc_id AS VARCHAR)', seed=23)} % 5 = 0"

INCR_DEDUP_ORACLE = f"""
    WITH idx AS (
      SELECT md5(text) AS h, MIN(doc_id) AS canonical_id
      FROM documents WHERE NOT ({DELTA_SPLIT})
      GROUP BY 1
    ),
    batch AS (SELECT doc_id, md5(text) AS h FROM documents
              WHERE {DELTA_SPLIT})
    SELECT b.doc_id,
           COALESCE(i.canonical_id, b.doc_id) AS canonical_id,
           i.canonical_id IS NOT NULL AS known_content
    FROM batch b LEFT JOIN idx i ON i.h = b.h
    """

# CDC op-log collapse (X84 batch / X96 streaming twin): last op per key
# wins, terminal delete removes the key. 'error' events stand in for
# delete ops on the fixture.
CDC_APPLY_ORACLE = f"""
    WITH oplog AS (
      SELECT user_id,
             CAST(ts AS TIMESTAMP) AS ts,
             event_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             value
      FROM events
    ),
    latest AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) AS rn
        FROM oplog
      ) WHERE rn = 1
    )
    SELECT user_id,
           strftime(ts, '{TS_FMT_DUCK}') AS last_ts,
           ROUND(value, 4) AS value
    FROM latest WHERE op != 'D'
    """
