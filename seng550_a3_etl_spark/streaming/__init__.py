"""Structured Streaming extensions (SURVEY.md §2.8).

The reference is strictly batch; freshness comes from rerunning the ETL
and an incremental fact upsert (/root/reference/etl.py:317-327). These
modules re-express that as streams: readStream → watermark →
dropDuplicates/window → sink, with the fact upsert as a foreachBatch
MERGE."""
