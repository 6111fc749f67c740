"""Benchmark harness (driver contract).

Runs every suite query at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...}

Execution is forced with a noop sink (full compute, no driver collect).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from seng550_a3_etl_spark.session import get_spark
    from seng550_a3_etl_spark.suite import QUERIES

    spark = get_spark("seng550-a3-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen path once so per-query timings measure the
    # engine, not first-job startup.
    QUERIES["nation_order_counts"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        start = time.perf_counter()
        try:
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - start, 3)
        except Exception as exc:  # keep the bench line parseable on failure
            timings[name] = -1.0
            print(f"bench: {name} failed: {exc}", file=sys.stderr)

    total = round(sum(v for v in timings.values() if v >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "suite_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
