"""Per-query driver-floor decomposition (VERDICT r15 #3).

For every batch suite query, splits the per-query wall into:

- build_s: the Python call ``QUERIES[name](spark, sf_dir)`` — Column
  tree construction, py4j round-trips, and any eager work the builder
  does (counts, localCheckpoints, session-cache builds);
- plan_s:  forcing analysis + optimization + physical planning via
  ``df._jdf.queryExecution().executedPlan()``;
- exec_s:  the noop-sink execution of the planned query (codegen + run;
  Spark re-plans for the write, so this still contains a planning term
  — the split is an attribution aid, not an exact partition).

Streaming queries are skipped (they execute eagerly on build, so the
split is meaningless). Prints a sorted table to stderr and writes the
full dict to /tmp/driver_floor.json (or argv[2]).

Run: python scripts/profile_driver_floor.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/driver_floor.json"

    from seng550_a3_etl_spark.session import get_spark
    from seng550_a3_etl_spark.suite import QUERIES

    spark = get_spark("driver-floor-profile")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm like bench.py does, so first-query JIT doesn't pollute rows.
    QUERIES["nation_order_counts"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    rows: dict[str, dict] = {}
    for name in sorted(QUERIES):
        if name.startswith("stream_"):
            continue
        try:
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
        except Exception as exc:  # noqa: BLE001
            rows[name] = {"error": str(exc)[:120]}
            print(f"{name}: FAILED {exc}", file=sys.stderr)
            continue
        rows[name] = {
            "build_s": round(t1 - t0, 3),
            "plan_s": round(t2 - t1, 3),
            "exec_s": round(t3 - t2, 3),
        }

    ok = {n: r for n, r in rows.items() if "error" not in r}
    tot_build = sum(r["build_s"] for r in ok.values())
    tot_plan = sum(r["plan_s"] for r in ok.values())
    tot_exec = sum(r["exec_s"] for r in ok.values())
    print(
        f"\nTOTALS over {len(ok)} queries: build {tot_build:.1f}s  "
        f"plan {tot_plan:.1f}s  exec {tot_exec:.1f}s",
        file=sys.stderr,
    )
    print(f"{'query':38s} {'build':>7s} {'plan':>7s} {'exec':>7s}",
          file=sys.stderr)
    for n in sorted(ok, key=lambda n: -(ok[n]["build_s"] + ok[n]["plan_s"]))[
        :40
    ]:
        r = ok[n]
        print(
            f"{n:38s} {r['build_s']:7.3f} {r['plan_s']:7.3f} "
            f"{r['exec_s']:7.3f}",
            file=sys.stderr,
        )
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1, sort_keys=True)
    print(f"full table -> {out_path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
