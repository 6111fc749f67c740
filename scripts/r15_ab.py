"""r15 optimization A/B harness.

Usage: python scripts/r15_ab.py <tag> <out_json> [query ...]

Runs the given suite queries (default: the r15 target set) in sorted
order after the bench's warm-ups, timing each with the noop sink
(guide §1.4), and writes {"tag", "queries": {name: [runs...]}, ...}.
Also writes plans/r15/<query>_<tag>.txt with explain("formatted") for
each query. Run it once on the pre-change tree (tag=before) and once on
the post-change tree (tag=after), back-to-back in the same host window,
so the comparison cancels shared-host drift.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGETS = [
    # graph family (shared co-purchase build)
    "basket_lift_rules",
    "copurchase_jaccard_recs",
    "copurchase_triangles",
    "kcore_decomposition",
    "label_propagation_parts",
    "pagerank_step_parts",
    # vector family (unrolled dot)
    "ann_recall_ivf",
    "ann_recall_ivf_pq",
    "embedding_cosine_dedup",
    "embedding_topk",
    "embedding_topk_ivf",
    "hard_negative_topk",
    "hybrid_retrieval",
    "incremental_semantic_dedup",
    "ivf_nprobe_recall_curve",
    "knn_label_precision",
    "matryoshka_recall_curve",
    "reciprocal_nn_pairs",
    "semantic_dedup_clusters",
    "semantic_threshold_sweep",
    # metadata-cache / general sentinels (code-unchanged rows)
    "nation_order_counts",
    "region_revenue",
    "pricing_summary",
    "scalar_stats",
    "daily_event_stats",
    "date_key_join",
    "top_order_per_customer",
    # streaming (schema cache + semantic dot)
    "stream_hourly_windows",
    "stream_click_attribution",
    "stream_semantic_dedup",
    "stream_substring_guard",
]


def main() -> None:
    tag = sys.argv[1]
    out_path = sys.argv[2]
    names = sys.argv[3:] or TARGETS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from seng550_a3_etl_spark.session import get_spark
    from seng550_a3_etl_spark.suite import QUERIES

    import bench as _bench

    spark = get_spark(f"r15-ab-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["nation_order_counts"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(spark.sparkContext.defaultParallelism).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    _bench._warm_text_pipeline(spark, sf_dir)
    if any(n.startswith("stream_") for n in names):
        _bench._warm_streaming(spark, sf_dir)

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15",
    )
    os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, list[float]] = {}
    t_all0 = time.perf_counter()
    for name in sorted(n for n in names if n in QUERIES):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        results[name] = runs
        print(f"{tag} {name}: {runs}", file=sys.stderr)
        if not name.startswith("stream_"):
            buf = io.StringIO()
            with redirect_stdout(buf):
                QUERIES[name](spark, sf_dir).explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
    total = round(time.perf_counter() - t_all0, 1)
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    with open(out_path, "w") as f:
        json.dump(
            {"tag": tag, "sf_dir": sf_dir, "wall_s": total,
             "load1_end": load1, "queries": results},
            f, indent=1, sort_keys=True,
        )
    print(f"{tag}: {total}s -> {out_path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
