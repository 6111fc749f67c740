"""Dump explain('formatted') for the r15-touched batch queries.

Usage: python scripts/r15_plans.py <repo_root> <out_dir> <tag>

Runs against the engine found at <repo_root> (so a pre-round git
worktree gives the 'before' plans), writes <out_dir>/<query>_<tag>.txt.
Streaming queries are skipped: their memory-sink result table has no
stable pre-execution plan to print (the streaming plan lives in the
micro-batch runs); their physical changes are covered by the batch
builds they share (fingerprints / signatures / DSIR model).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO, OUT, TAG = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, REPO)

TOUCHED = [
    # graph family (shared co-purchase gold table)
    "basket_lift_rules", "copurchase_jaccard_recs", "copurchase_triangles",
    "kcore_decomposition", "label_propagation_parts", "pagerank_step_parts",
    # bpe trio (shared encoded corpus)
    "bpe_encode_docs", "bpe_fertility_by_source", "tokenizer_drift_snapshots",
    # simhash family (shared fingerprints/candidates)
    "simhash_near_pairs", "simhash_hamming_census", "simhash_idf_band_budget",
    # minhash family (shared signatures)
    "minhash_dup_pairs", "fuzzy_decontaminate_docs", "source_overlap_matrix",
    "minhash_estimate_quality", "incremental_lsh_dedup",
    # ANN acceptance tables
    "embedding_topk", "embedding_topk_ivf", "ann_recall_ivf",
    "ann_recall_ivf_pq", "ivf_nprobe_recall_curve",
    # DSIR model share + curation shingle share + matryoshka restructure
    "dsir_importance_weights", "curation_pipeline",
    "matryoshka_recall_curve",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from seng550_a3_etl_spark.session import get_spark
    from seng550_a3_etl_spark.suite import QUERIES

    spark = get_spark(f"r15-plans-{TAG}")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    for name in TOUCHED:
        if name not in QUERIES:
            continue
        buf = io.StringIO()
        with redirect_stdout(buf):
            QUERIES[name](spark, sf_dir).explain("formatted")
        with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"{TAG} {name} ok", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
