"""Oracle-checked query suite.

Every operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) is exercised by a named query: a PySpark DataFrame program in
``QUERIES`` paired — where ANSI-SQL-expressible — with a DuckDB oracle in
``ORACLES``. The driver compares row count + schema + order-insensitive
value hash at sf=0.01.

Importing this package populates the registries.
"""

import json
import re
from pathlib import Path

from seng550_a3_etl_spark.suite.registry import ORACLES, QUERIES  # noqa: F401

# Import for registration side effects.
from seng550_a3_etl_spark.suite import (  # noqa: E402,F401
    analytics,
    multimodal,
    quality,
    relational,
    robust,
    sampling,
    sketch,
    spatial,
    streaming_suite,
    text,
    text_lm,
    vectors,
    windows,
)

# Driver-facing registration order. The driver checks queries in
# registration order under a per-round 50-row cap, so each round the
# first 50 slots must go to the queries that most need a FRESH driver
# CORRECTNESS row. Rather than a hand-maintained priority list (which
# went stale between rounds 1 and 4), staleness is computed from the
# committed CORRECTNESS_r*.json files themselves:
#
#   1. queries with no driver row in ANY round (new this round) first,
#   2. then queries whose implementation changed after their last green
#      row (declared in _CHANGED, self-expiring — see below),
#   3. then everything else, oldest green row first.
#
# Within each tier, registration order breaks ties. The pytest oracle
# mirror (tests/test_suite_parity.py) still covers every query each
# session regardless of the driver cap.

# Queries whose implementation (or any operator under them) changed in
# a given round, mapped to that round number. An entry only boosts the
# query while its last green driver row is OLDER than the change — once
# the driver re-checks it, the entry expires on its own, so this dict
# never needs pruning, only appending when code under a query changes.
_CHANGED: dict[str, int] = {
    # round 5: shared shingle-set cache across the near-dup family
    # (includes the dup-cluster label build, which feeds four queries).
    # minhash_dup_pairs is listed once below with its LATEST change
    # round — a duplicate literal key would silently drop this one.
    "ngram_dup_pairs": 5,
    "dup_clusters": 5,
    "cluster_best_doc": 5,
    "leakage_free_split": 5,
    # round 5: bounds-verified deterministic output + oracle added
    "scalar_stats_approx": 5,
    # (round-5 sublinear-k centroid-cap entries for embedding_topk_ivf /
    # kmeans_step_clusters superseded by their later-round entries below
    # — one literal entry per key, latest change round only.)
    # round 5: stream sources target the table path directly (the
    # pathGlobFilter form ran empty on directory-shaped tables)
    "stream_hourly_windows": 5,
    "stream_click_attribution": 5,
    "stream_distinct_users": 5,
    "stream_segment_windows": 5,
    "stream_incremental_dedup": 5,
    "stream_session_windows": 5,
    # round 5 (third session): the outer-attribution emission cutoff
    # is now based on least(max click ts, max purchase ts) — the
    # min-watermark basis — instead of the overall max event time.
    # (scalar_stats_approx, whose GK rank tolerance gained a one-rank
    # floor the same session, is already listed above.)
    "stream_attribution_outer": 5,
    # round 6: advisor fixes — cusum statistic now decimal(38,0) (int64
    # wrapped ~sf1000); ewma rollup pinned with localCheckpoint before
    # its broadcast self-join (plan-level only, same rows).
    # (bm25_doc_scores's stable rank-20 cutoff landed the same round but
    # it has never been driver-checked — already tier 0.)
    "revenue_cusum_changepoint": 6,
    "ewma_daily_revenue": 6,
    # round 6: sign-LSH re-parameterized 32/4 → 96/6 (16-bit band keys)
    # after the sf1 spot measured 8-bit keyspace saturation (candidates
    # 100× for 10× vectors). Output changes: banding is part of the
    # query's verified construction.
    "embedding_cosine_dedup": 6,
    # round 5 (shared shingle-set cache) AND round 6 (review pass:
    # minhash_lsh_pairs gained an optional prebuilt-signatures param,
    # the query routes through the single-sourced MINHASH_* knobs —
    # value-identical, oracle strings verified byte-equal). One entry,
    # latest round.
    "minhash_dup_pairs": 15,
    # round 8: dedup_doc_spans gained the NULL-text phantom-span filter
    # (operators/text_dedup.py) — this append was owed in r8 itself
    # (VERDICT r8 item 1). Round 9: same operator gained the carry=
    # passthrough (signature extension for the X161 composition).
    "doc_dedup_spans": 9,
    # round 9: ADVICE-r7 low fixes — ppb ratios moved to decimal(38,0)
    # numerators (int64 wrapped ~sf1000); boilerplate span census keyed
    # (hash, span) instead of hash alone (collision exactness). Output
    # value-identical at sf0.01, but the code under them changed.
    "basket_lift_rules": 15,
    "boilerplate_span_removal": 9,
    # round 9 (second session): assign_buckets rewritten from
    # broadcast-join + row_number window to a per-row array_max fold
    # over one packed broadcast centroid row (kills the n·k scored-row
    # shuffle). Output byte-identical (same rounded cosine, same
    # tie-break), but the code under every IVF/k-means consumer changed.
    # (embedding_topk_ivf / ann_recall_ivf / ivf_pq_search also changed
    # here; their entries live in the round-11 block below — latest
    # change round only.)
    "kmeans_step_clusters": 9,
    # round 10: ADVICE-r9 ppm-overflow fixes — token-count ppm
    # numerators moved to DECIMAL(38,0) / HUGEINT (int64 wraps at the
    # ~1e13-token operating point). Value-identical at sf0.01, but the
    # code under them changed.
    "corpus_datacard": 10,
    # (shard_skew_report's round-10 ppm-overflow entry superseded by
    # its round-13 entry below.)
    "bpe_fertility_by_source": 15,
    # round 10: the composed pipeline gained the X198 substring-trim
    # as stage 4 (rebuilt trimmed text feeds every later stage) —
    # OUTPUT-changing: stage rows renumbered 04-07 and their counts
    # reflect the trimmed corpus.
    "curation_pipeline_full": 10,
    # (round-10 dedup_strategy_delta 8-tier-census and
    # kmeans_iterated_centroids scale-stable-seed entries superseded by
    # their round-12 entries below — latest change round only.)
    # (round-10 dup_span_stats entry superseded by the r11 one below —
    # duplicate literal keys silently keep the last, so only the
    # latest round is listed.)
    # round 11: similarity operators gained spread_for_cpu on the
    # corpus side (the embeddings parquet scans as ONE split — every
    # interpreted HOF dot ran on one core; the r10 ANN sf1-spot
    # "superlinear" grades) and two-stage top-k ranking (partial
    # per-partition row_number before the global per-query window —
    # kills the |queries|-task sort bottleneck). Output byte-identical
    # (deterministic total order; partial top-k keeps a superset).
    "embedding_topk": 15,
    "embedding_topk_ivf": 15,
    "ann_recall_ivf": 15,
    "ann_recall_ivf_pq": 15,
    "ivf_pq_search": 11,
    # (matryoshka_recall_curve / kmeans_iterated_centroids also changed
    # here; superseded by their round-12 entries below.)
    # round 11: SemDeDup pair builders' centroid count moved from a
    # fixed 50-cap (pair volume n²/100, quadratic) to ceil(sqrt(n))
    # (_semdedup_cent — the published n^1.5 operating point). Values
    # identical at driver scales (the %100 candidate pool binds below
    # n=10^4), but the recipe under them — and their oracles — changed.
    # (semantic_dedup_clusters / semantic_threshold_sweep /
    # dedup_strategy_delta / dedup_tier_funnel entries superseded by
    # the round-12 block below.)
    # round 11: spread_for_cpu on the under-parallel scan feeding the
    # window-hash explode (stage profile measured on 2 of 32 cores at
    # 10x). Values identical, plan changed.
    "dup_span_stats": 15,
    # round 12: the fp.isNotNull() guard became the scan-cheap
    # size(tokens) >= 5 precondition — written over the alias it
    # pushed the WHOLE fingerprint chain into the scan's DataFilters
    # (computed twice, before the spread). Values identical.
    "fuzzy_dup_pairs": 12,
    # round 12: same pathology — norm > 0 became max|x| > 0 (the
    # pushed filter re-evaluated the whole norm fold per scan row) and
    # the scan is spread for the per-row normalize/quantize folds.
    "label_embedding_dispersion": 12,
    # (round-11 simhash_near_pairs entry — _simhash_candidates
    # extraction — superseded by its round-14 banding entry below; one
    # literal entry per key, latest change round only.)
    # round 12: sf0.1-regression clawback (VERDICT r11 #3/#5) — plan-
    # only, value-identical changes: matryoshka's probe×corpus pairing
    # gained the explicit broadcast hint (BNLJ at any scale, not just
    # while AQE saves it), and the two driver-iterated vector loops
    # (greedy k-center, Lloyd k-means) now spread+pin their loop-
    # invariant corpus ONCE instead of re-spreading the under-parallel
    # scan inside every iteration.
    "matryoshka_recall_curve": 15,
    "kcenter_diverse_seeds": 12,
    "kmeans_iterated_centroids": 12,
    # round 12 (ADVICE r11): _semdedup_cent's centroid pick moved from
    # a global row_number window (whole %100 pool through ONE task) to
    # driver-count + orderBy().limit(cap) — output identical, plan
    # data-parallel. Declared for every consumer of the centroid set.
    "semantic_dedup_clusters": 12,
    "semantic_threshold_sweep": 12,
    # (round-12 dedup_strategy_delta / dedup_tier_funnel entries —
    # _semdedup_cent consumers — superseded by their round-14 banding
    # entries below; one literal entry per key, latest round only.)
    # round 12 (ADVICE r11): retrieval_ndcg now normalizes by STANDARD
    # IDCG@k (ideal DCG over min(corpus-wide same-label count - 1, k))
    # instead of the ideal ordering of the retrieved set — OUTPUT-
    # changing for every probe whose label has > n_rel members.
    "retrieval_ndcg": 12,
    # round 12: stream-side plan fixes (the X222 lessons) — the
    # minhash twin's size(sh)>0 guard became the scan-evaluable
    # size(tokens)>=3 precondition (the alias form pushed the WHOLE
    # shingle build into the scan's DataFilters, single-core) plus
    # fold-parallelism repartition and a post-signature boundary; the
    # substring twin's anchor explode gained the same pre-explode
    # repartition. Values identical (guards equivalent, plan-only);
    # measured 7.7->4.8 s and 7.1->5.2 s at sf0.1.
    "stream_minhash_dedup": 15,
    "stream_substring_guard": 15,
    # round 13 (review dedup refactors — single-source-of-truth
    # helpers): the X172 shard rule became _shard_col/_SHARD_SQL
    # (shard_skew_report's oracle string changed in whitespace only)
    # and the X56 PII chain became pii_sql_chain/pii_count_cols
    # (pii_density_census's oracle verified byte-equal, Spark
    # expressions identical). Declared conservatively — value-identical
    # by construction, but the code under both queries changed.
    "shard_skew_report": 13,
    "pii_density_census": 13,
    # round 14: SimHash banding rewritten from the 4x15-bit
    # single-chunk pigeonhole to Manku-2007 block-combination tables
    # (5 blocks, C(5,2) two-block 24-bit keys — simhash_block_combos):
    # the old keyspace saturates at ~30k docs/shard and the candidate
    # budget goes quadratic past it. Verified-pair outputs
    # (simhash_near_pairs, stream_simhash_dedup, the delta/funnel
    # tiers) are value-identical (the candidate set shrinks, the
    # verified set is the same Hamming<=3 relation); the census's
    # OUTPUT is the candidate histogram itself and changed by design
    # (its oracle replays the new construction from the same combo
    # source).
    "simhash_near_pairs": 15,
    "simhash_hamming_census": 15,
    "stream_simhash_dedup": 15,
    "dedup_strategy_delta": 15,
    "dedup_tier_funnel": 15,
    # round 15: the chunk-instance construction moved out of the query
    # body into operators/text_dedup.py cdc_chunk_instances (now shared
    # with the new stream_cdc_chunk_guard) — value-identical, but the
    # code under the query changed.
    "cdc_chunk_dedup": 15,
    # round 15 (optimization round 1): shared gold-table session
    # caches (co-purchase pair counts / BPE-encoded corpus / SimHash
    # fingerprints+candidates) and the matryoshka projection-before-
    # explode restructure — plans changed, results proven identical
    # against the unchanged DuckDB oracles.
    "bpe_encode_docs": 15,
    "copurchase_jaccard_recs": 15,
    "copurchase_triangles": 15,
    "kcore_decomposition": 15,
    "label_propagation_parts": 15,
    "pagerank_step_parts": 15,
    "simhash_idf_band_budget": 15,
    "stream_cdc_chunk_guard": 15,
    "tokenizer_drift_snapshots": 15,
    "ivf_nprobe_recall_curve": 15,
    "fuzzy_decontaminate_docs": 15,
    "source_overlap_matrix": 15,
    "minhash_estimate_quality": 15,
    "incremental_lsh_dedup": 15,
    "dsir_importance_weights": 15,
    "stream_dsir_scores": 15,
    "curation_pipeline": 15,
    "anchor_stoplist_census": 15,
}


def _last_driver_round(repo_root: "Path | None" = None) -> dict[str, int]:
    """Map query name -> last round with a green driver row.

    Green means hash_match true, or a rows-only check for the no-oracle
    queries (err == "no_oracle" with a row count recorded). Rows that
    were checked but FAILED do not count — the query stays stale and
    sorts back into the checked window.
    """
    root = repo_root or Path(__file__).resolve().parents[2]
    last: dict[str, int] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            ok = bool(row.get("hash_match")) or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if ok:
                last[name] = max(last.get(name, 0), rnd)
            else:
                last.setdefault(name, 0)
    return last


def _reorder(repo_root: "Path | None" = None) -> None:
    last = _last_driver_round(repo_root)
    reg_pos = {name: i for i, name in enumerate(QUERIES)}

    def sort_key(name: str) -> tuple[int, int, int]:
        if name not in last:
            return (0, 0, reg_pos[name])  # never driver-checked
        if _CHANGED.get(name, 0) > last[name]:
            # changed since last green row — oldest green first, so when
            # the changed tier itself overflows the driver's 50-slot cap
            # the queries verified LONGEST ago (riskiest) win slots
            return (1, last[name], reg_pos[name])
        return (2, last[name], reg_pos[name])  # oldest green first

    ordered = sorted(QUERIES, key=sort_key)
    for reg in (QUERIES, ORACLES):
        snap = dict(reg)
        reg.clear()
        reg.update((n, snap[n]) for n in ordered if n in snap)


_reorder()
