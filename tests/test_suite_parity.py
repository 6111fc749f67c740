"""Differential test of every suite query against its DuckDB oracle at
sf=0.01 — a local mirror of the driver's correctness gate (SURVEY.md §5.1)."""

from __future__ import annotations

import pytest

from seng550_a3_etl_spark.suite import ORACLES, QUERIES
from tests.conftest import SF_ORACLE
from tests.oracle_harness import assert_parity


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    if name in ORACLES:
        assert_parity(df, ORACLES[name], SF_ORACLE, name=name)
    else:
        # rows-only check for non-SQL-expressible ops (driver's weak gate)
        assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


# Queries whose semantics depend on data SCALE — sketch tolerances,
# watermark-basis cutoffs, stop-shingle bounds, top-k tie ordering —
# get parity checks at sf0.001 AND sf0.1 in addition to the sf0.01
# mirror above (the scale MATRIX, VERDICT r5 #6). Two real defects hid
# from the single-sf mirror (GK rank tolerance below one rank at small
# n; the outer-attribution cutoff based on the overall max event time
# instead of the min-watermark side's max). One-line rationale per
# entry: what scale-dependent knob the query carries.
_SCALE_SENSITIVE = [
    # GK sketch rank tolerance n/accuracy — degenerates below one rank
    # at small n (the round-5 bug).
    "scalar_stats_approx",
    # two-sided watermark emission cutoff — min-watermark basis, not
    # max event time (the other round-5 bug).
    "stream_attribution_outer",
    # stop-shingle bound max_shingle_freq=64 — binds only when a
    # shingle's posting list exceeds it, i.e. only at some scales.
    "ngram_dup_pairs",
    # containment denominator = min set size; tiny corpora make
    # single-shingle docs where the ratio saturates at 1.
    "doc_containment_pairs",
    # threshold-boundary ties: pairs sitting exactly on a sweep rung
    # appear/disappear with corpus composition.
    "dup_threshold_sweep",
    # deterministic resample indices derived from n — below ~30 rows
    # the percentile-rank pick degenerates.
    "bootstrap_mean_ci",
    # rational-ratio top-k ordering — tie density grows as counts
    # shrink.
    "token_pmi_pairs",
    # KMV union/intersection estimate switches to EXACT below k
    # distinct values — sf0.001 exercises the below-k branch, sf0.1
    # the sketch branch.
    "kmv_join_cardinality",
    # per-(band,key) candidate caps + idempotent drop rule — cap binds
    # only when batch bucket sizes exceed it.
    "incremental_lsh_dedup",
    # budget-boundary ties: docs whose cumulative token count straddles
    # the per-source budget exactly.
    "source_mix_budget",
    # tombstone horizon: deletes older than the retention cutoff
    # compact away; the horizon moves with the data's time span.
    "stream_cdc_apply",
    # minhash band collision probability shifts with corpus size; the
    # exact-Jaccard verify must hold the output invariant.
    "minhash_dup_pairs",
    # sign-LSH band collision growth (the sf1-spot watch item) — the
    # exact-cosine verify must hold the output invariant.
    "embedding_cosine_dedup",
    # centroid count min(100, ceil(n/50)) — sublinear cap binds only
    # beyond sf0.1; below it every 50th vector is a centroid.
    "embedding_topk_ivf",
    # r6: HLL zero-register count and the below-m regime shift with
    # cardinality; sf0.001 exercises mostly-empty registers.
    "hll_distinct_users",
    # r6: both leg depths (top-20) truncate differently when the corpus
    # is smaller than the depth; the fusion must stay engine-exact
    # through the truncation.
    "rrf_hybrid_topk",
    # r6: rides minhash banding — pair membership shifts with scale and
    # the estimator columns must track the exact Jaccard at every sf.
    "minhash_estimate_quality",
    # r6: single-event (event_type, day) groups have no intervals and
    # are dropped — the drop rule binds only at small sf.
    "time_weighted_value",
    # r6: leftover-cent count and the fractional-remainder tiebreak
    # shift with lines-per-order composition.
    "revenue_proration",
    # r6: the 2*cum >= tot half-weight boundary is tie-prone exactly
    # when per-brand item counts are small.
    "weighted_median_price",
    # r6: top-3 membership under integer-ppb ties — tie density grows
    # as baskets shrink.
    "copurchase_jaccard_recs",
    # r6: frontier tie handling (equal price, equal qty) — duplicate
    # density is composition-dependent.
    "pareto_price_quantity",
    # r6: CMS bucket-collision regime shifts with cardinality (empty
    # buckets at sf0.001, multi-way collisions at sf0.1); the oracle
    # replay must stay bit-exact through both regimes.
    "cms_heavy_hitters",
    # r12: the self-kNN cell count flips regimes across sf — the %50
    # candidate pool binds below ceil(sqrt(n)) at small sf (sf0.001:
    # n=500 yields 10 pool ids, under the sqrt cap of 23, so the pool
    # binds) and the sqrt cap binds above it; both engines must replay
    # the same min(pool, cap) selection through both regimes. One family representative
    # per output shape: per-vector stats and the dual-argmax pivot.
    "knn_label_consensus",
    "hard_negative_mining",
    # r15: the IDF weights are corpus state (df table + N fitted
    # in-query), so every fingerprint — and with it the whole bucket
    # census — shifts with sf; the float vote sums must keep sign
    # parity through growing summation depth at every scale.
    "simhash_idf_band_budget",
    # r15: the KN model is corpus state — continuation counts and the
    # bigram-type total shift with sf, so every probability (and its
    # 6-decimal grid crossing) moves; the single-sourced expressions
    # must stay bit-equal through growing count magnitudes.
    "kneser_ney_bigram",
    # r15: the merged value grid density, the rest-of-corpus CDF
    # composition, and the integer-nano term magnitudes all shift
    # with sf; the gap-weighted fold must stay engine-exact as the
    # grid grows from ~300 to thousands of distinct values.
    "length_wasserstein_drift",
]

_SF_FULL = "/root/testdata/sf0.1"


@pytest.mark.parametrize("name", _SCALE_SENSITIVE)
def test_small_sf_parity(spark, name):
    from tests.conftest import SF_SMOKE

    assert_parity(QUERIES[name](spark, SF_SMOKE), ORACLES[name],
                  SF_SMOKE, name=name)


@pytest.mark.parametrize("name", _SCALE_SENSITIVE)
def test_large_sf_parity(spark, name):
    # the sf0.1 rung: caps/tolerances that are INVISIBLE at sf0.01
    # (stop-shingle bounds, centroid caps, band-size caps) start to
    # bind here — the oracle replays the same capped semantics.
    assert_parity(QUERIES[name](spark, _SF_FULL), ORACLES[name],
                  _SF_FULL, name=name)
