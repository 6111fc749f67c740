"""Physical-invariance + plan-shape tests (SURVEY.md §5.4).

The reference's performance_test.py compares one logical query across
physical layouts and *assumes* equal results; these tests assert it.
Representative suite queries must produce identical canonical rows
under: broadcast joins disabled (sort-merge everywhere), AQE off, and
1 vs 8 shuffle partitions. Plan-shape tests pin the properties the
100 TB design depends on: filter/column pushdown into the parquet scan
and broadcast of small dimensions.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest

from seng550_a3_etl_spark.suite import QUERIES
from tests.conftest import SF_ORACLE
from tests.oracle_harness import canonical_rows

# One representative per plan family: agg-after-join, window dedup,
# grid spatial join, LSH dedup, sign-LSH embedding dedup, as-of join.
INVARIANT_QUERIES = [
    "nation_order_counts",
    "top_order_per_customer",
    "district_point_counts",
    "minhash_dup_pairs",
    "embedding_cosine_dedup",
    "asof_signup_for_purchase",
    # hash-mod sampling must select the same rows under any layout
    "uniform_doc_sample",
    # weighted top-k sampling: membership AND order keys layout-stable
    "es_weighted_sample",
    # r6: integer-micro quantized reduction must be partition-order-free
    "embedding_pca_step",
    # r6: HLL max-merged registers must be layout-invariant
    "hll_distinct_users",
]

VARIANTS = {
    "no_broadcast": {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    "no_aqe": {"spark.sql.adaptive.enabled": "false"},
    "one_partition": {"spark.sql.shuffle.partitions": "1"},
}


@contextmanager
def _conf(spark, overrides: dict[str, str]):
    saved = {k: spark.conf.get(k, None) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.mark.parametrize("name", INVARIANT_QUERIES)
@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_physical_invariance(spark, name, variant):
    baseline = canonical_rows(QUERIES[name](spark, SF_ORACLE).toPandas())
    with _conf(spark, VARIANTS[variant]):
        got = canonical_rows(QUERIES[name](spark, SF_ORACLE).toPandas())
    assert got == baseline, f"{name} changed results under {variant}"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized_scan_line(df, needle: str) -> str:
    plan = _executed_plan(df)
    lines = [ln for ln in plan.splitlines() if needle in ln]
    assert lines, f"no '{needle}' in plan:\n{plan}"
    return lines[0]


def test_filters_push_into_scan(spark):
    df = QUERIES["filter_suite"](spark, SF_ORACLE)
    scan = _optimized_scan_line(df, "PushedFilters")
    for frag in ("l_quantity", "l_shipdate", "l_returnflag", "l_discount"):
        assert frag in scan, f"{frag} not pushed into scan: {scan}"


def test_column_pruning_reaches_scan(spark):
    # nation_order_counts needs only 2 of 9 orders columns; the scan's
    # ReadSchema must not include untouched ones like o_comment.
    df = QUERIES["nation_order_counts"](spark, SF_ORACLE)
    plan = _executed_plan(df)
    scans = [ln for ln in plan.splitlines() if "orders.parquet" in ln]
    assert scans
    assert all("o_totalprice" not in ln for ln in scans), scans


def test_small_dims_broadcast(spark):
    # nation (25 rows) must broadcast under default conf — the join that
    # replaces the reference's indexed dimension lookup.
    plan = _executed_plan(QUERIES["nation_order_counts"](spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_whole_stage_codegen_present(spark):
    # AQE finalizes the plan only after execution, and codegen stages
    # surface as '*'-prefixed operators in the formatted explain.
    df = QUERIES["pricing_summary"](spark, SF_ORACLE)
    df.collect()
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    final = qe.explainString(mode).split("== Initial Plan ==")[0]
    for op in ("* HashAggregate", "* Filter", "* Project"):
        assert op in final, f"{op} not codegen'd:\n{final}"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # Bucketing both sides on the join key (the engine's stand-in for
    # co-located storage at 100 TB) must eliminate every Exchange from
    # the join plan, even with broadcast disabled.
    import shutil

    from pyspark.sql import functions as F

    from seng550_a3_etl_spark.catalog import load_tables

    t = load_tables(spark, SF_ORACLE)
    try:
        t.orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode(
            "overwrite"
        ).saveAsTable("bkt_orders")
        t.customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey").mode(
            "overwrite"
        ).saveAsTable("bkt_customer")
        with _conf(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}):
            joined = spark.table("bkt_orders").join(
                spark.table("bkt_customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            plan = _executed_plan(joined)
            assert "Exchange" not in plan, plan
            assert joined.count() == t.orders.count()
    finally:
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_customer")
        if warehouse.startswith("file:"):
            shutil.rmtree(warehouse[5:], ignore_errors=True)


def test_gold_partitioning_prunes_scan(spark, tmp_path):
    # save_gold partitions by date (the B-tree-index replacement,
    # SURVEY §4); a date-filtered read must show partition pruning in
    # the scan, not a full-table read.
    from pyspark.sql import functions as F

    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.plans.gold import save_gold

    t = load_tables(spark, SF_ORACLE)
    facts = t.orders.withColumn(
        "order_date", F.col("o_orderdate").cast("date")
    )
    path = str(tmp_path / "gold_facts")
    save_gold(facts, path, partition_by=["order_date"])

    read = spark.read.parquet(path).filter(
        F.col("order_date") == "1995-01-01"
    )
    plan = _executed_plan(read)
    scan = _optimized_scan_line(read, "PartitionFilters")
    assert "order_date" in scan.split("PartitionFilters")[1].split("]")[0], scan
    n_days = facts.select("order_date").distinct().count()
    # pruned scan must touch a single partition directory
    import re

    m = re.search(r"InMemoryFileIndex\[?\(?(\d+) paths", plan)
    if m:  # path count printed only for multi-path indexes
        assert int(m.group(1)) < n_days
    assert read.count() == facts.filter(
        F.col("order_date") == "1995-01-01"
    ).count()


def test_grid_spatial_join_survives_no_broadcast(spark):
    # The grid prefilter exists for polygon sides too big to broadcast —
    # the configuration the small fixtures never force naturally. Disable
    # broadcast entirely (the 100×-scale stand-in), assert the grid path
    # (cell_size != None) executes as a shuffle equi-join on the cell id,
    # and that both inner and left variants match the broadcast path's
    # results exactly.
    from pyspark.sql import functions as F

    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.operators.spatial import points_in_polygons_join
    from seng550_a3_etl_spark.suite.spatial import customer_points, district_rects

    t = load_tables(spark, SF_ORACLE)
    pts, polys = customer_points(t), district_rects(t)

    def canon(df):
        return canonical_rows(df.select("c_custkey", "n_name").toPandas())

    base_inner = canon(
        points_in_polygons_join(
            pts, polys, "px", "py", "polys", how="inner", cell_size=None
        )
    )
    base_left = canon(
        points_in_polygons_join(
            pts, polys, "px", "py", "polys", how="left", cell_size=None
        )
    )
    with _conf(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        grid_inner = points_in_polygons_join(
            pts, polys, "px", "py", "polys", how="inner", cell_size=7.0
        )
        plan = _executed_plan(grid_inner)
        assert "BroadcastHashJoin" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert canon(grid_inner) == base_inner
        grid_left = points_in_polygons_join(
            pts,
            polys,
            "px",
            "py",
            "polys",
            how="left",
            cell_size=7.0,
            point_key="c_custkey",
        )
        assert canon(grid_left) == base_left


def test_hash_sample_plans_have_no_exchange(spark):
    # Deterministic hash sampling (X26/X45) must be a pure scan-stage
    # filter — any Exchange would mean the "zero-shuffle sampling"
    # claim is wrong.
    for name in ("uniform_doc_sample", "weighted_doc_sample"):
        plan = _executed_plan(QUERIES[name](spark, SF_ORACLE))
        assert "Exchange" not in plan, f"{name} shuffles:\n{plan}"


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    # When the dim side of a shuffle join is selectively filtered, Spark
    # injects a runtime bloom filter (might_contain) on the fact side —
    # the 100 TB semi-join reduction that drops non-joining fact rows at
    # the scan instead of carrying them through the shuffle. Fixtures sit
    # under the 10 GB application-side default, so the test lowers that
    # threshold to observe the injection, and checks the filtered plan
    # still produces the exact join result.
    from pyspark.sql import functions as F

    from seng550_a3_etl_spark.catalog import load_tables

    t = load_tables(spark, SF_ORACLE)
    dim = t.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    joined = (
        t.lineitem.join(dim, t.lineitem.l_orderkey == dim.o_orderkey)
        .groupBy("l_returnflag")
        .count()
    )
    baseline = canonical_rows(joined.toPandas())
    with _conf(
        spark,
        {
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold": "0",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    ):
        bloomed = (
            t.lineitem.join(dim, t.lineitem.l_orderkey == dim.o_orderkey)
            .groupBy("l_returnflag")
            .count()
        )
        plan = bloomed._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
        assert canonical_rows(bloomed.toPandas()) == baseline


def test_decorrelated_avg_join_broadcasts(spark):
    # parts_above_type_avg (X44): the per-type aggregate must reach the
    # join as a broadcast — the part table itself must not shuffle for
    # the join (its only Exchange is the aggregate's partial+final).
    plan = _executed_plan(QUERIES["parts_above_type_avg"](spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan, plan


def test_struct_argmax_is_pure_aggregate(spark):
    # top_user_per_event_type: the struct-max formulation must stay an
    # ordinary two-level hash aggregate (2 shuffles), never a window —
    # a window would sort and shuffle every per-user row to one task
    # per event_type.
    plan = _executed_plan(QUERIES["top_user_per_event_type"](spark, SF_ORACLE))
    assert "Window" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_rolling_window_input_is_day_rollup(spark):
    # daily_revenue_rolling (X38): the single-partition global window
    # must consume the per-day aggregate (small), i.e. the plan shows
    # the hash agg BELOW the window's SinglePartition exchange.
    plan = _executed_plan(QUERIES["daily_revenue_rolling"](spark, SF_ORACLE))
    assert "Window" in plan, plan
    single = plan.index("Exchange SinglePartition")
    agg = plan.rindex("HashAggregate")
    assert agg > single, f"window not fed by rollup:\n{plan}"


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    # A date-partitioned gold table joined to a selectively-filtered dim
    # must scan only the partitions the dim's filter selects — Spark's
    # runtime replacement for the reference's B-tree date index when the
    # filter value set is only known at join time.
    from pyspark.sql import functions as F

    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.plans.gold import save_gold

    t = load_tables(spark, SF_ORACLE)
    facts = t.orders.withColumn(
        "order_date", F.col("o_orderdate").cast("date")
    )
    path = str(tmp_path / "gold_dpp")
    save_gold(facts, path, partition_by=["order_date"])
    fact = spark.read.parquet(path)

    dim = (
        facts.select("order_date").distinct()
        .withColumn("flag", F.dayofmonth("order_date"))
    ).filter(F.col("flag") == 1).drop("flag")

    joined = fact.join(dim, "order_date").groupBy("order_date").count()
    plan = _executed_plan(joined)
    assert "dynamicpruning" in plan, plan

    expected = (
        facts.filter(F.dayofmonth("order_date") == 1)
        .groupBy("order_date").count()
    )
    assert canonical_rows(joined.toPandas()) == canonical_rows(
        expected.toPandas()
    )


def test_approx_stats_plan_is_single_pass_sketch(spark):
    # approx_scalar_sketch (A8 scale path): the plan must be ONE scan +
    # map-side partial sketches + a single O(sketch) SinglePartition
    # merge — never the exact percentile (which funnels every distinct
    # value through one aggregation buffer) and never a global sort.
    # (The suite query scalar_stats_approx wraps this in a verification
    # harness with deliberate exact aggregates; the scale plan pinned
    # here is the sketch itself.)
    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.suite.relational import approx_scalar_sketch

    lineitem = load_tables(spark, SF_ORACLE).lineitem
    plan = _executed_plan(approx_scalar_sketch(lineitem))
    assert "partial_percentile_approx" in plan, plan
    assert "partial_approx_count_distinct" in plan, plan
    # the only exchange is the final sketch merge
    assert plan.count("Exchange") == 1, plan
    assert "Exchange SinglePartition" in plan, plan
    assert "Sort" not in plan, plan
    # the exact forms must be absent (median/percentile without approx)
    assert "median(" not in plan, plan
    assert " percentile(" not in plan, plan


def test_vocab_topk_plan_avoids_global_sort(spark):
    # vocab_top_tokens (X75): final top-50 must be TakeOrderedAndProject
    # (per-partition heaps + driver merge), never a rangepartitioning
    # global sort of the vocabulary.
    plan = _executed_plan(QUERIES["vocab_top_tokens"](spark, SF_ORACLE))
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_novelty_single_scan_single_key_shuffle(spark):
    # doc_novelty_frac (X77): corpus frequency via count-over-window must
    # keep ONE corpus-side scan (the agg+semi-join form scans twice) and
    # exactly two hash shuffles (shingle hash, then doc key). Since the
    # shared shingle-set cache landed, the corpus side is the session's
    # localCheckpoint'ed shingle sets (Scan ExistingRDD) — parquet was
    # paid once at cache build, so NO parquet scan may appear here.
    plan = _executed_plan(QUERIES["doc_novelty_frac"](spark, SF_ORACLE))
    n_scans = plan.count("Scan parquet") + plan.count("Scan ExistingRDD")
    assert n_scans == 1, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "Window" in plan, plan


def test_mix_budget_single_shuffle(spark):
    # source_mix_budget (X73): per-row scoring in the scan + ONE shuffle
    # on the source key for the ordered cumulative window.
    plan = _executed_plan(QUERIES["source_mix_budget"](spark, SF_ORACLE))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" in plan, plan


def test_sql_correlated_subquery_decorrelates(spark):
    # sql_correlated_orders (X95): Catalyst must rewrite the correlated
    # scalar subquery into an aggregate + equi-join — never a per-row
    # nested loop or a cartesian product.
    plan = _executed_plan(QUERIES["sql_correlated_orders"](spark, SF_ORACLE))
    assert "CartesianProduct" not in plan, plan
    assert "HashAggregate" in plan, plan
    assert "Join" in plan or "HashJoin" in plan, plan


def test_psi_output_bounded_by_sources(spark):
    # source_psi_drift (X94): output cardinality is |sources|, psi >= 0
    # is NOT guaranteed per term but the total must be finite, and every
    # source of the fixture appears exactly once.
    rows = QUERIES["source_psi_drift"](spark, SF_ORACLE).collect()
    assert len(rows) == len({r.source for r in rows})
    assert all(r.psi is not None and abs(r.psi) < 100 for r in rows)
    assert sum(r.n_docs for r in rows) > 0


def test_spread_for_cpu_guard(spark):
    from seng550_a3_etl_spark.plans.layout import spread_for_cpu

    cores = spark.sparkContext.defaultParallelism
    narrow = spark.range(100).coalesce(1)
    assert spread_for_cpu(narrow).rdd.getNumPartitions() == cores
    wide = spark.range(100).repartition(cores + 4)
    # already >= cores: untouched (no extra shuffle)
    assert spread_for_cpu(wide) is wide


def test_repetition_signals_no_window(spark):
    # gopher_repetition_signals (X210): the per-(doc,n) most-frequent
    # gram must be the struct-min AGGREGATE, never a row_number window
    # (a window would sort every gram row); the gram census and pivot
    # are hash aggregates.
    plan = _executed_plan(
        QUERIES["gopher_repetition_signals"](spark, SF_ORACLE)
    )
    assert "Window" not in plan, plan


def test_ccnet_model_join_broadcasts(spark):
    # ccnet_perplexity_buckets (X211): the |vocab|-row unigram model
    # must broadcast to the exploded token stream — the corpus-sized
    # side never shuffles for the scoring join.
    plan = _executed_plan(QUERIES["ccnet_perplexity_buckets"](spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan, plan


def test_vector_suite_no_unhinted_cartesian(spark):
    # VERDICT r11 #5: every probe-x-corpus pairing in the vector suite
    # must carry an explicit broadcast hint. At fixture scale AQE turns
    # an unhinted crossJoin into BNLJ anyway (hiding the bug); with the
    # auto-broadcast threshold disabled, ONLY explicit hints produce
    # BroadcastNestedLoopJoin, so any CartesianProduct here is a real
    # 100x-scale hazard (a true cartesian once the side outgrows the
    # threshold).
    from seng550_a3_etl_spark.suite import vectors as _v

    vec_queries = sorted(
        n for n, fn in QUERIES.items()
        if getattr(fn, "__module__", "") == _v.__name__
    )
    assert vec_queries, "vector suite registered no queries?"
    offenders = {}
    with _conf(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        for name in vec_queries:
            plan = _executed_plan(QUERIES[name](spark, SF_ORACLE))
            if "CartesianProduct" in plan:
                offenders[name] = True
    assert not offenders, f"unhinted cartesian in: {sorted(offenders)}"


def test_no_expensive_hof_in_big_scan_datafilters(spark):
    # ONE sweep over every non-streaming query's physical plan, three
    # suite-wide invariants (plans are expensive to build — ~180 s cold
    # for 250 queries — so all whole-suite plan guards share this loop):
    #
    # 1. r12 pathology class (X216/X222/X57/X99): a filter or join
    #    constraint written over an interpreted-HOF alias gets rewritten
    #    into the parquet scan's DataFilters — the whole fold then runs
    #    per row inside the scan (single-core on a one-split fixture,
    #    duplicated with the projection's own evaluation). Guards must be
    #    scan-cheap preconditions instead. Asserted for the corpus-sized
    #    tables (documents/embeddings); dim-table scans (25-row nation
    #    geometry keys) are exempt — the expression cost is bounded by
    #    the dim size. A single flat transform( is allowed (e.g. the
    #    int8 all-zero filter max|x| > 0 — one cheap pass, no reuse);
    #    aggregate( folds and nested transform chains are not.
    # 2. No CartesianProduct anywhere (r13): the vector-suite guard
    #    covers probe×corpus pairings under no-broadcast; this catches
    #    an unhinted cross join leaking into ANY suite plan under the
    #    default conf — at 100 TB that plan is a non-starter.
    # 3. No BatchEvalPython anywhere (r13): the package's standing
    #    claim is ZERO row-at-a-time Python UDFs (grep-verified for
    #    definitions); this asserts it at the PLAN level, where an
    #    accidental F.udf import would actually surface. Arrow paths
    #    (mapInPandas/ArrowEvalPython) stay allowed — the multimodal
    #    operators use them by design.
    import re

    offenders: dict = {}
    cartesian: list = []
    row_udf: list = []
    for name in sorted(QUERIES):
        if name.startswith("stream_"):
            continue  # streaming queries execute on registration
        plan = _executed_plan(QUERIES[name](spark, SF_ORACLE))
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BatchEvalPython" in plan:
            row_udf.append(name)
        for ln in plan.splitlines():
            if "FileScan" not in ln or "DataFilters" not in ln:
                continue
            if not re.search(r"(documents|embeddings)", ln):
                continue
            filt = ln.split("DataFilters:", 1)[1]
            if "aggregate(" in filt or len(
                re.findall(r"transform\(", filt)
            ) >= 2:
                offenders.setdefault(name, []).append(filt[:120])
    assert not offenders, f"expensive HOFs in scan DataFilters: {offenders}"
    assert not cartesian, f"CartesianProduct in suite plans: {cartesian}"
    assert not row_udf, f"row-at-a-time Python UDF in plans: {row_udf}"


def test_self_knn_family_plan_shape(spark):
    # The self-kNN family's scale contract (r12): the cell ASSIGNMENT
    # is the zero-exchange broadcast fold (no join/exchange between
    # the embeddings scan and the argmax projection — assign_buckets'
    # packed-centroid form), and the per-anchor top-k/argmax windows
    # are WindowGroupLimit-pruned so rank pruning happens map-side
    # before the final sort.
    from pyspark.sql import functions as F

    from seng550_a3_etl_spark.suite import vectors as _v

    assigned = _v._knn_assigned(spark, SF_ORACLE)
    # cached frame is a checkpoint; re-derive the build plan fresh
    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.operators.similarity import assign_buckets

    t = load_tables(spark, SF_ORACLE)
    corpus = t.embeddings.select("vec_id", F.col("embedding").alias("v"))
    build = assign_buckets(
        corpus, _v._knn_cells(t.embeddings), "vec_id", "v"
    )
    plan = _executed_plan(build)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert assigned.count() == t.embeddings.count()
    for name in ("knn_label_consensus", "hard_negative_mining",
                 "knn_bucket_outliers"):
        qplan = _executed_plan(QUERIES[name](spark, SF_ORACLE))
        assert "WindowGroupLimit" in qplan, name
