"""Data-quality suite queries (SURVEY.md §2.10 X50) — the declarative
replacement for the reference's ad-hoc row-count verification
(/root/reference/etl.py:214-218)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seng550_a3_etl_spark.catalog import load_tables
from seng550_a3_etl_spark.functions.text import tokens
from seng550_a3_etl_spark.operators.quality import check_rules, fk_violations
from seng550_a3_etl_spark.suite.registry import query

_N_ROWS = "(SELECT COUNT(*) FROM orders)"


@query(
    "orders_quality_report",
    oracle=f"""
    SELECT 'totalprice_positive' AS check_name,
           COUNT(*) FILTER (WHERE NOT COALESCE(o_totalprice > 0, FALSE))
             AS n_violations,
           {_N_ROWS} AS n_rows
    FROM orders
    UNION ALL
    SELECT 'totalprice_below_cap',
           COUNT(*) FILTER (WHERE NOT COALESCE(o_totalprice < 400000, FALSE)),
           {_N_ROWS}
    FROM orders
    UNION ALL
    SELECT 'status_in_domain',
           COUNT(*) FILTER
             (WHERE NOT COALESCE(o_orderstatus IN ('O', 'F', 'P'), FALSE)),
           {_N_ROWS}
    FROM orders
    UNION ALL
    SELECT 'orderdate_in_range',
           COUNT(*) FILTER (WHERE NOT COALESCE(
             CAST(o_orderdate AS DATE) BETWEEN DATE '1992-01-01'
                                           AND DATE '1998-12-31', FALSE)),
           {_N_ROWS}
    FROM orders
    UNION ALL
    SELECT 'custkey_in_customer',
           COUNT(*) FILTER (WHERE NOT EXISTS
             (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
           {_N_ROWS}
    FROM orders o
    """,
)
def orders_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative DQ report over orders: four single-table rules
    (positivity, cap, domain membership, date range) evaluated in ONE
    scan via conditional aggregates, plus a referential-integrity check
    (orders→customer orphans) as a broadcast-able anti join. NULL
    predicate results count as violations.

    Scale: rule count never adds jobs (one shared scan, one wide row
    shuffled); the FK check moves only the parent's key column. The
    oracle replays each rule as a FILTER aggregate and the FK check as
    NOT EXISTS.
    """
    t = load_tables(spark, sf_dir)
    rules = {
        "totalprice_positive": F.col("o_totalprice") > 0,
        "totalprice_below_cap": F.col("o_totalprice") < 400000,
        "status_in_domain": F.col("o_orderstatus").isin("O", "F", "P"),
        "orderdate_in_range": F.col("o_orderdate")
        .cast("date")
        .between("1992-01-01", "1998-12-31"),
    }
    report = check_rules(t.orders, rules)
    n_rows = t.orders.count()
    orphans = fk_violations(
        t.orders,
        F.broadcast(t.customer.select("c_custkey")),
        on=[("o_custkey", "c_custkey")],
    )
    fk_row = orphans.agg(
        F.lit("custkey_in_customer").alias("check_name"),
        F.count(F.lit(1)).alias("n_violations"),
        F.lit(n_rows).alias("n_rows"),
    )
    return report.unionByName(fk_row)


_KANON_K = 5


@query(
    "quasi_id_kanon",
    oracle=f"""
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
             COUNT(*) AS class_size
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT class_size,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(class_size) AS BIGINT) AS n_rows,
           class_size < {_KANON_K} AS below_k
    FROM classes GROUP BY class_size
    """,
)
def quasi_id_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X130 — k-anonymity census over a quasi-identifier tuple
    (nation, market segment, account-balance bucket): the histogram of
    equivalence-class sizes with each size flagged against k=5.
    Rows in classes below k are re-identifiable by the quasi-identifier
    alone — the governance gate a training-data release runs before
    shipping anything derived from user records (generalize or suppress
    until below_k rows reach zero).

    Scale: one map-side-combined shuffle to the equivalence-class
    rollup, then a fold over |classes| rows to the size histogram —
    the same two-level rollup shape as key_skew_report; nothing
    row-sized survives the first aggregation."""
    t = load_tables(spark, sf_dir)
    classes = t.customer.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias(
            "bal_bucket"
        ),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    return classes.groupBy("class_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("class_size").cast("long").alias("n_rows"),
        (F.col("class_size") < _KANON_K).alias("below_k"),
    )


@query(
    "benford_digit_census",
    oracle="""
    WITH cents AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
      FROM orders WHERE o_totalprice > 0
    ),
    digits AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM cents
    ),
    obs AS (SELECT d, COUNT(*) AS n FROM digits GROUP BY d),
    tot AS (SELECT SUM(n) AS total FROM obs)
    SELECT d AS digit,
           CAST(n AS BIGINT) AS n_orders,
           ROUND(log10(1 + 1.0 / d), 6) AS benford_frac,
           ROUND(pow(n - total * log10(1 + 1.0 / d), 2)
                 / (total * log10(1 + 1.0 / d)), 4) AS chisq_term
    FROM obs CROSS JOIN tot
    """,
)
def benford_digit_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X131 — Benford's-law first-digit screen on order totals: the
    observed leading-digit counts vs the Benford expectation
    log10(1+1/d), with per-digit chi-square terms (statistic = sum,
    dof 8) — the classic forensic/data-quality test for fabricated or
    re-scaled monetary columns (a synthetic uniform generator fails it
    loudly, which is itself a fixture-honesty check).

    The leading digit comes from integer CENTS rendered as a string —
    never from float formatting, which differs across engines. Scale:
    one scan folding to a ≤9-row rollup; the total is a 1-row
    broadcast."""
    t = load_tables(spark, sf_dir)
    cents = t.orders.where(F.col("o_totalprice") > 0).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c")
    )
    obs = cents.select(
        F.substring(F.col("c").cast("string"), 1, 1)
        .cast("long")
        .alias("d")
    ).groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    bf = F.log10(1 + 1.0 / F.col("d"))
    exp = F.col("total") * bf
    return obs.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("digit"),
        F.col("n").cast("long").alias("n_orders"),
        F.round(bf, 6).alias("benford_frac"),
        F.round(F.pow(F.col("n") - exp, 2) / exp, 4).alias("chisq_term"),
    )


# X138 — schema-wide referential-integrity census. The seven FK edges of
# the TPC-H-ish schema; each arm counts child rows and orphans (NOT
# EXISTS semantics — a NULL FK references nothing and counts as an
# orphan, matching fk_violations' null-rejecting join).
_FK_EDGES_SQL = " UNION ALL ".join(
    f"""
    SELECT '{edge}' AS fk_edge,
           CAST(COUNT(*) AS BIGINT) AS child_rows,
           CAST(COUNT(*) FILTER (WHERE NOT EXISTS
             (SELECT 1 FROM {parent} p WHERE p.{pkey} = c.{ckey}))
             AS BIGINT) AS orphans
    FROM {child} c
    """
    for edge, child, ckey, parent, pkey in [
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem->supplier", "lineitem", "l_suppkey", "supplier",
         "s_suppkey"),
        ("customer->nation", "customer", "c_nationkey", "nation",
         "n_nationkey"),
        ("supplier->nation", "supplier", "s_nationkey", "nation",
         "n_nationkey"),
        ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
)


@query("fk_orphan_census", oracle=_FK_EDGES_SQL)
def fk_orphan_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X138 — referential-integrity census across every FK edge of the
    schema: one row per edge with child row count and orphan count (a
    child key with no parent — NOT EXISTS semantics, NULL keys orphan).
    The whole-schema generalization of orders_quality_report's single
    custkey check — the governance sweep a warehouse runs after every
    bulk load, and the precondition audit before trusting any join
    result downstream.

    Scale: each arm is ONE pass over the child — a LEFT join against
    the parent's deduped KEY column (broadcast when the parent is
    dim-sized, shuffle otherwise) folding straight into a single agg
    producing both child_rows and orphans (count_if on the unmatched
    probe), so lineitem is scanned once per arm, not once for the
    total and again for the anti join. Arms are independent jobs over
    column-pruned scans; the output is |edges| rows. No arm ever
    carries a payload column."""
    t = load_tables(spark, sf_dir)
    edges = [
        ("orders->customer", t.orders, "o_custkey",
         t.customer, "c_custkey", True),
        ("lineitem->orders", t.lineitem, "l_orderkey",
         t.orders, "o_orderkey", False),
        ("lineitem->part", t.lineitem, "l_partkey",
         t.part, "p_partkey", True),
        ("lineitem->supplier", t.lineitem, "l_suppkey",
         t.supplier, "s_suppkey", True),
        ("customer->nation", t.customer, "c_nationkey",
         t.nation, "n_nationkey", True),
        ("supplier->nation", t.supplier, "s_nationkey",
         t.nation, "n_nationkey", True),
        ("nation->region", t.nation, "n_regionkey",
         t.region, "r_regionkey", True),
    ]
    rows = []
    for edge, child, ckey, parent, pkey, small_parent in edges:
        # Distinct keeps LEFT-join probe semantics identical to the
        # NOT-EXISTS oracle even if a parent key were ever duplicated;
        # it rides the shuffle/broadcast the join needs anyway.
        pk = parent.select(F.col(pkey).alias("__pk")).distinct()
        if small_parent:
            pk = F.broadcast(pk)
        probe = child.select(ckey).join(
            pk, F.col(ckey) == F.col("__pk"), "left"
        )
        rows.append(
            probe.agg(
                F.lit(edge).alias("fk_edge"),
                F.count(F.lit(1)).alias("child_rows"),
                F.count_if(F.col("__pk").isNull()).alias("orphans"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# "a" added to the published 8-word list: the synthetic fixture's
# vocabulary contains only "a"/"the" from the original set, and a rule
# that can never pass verifies nothing (same stand-in precedent as the
# word-count bounds below).
_GOPHER_STOPWORDS = (
    "a", "the", "be", "to", "of", "and", "that", "have", "with",
)
# Fixture-scaled stand-ins for the published Gopher bounds (50..100k
# words, mean word length 3..10): the documents fixture runs 10..~100
# whitespace words, so the word-count gate is 20..1000.
_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS = 20, 1000
_GOPHER_MIN_MEANLEN, _GOPHER_MAX_MEANLEN = 3, 10

_DUCK_STOPS = ", ".join(f"'{w}'" for w in _GOPHER_STOPWORDS)


@query(
    "gopher_quality_flags",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(t, x -> length(x)))
                  AS BIGINT) AS sum_chars,
             CAST(len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))
                  AS BIGINT) AS n_alpha,
             CAST(len(list_filter(t,
                    x -> regexp_matches(x, '^(#|\.\.\.)')))
                  AS BIGINT) AS n_symbol,
             CAST(len(list_distinct(list_filter(t,
                    x -> list_contains([{_DUCK_STOPS}], lower(x)))))
                  AS BIGINT) AS n_stop_types
      FROM tok
    )
    SELECT doc_id, n_words,
           n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
             AS r_word_count,
           sum_chars >= {_GOPHER_MIN_MEANLEN} * n_words
             AND sum_chars <= {_GOPHER_MAX_MEANLEN} * n_words
             AS r_mean_word_len,
           5 * n_alpha >= 4 * n_words AS r_alpha_words,
           10 * n_symbol <= n_words AS r_symbol_ratio,
           n_stop_types >= 2 AS r_stopwords,
           (n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
             AND sum_chars >= {_GOPHER_MIN_MEANLEN} * n_words
             AND sum_chars <= {_GOPHER_MAX_MEANLEN} * n_words
             AND 5 * n_alpha >= 4 * n_words
             AND 10 * n_symbol <= n_words
             AND n_stop_types >= 2 AS pass_gopher
    FROM m
    """,
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gate (X178; Rae et al. 2021 §A1.1
    rules, fixture-scaled thresholds) — per-document boolean outcomes
    for the five cheap repetition-free heuristics a pretraining corpus
    applies before any model-based filter: word count within bounds,
    mean word length within [3,10], >=80% of words containing an
    alphabetic character, symbol-prefixed (#/ellipsis) words <=10%, and
    at least two distinct stop words present. Every comparison is kept
    in cross-multiplied INTEGER form (``5*n_alpha >= 4*n_words``, never
    a float ratio), so the flags are bit-exact across engines.

    The reference has no corpus path at all (its quality checks are the
    row-count asserts at /root/reference/etl.py:214-218); this is the
    declarative-rules shape of X50 applied to the documents table.

    Scale: one scan, zero shuffles — every rule folds over the token
    array in a single projection (higher-order functions, JVM-side);
    rule count never adds jobs. At 100 TB this is the map-only first
    stage of the curation funnel, and the flags land beside the doc for
    the X78-style per-stage accounting."""
    t = load_tables(spark, sf_dir)
    return gopher_flags_projection(t.documents)


def gopher_flags_projection(documents: DataFrame) -> DataFrame:
    """The X178 rule projection over any (doc_id, text) frame — shared
    by the batch query and the streaming ingest gate (X190), which runs
    it on a readStream frame (pure projection: stream-compatible
    as-is)."""
    toks = tokens(F.col("text"))
    n_words = F.size(toks).cast("long")
    sum_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    n_alpha = F.size(
        F.filter(toks, lambda x: x.rlike("[A-Za-z]"))
    ).cast("long")
    n_symbol = F.size(
        F.filter(toks, lambda x: x.rlike(r"^(#|\.\.\.)"))
    ).cast("long")
    stops = F.array(*[F.lit(w) for w in _GOPHER_STOPWORDS])
    n_stop_types = F.size(
        F.array_distinct(
            F.filter(toks, lambda x: F.array_contains(stops, F.lower(x)))
        )
    ).cast("long")
    m = documents.select(
        "doc_id",
        n_words.alias("n_words"),
        sum_chars.alias("sum_chars"),
        n_alpha.alias("n_alpha"),
        n_symbol.alias("n_symbol"),
        n_stop_types.alias("n_stop_types"),
    )
    r_wc = F.col("n_words").between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS)
    r_ml = (
        F.col("sum_chars") >= _GOPHER_MIN_MEANLEN * F.col("n_words")
    ) & (F.col("sum_chars") <= _GOPHER_MAX_MEANLEN * F.col("n_words"))
    r_al = 5 * F.col("n_alpha") >= 4 * F.col("n_words")
    r_sy = 10 * F.col("n_symbol") <= F.col("n_words")
    r_st = F.col("n_stop_types") >= 2
    return m.select(
        "doc_id",
        "n_words",
        r_wc.alias("r_word_count"),
        r_ml.alias("r_mean_word_len"),
        r_al.alias("r_alpha_words"),
        r_sy.alias("r_symbol_ratio"),
        r_st.alias("r_stopwords"),
        (r_wc & r_ml & r_al & r_sy & r_st).alias("pass_gopher"),
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def _datacard_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    return rf"""
    WITH base AS (
      SELECT md5(text) AS h,
             len(list_filter(string_split_regex(text, '\s+'),
                             x -> x <> '')) AS ntok,
             lang, source,
             regexp_matches(text, '{_EMAIL_RE}') AS has_email
      FROM documents
    ),
    agg AS (
      SELECT COUNT(*) AS n_docs,
             SUM(ntok) AS n_tokens,
             COUNT(DISTINCT h) AS n_uniq,
             COUNT(DISTINCT source) AS n_sources,
             COUNT(DISTINCT lang) AS n_langs,
             COUNT(*) FILTER (WHERE has_email) AS n_email
      FROM base
    ),
    gp AS (
      SELECT COUNT(*) FILTER (WHERE pass_gopher) AS n_pass
      FROM ({ORACLES['gopher_quality_flags']})
    )
    SELECT metric, CAST(value AS BIGINT) AS value FROM (
      SELECT 'n_docs' AS metric, n_docs AS value FROM agg
      UNION ALL SELECT 'n_tokens', n_tokens FROM agg
      UNION ALL SELECT 'n_sources', n_sources FROM agg
      UNION ALL SELECT 'n_langs', n_langs FROM agg
      UNION ALL SELECT 'exact_dup_docs', n_docs - n_uniq FROM agg
      UNION ALL SELECT 'mean_tokens_ppm',
                       (CAST(n_tokens AS HUGEINT) * 1000000) // n_docs
                       FROM agg
      UNION ALL SELECT 'gopher_pass_ppm',
                       (n_pass * 1000000) // n_docs FROM agg, gp
      UNION ALL SELECT 'pii_email_docs', n_email FROM agg
    )
    """


@query("corpus_datacard", oracle=_datacard_oracle())
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus datacard (X183): the one-call summary a dataset release
    ships — doc/token/source/language counts, exact-duplicate count,
    mean document length, Gopher-gate pass rate, and PII (email)
    incidence — in long (metric, value) form so new metrics append
    without a schema change. Ratios are exact integer ppm.

    Composes the X178 gate via its registered query (same collapsing
    pattern as bpe_fertility_by_source); everything else folds in ONE
    documents scan: per-doc derived columns, then a single global
    aggregate (the three DISTINCTs are over hash/source/lang — tiny
    domains or pre-hashed, the standard Spark expand-agg). The 1-row
    aggregates cross-join broadcast, and `stack` unpivots driver-free.

    Scale: two corpus scans total (metrics + gate), no row-level
    shuffle beyond the distinct-aggregate expand; output is 8 rows."""
    t = load_tables(spark, sf_dir)
    base = t.documents.select(
        F.md5("text").alias("h"),
        F.size(
            F.filter(tokens(F.col("text")), lambda x: x != "")
        ).alias("ntok"),
        "lang",
        "source",
        F.col("text").rlike(_EMAIL_RE).alias("has_email"),
    )
    agg = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ntok").alias("n_tokens"),
        F.countDistinct("h").alias("n_uniq"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.count_if("has_email").alias("n_email"),
    )
    gp = gopher_quality_flags(spark, sf_dir).agg(
        F.count_if("pass_gopher").alias("n_pass")
    )
    # mean_tokens_ppm's numerator is DECIMAL(38,0): token counts at the
    # ~1e13 operating point times 1e6 wrap int64 (Spark wraps silently
    # where DuckDB errors — the X137 overflow class; oracle HUGEINT).
    # gopher_pass_ppm's numerator is a DOC count (≤ ~1e12 · 1e6 fits
    # int64), so it stays integral.
    return agg.crossJoin(F.broadcast(gp)).selectExpr(
        """stack(8,
          'n_docs', CAST(n_docs AS LONG),
          'n_tokens', CAST(n_tokens AS LONG),
          'n_sources', CAST(n_sources AS LONG),
          'n_langs', CAST(n_langs AS LONG),
          'exact_dup_docs', CAST(n_docs - n_uniq AS LONG),
          'mean_tokens_ppm',
            CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000000
                 DIV n_docs AS LONG),
          'gopher_pass_ppm', CAST(n_pass * 1000000 DIV n_docs AS LONG),
          'pii_email_docs', CAST(n_email AS LONG)
        ) AS (metric, value)"""
    )


_LDIV_L = 3


@query(
    "quasi_id_ldiversity",
    oracle=f"""
    WITH classes AS (
      SELECT c_nationkey,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
             COUNT(DISTINCT c_mktsegment) AS l_distinct,
             COUNT(*) AS class_size
      FROM customer GROUP BY 1, 2
    )
    SELECT l_distinct,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(class_size) AS BIGINT) AS n_rows,
           l_distinct < {_LDIV_L} AS below_l
    FROM classes GROUP BY l_distinct
    """,
)
def quasi_id_ldiversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity census (X188) — the attribute-disclosure complement
    of X130's k-anonymity: for each quasi-identifier equivalence class
    (nation, account-balance bucket), the number of DISTINCT values of
    the sensitive attribute (market segment), histogrammed with each
    diversity level flagged against l=3. A class can be k-anonymous yet
    leak the sensitive value outright when every member shares it
    (l=1); release gates require both censuses green.

    Scale: same two-level rollup as X130 — one map-side-combined
    shuffle to the class rollup (the DISTINCT rides the same exchange),
    then a fold over |classes| rows."""
    t = load_tables(spark, sf_dir)
    classes = t.customer.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias(
            "bal_bucket"
        ),
    ).agg(
        F.countDistinct("c_mktsegment").alias("l_distinct"),
        F.count(F.lit(1)).alias("class_size"),
    )
    return classes.groupBy("l_distinct").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("class_size").cast("long").alias("n_rows"),
        (F.col("l_distinct") < _LDIV_L).alias("below_l"),
    )


# Rae et al. 2021 Table A1 repetition thresholds (char-fraction form,
# kept as integer cross-multiplications below): top-2-gram 0.20,
# top-3-gram 0.18, top-4-gram 0.16, duplicated-5-gram 0.15.
_REP_NS = (2, 3, 4, 5)
_DUP_N = 5


@query(
    "gopher_repetition_signals",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
    ),
    base AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(t, x -> length(x)))
                  AS BIGINT) AS sum_chars
      FROM tok
    ),
    gr AS (
      SELECT doc_id, n,
             unnest(list_transform(
               range(greatest(len(t) - n + 1, 0)),
               i -> array_to_string(list_slice(t, i + 1, i + n), ' ')
             )) AS g
      FROM tok CROSS JOIN (VALUES (2), (3), (4), (5)) v(n)
    ),
    cnt AS (
      SELECT doc_id, n, g, COUNT(*) AS c,
             CAST(length(g) - (n - 1) AS BIGINT) AS chars
      FROM gr GROUP BY doc_id, n, g
    ),
    topg AS (
      SELECT doc_id, n, c * chars AS top_mass
      FROM (SELECT doc_id, n, c, chars,
                   ROW_NUMBER() OVER (
                     PARTITION BY doc_id, n ORDER BY c DESC, g
                   ) AS rn
            FROM cnt)
      WHERE rn = 1
    ),
    piv AS (
      SELECT doc_id,
             CAST(COALESCE(MAX(CASE WHEN n = 2 THEN top_mass END), 0)
                  AS BIGINT) AS top2_chars,
             CAST(COALESCE(MAX(CASE WHEN n = 3 THEN top_mass END), 0)
                  AS BIGINT) AS top3_chars,
             CAST(COALESCE(MAX(CASE WHEN n = 4 THEN top_mass END), 0)
                  AS BIGINT) AS top4_chars
      FROM topg GROUP BY doc_id
    ),
    dup AS (
      SELECT doc_id,
             CAST(COALESCE(SUM(CASE WHEN n = 5 AND c >= 2
                                    THEN c * chars END), 0)
                  AS BIGINT) AS dup5_chars
      FROM cnt GROUP BY doc_id
    )
    SELECT b.doc_id, n_words, sum_chars,
           COALESCE(top2_chars, 0) AS top2_chars,
           COALESCE(top3_chars, 0) AS top3_chars,
           COALESCE(top4_chars, 0) AS top4_chars,
           COALESCE(dup5_chars, 0) AS dup5_chars,
           5 * COALESCE(top2_chars, 0) <= sum_chars AS r_top2gram,
           50 * COALESCE(top3_chars, 0) <= 9 * sum_chars AS r_top3gram,
           25 * COALESCE(top4_chars, 0) <= 4 * sum_chars AS r_top4gram,
           20 * COALESCE(dup5_chars, 0) <= 3 * sum_chars AS r_dup5gram,
           5 * COALESCE(top2_chars, 0) <= sum_chars
             AND 50 * COALESCE(top3_chars, 0) <= 9 * sum_chars
             AND 25 * COALESCE(top4_chars, 0) <= 4 * sum_chars
             AND 20 * COALESCE(dup5_chars, 0) <= 3 * sum_chars
             AS pass_repetition
    FROM base b
    LEFT JOIN piv USING (doc_id)
    LEFT JOIN dup USING (doc_id)
    """,
)
def gopher_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signals (X210; Rae et al. 2021 Table A1) — the
    repetition HALF of the Gopher rule-set that X178 deliberately left
    out: per document, the character mass of the single most frequent
    {{2,3,4}}-gram and the total character mass inside duplicated
    5-grams, each flagged against the published char-fraction
    thresholds (0.20 / 0.18 / 0.16 / 0.15) in cross-multiplied INTEGER
    form so the booleans are bit-exact across engines. (The line-based
    Gopher signals — duplicate line / paragraph fraction — degenerate
    on the single-line fixture text and are intentionally not modeled.)

    Gram char mass = occurrences x (token chars in the gram): the
    space-joined shingle's length minus its n-1 separators. The
    most-frequent gram ties break lexicographically (smallest gram), a
    total order both engines replay. Docs shorter than n tokens emit no
    n-grams and coalesce to zero mass -> flags pass vacuously.

    Scale: ONE explode over all four gram sizes tagged (n, gram) —
    four shingle views of the same token array, built zip_with-style
    with no per-position slicing — then ONE map-side-combined
    (doc, n, gram) count, a (doc, n) struct-min argmax (no window, no
    global sort), and a (doc) pivot fold; the base stats ride a
    separate scan-stage projection and join co-partitioned on doc_id.
    Gram rows are token-count-sized (4x), never corpus-squared; at
    100 TB this is the same two-exchange budget as the X89 window
    census."""
    t = load_tables(spark, sf_dir)
    return repetition_signals(t.documents)


def repetition_signals(documents: DataFrame) -> DataFrame:
    """The X210 computation over any (doc_id, text) frame — factored
    out (like ``gopher_flags_projection``) so crafted-document tests
    and future composed stages reuse the exact checked construction.
    Unlike the X178 projection this is NOT stream-compatible as-is:
    the gram census aggregates. The four-size shingle build is a
    CPU-bound per-row HOF stage, so the scan gets the
    ``spread_for_cpu`` under-parallelism guard (a metadata-only no-op
    once splits >= cores)."""
    from seng550_a3_etl_spark.functions.text import shingles
    from seng550_a3_etl_spark.plans.layout import spread_for_cpu

    documents = spread_for_cpu(documents)
    toks = tokens(F.col("text"))
    base = documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        ).alias("sum_chars"),
    )
    def _tag(n: int):
        # one-arg lambda only: a two-arg transform lambda would be
        # interpreted by Spark as (element, array_index)
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))

    tagged = F.flatten(
        F.array(*[F.transform(shingles(toks, n), _tag(n)) for n in _REP_NS])
    )
    cnt = (
        documents.select(
            "doc_id", F.explode(tagged).alias("ng")
        )
        .select("doc_id", F.col("ng.n").alias("n"), F.col("ng.g").alias("g"))
        .groupBy("doc_id", "n", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "chars", (F.length("g") - (F.col("n") - 1)).cast("long")
        )
    )
    pern = cnt.groupBy("doc_id", "n").agg(
        F.min(
            F.struct(
                (-F.col("c")).alias("nc"),
                F.col("g").alias("g"),
                (F.col("c") * F.col("chars")).alias("mass"),
            )
        )["mass"].alias("top_mass"),
        F.sum(
            F.when(
                (F.col("n") == _DUP_N) & (F.col("c") >= 2),
                F.col("c") * F.col("chars"),
            )
        ).alias("dup_mass"),
    )
    piv = pern.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("n") == n, F.col("top_mass"))),
                F.lit(0),
            )
            .cast("long")
            .alias(f"top{n}_chars")
            for n in (2, 3, 4)
        ],
        F.coalesce(F.sum("dup_mass"), F.lit(0))
        .cast("long")
        .alias(f"dup{_DUP_N}_chars"),
    )
    m = base.join(piv, "doc_id", "left")
    top2 = F.coalesce("top2_chars", F.lit(0))
    top3 = F.coalesce("top3_chars", F.lit(0))
    top4 = F.coalesce("top4_chars", F.lit(0))
    dup5 = F.coalesce("dup5_chars", F.lit(0))
    r2 = 5 * top2 <= F.col("sum_chars")
    r3 = 50 * top3 <= 9 * F.col("sum_chars")
    r4 = 25 * top4 <= 4 * F.col("sum_chars")
    r5 = 20 * dup5 <= 3 * F.col("sum_chars")
    return m.select(
        "doc_id",
        "n_words",
        "sum_chars",
        top2.cast("long").alias("top2_chars"),
        top3.cast("long").alias("top3_chars"),
        top4.cast("long").alias("top4_chars"),
        dup5.cast("long").alias("dup5_chars"),
        r2.alias("r_top2gram"),
        r3.alias("r_top3gram"),
        r4.alias("r_top4gram"),
        r5.alias("r_dup5gram"),
        (r2 & r3 & r4 & r5).alias("pass_repetition"),
    )



def _quality_funnel_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    g = ORACLES["gopher_quality_flags"]
    return f"""
    WITH g AS ({g}),
    a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n0,
        CAST(SUM(CASE WHEN NOT r_word_count THEN 1 ELSE 0 END)
             AS BIGINT) AS d1,
        CAST(SUM(CASE WHEN NOT r_word_count THEN n_words ELSE 0 END)
             AS BIGINT) AS w1,
        CAST(SUM(CASE WHEN r_word_count AND NOT r_mean_word_len
                 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
        CAST(SUM(CASE WHEN r_word_count AND NOT r_mean_word_len
                 THEN n_words ELSE 0 END) AS BIGINT) AS w2,
        CAST(SUM(CASE WHEN r_word_count AND r_mean_word_len
                      AND NOT r_alpha_words THEN 1 ELSE 0 END)
             AS BIGINT) AS d3,
        CAST(SUM(CASE WHEN r_word_count AND r_mean_word_len
                      AND NOT r_alpha_words THEN n_words ELSE 0 END)
             AS BIGINT) AS w3,
        CAST(SUM(CASE WHEN r_word_count AND r_mean_word_len
                      AND r_alpha_words AND NOT r_symbol_ratio
                 THEN 1 ELSE 0 END) AS BIGINT) AS d4,
        CAST(SUM(CASE WHEN r_word_count AND r_mean_word_len
                      AND r_alpha_words AND NOT r_symbol_ratio
                 THEN n_words ELSE 0 END) AS BIGINT) AS w4,
        CAST(SUM(CASE WHEN r_word_count AND r_mean_word_len
                      AND r_alpha_words AND r_symbol_ratio
                      AND NOT r_stopwords THEN 1 ELSE 0 END)
             AS BIGINT) AS d5,
        CAST(SUM(CASE WHEN r_word_count AND r_mean_word_len
                      AND r_alpha_words AND r_symbol_ratio
                      AND NOT r_stopwords THEN n_words ELSE 0 END)
             AS BIGINT) AS w5
      FROM g
    )
    SELECT CAST(1 AS BIGINT) AS stage, 'word_count' AS rule,
           n0 AS docs_in, d1 AS docs_dropped, w1 AS tokens_dropped,
           n0 - d1 AS docs_out FROM a
    UNION ALL
    SELECT 2, 'mean_word_len', n0 - d1, d2, w2, n0 - d1 - d2 FROM a
    UNION ALL
    SELECT 3, 'alpha_words', n0 - d1 - d2, d3, w3,
           n0 - d1 - d2 - d3 FROM a
    UNION ALL
    SELECT 4, 'symbol_ratio', n0 - d1 - d2 - d3, d4, w4,
           n0 - d1 - d2 - d3 - d4 FROM a
    UNION ALL
    SELECT 5, 'stopwords', n0 - d1 - d2 - d3 - d4, d5, w5,
           n0 - d1 - d2 - d3 - d4 - d5 FROM a
    """


@query("quality_filter_funnel", oracle=_quality_funnel_oracle())
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter funnel census (X219): the five X178 Gopher rungs
    applied SEQUENTIALLY (published order), reporting per rung the
    marginal documents and token mass it removes from the survivors of
    the previous rungs — the justify-or-retire artifact for quality
    filters, exactly as X202's funnel is for dedup tiers (a rung whose
    marginal removal is ~0 after its predecessors is dead config; one
    that removes half the corpus deserves scrutiny before a run
    commits). Token mass uses the same whitespace n_words the rules
    themselves read.

    Scale: ONE corpus scan (the X178 flag projection) folds to a single
    conditional-sum row; the 5-row funnel is arithmetic on that row
    exploded — rung count never adds passes.

    Reference parity: none (the reference's quality surface is row-count
    asserts, /root/reference/etl.py:214-218); extends the X178/X202
    observability family."""
    t = load_tables(spark, sf_dir)
    flags = gopher_flags_projection(t.documents)
    c1 = ~F.col("r_word_count")
    p1 = F.col("r_word_count")
    c2 = p1 & ~F.col("r_mean_word_len")
    p2 = p1 & F.col("r_mean_word_len")
    c3 = p2 & ~F.col("r_alpha_words")
    p3 = p2 & F.col("r_alpha_words")
    c4 = p3 & ~F.col("r_symbol_ratio")
    p4 = p3 & F.col("r_symbol_ratio")
    c5 = p4 & ~F.col("r_stopwords")

    def dsum(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    def wsum(cond):
        return F.sum(F.when(cond, F.col("n_words")).otherwise(0)).cast(
            "long"
        )

    a = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        dsum(c1).alias("d1"), wsum(c1).alias("w1"),
        dsum(c2).alias("d2"), wsum(c2).alias("w2"),
        dsum(c3).alias("d3"), wsum(c3).alias("w3"),
        dsum(c4).alias("d4"), wsum(c4).alias("w4"),
        dsum(c5).alias("d5"), wsum(c5).alias("w5"),
    )
    rungs = [
        (1, "word_count", "n0", "d1", "w1"),
        (2, "mean_word_len", "n0 - d1", "d2", "w2"),
        (3, "alpha_words", "n0 - d1 - d2", "d3", "w3"),
        (4, "symbol_ratio", "n0 - d1 - d2 - d3", "d4", "w4"),
        (5, "stopwords", "n0 - d1 - d2 - d3 - d4", "d5", "w5"),
    ]
    rows = F.array(*[
        F.struct(
            F.lit(stage).cast("long").alias("stage"),
            F.lit(rule).alias("rule"),
            F.expr(din).cast("long").alias("docs_in"),
            F.col(d).alias("docs_dropped"),
            F.col(w).alias("tokens_dropped"),
            (F.expr(din) - F.col(d)).cast("long").alias("docs_out"),
        )
        for stage, rule, din, d, w in rungs
    ])
    return a.select(F.explode(rows).alias("__r")).select("__r.*")


# --------------------------------------------------------------------------
# X247 — weight-of-evidence / information-value feature screen (r14).
# --------------------------------------------------------------------------


def _woe_sql(g: str, b: str, tg: str, tb: str) -> str:
    """WOE for one bin as a single SQL expression both engines parse
    identically (single-sourced into the Spark plan via ``F.expr`` and
    the DuckDB oracle). Laplace-smoothed (+0.5 per class per bin, the
    standard half-count) so empty classes stay finite; args are SQL
    sub-expressions for DOUBLE-cast counts."""
    return f"LN((({g} + 0.5) / {tg}) / (({b} + 0.5) / {tb}))"


_WOE = _woe_sql(
    "CAST(n_good AS DOUBLE)", "CAST(n_bad AS DOUBLE)",
    "CAST(tg AS DOUBLE)", "CAST(tb AS DOUBLE)",
)
_IV_TERM = (
    "((CAST(n_good AS DOUBLE) + 0.5) / CAST(tg AS DOUBLE) - "
    f"(CAST(n_bad AS DOUBLE) + 0.5) / CAST(tb AS DOUBLE)) * {_WOE}"
)

_WOE_BINS = [
    ("priority", "o_orderpriority"),
    # STRING, not VARCHAR: Spark needs a length on VARCHAR casts, and
    # DuckDB accepts STRING as a VARCHAR alias — the one spelling both
    # engines parse.
    ("month", "CAST(EXTRACT(month FROM o_orderdate) AS STRING)"),
    ("price_tier",
     "CAST(LEAST(9, CAST(FLOOR(o_totalprice / 50000) AS BIGINT)) "
     "AS STRING)"),
]


@query(
    "woe_information_value",
    oracle=f"""
    WITH fb AS (
      {" UNION ALL ".join(
          f'''SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                 AS bad, '{name}' AS feature, {bin_sql} AS bin
              FROM orders'''
          for name, bin_sql in _WOE_BINS
      )}
    ),
    h AS (
      SELECT feature, bin,
             CAST(COUNT(*) FILTER (WHERE bad = 0) AS BIGINT) AS n_good,
             CAST(COUNT(*) FILTER (WHERE bad = 1) AS BIGINT) AS n_bad
      FROM fb GROUP BY 1, 2
    ),
    c AS (
      SELECT *,
             CAST(SUM(n_good) OVER (PARTITION BY feature) AS BIGINT)
               AS tg,
             CAST(SUM(n_bad) OVER (PARTITION BY feature) AS BIGINT)
               AS tb
      FROM h
    ),
    s AS (
      SELECT feature, bin, n_good, n_bad,
             ROUND({_WOE}, 6) AS woe,
             {_IV_TERM} AS iv_term
      FROM c
    )
    SELECT feature, bin, n_good, n_bad, woe,
           ROUND(iv_term, 6) AS iv_term,
           ROUND(SUM(iv_term) OVER (PARTITION BY feature), 6)
             AS iv_feature
    FROM s
    """,
)
def woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value feature screen — the
    credit-scoring-era test a training pipeline still runs before
    fitting anything: per candidate feature bin, how differently do
    the two target classes distribute (WOE = ln of the smoothed
    good/bad density ratio), and per feature, how much total
    separation it carries (IV = sum over bins of (dist_good -
    dist_bad) * WOE; < 0.02 is conventionally "useless", > 0.5
    "suspiciously strong" — a leakage tripwire, complementing X248's
    forward-window rule). Target: o_orderstatus = 'F'; features:
    priority, order month, 50k-wide price tier (capped).

    Engine: one scan of orders with a 3-struct explode to (feature,
    bin, bad) cells, map-side-combined groupBy to <= ~30 bins, one
    per-feature window for class totals, then the single-sourced WOE
    and IV expressions (same integer counts, same operation order in
    both engines; LN sits inside the standing ulp-tolerance of the
    6-decimal rounding — the es_weighted_sample precedent).

    Scale: the shuffle carries bins, never orders; the double window
    sum folds <= 12 values per feature, so association-order noise is
    ~1e-16 against a 1e-6 rounding grid."""
    t = load_tables(spark, sf_dir)
    cells = t.orders.select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("bad"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(name).alias("feature"),
                    F.expr(bin_sql).alias("bin"),
                )
                for name, bin_sql in _WOE_BINS
            ])
        ).alias("fb"),
    ).select("bad", "fb.feature", "fb.bin")
    h = cells.groupBy("feature", "bin").agg(
        F.sum(F.when(F.col("bad") == 0, 1).otherwise(0)).alias("n_good"),
        F.sum(F.when(F.col("bad") == 1, 1).otherwise(0)).alias("n_bad"),
    )
    w_all = Window.partitionBy("feature")
    c = h.select(
        "feature",
        "bin",
        "n_good",
        "n_bad",
        F.sum("n_good").over(w_all).cast("long").alias("tg"),
        F.sum("n_bad").over(w_all).cast("long").alias("tb"),
    )
    s = c.select(
        "feature",
        "bin",
        "n_good",
        "n_bad",
        F.round(F.expr(_WOE), 6).alias("woe"),
        F.expr(_IV_TERM).alias("iv_term"),
    )
    return s.select(
        "feature",
        "bin",
        "n_good",
        "n_bad",
        "woe",
        F.round("iv_term", 6).alias("iv_term"),
        F.round(F.sum("iv_term").over(w_all), 6).alias("iv_feature"),
    )
