"""Deterministic hash-based sampling — training-data-pipeline extension.

The reference has no sampling surface; a 100 TB curation pipeline needs
one constantly (corpus subsetting, per-source rebalancing, held-out
splits). Spark's ``TABLESAMPLE`` / ``df.sample`` are seeded per-partition
and NOT stable across partition counts or reruns, so a pipeline built on
them can't reproduce a training set. We sample by hashing a stable key
(`hash64(doc_id) mod D < rate*D`): rerun-stable, partition-layout-
independent, uniformly spread (md5 avalanche), and pushed to each row
with zero shuffle — the filter evaluates inside the scan stage. The
DuckDB oracle replays the identical hash, so the check validates the
construction bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seng550_a3_etl_spark.catalog import load_tables
from seng550_a3_etl_spark.functions.hashing import duck_hash64, hash64
from seng550_a3_etl_spark.suite.registry import query

_DENOM = 10_000  # rate granularity: 1/10000


@query(
    "uniform_doc_sample",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {duck_hash64("CAST(doc_id AS VARCHAR)", seed=7)} % {_DENOM} < 2000
    """,
)
def uniform_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20% uniform sample of the corpus by stable key hash.

    Scale: a pure per-row filter — no shuffle, no sort, no sampling
    state; at 100 TB it runs inside the parquet scan stage and the
    selected set is identical regardless of cluster size or file split.
    """
    t = load_tables(spark, sf_dir)
    bucket = hash64(F.col("doc_id").cast("string"), seed=7) % _DENOM
    return t.documents.filter(bucket < 2000).select("doc_id", "lang", "source")


# Per-language keep-rates (basis points of _DENOM): downsample the
# dominant language, keep the tail whole — the standard rebalancing move
# when mixing a multilingual training corpus.
_RATES = {"en": 2500, "fr": 7500, "de": 7500}
_DEFAULT_RATE = _DENOM  # unknown langs kept entirely


@query(
    "stratified_doc_sample",
    oracle=f"""
    WITH rates(lang, rate) AS (VALUES {", ".join(f"('{k}', {v})" for k, v in _RATES.items())})
    SELECT d.lang,
           COUNT(*) AS n_sampled,
           CAST(SUM(d.n_chars) AS BIGINT) AS sampled_chars
    FROM documents d LEFT JOIN rates r ON d.lang = r.lang
    WHERE {duck_hash64("CAST(d.doc_id AS VARCHAR)", seed=11)} % {_DENOM}
          < COALESCE(r.rate, {_DEFAULT_RATE})
    GROUP BY d.lang
    """,
)
def stratified_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-language) hash sample, reported per stratum.

    The rate table is broadcast (it is tiny by construction); the hash
    filter again evaluates row-local inside the scan, so stratification
    adds no shuffle over the uniform case. Per-stratum counts verify
    both the join and every stratum's threshold.
    """
    t = load_tables(spark, sf_dir)
    spark_rates = spark.createDataFrame(
        list(_RATES.items()), "lang string, rate int"
    )
    bucket = hash64(F.col("doc_id").cast("string"), seed=11) % _DENOM
    return (
        t.documents.join(F.broadcast(spark_rates), "lang", "left")
        .filter(bucket < F.coalesce(F.col("rate"), F.lit(_DEFAULT_RATE)))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("sampled_chars"),
        )
    )


@query(
    "per_source_doc_sample",
    oracle=f"""
    SELECT source, doc_id, n_chars FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {duck_hash64("CAST(doc_id AS VARCHAR)", seed=13)},
                        doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 10
    """,
)
def per_source_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size per-group sample (X60): exactly
    min(k, group size) docs per source, chosen by stable key hash — the
    bounded per-domain eval subset every curation pipeline carves out.
    Hash order makes the choice uniform AND rerun/layout-stable (a
    seeded df.sample is neither); the doc_id tiebreak makes it total.

    Scale: one shuffle on the group key + a per-group sort that a
    row_number top-k prunes early (rank pushdown); the sampled set never
    changes when the corpus is repartitioned or appended-to elsewhere.
    """
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(
        hash64(F.col("doc_id").cast("string"), seed=13), "doc_id"
    )
    return (
        t.documents.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("source", "doc_id", "n_chars")
    )


_ES_SEED = 31
_ES_K = 20
_ES_POW60 = 1152921504606846976.0  # 2^60 as an exact double constant


@query(
    "es_weighted_sample",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars,
           ROUND(LN(({duck_hash64("CAST(doc_id AS VARCHAR)", seed=_ES_SEED)}
                     + 1) / {_ES_POW60}) / n_chars, 9) AS es_key
    FROM documents
    WHERE n_chars > 0
    ORDER BY LN(({duck_hash64("CAST(doc_id AS VARCHAR)", seed=_ES_SEED)}
                 + 1) / {_ES_POW60}) / n_chars DESC, doc_id
    LIMIT {_ES_K}
    """,
)
def es_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size weighted sampling without replacement (X101,
    Efraimidis–Spirakis A-ES): each doc draws key ln(u)/w from a
    hash-derived uniform u and its weight w = n_chars; the top-k keys
    ARE a weighted sample without replacement of exactly k items —
    the op that fills a fixed token budget with inclusion probability
    proportional to size, where X45's Bernoulli keep-probability
    yields a RANDOM-sized sample. The hash-uniform makes the "random"
    keys deterministic and rerun/partition-stable, so even the sample
    membership is oracle-checked (u = (h+1)/2^60 ∈ (0,1], computed
    with the identical double constant in both engines; ordering uses
    the UNROUNDED key, the emitted key is display-rounded).

    Scale: key assignment is scan-stage arithmetic; the top-k is
    TakeOrdered (per-partition heaps + driver merge of k rows) —
    never a global sort; no sampling state, any executor count."""
    t = load_tables(spark, sf_dir)
    u = (
        hash64(F.col("doc_id").cast("string"), seed=_ES_SEED) + 1
    ) / F.lit(_ES_POW60)
    key = F.log(u) / F.col("n_chars")
    return (
        t.documents.filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            key.alias("__k"),
        )
        .orderBy(F.desc("__k"), F.asc("doc_id"))
        .limit(_ES_K)
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.round("__k", 9).alias("es_key"),
        )
    )


_ES_STRAT_K = 4


@query(
    "es_stratified_sample",
    oracle=f"""
    SELECT doc_id, source, n_chars, CAST(rk AS INT) AS rk
    FROM (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY LN(({duck_hash64("CAST(doc_id AS VARCHAR)",
                                         seed=_ES_SEED)}
                            + 1) / {_ES_POW60}) / n_chars DESC, doc_id
             ) AS rk
      FROM documents WHERE n_chars > 0
    ) WHERE rk <= {_ES_STRAT_K}
    """,
)
def es_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum fixed-size weighted sampling (X110): exactly k docs
    PER SOURCE, weight-proportional within each stratum — the
    per-domain quota draw a mixture-controlled training set needs
    (X101's global top-k cannot guarantee any per-source count; X73
    budgets tokens but samples Bernoulli). Same Efraimidis–Spirakis
    keys, same hash-derived determinism, but the selection is a
    per-group top-k: one shuffle on source, per-group heaps via the
    rank window — group count bounds state, never a global sort. At
    100 TB strata are handled independently, so a hot source cannot
    starve the others' quotas."""
    t = load_tables(spark, sf_dir)
    u = (
        hash64(F.col("doc_id").cast("string"), seed=_ES_SEED) + 1
    ) / F.lit(_ES_POW60)
    key = F.log(u) / F.col("n_chars")
    w = Window.partitionBy("source").orderBy(F.desc("__k"), F.asc("doc_id"))
    return (
        t.documents.filter(F.col("n_chars") > 0)
        .select("doc_id", "source", "n_chars", key.alias("__k"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _ES_STRAT_K)
        .select("doc_id", "source", "n_chars", F.col("rk").cast("int").alias("rk"))
    )


_N_SHARDS = 64
_SHARD_SEED = 13

# The X172 shard-assignment rule — SINGLE source of truth for both
# engines (review r13: the checksum census had re-inlined it; the
# integrity fingerprint MUST shard exactly as the skew report audits,
# so both queries now read these two definitions). Non-negative via
# the double-mod identity, bit-identical in both engines.
_SHARD_SQL = (
    f"(({duck_hash64('CAST(doc_id AS VARCHAR)', seed=_SHARD_SEED)}"
    f" % {_N_SHARDS}) + {_N_SHARDS}) % {_N_SHARDS}"
)


def _shard_col():
    return (
        (hash64(F.col("doc_id").cast("string"), seed=_SHARD_SEED)
         % _N_SHARDS)
        + _N_SHARDS
    ) % _N_SHARDS


@query(
    "shard_skew_report",
    oracle=rf"""
    WITH assigned AS (
      SELECT doc_id,
             {_SHARD_SQL} AS shard_id,
             len(string_split_regex(text, '\s+')) AS n_toks
      FROM documents
    ),
    tot AS (SELECT SUM(n_toks) AS total_toks FROM assigned)
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           CAST(MAX(n_toks) AS BIGINT) AS max_doc_tokens,
           CAST(CAST(SUM(n_toks) AS HUGEINT) * 1000000 // total_toks
                AS BIGINT) AS token_share_ppm
    FROM assigned, tot
    GROUP BY shard_id, total_toks
    """,
)
def shard_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard balance census (X172): assign every document to
    one of 64 hash shards (the X32 writer's assignment rule made
    queryable) and report per-shard doc count, token mass, largest
    document, and token share in exact ppm — the pre-flight check
    before a training run, where one hot shard stalls every data-
    parallel worker at the epoch barrier. The hash shard id is
    non-negative via the double-mod identity, bit-identical in both
    engines.

    Scale: one scan with per-row hashing + ONE 64-group aggregate with
    map-side combine; the corpus token total broadcasts back as a
    scalar. Nothing corpus-sized shuffles."""
    toks = F.size(F.split(F.col("text"), r"\s+")).cast("long")
    t = load_tables(spark, sf_dir)
    assigned = t.documents.select(
        _shard_col().alias("shard_id"), toks.alias("n_toks")
    )
    tot = assigned.agg(F.sum("n_toks").alias("total_toks"))
    return (
        assigned.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.max("n_toks").cast("long").alias("max_doc_tokens"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "shard_id",
            "n_docs",
            "n_tokens",
            "max_doc_tokens",
            # DECIMAL(38,0) numerator: n_tokens*1e6 wraps int64 at the
            # ~1e13-token operating point (Spark wraps silently where
            # DuckDB errors) — the X137 overflow class, oracle HUGEINT.
            F.expr(
                "CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000000"
                " DIV total_toks AS LONG)"
            ).alias("token_share_ppm"),
        )
    )


# Mixture-allocation knobs (X203): per-source target weight derived
# from the source index (a deterministic stand-in for the mixture
# config a training run supplies), and the token budget as a fraction
# of the corpus (half — large enough that popular sources hit their
# availability and the waterfilling pass actually redistributes).
_MIX_W = "(CAST(substring(source, 4) AS INT) % 4 + 1)"


@query(
    "mixture_budget_allocation",
    oracle=f"""
    WITH avail AS (
      SELECT source,
             CAST(SUM(len(string_split_regex(text, '\\s+'))) AS BIGINT)
               AS a
      FROM documents GROUP BY source
    ),
    w AS (SELECT source, a, {_MIX_W} AS wt FROM avail),
    tot AS (
      SELECT SUM(a) AS ta, SUM(wt) AS tw, SUM(a) // 2 AS b FROM w
    ),
    s1 AS (
      SELECT source, a, wt,
             (t.b * wt) // t.tw AS target,
             LEAST(a, (t.b * wt) // t.tw) AS alloc1
      FROM w, tot t
    ),
    s2 AS (
      SELECT SUM(alloc1) AS sa1, SUM(a - alloc1) AS cap FROM s1
    )
    SELECT s1.source,
           CAST(s1.a AS BIGINT) AS available_tokens,
           CAST(s1.target AS BIGINT) AS target_tokens,
           CAST(s1.alloc1
                + LEAST(s1.a - s1.alloc1,
                        (CAST(t.b - s2.sa1 AS HUGEINT)
                         * (s1.a - s1.alloc1))
                          // NULLIF(s2.cap, 0)) AS BIGINT)
             AS allocated_tokens,
           CAST(CAST(s1.alloc1
                 + LEAST(s1.a - s1.alloc1,
                         (CAST(t.b - s2.sa1 AS HUGEINT)
                          * (s1.a - s1.alloc1))
                           // NULLIF(s2.cap, 0)) AS HUGEINT) * 1000000
                // s1.target AS BIGINT) AS fill_ppm
    FROM s1, s2, tot t
    """,
)
def mixture_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture token allocation (X203): given per-source
    available token mass, per-source target weights, and a total token
    budget (half the corpus here), allocate tokens per source —
    proportional to weight, capped at availability, with ONE
    waterfilling pass redistributing the shortfall from capped sources
    to the remaining capacity pro-rata. This is the sampling-weight
    solver every mixture-trained run executes before writing shards
    (the DoReMi/Pile-style "target mixture vs what the corpus actually
    has" reconciliation); ``fill_ppm`` (allocated/target, integer ppm)
    is the per-source health number — below 1e6 means the corpus
    cannot deliver that source's target even after redistribution.

    Determinism: every step is integer floor arithmetic (``DIV``) on
    token counts — no engine floats anywhere.

    Scale: ONE corpus scan folds to the |sources| availability rollup;
    everything after is arithmetic on that rollup joined against two
    broadcast scalar rows. The redistribution is one pass (the
    production loop iterates to fixpoint; one pass is the documented
    demo depth — further passes are the same 3-line stage)."""
    t = load_tables(spark, sf_dir)
    # Pinned: FOUR consumers (tot, s1, s2, final) branch off this
    # |sources|-row rollup — unpinned, each branch re-scanned the
    # corpus (plan audit: 4 scans for numbers derivable from 20 rows).
    avail = (
        t.documents.groupBy("source")
        .agg(
            F.sum(F.size(F.split(F.col("text"), r"\s+")))
            .cast("long")
            .alias("a")
        )
        .withColumn("wt", F.expr(_MIX_W))
        .localCheckpoint(eager=True)
    )
    tot = avail.agg(
        F.sum("a").alias("ta"),
        F.sum("wt").alias("tw"),
        F.expr("SUM(a) DIV 2").alias("b"),
    )
    s1 = avail.crossJoin(F.broadcast(tot)).select(
        "source",
        "a",
        "wt",
        "b",
        F.expr("(b * wt) DIV tw").alias("target"),
        F.expr("LEAST(a, (b * wt) DIV tw)").alias("alloc1"),
    )
    s2 = s1.agg(
        F.sum("alloc1").alias("sa1"),
        F.sum(F.col("a") - F.col("alloc1")).alias("cap"),
    )
    # DECIMAL(38,0) / HUGEINT on the waterfill product and the ppm
    # numerator: shortfall x residual-capacity reaches ~1e25 and
    # alloc*1e6 ~1e19 at the ~1e13-token operating point — the X137
    # overflow class (Spark wraps silently where DuckDB errors).
    alloc = F.expr(
        "alloc1 + LEAST(a - alloc1,"
        " CAST(CAST(b - sa1 AS DECIMAL(38,0)) * (a - alloc1)"
        " DIV NULLIF(cap, 0) AS LONG))"
    )
    return s1.crossJoin(F.broadcast(s2)).select(
        "source",
        F.col("a").cast("long").alias("available_tokens"),
        F.col("target").cast("long").alias("target_tokens"),
        alloc.cast("long").alias("allocated_tokens"),
        alloc.cast("decimal(38,0)").alias("__num"),
        "target",
    ).select(
        "source",
        "available_tokens",
        "target_tokens",
        "allocated_tokens",
        F.expr("CAST(__num * 1000000 DIV target AS LONG)").alias(
            "fill_ppm"
        ),
    )


@query(
    "source_temperature_mix",
    oracle=r"""
    WITH n AS (
      SELECT source,
             CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT)
               AS n_tok
      FROM documents GROUP BY source
    ),
    q AS (
      SELECT source, n_tok,
             CAST(ROUND(SQRT(n_tok) * 1000000) AS BIGINT) AS s_micro,
             CAST(n_tok AS HUGEINT) * n_tok AS n_sq
      FROM n
    ),
    tot AS (SELECT SUM(n_tok) AS t1, SUM(s_micro) AS th, SUM(n_sq) AS t2
            FROM q)
    SELECT source, n_tok,
           CAST(CAST(s_micro AS HUGEINT) * 1000000 // th AS BIGINT)
             AS w_t05_ppm,
           CAST(CAST(n_tok AS HUGEINT) * 1000000 // t1 AS BIGINT)
             AS w_t10_ppm,
           CAST(n_sq * 1000000 // t2 AS BIGINT) AS w_t20_ppm
    FROM q, tot
    """,
)
def source_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed source sampling weights (X217): the
    multinomial mixture p_i ∝ n_i^T every multi-source pretraining run
    tunes (mT5/XLM-R's alpha, the Pile's per-set epochs) reported at
    T ∈ {0.5, 1, 2} — flattening (0.5) boosts small sources, 1 is
    proportional, 2 sharpens toward the head. Exponents are chosen so
    every weight is ENGINE-EXACT: T=1 is the raw integer count, T=2 an
    exact integer square (HUGEINT/DECIMAL(38,0) — n² wraps int64 near
    the 1e13-token operating point), and T=0.5 the IEEE-exact sqrt
    quantized to integer micros BEFORE the sum, so no float ever sums
    in either engine (the X137 determinism pattern); a float pow(n, T)
    would differ across libm implementations.

    Scale: ONE corpus scan folds to the |sources| rollup; the three
    normalizations are arithmetic against one broadcast scalar row.

    Reference parity: the reference has no sampling surface at all
    (SURVEY §2.10) — this extends the X203 mixture family."""
    t = load_tables(spark, sf_dir)
    n = (
        t.documents.groupBy("source")
        .agg(
            F.sum(F.size(F.split(F.col("text"), r"\s+")))
            .cast("long")
            .alias("n_tok")
        )
        .localCheckpoint(eager=True)  # tot + final both read this
    )
    q = n.select(
        "source",
        "n_tok",
        F.round(F.sqrt(F.col("n_tok")) * 1_000_000)
        .cast("long")
        .alias("__s"),
        (F.col("n_tok").cast("decimal(38,0)") * F.col("n_tok")).alias("__n2"),
    )
    tot = q.agg(
        F.sum("n_tok").alias("__t1"),
        F.sum("__s").alias("__th"),
        F.sum("__n2").alias("__t2"),
    )
    return q.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tok",
        F.expr(
            "CAST(CAST(__s AS DECIMAL(38,0)) * 1000000 DIV __th AS LONG)"
        ).alias("w_t05_ppm"),
        F.expr(
            "CAST(CAST(n_tok AS DECIMAL(38,0)) * 1000000 DIV __t1 AS LONG)"
        ).alias("w_t10_ppm"),
        F.expr("CAST(__n2 * 1000000 DIV __t2 AS LONG)").alias("w_t20_ppm"),
    )


_SHARD_SEED = 13
_R16 = 1 << 56  # 2^60-bit hash space / 16 shards
_R32 = 1 << 55  # / 32 shards


def _reshard_oracle() -> str:
    h = duck_hash64("CAST(doc_id AS VARCHAR)", seed=_SHARD_SEED)
    legs = []
    for scheme, shard, moved in (
        ("mod", f"({h}) % 32", f"(({h}) % 32) <> (({h}) % 16)"),
        (
            "range",
            f"({h}) // {_R32}",
            f"((({h}) // {_R32}) // 2) <> (({h}) // {_R16})",
        ),
    ):
        legs.append(
            f"SELECT '{scheme}' AS scheme, {shard} AS shard, "
            f"CAST({moved} AS INT) AS moved FROM documents"
        )
    union = " UNION ALL ".join(legs)
    return f"""
    WITH ex AS ({union}),
    per AS (
      SELECT scheme, shard, COUNT(*) AS n, SUM(moved) AS m
      FROM ex GROUP BY scheme, shard
    )
    SELECT scheme,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(SUM(m) AS BIGINT) AS n_moved,
           CAST(CAST(SUM(m) AS HUGEINT) * 1000000 // SUM(n) AS BIGINT)
             AS churn_ppm,
           CAST(COUNT(*) AS BIGINT) AS n_shards_hit,
           CAST(MAX(n) AS BIGINT) AS max_shard_docs,
           CAST(MIN(n) AS BIGINT) AS min_shard_docs,
           CAST(CAST(MAX(n) AS HUGEINT) * 32 * 1000000 // SUM(n)
                AS BIGINT) AS max_skew_ppm
    FROM per GROUP BY scheme
    """


@query("reshard_churn_census", oracle=_reshard_oracle())
def reshard_churn_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resharding churn census (X237) — what it costs to grow a
    16-shard corpus layout to 32 shards under the two standard
    key-sharding schemes, measured on the real key distribution:
    ``mod`` (shard = h % n — moves ~half of every shard's docs on ANY
    shard-count change, the classic rebalancing stampede) vs ``range``
    (shard = h DIV (keyspace/n) — each shard SPLITS into exactly two
    children, so zero docs cross an old shard boundary; the
    consistent-hashing property without a ring, and why storage
    systems shard by hash RANGE). Per scheme: doc count, docs whose
    32-shard home is outside their 16-shard home's split image,
    exact churn ppm, shards hit, max/min shard occupancy at 32, and
    max skew ppm (max · 32 / n) — the balance check that decides
    whether the scheme's stability is worth its skew.

    Scale: the shard id is a scan-stage hash fold (zero shuffle); the
    census is a 64-group map-side rollup then a 2-row fold. The churn
    number is what a 100 TB re-layout would physically move — the
    operator prices the migration before anyone runs it.

    Reference parity: none; extends the X58/X131 shard-layout family."""
    t = load_tables(spark, sf_dir)
    h = hash64(F.col("doc_id").cast("string"), seed=_SHARD_SEED)
    ex = t.documents.select(h.alias("h")).select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("mod").alias("scheme"),
                    (F.col("h") % 32).alias("shard"),
                    ((F.col("h") % 32) != (F.col("h") % 16))
                    .cast("int")
                    .alias("moved"),
                ),
                F.struct(
                    F.lit("range").alias("scheme"),
                    F.expr(f"h DIV {_R32}").alias("shard"),
                    F.expr(
                        f"(h DIV {_R32}) DIV 2 != h DIV {_R16}"
                    )
                    .cast("int")
                    .alias("moved"),
                ),
            )
        ).alias("s")
    ).select("s.scheme", "s.shard", "s.moved")
    per = ex.groupBy("scheme", "shard").agg(
        F.count(F.lit(1)).alias("n"), F.sum("moved").alias("m")
    )
    return per.groupBy("scheme").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.sum("m").cast("long").alias("n_moved"),
        F.expr(
            "CAST(CAST(sum(m) AS DECIMAL(38,0)) * 1000000 DIV sum(n) "
            "AS LONG)"
        ).alias("churn_ppm"),
        F.count(F.lit(1)).cast("long").alias("n_shards_hit"),
        F.max("n").cast("long").alias("max_shard_docs"),
        F.min("n").cast("long").alias("min_shard_docs"),
        F.expr(
            "CAST(CAST(max(n) AS DECIMAL(38,0)) * 32 * 1000000 "
            "DIV sum(n) AS LONG)"
        ).alias("max_skew_ppm"),
    )


_EPOCH_BUDGET_X = 3  # token budget as a multiple of the corpus
_EPOCH_CLIFF_PPM = 4_000_000  # Muennighoff et al.: ~4 epochs


@query(
    "epoch_plan_budget",
    oracle=rf"""
    WITH n AS (
      SELECT source,
             CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT)
               AS n_tok
      FROM documents GROUP BY source
    ),
    q AS (
      SELECT source, n_tok,
             CAST(ROUND(SQRT(n_tok) * 1000000) AS BIGINT) AS s_micro
      FROM n
    ),
    tot AS (SELECT SUM(n_tok) AS t1, SUM(s_micro) AS th FROM q)
    SELECT source, n_tok AS n_tokens,
           CAST(CAST(s_micro AS HUGEINT) * 1000000 // th AS BIGINT)
             AS weight_ppm,
           CAST(CAST(t1 AS HUGEINT) * {_EPOCH_BUDGET_X} * s_micro // th
                AS BIGINT) AS target_tokens,
           CAST(CAST(t1 AS HUGEINT) * {_EPOCH_BUDGET_X} * s_micro // th
                * 1000000 // n_tok AS BIGINT) AS epochs_ppm,
           CAST(t1 AS HUGEINT) * {_EPOCH_BUDGET_X} * s_micro // th
             * 1000000 // n_tok > {_EPOCH_CLIFF_PPM}
             AS over_repetition_cliff
    FROM q, tot
    """,
)
def epoch_plan_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget epoch planner (X241) — the table a pretraining
    run reads AFTER choosing its mixture: given a total token budget
    (3× the corpus here — the data-constrained regime) and the T=0.5
    temperature weights (X217's engine-exact sqrt micros), the
    per-source target token draw, the implied EPOCH count over that
    source's available tokens (exact ppm), and the Muennighoff et al.
    2023 repetition-cliff flag (>4 epochs: returns decay to ~zero —
    the source cannot fill its allocation and the mix must rebalance,
    X203's waterfilling being the repair). Flattening temperatures
    oversample small sources BY DESIGN; this census prices exactly
    which sources that pushes off the cliff before any training run
    pays for the lesson.

    Scale: ONE corpus scan → |sources| rollup (the X217 scan shape);
    the plan arithmetic runs against one broadcast scalar row in
    DECIMAL(38,0)/HUGEINT (budget·s_micro reaches ~1e25 at the 1e13-
    token operating point — the X137 overflow class) down to
    truncating divisions, so both engines agree bit-for-bit.

    Reference parity: none; closes the X217 → X203 mixture loop with
    the epoch-exposure artifact between them."""
    t = load_tables(spark, sf_dir)
    n = (
        t.documents.groupBy("source")
        .agg(
            F.sum(F.size(F.split(F.col("text"), r"\s+")))
            .cast("long")
            .alias("n_tokens")
        )
        .localCheckpoint(eager=True)
    )
    q = n.select(
        "source",
        "n_tokens",
        F.round(F.sqrt(F.col("n_tokens")) * 1_000_000)
        .cast("long")
        .alias("__s"),
    )
    tot = q.agg(F.sum("n_tokens").alias("__t1"), F.sum("__s").alias("__th"))
    target = (
        f"CAST(__t1 AS DECIMAL(38,0)) * {_EPOCH_BUDGET_X} * __s DIV __th"
    )
    epochs = f"({target}) * 1000000 DIV n_tokens"
    return q.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.expr(
            "CAST(CAST(__s AS DECIMAL(38,0)) * 1000000 DIV __th AS LONG)"
        ).alias("weight_ppm"),
        F.expr(f"CAST({target} AS LONG)").alias("target_tokens"),
        F.expr(f"CAST({epochs} AS LONG)").alias("epochs_ppm"),
        F.expr(f"{epochs} > {_EPOCH_CLIFF_PPM}").alias(
            "over_repetition_cliff"
        ),
    )


@query(
    "shard_checksum_census",
    oracle=rf"""
    WITH assigned AS (
      SELECT doc_id,
             {_SHARD_SQL} AS shard_id,
             {duck_hash64("text")} AS h,
             len(string_split_regex(text, '\s+')) AS n_toks
      FROM documents
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(bit_xor(h) AS BIGINT) AS content_xor,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM assigned
    GROUP BY shard_id
    """,
)
def shard_checksum_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed shard fingerprint census (X243) — the
    reproducibility audit for a sharded training corpus: per X172
    hash shard, the document count, token mass, id range, and an
    ORDER-INSENSITIVE content checksum (bit_xor of the 60-bit text
    hash). Two corpus copies that should be identical — a re-run of
    the writer, a replicated bucket, a restored backup — compare as
    64 fingerprint rows instead of a corpus-sized diff; any silent
    mutation (a re-crawled doc, an encoding fix applied to one copy,
    a lost row) flips its shard's checksum. XOR is the right fold
    because it is commutative/associative (partition-order-free, so
    the fingerprint is stable under any file layout or cluster size
    — same reason the X61 money sums quantize first), self-inverse
    (a doc removed AND re-added cancels exactly), and stays in one
    int64 at any corpus size where a decimal SUM would need 128-bit
    headroom.

    Scale: one scan with per-row hashing folded in the scan stage +
    ONE 64-group aggregate with map-side combine — at 100 TB each
    executor reduces its splits to 64 partial rows before any
    shuffle. Nothing corpus-sized moves.

    Reference parity: none; extends the X172/X237 shard surface with
    the integrity half (the reference's closest analog is its
    row-count load verification, /root/reference/etl.py:214-218)."""
    t = load_tables(spark, sf_dir)
    assigned = t.documents.select(
        _shard_col().alias("shard_id"),
        "doc_id",
        hash64(F.col("text")).alias("h"),
        F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("n_toks"),
    )
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("bit_xor(h)").cast("long").alias("content_xor"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
    )
