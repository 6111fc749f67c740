"""Language-model corpus statistics (extensions X117-X125, X129,
X143): the tokenizer-design and LM-estimation layer of a pretraining
pipeline — token entropy, vocabulary coverage, BM25 retrieval (and its
RRF fusion with the embedding ranking), a bigram LM table, the BPE
pair-merge step, per-source template n-grams, length-skew Gini,
lang-source mutual information, and token PMI — all distributed and
DuckDB-oracle-checked.

Tokenization matches the rest of the text suite (whitespace split; the
documents fixture is space-separated). Queries that need clean tokens
filter the empty strings a trailing/leading whitespace split produces —
mirrored on both engines. Log-domain scores (entropy, BM25, bigram
logprob) accept the suite's standing float rule: engines may differ in
the last ulp of ``ln``/``log2``, ~1e-12 relative, far inside the 4-
decimal rounding used for the hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seng550_a3_etl_spark.catalog import load_tables
from seng550_a3_etl_spark.functions.text import shingles, tokens
from seng550_a3_etl_spark.suite.registry import query
from seng550_a3_etl_spark.suite.text import _duck_shingles

# Clean (empty-filtered) tokens, both engines.
_DUCK_CTOKS = (
    r"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"
)


def _ctoks(text: Column) -> Column:
    return F.filter(tokens(text), lambda x: x != "")


@query(
    "source_token_entropy",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({_DUCK_CTOKS}) AS t FROM documents
    ),
    freq AS (
      SELECT source, t, COUNT(*) AS c FROM tok GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           ROUND(log2(CAST(SUM(c) AS DOUBLE))
                 - SUM(c * log2(CAST(c AS DOUBLE)))
                   / CAST(SUM(c) AS DOUBLE), 4) AS entropy_bits,
           ROUND((log2(CAST(SUM(c) AS DOUBLE))
                  - SUM(c * log2(CAST(c AS DOUBLE)))
                    / CAST(SUM(c) AS DOUBLE))
                 / log2(CAST(COUNT(*) AS DOUBLE)), 4) AS norm_entropy
    FROM freq GROUP BY source
    """,
)
def source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X117 — Shannon entropy of each source's token distribution, in
    bits, plus the vocab-normalized form H/log2(V) in [0,1]: the
    standard diversity gauge for spotting template-heavy or
    mode-collapsed sources before they enter a training mix (low
    normalized entropy = a few tokens dominate).

    Uses the one-pass identity H = log2(N) - Σc·log2(c)/N so a single
    (source, token) count rollup feeds one aggregate — no second scan
    for N. Scale: one explode + one map-side-combined shuffle on
    (source, token); the entropy fold is |vocab per source| rows.
    """
    t = load_tables(spark, sf_dir)
    freq = (
        t.documents.select(
            "source", F.explode(_ctoks(F.col("text"))).alias("t")
        )
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c").cast("double")
    plogp = F.sum(F.col("c") * F.log2(F.col("c").cast("double")))
    h = F.log2(n) - plogp / n
    return freq.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.round(h, 4).alias("entropy_bits"),
        F.round(
            h / F.log2(F.count(F.lit(1)).cast("double")), 4
        ).alias("norm_entropy"),
    )


_COVERAGE_KS = (1, 2, 4, 8, 16, 32, 64)


@query(
    "vocab_coverage_curve",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_DUCK_CTOKS}) AS t FROM documents
    ),
    freq AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
    ranked AS (
      SELECT c,
             ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rn,
             SUM(c) OVER (ORDER BY c DESC, t
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum,
             SUM(c) OVER () AS total,
             COUNT(*) OVER () AS vocab
      FROM freq
    )
    SELECT k,
           CAST(least(k, r.vocab) AS BIGINT) AS topk_vocab,
           ROUND(CAST(r.cum AS DOUBLE) / r.total, 6) AS coverage
    FROM (VALUES {", ".join(f"({k})" for k in _COVERAGE_KS)}) ks(k)
    JOIN ranked r ON r.rn = least(ks.k, r.vocab)
    """,
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X118 — vocabulary coverage curve: for each candidate vocab size
    k, the fraction of all token OCCURRENCES covered by the k most
    frequent types (ties broken lexically) — the curve a tokenizer
    design reads to pick its vocab size / budget OOV rate.

    Scale: the corpus reduces to a (token, count) rollup in one
    shuffle; the ranking window then runs over |vocab| rows — bounded
    by the type inventory (Heaps' law, sublinear in corpus size), not
    by tokens — so the unpartitioned cumulative window is safe by the
    same window-over-rollup argument as daily_revenue_rolling. k
    beyond the vocab clamps to the full-vocab row (coverage 1.0).
    """
    t = load_tables(spark, sf_dir)
    freq = (
        t.documents.select(F.explode(_ctoks(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_ord = Window.orderBy(F.col("c").desc(), F.col("t"))
    w_all = Window.partitionBy()
    ranked = freq.select(
        F.row_number().over(w_ord).alias("rn"),
        F.sum("c")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("c").over(w_all).alias("total"),
        F.count(F.lit(1)).over(w_all).alias("vocab"),
    )
    ks = spark.createDataFrame(
        [(k,) for k in _COVERAGE_KS], "k int"
    )
    return (
        F.broadcast(ks)
        .join(ranked, F.col("rn") == F.least("k", "vocab"))
        .select(
            "k",
            F.least("k", "vocab").cast("long").alias("topk_vocab"),
            F.round(
                F.col("cum").cast("double") / F.col("total"), 6
            ).alias("coverage"),
        )
    )


_BM25_TERMS = ("spark", "join", "vector")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPN = 20


@query(
    "bm25_doc_scores",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, {_DUCK_CTOKS} AS t FROM documents
    ),
    lens AS (SELECT doc_id, len(t) AS dl FROM docs),
    stats AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM lens
    ),
    tf AS (
      SELECT doc_id, t AS term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS t FROM docs)
      WHERE t IN {_BM25_TERMS!r}
      GROUP BY 1, 2
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             SUM(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * ({_BM25_K1} + 1)
                 / (tf.tf + {_BM25_K1}
                    * (1 - {_BM25_B}
                       + {_BM25_B} * l.dl / s.avgdl))) AS score
      FROM tf
      JOIN df USING (term)
      JOIN lens l USING (doc_id)
      CROSS JOIN stats s
      GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(score, 4) AS bm25
    FROM scored ORDER BY ROUND(score, 4) DESC, doc_id LIMIT {_BM25_TOPN}
    """,
)
def bm25_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X119 — BM25 ranked retrieval (Robertson-Spärck Jones) for a
    fixed query, top-20 documents: the lexical-retrieval
    baseline every RAG/hybrid stack needs next to the embedding path
    (X6 cosine / X67 RRF hybrid). Classic parameters k1=1.2, b=0.75;
    idf = ln(1 + (N-df+0.5)/(df+0.5)).

    Scale: two column-pruned corpus scans total — one folds to the
    1-row (N, avgdl) stats broadcast, the other computes term
    frequencies for the query's terms only (the filter runs before the
    shuffle) with the doc length CARRIED through the explode, so no
    lens join back. The candidate (doc, term, tf, dl) frame is pinned
    (localCheckpoint) because both the df rollup and the scoring read
    it — without the pin Spark would replay its scan for each. df is a
    |terms|-row broadcast; the final top-n is orderBy+limit — Spark
    plans TakeOrderedAndProject, never a global sort.
    """
    t = load_tables(spark, sf_dir)
    docs = t.documents.select(
        "doc_id", _ctoks(F.col("text")).alias("t")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.size("t")).cast("double") / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    tf = (
        docs.select(
            "doc_id",
            F.size("t").alias("dl"),
            F.explode("t").alias("term"),
        )
        .where(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(idf * F.col("tf") * (_BM25_K1 + 1) / denom).alias(
                "score"
            )
        )
    )
    # Rank-20 cutoff on the ROUNDED score: the raw sum-of-ln score has
    # no cross-engine-stable ordering (two docs within one ulp could
    # swap at the boundary); rounding to the emitted 4dp precision plus
    # the doc_id tiebreak makes membership deterministic (the rational-
    # ratio trick token_pmi_pairs uses is unavailable for a sum of
    # logs, so round-then-tiebreak is the stable basis here).
    return (
        scored.orderBy(F.round("score", 4).desc(), "doc_id")
        .limit(_BM25_TOPN)
        .select("doc_id", F.round("score", 4).alias("bm25"))
    )


_LM_ADD_K = 0.5
_LM_TOPN = 3


@query(
    "bigram_lm_probs",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, {_DUCK_CTOKS} AS t FROM documents
    ),
    bg AS (
      SELECT z[1] AS head, z[2] AS next_tok
      FROM (
        SELECT unnest(list_zip(t[1:len(t) - 1], t[2:len(t)])) AS z
        FROM docs WHERE len(t) >= 2
      )
    ),
    c AS (
      SELECT head, next_tok, COUNT(*) AS c FROM bg GROUP BY 1, 2
    ),
    v AS (
      SELECT COUNT(DISTINCT t) AS v
      FROM (SELECT unnest(t) AS t FROM docs)
    ),
    ch AS (
      SELECT head, next_tok, c,
             SUM(c) OVER (PARTITION BY head) AS head_c,
             ROW_NUMBER() OVER (
               PARTITION BY head ORDER BY c DESC, next_tok
             ) AS rn
      FROM c
    )
    SELECT head, next_tok, c AS pair_count,
           ROUND(ln((c + {_LM_ADD_K})
                    / (head_c + {_LM_ADD_K} * v.v)), 4) AS logp
    FROM ch CROSS JOIN v WHERE rn <= {_LM_TOPN}
    """,
)
def bigram_lm_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X120 — bigram language-model estimation with add-k smoothing
    (k=0.5): per head token, the top-3 continuations and their
    smoothed conditional log-probability ln((c+k)/(c(h)+k·V)) — the
    cheap n-gram LM used for perplexity-style quality filtering (the
    bigram upgrade of X59's unigram logprob scorer; X253
    kneser_ney_bigram is the production smoothing this table's add-k
    approximates).

    Bigram extraction is per-row array arithmetic (two shifted slices
    zipped — no shuffle, no posexplode self-join); the only shuffles
    are the (head, next) count rollup and the vocab distinct. The
    per-head windows run over the bigram-type rollup (≤V² rows,
    vocab-bounded), and V arrives by broadcast.
    """
    t = load_tables(spark, sf_dir)
    docs = t.documents.select(_ctoks(F.col("text")).alias("t")).where(
        F.size("t") >= 2
    )
    pairs = docs.select(
        F.slice(F.col("t"), 1, F.size("t") - 1).alias("h_arr"),
        F.slice(F.col("t"), 2, F.size("t") - 1).alias("w_arr"),
    ).select(F.explode(F.arrays_zip("h_arr", "w_arr")).alias("z"))
    c = (
        pairs.select(
            F.col("z.h_arr").alias("head"),
            F.col("z.w_arr").alias("next_tok"),
        )
        .groupBy("head", "next_tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    v = (
        t.documents.select(
            F.explode(_ctoks(F.col("text"))).alias("t")
        )
        .agg(F.count_distinct("t").alias("v"))
    )
    wh = Window.partitionBy("head")
    wr = Window.partitionBy("head").orderBy(
        F.col("c").desc(), F.col("next_tok")
    )
    ranked = c.select(
        "head",
        "next_tok",
        "c",
        F.sum("c").over(wh).alias("head_c"),
        F.row_number().over(wr).alias("rn"),
    ).where(F.col("rn") <= _LM_TOPN)
    return ranked.crossJoin(F.broadcast(v)).select(
        "head",
        "next_tok",
        F.col("c").alias("pair_count"),
        F.round(
            F.log(
                (F.col("c") + _LM_ADD_K)
                / (F.col("head_c") + _LM_ADD_K * F.col("v"))
            ),
            4,
        ).alias("logp"),
    )


# Interpolated Kneser-Ney: the absolute discount. 0.75 is the textbook
# constant (Chen & Goodman 1999 report the estimate n1/(n1+2*n2) lands
# near it on natural corpora); with integer bigram counts c >= 1 the
# discounted term max(c-d, 0) is simply c-d, so no MAX is needed.
_KN_D = "0.75"
_KN_HEADS = 10
_KN_TOPN = 4


def _kn_lambda_sql(cv: str, n1h: str) -> str:
    """Interpolation weight lambda(v) = d*N1+(v,.)/c(v) as one SQL
    expression both engines parse identically (the _gini_gain_sql
    single-source pattern): same integer inputs, same operation order,
    bit-equal doubles."""
    return f"(({_KN_D} * CAST({n1h} AS DOUBLE)) / CAST({cv} AS DOUBLE))"


def _kn_cont_sql(n1c: str, bt: str) -> str:
    """Continuation probability Pcont(w) = N1+(.,w)/N1+(.,.)."""
    return f"(CAST({n1c} AS DOUBLE) / CAST({bt} AS DOUBLE))"


def _kn_prob_sql(c: str, cv: str, n1h: str, n1c: str, bt: str) -> str:
    """P_KN(w|v) = (c(v,w)-d)/c(v) + lambda(v)*Pcont(w), single-sourced
    into the Spark plan (via F.expr) and the DuckDB oracle."""
    disc = f"((CAST({c} AS DOUBLE) - {_KN_D}) / CAST({cv} AS DOUBLE))"
    return (
        f"({disc} + ({_kn_lambda_sql(cv, n1h)}"
        f" * {_kn_cont_sql(n1c, bt)}))"
    )


@query(
    "kneser_ney_bigram",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, {_DUCK_CTOKS} AS t FROM documents
    ),
    bg AS (
      SELECT z[1] AS head, z[2] AS next_tok
      FROM (
        SELECT unnest(list_zip(t[1:len(t) - 1], t[2:len(t)])) AS z
        FROM docs WHERE len(t) >= 2
      )
    ),
    r AS (
      SELECT head, next_tok, COUNT(*) AS c FROM bg GROUP BY 1, 2
    ),
    heads AS (
      SELECT head, SUM(c) AS cv, COUNT(*) AS n1h FROM r GROUP BY head
    ),
    top_heads AS (
      SELECT * FROM heads ORDER BY cv DESC, head LIMIT {_KN_HEADS}
    ),
    conts AS (
      SELECT next_tok, COUNT(*) AS n1c FROM r GROUP BY next_tok
    ),
    b AS (SELECT COUNT(*) AS bt FROM r),
    ranked AS (
      SELECT r.head, r.next_tok, r.c, h.cv, h.n1h, co.n1c, b.bt,
             ROW_NUMBER() OVER (
               PARTITION BY r.head ORDER BY r.c DESC, r.next_tok
             ) AS rn
      FROM r
      JOIN top_heads h USING (head)
      JOIN conts co USING (next_tok), b
    )
    SELECT head, next_tok, CAST(c AS BIGINT) AS pair_count,
           ROUND(CAST(c AS DOUBLE) / CAST(cv AS DOUBLE), 6) AS ml_prob,
           ROUND({_kn_prob_sql("c", "cv", "n1h", "n1c", "bt")}, 6)
             AS kn_prob,
           ROUND({_kn_lambda_sql("cv", "n1h")}, 6) AS head_lambda,
           ROUND({_kn_cont_sql("n1c", "bt")}, 6) AS cont_prob
    FROM ranked WHERE rn <= {_KN_TOPN}
    """,
)
def kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X253 — interpolated Kneser-Ney bigram estimation: for the top
    10 heads by bigram mass, the top 4 continuations with
    their ML probability c/c(v) and the KN-smoothed
    P_KN(w|v) = (c(v,w)-d)/c(v) + lambda(v)*Pcont(w), d=0.75, where
    Pcont(w) = N1+(.,w)/N1+(.,.) is the CONTINUATION unigram — how
    many distinct contexts w follows, not how often w occurs. This is
    the smoothing KenLM ships and the CCNet/ccnet_perplexity (X211)
    quality-filter stack rests on; the add-k table (X120) overweights
    high-frequency-but-context-locked tokens ("Francisco" after "San")
    that KN's continuation count correctly discounts.

    Determinism: every probability folds from five integer counts
    (c, c(v), N1+(v,.), N1+(.,w), bigram types) through expressions
    single-sourced into both engines (_kn_prob_sql — the _gini_gain_sql
    pattern), so the doubles are bit-equal before the 6-decimal
    rounding; ranks order by integer count with lexicographic
    tie-break, never by a float. Mass identity sum_w P_KN(w|v) = 1
    over the full vocab is property-tested (tests/test_new_ops.py).

    Scale: bigram extraction is per-row shifted-slice zip (no
    posexplode self-join); ONE map-side-combined shuffle builds the
    (head, next) rollup, which is localCheckpoint-pinned (the X94
    four-consumer rule) and every model quantity — head masses,
    continuation counts, the type total — is a re-aggregation of that
    vocab-bounded rollup, never of the corpus. The head filter
    broadcasts 10 rows; the final window runs over <= 10
    head-groups. A full-vocab KN table at 100 TB is the same plan
    minus the top-k filter: still one corpus shuffle plus
    rollup-sized re-aggregations.
    """
    t = load_tables(spark, sf_dir)
    docs = t.documents.select(_ctoks(F.col("text")).alias("t")).where(
        F.size("t") >= 2
    )
    pairs = docs.select(
        F.slice(F.col("t"), 1, F.size("t") - 1).alias("h_arr"),
        F.slice(F.col("t"), 2, F.size("t") - 1).alias("w_arr"),
    ).select(F.explode(F.arrays_zip("h_arr", "w_arr")).alias("z"))
    r = (
        pairs.select(
            F.col("z.h_arr").alias("head"),
            F.col("z.w_arr").alias("next_tok"),
        )
        .groupBy("head", "next_tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Four consumers below (heads, conts, type total, the slice join):
    # pin the rollup so the corpus scan + zip runs once (X94 rule).
    r = r.localCheckpoint()
    heads = r.groupBy("head").agg(
        F.sum("c").alias("cv"), F.count(F.lit(1)).alias("n1h")
    )
    top_heads = heads.orderBy(F.col("cv").desc(), "head").limit(_KN_HEADS)
    conts = r.groupBy("next_tok").agg(F.count(F.lit(1)).alias("n1c"))
    bt = r.agg(F.count(F.lit(1)).alias("bt"))
    sl = (
        r.join(F.broadcast(top_heads), "head")
        .join(conts, "next_tok")
        .crossJoin(F.broadcast(bt))
    )
    wr = Window.partitionBy("head").orderBy(
        F.col("c").desc(), "next_tok"
    )
    return (
        sl.select(
            "head", "next_tok", "c", "cv", "n1h", "n1c", "bt",
            F.row_number().over(wr).alias("rn"),
        )
        .where(F.col("rn") <= _KN_TOPN)
        .select(
            "head",
            "next_tok",
            F.col("c").cast("long").alias("pair_count"),
            F.round(
                F.expr("CAST(c AS DOUBLE) / CAST(cv AS DOUBLE)"), 6
            ).alias("ml_prob"),
            F.round(
                F.expr(_kn_prob_sql("c", "cv", "n1h", "n1c", "bt")), 6
            ).alias("kn_prob"),
            F.round(
                F.expr(_kn_lambda_sql("cv", "n1h")), 6
            ).alias("head_lambda"),
            F.round(
                F.expr(_kn_cont_sql("n1c", "bt")), 6
            ).alias("cont_prob"),
        )
    )


_BPE_TOPN = 20


@query(
    "bpe_merge_candidates",
    oracle=f"""
    WITH words AS (
      SELECT t AS w, COUNT(*) AS wc
      FROM (SELECT unnest({_DUCK_CTOKS}) AS t FROM documents)
      GROUP BY t
    ),
    chars AS (
      SELECT w, wc, string_split_regex(w, '') AS cs FROM words
    ),
    pairs AS (
      SELECT z[1] AS left_ch, z[2] AS right_ch, wc
      FROM (
        SELECT wc, unnest(list_zip(cs[1:len(cs) - 1], cs[2:len(cs)]))
               AS z
        FROM chars WHERE len(cs) >= 2
      )
    )
    SELECT left_ch, right_ch,
           CAST(SUM(wc) AS BIGINT) AS pair_count
    FROM pairs GROUP BY 1, 2
    ORDER BY pair_count DESC, left_ch, right_ch LIMIT {_BPE_TOPN}
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X121 — the BPE trainer's inner step (Sennrich 2016): count
    adjacent symbol pairs across the corpus, weighted by word
    frequency, and emit the top merge candidates. One such step per
    merge is exactly how a BPE vocab is trained; this implements the
    count phase the way production trainers do — over the WORD-COUNT
    rollup, never the raw corpus.

    Scale: the corpus collapses to (word, count) in one shuffle
    (vocab-bounded by Heaps' law); pair extraction is per-row array
    arithmetic over that rollup; the pair aggregate is alphabet²-
    bounded; top-n is TakeOrdered. A full BPE train iterates this with
    the previous merges applied — each iteration stays rollup-sized.
    """
    t = load_tables(spark, sf_dir)
    words = (
        t.documents.select(
            F.explode(_ctoks(F.col("text"))).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    chars = words.select(
        "wc", F.split(F.col("w"), "").alias("cs")
    ).where(F.size("cs") >= 2)
    pairs = chars.select(
        "wc",
        F.slice(F.col("cs"), 1, F.size("cs") - 1).alias("h_arr"),
        F.slice(F.col("cs"), 2, F.size("cs") - 1).alias("w_arr"),
    ).select("wc", F.explode(F.arrays_zip("h_arr", "w_arr")).alias("z"))
    return (
        pairs.select(
            F.col("z.h_arr").alias("left_ch"),
            F.col("z.w_arr").alias("right_ch"),
            "wc",
        )
        .groupBy("left_ch", "right_ch")
        .agg(F.sum("wc").cast("long").alias("pair_count"))
        .orderBy(
            F.col("pair_count").desc(), "left_ch", "right_ch"
        )
        .limit(_BPE_TOPN)
    )


_TPL_N = 3
_TPL_TOPN = 3


@query(
    "common_ngram_report",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id,
             string_split_regex(text, '\\s+') AS t
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT source, doc_id, s
      FROM (
        SELECT source, doc_id,
               unnest({_duck_shingles(_TPL_N)}) AS s
        FROM toks
      )
    ),
    df AS (
      SELECT source, s, COUNT(*) AS doc_freq
      FROM sh GROUP BY 1, 2
    ),
    nd AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ),
    ranked AS (
      SELECT df.source, df.s, df.doc_freq, nd.n_docs,
             ROW_NUMBER() OVER (
               PARTITION BY df.source
               ORDER BY df.doc_freq DESC, df.s
             ) AS rn
      FROM df JOIN nd USING (source)
    )
    SELECT source, s AS shingle, doc_freq,
           ROUND(CAST(doc_freq AS DOUBLE) / n_docs, 4) AS doc_frac
    FROM ranked WHERE rn <= {_TPL_TOPN}
    """,
)
def common_ngram_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X122 — per-source template/boilerplate n-gram report: the
    3-gram shingles present in the most documents of each
    source, with their document-frequency fraction. High-fraction
    shingles are shared headers/footers/navigation — the signal a
    boilerplate stripper keys on before dedup (removing them is what
    makes X2/X3 near-dup detection see actual content).

    Scale: distinct (source, doc, shingle) collapses repeats within a
    document map-side; doc-frequency is one count shuffle on (source,
    shingle); the ranking window runs per source over the shingle-TYPE
    rollup; the per-source doc counts broadcast.
    """
    t = load_tables(spark, sf_dir)
    sh = (
        t.documents.select(
            "source",
            "doc_id",
            F.explode(
                shingles(tokens(F.col("text")), _TPL_N)
            ).alias("s"),
        )
        .distinct()
    )
    df = sh.groupBy("source", "s").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    nd = t.documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    wr = Window.partitionBy("source").orderBy(
        F.col("doc_freq").desc(), F.col("s")
    )
    return (
        df.join(F.broadcast(nd), "source")
        .select(
            "source",
            "s",
            "doc_freq",
            "n_docs",
            F.row_number().over(wr).alias("rn"),
        )
        .where(F.col("rn") <= _TPL_TOPN)
        .select(
            "source",
            F.col("s").alias("shingle"),
            "doc_freq",
            F.round(
                F.col("doc_freq").cast("double") / F.col("n_docs"), 4
            ).alias("doc_frac"),
        )
    )


@query(
    "doc_length_gini",
    oracle="""
    WITH ranked AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY n_chars, doc_id
             ) AS i
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(2.0 * SUM(CAST(i AS BIGINT) * n_chars)
                 / (COUNT(*) * CAST(SUM(n_chars) AS DOUBLE))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
    FROM ranked GROUP BY source
    """,
)
def doc_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X123 — Gini coefficient of document length per source, via the
    sorted closed form G = 2·Σᵢ i·x₍ᵢ₎/(n·Σx) − (n+1)/n: the
    inequality gauge for length skew (a source where a few giant
    documents hold most of the chars needs length-aware sampling /
    chunking budgets — X73/X76 consume exactly this signal).

    Rank ties (equal lengths) don't move Σ i·x₍ᵢ₎ — equal values
    across a block of ranks sum identically under any tie order — so
    the row_number tiebreak is for engine determinism only, not
    semantics. All sums are exact integers; the two divisions are the
    only float ops. Scale: one sort-within-source window over (source)
    partitions, then a fold to |sources| rows.
    """
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = t.documents.select(
        "source",
        "n_chars",
        F.row_number().over(w).cast("long").alias("i"),
    )
    n = F.count(F.lit(1))
    sx = F.sum("n_chars")
    six = F.sum(F.col("i") * F.col("n_chars"))
    return ranked.groupBy("source").agg(
        n.cast("long").alias("n_docs"),
        sx.cast("long").alias("total_chars"),
        F.round(
            2.0 * six / (n * sx.cast("double"))
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    )




_PMI_WINDOW = 4
_PMI_MIN_COOC = 5
_PMI_TOPN = 20


@query(
    "token_pmi_pairs",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, {_DUCK_CTOKS} AS t FROM documents
    ),
    pr AS (
      SELECT least(z[1], z[2]) AS tok_a, greatest(z[1], z[2]) AS tok_b
      FROM (
        SELECT unnest(flatten([
          {", ".join(f"list_zip(t[1:len(t) - {d}], t[{d + 1}:len(t)])" for d in range(1, _PMI_WINDOW + 1))}
        ])) AS z
        FROM docs
      )
      WHERE z[1] IS NOT NULL AND z[2] IS NOT NULL
    ),
    cab AS (
      SELECT tok_a, tok_b, COUNT(*) AS c_ab FROM pr GROUP BY 1, 2
    ),
    uni AS (
      SELECT t AS tok, COUNT(*) AS c
      FROM (SELECT unnest(t) AS t FROM docs) GROUP BY 1
    ),
    scal AS (
      SELECT (SELECT SUM(c) FROM uni) AS n,
             (SELECT COUNT(*) FROM pr) AS p
    )
    SELECT tok_a, tok_b, c_ab,
           ROUND(log2((CAST(c_ab AS DOUBLE) / p)
                      / ((CAST(ca.c AS DOUBLE) / n)
                         * (CAST(cb.c AS DOUBLE) / n))), 4) AS pmi
    FROM cab
    JOIN uni ca ON ca.tok = tok_a
    JOIN uni cb ON cb.tok = tok_b
    CROSS JOIN scal
    WHERE c_ab >= {_PMI_MIN_COOC}
    ORDER BY (CAST(c_ab AS DOUBLE) * n * n) / (CAST(p AS DOUBLE) * ca.c * cb.c)
             DESC, tok_a, tok_b
    LIMIT {_PMI_TOPN}
    """,
)
def token_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X129 — pointwise mutual information over windowed token
    co-occurrence (window 4, the word2vec/GloVe counting
    step): the top strongly-associated token pairs, the collocation
    signal phrase mining and tokenizer multi-word-merge decisions read.
    PMI = log2( p(a,b) / (p(a)p(b)) ) with pair probabilities from the
    window-pair space and marginals from the unigram space; pairs
    below 5 co-occurrences are dropped (PMI's
    small-count pathology).

    Scale: window pairing is per-row array arithmetic (4
    shifted-slice zips flattened and exploded in ONE corpus pass) with
    fan-out ≤ 4 per token — linear, unlike doc-level
    co-occurrence's C(distinct,2) blowup; the (a,b) count rollup is
    vocab²-bounded, marginals and the two scalars broadcast. The
    top-n ORDERS BY THE RATIONAL odds ratio c_ab·N²/(P·c_a·c_b) — the
    same monotone order as PMI but a single IEEE expression both
    engines evaluate bit-identically (float log ordering near ties is
    not cross-engine stable; the ratio is) — then emits the rounded
    log. TakeOrderedAndProject, no global sort."""
    t = load_tables(spark, sf_dir)
    docs = t.documents.select(_ctoks(F.col("text")).alias("t"))
    zips = [
        F.zip_with(
            F.slice(F.col("t"), 1, F.greatest(F.size("t") - d, F.lit(0))),
            F.slice(F.col("t"), d + 1, F.greatest(F.size("t") - d, F.lit(0))),
            lambda a, b: F.struct(
                F.least(a, b).alias("x"), F.greatest(a, b).alias("y")
            ),
        )
        for d in range(1, _PMI_WINDOW + 1)
    ]
    pr = (
        docs.select(F.explode(F.flatten(F.array(*zips))).alias("z"))
        .where(F.col("z.x").isNotNull() & F.col("z.y").isNotNull())
        .select(F.col("z.x").alias("tok_a"), F.col("z.y").alias("tok_b"))
    )
    pr = pr.localCheckpoint(eager=False)
    cab = pr.groupBy("tok_a", "tok_b").agg(F.count(F.lit(1)).alias("c_ab"))
    uni = (
        t.documents.select(F.explode(_ctoks(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    scal = uni.agg(F.sum("c").alias("n")).crossJoin(
        pr.agg(F.count(F.lit(1)).alias("p"))
    )
    ca = uni.select(F.col("tok").alias("tok_a"), F.col("c").alias("c_a"))
    cb = uni.select(F.col("tok").alias("tok_b"), F.col("c").alias("c_b"))
    scored = (
        cab.where(F.col("c_ab") >= _PMI_MIN_COOC)
        .join(F.broadcast(ca), "tok_a")
        .join(F.broadcast(cb), "tok_b")
        .crossJoin(F.broadcast(scal))
    )
    ratio = (F.col("c_ab").cast("double") * F.col("n") * F.col("n")) / (
        F.col("p").cast("double") * F.col("c_a") * F.col("c_b")
    )
    pmi = F.log2(
        (F.col("c_ab").cast("double") / F.col("p"))
        / (
            (F.col("c_a").cast("double") / F.col("n"))
            * (F.col("c_b").cast("double") / F.col("n"))
        )
    )
    return (
        scored.orderBy(ratio.desc(), "tok_a", "tok_b")
        .limit(_PMI_TOPN)
        .select("tok_a", "tok_b", "c_ab", F.round(pmi, 4).alias("pmi"))
    )


__all__ = [
    "source_token_entropy",
    "vocab_coverage_curve",
    "bm25_doc_scores",
    "bigram_lm_probs",
    "bpe_merge_candidates",
    "common_ngram_report",
    "doc_length_gini",
    "token_pmi_pairs",
]


def _rrf_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES
    from seng550_a3_etl_spark.suite.vectors import _cos

    return f"""
    WITH lex AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
      FROM ({ORACLES["bm25_doc_scores"]})
    ),
    vq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    vscored AS (
      SELECT vec_id AS doc_id, ROUND({_cos('embedding', 'qv')}, 6) AS cos
      FROM embeddings CROSS JOIN vq WHERE vec_id != 0
    ),
    vec AS (
      SELECT doc_id, rnk AS vec_rank FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS rnk
        FROM vscored
      ) WHERE rnk <= {_RRF_DEPTH}
    ),
    fused AS (
      SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
             lex.lex_rank, vec.vec_rank,
             COALESCE(1000000 // ({_RRF_C} + lex.lex_rank), 0)
             + COALESCE(1000000 // ({_RRF_C} + vec.vec_rank), 0)
               AS rrf_micro
      FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
    )
    SELECT doc_id, lex_rank, vec_rank, CAST(rrf_micro AS BIGINT) AS rrf_micro
    FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT {_RRF_TOPN}
    """


_RRF_C = 60
_RRF_DEPTH = 20
_RRF_TOPN = 10


@query("rrf_hybrid_topk", oracle=_rrf_oracle())
def rrf_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X143 — reciprocal-rank-fusion hybrid retrieval: the BM25 lexical
    ranking (X119, same query terms) fused with an embedding-cosine
    ranking (query = vector 0, the testdata's doc_id↔vec_id alignment)
    by RRF score Σ 1/(60+rank) — the standard hybrid-search combiner
    (Cormack et al.), fusing rankings without score calibration.

    Determinism: both input rankings use the suite's stable bases
    (rounded score + id tiebreak); the fusion score is computed in
    integer MICROS via 1000000 div (60+rank) — integer division on
    integer ranks, so ordering and the top-10 cutoff are engine-exact.
    Scale: each leg is its own TakeOrdered top-20 (the corpus is
    scanned, never globally sorted); the fusion joins two ≤20-row
    frames on the driver-side-free merge path."""
    from seng550_a3_etl_spark.operators.similarity import cosine_topk

    t = load_tables(spark, sf_dir)
    lex = bm25_doc_scores(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
        .alias("lex_rank"),
    )
    q = t.embeddings.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("qid"), F.col("embedding").alias("qv")
    )
    c = t.embeddings.filter(F.col("vec_id") != 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    vec = cosine_topk(q, c, k=_RRF_DEPTH).select(
        F.col("cid").alias("doc_id"), F.col("rank").alias("vec_rank")
    )
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "vec_rank",
        (
            F.coalesce(
                F.expr(f"1000000 div ({_RRF_C} + lex_rank)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"1000000 div ({_RRF_C} + vec_rank)"), F.lit(0)
            )
        ).cast("long").alias("rrf_micro"),
    )
    return fused.orderBy(F.col("rrf_micro").desc(), "doc_id").limit(
        _RRF_TOPN
    )


_BPE_CHAR_TOPN = 20  # char vocab size; the 4 rarest fixture chars go OOV


def _bpe_encode_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    return f"""
    WITH w_merge AS ({ORACLES["bpe_merge_candidates"]}),
    merges AS (SELECT left_ch || right_ch AS unit FROM w_merge),
    charfreq AS (
      SELECT c AS unit FROM (
        SELECT c, COUNT(*) AS n FROM (
          SELECT unnest(string_split_regex(t, '')) AS c
          FROM (SELECT unnest({_DUCK_CTOKS}) AS t FROM documents)
        ) WHERE c <> '' GROUP BY c
        ORDER BY n DESC, c LIMIT {_BPE_CHAR_TOPN}
      )
    ),
    units AS (
      SELECT unit,
             CAST(ROW_NUMBER() OVER (ORDER BY length(unit), unit) - 1
                  AS INT) AS uid
      FROM (SELECT unit FROM charfreq UNION ALL SELECT unit FROM merges)
    ),
    docw AS (
      SELECT doc_id, s.wi AS wi, s.w AS w FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws) + 1),
                 i -> struct_pack(wi := i, w := ws[CAST(i AS INT)]))) AS s
        FROM (SELECT doc_id, {_DUCK_CTOKS} AS ws FROM documents)
      )
    ),
    docc AS (
      SELECT doc_id, wi, s.ci AS ci, s.ch AS ch FROM (
        SELECT doc_id, wi,
               unnest(list_transform(range(1, len(cs) + 1),
                 i -> struct_pack(ci := i, ch := cs[CAST(i AS INT)]))) AS s
        FROM (SELECT doc_id, wi, string_split_regex(w, '') AS cs
              FROM docw)
      )
    ),
    nxtc AS (
      SELECT doc_id, wi, ci, ch,
             lead(ch) OVER (PARTITION BY doc_id, wi ORDER BY ci) AS nxt
      FROM docc
    ),
    eligc AS (
      SELECT *,
             (nxt IS NOT NULL
              AND (ch || nxt) IN (SELECT unit FROM merges)) AS elig
      FROM nxtc
    ),
    isl AS (
      SELECT *,
             CASE WHEN elig THEN ci - ROW_NUMBER() OVER (
               PARTITION BY doc_id, wi, elig ORDER BY ci) END AS island
      FROM eligc
    ),
    starts AS (
      SELECT *,
             elig AND (ci - MIN(ci) OVER (
               PARTITION BY doc_id, wi, island)) % 2 = 0 AS pair_start
      FROM isl
    ),
    pieces AS (
      SELECT doc_id, wi, ci,
             CASE WHEN pair_start THEN ch || nxt ELSE ch END AS unit
      FROM (
        SELECT *, lag(pair_start) OVER (
          PARTITION BY doc_id, wi ORDER BY ci) AS prev_start
        FROM starts
      ) WHERE NOT COALESCE(prev_start, FALSE)
    ),
    resolved AS (
      SELECT p.doc_id, p.wi, p.ci, COALESCE(u.uid, -1) AS uid
      FROM pieces p LEFT JOIN units u ON u.unit = p.unit
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_pieces,
             SUM(CASE WHEN uid = -1 THEN 1 ELSE 0 END) AS n_unk,
             string_agg(CAST(uid AS VARCHAR), ' ' ORDER BY wi, ci)
               AS piece_ids
      FROM resolved GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(a.n_pieces, 0) AS BIGINT) AS n_pieces,
           CAST(COALESCE(a.n_unk, 0) AS BIGINT) AS n_unk,
           COALESCE(a.piece_ids, '') AS piece_ids
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """


_BPE_ENC_CACHE: dict[tuple[str, str], DataFrame] = {}


def _bpe_encoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X162's encode output (doc_id, n_pieces, n_unk, piece_ids) —
    computed ONCE per (Spark application, sf_dir) and shared by its
    three consumers (the X162 query itself, X180 fertility, X223
    drift), which each re-ran the full vocab build + per-char encode
    fold before r15. Same rationale as text._shingle_sets_df: at 100 TB
    the tokenized corpus is a materialized artifact written by one
    encode job and read by every downstream token-count consumer;
    localCheckpoint is the session-scoped analog, and bench.py evicts +
    times the build as its own [1x, 10x, ratio] row."""
    from seng550_a3_etl_spark.suite.text import _evict_stopped_sessions

    _evict_stopped_sessions(_BPE_ENC_CACHE)
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _BPE_ENC_CACHE.get(key)
    if cached is not None:
        return cached
    out = _bpe_encode_plan(spark, sf_dir).localCheckpoint(eager=True)
    _BPE_ENC_CACHE[key] = out
    return out


@query("bpe_encode_docs", oracle=_bpe_encode_oracle())
def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached wrapper over :func:`_bpe_encode_plan` — see
    :func:`_bpe_encoded` for the sharing contract (r15)."""
    return _bpe_encoded(spark, sf_dir)


def _bpe_encode_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION (X162; VERDICT r7/r8 #6) — bridges X121's
    BPE trainer to the token-count operators: every document is encoded
    against a learned subword vocab (the corpus's top
    ``_BPE_CHAR_TOPN`` characters + X121's top merge pairs) by greedy
    left-to-right longest-match — at each position, consume the 2-char
    merged unit if it is in the vocab, else the single character
    (emitting ``-1``/UNK when the character itself is out-of-vocab,
    the WordPiece rule). Output per doc: piece count, OOV count, and
    the space-joined token-id sequence. Unit ids are
    ``row_number() - 1`` over ``(length(unit), unit)`` — chars first,
    then merges, both alphabetical — so the id table is reproducible
    from the vocab alone.

    Cross-engine equivalence rests on a parallel form of the greedy
    scan: position i starts a merged pair iff its bigram is
    merge-eligible and i is an EVEN offset into its maximal run of
    consecutive eligible positions (greedy maximal matching on a
    path). The oracle implements that run-parity form with windows;
    the Spark side implements the scan directly as a per-row
    ``F.aggregate`` fold (state = pending char + emitted ids) — two
    shapes, provably the same segmentation.

    Scale: vocab build is X121's word-count rollup + an
    alphabet-sized char census; the (unit → id) map rides ONE
    broadcast row into the corpus scan; the encode itself is a
    per-row HOF fold — the corpus is scanned ONCE, nothing
    corpus-sized shuffles, zero UDFs. Production swaps in an
    externally-trained merge table; the encode plan is identical."""
    t = load_tables(spark, sf_dir)

    merges = bpe_merge_candidates(spark, sf_dir).select(
        F.concat("left_ch", "right_ch").alias("unit")
    )
    chars = (
        t.documents.select(F.explode(_ctoks(F.col("text"))).alias("w"))
        .select(F.explode(F.split(F.col("w"), "")).alias("c"))
        .filter(F.col("c") != "")
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "c")
        .limit(_BPE_CHAR_TOPN)
        .select(F.col("c").alias("unit"))
    )
    units = chars.unionByName(merges).select(
        "unit",
        (
            F.row_number().over(
                Window.orderBy(F.length("unit"), F.col("unit"))
            )
            - 1
        )
        .cast("int")
        .alias("uid"),
    )
    vocab_row = units.agg(
        F.map_from_entries(F.collect_list(F.struct("unit", "uid"))).alias(
            "__vmap"
        )
    )

    from seng550_a3_etl_spark.plans.layout import spread_for_cpu

    # The encode is a CPU-bound per-row fold: partitions = parallelism.
    # spread_for_cpu is a no-op when the scan already splits >= cores.
    docs = spread_for_cpu(
        t.documents.select("doc_id", "text")
    ).crossJoin(F.broadcast(vocab_row))
    vmap = F.col("__vmap")
    st_type = "struct<pending:string,ids:array<int>,nunk:int>"

    def resolve_one(acc: Column, nxt_pending: Column) -> Column:
        """Emit acc.pending as a single-char unit (or UNK), move on."""
        pid = F.element_at(vmap, acc["pending"])
        return F.struct(
            nxt_pending.alias("pending"),
            F.concat(
                acc["ids"], F.array(F.coalesce(pid, F.lit(-1)))
            ).alias("ids"),
            (
                acc["nunk"]
                + F.when(pid.isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("nunk"),
        )

    def step(acc: Column, c: Column) -> Column:
        mid = F.element_at(vmap, F.concat(acc["pending"], c))
        return F.when(
            (acc["pending"] != "") & mid.isNotNull(),
            F.struct(
                F.lit("").alias("pending"),
                F.concat(acc["ids"], F.array(mid)).alias("ids"),
                acc["nunk"].alias("nunk"),
            ),
        ).otherwise(
            F.when(
                acc["pending"] == "",
                F.struct(
                    c.alias("pending"),
                    acc["ids"].alias("ids"),
                    acc["nunk"].alias("nunk"),
                ),
            ).otherwise(resolve_one(acc, c))
        )

    def finish(acc: Column) -> Column:
        return F.when(acc["pending"] == "", acc).otherwise(
            resolve_one(acc, F.lit(""))
        )

    def enc_word(w: Column) -> Column:
        init = F.struct(
            F.lit("").alias("pending"),
            F.array().cast("array<int>").alias("ids"),
            F.lit(0).alias("nunk"),
        )
        return F.aggregate(
            F.split(w, ""),
            init.cast(st_type),
            step,
            finish,
        )

    per_word = F.transform(_ctoks(F.col("text")), enc_word)
    ids = F.coalesce(
        F.flatten(F.transform(per_word, lambda r: r["ids"])),
        F.array().cast("array<int>"),
    )
    nunk = F.coalesce(
        F.aggregate(
            per_word, F.lit(0), lambda a, r: a + r["nunk"]
        ),
        F.lit(0),
    )
    return docs.select(
        "doc_id",
        F.size(ids).cast("long").alias("n_pieces"),
        nunk.cast("long").alias("n_unk"),
        F.array_join(
            F.transform(ids, lambda i: i.cast("string")), " "
        ).alias("piece_ids"),
    )


# DSIR target domain: the sources whose distribution we select toward.
# Fixture stand-in for "Wikipedia+books vs Common Crawl".
_DSIR_TARGET = ("src0", "src1")
_DSIR_TGT_SQL = ", ".join(f"'{s}'" for s in _DSIR_TARGET)


_DSIR_MODEL_CACHE: dict[tuple[str, str], DataFrame] = {}


def _dsir_model_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(b, logw) DSIR bigram importance model (Laplace-smoothed target/
    raw log-likelihood ratios) — computed ONCE per (Spark application,
    sf_dir) and shared by the batch scorer (X179) and the streaming
    scoring twin (X195), which each re-ran the corpus bigram explode +
    rollup before r15. The persisted-model production analog; bench.py
    evicts + times the build as its own [1x, 10x, ratio] row."""
    from seng550_a3_etl_spark.suite.text import _evict_stopped_sessions

    _evict_stopped_sessions(_DSIR_MODEL_CACHE)
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _DSIR_MODEL_CACHE.get(key)
    if cached is not None:
        return cached
    t = load_tables(spark, sf_dir)
    is_tgt = F.col("source").isin(*_DSIR_TARGET)
    bg = t.documents.select(
        is_tgt.alias("is_tgt"),
        F.explode(shingles(tokens(F.col("text")), 2)).alias("b"),
    )
    cnt = bg.groupBy("b").agg(
        F.count_if(F.col("is_tgt")).alias("ct"),
        F.count_if(~F.col("is_tgt")).alias("cr"),
    )
    tot = cnt.agg(
        F.sum("ct").alias("tt"),
        F.sum("cr").alias("tr"),
        F.count(F.lit(1)).alias("v"),
    )
    out = (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.log(
                ((F.col("ct") + 1) / (F.col("tt") + F.col("v")))
                / ((F.col("cr") + 1) / (F.col("tr") + F.col("v")))
            ).alias("logw"),
        )
        .localCheckpoint(eager=True)
    )
    _DSIR_MODEL_CACHE[key] = out
    return out


@query(
    "dsir_importance_weights",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, string_split_regex(text, '\\s+') AS t
      FROM documents
    ),
    bg AS (
      SELECT doc_id, source IN ({_DSIR_TGT_SQL}) AS is_tgt,
             unnest({_duck_shingles(2)}) AS b
      FROM tok
    ),
    cnt AS (
      SELECT b,
             COUNT(*) FILTER (WHERE is_tgt) AS ct,
             COUNT(*) FILTER (WHERE NOT is_tgt) AS cr
      FROM bg GROUP BY b
    ),
    tot AS (
      SELECT SUM(ct) AS tt, SUM(cr) AS tr, COUNT(*) AS v FROM cnt
    ),
    model AS (
      SELECT b, LN(((ct + 1) / (tt + v)) / ((cr + 1) / (tr + v)))
               AS logw
      FROM cnt, tot
    )
    SELECT bg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(logw), 6) AS avg_llr
    FROM bg JOIN model USING (b)
    WHERE NOT is_tgt
    GROUP BY bg.doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (X179; Xie et al. 2023)
    — per-document importance weights for selecting raw-pool documents
    that look like a target domain: fit Laplace-smoothed bigram unigram
    models on the target sources and on the raw pool, then score every
    raw document by the mean log-likelihood ratio of its bigram
    occurrences, ``avg_llr = mean(ln(p_target(b)/p_raw(b)))``. High
    scorers are target-like; the actual resample step is the standing
    weighted-sampling operator (`es_weighted_sample`, X45) fed by these
    weights. The published method hashes bigrams into 10^4 buckets to
    bound the feature space — a one-line `xxhash64(b) % B` change that
    only relabels features, kept unhashed here so the DuckDB oracle can
    replay feature identity exactly.

    Scale: the corpus tokenizes once; the feature-count table is
    |bigram vocab| rows (map-side-combined single shuffle), the totals
    one broadcast row, and scoring is a broadcast join of the model
    onto the exploded stream followed by one per-doc mean — the X87
    (unigram logprob) shape with a two-sided conditional count. At
    100 TB the vocab cap (hash-bucketing) bounds the broadcast; no step
    depends on |corpus| beyond the two linear scans."""
    t = load_tables(spark, sf_dir)
    is_tgt = F.col("source").isin(*_DSIR_TARGET)
    # Model from the session cache (r15 — shared with the streaming
    # scoring twin); the scoring pass re-derives the raw-side bigrams
    # in its own scan (single consumer now, so no pin needed).
    model = _dsir_model_df(spark, sf_dir)
    return (
        t.documents.filter(~is_tgt)
        .select(
            "doc_id",
            F.explode(shingles(tokens(F.col("text")), 2)).alias("b"),
        )
        .join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("logw"), 6).alias("avg_llr"),
        )
    )


def _fertility_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    return f"""
    WITH enc AS ({ORACLES['bpe_encode_docs']}),
    words AS (
      SELECT doc_id, source,
             CAST(len({_DUCK_CTOKS}) AS BIGINT) AS n_words
      FROM documents
    )
    SELECT source,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
           CAST(SUM(n_unk) AS BIGINT) AS n_unk,
           CAST((CAST(SUM(n_pieces) AS HUGEINT) * 1000000)
                // SUM(n_words) AS BIGINT) AS fertility_ppm,
           CAST((CAST(SUM(n_unk) AS HUGEINT) * 1000000)
                // SUM(n_pieces) AS BIGINT) AS unk_ppm
    FROM enc JOIN words USING (doc_id)
    GROUP BY source
    """


@query("bpe_fertility_by_source", oracle=_fertility_oracle())
def bpe_fertility_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility report (X180): subword pieces per whitespace
    word and UNK share, by source — THE acceptance metric for a learned
    tokenizer (fertility near 1 on the target language, spikes on
    sources the vocab underserves; rising unk_ppm flags alphabet drift).
    Composes the X162 encoder output with per-doc word counts; ratios
    are exact integer ppm (``DIV``), never engine floats.

    Scale: the encode is the existing single-scan fold; the word count
    rides the same documents scan the encoder reads, the join is
    doc_id-keyed, and the rollup is |sources| rows."""
    enc = _bpe_encoded(spark, sf_dir).select(
        "doc_id", "n_pieces", "n_unk"
    )
    t = load_tables(spark, sf_dir)
    words = t.documents.select(
        "doc_id",
        "source",
        F.size(_ctoks(F.col("text"))).cast("long").alias("n_words"),
    )
    return (
        enc.join(words, "doc_id")
        .groupBy("source")
        .agg(
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_pieces"),
            F.sum("n_unk").cast("long").alias("n_unk"),
            # DECIMAL(38,0) numerators: piece counts * 1e6 wrap int64
            # at the ~1e13-token operating point (the X137 overflow
            # class); oracle numerators are HUGEINT to match.
            F.expr(
                "CAST(CAST(sum(n_pieces) AS DECIMAL(38,0)) * 1000000"
                " DIV sum(n_words) AS LONG)"
            ).alias("fertility_ppm"),
            F.expr(
                "CAST(CAST(sum(n_unk) AS DECIMAL(38,0)) * 1000000"
                " DIV sum(n_pieces) AS LONG)"
            ).alias("unk_ppm"),
        )
    )


@query(
    "source_pairwise_jsd",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({_DUCK_CTOKS}) AS t FROM documents
    ),
    freq AS (
      SELECT source, t, COUNT(*) AS c FROM tok GROUP BY 1, 2
    ),
    prob AS (
      SELECT source, t,
             c / SUM(c) OVER (PARTITION BY source) AS p
      FROM freq
    ),
    shared AS (
      SELECT a.source AS src_a, b.source AS src_b,
             COUNT(*) AS n_shared_types,
             SUM(a.p) AS sp, SUM(b.p) AS sq,
             SUM(a.p * log2(2 * a.p / (a.p + b.p))) AS ta,
             SUM(b.p * log2(2 * b.p / (a.p + b.p))) AS tb
      FROM prob a JOIN prob b ON a.t = b.t AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b,
           CAST(n_shared_types AS BIGINT) AS n_shared_types,
           ROUND(0.5 * (ta + (1 - sp)) + 0.5 * (tb + (1 - sq)), 6)
             AS jsd_bits
    FROM shared
    """,
)
def source_pairwise_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source token
    distributions, in bits (X194) — completes the drift family: PSI
    (X79, binned numeric), KS (X127, lengths), lang-source MI (X123);
    JSD is the symmetric, bounded [0,1]-bit measure mixture designers
    read to decide which sources are near-redundant (low JSD — merge
    their budgets) vs complementary (high JSD). Tokens present in only
    one source contribute p·log2(2) = p, so the whole statistic folds
    from the SHARED-token join alone: JSD = ½(Σp·log2(2p/(p+q)) +
    (1−Σp)) + ½(symmetric) — no full-outer join needed.

    Scale: one (source, token) rollup (map-side combined), per-source
    totals via one window over that rollup, then a token-keyed
    self-join whose output folds immediately to |sources|² rows. At
    100 TB the rollup is vocab-bounded (Heaps' law); nothing
    corpus-sized survives the first aggregation."""
    t = load_tables(spark, sf_dir)
    freq = (
        t.documents.select(
            "source", F.explode(_ctoks(F.col("text"))).alias("t")
        )
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    prob = freq.select(
        "source",
        "t",
        (
            F.col("c")
            / F.sum("c").over(Window.partitionBy("source"))
        ).alias("p"),
    )
    a = prob.select(
        F.col("source").alias("src_a"), "t", F.col("p").alias("pa")
    )
    b = prob.select(
        F.col("source").alias("src_b"), "t", F.col("p").alias("pb")
    )
    j = a.join(b, "t").filter(F.col("src_a") < F.col("src_b"))
    return j.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared_types"),
        F.round(
            0.5
            * (
                F.sum(
                    F.col("pa")
                    * F.log2(2 * F.col("pa") / (F.col("pa") + F.col("pb")))
                )
                + (1 - F.sum("pa"))
            )
            + 0.5
            * (
                F.sum(
                    F.col("pb")
                    * F.log2(2 * F.col("pb") / (F.col("pa") + F.col("pb")))
                )
                + (1 - F.sum("pb"))
            ),
            6,
        ).alias("jsd_bits"),
    )


_DISTINCT_TOPK = 5


@query(
    "source_distinctive_terms",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({_DUCK_CTOKS}) AS t FROM documents
    ),
    st AS (SELECT source, t, COUNT(*) AS y FROM tok GROUP BY 1, 2),
    tt AS (SELECT t, SUM(y) AS y_all FROM st GROUP BY t),
    ns AS (SELECT source, SUM(y) AS n FROM st GROUP BY source),
    gl AS (SELECT SUM(y) AS nn, COUNT(DISTINCT t) AS v FROM st),
    z AS (
      SELECT st.source, st.t,
             CAST(st.y AS BIGINT) AS y_src,
             ROUND(
               (LN((st.y + 1.0) / (ns.n + gl.v - st.y - 1.0))
                - LN((tt.y_all - st.y + 1.0)
                     / (gl.nn - ns.n + gl.v - (tt.y_all - st.y) - 1.0)))
               / sqrt(1.0 / (st.y + 1.0) + 1.0 / (tt.y_all - st.y + 1.0)),
               6) AS zscore
      FROM st
      JOIN tt USING (t)
      JOIN ns USING (source)
      CROSS JOIN gl
    )
    SELECT source, t AS token, y_src, zscore FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY zscore DESC, t
      ) AS rk FROM z
    ) WHERE rk <= {_DISTINCT_TOPK}
    """,
)
def source_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive vocabulary per source (X196; Monroe et al. 2008
    log-odds with informative Dirichlet prior, a_i=1, a_0=|vocab|):
    for each source, the top-{k} tokens by z-scored log-odds against
    the REST of the corpus — the standard corpus-linguistics answer to
    "what is this source actually about", more robust than raw TF-IDF
    at the source level because the prior shrinks rare-token noise and
    the variance term ~1/(y+a) downweights unstable estimates. Mixture
    designers read it next to X194's JSD: JSD says HOW different two
    sources are, this says IN WHICH WORDS.

    Scale: one (source, token) rollup feeds everything (token totals,
    source totals, and the one-row global fold are all derived from
    it); the z-score is a per-row projection over the vocab-bounded
    rollup and the top-k window partitions by source — nothing
    corpus-sized past the first shuffle."""
    t = load_tables(spark, sf_dir)
    st = (
        t.documents.select(
            "source", F.explode(_ctoks(F.col("text"))).alias("t")
        )
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("y"))
        .localCheckpoint(eager=True)  # 4 consumers: tt, ns, gl, z
    )
    tt = st.groupBy("t").agg(F.sum("y").alias("y_all"))
    ns = st.groupBy("source").agg(F.sum("y").alias("n"))
    gl = st.agg(
        F.sum("y").alias("nn"), F.countDistinct("t").alias("v")
    )
    yy = F.col("y")
    yrest = F.col("y_all") - yy
    delta = F.log(
        (yy + 1.0) / (F.col("n") + F.col("v") - yy - 1.0)
    ) - F.log(
        (yrest + 1.0)
        / (F.col("nn") - F.col("n") + F.col("v") - yrest - 1.0)
    )
    z = (
        st.join(tt, "t")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(gl))
        .select(
            "source",
            "t",
            yy.cast("long").alias("y_src"),
            F.round(
                delta
                / F.sqrt(1.0 / (yy + 1.0) + 1.0 / (yrest + 1.0)),
                6,
            ).alias("zscore"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("zscore"), F.asc("t"))
    return (
        z.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _DISTINCT_TOPK)
        .select("source", F.col("t").alias("token"), "y_src", "zscore")
    )


@query(
    "ccnet_perplexity_buckets",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
      FROM documents
    ),
    freq AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
    tot AS (SELECT SUM(cnt) AS n FROM freq),
    score AS (
      SELECT tok.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             ROUND(AVG(LN(freq.cnt / tot.n)), 6) AS avg_logp
      FROM tok, freq, tot
      WHERE tok.token = freq.token
      GROUP BY tok.doc_id
    ),
    ranked AS (
      SELECT d.source, s.n_tokens, s.avg_logp,
             NTILE(3) OVER (
               PARTITION BY d.source
               ORDER BY s.avg_logp DESC, s.doc_id
             ) AS b
      FROM score s JOIN documents d USING (doc_id)
    )
    SELECT source,
           CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(ROUND(avg_logp * 1000000) AS BIGINT))
                AS BIGINT) AS sum_score_micro
    FROM ranked GROUP BY source, bucket
    """,
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity terciles (X211; Wenzek et al. 2020): each
    document's X87 unigram mean log-probability, ranked WITHIN its
    source and split head/middle/tail — the selection artifact CCNet
    computes per language (here per source) so that "well-written"
    (head) mass can be kept, middle down-sampled, and tail dropped
    without a single global threshold penalizing whole sources. Output
    is the per-(source, bucket) census: doc count, token mass, and the
    summed per-doc score in exact micro-nat integers (per-doc scores
    are rounded-6 doubles — the suite's standing float rule — so the
    micro-int sum is order-independent and bit-exact across engines).

    Ranking is total-ordered (score DESC, doc_id) and NTILE(3) fills
    earlier buckets first in both engines, so bucket assignment is
    deterministic under ties.

    Scale: the model is |vocab| rows broadcast to the exploded token
    stream (no corpus shuffle — X87's plan); the tercile is one hash
    exchange on source + a per-source sort. At 100 TB a giant source
    makes that sort the bottleneck; production CCNet computes the two
    percentile CUTOFFS from a score histogram and assigns by broadcast
    comparison — same buckets up to tie handling, no sort. The exact
    NTILE form is the checked semantics at suite scale."""
    t = load_tables(spark, sf_dir)
    docs = t.documents
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("n"))
    model = freq.crossJoin(F.broadcast(total)).select(
        "token", F.log(F.col("cnt") / F.col("n")).alias("logp")
    )
    score = (
        tok.join(F.broadcast(model), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg("logp"), 6).alias("avg_logp"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("avg_logp"), F.asc("doc_id")
    )
    ranked = (
        score.join(docs.select("doc_id", "source"), "doc_id")
        .withColumn("b", F.ntile(3).over(w))
        .withColumn(
            "bucket",
            F.when(F.col("b") == 1, "head")
            .when(F.col("b") == 2, "middle")
            .otherwise("tail"),
        )
    )
    return ranked.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum(
            F.round(F.col("avg_logp") * 1000000, 0).cast("long")
        ).cast("long").alias("sum_score_micro"),
    )


def _tok_drift_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    ppm = "CAST((CAST({x} AS HUGEINT) * 1000000) // {y} AS BIGINT)"
    return f"""
    WITH enc AS ({ORACLES['bpe_encode_docs']}),
    d AS (
      SELECT doc_id, doc_id % 2 AS snap, {_DUCK_CTOKS} AS ws
      FROM documents
    ),
    per AS (
      SELECT d.snap,
             COUNT(*) AS n_docs,
             SUM(len(d.ws)) AS n_words,
             SUM(e.n_pieces) AS n_pieces,
             SUM(e.n_unk) AS n_unk
      FROM d JOIN enc e USING (doc_id) GROUP BY d.snap
    ),
    flat AS (
      SELECT
        (SELECT n_docs FROM per WHERE snap = 0) AS n_docs_a,
        (SELECT n_docs FROM per WHERE snap = 1) AS n_docs_b,
        (SELECT n_words FROM per WHERE snap = 0) AS w_a,
        (SELECT n_words FROM per WHERE snap = 1) AS w_b,
        (SELECT n_pieces FROM per WHERE snap = 0) AS p_a,
        (SELECT n_pieces FROM per WHERE snap = 1) AS p_b,
        (SELECT n_unk FROM per WHERE snap = 0) AS u_a,
        (SELECT n_unk FROM per WHERE snap = 1) AS u_b
    ),
    tok AS (SELECT snap, unnest(ws) AS t FROM d),
    vc AS (
      SELECT t,
             COUNT(*) FILTER (WHERE snap = 0) AS ca,
             COUNT(*) FILTER (WHERE snap = 1) AS cb
      FROM tok GROUP BY t
    ),
    vs AS (
      SELECT
        COUNT(*) FILTER (WHERE ca > 0) AS types_a,
        COUNT(*) FILTER (WHERE cb > 0) AS types_b,
        COUNT(*) FILTER (WHERE ca > 0 AND cb > 0) AS types_both,
        COUNT(*) FILTER (WHERE cb > 0 AND ca = 0) AS new_types_b,
        COALESCE(SUM(cb) FILTER (WHERE ca = 0), 0) AS new_mass_b,
        SUM(cb) AS mass_b
      FROM vc
    )
    SELECT
      CAST(n_docs_a AS BIGINT) AS n_docs_a,
      CAST(n_docs_b AS BIGINT) AS n_docs_b,
      CAST(w_a AS BIGINT) AS n_words_a,
      CAST(w_b AS BIGINT) AS n_words_b,
      {ppm.format(x='p_a', y='w_a')} AS fertility_ppm_a,
      {ppm.format(x='p_b', y='w_b')} AS fertility_ppm_b,
      {ppm.format(x='p_b', y='w_b')} - {ppm.format(x='p_a', y='w_a')}
        AS fertility_drift_ppm,
      {ppm.format(x='u_a', y='p_a')} AS unk_ppm_a,
      {ppm.format(x='u_b', y='p_b')} AS unk_ppm_b,
      {ppm.format(x='u_b', y='p_b')} - {ppm.format(x='u_a', y='p_a')}
        AS unk_drift_ppm,
      CAST(types_a AS BIGINT) AS types_a,
      CAST(types_b AS BIGINT) AS types_b,
      CAST(new_types_b AS BIGINT) AS new_types_b,
      {ppm.format(x='new_mass_b', y='mass_b')} AS new_type_token_ppm,
      {ppm.format(x='types_both', y='types_a + types_b - types_both')}
        AS vocab_jaccard_ppm
    FROM flat, vs
    """


@query("tokenizer_drift_snapshots", oracle=_tok_drift_oracle())
def tokenizer_drift_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocab drift monitor between two corpus snapshots
    (X223) — X180's fertility/UNK report is a STATIC per-source audit;
    this is its snapshot-DIFF twin: split the corpus into two
    ingestion snapshots (doc_id parity — the deterministic stand-in
    for "last month's crawl" vs "this month's"), encode BOTH under the
    same FIXED subword vocab (X162's encoder), and report per-snapshot
    fertility/UNK with signed drift plus the word-type vocabulary
    delta: types new in B, the token-mass share those new types carry
    (the leading indicator that the tokenizer needs retraining —
    fertility degrades only AFTER unseen types carry real mass), and
    the type-set Jaccard between snapshots. Drift ppms subtract the
    two already-floored integer ppms (the X220 recipe), so both
    engines agree trivially.

    Scale: the encode is the existing single-scan fold; the snapshot
    split is a projection of the same scan (pinned once for its two
    consumers — the standing fan-out rule); the type census is ONE
    map-side-combined (type) rollup — |vocab| rows, never the token
    stream twice — and the closing stats fold vocab-sized frames to
    one broadcast row each. Nothing corpus-sized shuffles.

    Reference parity: none (no tokenizer surface in the reference);
    closes the X37/X180 loop flagged in VERDICT r11 #8."""
    enc = _bpe_encoded(spark, sf_dir).select(
        "doc_id", "n_pieces", "n_unk"
    )
    t = load_tables(spark, sf_dir)
    d = t.documents.select(
        "doc_id",
        (F.col("doc_id") % 2).alias("snap"),
        _ctoks(F.col("text")).alias("ws"),
    ).localCheckpoint(eager=True)
    per = (
        d.join(enc, "doc_id")
        .groupBy("snap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("ws")).alias("n_words"),
            F.sum("n_pieces").alias("n_pieces"),
            F.sum("n_unk").alias("n_unk"),
        )
    )

    def side(col: str, s: int):
        return F.sum(F.when(F.col("snap") == s, F.col(col)))

    flat = per.agg(
        side("n_docs", 0).alias("n_docs_a"),
        side("n_docs", 1).alias("n_docs_b"),
        side("n_words", 0).alias("w_a"),
        side("n_words", 1).alias("w_b"),
        side("n_pieces", 0).alias("p_a"),
        side("n_pieces", 1).alias("p_b"),
        side("n_unk", 0).alias("u_a"),
        side("n_unk", 1).alias("u_b"),
    )
    vc = (
        d.select("snap", F.explode("ws").alias("t"))
        .groupBy("t")
        .agg(
            F.count_if(F.col("snap") == 0).alias("ca"),
            F.count_if(F.col("snap") == 1).alias("cb"),
        )
    )
    vs = vc.agg(
        F.count_if(F.col("ca") > 0).alias("types_a"),
        F.count_if(F.col("cb") > 0).alias("types_b"),
        F.count_if((F.col("ca") > 0) & (F.col("cb") > 0)).alias(
            "types_both"
        ),
        F.count_if((F.col("cb") > 0) & (F.col("ca") == 0)).alias(
            "new_types_b"
        ),
        F.coalesce(
            F.sum(F.when(F.col("ca") == 0, F.col("cb"))), F.lit(0)
        ).alias("new_mass_b"),
        F.sum("cb").alias("mass_b"),
    )

    def ppm(x: str, y: str):
        return F.expr(
            f"CAST(CAST({x} AS DECIMAL(38,0)) * 1000000 DIV ({y}) AS LONG)"
        )

    return flat.crossJoin(F.broadcast(vs)).select(
        F.col("n_docs_a").cast("long").alias("n_docs_a"),
        F.col("n_docs_b").cast("long").alias("n_docs_b"),
        F.col("w_a").cast("long").alias("n_words_a"),
        F.col("w_b").cast("long").alias("n_words_b"),
        ppm("p_a", "w_a").alias("fertility_ppm_a"),
        ppm("p_b", "w_b").alias("fertility_ppm_b"),
        (ppm("p_b", "w_b") - ppm("p_a", "w_a")).cast("long").alias(
            "fertility_drift_ppm"
        ),
        ppm("u_a", "p_a").alias("unk_ppm_a"),
        ppm("u_b", "p_b").alias("unk_ppm_b"),
        (ppm("u_b", "p_b") - ppm("u_a", "p_a")).cast("long").alias(
            "unk_drift_ppm"
        ),
        F.col("types_a").cast("long").alias("types_a"),
        F.col("types_b").cast("long").alias("types_b"),
        F.col("new_types_b").cast("long").alias("new_types_b"),
        ppm("new_mass_b", "mass_b").alias("new_type_token_ppm"),
        ppm("types_both", "types_a + types_b - types_both").alias(
            "vocab_jaccard_ppm"
        ),
    )


# --------------------------------------------------------------------------
# X249 — term burstiness census (Church & Gale): variance-to-mean ratio
# of per-document term counts.
# --------------------------------------------------------------------------


@query(
    "token_burstiness",
    oracle=f"""
    WITH ex AS (
      SELECT doc_id, unnest({_DUCK_CTOKS}) AS t FROM documents
    ),
    tf AS (SELECT doc_id, t, COUNT(*) AS c FROM ex GROUP BY 1, 2),
    st AS (
      SELECT t AS term,
             CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(c) AS BIGINT) AS total_cnt,
             CAST(SUM(c * c) AS BIGINT) AS ss
      FROM tf GROUP BY 1
    ),
    nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents)
    SELECT term, df, total_cnt,
           ROUND(CAST(total_cnt AS DOUBLE) / df, 6) AS per_doc_rate,
           ROUND((ss - CAST(total_cnt AS DOUBLE) * total_cnt / n_docs)
                 / total_cnt, 6) AS vmr
    FROM st CROSS JOIN nd
    WHERE df >= 5
    ORDER BY (ss - CAST(total_cnt AS DOUBLE) * total_cnt / n_docs)
             / total_cnt DESC, term
    LIMIT 200
    """,
)
def token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church & Gale burstiness: the variance-to-mean ratio (VMR) of a
    term's per-document count across the corpus. Poisson-distributed
    (content-free) terms sit at VMR ~= 1; bursty terms — topical words
    that recur heavily inside the few docs they touch — sit far above,
    and a VMR census separates them from stopwords with the same total
    count. A curation pipeline reads it two ways: high-VMR terms are
    template/boilerplate suspects when shared across sources, and
    quality-signal candidates when not (X178's repetition flags work
    per-doc; this is the corpus-level view).

    VMR needs per-doc counts INCLUDING zeros; materializing the zero
    cells is |vocab| x |docs| and never runs. Instead everything folds
    from three absolutely-summable integers per term — df, sum(c),
    sum(c^2): mean = n/N, var = ss/N - (n/N)^2, so
    VMR = var/mean = (ss - n^2/N)/n — one pass, exact integers until a
    single fixed-order double expression both engines share (standing
    float rule: ulp-identical rational arithmetic, rounded at 6).

    Engine: explode clean tokens -> (doc, term) partial-agg count ->
    per-term rollup (map-side combinable both stages) -> broadcast the
    one-row doc count. Top-200 by exact VMR (term tie-break) keeps the
    output fixed-size at any corpus scale.

    Scale: two shuffles (doc+term cells, then term rollup); corpus
    text never shuffles — only (hash-sized term, 3 longs) rows do. The
    global top-k is a TakeOrderedAndProject, no full sort."""
    t = load_tables(spark, sf_dir)
    ex = t.documents.select(
        "doc_id", F.explode(_ctoks(F.col("text"))).alias("term")
    )
    tf = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    st = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("c").alias("total_cnt"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    nd = t.documents.select(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    vmr = (
        F.col("ss")
        - F.col("total_cnt").cast("double")
        * F.col("total_cnt")
        / F.col("n_docs")
    ) / F.col("total_cnt")
    return (
        st.crossJoin(F.broadcast(nd))
        .filter(F.col("df") >= 5)
        .withColumn("__vmr", vmr)
        .orderBy(F.col("__vmr").desc(), "term")
        .limit(200)
        .select(
            "term",
            "df",
            "total_cnt",
            F.round(
                F.col("total_cnt").cast("double") / F.col("df"), 6
            ).alias("per_doc_rate"),
            F.round("__vmr", 6).alias("vmr"),
        )
    )
