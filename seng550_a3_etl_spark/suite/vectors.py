"""Embedding similarity-search suite queries (north-star extension),
oracle-checked: DuckDB recomputes the identical double-precision cosine
(elements cast to double before multiply, sequential sums) and the
identical deterministic ranking (round(cos,6) DESC, id ASC)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seng550_a3_etl_spark.catalog import load_tables
from seng550_a3_etl_spark.operators.similarity import cosine_topk, ivf_topk
from seng550_a3_etl_spark.plans.layout import spread_for_cpu
from seng550_a3_etl_spark.suite.registry import query

# Sign-LSH scale knobs for embedding_cosine_dedup — single-sourced so
# the suite query, its DuckDB oracle (interpolated below), and
# scripts/profile_10x.py can never drift apart on a re-parameterization
# (round 6's 32/4 -> 96/6 keyspace fix is exactly such a change).
COSINE_DEDUP_PLANES = 96
COSINE_DEDUP_BANDS = 6
COSINE_DEDUP_DIM = 64
_CD_ROWS = COSINE_DEDUP_PLANES // COSINE_DEDUP_BANDS  # bits per band key


def _dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
    )


def _cos(a: str, b: str) -> str:
    return (
        f"({_dot(a, b)} / (sqrt({_dot(a, a)}) * sqrt({_dot(b, b)})))"
    )


# The exact brute-force top-5 table and the IVF(nprobe=3) top-5 table
# over the standard (q = vec_id<20, c = corpus, cent = every-50th capped
# at 100) construction feed FOUR queries: X6 embedding_topk, X7
# embedding_topk_ivf, and the X72/X163 recall gates (ann_recall_ivf's
# two arms; ann_recall_ivf_pq and ivf_nprobe_recall_curve's exact arms)
# — before r15 each re-ran the full corpus scoring pass. The RESULTS
# are <= 100 rows each (20 queries x top-5): session-cached like the
# other gold tables (the acceptance-baseline table a vector store
# materializes once per index build); bench.py evicts + times both
# builds as their own [1x, 10x, ratio] rows.
_ANN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _ann_exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(qid, cid, cosine, rank) exact brute-force top-5 — cached."""
    from seng550_a3_etl_spark.suite.text import _evict_stopped_sessions

    _evict_stopped_sessions(_ANN_CACHE)
    key = (spark.sparkContext.applicationId, sf_dir, "exact")
    cached = _ANN_CACHE.get(key)
    if cached is not None:
        return cached
    t = load_tables(spark, sf_dir)
    q = t.embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = t.embeddings.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    out = cosine_topk(q, c, k=5).localCheckpoint(eager=True)
    _ANN_CACHE[key] = out
    return out


def _ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(qid, cid, cosine, rank) IVF nprobe=3 top-5 — cached."""
    from seng550_a3_etl_spark.suite.text import _evict_stopped_sessions

    _evict_stopped_sessions(_ANN_CACHE)
    key = (spark.sparkContext.applicationId, sf_dir, "ivf")
    cached = _ANN_CACHE.get(key)
    if cached is not None:
        return cached
    t = load_tables(spark, sf_dir)
    emb = t.embeddings
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    cent = (
        emb.filter(F.col("vec_id") % 50 == 0)
        .orderBy("vec_id")
        .limit(100)
        .select(F.col("vec_id").alias("bid"), F.col("embedding").alias("bv"))
    )
    out = ivf_topk(q, c, cent, k=5, nprobe=3).localCheckpoint(eager=True)
    _ANN_CACHE[key] = out
    return out


@query(
    "embedding_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv
               FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
    pairs AS (
      SELECT qid, cid, ROUND({_cos('qv', 'cv')}, 6) AS cosine
      FROM q, c WHERE qid != cid
    )
    SELECT qid, cid, cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY qid ORDER BY cosine DESC, cid
      ) AS rank
      FROM pairs
    ) WHERE rank <= 5
    """,
)
def embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for the first 20 vectors as
    queries — the ANN correctness baseline (broadcast queries, corpus
    scan streams, one window shuffle on qid)."""
    out = _ann_exact_topk(spark, sf_dir)
    return out.select(
        "qid", "cid", "cosine", F.col("rank").cast("long").alias("rank")
    )


@query(
    "embedding_topk_ivf",
    oracle=f"""
    WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
    cent AS (SELECT vec_id AS bid, embedding AS bv
             FROM embeddings WHERE vec_id % 50 = 0
             ORDER BY vec_id LIMIT 100),
    q AS (SELECT vec_id AS qid, embedding AS qv
          FROM embeddings WHERE vec_id < 20),
    assign AS (
      SELECT cid, cv, bid FROM (
        SELECT cid, cv, bid, ROW_NUMBER() OVER (
          PARTITION BY cid ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT cid, cv, bid, ROUND({_cos('cv', 'bv')}, 6) AS sim
              FROM c, cent)
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT qid, qv, bid FROM (
        SELECT qid, qv, bid, ROW_NUMBER() OVER (
          PARTITION BY qid ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT qid, qv, bid, ROUND({_cos('qv', 'bv')}, 6) AS sim
              FROM q, cent)
      ) WHERE rn <= 3
    ),
    pairs AS (
      SELECT qid, cid, ROUND({_cos('qv', 'cv')}, 6) AS cosine
      FROM probes JOIN assign USING (bid) WHERE qid != cid
    )
    SELECT qid, cid, cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY qid ORDER BY cosine DESC, cid
      ) AS rank
      FROM pairs
    ) WHERE rank <= 5
    """,
)
def embedding_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: every 50th vector is a coarse centroid (capped at
    100 — centroid count must stay SUBLINEAR in the corpus or the n·k
    assign step grows quadratically, the superlinearity the sf1
    spot-run caught when seeds scaled with the replica), corpus is
    bucketed by nearest centroid, each query probes its 3 nearest
    buckets. The oracle replays the full quantize→probe→rank pipeline —
    checking the ANN *construction*, not just the arithmetic."""
    out = _ann_ivf_topk(spark, sf_dir)
    return out.select(
        "qid", "cid", "cosine", F.col("rank").cast("long").alias("rank")
    )


@query(
    "embedding_cosine_dedup",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id AS id, embedding AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 100000 AS id,
             list_transform(embedding, x -> ((x::DOUBLE + 0.02)::FLOAT)) AS v
      FROM embeddings WHERE vec_id % 5 = 0
    ),
    planes AS (
      SELECT p, list_transform(range(0, {COSINE_DEDUP_DIM}), i ->
        ((('0x' || substr(md5(p::VARCHAR || ':' || i::VARCHAR), 1, 15))::BIGINT
          % 2000001) / 1000000.0 - 1.0)) AS w
      FROM range(0, {COSINE_DEDUP_PLANES}) t(p)
    ),
    bits AS (
      SELECT c.id, p.p,
             CASE WHEN list_sum(list_transform(range(1, {COSINE_DEDUP_DIM + 1}),
                    i -> c.v[i]::DOUBLE * p.w[i])) >= 0
                  THEN 1 ELSE 0 END AS bit
      FROM corpus c, planes p
    ),
    banded AS (
      SELECT id, p // {_CD_ROWS} AS band,
             SUM(bit * (1 << (p % {_CD_ROWS}))) AS bkey
      FROM bits GROUP BY id, p // {_CD_ROWS}
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id
    )
    SELECT id_a, id_b, ROUND({_cos('va.v', 'vb.v')}, 6) AS cosine
    FROM cand
    JOIN corpus va ON va.id = id_a
    JOIN corpus vb ON vb.id = id_b
    WHERE ROUND({_cos('va.v', 'vb.v')}, 6) >= 0.95
    """,
)
def embedding_cosine_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup tier of the dedup ladder: the corpus is
    the embeddings table plus a deterministically jittered copy of every
    5th vector (+0.02 per element — cosine ~0.988 against its source, so
    the planted duplicates are the expected catch, ~97% of which share
    a band at these parameters); pairs at cosine >= 0.95 are found via
    96-plane / 6-band sign-LSH (16-bit band keys) + exact verify. The
    oracle replays hyperplanes, banding, and verification — checking
    the LSH *construction*, not just the arithmetic.

    Band width is the scale knob: the earlier 32/4 parameterization
    (8-bit keys, 256 buckets per band) SATURATED its keyspace — the
    round-5 sf1 spot measured candidates growing 100× for 10× vectors
    (max bucket 36 → 309, verify 50× wall) because every bucket held
    O(n/256) members. 16-bit keys hold the per-bucket expectation
    ~n/65536, restoring ~linear candidate volume through corpus sizes
    of ~10⁵; beyond that, grow rows-per-band ~log2(n) (and bands to
    hold recall) — the operator takes both as parameters."""
    from seng550_a3_etl_spark.operators.similarity import cosine_dedup_pairs

    t = load_tables(spark, sf_dir)
    base = t.embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    )
    jitter = t.embeddings.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("id"),
        F.transform(
            F.col("embedding"),
            lambda x: (x.cast("double") + F.lit(0.02)).cast("float"),
        ).alias("v"),
    )
    corpus = base.unionAll(jitter)
    return cosine_dedup_pairs(
        corpus, threshold=0.95, planes=COSINE_DEDUP_PLANES,
        bands=COSINE_DEDUP_BANDS, dim=COSINE_DEDUP_DIM,
    )


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    s AS (SELECT vec_id, v,
                 127.0 / NULLIF(list_max(list_transform(v, x -> abs(x))), 0)
                   AS scale
          FROM e)
    SELECT vec_id,
           ROUND(scale, 6) AS scale_r,
           array_to_string(
             list_transform(v, x -> CAST(round(x * scale) AS INT)), ',')
             AS q_vec,
           CAST(list_sum(
             list_transform(v, x -> CAST(round(x * scale) AS INT)))
             AS BIGINT) AS q_sum
    FROM s
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantize the embedding corpus (symmetric, per-vector scale)
    and emit the quantized codes plus a checksum — the compression pass
    a 100 TB embedding store runs before ANN indexing or training-shard
    export. Pure per-row math: no shuffle, codegen end-to-end; the
    oracle recomputes the identical scale and rounding."""
    from seng550_a3_etl_spark.operators.similarity import quantize_int8

    t = load_tables(spark, sf_dir)
    qz = t.embeddings.select(
        "vec_id", quantize_int8(F.col("embedding")).alias("z")
    )
    return qz.select(
        "vec_id",
        F.round("z.scale", 6).alias("scale_r"),
        F.array_join(F.transform("z.q", lambda x: x.cast("string")), ",")
          .alias("q_vec"),
        F.aggregate(
            "z.q", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("q_sum"),
    )


_Q_TERMS = ("spark", "join", "table")
_RRF_K = 60
_TOP_N = 50


def _hybrid_oracle() -> str:
    kw_terms = " + ".join(
        f"COALESCE(len(list_filter(t, x -> x = '{term}')) * n_docs "
        f"/ greatest(len(t), 1) / df_{i}, 0)"
        for i, term in enumerate(_Q_TERMS)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN len(list_filter(t, x -> x = '{term}')) > 0 "
        f"THEN 1 ELSE 0 END) AS df_{i}"
        for i, term in enumerate(_Q_TERMS)
    )
    return rf"""
    WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS t
                  FROM documents),
    stats AS (SELECT COUNT(*) AS n_docs, {df_cols} FROM toks),
    kw AS (
      SELECT doc_id, ROUND({kw_terms}, 6) AS kw_score
      FROM toks, stats
    ),
    kw_ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (
        ORDER BY kw_score DESC, doc_id) AS kw_rank
      FROM kw WHERE kw_score > 0
    ),
    qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
    vec AS (
      SELECT vec_id AS doc_id,
             ROUND({_cos('embedding', 'q')}, 6) AS cosine
      FROM embeddings, qv WHERE vec_id != 0
    ),
    vec_ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (
        ORDER BY cosine DESC, doc_id) AS vec_rank
      FROM vec
    ),
    fused AS (
      SELECT COALESCE(k.doc_id, v.doc_id) AS doc_id,
             k.kw_rank, v.vec_rank,
             ROUND(COALESCE(1.0 / ({_RRF_K} + k.kw_rank), 0)
                   + COALESCE(1.0 / ({_RRF_K} + v.vec_rank), 0), 9) AS rrf
      FROM (SELECT * FROM kw_ranked WHERE kw_rank <= {_TOP_N}) k
      FULL OUTER JOIN
           (SELECT * FROM vec_ranked WHERE vec_rank <= {_TOP_N}) v
        ON k.doc_id = v.doc_id
    )
    SELECT doc_id, kw_rank, vec_rank, rrf FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS final
      FROM fused
    ) WHERE final <= 20
    """


@query("hybrid_retrieval", oracle=_hybrid_oracle())
def hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search (X65): keyword TF-IDF retrieval and embedding
    cosine retrieval fused by reciprocal-rank fusion (RRF, k=60) — the
    standard two-channel retrieval stack (BM25-ish + dense) expressed as
    one DataFrame program: both channels produce a top-N ranked list,
    the fusion is a full-outer join on the doc id, and the final ranking
    is 1/(k+rank_kw) + 1/(k+rank_vec).

    Determinism: term scores are rational chains evaluated left-to-right
    (tf·N/len/df), cosine follows the suite's double-precision sequence,
    ranks are integers, and the RRF terms are single divisions summed in
    a fixed order — every double agrees bit-for-bit cross-engine.

    Scale: both channels prune to top-N BEFORE the fusion join (the
    standard practice — fuse lists, not corpora); the keyword scores
    evaluate in the scan, the cosine channel broadcasts the single query
    vector, and only 2·N rows ever reach the fusion join. The global
    rank windows here sort bounded candidate lists; a multi-query
    deployment ranks per query id exactly like cosine_topk."""
    from seng550_a3_etl_spark.functions.text import tokens
    from seng550_a3_etl_spark.functions.vectors import dot
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    toks = tokens(F.col("text"))

    # closure factory, NOT a default-arg lambda: pyspark derives HOF
    # lambda arity from the Python signature INCLUDING defaults, so
    # `lambda x, term=term` would become the (element, index) form
    def _is(term: str):
        return lambda x: x == F.lit(term)

    counted = t.documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("len"),
        *[
            F.size(F.filter(toks, _is(term))).cast("long").alias(f"c_{i}")
            for i, term in enumerate(_Q_TERMS)
        ],
    )
    stats = counted.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum((F.col(f"c_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(_Q_TERMS))
        ],
    )
    kw_score = None
    for i in range(len(_Q_TERMS)):
        # coalesce: a term with df=0 (absent from the corpus) yields
        # 0/0 → NULL, and NULL + x would poison the whole sum — an
        # absent term must contribute 0, not erase the keyword channel
        term_score = F.coalesce(
            F.col(f"c_{i}")
            * F.col("n_docs")
            / F.greatest(F.col("len"), F.lit(1))
            / F.col(f"df_{i}"),
            F.lit(0.0),
        )
        kw_score = term_score if kw_score is None else kw_score + term_score
    kw = (
        counted.crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(kw_score, 6).alias("kw_score"))
        .filter(F.col("kw_score") > 0)
    )
    w_kw = Window.orderBy(F.desc("kw_score"), F.asc("doc_id"))
    kw_ranked = kw.select(
        "doc_id", F.row_number().over(w_kw).cast("long").alias("kw_rank")
    ).filter(F.col("kw_rank") <= _TOP_N)

    qv = t.embeddings.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    vec = (
        t.embeddings.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                dot(F.col("embedding"), F.col("q"))
                / (
                    F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                    * F.sqrt(dot(F.col("q"), F.col("q")))
                ),
                6,
            ).alias("cosine"),
        )
    )
    w_vec = Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
    vec_ranked = vec.select(
        "doc_id", F.row_number().over(w_vec).cast("long").alias("vec_rank")
    ).filter(F.col("vec_rank") <= _TOP_N)

    fused = (
        kw_ranked.join(vec_ranked, "doc_id", "full_outer")
        .select(
            "doc_id",
            "kw_rank",
            "vec_rank",
            F.round(
                F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("kw_rank")),
                    F.lit(0.0),
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("vec_rank")),
                    F.lit(0.0),
                ),
                9,
            ).alias("rrf"),
        )
    )
    w_final = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("final", F.row_number().over(w_final))
        .filter(F.col("final") <= 20)
        .drop("final")
    )


@query(
    "kmeans_step_clusters",
    oracle=f"""
    WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
    cent AS (SELECT vec_id AS bid, embedding AS bv
             FROM embeddings WHERE vec_id % 100 = 0
             ORDER BY vec_id LIMIT 50),
    assign AS (
      SELECT cid, cv, bid FROM (
        SELECT cid, cv, bid, ROW_NUMBER() OVER (
          PARTITION BY cid ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT cid, cv, bid, ROUND({_cos('cv', 'bv')}, 6) AS sim
              FROM c, cent)
      ) WHERE rn = 1
    ),
    ex AS (
      SELECT bid, i AS dim,
             CAST(ROUND(cv[CAST(i AS INT)]::DOUBLE * 1000000) AS BIGINT)
               AS micro
      FROM assign, range(1, 65) t(i)
    ),
    sums AS (
      SELECT bid, dim, SUM(micro) AS s, COUNT(*) AS n
      FROM ex GROUP BY 1, 2
    )
    SELECT bid,
           CAST(MAX(n) AS BIGINT) AS n_members,
           array_to_string(
             list(CAST(CAST(ROUND(s / n) AS BIGINT) AS VARCHAR)
                  ORDER BY dim), ',') AS centroid_q
    FROM sums GROUP BY bid
    """,
)
def kmeans_step_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means E+M step (X66): every 100th vector seeds a
    centroid, the corpus assigns by max cosine (the IVF coarse
    quantizer), and new centroids are element-wise means computed in
    integer micro-units so the result is exact in any summation order —
    the pattern that makes iterative ML reductions oracle-checkable.
    Full Lloyd's iterates this step driver-side; each step is one
    broadcast join + one (cluster, dim) shuffle with map-side partial
    sums (k·dim groups regardless of corpus size)."""
    from seng550_a3_etl_spark.operators.clustering import kmeans_step

    t = load_tables(spark, sf_dir)
    corpus = t.embeddings.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    # k capped (sublinear in the corpus): an E step whose k grows with n
    # costs n·k — quadratic. Real deployments pick k ~ sqrt(n).
    cent = (
        t.embeddings.filter(F.col("vec_id") % 100 == 0)
        .orderBy("vec_id")
        .limit(50)
        .select(F.col("vec_id").alias("bid"), F.col("embedding").alias("bv"))
    )
    out = kmeans_step(corpus, cent)
    return out.select(
        "bid",
        "n_members",
        F.array_join(
            F.col("centroid_micros").cast("array<string>"), ","
        ).alias("centroid_q"),
    )


def _ann_recall_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    return f"""
    WITH exact AS ({ORACLES["embedding_topk"]}),
         approx AS ({ORACLES["embedding_topk_ivf"]})
    SELECT e.qid,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(a.cid) AS BIGINT) AS n_hit,
           COUNT(a.cid) / COUNT(*) AS recall
    FROM exact e
    LEFT JOIN approx a ON a.qid = e.qid AND a.cid = e.cid
    GROUP BY e.qid
    """


@query("ann_recall_ivf", oracle=_ann_recall_oracle())
def ann_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation (X72): per-query recall@5 of the IVF
    probe path against the exact brute-force ranking — the acceptance
    gate every approximate index must pass before it replaces the exact
    scan in a retrieval pipeline (tune nprobe until recall clears the
    bar).

    Scale: both inputs are already top-k-pruned (k rows per query), so
    the comparison join and per-query fold move k·|queries| rows —
    nothing touches the corpus again. recall = hit/total is a small
    integer ratio, bit-identical cross-engine."""
    from seng550_a3_etl_spark.operators.similarity import cosine_topk, ivf_topk

    # both arms ride the session-cached gold tables (r15) — the same
    # construction, sublinear-k cap and seed rule as the X6/X7 queries,
    # so the recall gate grades exactly the index the ivf query serves
    exact = _ann_exact_topk(spark, sf_dir).select("qid", "cid")
    approx = _ann_ivf_topk(spark, sf_dir).select(
        "qid", "cid", F.lit(1).alias("__hit")
    )
    return (
        exact.join(approx, ["qid", "cid"], "left")
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("__hit").alias("n_hit"),
        )
        .select(
            "qid",
            "n_exact",
            "n_hit",
            (F.col("n_hit") / F.col("n_exact")).alias("recall"),
        )
    )


_PQ_M = 4          # subspaces
_PQ_W = 16         # dims per subspace (4 x 16 = 64)
_PQ_SEED_MOD = 256  # every 256th vector seeds a codebook centroid
_PQ_SEED_CAP = 32   # codebook k stays sublinear in the corpus

_PQ_SEEDS_SQL = (
    f"SELECT vec_id AS bid, embedding AS bv FROM embeddings "
    f"WHERE vec_id % {_PQ_SEED_MOD} = 0 ORDER BY vec_id LIMIT {_PQ_SEED_CAP}"
)


def _pq_seeds(emb: DataFrame) -> DataFrame:
    return (
        emb.filter(F.col("vec_id") % _PQ_SEED_MOD == 0)
        .orderBy("vec_id")
        .limit(_PQ_SEED_CAP)
    )


@query(
    "embedding_pq_codes",
    oracle=f"""
    WITH seeds AS ({_PQ_SEEDS_SQL}),
    dists AS (
      SELECT v.vec_id, s.s, c.bid,
             list_sum(list_transform(range(1, {_PQ_W + 1}), i ->
               (CAST(ROUND(v.embedding[CAST(s.s * {_PQ_W} + i AS INT)]::DOUBLE
                           * 1000000) AS BIGINT)
                - CAST(ROUND(c.bv[CAST(s.s * {_PQ_W} + i AS INT)]::DOUBLE
                             * 1000000) AS BIGINT))
               * (CAST(ROUND(v.embedding[CAST(s.s * {_PQ_W} + i AS INT)]::DOUBLE
                             * 1000000) AS BIGINT)
                  - CAST(ROUND(c.bv[CAST(s.s * {_PQ_W} + i AS INT)]::DOUBLE
                               * 1000000) AS BIGINT)))) AS d
      FROM embeddings v, range(0, {_PQ_M}) s(s), seeds c
    ),
    best AS (
      SELECT vec_id, s, bid, d FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id, s ORDER BY d, bid
        ) AS rn FROM dists
      ) WHERE rn = 1
    )
    SELECT vec_id,
           array_to_string(
             list(CAST(bid // {_PQ_SEED_MOD} AS VARCHAR) ORDER BY s),
             ',') AS codes,
           CAST(SUM(d) AS BIGINT) AS err_micro2
    FROM best GROUP BY vec_id
    """,
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (X92): each 64-dim vector becomes
    4 codebook codes (one per 16-dim subspace, nearest centroid by L2)
    plus its total quantization distortion — the compressed-domain
    representation IVF-PQ indexes search over, and the missing rung of
    the ANN family between int8 quantization (X31, no codebook) and
    the IVF coarse quantizer (X7, one code per whole vector). Every
    256th vector seeds the codebook (k-means-trained codebooks drop in
    via X66); distances are summed in integer micro-units so the
    argmin and distortion are exact cross-engine.

    Scale: the codebook (m·k subvectors) BROADCASTS; the subspace
    explode and distance fold are scan-stage array math inside
    codegen; the per-(vector, subspace) argmin is a struct-min
    aggregate (map-side combined, no window sort) and the final
    per-vector regroup moves m rows per vector. The corpus is scanned
    once and never joins against itself."""
    from seng550_a3_etl_spark.operators.similarity import pq_encode

    t = load_tables(spark, sf_dir)
    emb = t.embeddings
    seeds = _pq_seeds(emb)
    enc = pq_encode(emb, seeds, dim=_PQ_M * _PQ_W, m=_PQ_M)
    code = (F.col("code_id") / _PQ_SEED_MOD).cast("long")
    return (
        enc.select(
            "vec_id",
            F.struct(F.col("sub_id"), code.alias("code")).alias("__sc"),
            "dist_micro2",
        )
        .groupBy("vec_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("__sc")),
                    lambda s: s["code"].cast("string"),
                ),
                ",",
            ).alias("codes"),
            F.sum("dist_micro2").alias("err_micro2"),
        )
    )


@query(
    "pq_adc_topk",
    oracle=f"""
    WITH seeds AS ({_PQ_SEEDS_SQL}),
    dists AS (
      SELECT v.vec_id, s.s, c.bid,
             list_sum(list_transform(range(1, {_PQ_W + 1}), i ->
               (CAST(ROUND(v.embedding[CAST(s.s * {_PQ_W} + i AS INT)]::DOUBLE
                           * 1000000) AS BIGINT)
                - CAST(ROUND(c.bv[CAST(s.s * {_PQ_W} + i AS INT)]::DOUBLE
                             * 1000000) AS BIGINT))
               * (CAST(ROUND(v.embedding[CAST(s.s * {_PQ_W} + i AS INT)]::DOUBLE
                             * 1000000) AS BIGINT)
                  - CAST(ROUND(c.bv[CAST(s.s * {_PQ_W} + i AS INT)]::DOUBLE
                               * 1000000) AS BIGINT)))) AS d
      FROM embeddings v, range(0, {_PQ_M}) s(s), seeds c
    ),
    codes AS (
      SELECT vec_id, s, bid FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id, s ORDER BY d, bid
        ) AS rn FROM dists
      ) WHERE rn = 1
    ),
    qlut AS (
      SELECT vec_id AS qid, s, bid, d FROM dists WHERE vec_id < 20
    ),
    approx AS (
      SELECT l.qid, c.vec_id AS cid, CAST(SUM(l.d) AS BIGINT) AS approx_micro2
      FROM codes c JOIN qlut l ON l.s = c.s AND l.bid = c.bid
      GROUP BY 1, 2
    )
    SELECT qid, cid, approx_micro2 FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY qid ORDER BY approx_micro2, cid
      ) AS rn FROM approx
    ) WHERE rn <= 5
    """,
)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes (X93): retrieval in the
    COMPRESSED domain — each query precomputes one m·k lookup table of
    subspace distances to every codebook centroid, and a stored
    vector's approximate distance is just the sum of m table lookups
    on its codes. The raw corpus vectors are never touched at query
    time; this is the search half of IVF-PQ (X92 is the build half,
    X72's recall-gate pattern is the acceptance test).

    Scale: the per-query LUTs (|q|·m·k rows of longs) BROADCAST; the
    codes table scans once, each code row fanning out only to the
    queries (the ADC scan — linear in |corpus|·m·|q|, which IVF
    bucketing prunes in a full IVF-PQ deployment); the per-(query,
    candidate) sum partial-aggregates map-side and the final top-k is
    a bounded per-query window over already-reduced rows."""
    from pyspark.sql.window import Window

    from seng550_a3_etl_spark.operators.similarity import (
        pq_distances,
        pq_encode,
    )

    t = load_tables(spark, sf_dir)
    emb = t.embeddings
    seeds = _pq_seeds(emb)
    dim = _PQ_M * _PQ_W
    codes = pq_encode(emb, seeds, dim=dim, m=_PQ_M).select(
        F.col("vec_id").alias("cid"), "sub_id", "code_id"
    )
    qlut = pq_distances(
        emb.filter(F.col("vec_id") < 20), seeds, dim=dim, m=_PQ_M
    ).select(
        F.col("vec_id").alias("qid"), "sub_id", "code_id", "dist_micro2"
    )
    approx = (
        codes.join(F.broadcast(qlut), ["sub_id", "code_id"])
        .groupBy("qid", "cid")
        .agg(F.sum("dist_micro2").alias("approx_micro2"))
    )
    w = Window.partitionBy("qid").orderBy("approx_micro2", "cid")
    return (
        approx.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 5)
        .select("qid", "cid", "approx_micro2")
    )


@query(
    "label_embedding_dispersion",
    oracle="""
    WITH u AS (
      SELECT label,
             list_transform(embedding, x -> CAST(ROUND(
               x::DOUBLE / sqrt(list_sum(list_transform(
                 embedding, y -> y::DOUBLE * y::DOUBLE)))
               * 1000000) AS BIGINT)) AS um
      FROM embeddings
      WHERE list_sum(list_transform(embedding, y -> y::DOUBLE * y::DOUBLE)) > 0
    ),
    perdim AS (
      SELECT label, i AS dim, SUM(um[CAST(i AS INT)]) AS s
      FROM u, range(1, 65) t(i) GROUP BY 1, 2
    ),
    s2 AS (
      SELECT label,
             SUM(CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0))) AS ssq
      FROM perdim GROUP BY 1
    ),
    diag AS (
      SELECT label, COUNT(*) AS n,
             SUM(list_sum(list_transform(um, x -> x * x))) AS d
      FROM u GROUP BY 1
    )
    SELECT label,
           CAST(n AS BIGINT) AS n_vecs,
           CASE WHEN n > 1 THEN ROUND(
             CAST(ssq - CAST(d AS DECIMAL(38,0)) AS DOUBLE)
             / (CAST(n AS DOUBLE) * (n - 1) * 1000000000000.0), 6)
           END AS mean_pairwise_cos
    FROM s2 JOIN diag USING (label)
    """,
)
def label_embedding_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-space dispersion (X99): the mean pairwise
    cosine similarity inside each label, the curation diagnostic for
    class redundancy — a label whose members all point the same way
    (mean cos → 1) is near-duplicate-heavy or template-generated, one
    near 0 is diverse. Computed WITHOUT forming pairs via the centroid
    identity over unit vectors: sum of all pairwise dots =
    ||Σu||² − Σ||u||², so the per-label cost is one vector sum, never
    C(n,2) — the only way the statistic exists at 100 TB.

    Determinism: each vector normalizes per-row (sequential fold, both
    engines identical) and quantizes to integer micros BEFORE the
    cross-row sums; ||Σu||² is decimal(38,0) arithmetic on exact
    integer per-dim sums (longs overflow at (5e9)²), so partitioning
    cannot change a bit. Singleton labels emit NULL.

    Scale: per-(label, dim) partial sums map-side combine (k·64 groups
    regardless of corpus size — the kmeans M-step shuffle shape); the
    diagonal term folds per-row in the scan."""
    from pyspark.sql.window import Window  # noqa: F401  (parity w/ siblings)

    t = load_tables(spark, sf_dir)
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(dv, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    um = F.transform(
        dv, lambda x: F.round(x / norm * 1_000_000).cast("long")
    )
    # norm > 0 ⟺ max|x| > 0: the cheap single-pass form — written as
    # norm > 0 the pushed scan DataFilter re-evaluated the whole norm
    # fold per row on top of the projection's own evaluation (the
    # X216/X222 pathology); spread restores scan parallelism for the
    # per-row normalize/quantize folds (standing HOF rule).
    u = spread_for_cpu(
        t.embeddings.filter(
            F.array_max(F.transform("embedding", lambda x: F.abs(x))) > 0
        )
    ).select("label", um.alias("um"))
    perdim = (
        u.select("label", F.posexplode("um").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.sum("v").alias("s"))
    )
    dec = F.col("s").cast("decimal(38,0)")
    s2 = perdim.groupBy("label").agg(F.sum(dec * dec).alias("ssq"))
    diag = (
        u.select(
            "label",
            F.aggregate(
                "um", F.lit(0).cast("long"), lambda acc, x: acc + x * x
            ).alias("d2"),
        )
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("d2").alias("d"))
    )
    return s2.join(diag, "label").select(
        "label",
        F.col("n").cast("long").alias("n_vecs"),
        F.when(
            F.col("n") > 1,
            F.round(
                (F.col("ssq") - F.col("d").cast("decimal(38,0)")).cast(
                    "double"
                )
                / (F.col("n").cast("double") * (F.col("n") - 1) * 1e12),
                6,
            ),
        ).alias("mean_pairwise_cos"),
    )


@query(
    "hard_negative_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS ql
               FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS cid, embedding AS cv, label AS cl
               FROM embeddings),
    pairs AS (
      SELECT qid, cid, ROUND({_cos('qv', 'cv')}, 6) AS cosine
      FROM q, c WHERE qid != cid AND ql != cl
    )
    SELECT qid, cid, cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY qid ORDER BY cosine DESC, cid
      ) AS rank
      FROM pairs
    ) WHERE rank <= 3
    """,
)
def hard_negative_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (X111): per anchor, the top-3 most-similar
    vectors with a DIFFERENT label — the negatives that actually move a
    contrastive/retrieval loss (random negatives are trivially far;
    same-label neighbors are false negatives and must be excluded
    BEFORE ranking, not after — a post-rank filter silently returns
    fewer than k and admits rank gaps).

    Scale: the label-mismatch predicate pushes into cosine_topk's scan
    stage (filtered pairs never pay the dot product); anchors broadcast,
    the corpus streams, one window shuffle on the anchor id — the X6
    brute-force shape, so the IVF path (X7) drops in when the corpus
    outgrows a scan."""
    t = load_tables(spark, sf_dir)
    q = t.embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("ql"),
    )
    c = t.embeddings.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cv"),
        F.col("label").alias("cl"),
    )
    out = cosine_topk(
        q, c, k=3, pair_filter=F.col("ql") != F.col("cl")
    )
    return out.select(
        "qid", "cid", "cosine", F.col("rank").cast("long").alias("rank")
    )


@query(
    "embedding_pca_step",
    oracle="""
    WITH e AS (
      SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    d AS (SELECT v, list_sum(v) AS dot FROM e),
    c AS (
      SELECT j - 1 AS dim_idx,
             CAST(round(dot * v[j] * 1000000) AS BIGINT) AS cj
      FROM d CROSS JOIN range(1, 65) t(j)
    ),
    w AS (SELECT dim_idx, SUM(cj) AS w_micro FROM c GROUP BY 1),
    n AS (
      SELECT SUM(w_micro::HUGEINT * w_micro::HUGEINT) AS n2,
             SUM(w_micro) AS tot
      FROM w
    )
    SELECT w.dim_idx, CAST(w.w_micro AS BIGINT) AS w_micro,
           ROUND(w.w_micro / sqrt(CAST(n2 AS DOUBLE)), 6) AS v_next,
           ROUND(tot / 64000000.0, 4) AS eig_est
    FROM w CROSS JOIN n
    """,
)
def embedding_pca_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X142 — one power-iteration step toward the corpus's top principal
    component: w = Σ_rows (x·v₀)·x from the deterministic all-ones start
    v₀, emitted per dimension with the normalized next vector and the
    Rayleigh-quotient estimate — the PCA/whitening primitive an
    embedding store runs before ANN indexing or drift analysis, in the
    same driver-iterated family as kmeans_step and pagerank_step (each
    step bounded, no corpus-sized driver state).

    Determinism is the X69 integer-quantization pattern: each row's
    per-dimension contribution (x·v₀)·x_j is rounded to integer MICROS
    before the distributed sum, so the reduction is order-independent
    and engine-exact; the norm comes from an exact decimal(38)/HUGEINT
    sum of squares, and the only floats are one sqrt and two rounded
    divisions. Scale: contributions are per-row arithmetic (no
    shuffle), the sum is a 64-key rollup with map-side combine, and the
    norm is a 1-row broadcast — per step the shuffle carries 64 longs
    per partition regardless of corpus size."""
    t = load_tables(spark, sf_dir)
    v = F.transform("embedding", lambda x: x.cast("double"))
    dot = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x)
    contrib = F.transform(
        "v", lambda x: F.round(F.col("__dot") * x * 1e6).cast("long")
    )
    w = (
        t.embeddings.select(v.alias("v"), dot.alias("__dot"))
        .select(F.posexplode(contrib).alias("dim_idx", "cj"))
        .groupBy("dim_idx")
        .agg(F.sum("cj").alias("w_micro"))
    )
    dec = F.col("w_micro").cast("decimal(38,0)")
    norms = w.agg(
        F.sum(dec * dec).alias("n2"), F.sum("w_micro").alias("tot")
    )
    return w.crossJoin(F.broadcast(norms)).select(
        F.col("dim_idx").cast("long").alias("dim_idx"),
        F.col("w_micro").cast("long").alias("w_micro"),
        F.round(
            F.col("w_micro") / F.sqrt(F.col("n2").cast("double")), 6
        ).alias("v_next"),
        F.round(F.col("tot") / F.lit(64000000.0), 4).alias("eig_est"),
    )


# IVF-PQ combined search knobs (X160) — same coarse-quantizer rule as
# embedding_topk_ivf (X7) and the same codebook rule as the PQ family.
_IVF_CENT_MOD = 50
_IVF_CENT_CAP = 100
_IVF_NPROBE = 3


@query(
    "ivf_pq_search",
    oracle=f"""
    WITH seeds AS ({_PQ_SEEDS_SQL}),
    cent AS (SELECT vec_id AS bid, embedding AS bv
             FROM embeddings WHERE vec_id % {_IVF_CENT_MOD} = 0
             ORDER BY vec_id LIMIT {_IVF_CENT_CAP}),
    c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
    q AS (SELECT vec_id AS qid, embedding AS qv
          FROM embeddings WHERE vec_id < 20),
    assign AS (
      SELECT cid, bid FROM (
        SELECT cid, bid, ROW_NUMBER() OVER (
          PARTITION BY cid ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT cid, bid, ROUND({_cos('cv', 'bv')}, 6) AS sim
              FROM c, cent)
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT qid, bid FROM (
        SELECT qid, bid, ROW_NUMBER() OVER (
          PARTITION BY qid ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT qid, bid, ROUND({_cos('qv', 'bv')}, 6) AS sim
              FROM q, cent)
      ) WHERE rn <= {_IVF_NPROBE}
    ),
    dists AS (
      SELECT v.vec_id, s.s, cdb.kid,
             list_sum(list_transform(range(1, {_PQ_W + 1}), i ->
               (CAST(ROUND(v.embedding[CAST(s.s * {_PQ_W} + i AS INT)]::DOUBLE
                           * 1000000) AS BIGINT)
                - CAST(ROUND(cdb.bv[CAST(s.s * {_PQ_W} + i AS INT)]::DOUBLE
                             * 1000000) AS BIGINT))
               * (CAST(ROUND(v.embedding[CAST(s.s * {_PQ_W} + i AS INT)]::DOUBLE
                             * 1000000) AS BIGINT)
                  - CAST(ROUND(cdb.bv[CAST(s.s * {_PQ_W} + i AS INT)]::DOUBLE
                               * 1000000) AS BIGINT)))) AS d
      FROM embeddings v, range(0, {_PQ_M}) s(s),
           (SELECT bid AS kid, bv FROM seeds) cdb
    ),
    codes AS (
      SELECT vec_id, s, kid FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id, s ORDER BY d, kid
        ) AS rn FROM dists
      ) WHERE rn = 1
    ),
    qlut AS (
      SELECT vec_id AS qid, s, kid, d FROM dists WHERE vec_id < 20
    ),
    cand AS (
      SELECT p.qid, a.cid
      FROM probes p JOIN assign a USING (bid)
      WHERE p.qid <> a.cid
    ),
    approx AS (
      SELECT cd.qid, cd.cid, CAST(SUM(l.d) AS BIGINT) AS approx_micro2
      FROM cand cd
      JOIN codes k ON k.vec_id = cd.cid
      JOIN qlut l ON l.qid = cd.qid AND l.s = k.s AND l.kid = k.kid
      GROUP BY 1, 2
    )
    SELECT qid, cid, approx_micro2, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY qid ORDER BY approx_micro2, cid
      ) AS rank FROM approx
    ) WHERE rank <= 5
    """,
)
def ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF-PQ retrieval (X160) — the production-ANN rung X93's
    docstring names as missing: the IVF coarse quantizer PRUNES (each
    query ADC-scores only its {nprobe} probed buckets' members) and PQ
    compresses (candidates score as m LUT lookups; raw corpus vectors
    are never touched at query time). Composes the already-verified
    pieces: X7's assign/probe (round(cos,6) determinism), X92's
    encode, X93's integer-micro ADC.

    Scale: the bucketed code table — codes ⟕ coarse assignment on the
    vector id — is the INVERTED-LIST INDEX a deployment builds once
    and stores partitioned by bucket (pinned here with
    ``localCheckpoint``, the persisted-index model the incremental-LSH
    query also uses); the per-query work joins it to a broadcast
    (qid, bid) probe set — partition-pruned in a bucket-partitioned
    layout — then to the broadcast m·k LUT, and partial-aggregates the
    per-(query, candidate) sums map-side. Nothing corpus-sized ever
    shuffles at query time; candidate count is |q|·nprobe·avg-bucket,
    not |q|·|corpus|."""
    from pyspark.sql.window import Window

    from seng550_a3_etl_spark.operators.similarity import (
        _pair_cosine,
        _with_norm,
        assign_buckets,
        pq_distances,
        pq_encode,
    )

    t = load_tables(spark, sf_dir)
    emb = t.embeddings
    dim = _PQ_M * _PQ_W
    seeds = _pq_seeds(emb)
    cent = (
        emb.filter(F.col("vec_id") % _IVF_CENT_MOD == 0)
        .orderBy("vec_id")
        .limit(_IVF_CENT_CAP)
        .select(F.col("vec_id").alias("bid"), F.col("embedding").alias("bv"))
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )

    # ---- index build (amortized in production, pinned here) ----
    buckets = assign_buckets(c, cent).select("cid", "bid")
    codes = pq_encode(emb, seeds, dim=dim, m=_PQ_M).select(
        F.col("vec_id").alias("cid"), "sub_id", "code_id"
    )
    inverted = codes.join(buckets, "cid").localCheckpoint(eager=True)

    # ---- query path: broadcast probes + broadcast LUT only ----
    probes = (
        _with_norm(q, "qv", "__qn")
        .join(F.broadcast(_with_norm(cent, "bv", "__bn")))
        .withColumn("__sim", _pair_cosine("qv", "bv", "__qn", "__bn"))
        .withColumn(
            "__pr",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("__sim"), F.asc("bid"))
            ),
        )
        .filter(F.col("__pr") <= _IVF_NPROBE)
        .select("qid", "bid")
    )
    qlut = pq_distances(
        emb.filter(F.col("vec_id") < 20), seeds, dim=dim, m=_PQ_M
    ).select(F.col("vec_id").alias("qid"), "sub_id", "code_id", "dist_micro2")
    approx = (
        inverted.join(F.broadcast(probes), "bid")
        .filter(F.col("qid") != F.col("cid"))
        .join(F.broadcast(qlut), ["qid", "sub_id", "code_id"])
        .groupBy("qid", "cid")
        .agg(F.sum("dist_micro2").alias("approx_micro2"))
    )
    w = Window.partitionBy("qid").orderBy("approx_micro2", "cid")
    return (
        approx.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("qid", "cid", "approx_micro2", "rank")
    )


def _ann_recall_pq_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    return f"""
    WITH exact AS ({ORACLES["embedding_topk"]}),
         approx AS ({ORACLES["ivf_pq_search"]})
    SELECT e.qid,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(a.cid) AS BIGINT) AS n_hit,
           CAST(COUNT(a.cid) * 1000000 // COUNT(*) AS BIGINT) AS recall_ppm
    FROM exact e
    LEFT JOIN approx a ON a.qid = e.qid AND a.cid = e.cid
    GROUP BY e.qid
    """


@query("ann_recall_ivf_pq", oracle=_ann_recall_pq_oracle())
def ann_recall_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall gate for the COMPRESSED-domain path (X163, X160's
    acceptance artifact; VERDICT r7/r8 #5): per-query recall@5 of the combined
    IVF-PQ retrieval (coarse prune + ADC scan, ``ivf_pq_search``)
    against the exact brute-force cosine ranking. X72 gates the
    IVF-only rung — this gates the rung a deployment actually ships,
    where BOTH approximations stack (bucket pruning can miss a true
    neighbor's bucket; PQ quantization can misrank within a bucket).
    Tune nprobe / codebook size until recall clears the bar before the
    compressed index replaces the exact scan.

    recall is emitted as exact integer parts-per-million
    (hits·1e6 DIV k) so the comparison is bit-stable cross-engine.

    Scale: both inputs are already top-k-pruned (k rows per query) —
    the gate joins and folds k·|queries| rows; nothing touches the
    corpus beyond what the two graded queries already do."""
    exact = embedding_topk(spark, sf_dir).select("qid", "cid")
    approx = ivf_pq_search(spark, sf_dir).select(
        "qid", "cid", F.lit(1).alias("__hit")
    )
    return (
        exact.join(approx, ["qid", "cid"], "left")
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.count("__hit").cast("long").alias("n_hit"),
        )
        .select(
            "qid",
            "n_exact",
            "n_hit",
            F.expr("n_hit * 1000000 DIV n_exact").alias("recall_ppm"),
        )
    )


_SEMDEDUP_THRESHOLD = 0.95
# Coarse-quantizer centroid set for the SemDeDup PAIR builders: every
# 100th vector, capped at ceil(sqrt(n)) — cell count must grow with the
# corpus or in-cell pair volume Σ C(|cell|,2) is quadratic (fixed k=50
# gives n²/2k; sqrt-scaled k gives the n^1.5 SemDeDup operating point,
# the same capacity rule the r10 kmeans seed fix applied). At the
# driver-checked scales the %100 candidate pool (n/100 < sqrt(n) for
# n < 10^4) binds first, so results are unchanged there; the cap
# engages exactly where the sf1 spot measures. Assignment-only queries
# (cluster_purity, prototypicality) keep the fixed cap — their n·k cost
# is linear and a stable k is the point.
_SEMDEDUP_CENT_SQL = """
      SELECT bid, bv FROM (
        SELECT vec_id AS bid, embedding AS bv,
               ROW_NUMBER() OVER (ORDER BY vec_id) AS rk
        FROM embeddings WHERE vec_id % 100 = 0
      ) WHERE rk <= CEIL(SQRT((SELECT COUNT(*) FROM embeddings)))
"""


def _semdedup_cent(emb: DataFrame) -> DataFrame:
    """The ceil(sqrt(n)) smallest candidate bids (vec_id % 100 pool) —
    SemDeDup's n^1.5 operating point. The cap is a driver-side 1-row
    count (bounded collect) and the pick is orderBy().limit(cap) —
    TakeOrderedAndProject, a data-parallel per-partition top-cap merge.
    ADVICE r11: the previous global row_number Window.orderBy funneled
    the whole %100 pool through ONE task (10^7 rows at 10^9
    embeddings); identical output, parallel plan."""
    import math

    # float sqrt matches the oracle's CEIL(SQRT(n)) bit-for-bit: double
    # sqrt is correctly rounded and cannot cross an integer boundary
    # for non-square n below 2^52.
    cap = math.ceil(math.sqrt(emb.count()))
    return (
        emb.filter(F.col("vec_id") % 100 == 0)
        .select(F.col("vec_id").alias("bid"), F.col("embedding").alias("bv"))
        .orderBy("bid")
        .limit(cap)
    )
# Planted-duplicate corpus (shared with embedding_cosine_dedup): base
# vectors plus a +0.02-jittered copy of every 5th — cosine ~0.988
# against its source, so the expected catch is known.
_SEMDEDUP_CORPUS_SQL = """
      SELECT vec_id AS id, embedding AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 100000 AS id,
             list_transform(embedding, x -> ((x::DOUBLE + 0.02)::FLOAT)) AS v
      FROM embeddings WHERE vec_id % 5 = 0
"""


@query(
    "semantic_dedup_clusters",
    oracle=f"""
    WITH corpus AS ({_SEMDEDUP_CORPUS_SQL}),
    cent AS ({_SEMDEDUP_CENT_SQL}),
    assign AS (
      SELECT id, v, bid FROM (
        SELECT id, v, bid, ROW_NUMBER() OVER (
          PARTITION BY id ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT id, v, bid, ROUND({_cos('v', 'bv')}, 6) AS sim
              FROM corpus, cent)
      ) WHERE rn = 1
    ),
    pairs AS (
      SELECT a.bid, a.id AS id_a, b.id AS id_b,
             ROUND({_cos('a.v', 'b.v')}, 6) AS cosine
      FROM assign a JOIN assign b ON a.bid = b.bid AND a.id < b.id
      WHERE ROUND({_cos('a.v', 'b.v')}, 6) >= {_SEMDEDUP_THRESHOLD}
    )
    SELECT id_b AS id_dropped, bid,
           CAST(COUNT(*) AS BIGINT) AS n_dups,
           MAX(cosine) AS best_cos
    FROM pairs GROUP BY id_b, bid
    """,
)
def semantic_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic near-dup pruning (X164, Abbas et al. 2023):
    block by k-means/IVF cluster, compare pairs only within a cluster,
    drop the LATER id of every pair at cosine >= 0.95 (keep-first). The
    planted jittered duplicates (the embedding_cosine_dedup corpus) are
    the expected catch; output is one row per dropped vector with its
    cluster, duplicate count, and best duplicate cosine.

    vs X5 (sign-LSH dedup): the blocking key is the learned semantic
    cluster the embedding store already maintains for IVF — this prunes
    semantically redundant examples, not just near-identical ones, and
    needs no second index. The oracle replays assignment, in-cluster
    pairing, and the keep-first fold.

    Scale: centroids broadcast; ONE corpus shuffle on the cluster id;
    pair volume Σ C(|cell|,2) with k = ceil(sqrt(n)) cells
    (``_semdedup_cent`` — r11: the previous fixed k=50 made pair volume
    n²/100, quadratic; sqrt-scaled cells are SemDeDup's published
    n^1.5 operating point) — never all-pairs."""
    from seng550_a3_etl_spark.operators.similarity import semantic_dedup_pairs

    t = load_tables(spark, sf_dir)
    base = t.embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    )
    jitter = t.embeddings.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("id"),
        F.transform(
            F.col("embedding"),
            lambda x: (x.cast("double") + F.lit(0.02)).cast("float"),
        ).alias("v"),
    )
    corpus = base.unionAll(jitter)
    cent = _semdedup_cent(t.embeddings)
    pairs = semantic_dedup_pairs(
        corpus, cent, threshold=_SEMDEDUP_THRESHOLD, id_col="id", vec_col="v"
    )
    return pairs.groupBy(
        F.col("id_b").alias("id_dropped"), "bid"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_dups"),
        F.max("cosine").alias("best_cos"),
    )


@query(
    "embedding_prototypicality",
    oracle=f"""
    WITH c AS (SELECT vec_id, embedding AS v FROM embeddings),
    cent AS (SELECT vec_id AS bid, embedding AS bv
             FROM embeddings WHERE vec_id % 100 = 0
             ORDER BY vec_id LIMIT 50),
    assign AS (
      SELECT vec_id, bid, sim AS proto_cos FROM (
        SELECT vec_id, bid, sim, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT vec_id, bid, ROUND({_cos('v', 'bv')}, 6) AS sim
              FROM c, cent)
      ) WHERE rn = 1
    )
    SELECT vec_id, bid, proto_cos,
           CAST(rnk AS BIGINT) AS rnk,
           CAST(n_cluster AS BIGINT) AS n_cluster,
           rnk > (n_cluster + 4) // 5 AS keep
    FROM (
      SELECT vec_id, bid, proto_cos,
             ROW_NUMBER() OVER (
               PARTITION BY bid ORDER BY proto_cos DESC, vec_id
             ) AS rnk,
             COUNT(*) OVER (PARTITION BY bid) AS n_cluster
      FROM assign
    )
    """,
)
def embedding_prototypicality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSL-prototype redundancy pruning (X165, the D4 / Sorscher et al.
    recipe): every vector's prototypicality = cosine to its nearest
    cluster centroid; within each cluster the TOP ceil(20%) most
    prototypical examples are marked drop (redundant mass near the
    cluster core teaches the model least), the rest keep. Emits the
    score, per-cluster rank, cluster size, and the keep verdict — the
    pruning table a data-curation run joins back onto the corpus.

    Cutoff arithmetic is exact-integer (rank > (n+4) DIV 5), so the
    verdict is bit-stable cross-engine.

    Scale: centroids broadcast (assignment never shuffles corpus rows);
    ONE shuffle on the cluster id for the rank window — cluster count
    k ~ sqrt(n) bounds every partition."""
    from seng550_a3_etl_spark.operators.similarity import assign_buckets

    t = load_tables(spark, sf_dir)
    corpus = t.embeddings.select("vec_id", F.col("embedding").alias("v"))
    cent = (
        t.embeddings.filter(F.col("vec_id") % 100 == 0)
        .orderBy("vec_id")
        .limit(50)
        .select(F.col("vec_id").alias("bid"), F.col("embedding").alias("bv"))
    )
    assigned = assign_buckets(
        corpus, cent, "vec_id", "v", keep_sim="proto_cos"
    )
    w_rank = Window.partitionBy("bid").orderBy(
        F.desc("proto_cos"), F.asc("vec_id")
    )
    w_all = Window.partitionBy("bid")
    return assigned.select(
        "vec_id",
        "bid",
        "proto_cos",
        F.row_number().over(w_rank).cast("long").alias("rnk"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n_cluster"),
    ).withColumn(
        "keep", F.col("rnk") > F.expr("(n_cluster + 4) DIV 5")
    )


@query(
    "ivf_cell_stats",
    oracle=f"""
    WITH c AS (SELECT vec_id, embedding AS v FROM embeddings),
    cent AS (SELECT vec_id AS bid, embedding AS bv
             FROM embeddings WHERE vec_id % 50 = 0
             ORDER BY vec_id LIMIT 100),
    assign AS (
      SELECT vec_id, bid,
             CAST(ROUND(sim * 1000000) AS BIGINT) AS cos_micro
      FROM (
        SELECT vec_id, bid, sim, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT vec_id, bid, ROUND({_cos('v', 'bv')}, 6) AS sim
              FROM c, cent)
      ) WHERE rn = 1
    ),
    total AS (SELECT COUNT(*) AS n_total FROM assign)
    SELECT bid,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(ROUND(SUM(cos_micro) / COUNT(*)) AS BIGINT)
             AS mean_cos_micro,
           CAST(MIN(cos_micro) AS BIGINT) AS min_cos_micro,
           CAST(COUNT(*) * 1000000 // n_total AS BIGINT) AS share_ppm
    FROM assign, total
    GROUP BY bid, n_total
    """,
)
def ivf_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index health census (X168): per-cell member count, mean and
    worst assignment cosine (micro units — the quantization-residual
    signal), and cell share in ppm — the balance/skew report an ANN
    deployment checks before trusting nprobe-bounded recall (a cell
    holding 10% of the corpus makes every probe of it a scan; a cell
    with low mean cosine means its centroid represents nobody). Seed
    rule matches embedding_topk_ivf exactly, so this grades the index
    that query serves.

    Scale: centroids broadcast; ONE (cell) shuffle with map-side
    partial sums — k groups total; the corpus-count scalar broadcasts
    back. All stats exact-integer."""
    from seng550_a3_etl_spark.operators.similarity import assign_buckets

    t = load_tables(spark, sf_dir)
    corpus = t.embeddings.select("vec_id", F.col("embedding").alias("v"))
    cent = (
        t.embeddings.filter(F.col("vec_id") % 50 == 0)
        .orderBy("vec_id")
        .limit(100)
        .select(F.col("vec_id").alias("bid"), F.col("embedding").alias("bv"))
    )
    assigned = assign_buckets(
        corpus, cent, "vec_id", "v", keep_sim="__sim_r"
    ).select(
        "bid",
        F.round(F.col("__sim_r") * 1000000).cast("long").alias("cos_micro"),
    )
    total = assigned.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        assigned.groupBy("bid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.round(F.sum("cos_micro") / F.count(F.lit(1)))
            .cast("long")
            .alias("mean_cos_micro"),
            F.min("cos_micro").cast("long").alias("min_cos_micro"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "bid",
            "n_members",
            "mean_cos_micro",
            "min_cos_micro",
            F.expr("n_members * 1000000 DIV n_total").alias("share_ppm"),
        )
    )


_NORM_MAD_K = 3  # integer multiplier -> the outlier test is exact-integer


@query(
    "embedding_norm_outliers",
    oracle=f"""
    WITH c AS (
      SELECT vec_id, label,
             CAST(ROUND(sqrt({_dot('embedding', 'embedding')}) * 1000000)
                  AS BIGINT) AS norm_micro
      FROM embeddings
    ),
    med AS (
      SELECT label, MAX(CASE WHEN rn = CEIL(n * 0.5) THEN norm_micro END)
               AS med
      FROM (
        SELECT label, norm_micro,
               ROW_NUMBER() OVER (
                 PARTITION BY label ORDER BY norm_micro, vec_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY label) AS n
        FROM c
      ) GROUP BY label
    ),
    dev AS (
      SELECT c.label, c.vec_id, c.norm_micro, m.med,
             abs(c.norm_micro - m.med) AS ad
      FROM c JOIN med m ON m.label = c.label
    ),
    mad AS (
      SELECT label, MAX(med) AS med,
             MAX(CASE WHEN rn = CEIL(n * 0.5) THEN ad END) AS mad
      FROM (
        SELECT label, med, ad,
               ROW_NUMBER() OVER (
                 PARTITION BY label ORDER BY ad, vec_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY label) AS n
        FROM dev
      ) GROUP BY label
    )
    SELECT d.label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           MAX(a.med) AS median_norm_micro,
           MAX(a.mad) AS mad_norm_micro,
           CAST(COUNT(CASE WHEN d.ad > {_NORM_MAD_K} * a.mad THEN 1 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad a ON a.label = d.label
    GROUP BY d.label
    """,
)
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-store QA census (X171): per-label median L2 norm, MAD,
    and the count of vectors beyond 3·MAD — the robust drift/corruption
    monitor an embedding pipeline runs after every encoder change or
    backfill (a batch of zero/exploded-norm vectors shifts a mean
    silently but never a MAD gate). Norms quantize to integer micros
    BEFORE ranking, both medians are rank-picked, and the threshold
    multiplier is an integer — the entire verdict is exact-integer
    arithmetic (the X115 recipe on vector norms).

    Scale: two sort-within-group passes sharing one label-key
    partitioning + broadcast joins of the |labels|-row median/MAD
    tables back onto the rows."""
    from seng550_a3_etl_spark.functions.vectors import dot

    t = load_tables(spark, sf_dir)
    # c feeds the median window, the deviation join, and (via dev) the
    # MAD window and final fold — pin both fan-out frames or the
    # norm-fold scan replays 5x (plan-audit measured).
    c = t.embeddings.select(
        "vec_id",
        "label",
        F.round(F.sqrt(dot(F.col("embedding"), F.col("embedding"))) * 1000000)
        .cast("long")
        .alias("norm_micro"),
    ).localCheckpoint(eager=True)

    def rank_pick(df: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy("label").orderBy(col, "vec_id")
        wc = Window.partitionBy("label")
        ranked = df.select(
            "label",
            F.col(col),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )
        return ranked.groupBy("label").agg(
            F.max(
                F.when(F.col("rn") == F.ceil(F.col("n") * 0.5), F.col(col))
            ).alias(out)
        )

    med = rank_pick(c, "norm_micro", "med")
    dev = c.join(F.broadcast(med), "label").select(
        "label",
        "vec_id",
        F.abs(F.col("norm_micro") - F.col("med")).alias("ad"),
    ).localCheckpoint(eager=True)
    mad = rank_pick(dev, "ad", "mad").join(
        F.broadcast(med), "label"
    )
    return (
        dev.join(F.broadcast(mad), "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.max("med").alias("median_norm_micro"),
            F.max("mad").alias("mad_norm_micro"),
            F.count(
                F.when(F.col("ad") > _NORM_MAD_K * F.col("mad"), F.lit(1))
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


_KMEANS_ITER_STEPS = 3


def _kmeans_iter_oracle(steps: int = _KMEANS_ITER_STEPS) -> str:
    """Replay ``steps`` full E+M iterations in SQL: each step assigns by
    rounded cosine (tie -> smallest centroid id), means in integer
    micros, and re-derives the next float centroid as micro/1e6 — the
    identical arithmetic the Spark loop runs."""

    def assign(cent: str) -> str:
        return (
            "SELECT cid, cv, bid FROM ("
            "SELECT cid, cv, bid, ROW_NUMBER() OVER ("
            "PARTITION BY cid ORDER BY sim DESC, bid) AS rn "
            f"FROM (SELECT cid, cv, bid, ROUND({_cos('cv', 'bv')}, 6) AS sim "
            f"FROM c, {cent})) WHERE rn = 1"
        )

    blocks = [
        "c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings)",
        "cent0 AS (SELECT vec_id AS bid, embedding AS bv FROM embeddings "
        "ORDER BY vec_id LIMIT 50)",
    ]
    for i in range(1, steps + 1):
        blocks.append(f"a{i} AS ({assign(f'cent{i - 1}')})")
        blocks.append(
            f"s{i} AS (SELECT bid, i AS dim, "
            "SUM(CAST(ROUND(cv[CAST(i AS INT)]::DOUBLE * 1000000) AS BIGINT))"
            " AS s, COUNT(*) AS n "
            f"FROM a{i}, range(1, 65) t(i) GROUP BY 1, 2)"
        )
        blocks.append(
            f"m{i} AS (SELECT bid, CAST(MAX(n) AS BIGINT) AS n_members, "
            "list(CAST(ROUND(s / n) AS BIGINT) ORDER BY dim) AS micros "
            f"FROM s{i} GROUP BY bid)"
        )
        blocks.append(
            f"cent{i} AS (SELECT bid, "
            f"list_transform(micros, m -> m / 1000000.0) AS bv FROM m{i})"
        )
    return (
        "WITH " + ",\n".join(blocks)
        + f""" SELECT bid, n_members,
           array_to_string(
             list_transform(micros, m -> CAST(m AS VARCHAR)), ',')
             AS centroid_q
    FROM m{steps}"""
    )


@query("kmeans_iterated_centroids", oracle=_kmeans_iter_oracle())
def kmeans_iterated_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-iterated spherical k-means, 3 full Lloyd iterations
    (X170): the fixpoint loop X66 is one step of, actually run — seeds
    re-assign and centroids move three times; the oracle replays every
    iteration, so cross-engine agreement proves the LOOP (assignment
    drift, empty-cluster dropout, micro-quantized means) and not just
    one step. This is the canonical Spark iterative-ML shape: bounded
    per-step cost, centroids pinned between steps (localCheckpoint —
    50 rows, truncates the nested-plan growth that otherwise doubles
    the DAG per iteration), corpus re-scanned k times, NEVER collected.

    Scale per step unchanged from X66 (assignment is the zero-exchange
    fold; the M step shuffles (cluster, dim) partials); 3 steps = 3
    bounded passes. k is a FIXED capacity knob here — the seed set is
    the 50 smallest vec_ids, which is scale-stable (the bench's 10×
    replica salts new ids far above the originals), so per-pass work
    is n·k, linear in the corpus. The earlier density recipe
    (vec_id % 100 = 0, LIMIT 50) grew k linearly with the corpus
    through the 1×→10× window, making the sf1 spot measure the knob
    (n·k = n²/100, graded 13.0×), not the engine; sqrt-scaled cell
    counts are the IVF/SemDeDup shape, measured by
    semantic_dedup_clusters' spot instead."""
    from seng550_a3_etl_spark.operators.clustering import kmeans_step
    from seng550_a3_etl_spark.plans.layout import spread_for_cpu

    t = load_tables(spark, sf_dir)
    # Spread + pin the loop-invariant corpus once (the kcenter pattern):
    # kmeans_step's assign fold otherwise re-spreads the under-parallel
    # scan inside every Lloyd iteration — per-iteration shuffles of the
    # same bytes; the persist is what a production iterative job does.
    corpus = spread_for_cpu(
        t.embeddings.select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
        )
    ).localCheckpoint(eager=True)
    cent = (
        t.embeddings.orderBy("vec_id")
        .limit(50)
        .select(F.col("vec_id").alias("bid"), F.col("embedding").alias("bv"))
    )
    step = None
    for _ in range(_KMEANS_ITER_STEPS):
        # checkpoint the step OUTPUT (50 rows): the next E step and the
        # final result both read it without replaying the M-step shuffle
        step = kmeans_step(corpus, cent).localCheckpoint(eager=True)
        cent = step.select(
            "bid",
            F.transform(
                "centroid_micros", lambda m: m / F.lit(1000000.0)
            ).alias("bv"),
        )
    return step.select(
        "bid",
        "n_members",
        F.array_join(
            F.col("centroid_micros").cast("array<string>"), ","
        ).alias("centroid_q"),
    )


@query(
    "knn_label_precision",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS ql
               FROM embeddings WHERE vec_id < 50),
         c AS (SELECT vec_id AS cid, embedding AS cv, label AS cl
               FROM embeddings),
    pairs AS (
      SELECT qid, ql, cid, cl, ROUND({_cos('qv', 'cv')}, 6) AS cosine
      FROM q, c WHERE qid != cid
    ),
    topk AS (
      SELECT qid, ql, cl FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY qid ORDER BY cosine DESC, cid
        ) AS rank
        FROM pairs
      ) WHERE rank <= 5
    )
    SELECT qid,
           CAST(MAX(ql) AS BIGINT) AS label,
           CAST(COUNT(CASE WHEN cl = ql THEN 1 END) AS BIGINT) AS n_same,
           CAST(COUNT(CASE WHEN cl = ql THEN 1 END) * 1000000 // COUNT(*)
                AS BIGINT) AS precision_ppm
    FROM topk GROUP BY qid
    """,
)
def knn_label_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality eval (X173): kNN label precision@5 — for each
    probe vector, the fraction of its 5 nearest neighbors sharing its
    label, in exact integer ppm. THE standard intrinsic metric for an
    embedding space (kNN classification accuracy); run after every
    encoder change, before the store feeds retrieval or dedup.

    Scale: probes broadcast against one corpus scan (the cosine_topk
    shape — the corpus never shuffles rows); the fold moves k·|probes|
    rows. Probe count is the knob; precision is hits·1e6 DIV k,
    bit-stable cross-engine."""
    from seng550_a3_etl_spark.operators.similarity import cosine_topk

    t = load_tables(spark, sf_dir)
    emb = t.embeddings
    q = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("ql"),
    )
    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cv"),
        F.col("label").alias("cl"),
    )
    # carry both labels through the top-k: join them onto the pruned
    # (qid, cid) pairs AFTER ranking so the broadcast scan stays narrow
    topk = cosine_topk(q.select("qid", "qv"), c.select("cid", "cv"), k=5)
    labeled = (
        topk.join(F.broadcast(q.select("qid", "ql")), "qid")
        .join(c.select("cid", "cl"), "cid")
    )
    return (
        labeled.groupBy("qid")
        .agg(
            F.max("ql").cast("long").alias("label"),
            F.count(F.when(F.col("cl") == F.col("ql"), F.lit(1)))
            .cast("long")
            .alias("n_same"),
            F.count(F.lit(1)).alias("__k"),
        )
        .select(
            "qid",
            "label",
            "n_same",
            F.expr("n_same * 1000000 DIV __k").alias("precision_ppm"),
        )
    )


@query(
    "cluster_purity",
    oracle=f"""
    WITH c AS (SELECT vec_id, embedding AS v, label FROM embeddings),
    cent AS (SELECT vec_id AS bid, embedding AS bv
             FROM embeddings WHERE vec_id % 100 = 0
             ORDER BY vec_id LIMIT 50),
    assign AS (
      SELECT vec_id, label, bid FROM (
        SELECT vec_id, label, bid, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT vec_id, label, bid, ROUND({_cos('v', 'bv')}, 6) AS sim
              FROM c, cent)
      ) WHERE rn = 1
    ),
    counts AS (
      SELECT bid, label, COUNT(*) AS n FROM assign GROUP BY 1, 2
    ),
    major AS (
      SELECT bid, label AS major_label, n AS n_major FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY bid ORDER BY n DESC, label
        ) AS rn
        FROM counts
      ) WHERE rn = 1
    )
    SELECT m.bid,
           CAST(m.major_label AS BIGINT) AS major_label,
           CAST(m.n_major AS BIGINT) AS n_major,
           CAST(SUM(c2.n) AS BIGINT) AS n_members,
           CAST(m.n_major * 1000000 // SUM(c2.n) AS BIGINT) AS purity_ppm
    FROM major m JOIN counts c2 USING (bid)
    GROUP BY m.bid, m.major_label, m.n_major
    """,
)
def cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality eval (X174): purity of the k-means/IVF cells
    against the ground-truth labels — per cell, the majority label
    (tie -> smallest) and majority share in exact ppm. The acceptance
    check before clusters drive SemDeDup blocking (X164), diversity
    strata, or topic budgets: low-purity cells mean the quantizer is
    mixing concepts and cluster-blocked dedup will compare unrelated
    docs.

    Scale: assignment is the zero-exchange fold; then ONE (cell, label)
    aggregate with map-side combine (k·|labels| groups) and a k-row
    argmax window — nothing corpus-sized shuffles."""
    from seng550_a3_etl_spark.operators.similarity import assign_buckets

    t = load_tables(spark, sf_dir)
    corpus = t.embeddings.select(
        "vec_id", F.col("embedding").alias("v"), "label"
    )
    cent = (
        t.embeddings.filter(F.col("vec_id") % 100 == 0)
        .orderBy("vec_id")
        .limit(50)
        .select(F.col("vec_id").alias("bid"), F.col("embedding").alias("bv"))
    )
    assigned = assign_buckets(
        corpus.select("vec_id", "v"), cent, "vec_id", "v"
    ).join(corpus.select("vec_id", "label"), "vec_id")
    counts = assigned.groupBy("bid", "label").agg(
        F.count(F.lit(1)).alias("n")
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("bid").orderBy(F.desc("n"), F.asc("label"))
    major = (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "bid",
            F.col("label").cast("long").alias("major_label"),
            F.col("n").cast("long").alias("n_major"),
        )
    )
    sizes = counts.groupBy("bid").agg(
        F.sum("n").cast("long").alias("n_members")
    )
    return (
        major.join(sizes, "bid")
        .select(
            "bid",
            "major_label",
            "n_major",
            "n_members",
            F.expr("n_major * 1000000 DIV n_members").alias("purity_ppm"),
        )
    )


_RNN_DOMAIN = 300  # mutual-NN probe subset: both directions fully ranked


@query(
    "reciprocal_nn_pairs",
    oracle=f"""
    WITH c AS (SELECT vec_id AS id, embedding AS v
               FROM embeddings WHERE vec_id < {_RNN_DOMAIN}),
    nn AS (
      SELECT id, nid FROM (
        SELECT a.id, b.id AS nid, ROW_NUMBER() OVER (
          PARTITION BY a.id
          ORDER BY ROUND({_cos('a.v', 'b.v')}, 6) DESC, b.id
        ) AS rn
        FROM c a JOIN c b ON a.id != b.id
      ) WHERE rn = 1
    )
    SELECT x.id AS id_a, x.nid AS id_b
    FROM nn x JOIN nn y ON y.id = x.nid AND y.nid = x.id
    WHERE x.id < x.nid
    """,
)
def reciprocal_nn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual nearest-neighbor pairs (X175): (a, b) where each is the
    other's top-1 cosine neighbor — the high-precision alignment/dedup
    primitive (bitext mining, cross-encoder candidate seeding) that
    survives where one-directional NN is noisy. Computed exactly over a
    bounded probe subset; at corpus scale the same mutual-join runs
    over the ANN top-1 table (X7/X160's output) instead of the exact
    ranking — the composition is identical from the nn table on.

    Scale: the nn build is the cosine_topk shape (k=1); the mutuality
    check is a self-join of |domain| 2-column rows; id_a < id_b halves
    the output."""
    from seng550_a3_etl_spark.operators.similarity import cosine_topk

    t = load_tables(spark, sf_dir)
    sub = t.embeddings.filter(F.col("vec_id") < _RNN_DOMAIN)
    q = sub.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    c = sub.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    nn = (
        cosine_topk(q, c, k=1)
        .select(F.col("qid").alias("id"), F.col("cid").alias("nid"))
        .localCheckpoint(eager=True)
    )
    other = nn.select(
        F.col("id").alias("nid"), F.col("nid").alias("__back")
    )
    return (
        nn.join(other, "nid")
        .filter(F.col("__back") == F.col("id"))
        .filter(F.col("id") < F.col("nid"))
        .select(F.col("id").alias("id_a"), F.col("nid").alias("id_b"))
    )


def _semantic_cc_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    return f"""
    WITH RECURSIVE pairs AS (
      SELECT id_a, id_b FROM ({ORACLES['reciprocal_nn_pairs']}) q
    ),
    edges AS (
      SELECT id_a AS s, id_b AS t FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT s, s FROM (SELECT DISTINCT s FROM edges) t1
      UNION
      SELECT e.s, r.label FROM reach r JOIN edges e ON e.t = r.node
    ),
    comp AS (SELECT node, MIN(label) AS canonical FROM reach GROUP BY node)
    SELECT v.vec_id AS id, COALESCE(c.canonical, v.vec_id) AS canonical_id
    FROM (SELECT vec_id FROM embeddings WHERE vec_id < {_RNN_DOMAIN}) v
    LEFT JOIN comp c ON c.node = v.vec_id
    """


@query("semantic_cc_clusters", oracle=_semantic_cc_oracle())
def semantic_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic cluster labels (X176): connected components over the
    mutual-NN graph (X175's edges) — every probe vector maps to the min
    id of its mutual-neighbor component (itself when unpaired), the
    cluster key a curation run groups on to pick one representative per
    semantic clique (the X25 canonical-keep shape, driven by geometry
    instead of shingles). The oracle computes the same fixpoint as a
    recursive reachability closure, proving the ITERATIVE operator
    end-to-end on vector-derived edges.

    Scale: the edge list is ≤ |domain|/2 rows (mutual top-1 pairs);
    CC's adaptive strategy solves small graphs driver-side and larger
    ones with the co-partitioned min-label loop — same contract as the
    shingle-pair dedup graph (X21)."""
    from seng550_a3_etl_spark.operators.graph import connected_components

    t = load_tables(spark, sf_dir)
    rnn = reciprocal_nn_pairs(spark, sf_dir)
    labels = connected_components(rnn, src="id_a", dst="id_b")
    domain = t.embeddings.filter(F.col("vec_id") < _RNN_DOMAIN).select(
        F.col("vec_id").alias("id")
    )
    return domain.join(
        labels.withColumnRenamed("node", "id"), "id", "left"
    ).select(
        "id", F.coalesce("label", "id").alias("canonical_id")
    )


_SEM_INC_SPLIT = 400  # vec_id < split = persisted index; rest = new batch


@query(
    "incremental_semantic_dedup",
    oracle=f"""
    WITH cent AS (SELECT vec_id AS bid, embedding AS bv
                  FROM embeddings WHERE vec_id % 100 = 0
                  ORDER BY vec_id LIMIT 50),
    idx AS (
      SELECT id, v, bid FROM (
        SELECT vec_id AS id, embedding AS v, bid, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT vec_id, embedding, bid,
                     ROUND({_cos('embedding', 'bv')}, 6) AS sim
              FROM embeddings, cent WHERE vec_id < {_SEM_INC_SPLIT})
      ) WHERE rn = 1
    ),
    batch AS (
      SELECT id, v, bid FROM (
        SELECT vec_id AS id, embedding AS v, bid, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT vec_id, embedding, bid,
                     ROUND({_cos('embedding', 'bv')}, 6) AS sim
              FROM embeddings, cent WHERE vec_id >= {_SEM_INC_SPLIT})
      ) WHERE rn = 1
    ),
    hits AS (
      SELECT b.id, COUNT(*) AS n_index_dups,
             MAX(ROUND({_cos('b.v', 'i.v')}, 6)) AS best_cos
      FROM batch b JOIN idx i ON i.bid = b.bid
      WHERE ROUND({_cos('b.v', 'i.v')}, 6) >= {_SEMDEDUP_THRESHOLD}
      GROUP BY b.id
    )
    SELECT b.id,
           CAST(COALESCE(h.n_index_dups, 0) AS BIGINT) AS n_index_dups,
           h.best_cos,
           h.id IS NULL AS survives
    FROM batch b LEFT JOIN hits h ON h.id = b.id
    """,
)
def incremental_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch semantic dedup against a PERSISTED cluster index
    (X177) — the production entry point for X164, exactly as X109 is
    for the LSH tier: a new ingest batch assigns to the existing coarse
    quantizer's cells and compares ONLY against same-cell index
    members; batch vectors within 0.95 cosine of an indexed vector are
    dropped, the rest survive and would append to the index. Nothing
    ever re-compares the corpus against itself — per-batch cost is
    |batch| assignment folds plus same-cell pair verifies.

    Scale: the index side arrives pre-assigned (its cell id is stored —
    here recomputed only because the fixture has no index table); the
    batch assignment is the zero-exchange fold; the verify join
    shuffles on the cell id with the batch side tiny. The oracle
    replays assignment on both sides and the same-cell verify."""
    from seng550_a3_etl_spark.functions.vectors import dot
    from seng550_a3_etl_spark.operators.similarity import assign_buckets

    t = load_tables(spark, sf_dir)
    cent = (
        t.embeddings.filter(F.col("vec_id") % 100 == 0)
        .orderBy("vec_id")
        .limit(50)
        .select(F.col("vec_id").alias("bid"), F.col("embedding").alias("bv"))
    )
    emb = t.embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    )
    idx = assign_buckets(
        emb.filter(F.col("id") < _SEM_INC_SPLIT), cent, "id", "v"
    ).select("bid", F.col("id").alias("iid"), F.col("v").alias("iv"),
             F.col("__cn").alias("in_"))
    batch = assign_buckets(
        emb.filter(F.col("id") >= _SEM_INC_SPLIT), cent, "id", "v"
    ).select("bid", "id", "v", F.col("__cn").alias("bn")
             ).localCheckpoint(eager=True)
    cos = F.round(
        dot(F.col("v"), F.col("iv")) / (F.col("bn") * F.col("in_")), 6
    )
    hits = (
        batch.join(idx, "bid")
        .withColumn("__cos", cos)
        .filter(F.col("__cos") >= _SEMDEDUP_THRESHOLD)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_index_dups"),
            F.max("__cos").alias("best_cos"),
        )
    )
    return batch.select("id").join(hits, "id", "left").select(
        "id",
        F.coalesce("n_index_dups", F.lit(0)).cast("long").alias(
            "n_index_dups"
        ),
        "best_cos",
        F.col("n_index_dups").isNull().alias("survives"),
    )


_NPROBE_LEVELS = (1, 2, 4, 8)
_NPROBE_SQL = ", ".join(str(p) for p in _NPROBE_LEVELS)


def _nprobe_curve_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    return f"""
    WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
    cent AS (SELECT vec_id AS bid, embedding AS bv
             FROM embeddings WHERE vec_id % 50 = 0
             ORDER BY vec_id LIMIT 100),
    q AS (SELECT vec_id AS qid, embedding AS qv
          FROM embeddings WHERE vec_id < 20),
    assign AS (
      SELECT cid, cv, bid FROM (
        SELECT cid, cv, bid, ROW_NUMBER() OVER (
          PARTITION BY cid ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT cid, cv, bid, ROUND({_cos('cv', 'bv')}, 6) AS sim
              FROM c, cent)
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT qid, qv, bid, rn AS pr FROM (
        SELECT qid, qv, bid, ROW_NUMBER() OVER (
          PARTITION BY qid ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT qid, qv, bid, ROUND({_cos('qv', 'bv')}, 6) AS sim
              FROM q, cent)
      ) WHERE rn <= {max(_NPROBE_LEVELS)}
    ),
    pairs AS (
      SELECT qid, pr, cid, ROUND({_cos('qv', 'cv')}, 6) AS cosine
      FROM probes JOIN assign USING (bid) WHERE qid != cid
    ),
    lv AS (SELECT unnest([{_NPROBE_SQL}]) AS nprobe),
    topk AS (
      SELECT nprobe, qid, cid FROM (
        SELECT l.nprobe, p.qid, p.cid, ROW_NUMBER() OVER (
          PARTITION BY l.nprobe, p.qid ORDER BY p.cosine DESC, p.cid
        ) AS rk
        FROM pairs p JOIN lv l ON p.pr <= l.nprobe
      ) WHERE rk <= 5
    ),
    exact AS (SELECT qid, cid FROM ({ORACLES['embedding_topk']}))
    SELECT l.nprobe,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(t.cid) AS BIGINT) AS n_hit,
           CAST((COUNT(t.cid) * 1000000) // COUNT(*) AS BIGINT)
             AS recall_ppm
    FROM lv l CROSS JOIN exact e
    LEFT JOIN topk t
      ON t.nprobe = l.nprobe AND t.qid = e.qid AND t.cid = e.cid
    GROUP BY l.nprobe
    """


@query("ivf_nprobe_recall_curve", oracle=_nprobe_curve_oracle())
def ivf_nprobe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF tuning curve (X182): recall@5 vs nprobe in {1,2,4,8} from
    ONE shared probe pass — the measurement behind the nprobe knob that
    X72 gates a single point of. The corpus buckets once (zero-exchange
    fold), each query ranks all cells once keeping probe rank <= 8, and
    every candidate pair replicates onto the levels whose probe budget
    admits it (broadcast <=4-row level table, predicate join) — so the
    whole curve costs ONE corpus assignment + one candidate join, not
    one IVF run per level. recall is exact integer ppm.

    Scale: identical candidate-volume contract as ivf_topk at the
    largest level; the exact side is the brute-force baseline every
    recall gate inherently pays (bounded probe set, top-k-pruned
    comparison join)."""
    from seng550_a3_etl_spark.operators.similarity import (
        _pair_cosine,
        _with_norm,
        assign_buckets,
        cosine_topk,
    )

    t = load_tables(spark, sf_dir)
    emb = t.embeddings
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    cent = (
        emb.filter(F.col("vec_id") % 50 == 0)
        .orderBy("vec_id")
        .limit(100)
        .select(F.col("vec_id").alias("bid"), F.col("embedding").alias("bv"))
    )
    bucketed = assign_buckets(c, cent, "cid", "cv")
    probes = (
        _with_norm(q, "qv", "__qn")
        .join(F.broadcast(_with_norm(cent, "bv", "__bn")))
        .withColumn("__sim", _pair_cosine("qv", "bv", "__qn", "__bn"))
        .withColumn(
            "__pr",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.desc("__sim"), F.asc("bid")
                )
            ),
        )
        .filter(F.col("__pr") <= max(_NPROBE_LEVELS))
        .select("qid", "qv", "__qn", "bid", "__pr")
    )
    pairs = (
        probes.join(bucketed, "bid")
        .filter(F.col("qid") != F.col("cid"))
        .withColumn("cosine", _pair_cosine("qv", "cv", "__qn", "__cn"))
        .select("qid", "__pr", "cid", "cosine")
    )
    levels = spark.range(0).sparkSession.createDataFrame(
        [(p,) for p in _NPROBE_LEVELS], "nprobe int"
    )
    topk = (
        pairs.join(F.broadcast(levels), F.col("__pr") <= F.col("nprobe"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("nprobe", "qid").orderBy(
                    F.desc("cosine"), F.asc("cid")
                )
            ),
        )
        .filter(F.col("rk") <= 5)
        .select("nprobe", "qid", "cid", F.lit(1).alias("__hit"))
    )
    # exact arm = the session-cached gold table (r15; identical q/c
    # construction)
    exact = _ann_exact_topk(spark, sf_dir).select("qid", "cid")
    return (
        exact.crossJoin(F.broadcast(levels))
        .join(topk, ["nprobe", "qid", "cid"], "left")
        .groupBy("nprobe")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.count("__hit").cast("long").alias("n_hit"),
            F.expr(
                "CAST(count(__hit) * 1000000 DIV count(1) AS LONG)"
            ).alias("recall_ppm"),
        )
    )


_MRL_DIMS = (8, 16, 32, 64)  # prefix dims; last = full dimension
_MRL_SQL = ", ".join(str(d) for d in _MRL_DIMS)


def _mrl_oracle() -> str:
    qs, cs = "p.qv[1:l.dims]", "p.cv[1:l.dims]"
    return f"""
    WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
    q AS (SELECT vec_id AS qid, embedding AS qv
          FROM embeddings WHERE vec_id < 20),
    pairs AS (SELECT qid, cid, qv, cv FROM q, c WHERE qid != cid),
    lv AS (SELECT unnest([{_MRL_SQL}]) AS dims),
    ranked AS (
      SELECT dims, qid, cid FROM (
        SELECT dims, qid, cid, ROW_NUMBER() OVER (
          PARTITION BY dims, qid ORDER BY cosine DESC, cid
        ) AS rk
        FROM (
          SELECT l.dims, p.qid, p.cid,
                 ROUND({_cos(qs, cs)}, 6) AS cosine
          FROM pairs p, lv l
        )
      ) WHERE rk <= 5
    ),
    base AS (SELECT qid, cid FROM ranked WHERE dims = {_MRL_DIMS[-1]})
    SELECT l.dims,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(r.cid) AS BIGINT) AS n_hit,
           CAST((COUNT(r.cid) * 1000000) // COUNT(*) AS BIGINT)
             AS recall_ppm
    FROM lv l CROSS JOIN base e
    LEFT JOIN ranked r
      ON r.dims = l.dims AND r.qid = e.qid AND r.cid = e.cid
    GROUP BY l.dims
    """


@query("matryoshka_recall_curve", oracle=_mrl_oracle())
def matryoshka_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation eval (X184; Kusupati et al. 2022): recall@5
    of cosine retrieval over each PREFIX of the embedding (8/16/32/64
    dims) against the full-dimension ranking — the acceptance curve
    before shipping truncated vectors (an MRL-trained encoder holds
    recall at small prefixes; a conventional one collapses, which is
    exactly what a random fixture shows). All four levels score in ONE
    pair pass: each (query, corpus) pair computes its four prefix
    cosines in a single projection, levels explode onto the pair rows,
    and one window per (dims, qid) ranks them — the full-dim rows ARE
    the exact baseline, so no second corpus scan exists at all. recall
    is exact integer ppm.

    Scale: the pair join is the brute-force eval-set baseline every
    truncation study pays (bounded query set x corpus, top-k-pruned
    before any further join); prefix dots reuse one array slice each,
    JVM-side."""
    from seng550_a3_etl_spark.functions.vectors import dot

    t = load_tables(spark, sf_dir)
    emb = t.embeddings
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    # 4 interpreted prefix-dot folds per pair run in the corpus scan
    # stage; a small embeddings parquet scans as ONE split, pinning the
    # whole pair pass to one core (the r10 9.2x sf1-spot term) — spread
    # to core count (no-op at scale: guard skips when splits >= cores).
    c = spread_for_cpu(
        emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    )

    def pcos(d: int):
        a, b = F.slice("qv", 1, d), F.slice("cv", 1, d)
        return F.round(
            dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))), 6
        )

    # The per-dim cosines are computed in a PROJECTION and only then
    # exploded (r15): with all four prefix folds inlined directly under
    # the Generate, the generated ``doConsume`` holds every scoring
    # expression in ONE unsplittable method — at the r15 experiment's
    # unrolled form that blew janino's 64 KB method limit outright, and
    # even in fold form it couples the explode to the scoring stage.
    # Same rows, same values; the explode consumes four tiny refs.
    scored = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            *[pcos(d).alias(f"__c{d}") for d in _MRL_DIMS],
        )
        .select(
            "qid",
            "cid",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(d).alias("dims"),
                        F.col(f"__c{d}").alias("cosine"),
                    )
                    for d in _MRL_DIMS
                ])
            ).alias("lv"),
        )
        .select("qid", "cid", "lv.dims", "lv.cosine")
    )
    ranked = (
        scored.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("dims", "qid").orderBy(
                    F.desc("cosine"), F.asc("cid")
                )
            ),
        )
        .filter(F.col("rk") <= 5)
        .select("dims", "qid", "cid")
        .localCheckpoint(eager=True)  # base + hits both read this
    )
    base = ranked.filter(F.col("dims") == _MRL_DIMS[-1]).select("qid", "cid")
    levels = spark.createDataFrame(
        [(d,) for d in _MRL_DIMS], "dims int"
    )
    hits = ranked.withColumn("__hit", F.lit(1))
    return (
        base.crossJoin(F.broadcast(levels))
        .join(hits, ["dims", "qid", "cid"], "left")
        .groupBy("dims")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.count("__hit").cast("long").alias("n_hit"),
            F.expr(
                "CAST(count(__hit) * 1000000 DIV count(1) AS LONG)"
            ).alias("recall_ppm"),
        )
    )


@query(
    "knn_label_noise_flags",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS ql
               FROM embeddings WHERE vec_id < 50),
         c AS (SELECT vec_id AS cid, embedding AS cv, label AS cl
               FROM embeddings),
    pairs AS (
      SELECT qid, ql, cid, cl, ROUND({_cos('qv', 'cv')}, 6) AS cosine
      FROM q, c WHERE qid != cid
    ),
    topk AS (
      SELECT qid, ql, cl FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY qid ORDER BY cosine DESC, cid
        ) AS rank
        FROM pairs
      ) WHERE rank <= 5
    ),
    votes AS (
      SELECT qid, MAX(ql) AS ql, cl, COUNT(*) AS n
      FROM topk GROUP BY qid, cl
    ),
    maj AS (
      SELECT qid, ql, cl AS maj_label, n AS n_major FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY qid ORDER BY n DESC, cl ASC
        ) AS rn
        FROM votes
      ) WHERE rn = 1
    )
    SELECT qid,
           CAST(ql AS BIGINT) AS label,
           CAST(maj_label AS BIGINT) AS maj_label,
           CAST(n_major AS BIGINT) AS n_major,
           maj_label != ql AND n_major >= 3 AS noisy
    FROM maj
    """,
)
def knn_label_noise_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise detection (X185, confident-learning-lite / cleanlab
    shape): each probe item is flagged ``noisy`` when the MAJORITY
    label of its 5 nearest cosine neighbors disagrees with its own
    label at >=3/5 consensus — the per-item CLEANING operator behind
    X173's aggregate precision metric (X173 tells you the space is
    healthy; this tells you WHICH labels to relabel or drop before the
    set trains a classifier gate like X156). Majority tie breaks to the
    smallest label id, deterministically on both engines (argmax on
    (count DESC, label ASC)).

    Scale: identical plumbing as X173 — probes broadcast against one
    corpus scan, everything after the top-k prune moves k·|probes|
    rows; the vote is a (qid,label) rollup of 5-row groups."""
    from seng550_a3_etl_spark.operators.similarity import cosine_topk

    t = load_tables(spark, sf_dir)
    emb = t.embeddings
    q = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("ql"),
    )
    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cv"),
        F.col("label").alias("cl"),
    )
    topk = cosine_topk(q.select("qid", "qv"), c.select("cid", "cv"), k=5)
    labeled = (
        topk.join(F.broadcast(q.select("qid", "ql")), "qid")
        .join(c.select("cid", "cl"), "cid")
    )
    votes = labeled.groupBy("qid", "cl").agg(
        F.max("ql").alias("ql"), F.count(F.lit(1)).alias("n")
    )
    maj = votes.groupBy("qid").agg(
        F.max("ql").alias("ql"),
        F.max(F.struct(F.col("n"), (-F.col("cl")).alias("negcl"))).alias(
            "__m"
        ),
    )
    return maj.select(
        "qid",
        F.col("ql").cast("long").alias("label"),
        (-F.col("__m.negcl")).cast("long").alias("maj_label"),
        F.col("__m.n").cast("long").alias("n_major"),
        (
            (-F.col("__m.negcl") != F.col("ql")) & (F.col("__m.n") >= 3)
        ).alias("noisy"),
    )


@query(
    "retrieval_mrr",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS ql
               FROM embeddings WHERE vec_id < 50),
         c AS (SELECT vec_id AS cid, embedding AS cv, label AS cl
               FROM embeddings),
    pairs AS (
      SELECT qid, ql, cid, cl, ROUND({_cos('qv', 'cv')}, 6) AS cosine
      FROM q, c WHERE qid != cid
    ),
    topk AS (
      SELECT qid, ql, cl, rank FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY qid ORDER BY cosine DESC, cid
        ) AS rank
        FROM pairs
      ) WHERE rank <= 10
    ),
    firsts AS (
      SELECT qid, MIN(rank) AS first_rank
      FROM topk WHERE cl = ql GROUP BY qid
    )
    SELECT q.qid,
           CAST(q.ql AS BIGINT) AS label,
           CAST(f.first_rank AS BIGINT) AS first_rank,
           CAST(COALESCE(1000000 // f.first_rank, 0) AS BIGINT) AS rr_ppm
    FROM q LEFT JOIN firsts f ON f.qid = q.qid
    """,
)
def retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval MRR@10 (X186): per probe, the rank of the FIRST
    same-label neighbor in the top-10 cosine ranking, as a reciprocal
    rank in exact integer ppm (0 when no same-label neighbor surfaces)
    — the third leg of the embedding-eval suite: X173 measures
    precision (how MANY neighbors agree), X185 flags noise (which
    items to clean), this measures rank quality (how SOON retrieval
    finds a relevant hit — the metric RAG/recs stacks report). Mean
    over probes is the corpus MRR; per-probe rows keep the failure
    cases inspectable.

    Scale: identical plumbing as X173 — probes broadcast against one
    corpus scan, the prune keeps k·|probes| rows, the first-hit fold
    is a per-probe MIN."""
    from seng550_a3_etl_spark.operators.similarity import cosine_topk

    t = load_tables(spark, sf_dir)
    emb = t.embeddings
    q = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("ql"),
    )
    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cv"),
        F.col("label").alias("cl"),
    )
    topk = cosine_topk(q.select("qid", "qv"), c.select("cid", "cv"), k=10)
    firsts = (
        topk.join(F.broadcast(q.select("qid", "ql")), "qid")
        .join(c.select("cid", "cl"), "cid")
        .filter(F.col("cl") == F.col("ql"))
        .groupBy("qid")
        .agg(F.min("rank").alias("first_rank"))
    )
    return (
        q.select("qid", "ql")
        .join(firsts, "qid", "left")
        .select(
            "qid",
            F.col("ql").cast("long").alias("label"),
            F.col("first_rank").cast("long").alias("first_rank"),
            F.coalesce(
                F.expr("1000000 DIV first_rank"), F.lit(0)
            ).cast("long").alias("rr_ppm"),
        )
    )


# nDCG rank discounts 1e6/log2(r+1) for r = 1..10, precomputed ONCE in
# Python and injected as the SAME integer literals into both engines —
# no float log ever evaluates at query time, so the metric is bit-exact
# cross-engine (a per-engine log2 would differ in the last ulp).
_NDCG_K = 10
_NDCG_DISC = tuple(
    round(1_000_000 / math.log2(r + 1)) for r in range(1, _NDCG_K + 1)
)
_NDCG_DISC_SQL = ", ".join(str(d) for d in _NDCG_DISC)


@query(
    "retrieval_ndcg",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS ql
               FROM embeddings WHERE vec_id < 50),
         c AS (SELECT vec_id AS cid, embedding AS cv, label AS cl
               FROM embeddings),
    pairs AS (
      SELECT qid, ql, cid, cl, ROUND({{cos}}, 6) AS cosine
      FROM q, c WHERE qid != cid
    ),
    topk AS (
      SELECT qid, ql, cl, rank FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY qid ORDER BY cosine DESC, cid
        ) AS rank
        FROM pairs
      ) WHERE rank <= {_NDCG_K}
    ),
    sc AS (
      SELECT qid,
             SUM(CASE WHEN cl = ql
                 THEN list_extract([{_NDCG_DISC_SQL}], CAST(rank AS INT))
                 ELSE 0 END) AS dcg,
             SUM(CASE WHEN cl = ql THEN 1 ELSE 0 END) AS n_rel
      FROM topk GROUP BY qid
    ),
    lc AS (SELECT label, COUNT(*) AS n_lbl FROM embeddings GROUP BY label)
    SELECT q.qid,
           CAST(q.ql AS BIGINT) AS label,
           CAST(COALESCE(s.n_rel, 0) AS BIGINT) AS n_rel,
           CAST(COALESCE(s.dcg, 0) AS BIGINT) AS dcg_micro,
           CAST(COALESCE(
             s.dcg * 1000000 // NULLIF(list_sum(list_slice(
               [{_NDCG_DISC_SQL}], 1,
               CAST(least(lc.n_lbl - 1, {_NDCG_K}) AS INT))), 0),
             0) AS BIGINT) AS ndcg_ppm
    FROM q
    JOIN lc ON lc.label = q.ql
    LEFT JOIN sc s ON s.qid = q.qid
    """.format(cos=_cos("qv", "cv")),
)
def retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval nDCG@10 (X218): per probe, DCG over the exact top-10
    cosine ranking with binary same-label relevance, normalized by
    STANDARD IDCG@k — the ideal DCG over min(total corpus-wide
    relevant, k) (r12, ADVICE r11: normalizing by the ideal ordering
    of the RETRIEVED set overstated quality — a probe retrieving 1 of
    many same-label neighbors at rank 1 scored 1.0). The graded-rank
    companion to X186's MRR. Discounts are precomputed integer micros
    (see ``_NDCG_DISC``), DCG/IDCG are exact integer sums, and the
    final ratio is integer ppm — bit-stable cross-engine.

    Scale: same plumbing as X186 — probes broadcast against one corpus
    scan, top-k pruned before any further join; the DCG fold is a
    per-probe sum over <= k rows, and the total-relevant count is a
    |labels|-row broadcast census, never a second corpus pass per
    probe."""
    from seng550_a3_etl_spark.operators.similarity import cosine_topk

    t = load_tables(spark, sf_dir)
    emb = t.embeddings
    q = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("ql"),
    )
    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cv"),
        F.col("label").alias("cl"),
    )
    disc = F.array(*[F.lit(d) for d in _NDCG_DISC])
    topk = cosine_topk(q.select("qid", "qv"), c.select("cid", "cv"), k=_NDCG_K)
    sc = (
        topk.join(F.broadcast(q.select("qid", "ql")), "qid")
        .join(c.select("cid", "cl"), "cid")
        .select(
            "qid",
            F.when(F.col("cl") == F.col("ql"), F.element_at(disc, F.col("rank")))
            .otherwise(F.lit(0))
            .alias("__d"),
            F.when(F.col("cl") == F.col("ql"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("__r"),
        )
        .groupBy("qid")
        .agg(F.sum("__d").alias("__dcg"), F.sum("__r").alias("__nrel"))
    )
    # Standard IDCG@k: ideal DCG over min(total corpus-wide relevant
    # excluding self, k) — the |labels|-row census broadcasts.
    lbl_counts = emb.groupBy(F.col("label").alias("ql")).agg(
        F.count(F.lit(1)).alias("__nlbl")
    )
    return (
        q.select("qid", "ql")
        .join(F.broadcast(lbl_counts), "ql")
        .withColumn(
            "__idcg",
            F.aggregate(
                F.slice(
                    disc,
                    F.lit(1),
                    F.least(F.col("__nlbl") - 1, F.lit(_NDCG_K)).cast("int"),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
        .join(sc, "qid", "left")
        .select(
            "qid",
            F.col("ql").cast("long").alias("label"),
            F.coalesce("__nrel", F.lit(0)).cast("long").alias("n_rel"),
            F.coalesce("__dcg", F.lit(0)).cast("long").alias("dcg_micro"),
            F.coalesce(
                F.expr("__dcg * 1000000 DIV NULLIF(__idcg, 0)"), F.lit(0)
            ).cast("long").alias("ndcg_ppm"),
        )
    )


_KCENTER_M = 6  # greedy farthest-point seeds


def _kcenter_oracle() -> str:
    """Unrolled greedy farthest-point CTE chain: seeds0 = min vec_id;
    each step picks the corpus vector maximizing its min cosine
    distance to the chosen set (dist = ROUND(1 - MAX(ROUND(cos,6)),6),
    exactly the Spark fold's arithmetic), tie to the smallest id."""
    parts = [
        """seeds0 AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
    )""",
        """out0 AS (
      SELECT CAST(0 AS BIGINT) AS seed_rank, vec_id,
             CAST(NULL AS DOUBLE) AS min_dist
      FROM seeds0
    )""",
    ]
    for i in range(1, _KCENTER_M):
        p = i - 1
        parts.append(f"""d{i} AS (
      SELECT e.vec_id, e.embedding,
             ROUND(1 - MAX(ROUND({_cos('e.embedding', 's.embedding')}, 6)),
                   6) AS d
      FROM embeddings e, seeds{p} s
      GROUP BY e.vec_id, e.embedding
    )""")
        parts.append(f"""pick{i} AS (
      SELECT vec_id, embedding, d FROM d{i}
      ORDER BY d DESC, vec_id LIMIT 1
    )""")
        parts.append(f"""seeds{i} AS (
      SELECT vec_id, embedding FROM seeds{p}
      UNION ALL SELECT vec_id, embedding FROM pick{i}
    )""")
        parts.append(f"""out{i} AS (
      SELECT CAST({i} AS BIGINT) AS seed_rank, vec_id, d AS min_dist
      FROM pick{i}
    )""")
    union = " UNION ALL ".join(
        f"SELECT * FROM out{i}" for i in range(_KCENTER_M)
    )
    return "WITH " + ",\n".join(parts) + "\n" + union


@query("kcenter_diverse_seeds", oracle=_kcenter_oracle())
def kcenter_diverse_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center / farthest-point seed selection (X189, the
    2-approximation coreset primitive): starting from the smallest
    vec_id, repeatedly pick the corpus vector FARTHEST (max-min cosine
    distance) from the chosen set — the diversity-maximizing
    counterpart to X179's target-likeness (DSIR selects SIMILAR data,
    k-center selects data that COVERS the space: seed sets for
    diversity strata, annotation batches, eval-probe panels).
    Deterministic: distances round to 6 before the argmax, ties to the
    smallest id; the oracle unrolls the identical greedy chain.

    Scale: each of the m-1 iterations is one corpus scan with the
    zero-exchange assign_buckets fold (seed set packs into ONE
    broadcast row) followed by a 1-row argmax aggregate — m corpus
    scans total, the algorithm's inherent cost; the seed frame (≤ m
    rows) checkpoints per step so iterations never replay lineage."""
    from seng550_a3_etl_spark.operators.similarity import assign_buckets

    from seng550_a3_etl_spark.plans.layout import spread_for_cpu

    t = load_tables(spark, sf_dir)
    # Spread + pin the loop-invariant corpus ONCE: assign_buckets
    # spreads its corpus side internally, which inside this m-1-step
    # loop would re-shuffle the (under-parallel fixture) scan every
    # iteration — the r11 sf0.1 regression term. Checkpointing is the
    # iterative-algorithm persist every production loop does anyway;
    # the internal guard then sees >= core partitions and no-ops.
    corpus = spread_for_cpu(
        t.embeddings.select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("v")
        )
    ).localCheckpoint(eager=True)
    seed0 = corpus.orderBy("id").limit(1).localCheckpoint(eager=True)
    seeds = seed0.select(
        F.col("id").alias("bid"), F.col("v").alias("bv")
    )
    rows = [
        seed0.select(
            F.lit(0).cast("long").alias("seed_rank"),
            F.col("id").alias("vec_id"),
            F.lit(None).cast("double").alias("min_dist"),
        )
    ]
    for i in range(1, _KCENTER_M):
        scored = assign_buckets(
            corpus, seeds, "id", "v", keep_sim="__sim"
        ).select(
            "id", "v", F.round(1 - F.col("__sim"), 6).alias("d")
        )
        pick = (
            scored.agg(
                F.max(
                    F.struct(
                        F.col("d"),
                        (-F.col("id")).alias("negid"),
                        F.col("id"),
                        F.col("v"),
                    )
                ).alias("m")
            )
            .select(
                F.col("m.id").alias("id"),
                F.col("m.v").alias("v"),
                F.col("m.d").alias("d"),
            )
            .localCheckpoint(eager=True)
        )
        rows.append(
            pick.select(
                F.lit(i).cast("long").alias("seed_rank"),
                F.col("id").alias("vec_id"),
                F.col("d").alias("min_dist"),
            )
        )
        seeds = seeds.unionByName(
            pick.select(F.col("id").alias("bid"), F.col("v").alias("bv"))
        ).localCheckpoint(eager=True)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


_LOGREG_DIM = 64
# Deterministic non-trivial starting weights; both engines parse the
# identical decimal literals, so w0 is bit-equal cross-engine.
_LOGREG_W0 = [((j % 7) - 3) / 10.0 for j in range(_LOGREG_DIM)]
_LOGREG_W0_SQL = "[" + ", ".join(repr(w) for w in _LOGREG_W0) + "]"


@query(
    "logistic_grad_step",
    oracle=f"""
    WITH e AS (
      SELECT embedding,
             CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS y
      FROM embeddings
    ),
    p AS (
      SELECT embedding, y,
             1 / (1 + exp(-(list_sum(list_transform(
               range(1, {_LOGREG_DIM} + 1),
               i -> embedding[i]::DOUBLE * ({_LOGREG_W0_SQL})[i]
             ))))) AS p
      FROM e
    )
    SELECT CAST(d.i - 1 AS BIGINT) AS dim,
           ROUND(AVG(embedding[d.i]::DOUBLE * (p - y)), 6) AS grad
    FROM p, (SELECT unnest(range(1, {_LOGREG_DIM} + 1)) AS i) d
    GROUP BY 1
    """,
)
def logistic_grad_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One logistic-regression gradient step IN the engine (X191):
    per-dimension gradient of binary cross-entropy for a class-0-vs-
    rest probe over the embedding table, at fixed deterministic weights
    — completing the in-engine training loop family (X75 k-means step,
    X91 PCA step, X112 OLS, X156 classifier INFERENCE): distributed
    gradient computation is the step a driver loop iterates to train
    the very quality classifiers X156 then applies. grad_j =
    avg(x_j · (σ(w·x) − y)); exp/σ differ across engines by ≤1 ulp,
    far inside the 6-decimal rounding (the suite's standing float
    rule).

    Scale: σ(w·x) folds per row against ONE broadcast literal weight
    array inside the scan; the per-dimension rollup explodes to
    (dim, x·residual) pairs and map-side-combines onto |dim| groups —
    one shuffle of 64 partials per partition, the textbook distributed
    gradient shape."""
    from seng550_a3_etl_spark.functions.vectors import dot

    t = load_tables(spark, sf_dir)
    w0 = F.array(*[F.lit(w) for w in _LOGREG_W0])
    e = t.embeddings.select(
        "embedding",
        F.when(F.col("label") == 0, F.lit(1.0)).otherwise(0.0).alias("y"),
    )
    margin = dot(F.col("embedding"), w0)
    p = e.select(
        "embedding",
        "y",
        (1 / (1 + F.exp(-margin))).alias("p"),
    )
    return (
        p.select(
            F.posexplode("embedding").alias("dim", "x"),
            (F.col("p") - F.col("y")).alias("r"),
        )
        .groupBy("dim")
        .agg(
            F.round(
                F.avg(F.col("x").cast("double") * F.col("r")), 6
            ).alias("grad")
        )
        .select(F.col("dim").cast("long").alias("dim"), "grad")
    )


_LOGREG_STEPS = 3
_LOGREG_LR = 0.5  # binary-exact scale factor


def _logreg_auc_oracle() -> str:
    dim = _LOGREG_DIM
    parts = [f"""e AS (
      SELECT vec_id, embedding,
             CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS y
      FROM embeddings
    )""", f"""w0 AS (SELECT {_LOGREG_W0_SQL} AS w)"""]
    for t in range(1, _LOGREG_STEPS + 1):
        p = t - 1
        parts.append(f"""g{t} AS (
      SELECT d.i AS dim,
             ROUND(AVG(e.embedding[d.i]::DOUBLE *
               (1 / (1 + exp(-(list_sum(list_transform(
                  range(1, {dim} + 1),
                  i -> e.embedding[i]::DOUBLE * w.w[i]))))) - e.y)), 6)
               AS grad
      FROM e, w{p} w, (SELECT unnest(range(1, {dim} + 1)) AS i) d
      GROUP BY 1
    )""")
        parts.append(f"""gl{t} AS (
      SELECT list(grad ORDER BY dim) AS g FROM g{t}
    )""")
        parts.append(f"""w{t} AS (
      SELECT list_transform(range(1, {dim} + 1),
                            i -> w.w[i] - {_LOGREG_LR} * gl.g[i]) AS w
      FROM w{p} w, gl{t} gl
    )""")
    parts.append(f"""scores AS (
      SELECT e.vec_id, e.y,
             ROUND(list_sum(list_transform(
               range(1, {dim} + 1),
               i -> e.embedding[i]::DOUBLE * w.w[i])), 6) AS s
      FROM e, w{_LOGREG_STEPS} w
    )""")
    parts.append("""ranked AS (
      SELECT y, 2 * AVG(rn) OVER (PARTITION BY s) AS ar2 FROM (
        SELECT y, s, ROW_NUMBER() OVER (ORDER BY s, vec_id) AS rn
        FROM scores
      )
    )""")
    return "WITH " + ",\n".join(parts) + f"""
    SELECT CAST(COUNT(*) FILTER (WHERE y = 1) AS BIGINT) AS npos,
           CAST(COUNT(*) FILTER (WHERE y = 0) AS BIGINT) AS nneg,
           CAST(ROUND(SUM(ar2) FILTER (WHERE y = 1))
                - COUNT(*) FILTER (WHERE y = 1)
                  * (COUNT(*) FILTER (WHERE y = 1) + 1) AS BIGINT)
             AS auc_num_x2,
           CAST((CAST(ROUND(SUM(ar2) FILTER (WHERE y = 1))
                 - COUNT(*) FILTER (WHERE y = 1)
                   * (COUNT(*) FILTER (WHERE y = 1) + 1) AS BIGINT)
                 * 1000000)
                // (2 * COUNT(*) FILTER (WHERE y = 1)
                      * COUNT(*) FILTER (WHERE y = 0)) AS BIGINT)
             AS auc_ppm
    FROM ranked
    """


@query("logistic_train_auc", oracle=_logreg_auc_oracle())
def logistic_train_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-and-evaluate IN the engine (X193): three driver-iterated
    logistic gradient steps (the X191 step, lr=0.5 on 6-decimal-rounded
    gradients so the weight trajectory is bit-equal cross-engine), then
    the trained scores graded by EXACT AUC — the Mann-Whitney rank form
    with average-rank tie handling on the rounded scores, kept in
    integer 2·U so the statistic (and its ppm) hash-match exactly. The
    full supervised loop a quality-classifier pipeline runs: X192
    assigns folds, this trains + grades, X156 applies the winner.

    Scale: each step is one corpus scan (weights ride ONE broadcast
    row; per-dim rollup map-side-combines to 64 groups) with the
    64-row weight update checkpointed between steps — the
    kmeans_iterated pattern; the AUC rank runs over the EVAL-sized
    score table (one bounded sort), never the training corpus at
    100 TB."""
    from seng550_a3_etl_spark.functions.vectors import dot

    t = load_tables(spark, sf_dir)
    e = t.embeddings.select(
        F.col("vec_id"),
        F.col("embedding"),
        F.when(F.col("label") == 0, F.lit(1.0)).otherwise(0.0).alias("y"),
    )
    w = spark.range(1).select(
        F.array(*[F.lit(v) for v in _LOGREG_W0]).alias("w")
    ).localCheckpoint(eager=True)
    for _ in range(_LOGREG_STEPS):
        scored = e.crossJoin(F.broadcast(w)).select(
            "embedding",
            "y",
            (1 / (1 + F.exp(-dot(F.col("embedding"), F.col("w"))))).alias(
                "p"
            ),
        )
        grads = (
            scored.select(
                F.posexplode("embedding").alias("dim", "x"),
                (F.col("p") - F.col("y")).alias("r"),
            )
            .groupBy("dim")
            .agg(
                F.round(
                    F.avg(F.col("x").cast("double") * F.col("r")), 6
                ).alias("grad")
            )
        )
        gl = grads.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "grad"))),
                lambda s: s["grad"],
            ).alias("g")
        )
        w = (
            w.crossJoin(F.broadcast(gl))
            .select(
                F.zip_with(
                    "w", "g", lambda a, b: a - _LOGREG_LR * b
                ).alias("w")
            )
            .localCheckpoint(eager=True)
        )
    scores = e.crossJoin(F.broadcast(w)).select(
        "vec_id",
        "y",
        F.round(dot(F.col("embedding"), F.col("w")), 6).alias("s"),
    )
    rn = F.row_number().over(Window.orderBy("s", "vec_id"))
    ranked = scores.select("y", rn.alias("rn"), "s").select(
        "y",
        (2 * F.avg("rn").over(Window.partitionBy("s"))).alias("ar2"),
    )
    npos = F.count_if(F.col("y") == 1)
    auc2 = (
        F.round(F.sum(F.when(F.col("y") == 1, F.col("ar2"))))
        - npos * (npos + 1)
    ).cast("long")
    return ranked.agg(
        npos.cast("long").alias("npos"),
        F.count_if(F.col("y") == 0).cast("long").alias("nneg"),
        auc2.alias("auc_num_x2"),
        F.expr(
            "CAST(CAST(ROUND(SUM(CASE WHEN y = 1 THEN ar2 END)) "
            "- count_if(y = 1) * (count_if(y = 1) + 1) AS BIGINT) "
            "* 1000000 DIV (2 * count_if(y = 1) * count_if(y = 0)) "
            "AS BIGINT)"
        ).alias("auc_ppm"),
    )


_SWEEP_THRESHOLDS = (0.9, 0.95, 0.99)
_SWEEP_SQL = ", ".join(repr(t) for t in _SWEEP_THRESHOLDS)


@query(
    "semantic_threshold_sweep",
    oracle=f"""
    WITH corpus AS ({_SEMDEDUP_CORPUS_SQL}),
    cent AS ({_SEMDEDUP_CENT_SQL}),
    assign AS (
      SELECT id, v, bid FROM (
        SELECT id, v, bid, ROW_NUMBER() OVER (
          PARTITION BY id ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT id, v, bid, ROUND({_cos('v', 'bv')}, 6) AS sim
              FROM corpus, cent)
      ) WHERE rn = 1
    ),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             ROUND({_cos('a.v', 'b.v')}, 6) AS cosine
      FROM assign a JOIN assign b ON a.bid = b.bid AND a.id < b.id
      WHERE ROUND({_cos('a.v', 'b.v')}, 6) >= {min(_SWEEP_THRESHOLDS)!r}
    ),
    n AS (SELECT COUNT(*) AS n_corpus FROM corpus),
    lv AS (SELECT unnest([{_SWEEP_SQL}]) AS threshold)
    SELECT l.threshold,
           CAST(COUNT(p.cosine) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT p.id_b) AS BIGINT) AS n_dropped,
           CAST(n.n_corpus - COUNT(DISTINCT p.id_b) AS BIGINT)
             AS n_survivors
    FROM lv l
    CROSS JOIN n
    LEFT JOIN pairs p ON p.cosine >= l.threshold
    GROUP BY l.threshold, n.n_corpus
    """,
)
def semantic_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup threshold tuning sweep (X197): pair counts, dropped-doc
    counts, and survivor counts at cosine thresholds {{0.90, 0.95,
    0.99}} from ONE pair pass at the loosest threshold — the artifact a
    curation run reads to pick its dedup aggressiveness (Abbas et al.
    report the retained-fraction-vs-threshold curve before committing
    a corpus), exactly as X63's dup_threshold_sweep does for the
    shingle tier. Keep-first policy: a document is dropped when it is
    the LATER id of any surviving pair.

    Scale: the pair set is the X164 cluster-blocked candidate build
    (never all-pairs), mined once at the loosest threshold; the sweep
    itself is a broadcast 3-row predicate join over the (tiny) pair
    list, so extra thresholds cost nothing."""
    from seng550_a3_etl_spark.operators.similarity import semantic_dedup_pairs

    t = load_tables(spark, sf_dir)
    base = t.embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    )
    jitter = t.embeddings.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("id"),
        F.transform(
            F.col("embedding"),
            lambda x: (x.cast("double") + F.lit(0.02)).cast("float"),
        ).alias("v"),
    )
    corpus = base.unionAll(jitter)
    cent = _semdedup_cent(t.embeddings)
    pairs = semantic_dedup_pairs(
        corpus, cent, threshold=min(_SWEEP_THRESHOLDS),
        id_col="id", vec_col="v",
    ).select("id_b", "cosine").localCheckpoint(eager=True)
    n = corpus.agg(F.count(F.lit(1)).alias("n_corpus"))
    levels = spark.createDataFrame(
        [(th,) for th in _SWEEP_THRESHOLDS], "threshold double"
    )
    return (
        F.broadcast(levels)
        .join(pairs, F.col("cosine") >= F.col("threshold"), "left")
        .crossJoin(F.broadcast(n))
        .groupBy("threshold", "n_corpus")
        .agg(
            F.count("cosine").cast("long").alias("n_pairs"),
            F.countDistinct("id_b").cast("long").alias("n_dropped"),
        )
        .select(
            "threshold",
            "n_pairs",
            "n_dropped",
            (F.col("n_corpus") - F.col("n_dropped")).cast("long").alias(
                "n_survivors"
            ),
        )
    )


_INT8_KS = (1, 5, 10)
_INT8_NPROBE = 20
# int8 quantization replayed in SQL (the X31 oracle recipe): per-vector
# symmetric scale 127/max|x|, rounded to int.
_INT8_Q = (
    "list_transform(embedding, x -> CAST(ROUND(x::DOUBLE * (127.0 / "
    "list_max(list_transform(embedding, y -> abs(y::DOUBLE))))) AS INT))"
)


def _int8_recall_oracle() -> str:
    ks = ", ".join(str(k) for k in _INT8_KS)
    return f"""
    WITH c AS (
      SELECT vec_id AS cid, embedding AS cv, {_INT8_Q} AS cq
      FROM embeddings
      WHERE list_max(list_transform(embedding, y -> abs(y::DOUBLE))) > 0
    ),
    q AS (SELECT cid AS qid, cv AS qv, cq AS qq FROM c
          WHERE cid < {_INT8_NPROBE}),
    fl AS (
      SELECT qid, cid, ROW_NUMBER() OVER (
        PARTITION BY qid
        ORDER BY ROUND({_cos('qv', 'cv')}, 6) DESC, cid) AS rf
      FROM q, c WHERE qid != cid
    ),
    i8 AS (
      SELECT qid, cid, ROW_NUMBER() OVER (
        PARTITION BY qid
        ORDER BY ROUND({_cos('qq', 'cq')}, 6) DESC, cid) AS ri
      FROM q, c WHERE qid != cid
    ),
    m AS (
      SELECT fl.qid, fl.rf, i8.ri
      FROM fl JOIN i8 ON fl.qid = i8.qid AND fl.cid = i8.cid
      WHERE fl.rf <= {max(_INT8_KS)} AND i8.ri <= {max(_INT8_KS)}
    ),
    np AS (SELECT COUNT(*) AS n FROM q)
    SELECT k,
           CAST(np.n AS BIGINT) AS n_probes,
           CAST(COALESCE(SUM(CASE WHEN m.rf <= k AND m.ri <= k
                             THEN 1 ELSE 0 END), 0) * 1000000
                // (k * np.n) AS BIGINT) AS recall_ppm
    FROM (SELECT unnest([{ks}]) AS k) kv, np
    LEFT JOIN m ON true
    GROUP BY k, np.n
    """


@query("int8_recall_curve", oracle=_int8_recall_oracle())
def int8_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized-search quality gate (X207): recall@k of brute-force
    cosine search over the int8-quantized corpus (X31's compression)
    against the float ground truth, for k ∈ (1, 5, 10) — the
    acceptance measurement before a store swaps float32 for int8 (4×
    smaller, and the claim "recall loss <1%" becomes a number instead
    of folklore). Per-vector symmetric scales cancel in cosine, so
    int8 ordering is the integer-array cosine — computed from exact
    integers in both engines, rounded 6 with the id tiebreak (the
    standing total-order recipe).

    Scale: this is the EVAL harness, not the serving path — a bounded
    probe set (20) against the corpus, one broadcast-probe pass per
    representation, ranks from per-probe windows; recall folds as
    conditional counts over the rank join, exact integer ppm. The
    serving path at scale is IVF/PQ (X160/X162); this curve prices
    the quantization alone."""
    from seng550_a3_etl_spark.operators.similarity import quantize_int8

    t = load_tables(spark, sf_dir)
    # All-zero vectors are excluded by max|x| > 0, matching the
    # oracle: quantize_int8 returns an array of NULL ELEMENTS (not a
    # null array) for them, so isNotNull on the array is a no-op.
    c = t.embeddings.filter(
        F.array_max(F.transform("embedding", lambda x: F.abs(x))) > 0
    ).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cv"),
        quantize_int8(F.col("embedding"))["q"].alias("cq"),
    )
    qf = c.filter(F.col("cid") < _INT8_NPROBE).select(
        F.col("cid").alias("qid"),
        F.col("cv").alias("qv"),
        F.col("cq").alias("qq"),
    )

    def ranks(qcol: str, ccol: str, out: str) -> DataFrame:
        num = F.expr(
            f"aggregate(zip_with({qcol}, {ccol},"
            " (a, b) -> a * CAST(b AS DOUBLE)), 0.0D, (s, x) -> s + x)"
        )
        den_q = F.sqrt(
            F.expr(
                f"aggregate({qcol}, 0.0D,"
                " (s, x) -> s + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
            )
        )
        den_c = F.sqrt(
            F.expr(
                f"aggregate({ccol}, 0.0D,"
                " (s, x) -> s + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
            )
        )
        cos = F.round(num / (den_q * den_c), 6)
        w = Window.partitionBy("qid").orderBy(F.desc("__cos"), F.asc("cid"))
        return (
            F.broadcast(qf)
            .crossJoin(c)
            .filter(F.col("qid") != F.col("cid"))
            .withColumn("__cos", cos)
            .select(
                "qid", "cid", F.row_number().over(w).alias(out)
            )
        )

    kmax = max(_INT8_KS)
    m = (
        ranks("qv", "cv", "rf")
        .filter(F.col("rf") <= kmax)
        .join(
            ranks("qq", "cq", "ri").filter(F.col("ri") <= kmax),
            ["qid", "cid"],
        )
    )
    np_ = qf.agg(F.count(F.lit(1)).alias("n"))
    # Aggregate the match join ALONE, then attach the probe count:
    # taking n from inside the m-aggregate returned NULL rows whenever
    # the rank join was empty (total recall collapse — exactly the
    # case this gate exists to catch), where the oracle emits
    # (k, n_probes, 0).
    folded = m.agg(
        *[
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("rf") <= k) & (F.col("ri") <= k), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias(f"__m{k}")
            for k in _INT8_KS
        ],
    ).crossJoin(F.broadcast(np_))
    rows = F.array(
        *[
            F.struct(
                F.lit(k).alias("k"),
                F.col("n").cast("long").alias("n_probes"),
                F.expr(f"__m{k} * 1000000 DIV ({k} * n)")
                .cast("long")
                .alias("recall_ppm"),
            )
            for k in _INT8_KS
        ]
    )
    return folded.select(F.explode(rows).alias("r")).select("r.*")


_MARGIN_TAU_MICRO = 100_000  # |logit| < 0.1 => uncertainty band


def _margin_oracle() -> str:
    """Replays the X193 weight trajectory (identical CTE construction,
    duplicated rather than shared so the checked X193 oracle string
    stays byte-stable), then folds the margin census per label."""
    dim = _LOGREG_DIM
    parts = [
        """e AS (
      SELECT vec_id, label, embedding,
             CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS y
      FROM embeddings
    )""",
        f"""w0 AS (SELECT {_LOGREG_W0_SQL} AS w)""",
    ]
    for t in range(1, _LOGREG_STEPS + 1):
        p = t - 1
        parts.append(f"""g{t} AS (
      SELECT d.i AS dim,
             ROUND(AVG(e.embedding[d.i]::DOUBLE *
               (1 / (1 + exp(-(list_sum(list_transform(
                  range(1, {dim} + 1),
                  i -> e.embedding[i]::DOUBLE * w.w[i]))))) - e.y)), 6)
               AS grad
      FROM e, w{p} w, (SELECT unnest(range(1, {dim} + 1)) AS i) d
      GROUP BY 1
    )""")
        parts.append(f"""gl{t} AS (
      SELECT list(grad ORDER BY dim) AS g FROM g{t}
    )""")
        parts.append(f"""w{t} AS (
      SELECT list_transform(range(1, {dim} + 1),
                            i -> w.w[i] - {_LOGREG_LR} * gl.g[i]) AS w
      FROM w{p} w, gl{t} gl
    )""")
    parts.append(f"""m AS (
      SELECT e.label,
             CAST(ROUND(ABS(ROUND(list_sum(list_transform(
               range(1, {dim} + 1),
               i -> e.embedding[i]::DOUBLE * w.w[i])), 6)) * 1000000)
               AS BIGINT) AS am
      FROM e, w{_LOGREG_STEPS} w
    )""")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
    SELECT CAST(label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COUNT(*) FILTER (WHERE am < {_MARGIN_TAU_MICRO})
                AS BIGINT) AS n_hard,
           CAST(COUNT(*) FILTER (WHERE am < {_MARGIN_TAU_MICRO})
                * 1000000 // COUNT(*) AS BIGINT) AS hard_ppm,
           CAST(SUM(am) AS BIGINT) AS sum_abs_margin_micro
    FROM m GROUP BY label
    """
    )


@query("margin_hard_examples", oracle=_margin_oracle())
def margin_hard_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based hard-example census (X212) — uncertainty sampling,
    the data-selection step after X193's train-and-grade: score every
    vector with the SAME deterministic 3-step trained weights (the
    X193 trajectory: 6-decimal-rounded gradients, lr=0.5, bit-equal
    cross-engine) and census, per label, the vectors inside the
    decision band |logit| < 0.1 — the examples an active-learning /
    hard-mining loop sends for labeling or upweights in the next
    training round. The band test and per-label mass run on integer
    MICRO margins (|rounded-6 logit| x 1e6), so counts, ppm shares,
    and margin sums hash-match exactly.

    Scale: each training step is one corpus scan (weights ride one
    broadcast row, per-dim rollup map-side-combines to 64 groups) with
    a 64-value checkpoint between steps — the X193/X75 iterated
    pattern; the census itself is one scan folding to |labels| rows.
    Nothing per-row survives the final aggregation, and the corpus
    never shuffles."""
    from seng550_a3_etl_spark.functions.vectors import dot

    t = load_tables(spark, sf_dir)
    e = t.embeddings.select(
        "vec_id",
        "label",
        "embedding",
        F.when(F.col("label") == 0, F.lit(1.0)).otherwise(0.0).alias("y"),
    )
    w = spark.range(1).select(
        F.array(*[F.lit(v) for v in _LOGREG_W0]).alias("w")
    ).localCheckpoint(eager=True)
    for _ in range(_LOGREG_STEPS):
        scored = e.crossJoin(F.broadcast(w)).select(
            "embedding",
            "y",
            (1 / (1 + F.exp(-dot(F.col("embedding"), F.col("w"))))).alias(
                "p"
            ),
        )
        grads = (
            scored.select(
                F.posexplode("embedding").alias("dim", "x"),
                (F.col("p") - F.col("y")).alias("r"),
            )
            .groupBy("dim")
            .agg(
                F.round(
                    F.avg(F.col("x").cast("double") * F.col("r")), 6
                ).alias("grad")
            )
        )
        gl = grads.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "grad"))),
                lambda s: s["grad"],
            ).alias("g")
        )
        w = (
            w.crossJoin(F.broadcast(gl))
            .select(
                F.zip_with(
                    "w", "g", lambda a, b: a - _LOGREG_LR * b
                ).alias("w")
            )
            .localCheckpoint(eager=True)
        )
    am = F.round(
        F.abs(F.round(dot(F.col("embedding"), F.col("w")), 6)) * 1000000
    ).cast("long")
    m = e.crossJoin(F.broadcast(w)).select("label", am.alias("am"))
    hard = F.count_if(F.col("am") < _MARGIN_TAU_MICRO)
    return m.groupBy(F.col("label").cast("long").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        hard.cast("long").alias("n_hard"),
        F.expr(
            f"CAST(count_if(am < {_MARGIN_TAU_MICRO}) * 1000000"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("hard_ppm"),
        F.sum("am").cast("long").alias("sum_abs_margin_micro"),
    )


@query(
    "label_centroid_matrix",
    oracle=f"""
    WITH cent AS (
      SELECT label, d.i AS dim,
             ROUND(AVG(e.embedding[d.i]::DOUBLE), 6) AS c
      FROM embeddings e,
           (SELECT unnest(range(1, {_LOGREG_DIM} + 1)) AS i) d
      GROUP BY 1, 2
    ),
    cl AS (
      SELECT label, list(c ORDER BY dim) AS cv
      FROM cent GROUP BY label
    ),
    sized AS (
      SELECT c.label, c.cv, CAST(s.n AS BIGINT) AS n_vecs
      FROM cl c JOIN (SELECT label, COUNT(*) AS n
                      FROM embeddings GROUP BY label) s
        USING (label)
    )
    SELECT CAST(a.label AS BIGINT) AS label_a,
           CAST(b.label AS BIGINT) AS label_b,
           a.n_vecs AS n_a, b.n_vecs AS n_b,
           ROUND({_cos('a.cv', 'b.cv')}, 6) AS centroid_cos
    FROM sized a JOIN sized b ON a.label < b.label
    """,
)
def label_centroid_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-separability audit (X213): the pairwise cosine matrix of
    per-label embedding CENTROIDS — the embedding-store diagnostic
    read before trusting label-conditioned selection (X167 label
    propagation, X173 kNN precision, X185 noise flags): labels whose
    centroids sit near cosine 1 are indistinguishable in this space
    and every downstream label-driven selector will mix them. Centroid
    coordinates are 6-decimal-rounded per dimension (the X191 gradient
    recipe — AVG ulp noise is far inside the rounding), so the cosine
    runs on identical doubles in both engines.

    Scale: ONE corpus scan explodes to (label, dim) partial means —
    map-side-combined, |labels|x|dim| groups; the matrix join is
    |labels|² over |labels| rows (trivially broadcast). The corpus
    never shuffles and nothing row-sized survives the first
    aggregation."""
    from seng550_a3_etl_spark.functions.vectors import cosine

    t = load_tables(spark, sf_dir)
    cent = (
        t.embeddings.select(
            "label", F.posexplode("embedding").alias("dim", "x")
        )
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda s: s["c"],
            ).alias("cv")
        )
    )
    sized = cent.join(
        t.embeddings.groupBy("label").agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs")
        ),
        "label",
    )
    a = sized.select(
        F.col("label").cast("long").alias("label_a"),
        F.col("cv").alias("cva"),
        F.col("n_vecs").alias("n_a"),
    )
    b = sized.select(
        F.col("label").cast("long").alias("label_b"),
        F.col("cv").alias("cvb"),
        F.col("n_vecs").alias("n_b"),
    )
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            F.round(cosine(F.col("cva"), F.col("cvb")), 6).alias(
                "centroid_cos"
            ),
        )
    )


_KNN_OUT_K = 5
_KNN_OUT_THRESH = 990_000  # mean kNN cosine-distance micros

# Cell recipe for the SELF-kNN family (X226/X231/X233/X234): ceil(√n)
# cells from the vec_id % 50 candidate pool — the n^1.5 operating
# point (pair volume = n · n/cells = n^1.5), the same fix SemDeDup
# took in r11. A FIXED cell count would make the in-cell self-join
# quadratic once the cap binds (cell size grows with the corpus); the
# IVF *search* queries (X7/X168/X182) keep their fixed index because
# their probe set is fixed and their cost stays linear either way.
_KNN_CELLS_SQL = """
      SELECT bid, bv FROM (
        SELECT vec_id AS bid, embedding AS bv,
               ROW_NUMBER() OVER (ORDER BY vec_id) AS rk
        FROM embeddings WHERE vec_id % 50 = 0
      ) WHERE rk <= CEIL(SQRT((SELECT COUNT(*) FROM embeddings)))
"""


def _knn_cells(emb: DataFrame) -> DataFrame:
    """ceil(√n) coarse cells for the self-kNN family — see
    _KNN_CELLS_SQL. Same driver-side bounded count + data-parallel
    orderBy().limit(cap) shape as ``_semdedup_cent`` (ADVICE r11)."""
    import math

    cap = math.ceil(math.sqrt(emb.count()))
    return (
        emb.filter(F.col("vec_id") % 50 == 0)
        .select(F.col("vec_id").alias("bid"), F.col("embedding").alias("bv"))
        .orderBy("bid")
        .limit(cap)
    )


_ASSIGN_CACHE: dict[tuple[str, str], DataFrame] = {}


def _knn_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v, __cn, bid, label) — the corpus assigned to the
    ceil(√n) cells with labels attached, computed ONCE per (Spark
    application, sf_dir) and shared by the whole self-kNN family
    (X226 outliers, X231 hubness, X233 consensus, X234 hard
    negatives). Same rationale as text.py's ``_shingle_sets_df``: at
    100 TB the cell assignment is a materialized artifact written by
    one job (the plans/gold.py shape) and consumed by every
    neighborhood diagnostic; ``localCheckpoint`` is the
    session-scoped analog, and bench.py evicts + times the build as
    its own [1×, 10×, ratio] row so no spotted consumer absorbs it."""
    from seng550_a3_etl_spark.operators.similarity import assign_buckets
    from seng550_a3_etl_spark.suite.text import _evict_stopped_sessions

    _evict_stopped_sessions(_ASSIGN_CACHE)
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _ASSIGN_CACHE.get(key)
    if cached is not None:
        return cached
    t = load_tables(spark, sf_dir)
    corpus = t.embeddings.select("vec_id", F.col("embedding").alias("v"))
    out = (
        assign_buckets(corpus, _knn_cells(t.embeddings), "vec_id", "v")
        .join(t.embeddings.select("vec_id", "label"), "vec_id")
        .localCheckpoint(eager=True)
    )
    _ASSIGN_CACHE[key] = out
    return out


@query(
    "knn_bucket_outliers",
    oracle=f"""
    WITH c AS (SELECT vec_id, embedding AS v FROM embeddings),
    cent AS ({_KNN_CELLS_SQL}),
    assign AS (
      SELECT vec_id, v, bid FROM (
        SELECT vec_id, v, bid, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT vec_id, v, bid, ROUND({{cos}}, 6) AS sim
              FROM c, cent)
      ) WHERE rn = 1
    ),
    knn AS (
      SELECT vec_id, dist_micro FROM (
        SELECT a.vec_id,
               1000000 - CAST(ROUND(ROUND({{cospair}}, 6) * 1000000)
                              AS BIGINT) AS dist_micro,
               ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY ROUND({{cospair}}, 6) DESC, b.vec_id
               ) AS rk
        FROM assign a JOIN assign b
          ON a.bid = b.bid AND a.vec_id <> b.vec_id
      ) WHERE rk <= {_KNN_OUT_K}
    ),
    st AS (
      SELECT vec_id, COUNT(*) AS n_nbrs,
             CAST(ROUND(SUM(dist_micro) / COUNT(*)) AS BIGINT) AS md
      FROM knn GROUP BY vec_id
    )
    SELECT a.vec_id, CAST(a.bid AS BIGINT) AS bid,
           CAST(COALESCE(s.n_nbrs, 0) AS BIGINT) AS n_nbrs,
           CAST(COALESCE(s.md, -1) AS BIGINT) AS knn_mean_dist_micro,
           COALESCE(s.md, -1) >= {_KNN_OUT_THRESH} AS is_outlier
    FROM assign a LEFT JOIN st s ON s.vec_id = a.vec_id
    """.format(cos=_cos("v", "bv"), cospair=_cos("a.v", "b.v")),
)
def knn_bucket_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed kNN-distance outlier census (X226): per vector, the
    mean cosine distance to its k=5 nearest IN-CELL neighbors under
    the ceil(√n)-cell coarse index (_knn_cells — the n^1.5 operating
    point; a fixed cell count would go quadratic once cells fill) —
    the embedding-space isolation score data
    curation uses to flag mislabeled/garbage/OOD vectors (a vector far
    from even its nearest neighbors is nobody's neighbor: the
    kNN-distance member of the LOF family, kept rank-free so it is
    engine-exact). is_outlier applies the fixed micro threshold; on
    the random fixture most vectors sit near distance 1, so the flag
    exercises the boundary rather than a planted anomaly — the
    PLUMBING (bucketed self-kNN without an all-pairs scan) is the
    operator.

    Scale: the self-kNN is confined to the ceil(√n) cells (assign is
    the zero-exchange broadcast fold; pair volume is Σ cell² ≈ n^1.5,
    never |corpus|²); the per-vector top-k window partitions by
    vec_id — |corpus| groups, WindowGroupLimit-pruned map-side. Mean
    distances are exact-integer micro sums (ROUND(SUM/COUNT) on
    bigint sums, the X168 recipe).

    Reference parity: none; extends the X166/X168/X187 vector-quality
    family."""
    from seng550_a3_etl_spark.functions.vectors import dot

    assigned = _knn_assigned(spark, sf_dir)
    a = assigned.select(
        "bid",
        F.col("vec_id").alias("va"),
        F.col("v").alias("xa"),
        F.col("__cn").alias("na"),
    )
    b = assigned.select(
        "bid",
        F.col("vec_id").alias("vb"),
        F.col("v").alias("xb"),
        F.col("__cn").alias("nb"),
    )
    pairs = (
        a.join(b, "bid")
        .filter(F.col("va") != F.col("vb"))
        .select(
            "va",
            "vb",
            F.round(
                dot(F.col("xa"), F.col("xb")) / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("va").orderBy(F.desc("cos"), F.asc("vb"))
    knn = (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KNN_OUT_K)
        .select(
            "va",
            (
                F.lit(1_000_000)
                - F.round(F.col("cos") * 1_000_000).cast("long")
            ).alias("dist_micro"),
        )
    )
    st = knn.groupBy("va").agg(
        F.count(F.lit(1)).cast("long").alias("n_nbrs"),
        F.round(F.sum("dist_micro") / F.count(F.lit(1)))
        .cast("long")
        .alias("md"),
    )
    return (
        assigned.select("vec_id", "bid")
        .join(st, assigned["vec_id"] == st["va"], "left")
        .select(
            "vec_id",
            F.col("bid").cast("long").alias("bid"),
            F.coalesce("n_nbrs", F.lit(0)).cast("long").alias("n_nbrs"),
            F.coalesce("md", F.lit(-1))
            .cast("long")
            .alias("knn_mean_dist_micro"),
            (F.coalesce("md", F.lit(-1)) >= _KNN_OUT_THRESH).alias(
                "is_outlier"
            ),
        )
    )


_DEAD_DIM_VAR_MICRO2 = 100_000_000  # var < 1e-4 (micro^2 units)


@query(
    "embedding_dead_dims",
    oracle=f"""
    WITH ex AS (
      SELECT j - 1 AS dim_idx,
             CAST(ROUND(CAST(embedding[j] AS DOUBLE) * 1000000)
                  AS BIGINT) AS m
      FROM embeddings CROSS JOIN range(1, 65) t(j)
    ),
    g AS (
      SELECT dim_idx, COUNT(*) AS n, SUM(m) AS s1,
             SUM(m::HUGEINT * m::HUGEINT) AS s2
      FROM ex GROUP BY dim_idx
    )
    SELECT CAST(dim_idx AS BIGINT) AS dim_idx,
           CAST(n AS BIGINT) AS n_vecs,
           CAST(s1 AS BIGINT) AS sum_micro,
           CAST((n::HUGEINT * s2 - s1::HUGEINT * s1::HUGEINT)
                // (n::HUGEINT * n::HUGEINT) AS BIGINT) AS var_micro2,
           (n::HUGEINT * s2 - s1::HUGEINT * s1::HUGEINT)
             // (n::HUGEINT * n::HUGEINT) < {_DEAD_DIM_VAR_MICRO2}
             AS is_dead
    FROM g
    """,
)
def embedding_dead_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-dimension census (X230): per embedding dimension, the exact
    population variance in integer micro² units and a dead flag
    (var < 1e-4) — the encoder-health check an embedding store runs
    before indexing: dimensions that never move carry no signal but
    still cost index bytes and dot-product FLOPs (and a SUDDENLY dead
    dim means an upstream encoder regression; compare across
    snapshots like X223). Values quantize to integer micros BEFORE
    the distributed sums (the X69/X142 order-independence pattern);
    second moments accumulate in DECIMAL(38,0)/HUGEINT (micro² sums
    wrap int64 past ~9·10⁶ rows), and the variance identity
    (n·Σm² − (Σm)²)/n² stays in exact big-integer space until the one
    truncating division — both engines floor a non-negative value, so
    the output is bit-stable.

    Scale: one posexplode scan → a 64-group map-side-combined rollup;
    the shuffle carries 64 rows of three numbers. Nothing else moves.

    Reference parity: none; extends the X142/X168 embedding-health
    family."""
    t = load_tables(spark, sf_dir)
    ex = t.embeddings.select(
        F.posexplode("embedding").alias("dim_idx", "x")
    ).select(
        "dim_idx",
        F.round(F.col("x").cast("double") * 1_000_000)
        .cast("long")
        .alias("m"),
    )
    g = ex.groupBy("dim_idx").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("m").alias("s1"),
        F.sum(
            F.col("m").cast("decimal(38,0)") * F.col("m").cast("decimal(38,0)")
        ).alias("s2"),
    )
    var_big = (
        "(CAST(n AS DECIMAL(38,0)) * s2"
        " - CAST(s1 AS DECIMAL(38,0)) * CAST(s1 AS DECIMAL(38,0)))"
        " DIV (CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)))"
    )
    return g.select(
        F.col("dim_idx").cast("long").alias("dim_idx"),
        F.col("n").cast("long").alias("n_vecs"),
        F.col("s1").cast("long").alias("sum_micro"),
        F.expr(var_big).cast("long").alias("var_micro2"),
        F.expr(f"{var_big} < {_DEAD_DIM_VAR_MICRO2}").alias("is_dead"),
    )


@query(
    "knn_hubness_census",
    oracle=f"""
    WITH c AS (SELECT vec_id, embedding AS v FROM embeddings),
    cent AS ({_KNN_CELLS_SQL}),
    assign AS (
      SELECT vec_id, v, bid FROM (
        SELECT vec_id, v, bid, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT vec_id, v, bid, ROUND({{cos}}, 6) AS sim
              FROM c, cent)
      ) WHERE rn = 1
    ),
    knn AS (
      SELECT vec_id, nbr FROM (
        SELECT a.vec_id, b.vec_id AS nbr,
               ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY ROUND({{cospair}}, 6) DESC, b.vec_id
               ) AS rk
        FROM assign a JOIN assign b
          ON a.bid = b.bid AND a.vec_id <> b.vec_id
      ) WHERE rk <= {_KNN_OUT_K}
    ),
    occ AS (
      SELECT a.vec_id, COALESCE(o.n, 0) AS k_occ
      FROM assign a LEFT JOIN (
        SELECT nbr, COUNT(*) AS n FROM knn GROUP BY nbr
      ) o ON o.nbr = a.vec_id
    )
    SELECT CAST(k_occ AS BIGINT) AS k_occurrence,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM occ GROUP BY k_occ
    """.format(cos=_cos("v", "bv"), cospair=_cos("a.v", "b.v")),
)
def knn_hubness_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN hubness census (X231; Radovanović et al. JMLR'10): the
    k-occurrence distribution N_k — for each vector, how many OTHER
    vectors list it in their in-cell top-k — histogrammed. High-dim
    embedding spaces grow HUBS (vectors in everyone's neighbor list —
    they dominate retrieval and poison kNN label inference, X187) and
    anti-hubs (k_occurrence = 0 — unreachable by retrieval no matter
    the query); a right-skewed census is the standing diagnosis that
    distances are concentrating and the embedding dim or metric needs
    attention BEFORE ANN tuning (no nprobe fixes hubness). Shares the
    X226 plumbing: same IVF cells, same in-cell top-k — the census is
    the transpose rollup (group by NEIGHBOR instead of query).

    Scale: identical to X226 (cell-bounded pair volume, never
    |corpus|²) plus one |corpus|-row k-occurrence rollup and a
    ≤ max(N_k) histogram fold.

    Reference parity: none; extends the X187/X226 vector-quality
    family."""
    from seng550_a3_etl_spark.functions.vectors import dot

    assigned = _knn_assigned(spark, sf_dir)
    a = assigned.select(
        "bid",
        F.col("vec_id").alias("va"),
        F.col("v").alias("xa"),
        F.col("__cn").alias("na"),
    )
    b = assigned.select(
        "bid",
        F.col("vec_id").alias("vb"),
        F.col("v").alias("xb"),
        F.col("__cn").alias("nb"),
    )
    w = Window.partitionBy("va").orderBy(
        F.desc("cos"), F.asc("vb")
    )
    knn = (
        a.join(b, "bid")
        .filter(F.col("va") != F.col("vb"))
        .select(
            "va",
            "vb",
            F.round(
                dot(F.col("xa"), F.col("xb")) / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KNN_OUT_K)
    )
    occ = (
        assigned.select("vec_id")
        .join(
            knn.groupBy(F.col("vb").alias("vec_id")).agg(
                F.count(F.lit(1)).alias("n")
            ),
            "vec_id",
            "left",
        )
        .select(F.coalesce("n", F.lit(0)).alias("k_occ"))
    )
    return occ.groupBy("k_occ").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors")
    ).select(
        F.col("k_occ").cast("long").alias("k_occurrence"), "n_vectors"
    )


_CONSENSUS_K = 5


@query(
    "knn_label_consensus",
    oracle=f"""
    WITH c AS (SELECT vec_id, embedding AS v, label FROM embeddings),
    cent AS ({_KNN_CELLS_SQL}),
    assign AS (
      SELECT vec_id, v, label, bid FROM (
        SELECT vec_id, v, label, bid, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT vec_id, v, label, bid, ROUND({{cos}}, 6) AS sim
              FROM c, cent)
      ) WHERE rn = 1
    ),
    knn AS (
      SELECT vec_id, label, nbr_label FROM (
        SELECT a.vec_id, a.label, b.label AS nbr_label,
               ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY ROUND({{cospair}}, 6) DESC, b.vec_id
               ) AS rk
        FROM assign a JOIN assign b
          ON a.bid = b.bid AND a.vec_id <> b.vec_id
      ) WHERE rk <= {_CONSENSUS_K}
    ),
    st AS (
      SELECT vec_id, COUNT(*) AS n_nbrs,
             COUNT(*) FILTER (WHERE nbr_label = label) AS n_agree
      FROM knn GROUP BY vec_id
    )
    SELECT a.vec_id, CAST(a.label AS BIGINT) AS label,
           CAST(COALESCE(s.n_nbrs, 0) AS BIGINT) AS n_nbrs,
           CAST(COALESCE(s.n_agree, 0) AS BIGINT) AS n_agree,
           CAST(CASE WHEN COALESCE(s.n_nbrs, 0) = 0 THEN -1
                ELSE CAST(s.n_agree AS HUGEINT) * 1000000 // s.n_nbrs
                END AS BIGINT) AS agree_ppm,
           COALESCE(s.n_nbrs, 0) > 0
             AND 2 * COALESCE(s.n_agree, 0) < COALESCE(s.n_nbrs, 0)
             AS is_suspect
    FROM assign a LEFT JOIN st s ON s.vec_id = a.vec_id
    """.format(cos=_cos("v", "bv"), cospair=_cos("a.v", "b.v")),
)
def knn_label_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label-consensus census (X233) — the confident-learning
    proxy for LABEL NOISE: per vector, how many of its k=5 nearest
    in-cell neighbors (X226's IVF cells) carry the SAME label, with an
    exact agreement ppm and a minority-vote suspect flag (fewer than
    half the neighbors agree). X226 flags geometric isolation
    (garbage/OOD) and X187/X173 score label-conditioned retrieval;
    this is the third curation lens — a vector whose neighborhood
    outvotes its label is the standing mislabel candidate that
    relabeling/pruning queues are built from (Northcutt et al.,
    confident learning). On the random fixture agreement hovers near
    the label prior, so the flag exercises the voting boundary; the
    PLUMBING (cell-bounded labeled self-kNN) is the operator.

    Scale: identical pair volume to X226 (Σ cell², never |corpus|²);
    the labeled cell assignment is the session-shared ``_knn_assigned``
    artifact (built once, one vec_id-keyed label join inside the
    build, amortized across the whole X226/X231/X233/X234 family);
    the vote is a per-anchor conditional count folded map-side after
    the WindowGroupLimit-pruned top-k. agree_ppm is one truncating
    big-int division per anchor.

    Reference parity: none; completes the X173/X187/X226 labeled
    vector-quality triangle."""
    from seng550_a3_etl_spark.functions.vectors import dot

    assigned = _knn_assigned(spark, sf_dir)
    a = assigned.select(
        "bid",
        F.col("vec_id").alias("va"),
        F.col("v").alias("xa"),
        F.col("__cn").alias("na"),
        F.col("label").alias("la"),
    )
    b = assigned.select(
        "bid",
        F.col("vec_id").alias("vb"),
        F.col("v").alias("xb"),
        F.col("__cn").alias("nb"),
        F.col("label").alias("lb"),
    )
    w = Window.partitionBy("va").orderBy(F.desc("cos"), F.asc("vb"))
    knn = (
        a.join(b, "bid")
        .filter(F.col("va") != F.col("vb"))
        .select(
            "va",
            "vb",
            "la",
            "lb",
            F.round(
                dot(F.col("xa"), F.col("xb")) / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _CONSENSUS_K)
    )
    st = knn.groupBy("va").agg(
        F.count(F.lit(1)).alias("n_nbrs"),
        F.count(F.when(F.col("lb") == F.col("la"), 1)).alias("n_agree"),
    )
    n_nbrs = F.coalesce("n_nbrs", F.lit(0))
    n_agree = F.coalesce("n_agree", F.lit(0))
    return (
        assigned.select("vec_id", "label")
        .join(st, assigned["vec_id"] == st["va"], "left")
        .select(
            "vec_id",
            F.col("label").cast("long").alias("label"),
            n_nbrs.cast("long").alias("n_nbrs"),
            n_agree.cast("long").alias("n_agree"),
            F.when(n_nbrs == 0, F.lit(-1))
            .otherwise(
                F.expr(
                    "CAST(CAST(coalesce(n_agree, 0) AS DECIMAL(38,0)) "
                    "* 1000000 DIV coalesce(n_nbrs, 1) AS LONG)"
                )
            )
            .cast("long")
            .alias("agree_ppm"),
            ((n_nbrs > 0) & (2 * n_agree < n_nbrs)).alias("is_suspect"),
        )
    )


@query(
    "hard_negative_mining",
    oracle=f"""
    WITH c AS (SELECT vec_id, embedding AS v, label FROM embeddings),
    cent AS ({_KNN_CELLS_SQL}),
    assign AS (
      SELECT vec_id, v, label, bid FROM (
        SELECT vec_id, v, label, bid, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT vec_id, v, label, bid, ROUND({{cos}}, 6) AS sim
              FROM c, cent)
      ) WHERE rn = 1
    ),
    best AS (
      SELECT vec_id, label, same, nbr, cos_micro FROM (
        SELECT a.vec_id, a.label, a.label = b.label AS same,
               b.vec_id AS nbr,
               CAST(ROUND(ROUND({{cospair}}, 6) * 1000000) AS BIGINT)
                 AS cos_micro,
               ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id, a.label = b.label
                 ORDER BY ROUND({{cospair}}, 6) DESC, b.vec_id
               ) AS rk
        FROM assign a JOIN assign b
          ON a.bid = b.bid AND a.vec_id <> b.vec_id
      ) WHERE rk = 1
    ),
    piv AS (
      SELECT vec_id, ANY_VALUE(label) AS label,
             MAX(cos_micro) FILTER (WHERE same) AS best_same_micro,
             MAX(cos_micro) FILTER (WHERE NOT same) AS best_cross_micro,
             MAX(nbr) FILTER (WHERE NOT same) AS hard_neg_id
      FROM best GROUP BY vec_id
    )
    SELECT vec_id, CAST(label AS BIGINT) AS label,
           best_same_micro, hard_neg_id, best_cross_micro,
           best_same_micro - best_cross_micro AS margin_micro,
           best_cross_micro > best_same_micro AS is_confusable
    FROM piv
    WHERE best_same_micro IS NOT NULL AND best_cross_micro IS NOT NULL
    """.format(cos=_cos("v", "bv"), cospair=_cos("a.v", "b.v")),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining census (X234) — the contrastive-training
    data miner: per anchor vector, its single most-similar SAME-label
    in-cell neighbor and its single most-similar CROSS-label in-cell
    neighbor (the hard negative — the wrong-class example the
    embedding finds most confusable), with the exact integer-micro
    margin between them. Negative margin (is_confusable) means the
    nearest cross-label point beats the nearest same-label one — the
    anchor is either mislabeled (X233's vote view of the same defect)
    or sits on a genuine class boundary worth oversampling in
    triplet/contrastive batches (the "semi-hard/hard negative" queue
    of FaceNet/SimCLR-style training). Anchors whose cell lacks a
    same- or cross-label neighbor carry no defined margin and are
    excluded, matching the oracle's NOT NULL gate.

    Scale: the X226 cell-bounded pair volume (Σ cell², never
    |corpus|²); the per-(anchor, side) argmax is a WindowGroupLimit-
    pruned rk=1 window (ties to the smaller neighbor id — both
    engines order (cos DESC, id ASC)); the pivot is a per-anchor
    2-row fold. Micro margins subtract two already-quantized longs,
    so cross-engine equality is trivial.

    Reference parity: none; the selection-side complement of X218's
    retrieval metric over the same labeled store."""
    from seng550_a3_etl_spark.functions.vectors import dot

    assigned = _knn_assigned(spark, sf_dir)
    a = assigned.select(
        "bid",
        F.col("vec_id").alias("va"),
        F.col("v").alias("xa"),
        F.col("__cn").alias("na"),
        F.col("label").alias("la"),
    )
    b = assigned.select(
        "bid",
        F.col("vec_id").alias("vb"),
        F.col("v").alias("xb"),
        F.col("__cn").alias("nb"),
        F.col("label").alias("lb"),
    )
    w = Window.partitionBy("va", "same").orderBy(
        F.desc("cos"), F.asc("vb")
    )
    best = (
        a.join(b, "bid")
        .filter(F.col("va") != F.col("vb"))
        .select(
            "va",
            "la",
            F.col("vb"),
            (F.col("la") == F.col("lb")).alias("same"),
            F.round(
                dot(F.col("xa"), F.col("xb")) / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "va",
            "la",
            "same",
            "vb",
            F.round(F.col("cos") * 1_000_000).cast("long").alias(
                "cos_micro"
            ),
        )
    )
    piv = best.groupBy("va").agg(
        F.any_value(F.col("la")).alias("label"),
        F.max(F.when(F.col("same"), F.col("cos_micro"))).alias(
            "best_same_micro"
        ),
        F.max(F.when(~F.col("same"), F.col("cos_micro"))).alias(
            "best_cross_micro"
        ),
        F.max(F.when(~F.col("same"), F.col("vb"))).alias("hard_neg_id"),
    )
    return (
        piv.filter(
            F.col("best_same_micro").isNotNull()
            & F.col("best_cross_micro").isNotNull()
        )
        .select(
            F.col("va").alias("vec_id"),
            F.col("label").cast("long").alias("label"),
            "best_same_micro",
            "hard_neg_id",
            "best_cross_micro",
            (F.col("best_same_micro") - F.col("best_cross_micro")).alias(
                "margin_micro"
            ),
            (F.col("best_cross_micro") > F.col("best_same_micro")).alias(
                "is_confusable"
            ),
        )
    )


@query(
    "label_centroid_drift",
    oracle=f"""
    WITH snap AS (
      SELECT label, vec_id % 2 AS s,
             list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ),
    cent AS (
      SELECT label, s, j AS dim, ROUND(AVG(v[j]), 6) AS c,
             COUNT(*) AS n
      FROM snap CROSS JOIN range(1, 65) t(j)
      GROUP BY label, s, j
    ),
    packed AS (
      SELECT label, s, ANY_VALUE(n) AS n,
             list_transform(
               list_sort(list_zip(list(dim), list(c)),
                         'ASC'),
               z -> z[2]::DOUBLE) AS cv
      FROM (SELECT label, s, dim, c, n FROM cent)
      GROUP BY label, s
    )
    SELECT a.label AS label,
           CAST(a.n AS BIGINT) AS n_a,
           CAST(b.n AS BIGINT) AS n_b,
           ROUND({_cos('a.cv', 'b.cv')}, 6) AS centroid_cos
    FROM packed a JOIN packed b
      ON a.label = b.label AND a.s = 0 AND b.s = 1
    """,
)
def label_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-centroid drift between snapshots (X240) —
    the vector-side member of the snapshot-diff family (X223 token
    drift, X236 quality drift, X232 shingle novelty): split the store
    into two ingestion snapshots (vec_id parity) and report, per
    label, the cosine between the label's snapshot-A and snapshot-B
    centroids. A label whose centroid moved (cos well below its
    siblings') means either the upstream ENCODER changed or that
    class's incoming data shifted — both invalidate fixed similarity
    thresholds (X164's SemDeDup cut, X173's kNN label gates) silently
    if unwatched. Centroid coordinates are 6-decimal-rounded per
    dimension (the X191/X213 recipe — AVG ulp noise sits far inside
    the rounding), so the cosine runs on identical doubles in both
    engines; labels present in only one snapshot drop (inner join) —
    absence is a different alarm (X223's new-type census shape).

    Scale: ONE corpus scan explodes to (label, snap, dim) partial
    means — map-side-combined, |labels|·2·64 groups; the drift join
    is |labels| rows against |labels| rows. The corpus never shuffles
    and nothing row-sized survives the first aggregation.

    Reference parity: none; extends the X213 centroid apparatus along
    the X223 snapshot axis."""
    from seng550_a3_etl_spark.functions.vectors import cosine

    t = load_tables(spark, sf_dir)
    cent = (
        t.embeddings.select(
            "label",
            (F.col("vec_id") % 2).alias("s"),
            F.posexplode("embedding").alias("dim", "x"),
        )
        .groupBy("label", "s", "dim")
        .agg(
            F.round(F.avg(F.col("x").cast("double")), 6).alias("c"),
            F.count(F.lit(1)).alias("n"),
        )
        .groupBy("label", "s")
        .agg(
            F.any_value("n").alias("n"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda z: z["c"],
            ).alias("cv"),
        )
    )
    a = cent.filter(F.col("s") == 0).select(
        "label", F.col("n").alias("n_a"), F.col("cv").alias("cva")
    )
    b = cent.filter(F.col("s") == 1).select(
        "label", F.col("n").alias("n_b"), F.col("cv").alias("cvb")
    )
    return a.join(b, "label").select(
        F.col("label").cast("long").alias("label"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(cosine(F.col("cva"), F.col("cvb")), 6).alias(
            "centroid_cos"
        ),
    )
