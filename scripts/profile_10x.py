"""Stage-level 10x scaling profile for the two sf1-spot watch items
(minhash_dup_pairs 11.9x, embedding_cosine_dedup 10.4x — VERDICT r5 #3).

Builds the bench's salted 10x replica of $SPARK_GRAFT_SF_DIR, then times
each pipeline stage (shingle/signature build, banding+candidates,
verify) at 1x and 10x and reports the per-stage ratio plus candidate /
bucket-size distributions, so the superlinear stage is identified by
measurement instead of guesswork.

Usage: python scripts/profile_10x.py [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from seng550_a3_etl_spark.session import get_spark  # noqa: E402


def _t(label: str, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"    {label:42s} {dt:7.2f}s")
    return out, dt


def profile_minhash(spark, sf_dir: str) -> dict:
    # Stage boundaries force this to mirror minhash_lsh_pairs'
    # internals; the scale knobs are imported from the suite module so
    # a re-parameterization there cannot leave this profiler measuring
    # a different pipeline under the same query name.
    from seng550_a3_etl_spark.functions.text import shingles, tokens
    from seng550_a3_etl_spark.functions.hashing import minhash_signatures
    from seng550_a3_etl_spark.operators.text_dedup import (
        band_keys,
        bucket_pairs,
    )
    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.suite.text import (
        MINHASH_BANDS,
        MINHASH_NUM_PERM,
    )

    t = load_tables(spark, sf_dir)
    res: dict = {}

    sets_, res["shingle_build"] = _t(
        "shingle build (string, eager ckpt)",
        lambda: t.documents.select(
            F.col("doc_id").alias("doc"),
            F.array_distinct(shingles(tokens(F.col("text")), 3)).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .localCheckpoint(eager=True),
    )

    signed = minhash_signatures(sets_, "doc", F.col("sh"), MINHASH_NUM_PERM)
    banded = band_keys(
        signed, MINHASH_BANDS, MINHASH_NUM_PERM // MINHASH_BANDS
    )
    cand, res["sign_band_cand"] = _t(
        "signatures + banding + candidates (ckpt)",
        lambda: bucket_pairs(banded, ["band", "key"], F.col("doc"))
        .toDF("doc_a", "doc_b")
        .distinct()
        .localCheckpoint(eager=True),
    )
    res["n_cand"] = cand.count()
    print(f"    candidates: {res['n_cand']}")

    # bucket-size distribution of the banding groupBy
    bs = (
        banded.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("sz").alias("max_sz"),
            F.sum(F.col("sz") * (F.col("sz") - 1) / 2).alias("pair_budget"),
        )
        .collect()[0]
    )
    print(
        f"    buckets={bs['n_buckets']} max_size={bs['max_sz']} "
        f"C(n,2) budget={int(bs['pair_budget'])}"
    )
    res["max_bucket"] = bs["max_sz"]
    res["pair_budget"] = int(bs["pair_budget"])

    melted = cand.select(
        F.struct("doc_a", "doc_b").alias("__pair"),
        F.posexplode(F.array("doc_a", "doc_b")).alias("__side", "doc"),
    )
    verified = (
        melted.join(sets_, "doc")
        .groupBy("__pair")
        .agg(
            F.first(
                F.when(F.col("__side") == 0, F.col("sh")), ignorenulls=True
            ).alias("sh_a"),
            F.first(
                F.when(F.col("__side") == 1, F.col("sh")), ignorenulls=True
            ).alias("sh_b"),
        )
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
    )
    _, res["verify"] = _t(
        "verify (melt-join + array_intersect)",
        lambda: verified.select("inter").write.format("noop").mode(
            "overwrite"
        ).save(),
    )
    return res


def profile_cosine(spark, sf_dir: str) -> dict:
    # Same mirroring caveat as profile_minhash: knobs come from the
    # suite module (COSINE_DEDUP_*), never hardcoded here.
    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.operators.similarity import (
        _band_keys_expr,
        _sign_bits_expr,
        hyperplane_weights,
    )
    from seng550_a3_etl_spark.operators.text_dedup import bucket_pairs
    from seng550_a3_etl_spark.suite.vectors import (
        COSINE_DEDUP_BANDS,
        COSINE_DEDUP_DIM,
        COSINE_DEDUP_PLANES,
    )

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
    res: dict = {}

    planes, bands = COSINE_DEDUP_PLANES, COSINE_DEDUP_BANDS
    rows = planes // bands
    weights = hyperplane_weights(planes, COSINE_DEDUP_DIM)
    banded_df = corpus.select(
        F.col("id"), F.expr(_sign_bits_expr("v", weights)).alias("__bits")
    ).select(
        F.col("id"),
        F.posexplode(F.expr(_band_keys_expr("__bits", bands, rows))).alias(
            "band", "bkey"
        ),
    )
    banded, res["sign_band"] = _t(
        "sign bits + band keys (eager ckpt)",
        lambda: banded_df.localCheckpoint(eager=True),
    )

    cand, res["cand"] = _t(
        "bucket pairs + distinct (ckpt)",
        lambda: bucket_pairs(banded, ["band", "bkey"], F.col("id"))
        .toDF("id_a", "id_b")
        .distinct()
        .localCheckpoint(eager=True),
    )
    res["n_cand"] = cand.count()
    print(f"    candidates: {res['n_cand']}")

    bs = (
        banded.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("sz").alias("max_sz"),
            F.sum(F.col("sz") * (F.col("sz") - 1) / 2).alias("pair_budget"),
        )
        .collect()[0]
    )
    print(
        f"    buckets={bs['n_buckets']} max_size={bs['max_sz']} "
        f"C(n,2) budget={int(bs['pair_budget'])}"
    )
    res["max_bucket"] = bs["max_sz"]
    res["pair_budget"] = int(bs["pair_budget"])

    vn = corpus.select(
        F.col("id"),
        F.col("v").alias("__v"),
        F.sqrt(
            F.aggregate(
                F.transform(
                    F.col("v"), lambda x: x.cast("double") * x.cast("double")
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("__n"),
    )
    melted = cand.select(
        F.struct("id_a", "id_b").alias("__pair"),
        F.posexplode(F.array("id_a", "id_b")).alias("__side", "id"),
    )

    def side(i, c):
        return F.first(
            F.when(F.col("__side") == i, F.col(c)), ignorenulls=True
        )

    verified = (
        melted.join(vn, "id")
        .groupBy("__pair")
        .agg(
            side(0, "__v").alias("va"),
            side(1, "__v").alias("vb"),
            side(0, "__n").alias("na"),
            side(1, "__n").alias("nb"),
        )
        .withColumn(
            "dot",
            F.aggregate(
                F.zip_with(
                    "va", "vb",
                    lambda a, b: a.cast("double") * b.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .withColumn("cos", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6))
    )
    _, res["verify"] = _t(
        "verify (melt-join + dot)",
        lambda: verified.select("cos").write.format("noop").mode(
            "overwrite"
        ).save(),
    )
    return res


def profile_ann_ivf(spark, sf_dir: str) -> dict:
    # Mirrors ann_recall_ivf stage-by-stage; the centroid/probe knobs
    # are the module constants ivf_pq_search shares (the query inlines
    # the same values — its oracle hardcodes them too).
    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.operators.similarity import (
        assign_buckets,
        cosine_topk,
        ivf_topk,
    )
    from seng550_a3_etl_spark.suite.vectors import (
        _IVF_CENT_CAP,
        _IVF_CENT_MOD,
        _IVF_NPROBE,
    )

    t = load_tables(spark, sf_dir)
    emb = t.embeddings
    res: dict = {"scan_partitions": emb.rdd.getNumPartitions()}
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    cent = (
        emb.filter(F.col("vec_id") % _IVF_CENT_MOD == 0)
        .orderBy("vec_id")
        .limit(_IVF_CENT_CAP)
        .select(F.col("vec_id").alias("bid"), F.col("embedding").alias("bv"))
    )
    exact, res["exact_topk"] = _t(
        "exact cosine_topk ground truth (ckpt)",
        lambda: cosine_topk(q, c, k=5)
        .select("qid", "cid")
        .localCheckpoint(eager=True),
    )
    _, res["bucket_assign"] = _t(
        "assign_buckets corpus fold (noop)",
        lambda: assign_buckets(c, cent)
        .select("cid", "bid")
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    approx, res["ivf_probe_rank"] = _t(
        "ivf_topk assign+probe+rank (ckpt)",
        lambda: ivf_topk(q, c, cent, k=5, nprobe=_IVF_NPROBE)
        .select("qid", "cid")
        .localCheckpoint(eager=True),
    )
    gate = (
        exact.join(approx.withColumn("__hit", F.lit(1)), ["qid", "cid"], "left")
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n"), F.count("__hit").alias("h"))
    )
    _, res["gate_join"] = _t(
        "recall gate join+fold (noop)",
        lambda: gate.write.format("noop").mode("overwrite").save(),
    )
    return res


def profile_ann_ivf_pq(spark, sf_dir: str) -> dict:
    # The gate composes two registered queries; time each composed leg
    # and the full gate (the legs re-run inside it — stages here are
    # for per-stage RATIOS, not additivity).
    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.suite.vectors import (
        ann_recall_ivf_pq,
        embedding_topk,
        ivf_pq_search,
    )

    t = load_tables(spark, sf_dir)
    res: dict = {"scan_partitions": t.embeddings.rdd.getNumPartitions()}
    for label, fn in (
        ("exact_topk", embedding_topk),
        ("ivf_pq_search", ivf_pq_search),
        ("gate_full", ann_recall_ivf_pq),
    ):
        _, res[label] = _t(
            f"{label} (noop)",
            lambda fn=fn: fn(spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
    return res


def profile_semantic_dedup(spark, sf_dir: str) -> dict:
    # Mirrors semantic_dedup_clusters: sqrt-capped centroids, jittered
    # corpus, cluster-blocked pair verify — plus the cell-size census
    # that bounds the C(|cell|,2) pair budget.
    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.operators.similarity import (
        assign_buckets,
        semantic_dedup_pairs,
    )
    from seng550_a3_etl_spark.suite.vectors import (
        _SEMDEDUP_THRESHOLD,
        _semdedup_cent,
    )

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
    res: dict = {}
    cent, res["centroid_build"] = _t(
        "ceil(sqrt(n)) centroid pick (count + TakeOrdered, ckpt)",
        lambda: _semdedup_cent(t.embeddings).localCheckpoint(eager=True),
    )
    res["n_cells"] = cent.count()
    assigned, res["assign"] = _t(
        "assign_buckets fold (ckpt)",
        lambda: assign_buckets(corpus, cent, "id", "v").localCheckpoint(
            eager=True
        ),
    )
    cs = (
        assigned.groupBy("bid")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.max("sz").alias("max_sz"),
            F.sum(F.col("sz") * (F.col("sz") - 1) / 2).alias("pair_budget"),
        )
        .collect()[0]
    )
    res["max_cell"] = cs["max_sz"]
    res["pair_budget"] = int(cs["pair_budget"])
    print(f"    cells={res['n_cells']} max={cs['max_sz']} "
          f"C(n,2) budget={res['pair_budget']}")
    pairs, res["pair_verify"] = _t(
        "in-cell pair cosine verify (ckpt)",
        lambda: semantic_dedup_pairs(
            corpus, cent, threshold=_SEMDEDUP_THRESHOLD,
            id_col="id", vec_col="v",
        ).localCheckpoint(eager=True),
    )
    _, res["cluster_rollup"] = _t(
        "per-survivor cluster rollup (noop)",
        lambda: pairs.groupBy(
            F.col("id_b").alias("id_dropped"), "bid"
        )
        .agg(F.count(F.lit(1)).alias("n_dups"))
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    return res


def profile_kmeans_iter(spark, sf_dir: str) -> dict:
    # Per-iteration walls for the 3-step Lloyd loop (fixed 50-seed
    # capacity, the r10 scale-stable recipe).
    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.operators.clustering import kmeans_step
    from seng550_a3_etl_spark.suite.vectors import _KMEANS_ITER_STEPS

    t = load_tables(spark, sf_dir)
    corpus = t.embeddings.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    cent = (
        t.embeddings.orderBy("vec_id")
        .limit(50)
        .select(F.col("vec_id").alias("bid"), F.col("embedding").alias("bv"))
    )
    res: dict = {"scan_partitions": t.embeddings.rdd.getNumPartitions()}
    for i in range(_KMEANS_ITER_STEPS):
        step, res[f"iter_{i}"] = _t(
            f"kmeans_step {i} (E fold + M shuffle, ckpt)",
            lambda c=cent: kmeans_step(corpus, c).localCheckpoint(eager=True),
        )
        cent = step.select(
            "bid",
            F.transform(
                "centroid_micros", lambda m: m / F.lit(1000000.0)
            ).alias("bv"),
        )
    return res


def profile_matryoshka(spark, sf_dir: str) -> dict:
    # Two stages: the prefix-cosine pair pass + per-(dims, qid) rank
    # (the corpus-sized term) and the recall rollup (k-sized).
    from pyspark.sql.window import Window

    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.functions.vectors import dot
    from seng550_a3_etl_spark.plans.layout import spread_for_cpu
    from seng550_a3_etl_spark.suite.vectors import (
        _MRL_DIMS,
        matryoshka_recall_curve,
    )

    t = load_tables(spark, sf_dir)
    emb = t.embeddings
    res: dict = {"scan_partitions": emb.rdd.getNumPartitions()}
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = spread_for_cpu(
        emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    )

    def pcos(d):
        a, b = F.slice("qv", 1, d), F.slice("cv", 1, d)
        return F.round(dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))), 6)

    scored = (
        q.crossJoin(c)
        .filter(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            F.explode(
                F.array(*[
                    F.struct(F.lit(d).alias("dims"), pcos(d).alias("cosine"))
                    for d in _MRL_DIMS
                ])
            ).alias("lv"),
        )
        .select("qid", "cid", "lv.dims", "lv.cosine")
    )
    ranked = scored.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("dims", "qid").orderBy(
                F.desc("cosine"), F.asc("cid")
            )
        ),
    ).filter(F.col("rk") <= 5)
    _, res["pair_score_rank"] = _t(
        "prefix-cosine pair pass + rank (noop)",
        lambda: ranked.select("dims", "qid", "cid")
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    _, res["full_query"] = _t(
        "full query incl. recall rollup (noop)",
        lambda: matryoshka_recall_curve(spark, sf_dir)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    return res


def profile_fuzzy(spark, sf_dir: str) -> dict:
    # Mirrors fuzzy_dup_pairs: min-shingle fingerprint build, bucket
    # candidates (+ collision census), melt-join + Levenshtein verify.
    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.functions.text import doc_fingerprint, tokens
    from seng550_a3_etl_spark.operators.text_dedup import bucket_pairs
    from seng550_a3_etl_spark.plans.layout import spread_for_cpu

    t = load_tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "text")
    res: dict = {}
    fps, res["fingerprint_build"] = _t(
        "min-shingle fingerprints (spread, ckpt)",
        lambda: spread_for_cpu(docs).select(
            "doc_id", doc_fingerprint(tokens(F.col("text")), n=5).alias("fp")
        )
        .filter(F.col("fp").isNotNull())
        .localCheckpoint(eager=True),
    )
    cand, res["candidates"] = _t(
        "fingerprint bucket pairs (ckpt)",
        lambda: bucket_pairs(fps, ["fp"], F.col("doc_id"))
        .toDF("doc_a", "doc_b")
        .distinct()
        .localCheckpoint(eager=True),
    )
    res["n_cand"] = cand.count()
    print(f"    candidates: {res['n_cand']}")
    melted = cand.select(
        F.struct("doc_a", "doc_b").alias("__pair"),
        F.posexplode(F.array("doc_a", "doc_b")).alias("__side", "doc_id"),
    )
    paired = (
        melted.join(docs, "doc_id")
        .groupBy("__pair")
        .agg(
            F.first(
                F.when(F.col("__side") == 0, F.col("text")), ignorenulls=True
            ).alias("ta"),
            F.first(
                F.when(F.col("__side") == 1, F.col("text")), ignorenulls=True
            ).alias("tb"),
        )
    )
    lev = F.levenshtein("ta", "tb")
    _, res["lev_verify"] = _t(
        "melt-join + Levenshtein verify (noop)",
        lambda: paired.filter(
            lev <= 0.2 * F.greatest(F.length("ta"), F.length("tb"))
        )
        .select(lev.alias("lev"))
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    return res


def profile_dup_span(spark, sf_dir: str) -> dict:
    # Mirrors operators.text_dedup.dup_span_stats' three stages at the
    # suite's _SPAN_K; same knob-import caveat as profile_minhash.
    from pyspark.sql.window import Window

    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.functions.hashing import hash64
    from seng550_a3_etl_spark.functions.text import shingles, tokens
    from seng550_a3_etl_spark.plans.layout import spread_for_cpu
    from seng550_a3_etl_spark.suite.text import _SPAN_K

    t = load_tables(spark, sf_dir)
    k = _SPAN_K
    res: dict = {"scan_partitions": t.documents.rdd.getNumPartitions()}
    docs = spread_for_cpu(t.documents).select(
        "doc_id", tokens(F.col("text")).alias("__tk")
    )
    wins, res["window_hash_explode"] = _t(
        "k-token window hashes exploded (ckpt)",
        lambda: docs.filter(F.size("__tk") >= k)
        .select(
            "doc_id",
            F.explode(
                F.transform(shingles(F.col("__tk"), k), lambda c: hash64(c))
            ).alias("__h"),
        )
        .localCheckpoint(eager=True),
    )
    per = wins.groupBy("__h", "doc_id").agg(F.count(F.lit(1)).alias("__c"))
    dupc = (
        per.withColumn(
            "__nd", F.count(F.lit(1)).over(Window.partitionBy("__h"))
        )
        .filter(F.col("__nd") >= 2)
        .groupBy("doc_id")
        .agg(F.sum("__c").alias("__dup"))
    )
    dupc_m, res["posting_rollup"] = _t(
        "(hash, doc) rollup + shared filter (ckpt)",
        lambda: dupc.localCheckpoint(eager=True),
    )
    _, res["closing_join"] = _t(
        "per-doc closing left join (noop)",
        lambda: docs.join(dupc_m, "doc_id", "left")
        .select("doc_id", F.coalesce("__dup", F.lit(0)).alias("n"))
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    return res


def profile_triangles(spark, sf_dir: str) -> dict:
    # Mirrors copurchase_triangles (suite/analytics.py) +
    # operators/graph.triangle_count stage-by-stage: the co-purchase
    # edge build (the lineitem self-join), the degree rollup, the
    # (deg,id)-orientation join, the oriented adjacency-list build, and
    # the edge-iterator closing intersection — so a >=8x sf1 spot can
    # name WHICH of the O(m) shuffles vs the O(m^1.5) intersection is
    # moving superlinearly.
    from pyspark.sql import Window  # noqa: F401

    from seng550_a3_etl_spark.catalog import load_tables

    t = load_tables(spark, sf_dir)
    res: dict = {}

    op = (
        t.lineitem.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    x, y = op.alias("x"), op.alias("y")
    e, res["edge_build"] = _t(
        "co-purchase edge self-join + distinct (ckpt)",
        lambda: x.join(
            y, (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p"))
        )
        .select(F.col("x.p").alias("a"), F.col("y.p").alias("b"))
        .distinct()
        .localCheckpoint(eager=True),
    )
    res["n_edges"] = e.count()
    print(f"    edges: {res['n_edges']}")

    deg, res["degree_rollup"] = _t(
        "degree rollup (ckpt)",
        lambda: e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True),
    )

    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    lo_is_a = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented, res["orientation_join"] = _t(
        "orientation join e><deg><deg (ckpt)",
        lambda: e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lo_is_a, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(lo_is_a, F.col("b")).otherwise(F.col("a")).alias("hi"),
        )
        .localCheckpoint(eager=True),
    )

    adj, res["adjacency_build"] = _t(
        "oriented adjacency collect_list (ckpt)",
        lambda: oriented.groupBy("lo")
        .agg(F.sort_array(F.collect_list("hi")).alias("nbrs"))
        .localCheckpoint(eager=True),
    )
    # orientation caps out-degree at O(sqrt(m)); record the actual cap
    mx = adj.select(F.max(F.size("nbrs")).alias("m")).collect()[0].m
    res["max_out_degree"] = mx
    print(f"    max oriented out-degree: {mx}")

    _, res["closing_intersect"] = _t(
        "edge-iterator closing intersection (agg)",
        lambda: oriented.join(
            adj.select(F.col("lo"), F.col("nbrs").alias("n_lo")), "lo"
        )
        .join(
            adj.select(F.col("lo").alias("hi"), F.col("nbrs").alias("n_hi")),
            "hi",
            "left",
        )
        .select(
            F.when(F.col("n_hi").isNull(), F.lit(0))
            .otherwise(F.size(F.array_intersect("n_lo", "n_hi")))
            .cast("long")
            .alias("c")
        )
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n_triangles"))
        .collect(),
    )
    return res


def profile_normalized_dedup(spark, sf_dir: str) -> dict:
    # Mirrors normalized_exact_dedup: spread scan -> normalize+md5
    # projection -> (hash) group rollup -> closing join. The replica's
    # per-token digit suffix keeps within-replica dup structure
    # isomorphic, so group counts scale linearly while the projection
    # re-pays the 10x scan.
    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.plans.layout import spread_for_cpu
    from seng550_a3_etl_spark.suite.text import _spark_norm

    t = load_tables(spark, sf_dir)
    res: dict = {}
    hashed, res["normalize_hash"] = _t(
        "normalize + md5 projection (spread, ckpt)",
        lambda: spread_for_cpu(t.documents)
        .select(
            "doc_id",
            F.md5(_spark_norm(F.col("text"))).alias("__h"),
            F.md5(F.col("text")).alias("__raw"),
        )
        .localCheckpoint(eager=True),
    )
    groups, res["group_rollup"] = _t(
        "(hash) group rollup + variant count (ckpt)",
        lambda: hashed.groupBy("__h")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct("__raw").alias("n_raw_variants"),
        )
        .localCheckpoint(eager=True),
    )
    _, res["closing_join"] = _t(
        "hash-keyed closing join (noop)",
        lambda: hashed.join(groups, "__h")
        .select("doc_id", "canonical_id", "group_size", "n_raw_variants")
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    return res


def profile_pagerank_step(spark, sf_dir: str) -> dict:
    # Mirrors pagerank_step_parts: the C(basket,2) co-purchase edge
    # build (the 10x-sensitive scan+self-join; the replica salts
    # orderkeys with baskets unchanged, so the GROUPED edge set is
    # identical and only this stage re-pays the 10x), then one rank
    # step over the pinned edges.
    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.operators.graph import pagerank_step

    t = load_tables(spark, sf_dir)
    res: dict = {}
    op = (
        t.lineitem.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    a, b = op.alias("a"), op.alias("b")
    edges, res["edge_build"] = _t(
        "co-purchase edge self-join + weight groupBy (ckpt)",
        lambda: a.join(
            b,
            (F.col("a.o") == F.col("b.o"))
            & (F.col("a.p") != F.col("b.p")),
        )
        .groupBy(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=True),
    )
    res["n_edges"] = edges.count()
    _, res["rank_step"] = _t(
        "one PageRank step (out-weights + contribution sum, noop)",
        lambda: pagerank_step(edges)
        .select("node", "pr")
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    return res


def profile_proration(spark, sf_dir: str) -> dict:
    # Mirrors revenue_proration: the 5%-sampled lineitem scan + order
    # join, then the largest-remainder window chain (three windows on
    # the one order-key exchange).
    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.functions.hashing import hash64
    from seng550_a3_etl_spark.operators.stats import largest_remainder
    from seng550_a3_etl_spark.suite.analytics import _cents

    t = load_tables(spark, sf_dir)
    res: dict = {}
    keep = hash64(F.col("l_orderkey").cast("string"), seed=9) % 20 == 0
    j, res["scan_join"] = _t(
        "5% hash filter + order join (ckpt)",
        lambda: t.lineitem.filter(keep)
        .select(
            "l_orderkey",
            "l_linenumber",
            _cents("l_extendedprice").alias("w"),
        )
        .join(
            t.orders.select(
                F.col("o_orderkey").alias("l_orderkey"),
                _cents("o_totalprice").alias("t"),
            ),
            "l_orderkey",
        )
        .localCheckpoint(eager=True),
    )
    res["n_rows"] = j.count()
    _, res["remainder_windows"] = _t(
        "largest-remainder window chain (noop)",
        lambda: largest_remainder(
            j,
            key_cols=["l_orderkey"],
            weight_col="w",
            total_col="t",
            order_cols=["l_linenumber"],
            out_col="alloc_cents",
        )
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    return res


def profile_bpe_encode(spark, sf_dir: str) -> dict:
    # Two-stage split via the composed queries themselves: the vocab
    # build (X121 merge rollup + char census + id table — the corpus
    # word-count shuffle) and the full encode (vocab build + the
    # per-row greedy-match fold). encode_full INCLUDES the vocab
    # stage, so encode-only cost is the difference; the signal that
    # matters is both rows scaling ~linearly — the fold is one pass
    # over the characters and the vocab map is a broadcast row.
    from seng550_a3_etl_spark.suite.text_lm import (
        bpe_encode_docs,
        bpe_merge_candidates,
    )

    res: dict = {}
    _, res["vocab_build"] = _t(
        "BPE merge rollup + char census (X121, noop)",
        lambda: bpe_merge_candidates(spark, sf_dir)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    _, res["encode_full"] = _t(
        "vocab build + per-row greedy encode fold (noop)",
        lambda: bpe_encode_docs(spark, sf_dir)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    return res




def profile_hard_negative(spark, sf_dir: str) -> dict:
    # Mirrors hard_negative_mining (X234, representative of the
    # self-kNN family X226/X231/X233/X234): ceil(sqrt(n)) cell pick,
    # assign + label join, in-cell pair build with the dual
    # per-(anchor, side) argmax windows, and the 2-row-per-anchor
    # pivot — plus the cell census that bounds the n^1.5 pair budget.
    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.functions.vectors import dot
    from seng550_a3_etl_spark.operators.similarity import assign_buckets
    from seng550_a3_etl_spark.suite.vectors import _knn_cells

    t = load_tables(spark, sf_dir)
    corpus = t.embeddings.select("vec_id", F.col("embedding").alias("v"))
    res: dict = {}
    cent, res["cell_pick"] = _t(
        "ceil(sqrt(n)) cell pick (count + TakeOrdered, ckpt)",
        lambda: _knn_cells(t.embeddings).localCheckpoint(eager=True),
    )
    res["n_cells"] = cent.count()
    assigned, res["assign_label_join"] = _t(
        "assign fold + label join (ckpt)",
        lambda: assign_buckets(corpus, cent, "vec_id", "v")
        .join(t.embeddings.select("vec_id", "label"), "vec_id")
        .localCheckpoint(eager=True),
    )
    cs = (
        assigned.groupBy("bid")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.max("sz").alias("max_sz"),
            F.sum(F.col("sz") * (F.col("sz") - 1)).alias("pair_budget"),
        )
        .collect()[0]
    )
    res["max_cell"] = cs["max_sz"]
    res["pair_budget"] = int(cs["pair_budget"])
    print(f"    cells={res['n_cells']} max={cs['max_sz']} "
          f"ordered-pair budget={res['pair_budget']}")
    from pyspark.sql.window import Window

    a = assigned.select(
        "bid", F.col("vec_id").alias("va"), F.col("v").alias("xa"),
        F.col("__cn").alias("na"), F.col("label").alias("la"),
    )
    b = assigned.select(
        "bid", F.col("vec_id").alias("vb"), F.col("v").alias("xb"),
        F.col("__cn").alias("nb"), F.col("label").alias("lb"),
    )
    w = Window.partitionBy("va", "same").orderBy(F.desc("cos"), F.asc("vb"))
    best, res["pair_argmax"] = _t(
        "in-cell pair cosine + dual argmax windows (ckpt)",
        lambda: a.join(b, "bid")
        .filter(F.col("va") != F.col("vb"))
        .select(
            "va", "la", "vb",
            (F.col("la") == F.col("lb")).alias("same"),
            F.round(
                dot(F.col("xa"), F.col("xb")) / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .localCheckpoint(eager=True),
    )
    _, res["pivot"] = _t(
        "per-anchor 2-row pivot (noop)",
        lambda: best.groupBy("va")
        .agg(
            F.max(F.when(F.col("same"), F.col("vb"))).alias("s"),
            F.max(F.when(~F.col("same"), F.col("vb"))).alias("c"),
        )
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    return res




def profile_copurchase_recs(spark, sf_dir: str) -> dict:
    # Mirrors copurchase_jaccard_recs (X152): distinct (order, part)
    # edge build, per-basket C(b,2) pair generation + pair rollup,
    # degree joins + exact-jaccard projection, and the per-part top-3
    # rank window — plus the pair budget that bounds the rollup.
    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.operators.text_dedup import bucket_pairs
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    res: dict = {}
    op, res["edge_distinct"] = _t(
        "distinct (order, part) edges (ckpt)",
        lambda: t.lineitem.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint(eager=True),
    )
    res["n_edges"] = op.count()
    co, res["basket_pairs_rollup"] = _t(
        "per-basket C(b,2) pairs + (a,b) rollup (ckpt)",
        lambda: bucket_pairs(op, ["o"], F.col("p"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("co"))
        .localCheckpoint(eager=True),
    )
    res["n_pairs"] = co.count()
    deg = op.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    da = deg.select(F.col("p").alias("a"), F.col("n").alias("na"))
    db = deg.select(F.col("p").alias("b"), F.col("n").alias("nb"))
    sim, res["degree_jaccard"] = _t(
        "degree joins + exact jaccard (ckpt)",
        lambda: co.join(da, "a")
        .join(db, "b")
        .select(
            "a", "b", "co",
            F.expr(
                "co * 1000000000 DIV (na + nb - co)"
            ).alias("jaccard_ppb"),
        )
        .localCheckpoint(eager=True),
    )
    both = sim.select(
        F.col("a").alias("src_part"), F.col("b").alias("rec_part"),
        "co", "jaccard_ppb",
    ).unionByName(
        sim.select(
            F.col("b").alias("src_part"), F.col("a").alias("rec_part"),
            "co", "jaccard_ppb",
        )
    )
    wr = Window.partitionBy("src_part").orderBy(
        F.desc("jaccard_ppb"), F.desc("co"), "rec_part"
    )
    _, res["topk_window"] = _t(
        "per-part top-3 rank window (noop)",
        lambda: both.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 3)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    return res




def profile_ngram(spark, sf_dir: str) -> dict:
    # Mirrors ngram_dup_pairs (X2): session shingle-set build (shared
    # cache), posting explode + stop-shingle frequency bound, the
    # C(freq,2) pair intersections, and the exact-jaccard close —
    # plus the bounded posting pair budget.
    from seng550_a3_etl_spark.operators.text_dedup import (
        pair_intersections,
    )
    from seng550_a3_etl_spark.suite.text import _shingle_sets_df

    res: dict = {}
    sets_, res["shingle_sets"] = _t(
        "session shingle sets (cache build or hit, ckpt)",
        lambda: _shingle_sets_df(spark, sf_dir, n=3, hashed=True),
    )
    ex = sets_.select("doc", F.explode("sh").alias("hs"))
    freq = ex.groupBy("hs").agg(F.count(F.lit(1)).alias("f"))
    pb = freq.filter(F.col("f") <= 64).agg(
        F.sum(F.col("f") * (F.col("f") - 1) / 2).alias("b")
    ).collect()[0]["b"]
    res["pair_budget"] = int(pb or 0)
    print(f"    bounded posting pair budget={res['pair_budget']}")
    inter, res["pair_intersections"] = _t(
        "posting pairs + per-pair intersection rollup (ckpt)",
        lambda: pair_intersections(sets_, 64).localCheckpoint(
            eager=True
        ),
    )
    res["n_candidate_pairs"] = inter.count()
    _, res["jaccard_close"] = _t(
        "exact jaccard + threshold close (noop)",
        lambda: inter.withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= 0.8)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    return res


def profile_dsir(spark, sf_dir: str) -> dict:
    # Mirrors dsir_importance_weights (suite/text_lm.py): pinned
    # bigram explode, |vocab|-row model build, broadcast-model scoring
    # join + per-doc mean. Every stage is linear in the corpus (the
    # explode) or in |vocab| (the model); the counters record both so
    # a window-inflated spot (r13: 8.1x in a window whose idle check
    # measured load 25.8 before start) self-explains as linear.
    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.functions.text import shingles, tokens
    from seng550_a3_etl_spark.suite.text_lm import _DSIR_TARGET

    t = load_tables(spark, sf_dir)
    is_tgt = F.col("source").isin(*_DSIR_TARGET)
    res: dict = {}
    bg, res["bigram_explode"] = _t(
        "bigram explode (pinned ckpt)",
        lambda: t.documents.select(
            "doc_id",
            is_tgt.alias("is_tgt"),
            F.explode(shingles(tokens(F.col("text")), 2)).alias("b"),
        ).localCheckpoint(eager=True),
    )
    res["n_bigram_rows"] = bg.count()
    cnt = bg.groupBy("b").agg(
        F.count_if(F.col("is_tgt")).alias("ct"),
        F.count_if(~F.col("is_tgt")).alias("cr"),
    )
    model, res["model_build"] = _t(
        "two-sided count + smoothed LLR model (ckpt)",
        lambda: cnt.crossJoin(
            F.broadcast(
                cnt.agg(
                    F.sum("ct").alias("tt"),
                    F.sum("cr").alias("tr"),
                    F.count(F.lit(1)).alias("v"),
                )
            )
        )
        .select(
            "b",
            F.log(
                ((F.col("ct") + 1) / (F.col("tt") + F.col("v")))
                / ((F.col("cr") + 1) / (F.col("tr") + F.col("v")))
            ).alias("logw"),
        )
        .localCheckpoint(eager=True),
    )
    res["vocab_size"] = model.count()
    print(f"    bigram rows={res['n_bigram_rows']} "
          f"vocab={res['vocab_size']}")
    _, res["score_join"] = _t(
        "broadcast-model scoring join + per-doc mean",
        lambda: bg.filter(~F.col("is_tgt"))
        .join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("logw"), 6).alias("avg_llr"),
        )
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    return res


def profile_stream_minhash(spark, sf_dir: str) -> dict:
    # Mirrors stream_minhash_dedup's internals (suite/streaming_suite):
    # static band index from the session shingle cache, the availableNow
    # streaming candidate job (stateless sign+band inside the
    # micro-batch, stream-static join), and the post-sink distinct +
    # exact-Jaccard verify. The streaming-job stage isolates the
    # machinery a batch profiler can't see (micro-batch planning, sink
    # appends); its cost class is linear in |stream| x bands.
    from pyspark.sql import DataFrame

    from seng550_a3_etl_spark.functions.hashing import minhash_signature
    from seng550_a3_etl_spark.functions.text import shingles, tokens
    from seng550_a3_etl_spark.operators.text_dedup import band_keys
    from seng550_a3_etl_spark.suite.streaming_suite import _await
    from seng550_a3_etl_spark.suite.text import (
        MINHASH_BANDS,
        MINHASH_NUM_PERM,
        MINHASH_THRESHOLD,
        _shingle_sets_df,
    )

    rpb = MINHASH_NUM_PERM // MINHASH_BANDS
    res: dict = {}

    def banded(df: DataFrame) -> DataFrame:
        signed = df.filter(F.size("sh") > 0).select(
            "doc",
            minhash_signature(F.col("sh"), MINHASH_NUM_PERM).alias("sig"),
        )
        return band_keys(signed, MINHASH_BANDS, rpb)

    sets_, res["shingle_sets"] = _t(
        "shingle sets (session cache or build)",
        lambda: _shingle_sets_df(spark, sf_dir, n=3, hashed=False),
    )
    index, res["index_build"] = _t(
        "static band index (sign + band, ckpt)",
        lambda: banded(sets_)
        .select(F.col("doc").alias("odoc"), "band", "key")
        .localCheckpoint(eager=True),
    )

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    par = spark.sparkContext.defaultParallelism

    def run_stream():
        stream = spark.readStream.schema(schema).parquet(
            f"{sf_dir}/documents.parquet*"
        )
        signed = (
            stream.select(F.col("doc_id").alias("doc"), "text")
            .filter(F.size(tokens(F.col("text"))) >= 3)
            .repartition(par)
            .select(
                "doc",
                F.array_distinct(
                    shingles(tokens(F.col("text")), 3)
                ).alias("sh"),
            )
            .select(
                "doc",
                minhash_signature(
                    F.col("sh"), MINHASH_NUM_PERM
                ).alias("sig"),
            )
            .repartition(par, F.col("doc"))
        )
        cands = (
            band_keys(signed, MINHASH_BANDS, rpb)
            .join(index, ["band", "key"])
            .filter(F.col("doc") != F.col("odoc"))
            .select(
                F.least("doc", "odoc").alias("doc_a"),
                F.greatest("doc", "odoc").alias("doc_b"),
            )
        )
        q = (
            cands.writeStream.format("memory")
            .queryName("profile_stream_minhash_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _await(q)
        return spark.table("profile_stream_minhash_sink")

    sink, res["stream_candidates"] = _t(
        "availableNow stream: sign+band+join -> sink", run_stream
    )
    res["n_sink_rows"] = sink.count()
    print(f"    sink rows: {res['n_sink_rows']}")

    pairs = sink.distinct()
    sa = sets_.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sha"))
    sb = sets_.select(F.col("doc").alias("doc_b"), F.col("sh").alias("shb"))
    inter = F.size(F.array_intersect("sha", "shb")).cast("long")
    jac = inter / (
        F.size("sha").cast("long") + F.size("shb").cast("long") - inter
    )
    _, res["verify"] = _t(
        "post-sink distinct + exact-Jaccard verify",
        lambda: pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= MINHASH_THRESHOLD)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    spark.catalog.dropTempView("profile_stream_minhash_sink")
    return res


def profile_cdc_chunk(spark, sf_dir: str) -> dict:
    # Mirrors cdc_chunk_dedup's stages with the suite knobs imported:
    # scan-stage chunking (tokens -> windows -> hash -> cuts -> chunk
    # hashes), the corpus-wide chunk-frequency window, the census
    # rollup. The budget counter is the chunk-hash frequency census
    # (sum C(f,2) is NOT this operator's cost — chunks join nothing —
    # so the counters here are row volumes, all linear).
    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.suite.text import _CDC_DIV, _CDC_W  # noqa: F401
    from seng550_a3_etl_spark.suite import QUERIES
    from seng550_a3_etl_spark.suite.text import cdc_chunk_dedup  # noqa: F401

    res: dict = {}
    t = load_tables(spark, sf_dir)
    # stage 1: scan-stage chunk construction (everything before the
    # frequency window) — approximated by counting chunk instances,
    # which forces the per-row HOF boundary pipeline and nothing else.
    # The boundary expression is THE operator's own (cdc_cut_positions
    # — r15 review: a hand-inlined copy here could silently drift from
    # the construction the query actually runs).
    from pyspark.sql import functions as FF
    from seng550_a3_etl_spark.functions.text import tokens
    from seng550_a3_etl_spark.operators.text_dedup import (
        cdc_cut_positions,
    )

    d = t.documents.select(
        "source",
        FF.filter(tokens(FF.col("text")), lambda x: x != "").alias("tk"),
    )
    cuts = cdc_cut_positions(FF.col("tk"), _CDC_W, _CDC_DIV)
    n_chunks, res["chunk_build"] = _t(
        "scan-stage chunking (tokens->cuts)",
        lambda: d.select(FF.size(cuts).alias("nc")).agg(
            FF.sum(FF.col("nc") + 1)
        ).collect()[0][0],
    )
    res["n_chunk_instances"] = int(n_chunks)
    # stage 2: full chunk hashing + the one frequency shuffle (the
    # query minus the |sources| rollup) — the shared operator, so the
    # profiled stage IS the plan under the query. Without this row the
    # sub-stage coverage can't reach the reconcile gate's 60%
    # (chunk_build alone skips the slice+hash and the shuffle).
    from seng550_a3_etl_spark.operators.text_dedup import (
        cdc_chunk_instances,
    )

    n_distinct, res["freq_census"] = _t(
        "chunk hash + frequency shuffle (groupBy h)",
        lambda: cdc_chunk_instances(
            t.documents, "doc_id", "text", _CDC_W, _CDC_DIV
        ).groupBy("h").count().count(),
    )
    res["n_distinct_chunks"] = int(n_distinct)
    _, res["full_query"] = _t(
        "full query (chunk + freq window + rollup)",
        lambda: QUERIES["cdc_chunk_dedup"](spark, sf_dir)
        .write.format("noop").mode("overwrite").save(),
    )
    return res


def profile_tree_split(spark, sf_dir: str) -> dict:
    # Mirrors tree_split_gain: the fact scan + histogram rollup is the
    # only stage that touches data volume; the gain windows run over
    # <= ~100 cells and are scale-invariant.
    from pyspark.sql import functions as FF

    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.suite import QUERIES
    from seng550_a3_etl_spark.suite.analytics import _SPLIT_BINS

    res: dict = {}
    t = load_tables(spark, sf_dir)
    cells = t.lineitem.select(
        FF.when(FF.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        FF.explode(FF.array(*[
            FF.struct(FF.lit(n).alias("feature"),
                      FF.expr(b).alias("bin"))
            for n, b in _SPLIT_BINS
        ])).alias("fb"),
    ).select("y", "fb.feature", "fb.bin")
    hist, res["histogram"] = _t(
        "fact scan -> (feature, bin) histogram",
        lambda: cells.groupBy("feature", "bin").count().count(),
    )
    res["n_cells"] = int(hist)
    _, res["full_query"] = _t(
        "full query (histogram + gain windows)",
        lambda: QUERIES["tree_split_gain"](spark, sf_dir)
        .write.format("noop").mode("overwrite").save(),
    )
    return res


def profile_burstiness(spark, sf_dir: str) -> dict:
    # Mirrors token_burstiness: token explode -> (doc, term) cells ->
    # per-term rollup; the top-200 TakeOrdered is output-bounded.
    from pyspark.sql import functions as FF

    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.suite import QUERIES
    from seng550_a3_etl_spark.suite.text_lm import _ctoks

    res: dict = {}
    t = load_tables(spark, sf_dir)
    ex = t.documents.select(
        "doc_id", FF.explode(_ctoks(FF.col("text"))).alias("term")
    )
    n_cells, res["tf_cells"] = _t(
        "token explode -> (doc, term) cells",
        lambda: ex.groupBy("doc_id", "term").count().count(),
    )
    res["n_tf_cells"] = int(n_cells)
    _, res["full_query"] = _t(
        "full query (cells -> term rollup -> top-200)",
        lambda: QUERIES["token_burstiness"](spark, sf_dir)
        .write.format("noop").mode("overwrite").save(),
    )
    return res


def profile_simhash_idf(spark, sf_dir: str) -> dict:
    # Mirrors simhash_idf_band_budget's stages with the operator's own
    # pieces: (1) the two-pass IDF-weighted fingerprint build (df fit +
    # weighted votes — the only stage that touches (doc, token) cells
    # twice), (2) the unit-weight fingerprint build, (3) the banding
    # bucket census over both variants. All linear claims — there is
    # no pair stage; the BUDGET the query emits is data, not work.
    from pyspark.sql import functions as FF

    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.functions.hashing import (
        simhash_fingerprints,
        simhash_fingerprints_idf,
    )
    from seng550_a3_etl_spark.functions.text import tokens
    from seng550_a3_etl_spark.operators.text_dedup import simhash_band_keys
    from seng550_a3_etl_spark.suite import QUERIES

    res: dict = {}
    t = load_tables(spark, sf_dir)
    docs = t.documents.select(
        FF.col("doc_id").alias("doc"), tokens(FF.col("text")).alias("tk")
    )
    fp_w, res["idf_fingerprints"] = _t(
        "IDF two-pass weighted fingerprints",
        lambda: simhash_fingerprints_idf(
            docs, "doc", FF.col("tk"), bits=60
        ).localCheckpoint(eager=True),
    )
    fp_u, res["unit_fingerprints"] = _t(
        "unit-weight fingerprints",
        lambda: simhash_fingerprints(
            docs, "doc", FF.col("tk"), bits=60
        ).localCheckpoint(eager=True),
    )
    n_buckets, res["band_census"] = _t(
        "banding bucket census (both variants)",
        lambda: sum(
            simhash_band_keys(fp, "doc", "fp", 3, 60)
            .groupBy("band", "key").count().count()
            for fp in (fp_w, fp_u)
        ),
    )
    res["n_buckets_both"] = int(n_buckets)
    _, res["full_query"] = _t(
        "full query (both budgets, noop)",
        lambda: QUERIES["simhash_idf_band_budget"](spark, sf_dir)
        .write.format("noop").mode("overwrite").save(),
    )
    return res


PROFILES = {
    "minhash_dup_pairs": profile_minhash,
    "simhash_idf_band_budget": profile_simhash_idf,
    "cdc_chunk_dedup": profile_cdc_chunk,
    "tree_split_gain": profile_tree_split,
    "token_burstiness": profile_burstiness,
    "stream_minhash_dedup": profile_stream_minhash,
    "dsir_importance_weights": profile_dsir,
    "embedding_cosine_dedup": profile_cosine,
    "ann_recall_ivf": profile_ann_ivf,
    "ann_recall_ivf_pq": profile_ann_ivf_pq,
    "semantic_dedup_clusters": profile_semantic_dedup,
    "kmeans_iterated_centroids": profile_kmeans_iter,
    "matryoshka_recall_curve": profile_matryoshka,
    "fuzzy_dup_pairs": profile_fuzzy,
    "dup_span_stats": profile_dup_span,
    "copurchase_triangles": profile_triangles,
    "normalized_exact_dedup": profile_normalized_dedup,
    "pagerank_step_parts": profile_pagerank_step,
    "revenue_proration": profile_proration,
    "bpe_encode_docs": profile_bpe_encode,
    "hard_negative_mining": profile_hard_negative,
    "copurchase_jaccard_recs": profile_copurchase_recs,
    "ngram_dup_pairs": profile_ngram,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or list(PROFILES)
    spark = get_spark()

    import bench

    scaled = tempfile.mkdtemp(prefix=".prof_10x_", dir=".")
    try:
        # Same JIT warm-up the bench does before timing: without it the
        # first 1x stage absorbs the one-off codegen compile of the
        # wide tokenize->shingle pipeline (~2s) while the 10x rerun is
        # warm, biasing the very ratios this script exists to measure.
        t0 = time.perf_counter()
        bench._warm_text_pipeline(spark, sf_dir)
        print(f"JIT warm-up: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        bench._scale_10x(spark, sf_dir, scaled)
        print(f"10x replica build: {time.perf_counter() - t0:.1f}s")
        for name in names:
            fn = PROFILES[name]
            print(f"\n=== {name} @ 1x ({sf_dir})")
            one = fn(spark, sf_dir)
            print(f"=== {name} @ 10x")
            ten = fn(spark, scaled)
            print("--- stage ratios (10x/1x):")
            for k in one:
                if isinstance(one[k], float) and one[k] > 0:
                    print(f"    {k:42s} {ten[k] / one[k]:6.1f}x")
                else:
                    print(f"    {k:42s} {one[k]} -> {ten[k]}")
    finally:
        shutil.rmtree(scaled, ignore_errors=True)


if __name__ == "__main__":
    main()
