"""Similarity search over an embedding column (north-star extension).

Two strategies:

- **cosine_topk** — exact brute force: broadcast the (small) query set
  against the corpus scan, window top-k per query. At scale the corpus
  side never shuffles *rows*; the only shuffle carries (query, candidate,
  score) tuples, pre-pruned per partition. This is the correctness
  baseline.
- **ivf_topk** — IVF-style approximate search: a small centroid set
  partitions the corpus into buckets (nearest-centroid assignment =
  broadcast join + window argmin); a query probes only its ``nprobe``
  nearest buckets. Corpus scored per query drops from |corpus| to
  ~nprobe/|C| of it. The bucketed corpus is the thing you'd persist
  (partitionBy(bucket)) for repeated query workloads — the vector-DB
  pattern expressed as plain DataFrames.

Ranking uses (round(cosine, 6) DESC, id ASC) so ordering is
deterministic and oracle-stable across engines.

A third strategy, **cosine_dedup_pairs**, is the embedding tier of the
document-dedup ladder (exact / MinHash / SimHash / n-gram — see
operators/text_dedup.py): random-hyperplane sign-LSH (Charikar 2002)
generates candidate pairs via a band equi-join, then exact cosine
verifies. Hyperplane weights are md5-derived so a SQL oracle can replay
the identical construction bit-for-bit.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from seng550_a3_etl_spark.functions.vectors import dot
from seng550_a3_etl_spark.plans.layout import spread_for_cpu


def _with_norm(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    """Attach the vector's L2 norm — computed once per row so every
    pairwise cosine downstream costs ONE interpreted array fold instead
    of three (dot(a,b)/(na*nb) evaluates the identical IEEE sequence as
    the inline dot/(sqrt(dot aa)*sqrt(dot bb)), so oracles still match
    bit-for-bit)."""
    return df.withColumn(out, F.sqrt(dot(F.col(vec_col), F.col(vec_col))))


def _pair_cosine(qv: str, cv: str, qn: str, cn: str) -> Column:
    return F.round(dot(F.col(qv), F.col(cv)) / (F.col(qn) * F.col(cn)), 6)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "qid",
    query_vec: str = "qv",
    corpus_id: str = "cid",
    corpus_vec: str = "cv",
    pair_filter: Column | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-pairs excluded when
    ids collide). Output: query_id, corpus_id, cosine (rounded 6), rank.

    ``pair_filter`` optionally restricts candidate pairs (a predicate
    over any carried query/corpus columns, e.g. label mismatch for
    hard-negative mining) — applied BEFORE scoring, inside the scan
    stage, so filtered pairs never pay the dot product.

    Physical shape (r11): the corpus side is ``spread_for_cpu`` —
    the dot product is an interpreted HOF fold (Catalyst does not
    codegen higher-order functions), so the scan's partition count IS
    the parallelism, and a small embeddings parquet scans as ONE split
    (measured: sf0.1 = 1 partition / 32 cores; the 10x sf1 spot graded
    "superlinear" purely from this). Ranking is TWO-STAGE top-k: a
    partial row_number per (query, input-partition) prunes to k rows
    per partition BEFORE the global per-query window — with few
    queries and a big corpus, a single-stage window sorts |q|·|corpus|
    rows in |q| tasks (a parallelism collapse at 10^9 corpus rows);
    the partial stage keeps the sort data-parallel and the global
    window sees only |q|·partitions·k rows. Identical output: the
    ordering (cosine DESC, id ASC) is a deterministic total order and
    every global top-k row survives its partition-local top-k."""
    queries = _with_norm(queries, query_vec, "__qn")
    corpus = spread_for_cpu(_with_norm(corpus, corpus_vec, "__cn"))
    pairs = corpus.join(F.broadcast(queries)).filter(
        F.col(query_id) != F.col(corpus_id)
    )
    if pair_filter is not None:
        pairs = pairs.filter(pair_filter)
    pairs = pairs.withColumn(
        "cosine", _pair_cosine(query_vec, corpus_vec, "__qn", "__cn")
    )
    return _topk_two_stage(pairs, query_id, corpus_id, k).select(
        query_id, corpus_id, "cosine", "rank"
    )


def _topk_two_stage(
    pairs: DataFrame, query_id: str, corpus_id: str, k: int
) -> DataFrame:
    """Global top-k per query without a |queries|-way sort bottleneck:
    partial top-k per (query, physical input partition) first, global
    row_number over the pruned survivors second. Correct for any
    partitioning: a row in the global top-k of its query ranks <= k
    within any subset containing it, so the partial stage never drops
    a winner; the final (cosine DESC, id ASC) order is total, so ranks
    are deterministic."""
    order = [F.desc("cosine"), F.asc(corpus_id)]
    w_part = Window.partitionBy(query_id, "__pid").orderBy(*order)
    w_glob = Window.partitionBy(query_id).orderBy(*order)
    return (
        pairs.withColumn("__pid", F.spark_partition_id())
        .withColumn("__pr", F.row_number().over(w_part))
        .filter(F.col("__pr") <= k)
        .withColumn("rank", F.row_number().over(w_glob))
        .filter(F.col("rank") <= k)
    )


def assign_buckets(
    corpus: DataFrame,
    centroids: DataFrame,
    corpus_id: str = "cid",
    corpus_vec: str = "cv",
    centroid_id: str = "bid",
    centroid_vec: str = "bv",
    keep_sim: str | None = None,
) -> DataFrame:
    """Nearest-centroid (max-cosine) bucket per corpus vector — the IVF
    coarse quantizer. Output keeps the corpus norm (``__cn``) so
    downstream scoring reuses it; pass ``keep_sim`` to also carry the
    winning cosine (rounded 6) under that name (prototypicality
    scoring, cell-residual stats).

    Physical shape: the centroid table packs into ONE broadcast row
    (array of (id, vec, norm) structs, sorted by id) and the argmax is
    a per-row ``array_max`` over the scored structs — struct ordering
    compares (sim, -id), so ties go to the SMALLEST centroid id,
    byte-identical to the previous window's (sim DESC, id ASC). The
    corpus never shuffles and no joined row set ever exists.

    This replaced a broadcast-join + row_number window: that plan
    materialized n·k scored rows and shuffled them on the vector id for
    the window — at n=10⁹, k=√n that is ~3·10¹³ rows through an
    exchange, the dominant cost of every IVF/k-means pass. The fold
    does the identical k dot products per row entirely inside the scan
    stage (zero exchanges; same IEEE sequence, so oracles still match
    bit-for-bit).

    Contract (ADVICE r9): the centroid id column must be an INTEGRAL
    type — the tie-break negates the id inside the struct-max fold, so
    string ids (which the old window form happened to support) are
    rejected up front, and ``Long.MIN_VALUE`` is excluded because its
    negation overflows. Every in-repo quantizer generates dense ids
    0..k-1, which always satisfy this."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    id_type = centroids.schema[centroid_id].dataType
    if not isinstance(id_type, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"assign_buckets requires an integral centroid id column; "
            f"{centroid_id!r} is {id_type.simpleString()} (the argmax "
            f"tie-break negates the id inside the fold)"
        )
    # The k-dot-products-per-row fold is interpreted (HOF): partition
    # count = parallelism, and a small parquet scans as one split — see
    # cosine_topk. No-op at scale (guard skips when splits >= cores).
    corpus = spread_for_cpu(_with_norm(corpus, corpus_vec, "__cn"))
    centroids = _with_norm(centroids, centroid_vec, "__bn")
    packed = centroids.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(centroid_id).alias("b"),
                    F.col(centroid_vec).alias("bv"),
                    F.col("__bn").alias("bn"),
                )
            )
        ).alias("__cents")
    )
    best = F.array_max(
        F.transform(
            "__cents",
            lambda c: F.struct(
                F.round(
                    dot(F.col(corpus_vec), c["bv"])
                    / (F.col("__cn") * c["bn"]),
                    6,
                ).alias("s"),
                (-c["b"]).alias("nb"),
                c["b"].alias("b"),
            ),
        )
    )
    cols = [corpus_id, corpus_vec, "__cn", F.col("__best.b").alias(centroid_id)]
    if keep_sim is not None:
        cols.append(F.col("__best.s").alias(keep_sim))
    return (
        corpus.join(F.broadcast(packed))
        .withColumn("__best", best)
        .filter(F.col("__best").isNotNull())
        .select(*cols)
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "id",
    vec_col: str = "v",
    centroid_id: str = "bid",
    centroid_vec: str = "bv",
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023): block
    the corpus by nearest-centroid cluster (the k-means/IVF coarse
    quantizer), then compare pairs ONLY within a cluster and keep those
    with cosine >= ``threshold``. Output: (id_a, id_b, bid, cosine) with
    id_a < id_b — the caller's keep-first policy drops id_b.

    vs sign-LSH (``cosine_dedup_pairs``): the blocking key is a learned
    semantic cluster instead of random hyperplane bands — the published
    recipe for pruning semantically redundant (not just near-identical)
    training examples, and the blocks double as the IVF index cells the
    store already maintains.

    Scale: centroids broadcast; the corpus shuffles ONCE on the cluster
    id for the self-join; pair volume is Σ C(|cell|, 2), governed by the
    cluster count — k ~ sqrt(n) keeps expected cell size ~sqrt(n) and
    total pair work ~n^1.5 (SemDeDup's published operating point; k is
    the caller's knob via the centroid set)."""
    # The assignment subtree feeds BOTH sides of the self-join; without a
    # pin Spark replays the scan+assign per side (measured 6 scans at
    # plan audit). localCheckpoint computes it once — the standing
    # union-replay recipe (minhash sets_, pagerank edges).
    assigned = assign_buckets(
        corpus, centroids, id_col, vec_col, centroid_id, centroid_vec
    ).localCheckpoint(eager=True)
    a = assigned.select(
        F.col(centroid_id),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__cn").alias("__na"),
    )
    b = assigned.select(
        F.col(centroid_id),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__cn").alias("__nb"),
    )
    return (
        a.join(b, [centroid_id])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _pair_cosine("__va", "__vb", "__na", "__nb"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", centroid_id, "cosine")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int,
    nprobe: int,
    query_id: str = "qid",
    query_vec: str = "qv",
    corpus_id: str = "cid",
    corpus_vec: str = "cv",
    centroid_id: str = "bid",
    centroid_vec: str = "bv",
) -> DataFrame:
    """Approximate top-k: probe the ``nprobe`` nearest centroid buckets.
    Same output schema as :func:`cosine_topk` (rank within probed set)."""
    bucketed = assign_buckets(
        corpus, centroids, corpus_id, corpus_vec, centroid_id, centroid_vec
    )
    probes = (
        _with_norm(queries, query_vec, "__qn")
        .join(F.broadcast(_with_norm(centroids, centroid_vec, "__bn")))
        .withColumn(
            "__sim", _pair_cosine(query_vec, centroid_vec, "__qn", "__bn")
        )
        .withColumn(
            "__pr",
            F.row_number().over(
                Window.partitionBy(query_id).orderBy(
                    F.desc("__sim"), F.asc(centroid_id)
                )
            ),
        )
        .filter(F.col("__pr") <= nprobe)
        .select(query_id, query_vec, "__qn", centroid_id)
    )
    pairs = (
        bucketed.join(F.broadcast(probes), centroid_id)
        .filter(F.col(query_id) != F.col(corpus_id))
        .withColumn(
            "cosine", _pair_cosine(query_vec, corpus_vec, "__qn", "__cn")
        )
    )
    # probes (|q|·nprobe rows) broadcast against the bucketed corpus so
    # candidate scoring stays in the corpus scan stage at its full
    # parallelism; two-stage rank for the same reason as cosine_topk
    # (|q|·avg_bucket·nprobe rows would otherwise sort in |q| tasks).
    return _topk_two_stage(pairs, query_id, corpus_id, k).select(
        query_id, corpus_id, "cosine", "rank"
    )


def hyperplane_weights(planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1)^dim.

    Weight (p, i) = (md5-60bit("p:i") % 2000001) / 1e6 - 1.0 — the same
    integer-then-one-division recipe a DuckDB oracle reproduces exactly
    (see functions/hashing.py for the md5-as-portable-hash rationale)."""
    return [
        [
            (int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:15], 16) % 2000001)
            / 1000000.0
            - 1.0
            for i in range(dim)
        ]
        for p in range(planes)
    ]


def _sign_bits_expr(vec_col: str, weights: list[list[float]]) -> str:
    """SQL expression: array<bigint> of sign bits, one per hyperplane.

    A single ``F.expr`` string instead of per-plane Column trees — the
    planes×dim literal weights would otherwise cost thousands of py4j
    round-trips at plan-build time (measured ~2 s of driver overhead for
    24×64). Sum order is the sequential ``aggregate`` fold the DuckDB
    oracle's ``list_sum`` mirrors."""
    w2d = ", ".join(
        "array(" + ", ".join(f"{w!r}D" for w in plane) + ")"
        for plane in weights
    )
    return (
        f"transform(array({w2d}), w -> if(aggregate("
        f"zip_with({vec_col}, w, (x, y) -> double(x) * y), "
        f"0.0D, (acc, x) -> acc + x) >= 0, 1L, 0L))"
    )


def _band_keys_expr(bits_col: str, bands: int, rows: int) -> str:
    """SQL expression: array<bigint> of ``bands`` keys, each packing
    ``rows`` consecutive sign bits little-endian."""
    return (
        f"transform(sequence(0, {bands - 1}), b -> "
        f"aggregate(sequence(0, {rows - 1}), 0L, "
        f"(acc, j) -> acc + element_at({bits_col}, b * {rows} + j + 1) "
        f"* shiftleft(1L, j)))"
    )


def cosine_dedup_pairs(
    corpus: DataFrame,
    threshold: float,
    planes: int = 24,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "id",
    vec_col: str = "v",
) -> DataFrame:
    """Embedding near-dup pairs: sign-LSH candidates + exact-cosine verify.

    Per vector, ``planes`` sign bits (dot with a deterministic random
    hyperplane >= 0) are packed into ``bands`` integer band keys; any
    pair agreeing on a full band becomes a candidate (band equi-join on a
    (band, key) shuffle — never an all-pairs product), then exact cosine
    (rounded to 6) filters at ``threshold``. Probability a true pair at
    angle theta shares a band is (1 - theta/pi)^(planes/bands), amplified
    over bands — at near-dup thresholds recall is ~1 while candidate
    volume stays ~linear in corpus size. Output: id_a, id_b, cosine.

    At 100 TB: the signature pass is a shuffle-free projection run ONCE
    (candidates come from grouping the band keys — bucket_pairs — not a
    self-join: Spark replans each side of a self-join separately, so the
    join form pushed every vector through the 24 interpreted hyperplane
    folds twice); verification fetches vectors with ONE melt-join pass
    over the corpus instead of two id-keyed joins. The only shuffles are
    the (band, key) grouping and the candidate-pair fold."""
    from seng550_a3_etl_spark.operators.text_dedup import bucket_pairs

    rows = planes // bands
    if rows * bands != planes:
        raise ValueError("planes must be divisible by bands")
    weights = hyperplane_weights(planes, dim)
    banded = corpus.select(
        F.col(id_col),
        F.expr(_sign_bits_expr(vec_col, weights)).alias("__bits"),
    ).select(
        F.col(id_col),
        F.posexplode(F.expr(_band_keys_expr("__bits", bands, rows))).alias(
            "band", "bkey"
        ),
    )
    cand = (
        bucket_pairs(banded, ["band", "bkey"], F.col(id_col))
        .toDF("id_a", "id_b")
        .distinct()
    )
    # Precompute each vector's norm once (|corpus| sqrts) so verification
    # costs one dot per candidate pair instead of three — higher-order
    # array folds are interpreted, not codegen'd, so they dominate the
    # verify stage. dot/(norm_a*norm_b) is the oracle's exact expression
    # shape, so the doubles (and the round-6 output) are bit-identical.
    vn = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        F.sqrt(
            F.aggregate(
                F.transform(
                    F.col(vec_col),
                    lambda x: x.cast("double") * x.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("__n"),
    )
    # Fetch both sides' vectors with ONE pass over vn: melt each pair
    # to (pair, side, id), join once, fold the sides back per pair —
    # the same shape minhash_lsh_pairs uses for its shingle-set verify.
    melted = cand.select(
        F.struct("id_a", "id_b").alias("__pair"),
        F.posexplode(F.array("id_a", "id_b")).alias("__side", id_col),
    )

    def side(i: int, c: str) -> Column:
        return F.first(
            F.when(F.col("__side") == i, F.col(c)), ignorenulls=True
        )

    return (
        melted.join(vn, id_col)
        .groupBy("__pair")
        .agg(
            side(0, "__v").alias("__va"),
            side(0, "__n").alias("__na"),
            side(1, "__v").alias("__vb"),
            side(1, "__n").alias("__nb"),
        )
        .select(
            F.col("__pair.id_a").alias("id_a"),
            F.col("__pair.id_b").alias("id_b"),
            F.round(
                dot(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def quantize_int8(vec: Column) -> Column:
    """Symmetric int8 quantization of a float vector: scale by
    127/max|x| and round — the standard embedding-compression step
    before writing a training/ANN corpus (4× smaller than float32,
    recall loss usually <1%). Returns a (scale, q) struct; dequantize
    as q[i]/scale. All-zero vectors get a null scale and a q whose
    ELEMENTS are all null (the array itself is NOT null — filter such
    vectors with max|x| > 0, not isNotNull on q).

    Per-row array math, codegen-eligible, zero shuffle. Elements are
    widened float→double before scaling so the arithmetic is exact and
    engine-portable (the oracle replays it bit-for-bit).
    """
    dv = F.transform(vec, lambda x: x.cast("double"))
    mx = F.array_max(F.transform(dv, F.abs))
    scale = F.when(mx > 0, F.lit(127.0) / mx)
    q = F.transform(dv, lambda x: F.round(x * scale).cast("int"))
    return F.struct(scale.alias("scale"), q.alias("q"))


def pq_encode(
    corpus: DataFrame,
    codebook_seeds: DataFrame,
    dim: int,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    micro: int = 1_000_000,
) -> DataFrame:
    """Product-quantization encode: split every vector into ``m``
    contiguous subvectors and replace each with the id of its nearest
    codebook centroid (L2, tie-break by centroid id) — the compressed
    representation behind IVF-PQ indexes, where a 64-dim float vector
    becomes m small codes plus a shared codebook. ``codebook_seeds``
    supplies the centroids as full vectors (same ``id_col``/``vec_col``
    schema); real systems fit them with k-means (see
    ``operators.clustering.kmeans_step`` — the assignment mechanics
    here are identical and k-means-trained codebooks drop straight in).

    Returns (id, sub_id, code_id, dist_micro2): per subspace, the
    winning centroid id and the exact squared L2 distance in integer
    micro-units. Elements are quantized to micros FIRST, so the
    distance is a sum of exact longs — order-independent and
    engine-portable (the X66 determinism pattern); callers aggregate
    codes/total distortion per vector.

    Scale: the codebook is m·k rows and BROADCASTS; subvector explode
    and the distance fold are scan-stage array math; the argmin is a
    struct-min aggregate on (id, sub_id) — map-side combined, never a
    per-candidate window sort. Corpus rows shuffle once, on the
    (id, sub_id) key, carrying one struct per candidate group."""
    dists = pq_distances(
        corpus, codebook_seeds, dim, m, id_col, vec_col, micro
    )
    return (
        dists.select(
            id_col,
            "sub_id",
            F.struct(
                F.col("dist_micro2").alias("d"), F.col("code_id").alias("bid")
            ).alias("__c"),
        )
        .groupBy(id_col, "sub_id")
        .agg(F.min("__c").alias("__best"))
        .select(
            id_col,
            "sub_id",
            F.col("__best.bid").alias("code_id"),
            F.col("__best.d").alias("dist_micro2"),
        )
    )


def pq_distances(
    corpus: DataFrame,
    codebook_seeds: DataFrame,
    dim: int,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    micro: int = 1_000_000,
) -> DataFrame:
    """The full per-subspace distance table behind :func:`pq_encode`:
    (id, sub_id, code_id, dist_micro2) for EVERY codebook centroid,
    not just the winner. This is also the ADC lookup table — computed
    over the query set, it gives the per-(query, subspace, code)
    distances that compressed-domain search sums over stored codes.

    Scale: the codebook broadcasts; the subvector explode and distance
    fold are scan-stage array math in codegen; output is m·k rows per
    input vector (tiny for a query set; for corpus encoding the argmin
    in :func:`pq_encode` folds it straight back down map-side)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    w = dim // m

    def micros(col: Column) -> Column:
        return F.transform(
            col, lambda x: F.round(x.cast("double") * micro).cast("long")
        )

    def subspaces(df: DataFrame, out: str) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.posexplode(
                F.array(
                    *[
                        micros(F.slice(F.col(vec_col), s * w + 1, w))
                        for s in range(m)
                    ]
                )
            ).alias("sub_id", out),
        )

    cb = subspaces(codebook_seeds, "__bm").select(
        "sub_id", F.col(id_col).alias("__bid"), "__bm"
    )
    # interpreted zip_with/aggregate fold per (row, centroid): spread
    # an under-parallel corpus scan (no-op when splits >= cores).
    sub = subspaces(spread_for_cpu(corpus), "__vm")
    dist = F.aggregate(
        F.zip_with("__vm", "__bm", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return sub.join(F.broadcast(cb), "sub_id").select(
        id_col,
        "sub_id",
        F.col("__bid").alias("code_id"),
        dist.alias("dist_micro2"),
    )
