"""Document deduplication operators (north-star extension).

Four strategies, ordered by cost/recall trade-off — the standard ladder
for a pretraining-corpus pipeline:

1. **exact_dedup** — hash-groupBy on content hash. One shuffle of
   (hash, id); at 100 TB this is the cheapest possible full-corpus op.
2. **ngram_jaccard_pairs** — exact shingle-set Jaccard via posting-list
   grouping (one groupBy per shingle, C(n,2) pairs per posting list).
   Quadratic in documents *per shared shingle*; correct baseline, does
   not survive web scale unfiltered (the ``max_shingle_freq`` knob drops
   stop-shingle buckets to bound the per-bucket pair explode).
3. **minhash_lsh_pairs** — MinHash signatures (explode + codegen'd
   affine-reseed min aggregates, map-side combined) → banded LSH
   bucketing (one groupBy shuffle on (band, bucket-key), pairs emitted
   per bucket) → exact Jaccard verify on the candidates. The scale
   path: candidate count is governed by the band/row configuration,
   not |docs|².
4. **simhash_pairs** — 60-bit SimHash fingerprints (explode + 60
   literal-shift sum aggregates, map-side combined); pairs within
   Hamming distance d found by Manku-2007 block-combination banding
   (d+2 blocks, all C(d+2,2) two-block tables — ≤d differing bits
   leave ≥2 clean blocks, so any qualifying pair shares at least one
   exact table key; `simhash_block_combos`), then exact popcount
   verify. One narrow shuffle on (table, 24-bit key).

All hashing is the md5-derived 60-bit hash from functions/hashing.py so
a DuckDB oracle reproduces results bit-for-bit; production can inject
xxhash64 instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from seng550_a3_etl_spark.functions.hashing import (
    hash64,
    minhash_signatures,
    simhash_fingerprints,
)
from seng550_a3_etl_spark.functions.text import shingles, tokens


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Map every document to its canonical (minimum) id among exact
    content duplicates. Output: id, canonical_id, group_size."""
    h = F.md5(F.col(text_col)).alias("__h")
    groups = (
        df.select(F.col(id_col), h)
        .groupBy("__h")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )
    return (
        df.select(F.col(id_col), h)
        .join(groups, "__h")
        .select(id_col, "canonical_id", "group_size")
    )


def canonical_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    normalize: Callable[[Column], Column],
) -> DataFrame:
    """Exact dedup under a canonicalization: documents whose
    ``normalize(text)`` agree form one group (rung 1.5 of the ladder —
    catches trivially-reformatted copies byte-exact dedup misses with
    no similarity threshold to tune). Output adds ``n_raw_variants``:
    the number of distinct RAW contents inside the normalized group
    (>1 ⇒ the normalization, not byte equality, did the merging).

    Scale: identical to :func:`exact_dedup` — normalization runs as
    codegen'd string ops in the scan, then ONE (hash, id) shuffle;
    the variant count aggregates 128-bit digests, never texts."""
    hashed = df.select(
        F.col(id_col),
        F.md5(normalize(F.col(text_col))).alias("__h"),
        F.md5(F.col(text_col)).alias("__raw"),
    )
    groups = hashed.groupBy("__h").agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
        F.countDistinct("__raw").alias("n_raw_variants"),
    )
    return hashed.join(groups, "__h").select(
        id_col, "canonical_id", "group_size", "n_raw_variants"
    )


def dup_span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    instances: DataFrame | None = None,
) -> DataFrame:
    """Exact duplicated-span detection: per document, how many of its
    overlapping k-token window positions hold a span that also occurs
    in at least one OTHER document. The substring-granularity dedup
    signal — a doc assembled from boilerplate spans scores high even
    when no single pairwise Jaccard (doc-level near-dup) fires.
    Output: id, n_windows, n_dup_windows, dup_frac (NULL when the doc
    has fewer than k tokens).

    Scale: windows are k-shingles built per-row (zero shuffle) and
    hashed to 60-bit longs BEFORE they shuffle — the tokenize→hash
    pipeline runs in ONE corpus pass (the original agg + join-back
    form evaluated it twice and scanned the corpus three times). The
    (hash, doc) rollup carries per-doc position counts; the
    distinct-doc count per hash is a count-over-window on that rollup
    (the doc_novelty_frac trick — rollup rows ARE the distinct
    (hash, doc) pairs), and the surviving rows fold per doc. The
    closing left join restores docs with no duplicated span (and the
    sub-k-token docs the window builder skips)."""
    from pyspark.sql.window import Window

    from seng550_a3_etl_spark.plans.layout import spread_for_cpu

    # tokenize + k-shingle + hash64 are interpreted HOF folds running
    # in the scan stage; a small documents parquet scans as 1-2 splits
    # (r11 stage profile: window_hash_explode 8.7x for 10x rows on 2 of
    # 32 cores). No-op at scale — the guard skips when splits >= cores.
    docs = spread_for_cpu(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__tk")
    )
    if instances is not None:
        # Prebuilt (h, <id>, cnt) window-instance rollup (the suite's
        # session cache — r15): the tokenize->shingle->hash explode and
        # its first shuffle are shared with the anchor census and the
        # streaming substring guard instead of re-run here.
        per = instances.select(
            F.col("h").alias("__h"),
            F.col("doc").alias(id_col),
            F.col("cnt").alias("__c"),
        )
    else:
        wins = docs.filter(F.size("__tk") >= k).select(
            id_col,
            F.explode(
                F.transform(shingles(F.col("__tk"), k), lambda c: hash64(c))
            ).alias(
                "__h"
            ),
        )
        per = wins.groupBy("__h", id_col).agg(
            F.count(F.lit(1)).alias("__c")
        )
    nd = F.count(F.lit(1)).over(Window.partitionBy("__h"))
    dupc = (
        per.withColumn("__nd", nd)
        .filter(F.col("__nd") >= 2)
        .groupBy(id_col)
        .agg(F.sum("__c").alias("__dup"))
    )
    n_windows = F.greatest(F.size("__tk") - (k - 1), F.lit(0)).cast("long")
    return (
        docs.join(dupc, id_col, "left")
        .select(
            id_col,
            n_windows.alias("n_windows"),
            F.coalesce("__dup", F.lit(0)).cast("long").alias("n_dup_windows"),
        )
        .withColumn(
            "dup_frac",
            F.round(
                F.col("n_dup_windows") / F.nullif(F.col("n_windows"), F.lit(0)),
                6,
            ),
        )
    )


def bucket_pairs(banded: DataFrame, key_cols: list[str], member: Column) -> DataFrame:
    """All ordered member pairs sharing an LSH bucket, as one groupBy.

    A self-join on the bucket key would evaluate the (expensive)
    signature pipeline once per side — Spark plans each reference as its
    own scan. Collecting each bucket's sorted members and emitting the
    C(n,2) pairs with array HOFs needs a single pass and a single
    shuffle. LSH banding keeps buckets small by construction, so the
    per-bucket quadratic explode is bounded; feed a narrower band key
    (more rows per band) rather than this helper if a hot bucket ever
    dominates. Output columns: a, b (a < b by the member sort order)."""
    grouped = banded.groupBy(*key_cols).agg(
        F.sort_array(F.collect_list(member)).alias("__ms")
    )
    return grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    "__ms",
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("__ms"), i + F.lit(2), F.size(F.col("__ms"))
                        ),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("__p")
    ).select("__p.a", "__p.b")


def _shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(shingles(tokens(F.col(text_col)), n)).alias("sh"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
    shingle_sets: DataFrame | None = None,
) -> DataFrame:
    """All document pairs with n-gram-shingle Jaccard ≥ threshold.

    Output: doc_a < doc_b, inter, size_a, size_b, jaccard.
    Intersections come from the shared single-scan posting machinery
    (:func:`pair_intersections`).

    ``shingle_sets`` optionally supplies a prebuilt (doc, sh) frame of
    distinct HASHED shingles (the suite's session-cached build — the
    gold-table shape at 100 TB); when given, ``df``/``text_col``/``n``
    are not consulted for the set construction."""
    inter = pair_intersections(
        _hashed_sets(df, id_col, text_col, n, shingle_sets),
        max_shingle_freq,
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
    shingle_sets: DataFrame | None = None,
) -> DataFrame:
    """All document pairs where either side's shingle set is contained
    in the other at ≥ threshold: containment C(A→B) = |A∩B| / |A|
    (Broder's *containment*, vs resemblance/Jaccard).

    The asymmetric dedup signal Jaccard structurally misses: a short
    document quoted wholesale inside a much longer one has
    containment ≈ 1 but Jaccard ≈ |A|/|B| — far below any resemblance
    threshold. Pretraining pipelines need this to catch
    quote-farms/wrapper pages that fully embed another page's content.

    Output: doc_a < doc_b, inter, size_a, size_b, cont_a (=inter/
    size_a), cont_b; a row survives when max(cont_a, cont_b) ≥
    threshold (so it is a superset of the same-threshold Jaccard
    pairs). Same single-scan posting machinery and stop-shingle bound
    as :func:`ngram_jaccard_pairs`."""
    inter = pair_intersections(
        _hashed_sets(df, id_col, text_col, n, shingle_sets),
        max_shingle_freq,
    )
    cont_a = F.col("inter") / F.col("size_a")
    cont_b = F.col("inter") / F.col("size_b")
    return (
        inter.withColumn("cont_a", cont_a)
        .withColumn("cont_b", cont_b)
        .filter(F.greatest("cont_a", "cont_b") >= threshold)
        .select(
            "doc_a", "doc_b", "inter", "size_a", "size_b",
            "cont_a", "cont_b",
        )
    )


def _hashed_sets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    shingle_sets: DataFrame | None,
) -> DataFrame:
    """(doc, sh) distinct hashed-shingle sets — the prebuilt cache when
    supplied, else built inline. Shingle identity is hashed_shingles'
    64-bit key — no shingle string is ever built and the shuffle key is
    8 bytes instead of the ~n-word string (collisions negligible at any
    corpus size the exact baselines can reach; minhash_lsh_pairs keeps
    string shingles because its oracle replays the md5 signature
    math)."""
    from seng550_a3_etl_spark.functions.text import hashed_shingles

    if shingle_sets is not None:
        return shingle_sets
    return df.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(
            hashed_shingles(tokens(F.col(text_col)), n)
        ).alias("sh"),
    )


def pair_intersections(
    sets_: DataFrame, max_shingle_freq: int | None
) -> DataFrame:
    """(doc_a < doc_b, size_a, size_b, inter) distinct-shingle
    intersection counts for every co-occurring document pair.

    Postings carry the doc's set size so the pair aggregation needs no
    back-joins against a sizes table. Pairs come from grouping the
    postings by shingle and emitting each posting list's C(n,2) pairs
    with array HOFs — NOT from a posting self-join: Spark replans each
    reference of a renamed self-join side separately (no
    ReusedExchange), so the join shape ran the tokenize→shingle
    pipeline twice; this shape scans the corpus ONCE and shuffles
    postings once (measured ~2× on the whole query at sf0.1)."""
    postings = sets_.select(
        "doc",
        F.size("sh").cast("long").alias("n_sh"),
        F.explode("sh").alias("hs"),
    )
    if max_shingle_freq is not None:
        # Stop-shingle bound: a shingle shared by more than this many
        # docs contributes O(freq²) pairs. The bound is applied BEFORE
        # collect_list so a web-scale stop-shingle never materializes
        # its full posting list in one aggregation buffer. Implemented
        # as a count over Window.partitionBy(hs) + filter, NOT as a
        # count-aggregate + semi-join: the aggregate branch is a
        # separately pruned subplan of the postings lineage (no
        # ReusedExchange), so the join form re-ran the tokenize→
        # shingle→explode pipeline — one extra corpus scan and one
        # extra Exchange. The window form scans the corpus ONCE and
        # shuffles postings ONCE on hs; the groupBy below consumes the
        # window's hash partitioning with no further Exchange. Hot
        # shingle groups stream through WindowExec's spillable row
        # buffer (disk-backed), never an in-memory aggregation buffer.
        # Pairs whose intersection includes dropped shingles undercount
        # `inter`, so this is the documented approximation for
        # web-scale corpora, exact whenever no shingle exceeds the
        # bound.
        from pyspark.sql.window import Window

        postings = (
            postings.withColumn(
                "__f", F.count(F.lit(1)).over(Window.partitionBy("hs"))
            )
            .filter(F.col("__f") <= max_shingle_freq)
            .drop("__f")
        )
    buckets = postings.groupBy("hs").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("doc"), F.col("n_sh")))
        ).alias("__ms")
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "__ms",
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("__ms"), i + F.lit(2), F.size(F.col("__ms"))
                        ),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("__p")
    ).select(
        F.col("__p.a.doc").alias("doc_a"),
        F.col("__p.a.n_sh").alias("size_a"),
        F.col("__p.b.doc").alias("doc_b"),
        F.col("__p.b.n_sh").alias("size_b"),
    )
    return (
        pairs.filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )


def band_keys(
    signed: DataFrame, bands: int, rows_per_band: int
) -> DataFrame:
    """(doc, band, key) LSH bucket rows from (doc, sig) signatures: one
    bucket key per band = the comma-joined signature slice. Pure
    projection+explode (``bands`` rows per doc, no shuffle); this table
    IS the LSH index — persist it and incremental batches join against
    it without touching the corpus again (see
    :func:`lsh_incremental_survivors`)."""
    return signed.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc", "bk.band", "bk.key")


def lsh_incremental_survivors(
    base_buckets: DataFrame, new_buckets: DataFrame
) -> DataFrame:
    """New-batch docs that survive dedup against a persisted LSH index.

    The continuous-ingestion pattern: the corpus's ``(doc, band, key)``
    bucket table (from :func:`band_keys`) is a materialized index; each
    arriving batch computes ONLY its own buckets and joins the index —
    the corpus is never re-paired, so per-batch cost is O(batch x
    bands), not O(corpus²).

    Drop rule (deterministic, order-free): a new doc is dropped iff it
    shares any (band, key) bucket with (a) the base index or (b) a
    smaller-id member of its own batch. Rule (b) deliberately does NOT
    re-evaluate chains (B dropped for colliding with A does not revive
    C that collided only with B) — survivorship depends only on the
    input, not on a processing order, which keeps reruns and partial
    retries idempotent; the cost is an occasional over-drop, the same
    trade minhash banding itself makes.

    Returns the distinct surviving new-doc ids (column ``doc``).
    """
    drop_base = new_buckets.join(
        base_buckets.select("band", "key"), ["band", "key"], "left_semi"
    ).select("doc")
    bucket_min = new_buckets.groupBy("band", "key").agg(
        F.min("doc").alias("__min_doc")
    )
    drop_batch = (
        new_buckets.join(bucket_min, ["band", "key"])
        .filter(F.col("doc") > F.col("__min_doc"))
        .select("doc")
    )
    dropped = drop_base.unionAll(drop_batch).distinct()
    return (
        new_buckets.select("doc")
        .distinct()
        .join(dropped, "doc", "left_anti")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 8,
    bands: int = 4,
    threshold: float = 0.8,
    shingle_sets: DataFrame | None = None,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard verified.

    Signature per doc (no shuffle) → per band, bucket key = the band's
    signature slice → shuffle on (band, key) → candidate pairs sharing
    any band → verify exact Jaccard via array_intersect on the (distinct)
    shingle arrays. Output schema matches :func:`ngram_jaccard_pairs`.

    ``shingle_sets`` optionally supplies a prebuilt, already-materialized
    (doc, sh) frame of distinct STRING shingles (the suite's
    session-cached build); it must already exclude empty sets.
    ``signatures`` optionally supplies the prebuilt (doc, sig) MinHash
    table over those same sets with ``num_perm`` permutations, so a
    caller that also consumes the signatures (e.g. the estimator
    calibration query) computes them once instead of twice.
    """
    if num_perm % bands != 0:
        raise ValueError("num_perm must be divisible by bands")
    rows_per_band = num_perm // bands
    # sets_ feeds two asymmetric consumers (signatures; exact-Jaccard
    # verify join) and Spark replans each reference, so the tokenize→
    # shingle pipeline would run twice. localCheckpoint(eager) computes
    # it ONCE and truncates lineage — measured ~40% faster end-to-end at
    # sf0.1 (a StorageLevel persist was slower when first measured in
    # round 2; the checkpoint write of the small shingle arrays is not).
    # Local checkpoints don't survive executor loss — a production run
    # on a real cluster would persist the shingle table to parquet (the
    # gold-table shape) instead.
    sets_ = shingle_sets if shingle_sets is not None else (
        _shingle_sets(df, id_col, text_col, n)
        .filter(F.size("sh") > 0)
        .localCheckpoint(eager=True)
    )
    if signatures is not None:
        # Fail fast if the prebuilt table was made with a different
        # permutation count: band_keys slices the sig array and a
        # too-short slice would silently produce wrong band keys
        # (missed pairs) instead of erroring. Per-row integer compare,
        # codegen'd — negligible next to the banding shuffle.
        signed = signatures.withColumn(
            "sig",
            F.when(
                F.size("sig") == num_perm, F.col("sig")
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "minhash_lsh_pairs: prebuilt signatures have "
                        ),
                        F.size("sig").cast("string"),
                        F.lit(f" perms, expected {num_perm}"),
                    )
                )
            ),
        )
    else:
        signed = minhash_signatures(sets_, "doc", F.col("sh"), num_perm)
    banded = band_keys(signed, bands, rows_per_band)
    cand = (
        bucket_pairs(banded, ["band", "key"], F.col("doc"))
        .toDF("doc_a", "doc_b")
        .distinct()
    )
    # Verify with ONE pass over the shingle sets: melt each candidate
    # pair to (pair, side, doc), join the sets once, and fold the two
    # sides back per pair — two references to sets_ would each replay
    # the tokenize→shingle scan.
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
        .select(
            F.col("__pair.doc_a").alias("doc_a"),
            F.col("__pair.doc_b").alias("doc_b"),
            "sh_a",
            "sh_b",
        )
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("long"))
        .withColumn("size_a", F.size("sh_a").cast("long"))
        .withColumn("size_b", F.size("sh_b").cast("long"))
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select(
        "doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard"
    )


def simhash_block_combos(
    max_hamming: int, bits: int, combo_size: int = 2
) -> tuple[list[tuple[int, ...]], list[int], list[int]]:
    """The block-combination banding design (Manku, Jain & Das Sarma,
    WWW 2007 §3) shared by the batch candidates, the streaming twin's
    band index, the census oracle, and the decades counter — ONE
    definition so the engine and its evidence cannot drift.

    The fingerprint splits into ``max_hamming + combo_size`` blocks
    (the last absorbs any remainder); the tables are all
    C(n_blocks, combo_size) block SUBSETS, keyed on the subset's bits
    concatenated. Exactness: ≤ d differing bits corrupt ≤ d blocks,
    leaving ≥ combo_size clean — and every combo_size-subset is a
    table, so every qualifying pair shares ≥ 1 exact table key. At
    the default combo_size=2 (d=3, 60 bits: 5 blocks, C(5,2)=10
    tables, 24-bit keys) this trades 10/4 × more posting rows than
    the d+1-single-chunk pigeonhole for a key space squared in width:
    the single-chunk keyspace SATURATES once a shard holds ≳2^chunk
    docs (32k at 15 bits — every bucket then grows with n and the
    C(n,2) budget goes quadratic), while the pair keys stay selective
    against INDEPENDENT fingerprints to ~2^24 docs per shard.

    One structural caveat, measured in COST_DECADES.json
    (simhash_band_census + the r15 simhash_idf_clustered stress test):
    real same-distribution corpora cluster — common tokens dominate
    the bit votes, so same-language docs agree on far more than 30 of
    60 bits and share table keys at rates far above the 2^-24
    independent floor. That term scales with the square of cluster
    density at ANY key width. The knobs help but do not cure:
    IDF-weighting the votes zeroes exactly the ubiquitous (df = N)
    tokens — it collapses boilerplate-driven clustering (>3x in the
    unit test) but not correlation from a small shared body
    vocabulary (measured idf/unit 0.33 at 1x eroding to ~0.85 at 100x
    under a 43%-boilerplate stress corpus); combo_size=3 (C(6,3)=20
    tables, 30-bit keys) cuts ~1.6x. Cross-shard selectivity stays at
    the independent floor throughout — the flooding is within-shard
    density work, so the production remedy is UPSTREAM: strip
    boilerplate before fingerprinting (the X158/X229 operators), and
    use the X221/X251 censuses as the detector that routes a
    banding-hostile corpus to the stop-shingle-bounded ngram tiers
    (X2/X86). Returns (combos, offsets, widths)."""
    from itertools import combinations

    n_blocks = max_hamming + combo_size
    chunk = bits // n_blocks
    offsets = [b * chunk for b in range(n_blocks)]
    widths = [chunk] * (n_blocks - 1) + [bits - (n_blocks - 1) * chunk]
    return (
        list(combinations(range(n_blocks), combo_size)), offsets, widths
    )


def simhash_band_keys(
    df: DataFrame,
    doc_col: str,
    fp_col: str,
    max_hamming: int,
    bits: int,
    combo_size: int = 2,
) -> DataFrame:
    """(doc, fp, band, key) posting rows of the block-combination
    banding (:func:`simhash_block_combos`): one row per table, key =
    the combo's block values concatenated. Used by the batch
    candidate set and the streaming twin's static corpus index."""
    combos, offsets, widths = simhash_block_combos(
        max_hamming, bits, combo_size
    )

    def block(b: int):
        return F.shiftright(F.col(fp_col), offsets[b]).bitwiseAND(
            F.lit((1 << widths[b]) - 1)
        )

    def combo_key(combo: tuple) -> "F.Column":
        key = block(combo[0])
        for b in combo[1:]:
            key = key * F.lit(1 << widths[b]) + block(b)
        return key

    return df.select(
        doc_col,
        fp_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("band"),
                        combo_key(combo).alias("key"),
                    )
                    for c, combo in enumerate(combos)
                ]
            )
        ).alias("bk"),
    ).select(doc_col, fp_col, "bk.band", "bk.key")


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = 60,
) -> DataFrame:
    """Document pairs whose SimHash fingerprints differ in ≤ max_hamming
    bits. Block-combination band join (:func:`simhash_block_combos`):
    any qualifying pair agrees exactly on at least one 2-block table
    key — then verify with popcount(xor). Output: doc_a, doc_b,
    hamming."""
    return (
        _simhash_candidates(df, id_col, text_col, max_hamming, bits)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _simhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int,
    bits: int,
    fps: DataFrame | None = None,
) -> DataFrame:
    """The block-combination candidate set behind :func:`simhash_pairs`,
    with exact hamming attached but NOT yet thresholded: (doc_a, doc_b,
    hamming) for every distinct pair agreeing on at least one 2-block
    table key (:func:`simhash_block_combos`). Shared by the pair query
    (filters to <= max_hamming) and the tuning census (histograms the
    whole candidate set). ``fps`` optionally supplies a prebuilt
    (doc, fp) fingerprint table (the suite's session cache — r15) so
    shared consumers skip the explode+groupBy fingerprint pass."""
    if fps is None:
        fps = simhash_fingerprints(
            df.select(F.col(id_col).alias("doc"), F.col(text_col)),
            "doc",
            tokens(F.col(text_col)),
            bits=bits,
        )
    banded = simhash_band_keys(fps, "doc", "fp", max_hamming, bits)
    member = F.struct(F.col("doc"), F.col("fp"))
    return (
        bucket_pairs(banded, ["band", "key"], member)
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("b.fp").alias("fp_b"),
        )
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("long"),
        )
    )


def prefix_filter_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    shingle_sets: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard pairs via PREFIX FILTERING (SSJoin/PPJoin family):
    order every document's shingles by global rarity (corpus frequency,
    hash tie-break) and index only each doc's first
    ``|s| - ceil(t*|s|) + 1`` shingles — any pair with Jaccard >= t must
    share a prefix element under a common total order, so candidates
    come from an equi-join on PREFIX shingles only, never the full
    posting lists. The exact-at-scale alternative to
    :func:`ngram_jaccard_pairs`'s ``max_shingle_freq`` stop-shingle
    bound: rare-first ordering means hot (stop) shingles land at the
    END of every ordering and almost never enter a prefix, so the
    candidate explosion the frequency cap guards against simply does
    not occur — with no approximation. Output schema matches
    :func:`ngram_jaccard_pairs`; at equal thresholds the two return
    IDENTICAL rows (the suite pins this with the same oracle).

    Scale: shingle sets checkpoint once (two consumers); corpus
    frequency is a spillable window count on the shingle hash; per-doc
    prefix selection is one doc-keyed sort of that doc's own shingles;
    candidates explode only ~(1-t)·|s| entries per doc; exact verify
    fetches both sets with ONE melt-join pass.

    ``shingle_sets`` optionally supplies a prebuilt, already-materialized
    (doc, sh) frame of distinct HASHED shingles (the suite's
    session-cached build); it must already exclude empty sets."""
    from pyspark.sql.window import Window

    from seng550_a3_etl_spark.functions.text import hashed_shingles

    sets_ = shingle_sets if shingle_sets is not None else (
        df.select(
            F.col(id_col).alias("doc"),
            F.array_distinct(
                hashed_shingles(tokens(F.col(text_col)), n)
            ).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .localCheckpoint(eager=True)
    )
    postings = sets_.select(
        "doc", F.size("sh").cast("long").alias("n_sh"), F.explode("sh").alias("hs")
    ).withColumn("f", F.count(F.lit(1)).over(Window.partitionBy("hs")))
    prefix_len = (
        F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    ).cast("int")
    prefix = (
        postings.groupBy("doc", "n_sh")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct(F.col("f"), F.col("hs")))
                ),
                1,
                prefix_len,
            ).alias("__pref")
        )
        .select("doc", F.explode("__pref.hs").alias("hs"))
    )
    cand = (
        bucket_pairs(prefix, ["hs"], F.col("doc"))
        .toDF("doc_a", "doc_b")
        .distinct()
    )
    melted = cand.select(
        F.struct("doc_a", "doc_b").alias("__pair"),
        F.posexplode(F.array("doc_a", "doc_b")).alias("__side", "doc"),
    )
    return (
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
        .select(
            F.col("__pair.doc_a").alias("doc_a"),
            F.col("__pair.doc_b").alias("doc_b"),
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("inter"),
            F.size("sh_a").cast("long").alias("size_a"),
            F.size("sh_b").cast("long").alias("size_b"),
        )
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")
    )


def dedup_doc_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """INTRA-document repeated-span removal (X155) — the curation stage
    that drops duplicated lines/paragraphs inside one document before
    cross-document near-dup (X2/X3) ever sees the text: templated pages
    repeat nav blocks and boilerplate paragraphs within themselves, and
    Gopher-style repetition stats (X55, ``repetition_stats``) only
    MEASURE that — nothing previously removed it.

    The text is split into consecutive non-overlapping ``k``-token
    spans (the fixture-sized stand-in for line/paragraph units; real
    corpora would split on newlines first); the FIRST occurrence of
    each distinct span survives, later exact repeats are dropped, and
    the document is rebuilt from the survivors in original order.

    Pure per-row HOF plan, zero shuffle (the X55 shape):
    ``(span, pos)`` structs are ``array_sort``-ed (lexicographic by
    span text, position tie-break), a shifted ``zip_with`` marks the
    first struct of each equal-span run — O(s log s) per document
    instead of the O(s²) positions-scanned-per-position form — and the
    kept positions are re-sorted to rebuild reading order. No hashing:
    spans compare as strings, so the DuckDB oracle's
    ``row_number() OVER (PARTITION BY doc, span ORDER BY pos) = 1``
    replays the semantics exactly.

    Returns (id, *carry, n_spans, n_dup_spans, dedup_text); ``carry``
    columns pass through the per-row projection untouched, so pipeline
    compositions (X78-style stage accounting) don't pay a corpus-sized
    re-join to recover upstream columns.
    """
    toks = tokens(F.col(text_col))
    nb = F.ceil(F.size(toks) / F.lit(k)).cast("int")
    blocks = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), nb - 1),
            lambda i: F.array_join(F.slice(toks, i * k + 1, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))

    tagged = F.transform(
        blocks, lambda b, i: F.struct(b.alias("b"), i.alias("pos"))
    )
    srt = F.array_sort(tagged)
    prev = F.concat(
        F.array(F.lit(None).cast("struct<b:string,pos:int>")),
        F.slice(srt, 1, F.greatest(F.size(srt) - 1, F.lit(0))),
    )
    keep_sorted = F.zip_with(
        srt,
        prev,
        lambda c, p: F.struct(
            c["b"].alias("b"),
            c["pos"].alias("pos"),
            (p.isNull() | (p["b"] != c["b"])).alias("keep"),
        ),
    )
    # NULL text: srt is empty but prev is [null], and zip_with null-pads
    # the shorter array, yielding one phantom struct with null pos whose
    # keep flag is true — drop it here so n_dup_spans stays 0, not -1.
    kept_pos = F.array_sort(
        F.transform(
            F.filter(
                keep_sorted,
                lambda s: s["keep"] & s["pos"].isNotNull(),
            ),
            lambda s: s["pos"],
        )
    )
    out = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.size(blocks).cast("long").alias("n_spans"),
        kept_pos.alias("__kept"),
        blocks.alias("__blocks"),
    )
    return out.select(
        id_col,
        *carry,
        "n_spans",
        (F.col("n_spans") - F.size("__kept")).cast("long").alias(
            "n_dup_spans"
        ),
        F.array_join(
            F.transform(
                F.col("__kept"),
                lambda p: F.element_at(F.col("__blocks"), p + 1),
            ),
            " ",
        ).alias("dedup_text"),
    )


def dedup_doc_spans_exploded(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """:func:`dedup_doc_spans` with an explode/aggregate physical plan —
    byte-identical output (same split, same keep-first-occurrence rule,
    same reading-order rebuild), different execution shape: spans
    posexplode, the first occurrence per (doc, span) is marked by a
    min-position window, and ONE groupBy(doc) rebuilds the text — two
    narrow shuffles instead of zero.

    Exists for COMPOSED pipelines (X161): the zero-shuffle HOF form
    generates a very large expression tree, and chaining three such
    stages in one job makes the per-session codegen compile (janino)
    the dominant cost at bench scale (~50-60 s before the first row
    moves; measured r9). The explode form keeps every generated class
    small. At production scale the trade inverts benignly: the compile
    is a fixed cost a 100 TB run never notices, and the two shuffles
    move (pos, span) pairs — bounded, map-side-combinable traffic — so
    either form is scale-safe; pick HOF when the job is this operator
    alone, exploded when it composes with other heavy per-row stages.

    ``carry`` columns ride the rebuild groupBy key (constant per doc),
    exactly as in :func:`remove_boilerplate_spans`.
    """
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    nb = F.ceil(F.size(toks) / F.lit(k)).cast("int")
    blocks = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), nb - 1),
            lambda i: F.array_join(F.slice(toks, i * k + 1, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # posexplode_outer keeps empty/NULL-text docs as one (null, null)
    # row, so they survive to the rebuild with 0 spans and '' text —
    # matching the HOF form's empty-array branch.
    ex = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.posexplode_outer(blocks).alias("pos", "b"),
    )
    w = Window.partitionBy(id_col, "b")
    marked = ex.withColumn("__minpos", F.min("pos").over(w))
    return marked.groupBy(id_col, *[F.col(c) for c in carry]).agg(
        F.count("b").cast("long").alias("n_spans"),
        (
            F.count("b")
            - F.count(F.when(F.col("pos") == F.col("__minpos"), F.lit(1)))
        ).cast("long").alias("n_dup_spans"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("pos") == F.col("__minpos"),
                            F.struct("pos", "b"),
                        )
                    )
                ),
                lambda s: s["b"],
            ),
            " ",
        ).alias("dedup_text"),
    )


def remove_boilerplate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    min_docs: int,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """CROSS-document boilerplate removal (X158) — the C4/CCNet rule: a
    non-overlapping ``k``-token span occurring in ≥ ``min_docs``
    distinct documents is boilerplate (nav blocks, cookie banners,
    license headers) and is dropped from EVERY document; each document
    is rebuilt from its surviving spans in reading order, with span
    accounting. The within-doc complement is :func:`dedup_doc_spans`.

    Scale: one map-side-combined distinct-doc count per span, keyed
    ``(xxhash64, span)`` — the 64-bit hash distributes the shuffle and
    carrying the (short) span text makes the census exact with no
    hash-collision assumption. The frequent-span set (bounded by the
    corpus's repeated content; AQE broadcasts it when it fits) marks
    positions via a LEFT join on the same pair key, and ONE
    groupBy(doc) rebuilds the text — two corpus shuffles total.

    Returns (id, *carry, n_spans, n_boiler_spans, clean_text); docs
    whose text is NULL produce zero spans and are dropped (callers
    feeding rebuilt text — always ≥ '' — keep every doc). ``carry``
    columns are constant per document and ride the rebuild groupBy key.
    """
    toks = tokens(F.col(text_col))
    nb = F.ceil(F.size(toks) / F.lit(k)).cast("int")
    span_structs = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), nb - 1),
            lambda i: F.struct(
                i.alias("pos"),
                F.array_join(F.slice(toks, i * k + 1, k), " ").alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,b:string>>"))
    blocks = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.explode(span_structs).alias("s"),
    ).select(
        id_col,
        *carry,
        F.col("s.pos").alias("pos"),
        F.col("s.b").alias("b"),
        F.xxhash64("s.b").alias("h"),
    )
    frequent = (
        blocks.groupBy("h", "b")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h", "b", F.lit(True).alias("__boiler"))
    )
    marked = blocks.join(frequent, ["h", "b"], "left").select(
        id_col,
        *carry,
        "pos",
        "b",
        F.coalesce("__boiler", F.lit(False)).alias("boiler"),
    )
    return marked.groupBy(id_col, *carry).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("boiler").cast("int")).cast("long").alias(
            "n_boiler_spans"
        ),
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "b", "boiler"))
                    ),
                    lambda s: ~s["boiler"],
                ),
                lambda s: s["b"],
            ),
            " ",
        ).alias("clean_text"),
    )


def substring_anchors(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(doc, pos, h) k-token window-anchor postings — every k-token
    window's 0-based position and 60-bit hash, for docs long enough to
    hold one. The ONE definition of the substring family's anchor
    universe: :func:`cross_doc_substring_spans` builds its posting
    lists from it, and the cost-class decades counter
    (scripts/cost_class_decades.py measure_xspan) measures the SAME
    construction, so the linear-claim evidence cannot silently drift
    from the operator it certifies (r14 review)."""
    docs = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("__tk")
    )
    return docs.filter(F.size("__tk") >= k).select(
        "doc",
        F.posexplode(
            F.transform(shingles(F.col("__tk"), k), lambda c: hash64(c))
        ).alias(
            "pos", "h"
        ),
    )


def cross_doc_substring_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    min_span_tokens: int,
    max_anchor_freq: int,
) -> DataFrame:
    """Maximal exact shared token spans across document pairs — the
    substring-granularity dedup rung of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"), whose suffix-array
    pass finds verbatim ≥50-token spans repeated across documents.
    Where :func:`dup_span_stats` only counts per-doc duplicated window
    positions, this returns WHICH pair shares WHAT span: one row per
    maximal run, ``(doc_a < doc_b, a_start, b_start, span_tokens)``
    with 0-based token offsets.

    Spark-first shape (no distributed suffix array needed): every
    k-token window hashes to a 60-bit anchor; postings group by anchor
    hash (the X2/X89 posting pattern) and each posting list emits its
    cross-doc position pairs; a pair of docs sharing a span of L ≥ k
    tokens produces exactly L−k+1 anchor matches at CONSECUTIVE a-side
    positions on one diagonal (pa − pb), so maximal shared spans are
    the maximal consecutive runs per (doc_a, doc_b, diagonal) — a
    gaps-and-islands pass: island = pa − row_number(), one run row per
    island, span_tokens = run_length + k − 1.

    ``max_anchor_freq`` is the posting stop-list (an anchor appearing
    in more than this many windows corpus-wide is dropped BEFORE pair
    emission): the C(freq, 2) pair budget per anchor is the ONLY
    superlinear term, and at web scale hot anchors are exactly the
    boilerplate the span census should not pay for. Spans bridged by a
    dropped anchor split into two shorter runs in BOTH engines — the
    documented approximation, exact whenever no anchor exceeds the
    bound (asserted against the fixtures in tests).

    Scale: corpus text never shuffles — anchors are (hash, doc, pos)
    longs. TWO exchanges total (verified in the executed plan):
    postings shuffle once on hash (the stop-list window and the bucket
    groupBy share that partitioning), pairs shuffle once on (doc_a,
    doc_b, diag) (the run window and the island rollup share it —
    hash partitioning on the window keys satisfies the rollup's
    superset grouping keys). Per-(pair, diagonal) run windows are
    bounded by doc length, so no skewed window partition exists."""
    from pyspark.sql.window import Window

    anchors = substring_anchors(df, id_col, text_col, k)
    anchors = (
        anchors.withColumn(
            "__f", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .filter(F.col("__f") <= max_anchor_freq)
        .drop("__f")
    )
    buckets = anchors.groupBy("h").agg(
        F.sort_array(F.collect_list(F.struct("doc", "pos"))).alias("__ms")
    )
    pairs = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "__ms",
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("__ms"),
                                i + F.lit(2),
                                F.size("__ms"),
                            ),
                            lambda y: F.struct(
                                x["doc"].alias("doc_a"),
                                x["pos"].alias("pa"),
                                y["doc"].alias("doc_b"),
                                y["pos"].alias("pb"),
                            ),
                        ),
                    )
                )
            ).alias("__p")
        )
        .select("__p.*")
        # the posting list is sorted by (doc, pos), so i < j gives
        # doc_a <= doc_b; drop the intra-doc (self-repeat) pairs
        .filter(F.col("doc_a") != F.col("doc_b"))
        .withColumn("diag", F.col("pa") - F.col("pb"))
    )
    wrun = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = pairs.withColumn(
        "__isl", F.col("pa") - F.row_number().over(wrun)
    )
    spans = runs.groupBy("doc_a", "doc_b", "diag", "__isl").agg(
        F.min("pa").alias("a_start"), F.count(F.lit(1)).alias("__n")
    )
    return spans.select(
        "doc_a",
        "doc_b",
        F.col("a_start").cast("long").alias("a_start"),
        (F.col("a_start") - F.col("diag")).cast("long").alias("b_start"),
        (F.col("__n") + (k - 1)).cast("long").alias("span_tokens"),
    ).filter(F.col("span_tokens") >= min_span_tokens)


def union_span_coverage(
    spans: DataFrame, key_cols: list[str], start_col: str, len_col: str
) -> DataFrame:
    """Total length of the UNION of half-open intervals
    ``[start, start+len)`` per key — what a substring-trim pass charges
    a document when several shared spans overlap (summing raw lengths
    would double-count the overlap).

    Distributed sweep, no per-key collect: intervals window-order by
    (start, end) per key; an interval opens a NEW island when its start
    is ≥ the running max end of every preceding interval (adjacent
    islands need no merge — island lengths already sum correctly);
    covered = Σ islands (max end − min start). Tied (start, end) rows
    are interchangeable, so the island assignment is order-stable and
    a DuckDB oracle replays it bit-for-bit.

    Scale: ONE exchange on the key — both window functions share one
    (partition, order) spec and the island rollup + per-key fold reuse
    the key partitioning. Per-key interval counts are bounded by doc
    length. Output: key_cols + ``covered`` (long)."""
    from pyspark.sql.window import Window

    end = (F.col(start_col) + F.col(len_col)).alias("__e")
    w = Window.partitionBy(*key_cols).orderBy(start_col, "__e")
    prev_e = F.max("__e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = (
        spans.select(*key_cols, F.col(start_col), end)
        .withColumn(
            "__new",
            F.when(
                prev_e.isNull() | (F.col(start_col) >= prev_e), 1
            ).otherwise(0),
        )
        .withColumn(
            "__isl",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        flagged.groupBy(*key_cols, "__isl")
        .agg((F.max("__e") - F.min(start_col)).alias("__cov"))
        .groupBy(*key_cols)
        .agg(F.sum("__cov").cast("long").alias("covered"))
    )


def cdc_cut_positions(
    tk: Column, window: int = 4, divisor: int = 13
) -> Column:
    """1-based cut positions (array<long>) of the CDC boundary rule
    over a clean token array: a boundary falls AFTER 1-based token
    ``i + window`` wherever the 0-based ``window``-token shingle at i
    has ``hash64 % divisor == 0``. Split out of
    :func:`cdc_chunk_instances` so the bench stage profiler
    (scripts/profile_10x.py profile_cdc_chunk) times THE operator's
    boundary expression rather than a hand-inlined copy that could
    drift (r15 review)."""
    return F.transform(
        F.filter(
            F.transform(
                shingles(tk, window),
                lambda s, i: F.struct(i.alias("i"), hash64(s).alias("h")),
            ),
            lambda x: x["h"] % divisor == 0,
        ),
        lambda x: (x["i"] + window).cast("long"),
    )


def cdc_chunk_instances(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 4,
    divisor: int = 13,
    carry: list[str] | None = None,
) -> DataFrame:
    """(id, carry..., h, ntok) content-defined chunk instances — the
    LBFS/rsync/restic CDC recipe on tokens, single-sourced for the
    batch census (X250 ``cdc_chunk_dedup``) and the streaming ingest
    guard (``stream_cdc_chunk_guard``) so the two executions cannot
    drift. A chunk boundary falls AFTER token ``i + window - 1``
    (1-based) wherever the ``window``-token shingle's 60-bit hash is
    ``% divisor == 0`` — edges resynchronize after an insertion or
    deletion, so a one-token edit changes O(1) chunks (unlike
    fixed-size chunking, where every chunk after the edit shifts).
    Mean chunk length ≈ ``divisor`` tokens.

    Everything is per-row HOF expressions in the scan stage (tokens →
    shingle windows → hash → qualifying cut positions → start/end zip →
    slice+join+hash per chunk): the text column never shuffles, only
    the emitted (id, carry, hash, ntok) rows do, and the construction
    is legal in a streaming micro-batch (stateless projection — no
    aggregation, no state). Empty-token documents emit zero rows (the
    degenerate [1, 0] start/end pair fails ``e >= s``)."""
    carry = carry or []
    d = df.select(
        F.col(id_col),
        *carry,
        F.filter(tokens(F.col(text_col)), lambda x: x != "").alias("tk"),
    )
    d2 = d.select(
        id_col, *carry, "tk",
        cdc_cut_positions(F.col("tk"), window, divisor).alias("cp"),
    )
    starts = F.concat(
        F.array(F.lit(1).cast("long")),
        F.transform(F.col("cp"), lambda p: p + 1),
    )
    ends = F.concat(F.col("cp"), F.array(F.size("tk").cast("long")))
    chunks = F.filter(
        F.zip_with(
            starts,
            ends,
            lambda s, e: F.struct(s.alias("s"), e.alias("e")),
        ),
        lambda c: c["e"] >= c["s"],
    )
    return d2.select(
        id_col, *carry, F.explode(chunks).alias("c"), "tk"
    ).select(
        id_col,
        *carry,
        hash64(
            F.array_join(
                F.slice(
                    "tk",
                    F.col("c.s").cast("int"),
                    (F.col("c.e") - F.col("c.s") + 1).cast("int"),
                ),
                " ",
            )
        ).alias("h"),
        (F.col("c.e") - F.col("c.s") + 1).alias("ntok"),
    )
