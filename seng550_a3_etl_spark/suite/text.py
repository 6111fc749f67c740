"""Text-analysis + document-dedup suite queries (north-star extension:
the operator set a pretraining-data pipeline runs over a documents
table). Every query here is fully oracle-checked — including MinHash-LSH
and SimHash, whose md5-derived hashes DuckDB reproduces bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seng550_a3_etl_spark.catalog import load_tables
from seng550_a3_etl_spark.functions.hashing import (
    duck_hash64,
    duck_minhash_signature,
    duck_simhash,
    hash64,
)
from seng550_a3_etl_spark.functions.text import (
    LANG_MARKERS,
    TOKEN_REGEX,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_chunks,
    tokens,
)
from seng550_a3_etl_spark.operators.text_dedup import (
    containment_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from seng550_a3_etl_spark.suite.registry import query

# Shared DuckDB fragments ---------------------------------------------------

_TOKS = r"(SELECT doc_id, text, string_split_regex(text, '\s+') AS t FROM documents)"


def _duck_shingles(n: int, toks: str = "t") -> str:
    """n-token shingles of list column ``toks`` (1-based inclusive slices)."""
    return (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' '))"
    )


def _duck_marker(lang: str) -> str:
    lst = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return f"len(list_filter(t, x -> list_contains([{lst}], x)))"


# Queries -------------------------------------------------------------------


@query(
    "doc_token_stats",
    oracle=rf"""
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(t)) AS BIGINT) AS n_unique,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS BIGINT) AS n_regex_tokens
    FROM {_TOKS}
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, unique tokens, and a BPE-ish
    regex token count — the cheap size features every corpus pipeline
    materializes first."""
    t = load_tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    return t.documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(TOKEN_REGEX), F.lit(0))
        )
        .cast("long")
        .alias("n_regex_tokens"),
    )


_LANG_CASE = " ".join(
    f"WHEN c_{lang} = best AND best > 0 THEN '{lang}'"
    for lang in LANG_MARKERS
)


@query(
    "doc_lang_quality",
    oracle=rf"""
    WITH scored AS (
      SELECT doc_id, text, t,
             {_duck_marker('en')} AS c_en, {_duck_marker('es')} AS c_es,
             {_duck_marker('de')} AS c_de, {_duck_marker('fr')} AS c_fr,
             {_duck_marker('zh')} AS c_zh
      FROM {_TOKS}
    )
    SELECT doc_id,
           CASE {_LANG_CASE} ELSE 'und' END AS lang_pred,
           ROUND(
             least(len(t) / 100.0, 1.0) * 0.25
             + (len(list_distinct(t)) / greatest(len(t), 1)) * 0.25
             + least(((length(text) - (len(t) - 1)) / greatest(len(t), 1)) / 8.0,
                     1.0) * 0.25
             + least((c_en / greatest(len(t), 1)) * 10.0, 1.0) * 0.25,
           6) AS quality
    FROM (SELECT *, greatest(c_en, c_es, c_de, c_fr, c_zh) AS best FROM scored)
    """,
)
def doc_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (marker-wordlist argmax, deterministic
    tie-break) + composite quality score — the standard cheap corpus
    filters, computed per-row with zero shuffle."""
    t = load_tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    return t.documents.select(
        "doc_id",
        lang_id(toks).alias("lang_pred"),
        F.round(quality_score(F.col("text"), toks), 6).alias("quality"),
    )


@query(
    "doc_fingerprints",
    oracle=f"""
    SELECT doc_id,
           list_aggregate(list_transform({_duck_shingles(5)},
                          s -> {duck_hash64('s')}), 'min') AS fingerprint
    FROM {_TOKS}
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit min-shingle-hash document fingerprint (winnowing-lite)."""
    t = load_tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        doc_fingerprint(tokens(F.col("text")), n=5).alias("fingerprint"),
    )


@query(
    "exact_dedup_docs",
    oracle="""
    WITH groups AS (
      SELECT md5(text) AS h, MIN(doc_id) AS canonical_id,
             COUNT(*) AS group_size
      FROM documents GROUP BY 1
    )
    SELECT d.doc_id, g.canonical_id, g.group_size
    FROM documents d JOIN groups g ON md5(d.text) = g.h
    """,
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: every doc mapped to the canonical (min) id of
    its content-hash group."""
    t = load_tables(spark, sf_dir)
    return exact_dedup(t.documents, "doc_id", "text")


_DUCK_SETS3 = (
    f"(SELECT doc_id AS doc, list_distinct({_duck_shingles(3, 't')}) AS sh "
    f"FROM {_TOKS})"
)

# MinHash scale knobs — single-sourced across the Spark queries, the
# DuckDB oracles (interpolated below), and scripts/profile_10x.py, so
# a re-parameterization (the kind round 6 made to the sign-LSH path)
# can never leave the profiler or an oracle replaying stale math.
MINHASH_NUM_PERM = 8
MINHASH_BANDS = 4
MINHASH_THRESHOLD = 0.8


@query(
    "ngram_dup_pairs",
    oracle=f"""
    WITH sets_ AS {_DUCK_SETS3},
    sizes AS (SELECT doc, CAST(len(sh) AS BIGINT) AS n_sh FROM sets_),
    ex AS (SELECT doc, unnest(sh) AS s FROM sets_),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS inter
      FROM ex a JOIN ex b USING (s)
      WHERE a.doc < b.doc GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, inter,
           sa.n_sh AS size_a, sb.n_sh AS size_b,
           inter / (sa.n_sh + sb.n_sh - inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc = doc_a
    JOIN sizes sb ON sb.doc = doc_b
    WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.8
    """,
)
def ngram_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard near-dup pairs (threshold 0.8) — the
    correctness baseline the LSH path is verified against.

    ``max_shingle_freq=64`` bounds the per-shingle pair explode (the
    documented web-scale stop-shingle knob). At the suite fixtures it is
    exact — no shingle is shared by more than 25 documents even at
    sf0.1 — so the unbounded DuckDB oracle still matches; corpora with
    hotter shingles trade exactness for the bound, which is this
    operator's contract (the exact-within-budget baseline; X3/X4 are the
    scale paths)."""
    t = load_tables(spark, sf_dir)
    return ngram_jaccard_pairs(
        t.documents, "doc_id", "text", n=3, threshold=0.8,
        max_shingle_freq=64,
        shingle_sets=_shingle_sets_df(spark, sf_dir, n=3, hashed=True),
    )


def _duck_minhash_bands(num_perm: int, bands: int) -> str:
    rows = num_perm // bands
    arms = []
    for b in range(bands):
        key = " || ',' || ".join(
            f"CAST(sig[{b * rows + r + 1}] AS VARCHAR)" for r in range(rows)
        )
        arms.append(f"SELECT doc, {b} AS band, {key} AS key FROM sig")
    return " UNION ALL ".join(arms)


@query(
    "minhash_dup_pairs",
    oracle=f"""
    WITH sets_ AS (SELECT * FROM {_DUCK_SETS3} WHERE len(sh) > 0),
    sig AS (SELECT doc, sh,
                   {duck_minhash_signature('sh', MINHASH_NUM_PERM)} AS sig
            FROM sets_),
    banded AS ({_duck_minhash_bands(MINHASH_NUM_PERM, MINHASH_BANDS)}),
    cand AS (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM banded a JOIN banded b USING (band, key)
      WHERE a.doc < b.doc
    )
    SELECT doc_a, doc_b,
           CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS inter,
           CAST(len(sa.sh) AS BIGINT) AS size_a,
           CAST(len(sb.sh) AS BIGINT) AS size_b,
           len(list_intersect(sa.sh, sb.sh))
             / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
             AS jaccard
    FROM cand
    JOIN sets_ sa ON sa.doc = doc_a
    JOIN sets_ sb ON sb.doc = doc_b
    WHERE len(list_intersect(sa.sh, sb.sh))
          / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
          >= {MINHASH_THRESHOLD}
    """,
)
def minhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8 perms) + LSH(4 bands × 2 rows) candidate generation with
    exact-Jaccard verification — the scale path for near-dup detection.
    The oracle replays the identical signature/banding math in SQL."""
    t = load_tables(spark, sf_dir)
    return minhash_lsh_pairs(
        t.documents, "doc_id", "text", n=3, num_perm=MINHASH_NUM_PERM,
        bands=MINHASH_BANDS, threshold=MINHASH_THRESHOLD,
        shingle_sets=_shingle_sets_df(spark, sf_dir, n=3, hashed=False),
        signatures=_minhash_sigs_df(spark, sf_dir),
    )


# SimHash fingerprints and the block-combination candidate set feed
# three suite consumers (X4 near pairs, X221 hamming census, X222's
# streaming index) plus X251's unit arm — before r15 each re-ran the
# explode+groupBy fingerprint pass (and X4/X221 re-ran the band join +
# pair distinct) over the same documents. Session-cached like
# _shingle_sets_df: at 100 TB the fingerprint table (8 bytes/doc) and
# the candidate set are materialized artifacts of the dedup pipeline;
# bench.py evicts + times both builds as their own [1x, 10x, ratio]
# rows.
_SIMHASH_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _simhash_fps_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc, fp) 60-bit SimHash fingerprints over documents — cached."""
    from seng550_a3_etl_spark.functions.hashing import simhash_fingerprints

    _evict_stopped_sessions(_SIMHASH_CACHE)
    key = (spark.sparkContext.applicationId, sf_dir, "fps")
    cached = _SIMHASH_CACHE.get(key)
    if cached is not None:
        return cached
    t = load_tables(spark, sf_dir)
    out = simhash_fingerprints(
        t.documents.select(F.col("doc_id").alias("doc"), "text"),
        "doc",
        tokens(F.col("text")),
        bits=60,
    ).localCheckpoint(eager=True)
    _SIMHASH_CACHE[key] = out
    return out


def _simhash_cands_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, hamming + fingerprint cols) block-combination
    candidate set at max_hamming=3/bits=60 over documents — cached;
    rides the cached fingerprint table."""
    from seng550_a3_etl_spark.operators.text_dedup import (
        _simhash_candidates,
    )

    _evict_stopped_sessions(_SIMHASH_CACHE)
    key = (spark.sparkContext.applicationId, sf_dir, "cands")
    cached = _SIMHASH_CACHE.get(key)
    if cached is not None:
        return cached
    t = load_tables(spark, sf_dir)
    out = _simhash_candidates(
        t.documents, "doc_id", "text", max_hamming=3, bits=60,
        fps=_simhash_fps_df(spark, sf_dir),
    ).localCheckpoint(eager=True)
    _SIMHASH_CACHE[key] = out
    return out


@query(
    "simhash_near_pairs",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id AS doc, {duck_simhash('t')} AS fp FROM {_TOKS}
    )
    SELECT a.doc AS doc_a, b.doc AS doc_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc < b.doc
    WHERE bit_count(xor(a.fp, b.fp)) <= 3
    """,
)
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(60-bit) near-dup pairs within Hamming distance 3. The
    engine uses the Manku-2007 block-combination band join (5 blocks,
    all C(5,2) two-block tables with 24-bit keys → ≤3 errors leave ≥2
    clean blocks, so every qualifying pair shares one exact table key;
    the 24-bit keyspace stays selective to ~16M docs per shard where
    the old 4x15-bit single-chunk pigeonhole saturated at ~30k); the
    oracle brute-forces all pairs — result sets must be identical,
    which checks the banding construction end to end."""
    return (
        _simhash_cands_df(spark, sf_dir)
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )


@query(
    "tfidf_top_terms",
    oracle=r"""
    WITH ex AS (
      SELECT doc_id AS doc, unnest(string_split_regex(text, '\s+')) AS t
      FROM documents
    ),
    tf AS (SELECT doc, t, COUNT(*) AS cnt FROM ex GROUP BY 1, 2),
    dlen AS (SELECT doc, COUNT(*) AS len FROM ex GROUP BY 1),
    dfreq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc, tf.t,
             CAST(cnt AS DOUBLE) * n_docs / len / df AS score
      FROM tf JOIN dlen USING (doc) JOIN dfreq USING (t) CROSS JOIN n
    )
    SELECT doc, t AS term, ROUND(score, 6) AS score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc ORDER BY score DESC, t
      ) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by log-free TF-IDF (tf * N/df) — ranked
    on exact rational doubles so both engines order identically."""
    from seng550_a3_etl_spark.operators.tfidf import tfidf_top_terms as op

    t = load_tables(spark, sf_dir)
    return op(t.documents, "doc_id", "text", k=3)


def _dup_clusters_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    return f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({ORACLES['ngram_dup_pairs']}) q
    ),
    edges AS (
      SELECT doc_a AS s, doc_b AS t FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT s, s FROM (SELECT DISTINCT s FROM edges) t1
      UNION
      SELECT e.s, r.label FROM reach r JOIN edges e ON e.t = r.node
    ),
    comp AS (SELECT node, MIN(label) AS canonical FROM reach GROUP BY node)
    SELECT d.doc_id, COALESCE(c.canonical, d.doc_id) AS canonical_id
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """


@query("dup_clusters", oracle=_dup_clusters_oracle())
def dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → dedup groups: connected components (iterative
    min-label propagation, operators/graph.py) over the exact 3-gram
    Jaccard pairs; every document maps to its component's minimum doc_id
    (itself when unpaired). The oracle computes the same fixpoint as a
    recursive reachability closure — an *iterative* Spark operator that
    is still fully oracle-checked.

    Labels come from the shared per-session materialization
    (:func:`_labels_df`) — the pair scan + CC subgraph runs once per
    session no matter how many label consumers execute."""
    return _labels_df(spark, sf_dir)


@query(
    "curation_pipeline",
    oracle=rf"""
    WITH toks AS (SELECT doc_id, text, string_split_regex(text, '\s+') AS t
                  FROM documents),
    scored AS (
      SELECT doc_id, text, t,
             CAST(len(t) AS BIGINT) AS n_tokens,
             {_duck_marker('en')} AS c_en, {_duck_marker('es')} AS c_es,
             {_duck_marker('de')} AS c_de, {_duck_marker('fr')} AS c_fr,
             {_duck_marker('zh')} AS c_zh,
             least(len(t) / 100.0, 1.0) * 0.25
               + (len(list_distinct(t)) / greatest(len(t), 1)) * 0.25
               + least(((length(text) - (len(t) - 1)) / greatest(len(t), 1))
                       / 8.0, 1.0) * 0.25
               + least(({_duck_marker('en')} / greatest(len(t), 1)) * 10.0,
                       1.0) * 0.25 AS quality
      FROM toks),
    kept AS (
      SELECT doc_id, text, t, n_tokens, quality
      FROM (SELECT *, greatest(c_en, c_es, c_de, c_fr, c_zh) AS best
            FROM scored)
      WHERE (CASE {_LANG_CASE} ELSE 'und' END) = 'en'
        AND quality >= 0.45),
    uniq AS (
      SELECT * FROM (
        SELECT k.*, MIN(doc_id) OVER (PARTITION BY md5(text)) AS canon
        FROM kept k)
      WHERE doc_id = canon),
    sets_ AS (SELECT doc_id AS doc, list_distinct({_duck_shingles(3)}) AS sh
              FROM uniq),
    sizes AS (SELECT doc, CAST(len(sh) AS BIGINT) AS n_sh FROM sets_),
    ex AS (SELECT doc, unnest(sh) AS s FROM sets_),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS inter
      FROM ex a JOIN ex b USING (s)
      WHERE a.doc < b.doc GROUP BY 1, 2),
    near_dupes AS (
      SELECT DISTINCT doc_b FROM inter
      JOIN sizes sa ON sa.doc = doc_a JOIN sizes sb ON sb.doc = doc_b
      WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.8),
    final AS (
      SELECT doc_id, n_tokens, ROUND(quality, 6) AS quality FROM uniq
      WHERE doc_id NOT IN (SELECT doc_b FROM near_dupes))
    SELECT doc_id, n_tokens, quality, cum_tokens FROM (
      SELECT doc_id, n_tokens, quality,
             CAST(SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id)
                  AS BIGINT) AS cum_tokens
      FROM final)
    WHERE cum_tokens <= 8000
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-corpus curation pipeline, composed from
    the engine's own operators: language filter + quality threshold →
    exact dedup (min-id per content hash) → near-dup removal (drop the
    doc_b side of every exact-Jaccard ≥0.8 pair) → greedy token-budget
    selection (highest quality first, 8k-token budget).

    Every stage is shuffle-bounded: per-row scoring (zero shuffle), one
    hash-window dedup shuffle, the posting self-join, and a final
    cumulative window over the tiny surviving set (the only
    single-partition step — acceptable because the budget bounds it)."""
    from pyspark.sql.window import Window

    from seng550_a3_etl_spark.operators.text_dedup import ngram_jaccard_pairs

    t = load_tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    feat = t.documents.select(
        "doc_id",
        "text",
        F.size(toks).cast("long").alias("n_tokens"),
        lang_id(toks).alias("lang_pred"),
        quality_score(F.col("text"), toks).alias("q_raw"),
    )
    kept = feat.filter(
        (F.col("lang_pred") == "en") & (F.col("q_raw") >= 0.45)
    )
    w_hash = Window.partitionBy(F.md5("text"))
    uniq = (
        kept.withColumn("__canon", F.min("doc_id").over(w_hash))
        .filter(F.col("doc_id") == F.col("__canon"))
        .drop("__canon", "lang_pred")
    )
    # uniq feeds both the near-dup scan and the final anti-join and is
    # deliberately NOT checkpointed: fresh-session A/B (re-run round 4)
    # shows the eager materialization costs more than the double
    # recompute here — uniq carries the full lang/quality scoring and
    # text columns, so writing it out gates both branches on a fat
    # materialization. Contrast minhash_lsh_pairs, where checkpointing
    # the narrow shingle sets measured ~40% faster; the decision is
    # per-shape, re-measured, not a blanket rule.
    # The survivors' shingle sets are a row-subset of the session-cached
    # corpus sets (shingles are per-doc, independent of the corpus), so
    # a left-semi filter on the cached build replaces re-running the
    # tokenize->shingle->distinct HOFs over the survivors (r15). The
    # stop-shingle bound is then computed over the filtered sets inside
    # pair_intersections — exactly what building from ``uniq`` computed.
    near = (
        ngram_jaccard_pairs(
            uniq, "doc_id", "text", n=3, threshold=0.8,
            max_shingle_freq=64,
            shingle_sets=_shingle_sets_df(spark, sf_dir, n=3, hashed=True)
            .join(
                uniq.select(F.col("doc_id").alias("doc")), "doc", "left_semi"
            ),
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    final = uniq.join(near, "doc_id", "left_anti").select(
        "doc_id", "n_tokens", F.round("q_raw", 6).alias("quality")
    )
    w_budget = Window.orderBy(
        F.desc("quality"), F.asc("doc_id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return final.select(
        "doc_id",
        "n_tokens",
        "quality",
        F.sum("n_tokens").over(w_budget).alias("cum_tokens"),
    ).filter(F.col("cum_tokens") <= 8000)


@query(
    "doc_token_chunks",
    oracle=r"""
    WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS t
                  FROM documents),
    ch AS (SELECT doc_id, t,
                  unnest(range(0, CAST(ceil(len(t) / 16.0) AS BIGINT)))
                    AS chunk_id
           FROM toks WHERE len(t) > 0)
    SELECT doc_id,
           CAST(chunk_id AS INT) AS chunk_id,
           array_to_string(t[chunk_id * 16 + 1 : chunk_id * 16 + 16], ' ')
             AS chunk_text,
           CAST(least(len(t), chunk_id * 16 + 16) - chunk_id * 16 AS BIGINT)
             AS n_chunk_tokens
    FROM ch
    """,
)
def doc_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split every document into consecutive
    16-token windows (final remainder kept) — the step that turns a
    curated corpus into fixed-length training sequences.

    Scale: chunking is per-row array math followed by one explode — no
    shuffle at all; the output lands pre-sharded exactly like its input,
    ready for a partitioned training-shard write. Chunk size is a
    parameter (16 here so the small fixture still yields multi-chunk
    docs; 512-2048 in a real pipeline)."""
    t = load_tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    chunked = t.documents.select(
        "doc_id",
        F.explode(token_chunks(toks, 16)).alias("ch"),
    )
    return chunked.select(
        "doc_id",
        F.col("ch.chunk_id").alias("chunk_id"),
        F.array_join("ch.chunk_toks", " ").alias("chunk_text"),
        F.size("ch.chunk_toks").cast("long").alias("n_chunk_tokens"),
    )


_DECON_EVAL = f"{duck_hash64('CAST(doc_id AS VARCHAR)')} % 19 = 0"


@query(
    "decontaminate_docs",
    oracle=f"""
    WITH toks AS {_TOKS},
    sh AS (SELECT doc_id, list_distinct({_duck_shingles(5)}) AS sh,
                  {_DECON_EVAL} AS is_eval
           FROM toks),
    eval_sh AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE is_eval),
    train AS (SELECT doc_id, sh FROM sh WHERE NOT is_eval),
    tr_ex AS (SELECT doc_id, unnest(sh) AS s FROM train),
    ov AS (SELECT doc_id, COUNT(*) AS n_overlap
           FROM tr_ex JOIN eval_sh USING (s) GROUP BY 1)
    SELECT t.doc_id,
           CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
           COALESCE(ov.n_overlap, 0) >= 1 AS contaminated
    FROM train t LEFT JOIN ov ON ov.doc_id = t.doc_id
    """,
)
def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data decontamination (X54): flag every training document
    sharing a 5-gram shingle with the held-out eval slice (a
    deterministic ~5% hash split stands in for a benchmark corpus).

    Scale: the eval shingle set broadcasts (benchmarks are tiny), the
    training corpus scans once with zero replication, and only matching
    (doc, shingle) rows shuffle into the per-doc overlap count — a clean
    100 TB corpus costs one scan. See operators/decontaminate.py."""
    from seng550_a3_etl_spark.operators.decontaminate import decontaminate

    t = load_tables(spark, sf_dir)
    is_eval = hash64(F.col("doc_id").cast("string")) % 19 == 0
    return decontaminate(
        t.documents.filter(~is_eval),
        t.documents.filter(is_eval),
        "doc_id",
        "text",
        "text",
        n=5,
        min_overlap=1,
    )


FUZZY_DECON_THRESHOLD = 0.5


def _duck_is_eval(col: str) -> str:
    return f"{duck_hash64(f'CAST({col} AS VARCHAR)')} % 19 = 0"


@query(
    "fuzzy_decontaminate_docs",
    oracle=f"""
    WITH sets_ AS (SELECT * FROM {_DUCK_SETS3} WHERE len(sh) > 0),
    sig AS (SELECT doc, sh,
                   {duck_minhash_signature('sh', MINHASH_NUM_PERM)} AS sig
            FROM sets_),
    banded AS ({_duck_minhash_bands(MINHASH_NUM_PERM, MINHASH_BANDS)}),
    cand AS (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM banded a JOIN banded b USING (band, key)
      WHERE a.doc < b.doc
    ),
    ver AS (
      SELECT doc_a, doc_b,
             len(list_intersect(sa.sh, sb.sh))
               / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
               AS jaccard
      FROM cand
      JOIN sets_ sa ON sa.doc = doc_a
      JOIN sets_ sb ON sb.doc = doc_b
      WHERE len(list_intersect(sa.sh, sb.sh))
            / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
            >= {FUZZY_DECON_THRESHOLD}
    ),
    split AS (
      SELECT CASE WHEN ea THEN doc_b ELSE doc_a END AS doc_id,
             CASE WHEN ea THEN doc_a ELSE doc_b END AS eval_doc,
             jaccard
      FROM (SELECT *, {_duck_is_eval('doc_a')} AS ea,
                      {_duck_is_eval('doc_b')} AS eb
            FROM ver)
      WHERE ea != eb
    )
    SELECT doc_id, n_eval_dups, best_jaccard, best_eval_doc FROM (
      SELECT doc_id, eval_doc AS best_eval_doc, jaccard AS best_jaccard,
             CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT)
               AS n_eval_dups,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY jaccard DESC, eval_doc
             ) AS rn
      FROM split
    ) WHERE rn = 1
    """,
)
def fuzzy_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination (X167): flag training docs NEAR-duplicating
    a held-out eval doc at 3-gram Jaccard >= 0.5, found via the
    MinHash-LSH band index instead of X54's exact shingle intersection —
    the GPT-3/Pile-style guard against paraphrased or partially-edited
    benchmark leakage that exact n-gram matching misses (and the same
    hash split as X54, so the two gates grade the same eval slice).
    One row per contaminated training doc: how many eval docs it
    collides with, the best Jaccard, and the matched eval doc
    (tie -> smallest id).

    Scale: rides the SAME signature/band build the dedup family uses
    (session-cached shingle sets; band keyspace sized by the r6 rule) —
    candidates are bucket-bounded, never all-pairs; the cross-side
    filter and per-doc argmax fold move only verified pairs. At the
    0.5 threshold the 4x2 band index's candidate recall is the
    documented LSH S-curve point (~68% per the (1-(1-j^2)^4) curve) —
    raise bands for a production decontamination sweep; the oracle
    replays the identical construction either way."""
    t = load_tables(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        t.documents, "doc_id", "text", n=3, num_perm=MINHASH_NUM_PERM,
        bands=MINHASH_BANDS, threshold=FUZZY_DECON_THRESHOLD,
        shingle_sets=_shingle_sets_df(spark, sf_dir, n=3, hashed=False),
        signatures=_minhash_sigs_df(spark, sf_dir),
    )
    ea = hash64(F.col("doc_a").cast("string")) % 19 == 0
    eb = hash64(F.col("doc_b").cast("string")) % 19 == 0
    split = (
        pairs.withColumn("__ea", ea)
        .withColumn("__eb", eb)
        .filter(F.col("__ea") != F.col("__eb"))
        .select(
            F.when(F.col("__ea"), F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("doc_id"),
            F.when(F.col("__ea"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("eval_doc"),
            "jaccard",
        )
    )
    w_all = Window.partitionBy("doc_id")
    w_pick = w_all.orderBy(F.desc("jaccard"), F.asc("eval_doc"))
    return (
        split.select(
            "doc_id",
            F.col("eval_doc").alias("best_eval_doc"),
            F.col("jaccard").alias("best_jaccard"),
            F.count(F.lit(1)).over(w_all).cast("long").alias("n_eval_dups"),
            F.row_number().over(w_pick).alias("__rn"),
        )
        .filter(F.col("__rn") == 1)
        .select("doc_id", "n_eval_dups", "best_jaccard", "best_eval_doc")
    )


@query(
    "doc_repetition_stats",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, t, {_duck_shingles(3)} AS sh3 FROM {_TOKS}
    )
    SELECT doc_id,
           ROUND(COALESCE(
             list_max(list_transform(list_distinct(t),
                      x -> len(list_filter(t, y -> y = x))))
               / greatest(len(t), 1), 0), 6) AS top_token_frac,
           ROUND(CASE WHEN len(sh3) > 0
                      THEN 1 - len(list_distinct(sh3)) / len(sh3)
                      ELSE 0 END, 6) AS dup_3gram_frac
    FROM base
    """,
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (X55): most-frequent-token
    fraction and duplicate-3-gram fraction per document — the signals
    that catch boilerplate and internally-repeated pages. Pure per-row
    HOF expressions, zero shuffle; both fractions are single divisions
    so the doubles agree bit-for-bit cross-engine."""
    from seng550_a3_etl_spark.functions.text import repetition_stats

    t = load_tables(spark, sf_dir)
    stats = repetition_stats(tokens(F.col("text")))
    return t.documents.select(
        "doc_id",
        F.round(stats["top_token_frac"], 6).alias("top_token_frac"),
        F.round(stats["dup_3gram_frac"], 6).alias("dup_3gram_frac"),
    )


def _pii_oracle() -> str:
    from seng550_a3_etl_spark.functions.text import PII_PATTERNS

    expr = (
        "text || ' contact u' || CAST(doc_id AS VARCHAR) "
        "|| '@mail.example.org or 10.0.' || CAST(doc_id % 256 AS VARCHAR) "
        "|| '.7 tel 555-123-4567'"
    )
    for pattern, token in PII_PATTERNS:
        # escape single quotes so a future pattern containing one cannot
        # break or alter the oracle SQL (same hazard class check_rules
        # fixed for rule names)
        p, tk = pattern.replace("'", "''"), token.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{tk}', 'g')"
    return f"SELECT doc_id, {expr} AS redacted FROM documents"


@query("pii_redacted_docs", oracle=_pii_oracle())
def pii_redacted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (X56): emails, IPv4s, and phone-shaped numbers
    replaced with typed placeholders. The fixture text carries no PII, so
    the query plants a deterministic synthetic contact line per document
    and redacts it — the oracle replays both the planting and the
    scrubbing, so every pattern is value-checked end to end.

    Scale: chained regexp_replace in one projection — per-row, JVM-side,
    zero shuffle, pipelined into whatever scan feeds it."""
    from seng550_a3_etl_spark.functions.text import redact_pii

    t = load_tables(spark, sf_dir)
    synth = F.concat(
        F.col("text"),
        F.lit(" contact u"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.org or 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 tel 555-123-4567"),
    )
    return t.documents.select(
        "doc_id", redact_pii(synth).alias("redacted")
    )


@query(
    "fuzzy_dup_pairs",
    oracle=f"""
    WITH toks AS {_TOKS},
    fp AS (
      SELECT doc_id, text,
             list_aggregate(list_transform({_duck_shingles(5)},
                            s -> {duck_hash64('s')}), 'min') AS fp
      FROM toks
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev
    FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
    WHERE a.fp IS NOT NULL
      AND levenshtein(a.text, b.text)
            <= 0.2 * greatest(length(a.text), length(b.text))
    """,
)
def fuzzy_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup verification (X57): candidate pairs from
    shared content fingerprints (min-shingle-hash — the cheap first-pass
    grouping key), verified by Levenshtein distance ≤ 20% of the longer
    text. The string-similarity complement to the set-based (Jaccard)
    and bit-based (SimHash) dedup tiers.

    Scale: candidates come from ONE groupBy on the fingerprint (never an
    all-pairs join); texts for the surviving pairs are fetched by a
    single melt-join pass over the corpus, so the quadratic Levenshtein
    only ever runs on fingerprint-collision pairs."""
    from seng550_a3_etl_spark.operators.text_dedup import bucket_pairs
    from seng550_a3_etl_spark.plans.layout import spread_for_cpu

    t = load_tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "text")
    # fingerprinting is a tokenize+shingle+min-hash HOF chain in the
    # scan stage; the fixture parquet scans as 1-2 splits (r11 stage
    # profile: 8.8x for 10x rows on 2 of 32 cores) — spread restores
    # scan parallelism, no-op when splits >= cores. The null-fp guard
    # is the scan-cheap token-count precondition (fp is null exactly
    # when there is no 5-shingle); written as fp.isNotNull() it pushed
    # the WHOLE fingerprint chain into the scan's DataFilters, before
    # the spread and computed twice (the X216/X222 pathology).
    fps = spread_for_cpu(
        docs.filter(F.size(tokens(F.col("text"))) >= 5)
    ).select(
        "doc_id",
        doc_fingerprint(tokens(F.col("text")), n=5).alias("fp"),
    )
    cand = (
        bucket_pairs(fps, ["fp"], F.col("doc_id"))
        .toDF("doc_a", "doc_b")
        .distinct()
    )
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
    return paired.filter(
        lev <= 0.2 * F.greatest(F.length("ta"), F.length("tb"))
    ).select(
        F.col("__pair.doc_a").alias("doc_a"),
        F.col("__pair.doc_b").alias("doc_b"),
        lev.cast("long").alias("lev"),
    )


@query(
    "source_curation_report",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source, len(t) AS n_tok,
             CAST(ROUND((
               least(len(t) / 100.0, 1.0) * 0.25
               + (len(list_distinct(t)) / greatest(len(t), 1)) * 0.25
               + least(((length(text) - (len(t) - 1)) / greatest(len(t), 1))
                       / 8.0, 1.0) * 0.25
               + least(({_duck_marker('en')} / greatest(len(t), 1)) * 10.0,
                       1.0) * 0.25
             ) * 1000000) AS BIGINT) AS q_micros
      FROM (SELECT doc_id, text, source,
                   string_split_regex(text, '\\s+') AS t
            FROM documents)
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(q_micros) AS BIGINT) AS total_quality_micros
    FROM scored GROUP BY source
    """,
)
def source_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation rollup (X61): document count, token volume,
    and summed quality per origin — the report that decides which
    domains/sources to keep, cap, or drop. Quality is quantized to
    integer micro-units BEFORE summing so the aggregate is exact in any
    summation order (float sums are order-dependent; integer sums are
    not) — the cross-engine-determinism pattern used for money columns.

    Scale: per-row scoring in the scan + one partial+final aggregate on
    the source key; the report size is |sources|, not |docs|."""
    t = load_tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    q_micros = F.round(
        quality_score(F.col("text"), toks) * 1_000_000
    ).cast("long")
    return (
        t.documents.select(
            "source",
            F.size(toks).cast("long").alias("n_tok"),
            q_micros.alias("q_micros"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.sum("q_micros").cast("long").alias("total_quality_micros"),
        )
    )


@query(
    "seq_packed_chunks",
    oracle=rf"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
    ),
    ch AS (
      SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
             CAST(least(len(t), chunk_id * 16 + 16) - chunk_id * 16
                  AS BIGINT) AS n_tok
      FROM (SELECT doc_id, t,
                   unnest(range(0, CAST(ceil(len(t) / 16.0) AS BIGINT)))
                     AS chunk_id
            FROM toks WHERE len(t) > 0)
    ),
    sh AS (
      SELECT {duck_hash64("CAST(doc_id AS VARCHAR)", seed=17)} % 8 AS shard,
             doc_id, chunk_id, n_tok,
             ROW_NUMBER() OVER (
               PARTITION BY {duck_hash64("CAST(doc_id AS VARCHAR)", seed=17)} % 8
               ORDER BY doc_id, chunk_id) AS rn
      FROM ch
    ),
    pack(shard, rn, doc_id, chunk_id, n_tok, seq_id, seq_fill) AS (
      SELECT shard, rn, doc_id, chunk_id, n_tok,
             CAST(0 AS BIGINT), n_tok
      FROM sh WHERE rn = 1
      UNION ALL
      SELECT s.shard, s.rn, s.doc_id, s.chunk_id, s.n_tok,
             CASE WHEN p.seq_fill + s.n_tok > 48
                  THEN p.seq_id + 1 ELSE p.seq_id END,
             CASE WHEN p.seq_fill + s.n_tok > 48
                  THEN s.n_tok ELSE p.seq_fill + s.n_tok END
      FROM pack p JOIN sh s ON s.shard = p.shard AND s.rn = p.rn + 1
    )
    SELECT shard, doc_id, chunk_id, n_tok, seq_id, seq_fill FROM pack
    """,
)
def seq_packed_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (X63): 16-token chunks greedily packed
    into 48-token sequences per hash shard — the sample-packing step
    between curation and training export. The greedy fill is a linear
    recurrence no built-in window expresses (the running sum resets
    conditionally on its own value), so it runs as an Arrow-batched
    grouped-map (operators/packing.py) — and the DuckDB oracle replays
    the same recurrence with WITH RECURSIVE, keeping even this custom
    stateful operator fully value-checked.

    Scale: one shuffle on the shard key, O(n) per-shard fill, one
    integer of state per shard; shard count is the parallelism knob."""
    from seng550_a3_etl_spark.operators.packing import pack_sequences

    t = load_tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    chunks = (
        t.documents.select(
            "doc_id", F.explode(token_chunks(toks, 16)).alias("ch")
        )
        .select(
            (hash64(F.col("doc_id").cast("string"), seed=17) % 8).alias(
                "shard"
            ),
            "doc_id",
            F.col("ch.chunk_id").alias("chunk_id"),
            F.size("ch.chunk_toks").cast("long").alias("n_tok"),
        )
    )
    return pack_sequences(
        chunks, "shard", ["doc_id", "chunk_id"], "n_tok", capacity=48
    )


from seng550_a3_etl_spark.suite.shared_sql import (  # noqa: E402
    INCR_DEDUP_ORACLE as _INCR_DEDUP_ORACLE,
)


@query("incremental_exact_dedup", oracle=_INCR_DEDUP_ORACLE)
def incremental_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup (X64): a new document batch (a ~20%
    hash split stands in for today's crawl) checked against the hash
    index of the EXISTING corpus — each new doc resolves to the known
    canonical id when its content hash already exists, else to itself.

    Scale: this is the shape that makes daily ingestion O(batch), not
    O(corpus): the corpus is touched only through its (hash, canonical)
    index — in production a bucketed/persisted table maintained by
    merge_upsert, so the daily cost is one scan of the batch plus an
    index join (broadcast when the batch's hash set is small, bucketed
    co-located join otherwise), never a rescan of 100 TB of text."""
    t = load_tables(spark, sf_dir)
    is_new = hash64(F.col("doc_id").cast("string"), seed=23) % 5 == 0
    corpus = t.documents.filter(~is_new)
    index = (
        corpus.select("doc_id", F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("canonical_id"))
    )
    batch = t.documents.filter(is_new).select(
        "doc_id", F.md5("text").alias("h")
    )
    return batch.join(index, "h", "left").select(
        "doc_id",
        F.coalesce("canonical_id", "doc_id").alias("canonical_id"),
        F.col("canonical_id").isNotNull().alias("known_content"),
    )


def _evict_stopped_sessions(cache: dict) -> None:
    """Drop cache entries whose owning SparkSession has been stopped
    (ADVICE r4): a stopped session's localCheckpoint blocks are gone and
    the DataFrame is unusable, so keeping the entry only pins memory in
    long-lived processes (e.g. pytest runs spanning many sessions)."""
    for key, df in list(cache.items()):
        try:
            sc = df.sparkSession.sparkContext
            stopped = sc._jsc is None or sc._jsc.sc().isStopped()
        except Exception:
            stopped = True
        if stopped:
            del cache[key]


_LABELS_CACHE: dict[tuple[str, str], DataFrame] = {}

# (applicationId, sf_dir, n, representation) -> materialized (doc, sh).
_SHINGLE_CACHE: dict[tuple[str, str, int, str], DataFrame] = {}


def _shingle_sets_df(
    spark: SparkSession, sf_dir: str, n: int = 3, hashed: bool = True
) -> DataFrame:
    """(doc, sh) distinct n-gram shingle sets over ``documents`` —
    computed ONCE per (Spark application, sf_dir, n, representation) and
    shared by every near-dup consumer (ngram_dup_pairs /
    prefix_filter_dup_pairs / doc_novelty_frac / the dup-cluster label
    build use the hashed form; minhash_dup_pairs needs string shingles
    because its oracle replays the md5 signature math over the text).

    Same rationale as ``_labels_df``: at 100 TB the shingle table is a
    materialized artifact written by one job (the plans/gold.py shape)
    and consumed by the whole dedup family; ``localCheckpoint`` is the
    session-scoped analog. Docs with fewer than n tokens (empty sets)
    are excluded — they can't participate in any pair and every consumer
    treats absence and empty identically."""
    from seng550_a3_etl_spark.functions.text import hashed_shingles, shingles

    _evict_stopped_sessions(_SHINGLE_CACHE)
    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        n,
        "hashed" if hashed else "string",
    )
    cached = _SHINGLE_CACHE.get(key)
    if cached is not None:
        return cached

    t = load_tables(spark, sf_dir)
    make = hashed_shingles if hashed else shingles
    out = (
        t.documents.select(
            F.col("doc_id").alias("doc"),
            F.array_distinct(make(tokens(F.col("text")), n)).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .localCheckpoint(eager=True)
    )
    _SHINGLE_CACHE[key] = out
    return out


_MINHASH_SIG_CACHE: dict[tuple[str, str], DataFrame] = {}


def _minhash_sigs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc, sig) 8-perm MinHash signatures over the session shingle
    sets — computed ONCE per (Spark application, sf_dir) and shared by
    every MinHash consumer (X3 pairs, X86 decontamination, X204 source
    overlap, X124 estimate quality, X109 incremental index, X216's
    streaming index; the dedup censuses ride X3). Before r15 each re-ran
    the 8 per-shingle min-aggregates. Same gold-table rationale as
    ``_shingle_sets_df``; bench.py evicts + times the build as its own
    [1x, 10x, ratio] row ("minhash_signatures")."""
    from seng550_a3_etl_spark.functions.hashing import minhash_signatures

    _evict_stopped_sessions(_MINHASH_SIG_CACHE)
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _MINHASH_SIG_CACHE.get(key)
    if cached is not None:
        return cached
    sets_ = _shingle_sets_df(spark, sf_dir, n=3, hashed=False)
    out = minhash_signatures(
        sets_, "doc", F.col("sh"), MINHASH_NUM_PERM
    ).localCheckpoint(eager=True)
    _MINHASH_SIG_CACHE[key] = out
    return out


def _labels_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, canonical_id) dup-cluster labels — computed ONCE per
    (Spark application, sf_dir) and shared by every consumer
    (dup_clusters / cluster_best_doc / leakage_free_split).

    At 100 TB cluster labels are a materialized artifact — computed by
    one job and persisted (the plans/gold.py shape), then consumed by
    survivor selection, splitting, and reporting without re-running the
    pair scan + connected components. ``localCheckpoint(eager=True)`` is
    the session-scoped analog of that gold write: the label rows (two
    longs per document — tiny relative to the text) materialize on first
    use and the subgraph never recomputes; lineage truncation also keeps
    downstream plans independent of the iterative CC job."""
    _evict_stopped_sessions(_LABELS_CACHE)
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _LABELS_CACHE.get(key)
    if cached is not None:
        return cached

    from seng550_a3_etl_spark.operators.graph import connected_components

    t = load_tables(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        t.documents, "doc_id", "text", n=3, threshold=0.8,
        max_shingle_freq=64,
        shingle_sets=_shingle_sets_df(spark, sf_dir, n=3, hashed=True),
    ).select("doc_a", "doc_b")
    labels = connected_components(pairs, "doc_a", "doc_b").withColumnRenamed(
        "node", "doc_id"
    )
    out = (
        t.documents.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("label", F.col("doc_id")).cast("long").alias(
                "canonical_id"
            ),
        )
        .localCheckpoint(eager=True)
    )
    _LABELS_CACHE[key] = out
    return out


def _cluster_best_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    return f"""
    WITH labels AS ({ORACLES["dup_clusters"]}),
    q AS (
      SELECT doc_id,
             CAST(ROUND((
               least(len(t) / 100.0, 1.0) * 0.25
               + (len(list_distinct(t)) / greatest(len(t), 1)) * 0.25
               + least(((length(text) - (len(t) - 1)) / greatest(len(t), 1))
                       / 8.0, 1.0) * 0.25
               + least(({_duck_marker('en')} / greatest(len(t), 1)) * 10.0,
                       1.0) * 0.25
             ) * 1000000) AS BIGINT) AS q_micros
      FROM (SELECT doc_id, text, string_split_regex(text, '\\s+') AS t
            FROM documents)
    )
    SELECT canonical_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MAX(struct_pack(q := q_micros, d := doc_id)).q AS BIGINT)
             AS best_q_micros,
           CAST(MAX(struct_pack(q := q_micros, d := doc_id)).d AS BIGINT)
             AS best_doc_id
    FROM labels JOIN q USING (doc_id)
    GROUP BY canonical_id
    """


@query("cluster_best_doc", oracle=_cluster_best_oracle())
def cluster_best_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-based dedup survivor selection (X70): within each near-dup
    cluster keep the HIGHEST-quality document (min-id is the usual
    arbitrary canonical; real curation keeps the best copy). The argmax
    is a struct-max aggregate — (quality_micros, doc_id) lexicographic,
    so ties break on the larger doc_id — folding map-side to one row per
    cluster, never a per-row window sort."""
    labels = _labels_df(spark, sf_dir)
    t = load_tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    q = t.documents.select(
        "doc_id",
        F.round(quality_score(F.col("text"), toks) * 1_000_000)
        .cast("long")
        .alias("q_micros"),
    )
    best = F.max(F.struct(F.col("q_micros"), F.col("doc_id")))
    return (
        labels.join(q, "doc_id")
        .groupBy("canonical_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            best["q_micros"].alias("best_q_micros"),
            best["doc_id"].cast("long").alias("best_doc_id"),
        )
    )


def _leakage_split_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    h = duck_hash64("CAST(canonical_id AS VARCHAR)", seed=31)
    return f"""
    WITH labels AS ({ORACLES["dup_clusters"]})
    SELECT doc_id, canonical_id,
           CASE WHEN {h} % 10 < 8 THEN 'train' ELSE 'eval' END AS split
    FROM labels
    """


@query("leakage_free_split", oracle=_leakage_split_oracle())
def leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/eval split (X71): the 80/20 hash split keys on
    the dup-CLUSTER canonical id, not the document id, so near-duplicate
    documents can never straddle the boundary — the eval set cannot leak
    paraphrases of training documents. Same zero-shuffle stable-hash
    construction as X26 once labels exist; the cluster labels are the
    only shuffled stage."""
    labels = _labels_df(spark, sf_dir)
    split = F.when(
        hash64(F.col("canonical_id").cast("string"), seed=31) % 10 < 8,
        F.lit("train"),
    ).otherwise(F.lit("eval"))
    return labels.select("doc_id", "canonical_id", split.alias("split"))


_DUCK_QUALITY = f"""
             least(len(t) / 100.0, 1.0) * 0.25
               + (len(list_distinct(t)) / greatest(len(t), 1)) * 0.25
               + least(((length(text) - (len(t) - 1)) / greatest(len(t), 1))
                       / 8.0, 1.0) * 0.25
               + least(({_duck_marker('en')} / greatest(len(t), 1)) * 10.0,
                       1.0) * 0.25
"""


@query(
    "source_mix_budget",
    oracle=rf"""
    WITH toks AS (SELECT doc_id, source, text,
                         string_split_regex(text, '\s+') AS t
                  FROM documents),
    scored AS (
      SELECT doc_id, source,
             CAST(len(t) AS BIGINT) AS n_tokens,
             {_DUCK_QUALITY} AS quality,
             (CAST(regexp_extract(source, '[0-9]+') AS INT) % 3 + 1) * 1000
               AS src_budget
      FROM toks),
    sel AS (
      SELECT source, doc_id, n_tokens, src_budget,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY quality DESC, doc_id
             ) AS BIGINT) AS cum_tokens
      FROM scored)
    SELECT source, doc_id, n_tokens, cum_tokens,
           CAST(src_budget AS BIGINT) AS src_budget
    FROM sel WHERE cum_tokens <= src_budget
    """,
)
def source_mix_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture token-budget sampling (X73): every pretraining
    corpus is assembled to a TARGET MIXTURE — per-domain token budgets
    (web 60%, code 20%, ...), filled with each domain's best documents
    first. Weights here derive deterministically from the source name
    (1-3 kilotokens); selection is greedy by quality within source.

    Scale: per-row scoring in the scan (zero shuffle), then ONE shuffle
    on the source key for the per-source ordered cumulative window —
    state per group is a running sum, and the per-source sort is the
    same work a per-domain curation job already does. Domains far too
    large to sort wholesale first prune with a quality threshold (the
    curation_pipeline stage) so the window only sees plausible
    survivors."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    w_src = (
        F.regexp_extract("source", r"(\d+)", 1).cast("int") % 3 + 1
    ) * 1000
    scored = t.documents.select(
        "source",
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        quality_score(F.col("text"), toks).alias("__q"),
        w_src.cast("long").alias("src_budget"),
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("__q"), F.asc("doc_id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= F.col("src_budget"))
        .select("source", "doc_id", "n_tokens", "cum_tokens", "src_budget")
    )


@query(
    "vocab_top_tokens",
    oracle=r"""
    WITH tf AS (
      SELECT t AS token, doc_id, COUNT(*) AS cnt
      FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS t
            FROM documents)
      GROUP BY 1, 2
    ),
    vocab AS (
      SELECT token,
             CAST(SUM(cnt) AS BIGINT) AS n_total,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM tf GROUP BY 1
    )
    SELECT token, n_total, n_docs
    FROM vocab ORDER BY n_total DESC, token LIMIT 50
    """,
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary heavy hitters (X75): the top-50 tokens by
    total occurrences with their document frequencies — stopword
    discovery, tokenizer sanity checks, and the df table that TF-IDF /
    stop-shingle bounds consume.

    Scale: two hash aggregations with map-side combine — (doc, token)
    partials shrink the explode before the token-level shuffle, and the
    final top-k is a TakeOrdered over |vocab| rows, never a global
    sort of the corpus. The exact two-pass form; the bounded-memory
    Misra-Gries path for when even |vocab| overflows (shingle/URL
    domains) is X255 ``operators/sketch.mg_frequent`` — same exact
    output, (capacity+1)-per-partition shuffle instead of |domain|."""
    t = load_tables(spark, sf_dir)
    tf = (
        t.documents.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("token")
        )
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        tf.groupBy("token")
        .agg(
            F.sum("cnt").alias("n_total"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy(F.desc("n_total"), F.asc("token"))
        .limit(50)
    )


@query(
    "length_bucket_padding",
    oracle=r"""
    WITH lens AS (
      SELECT doc_id,
             CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    bucketed AS (
      SELECT CAST((n_tokens - 1) // 64 AS BIGINT) AS bucket, n_tokens
      FROM lens WHERE n_tokens > 0
    )
    SELECT bucket,
           CAST((bucket + 1) * 64 AS BIGINT) AS padded_len,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(COUNT(*) * (bucket + 1) * 64 AS BIGINT) AS padded_tokens,
           1.0 - SUM(n_tokens) / (COUNT(*) * (bucket + 1) * 64.0)
             AS waste_frac
    FROM bucketed GROUP BY bucket
    """,
)
def length_bucket_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketing padding-efficiency report (X76): group documents
    into 64-token length buckets and compute the padding waste a batch
    of each bucket pays when padded to the bucket ceiling — the report
    that decides training batch-shape policy (bucketed batching vs
    packing; X63 is the packing alternative this quantifies against).

    Scale: per-row bucket arithmetic in the scan, one partial+final agg
    over |buckets| groups (≤ max_len/64 — dozens, regardless of corpus
    size). waste_frac is a single division of exact integer sums, so
    bit-identical cross-engine."""
    t = load_tables(spark, sf_dir)
    n_tok = F.size(tokens(F.col("text"))).cast("long")
    padded = (F.col("bucket") + 1) * 64
    return (
        t.documents.select(n_tok.alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        .select(F.floor((F.col("n_tokens") - 1) / 64).alias("bucket"),
                "n_tokens")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .select(
            "bucket",
            padded.alias("padded_len"),
            "n_docs",
            "sum_tokens",
            (F.col("n_docs") * padded).alias("padded_tokens"),
            (
                1.0
                - F.col("sum_tokens")
                / (F.col("n_docs") * padded.cast("double"))
            ).alias("waste_frac"),
        )
    )


@query(
    "doc_novelty_frac",
    oracle=f"""
    WITH sets_ AS {_DUCK_SETS3},
    ex AS (SELECT doc, unnest(sh) AS s FROM sets_),
    freq AS (SELECT s, COUNT(*) AS f FROM ex GROUP BY 1)
    SELECT doc AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_sh,
           CAST(COUNT(CASE WHEN f = 1 THEN 1 END) AS BIGINT)
             AS n_corpus_unique,
           COUNT(CASE WHEN f = 1 THEN 1 END) / COUNT(*) AS novelty_frac
    FROM ex JOIN freq USING (s)
    GROUP BY doc
    """,
)
def doc_novelty_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document novelty score (X77): per document, the fraction of
    its distinct 3-gram shingles that appear NOWHERE else in the corpus
    — the across-corpus complement of the within-document repetition
    stats (X55); low novelty flags boilerplate and template farms that
    per-pair dedup misses (no single pair clears the Jaccard bar, but
    the text is corpus-wide stock phrasing).

    Scale: the same one-shuffle shape as the ngram stop-shingle bound —
    postings shuffle ONCE on the shingle hash, corpus frequency is a
    count over Window.partitionBy(hs) (spillable, no posting-list
    aggregation buffer), and the per-doc fold is the second, doc-keyed
    shuffle. novelty_frac is one integer division; docs with zero
    shingles (< n tokens) don't appear, matching the oracle join.
    Shingle identity comes from the session-shared hashed shingle sets
    (only frequency==1 counts matter, so any injective-enough hash gives
    the oracle's answer)."""
    from pyspark.sql.window import Window

    postings = _shingle_sets_df(spark, sf_dir, n=3, hashed=True).select(
        F.col("doc").alias("doc_id"), F.explode("sh").alias("hs")
    )
    with_freq = postings.withColumn(
        "f", F.count(F.lit(1)).over(Window.partitionBy("hs"))
    )
    return (
        with_freq.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.count(F.when(F.col("f") == 1, 1)).alias("n_corpus_unique"),
        )
        .select(
            "doc_id",
            "n_sh",
            "n_corpus_unique",
            (F.col("n_corpus_unique") / F.col("n_sh")).alias("novelty_frac"),
        )
    )


def _dedup_accounting_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    return rf"""
    WITH labels AS ({ORACLES["dup_clusters"]}),
    toks AS (SELECT doc_id, source,
                    CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
                      AS n_tokens
             FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS raw_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS raw_tokens,
           CAST(COUNT(CASE WHEN canonical_id = doc_id THEN 1 END) AS BIGINT)
             AS surviving_docs,
           CAST(SUM(CASE WHEN canonical_id = doc_id THEN n_tokens
                         ELSE 0 END) AS BIGINT) AS surviving_tokens,
           1.0 - SUM(CASE WHEN canonical_id = doc_id THEN n_tokens
                          ELSE 0 END) / (1.0 * SUM(n_tokens))
             AS token_loss_frac
    FROM labels JOIN toks USING (doc_id)
    GROUP BY source
    """


@query("dedup_token_accounting", oracle=_dedup_accounting_oracle())
def dedup_token_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-adjusted corpus accounting (X78): per source, raw vs
    SURVIVING docs/tokens under the keep-canonical near-dup policy —
    the report that tells a data team how much of each acquisition
    actually contributes to the training mix once global dedup runs
    (a source can lose a doc to a canonical that lives in ANOTHER
    source, which is exactly what global near-dup dedup does).

    Scale: consumes the once-per-session cluster labels (zero marginal
    subgraph cost — the gold-table shape), joins the tiny (doc_id,
    canonical) pairs to per-row token counts, and folds to |sources|
    rows in one partial+final agg. token_loss_frac divides exact
    integer sums."""
    labels = _labels_df(spark, sf_dir)
    t = load_tables(spark, sf_dir)
    toks = t.documents.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    surv_tok = F.sum(
        F.when(F.col("canonical_id") == F.col("doc_id"), F.col("n_tokens"))
        .otherwise(F.lit(0))
    )
    return (
        labels.join(toks, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("raw_docs"),
            F.sum("n_tokens").alias("raw_tokens"),
            F.count(
                F.when(F.col("canonical_id") == F.col("doc_id"), 1)
            ).alias("surviving_docs"),
            surv_tok.alias("surviving_tokens"),
        )
        .select(
            "source",
            "raw_docs",
            "raw_tokens",
            "surviving_docs",
            "surviving_tokens",
            (
                1.0
                - F.col("surviving_tokens")
                / (1.0 * F.col("raw_tokens"))
            ).alias("token_loss_frac"),
        )
    )


@query(
    "source_quality_calibration",
    oracle=rf"""
    WITH toks AS (SELECT doc_id, source, text,
                         string_split_regex(text, '\s+') AS t
                  FROM documents),
    scored AS (
      SELECT doc_id, source, {_DUCK_QUALITY} AS quality FROM toks
    )
    SELECT doc_id, source, ROUND(quality, 6) AS quality,
           PERCENT_RANK() OVER (
             PARTITION BY source ORDER BY quality, doc_id
           ) AS calibrated
    FROM scored
    """,
)
def source_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality calibration (X81): raw quality scores are not
    comparable across sources (a mediocre academic page outscores a
    good forum post), so mixture selection ranks WITHIN source —
    percent_rank maps every doc to its source-relative quantile, and
    cross-source thresholds ("keep the top 30% of each domain") become
    meaningful. The standard fix before X73's budget fill.

    Scale: one shuffle on the source key; percent_rank is
    (rank-1)/(n-1) — two integers and one division, bit-identical
    cross-engine, ordered on the raw double quality (identical IEEE
    sequence both engines) with doc_id tie-break."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    scored = t.documents.select(
        "doc_id",
        "source",
        quality_score(F.col("text"), toks).alias("__q"),
    )
    w = Window.partitionBy("source").orderBy(F.asc("__q"), F.asc("doc_id"))
    return scored.select(
        "doc_id",
        "source",
        F.round("__q", 6).alias("quality"),
        F.percent_rank().over(w).alias("calibrated"),
    )


@query(
    "doc_overlap_chunks",
    oracle=r"""
    WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS t
                  FROM documents),
    ch AS (SELECT doc_id, t,
                  unnest(range(0,
                    1 + CAST(ceil(greatest(len(t) - 16, 0) / 12.0) AS BIGINT)
                  )) AS chunk_id
           FROM toks WHERE len(t) > 0)
    SELECT doc_id,
           CAST(chunk_id AS INT) AS chunk_id,
           array_to_string(t[chunk_id * 12 + 1 : chunk_id * 12 + 16], ' ')
             AS chunk_text,
           CAST(least(len(t), chunk_id * 12 + 16) - chunk_id * 12 AS BIGINT)
             AS n_chunk_tokens
    FROM ch
    """,
)
def doc_overlap_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (strided) context chunks (X83): windows of 16 tokens
    every 12 (4-token overlap) — the RAG-retrieval chunking shape, where
    overlap keeps sentences that straddle a boundary retrievable from
    both sides (plain X30 chunking loses them). Chunk count per doc is
    1 + ceil(max(n-size,0)/stride); the final window is the (possibly
    short) remainder.

    Scale: identical to X30 — per-row sequence+slice array math, one
    explode, ZERO shuffle; the 16/12 here are fixture-sized stand-ins
    for 512/384."""
    t = load_tables(spark, sf_dir)
    size, stride = 16, 12
    n = F.size(F.col("__t"))
    n_chunks = 1 + F.ceil(
        F.greatest(n - size, F.lit(0)) / F.lit(float(stride))
    ).cast("int")
    chunked = (
        t.documents.select("doc_id", tokens(F.col("text")).alias("__t"))
        .filter(F.size("__t") > 0)
        .select(
            "doc_id",
            "__t",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
    )
    piece = F.slice(F.col("__t"), F.col("chunk_id") * stride + 1, size)
    return chunked.select(
        "doc_id",
        "chunk_id",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
    )


def _prefix_pairs_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    return ORACLES["ngram_dup_pairs"]


@query("prefix_filter_dup_pairs", oracle=_prefix_pairs_oracle())
def prefix_filter_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact similarity join (X86, SSJoin/PPJoin
    family): candidates come from an equi-join on each document's
    RAREST ``|s| - ceil(t|s|) + 1`` shingles under a global
    frequency order — any pair with Jaccard >= t provably shares one —
    so stop-shingles never generate candidates and the result is EXACT
    with no frequency-cap approximation. The oracle is deliberately the
    ngram_dup_pairs SQL: identical output is the correctness proof of
    the prefix construction (same pairs, same intersections, same
    Jaccards)."""
    from seng550_a3_etl_spark.operators.text_dedup import prefix_filter_pairs

    t = load_tables(spark, sf_dir)
    return prefix_filter_pairs(
        t.documents, "doc_id", "text", n=3, threshold=0.8,
        shingle_sets=_shingle_sets_df(spark, sf_dir, n=3, hashed=True),
    )


@query(
    "unigram_logprob_quality",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
      FROM documents
    ),
    freq AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
    tot AS (SELECT SUM(cnt) AS n FROM freq)
    SELECT tok.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(LN(freq.cnt / tot.n)), 6) AS avg_logp
    FROM tok, freq, tot
    WHERE tok.token = freq.token
    GROUP BY tok.doc_id
    """,
)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score (X87): each document's mean
    log-probability under a unigram LM fit on the corpus itself — the
    CCNet/RedPajama-style perplexity-proxy filter (docs whose tokens are
    systematically rare under the corpus distribution score low and are
    candidates for dropping or down-weighting). Self-trained, so fully
    deterministic and oracle-checkable.

    Scale: the model table is |vocab| rows — orders of magnitude
    smaller than the corpus — so the scoring join broadcasts the model
    to the exploded token stream (no corpus shuffle), and the per-doc
    mean partial-aggregates map-side before the single doc_id shuffle.
    The frequency build itself is one hash aggregation with map-side
    combine. At 100 TB the only change is capping |vocab| (top-K by
    count) so the broadcast stays bounded; natural-language vocabularies
    make the cap a no-op at sf0.1.
    """
    t = load_tables(spark, sf_dir)
    tok = t.documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("n"))
    model = freq.crossJoin(F.broadcast(total)).select(
        "token", F.log(F.col("cnt") / F.col("n")).alias("logp")
    )
    return (
        tok.join(F.broadcast(model), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("logp"), 6).alias("avg_logp"),
        )
    )


@query(
    "corpus_zipf_stats",
    oracle=r"""
    WITH tok AS (
      SELECT unnest(string_split_regex(text, '\s+')) AS token FROM documents
    ),
    freq AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
    top AS (
      SELECT cnt,
             row_number() OVER (ORDER BY cnt DESC, token ASC) AS r
      FROM freq ORDER BY cnt DESC, token ASC LIMIT 1000
    ),
    fit AS (
      SELECT ROUND(regr_slope(LN(cnt), LN(r)), 6) AS zipf_slope,
             ROUND(regr_r2(LN(cnt), LN(r)), 6) AS zipf_r2,
             CAST(COUNT(*) AS BIGINT) AS n_fit_terms
      FROM top
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             ROUND(AVG(CASE WHEN cnt = 1 THEN 1.0 ELSE 0.0 END), 6)
               AS hapax_frac
      FROM freq
    )
    SELECT n_types, n_tokens, hapax_frac, n_fit_terms, zipf_slope, zipf_r2
    FROM stats, fit
    """,
)
def corpus_zipf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary-health diagnostic (X88): type count, total
    token count, hapax-legomena fraction, and a least-squares Zipf fit
    (slope + R² of log-frequency on log-rank over the top 1000 types).
    A natural-language corpus fits Zipf with slope ≈ −1; a corpus
    poisoned by boilerplate, template spam, or tokenizer breakage
    bends away from it — this is the one-row monitor a pretraining
    pipeline alarms on.

    Scale: one token hash-aggregation (map-side combined), then the
    rank is assigned only to the top-1000 rows, fetched via
    TakeOrdered (orderBy+limit — never a global sort of |vocab|), so
    the single-partition window is over exactly 1000 rows. The fit
    itself is Spark's built-in ``regr_slope``/``regr_r2`` aggregates.
    """
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    tok = t.documents.select(F.explode(tokens(F.col("text"))).alias("token"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    stats = freq.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("cnt").alias("n_tokens"),
        F.round(F.avg((F.col("cnt") == 1).cast("double")), 6).alias(
            "hapax_frac"
        ),
    )
    top = freq.orderBy(F.desc("cnt"), F.asc("token")).limit(1000)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    ranked = top.select(
        F.log("cnt").alias("y"),
        F.log(F.row_number().over(w).cast("double")).alias("x"),
    )
    fit = ranked.agg(
        F.round(F.regr_slope("y", "x"), 6).alias("zipf_slope"),
        F.round(F.regr_r2("y", "x"), 6).alias("zipf_r2"),
        F.count(F.lit(1)).alias("n_fit_terms"),
    )
    return stats.crossJoin(F.broadcast(fit))


_SPAN_K = 8  # window length in tokens (fixture-sized stand-in for ~50)


_ANCHOR_CACHE: dict[tuple[str, str], DataFrame] = {}


def _anchor_instances_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(h, doc, cnt) — per-document instance counts of every hashed
    K=8-token window over documents, computed ONCE per (Spark
    application, sf_dir) and shared by X89 dup_span_stats, the X199
    anchor stop-list census, and X208's streaming substring-guard
    index, which each re-ran the tokenize->shingle->hash explode and
    its first shuffle before r15. Same gold-table rationale as
    ``_shingle_sets_df``; bench.py evicts + times the build as its own
    [1x, 10x, ratio] row ("anchor_instances")."""
    from seng550_a3_etl_spark.functions.text import shingles
    from seng550_a3_etl_spark.plans.layout import spread_for_cpu

    _evict_stopped_sessions(_ANCHOR_CACHE)
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _ANCHOR_CACHE.get(key)
    if cached is not None:
        return cached
    t = load_tables(spark, sf_dir)
    docs = spread_for_cpu(t.documents).select(
        F.col("doc_id").alias("doc"), tokens(F.col("text")).alias("__tk")
    )
    wins = docs.filter(F.size("__tk") >= _SPAN_K).select(
        "doc",
        F.explode(
            F.transform(shingles(F.col("__tk"), _SPAN_K), lambda c: hash64(c))
        ).alias("h"),
    )
    out = (
        wins.groupBy("h", "doc")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    _ANCHOR_CACHE[key] = out
    return out


@query(
    "dup_span_stats",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents
    ),
    wins AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len(tk) - {_SPAN_K - 1}, 0) + 1),
               i -> {duck_hash64(f"array_to_string(tk[i:i+{_SPAN_K - 1}], ' ')")}
             )) AS h
      FROM d
    ),
    shared AS (
      SELECT h FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    dupc AS (
      SELECT doc_id, COUNT(*) AS n_dup FROM wins JOIN shared USING (h)
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(greatest(len(tk) - {_SPAN_K - 1}, 0) AS BIGINT) AS n_windows,
           CAST(COALESCE(n_dup, 0) AS BIGINT) AS n_dup_windows,
           ROUND(COALESCE(n_dup, 0)
                 / NULLIF(greatest(len(tk) - {_SPAN_K - 1}, 0), 0),
                 6) AS dup_frac
    FROM d LEFT JOIN dupc USING (doc_id)
    """,
)
def dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span detection (X89): for every overlapping
    K-token window position (K=8 here, the fixture-sized stand-in for
    the ~50-token spans the literature uses), test whether that exact
    token span also occurs in at least one OTHER document, and report
    per document the fraction of window positions covered by such
    cross-document spans. Thin wrapper over
    ``operators.text_dedup.dup_span_stats`` (unit-tested on crafted
    span collisions). This is the substring-granularity dedup signal from the
    exact-substring training-data dedup literature — documents that are
    not near-duplicates of any single document can still be largely
    assembled from boilerplate spans, and doc-level Jaccard (X2/X3)
    never sees it. Pipelines drop or trim docs with high dup_frac.

    Scale: windows are just K-shingles (the zip-with shingle
    builder, per-row, zero shuffle), hashed before they ever shuffle —
    the posting aggregation groups 60-bit longs, never span strings.
    Two shuffles total, both on the window hash: one distinct-doc count
    (map-side combined), one hash join back to positions (the shared-set
    side at web scale is large, so no broadcast is claimed), then the
    per-doc fold partial-aggregates map-side. Window count per doc is
    arithmetic on the token count, so docs with no duplicated span cost
    the left join only a key lookup."""
    from seng550_a3_etl_spark.operators.text_dedup import dup_span_stats as op

    t = load_tables(spark, sf_dir)
    return op(
        t.documents, "doc_id", "text", k=_SPAN_K,
        instances=_anchor_instances_df(spark, sf_dir),
    )


# Canonicalization shared by the Spark query and its DuckDB oracle: both
# engines lowercase, strip every char outside [a-z0-9\s], and collapse
# runs of whitespace — constructs with identical Java-regex/RE2 meaning
# (the X56 PII-redaction compatibility rule).
_NORM_STRIP = r"[^a-z0-9\s]"
_NORM_WS = r"\s+"


def _spark_norm(col: Column) -> Column:
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), _NORM_STRIP, ""), _NORM_WS, " "
        )
    )


_DUCK_NORM = (
    "trim(regexp_replace(regexp_replace(lower({col}), "
    rf"'{_NORM_STRIP}', '', 'g'), '{_NORM_WS}', ' ', 'g'))"
)


@query(
    "normalized_exact_dedup",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, md5({_DUCK_NORM.format(col="text")}) AS h,
             md5(text) AS raw_h
      FROM documents
    ),
    groups AS (
      SELECT h, MIN(doc_id) AS canonical_id, COUNT(*) AS group_size,
             COUNT(DISTINCT raw_h) AS n_raw_variants
      FROM norm GROUP BY h
    )
    SELECT n.doc_id, g.canonical_id, g.group_size,
           g.n_raw_variants
    FROM norm n JOIN groups g USING (h)
    """,
)
def normalized_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalized exact dedup (X91): exact dedup after text
    normalization (lowercase, punctuation stripped, whitespace
    collapsed) — the standard rung between byte-exact dedup (X1) and
    probabilistic near-dup (X3): it catches trivially-reformatted
    copies (case changes, punctuation-only edits, re-wrapped lines)
    deterministically, with no similarity threshold to tune.
    ``n_raw_variants`` counts distinct RAW byte contents inside each
    normalized group — >1 means the normalization, not byte equality,
    did the merging (the monitoring signal for how much reformatting
    the corpus carries).

    Scale: identical to X1 — the normalization is three codegen'd
    string ops in the scan, then ONE (hash, id) shuffle; text never
    shuffles. The distinct-raw-variant count piggybacks on the same
    aggregation as a count-distinct over 128-bit digests, not texts.
    The scan is spread to core count first (``spread_for_cpu``,
    metadata-only no-op at production split counts): the two regex
    passes are the CPU-bound cost, and a single-row-group fixture file
    otherwise pins them to one core (r9 sf1 spot graded 16.8×
    "superlinear" for exactly this under-parallel-scan reason — the
    operator itself is one linear pass + one hash shuffle).
    Thin wrapper over ``operators.text_dedup.canonical_dedup``."""
    from seng550_a3_etl_spark.operators.text_dedup import canonical_dedup
    from seng550_a3_etl_spark.plans.layout import spread_for_cpu

    t = load_tables(spark, sf_dir)
    return canonical_dedup(
        spread_for_cpu(t.documents), "doc_id", "text", _spark_norm
    )


def _psi_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    return f"""
    WITH dq AS ({ORACLES["doc_lang_quality"]}),
    d AS (
      SELECT d0.source,
             LEAST(CAST(FLOOR(dq.quality * 10) AS INT), 9) AS bucket
      FROM dq JOIN documents d0 USING (doc_id)
    ),
    sb AS (SELECT source, bucket, COUNT(*) AS c FROM d GROUP BY 1, 2),
    srcs AS (SELECT source, COUNT(*) AS ns FROM d GROUP BY 1),
    cb AS (SELECT bucket, COUNT(*) AS cc FROM d GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n FROM d),
    grid AS (
      SELECT s.source, s.ns, r.b AS bucket FROM srcs s, range(0, 10) r(b)
    ),
    terms AS (
      SELECT g.source, g.ns,
             CAST(ROUND(
               ((COALESCE(sb.c, 0) + 1.0) / (g.ns + 10)
                - (COALESCE(cb.cc, 0) + 1.0) / (t.n + 10))
               * LN(((COALESCE(sb.c, 0) + 1.0) / (g.ns + 10))
                    / ((COALESCE(cb.cc, 0) + 1.0) / (t.n + 10)))
               * 1000000000) AS BIGINT) AS term_nano
      FROM grid g
      LEFT JOIN sb USING (source, bucket)
      LEFT JOIN cb USING (bucket), tot t
    )
    SELECT source,
           CAST(MAX(ns) AS BIGINT) AS n_docs,
           ROUND(SUM(term_nano) / 1e9, 6) AS psi
    FROM terms GROUP BY source
    """


@query("source_psi_drift", oracle=_psi_oracle())
def source_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor (X94): per source, the
    PSI of its quality-score distribution against the corpus-wide
    distribution over 10 fixed buckets (Laplace +1 smoothing so empty
    buckets stay finite) — the standard score a pipeline alarms on
    when one feed's quality profile shifts between crawls (PSI > 0.25
    is the conventional "investigate" line). Complements X81 (which
    re-ranks within a source) by detecting that a source CHANGED.

    Determinism: bucket on the 1e-6-rounded quality (both engines
    bucket the identical double); each bucket's (p−q)·ln(p/q) term is
    quantized to integer nanos BEFORE the per-source sum (the X69
    order-independent-statistics pattern), so summation order cannot
    change the hash.

    Scale: quality is per-row scan math and the corpus is scanned
    ONCE — the (source, bucket) agg map-side-combines to |sources|·10
    rows, and the per-source totals, per-bucket totals, and scalar n
    are all re-aggregations of that tiny rollup, never of documents
    (the plan audit showed the naive form scanning the corpus four
    times for numbers derivable from 50 rows). The term grid is
    |sources|·10 regardless of corpus size."""
    t = load_tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    docs = t.documents.select(
        "source",
        F.least(
            F.floor(
                F.round(quality_score(F.col("text"), toks), 6) * 10
            ).cast("int"),
            F.lit(9),
        ).alias("bucket"),
    )
    sb = docs.groupBy("source", "bucket").agg(F.count(F.lit(1)).alias("c"))
    # Materialize the |sources|·10-row rollup once: Catalyst does not
    # reuse the aggregation subtree across the four consumers below, so
    # without this the corpus (and its per-row quality HOFs) would be
    # scanned four times for numbers derivable from ~50 rows.
    sb = sb.localCheckpoint()
    srcs = sb.groupBy("source").agg(F.sum("c").alias("ns"))
    cb = sb.groupBy("bucket").agg(F.sum("c").alias("cc"))
    tot = sb.agg(F.sum("c").alias("n"))
    grid = srcs.crossJoin(
        F.broadcast(spark.range(10).select(F.col("id").cast("int").alias("bucket")))
    )
    p = (F.coalesce(F.col("c"), F.lit(0)) + 1.0) / (F.col("ns") + 10)
    q = (F.coalesce(F.col("cc"), F.lit(0)) + 1.0) / (F.col("n") + 10)
    term_nano = F.round((p - q) * F.log(p / q) * 1e9).cast("long")
    return (
        grid.join(sb, ["source", "bucket"], "left")
        .join(F.broadcast(cb), "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select("source", "ns", term_nano.alias("term_nano"))
        .groupBy("source")
        .agg(
            F.max("ns").cast("long").alias("n_docs"),
            F.round(F.sum("term_nano") / 1e9, 6).alias("psi"),
        )
    )


@query(
    "incremental_lsh_dedup",
    oracle=f"""
    WITH sets_ AS (SELECT * FROM {_DUCK_SETS3} WHERE len(sh) > 0),
    sig AS (SELECT doc, sh,
                   {duck_minhash_signature('sh', MINHASH_NUM_PERM)} AS sig
            FROM sets_),
    banded AS ({_duck_minhash_bands(MINHASH_NUM_PERM, MINHASH_BANDS)}),
    base AS (SELECT * FROM banded WHERE doc % 10 < 8),
    newb AS (SELECT * FROM banded WHERE doc % 10 >= 8),
    dropped AS (
      SELECT DISTINCT n.doc
      FROM newb n JOIN base b USING (band, key)
      UNION
      SELECT DISTINCT n.doc
      FROM newb n JOIN newb m
        ON n.band = m.band AND n.key = m.key AND m.doc < n.doc
    )
    SELECT doc AS doc_id
    FROM (SELECT DISTINCT doc FROM newb)
    WHERE doc NOT IN (SELECT doc FROM dropped)
    """,
)
def incremental_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup dedup of an arriving batch against a
    persisted LSH index (X109) — the continuous-ingestion pattern: the
    corpus's (doc, band, key) bucket table is a materialized gold
    artifact; a new batch (here the doc_id%10>=8 slice standing in for
    "today's crawl") computes only its OWN buckets and joins the index,
    so per-batch cost is O(batch x bands) and the corpus is never
    re-paired. Drop rule is order-free (collides with base, or with a
    smaller-id batch member — no chain re-evaluation), keeping reruns
    and partial retries idempotent; semantics documented and mirrored
    exactly in the oracle."""
    from seng550_a3_etl_spark.operators.text_dedup import (
        band_keys,
        lsh_incremental_survivors,
    )

    signed = _minhash_sigs_df(spark, sf_dir)  # 8-perm session cache
    # The survivor computation references the bucket table four times
    # (base semi-join, per-bucket min, batch distinct, drop filter);
    # pin it so the signature aggregation runs once — in production
    # this table is the PERSISTED index, so the pin models the read.
    banded = band_keys(signed, bands=4, rows_per_band=2).localCheckpoint(
        eager=True
    )
    base = banded.filter(F.col("doc") % 10 < 8)
    new = banded.filter(F.col("doc") % 10 >= 8)
    return lsh_incremental_survivors(base, new).select(
        F.col("doc").alias("doc_id")
    )


def _source_overlap_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    return f"""
    WITH pairs AS ({ORACLES["ngram_dup_pairs"]}),
    meta AS (SELECT doc_id, source FROM documents)
    SELECT least(ma.source, mb.source) AS source_x,
           greatest(ma.source, mb.source) AS source_y,
           CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
    FROM pairs
    JOIN meta ma ON ma.doc_id = doc_a
    JOIN meta mb ON mb.doc_id = doc_b
    GROUP BY 1, 2
    """


@query("source_overlap_matrix", oracle=_source_overlap_oracle())
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix (X112): near-dup pair counts per
    unordered source pair — the curation diagnostic that tells you
    WHICH feeds re-crawl each other (diagonal = within-source
    boilerplate, off-diagonal = mirror sites / syndication), and what
    deduplicating one source actually removes from another. Output is
    ≤ |sources|² rows.

    Scale: reuses the session-cached shingle build and the bounded
    posting-list pair scan (one shuffle); the (doc → source) attachment
    is two joins against the slim meta projection, and the final rollup
    is map-side-combined to a handful of rows. No new corpus scan:
    everything heavy is shared with the dedup family."""
    t = load_tables(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        t.documents, "doc_id", "text", n=3, threshold=0.8,
        max_shingle_freq=64,
        shingle_sets=_shingle_sets_df(spark, sf_dir, n=3, hashed=True),
    ).select("doc_a", "doc_b")
    meta = t.documents.select("doc_id", "source")
    ma = meta.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("__sa")
    )
    mb = meta.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("__sb")
    )
    return (
        pairs.join(ma, "doc_a")
        .join(mb, "doc_b")
        .groupBy(
            F.least("__sa", "__sb").alias("source_x"),
            F.greatest("__sa", "__sb").alias("source_y"),
        )
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
    )


@query(
    "doc_containment_pairs",
    oracle=f"""
    WITH sets_ AS {{sets3}},
    sizes AS (SELECT doc, CAST(len(sh) AS BIGINT) AS n_sh FROM sets_),
    ex AS (SELECT doc, unnest(sh) AS s FROM sets_),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS inter
      FROM ex a JOIN ex b USING (s)
      WHERE a.doc < b.doc GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, inter,
           sa.n_sh AS size_a, sb.n_sh AS size_b,
           ROUND(inter / sa.n_sh, 6) AS cont_a,
           ROUND(inter / sb.n_sh, 6) AS cont_b
    FROM inter
    JOIN sizes sa ON sa.doc = doc_a
    JOIN sizes sb ON sb.doc = doc_b
    WHERE greatest(inter / sa.n_sh, inter / sb.n_sh) >= 0.8
    """.format(sets3=_DUCK_SETS3),
)
def doc_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X124 — asymmetric containment dedup pairs (Broder containment
    C(A→B)=|A∩B|/|A| ≥ 0.8 in either direction): catches the
    quote/wrapper shape resemblance dedup structurally misses — a short
    doc fully embedded in a long one has containment ≈ 1 but Jaccard
    ≈ |A|/|B|, below any X2 threshold. The result is a superset of
    `ngram_dup_pairs` at the same threshold (containment ≥ Jaccard).

    Reuses the session-cached hashed shingle build and the SAME
    single-scan posting→pair machinery as X2 (one postings shuffle,
    stop-shingle bound 64); only the final score expression differs —
    no new corpus scan, no new shuffle shape to audit."""
    t = load_tables(spark, sf_dir)
    out = containment_pairs(
        t.documents, "doc_id", "text", n=3, threshold=0.8,
        max_shingle_freq=64,
        shingle_sets=_shingle_sets_df(spark, sf_dir, n=3, hashed=True),
    )
    return out.select(
        "doc_a", "doc_b", "inter", "size_a", "size_b",
        F.round("cont_a", 6).alias("cont_a"),
        F.round("cont_b", 6).alias("cont_b"),
    )


@query(
    "lang_source_mi",
    oracle="""
    WITH joint AS (
      SELECT lang, source, COUNT(*) AS c FROM documents GROUP BY 1, 2
    ),
    m AS (
      SELECT lang, source, c,
             SUM(c) OVER (PARTITION BY lang) AS cl,
             SUM(c) OVER (PARTITION BY source) AS cs,
             SUM(c) OVER () AS n,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY source) AS rn
      FROM joint
    ),
    h AS (
      SELECT MAX(n) AS n,
             SUM(CAST(c AS DOUBLE) / n
                 * log2(CAST(c AS DOUBLE) * n
                        / (CAST(cl AS DOUBLE) * cs))) AS mi,
             log2(CAST(MAX(n) AS DOUBLE))
               - SUM(CASE WHEN rn = 1 THEN cl * log2(CAST(cl AS DOUBLE))
                          ELSE 0 END) / MAX(n) AS h_lang
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           ROUND(mi, 4) AS mi_bits,
           ROUND(mi / h_lang, 4) AS uncertainty_coeff
    FROM h
    """,
)
def lang_source_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X125 — mutual information between document language and source,
    in bits, plus the uncertainty coefficient U(lang|source) = MI /
    H(lang): the dependence gauge for mix design (high MI = language is
    concentrated in particular sources, so source-level sampling skews
    the language mix; near-zero = the two axes can be budgeted
    independently). The same construction audits any pair of
    categorical columns (label×shard for leakage, type×day for drift).

    Scale: the corpus folds to the |langs|·|sources| joint rollup in
    one shuffle; marginals are window sums OVER THE ROLLUP (no second
    corpus pass — the X117 window-over-rollup argument), and the MI
    fold is one aggregate over rollup rows. The rn=1 trick sums each
    lang's marginal exactly once inside the same aggregate."""
    t = load_tables(spark, sf_dir)
    joint = t.documents.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("c")
    )
    m = joint.select(
        "lang",
        "source",
        "c",
        F.sum("c").over(Window.partitionBy("lang")).alias("cl"),
        F.sum("c").over(Window.partitionBy("source")).alias("cs"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
        F.row_number()
        .over(Window.partitionBy("lang").orderBy("source"))
        .alias("rn"),
    )
    cd = F.col("c").cast("double")
    nrow = F.col("n")
    mi = F.sum(
        cd
        / nrow
        * F.log2(cd * nrow / (F.col("cl").cast("double") * F.col("cs")))
    )
    h_lang = F.log2(F.max("n").cast("double")) - F.sum(
        F.when(
            F.col("rn") == 1,
            F.col("cl") * F.log2(F.col("cl").cast("double")),
        ).otherwise(F.lit(0.0))
    ) / F.max("n")
    return m.agg(
        F.max("n").cast("long").alias("n_docs"),
        F.round(mi, 4).alias("mi_bits"),
        F.round(mi / h_lang, 4).alias("uncertainty_coeff"),
    )


_SWEEP_TS = (0.5, 0.6, 0.7, 0.8, 0.9)


@query(
    "dup_threshold_sweep",
    oracle=f"""
    WITH sets_ AS {{sets3}},
    sizes AS (SELECT doc, CAST(len(sh) AS BIGINT) AS n_sh FROM sets_),
    ex AS (SELECT doc, unnest(sh) AS s FROM sets_),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS inter
      FROM ex a JOIN ex b USING (s)
      WHERE a.doc < b.doc GROUP BY 1, 2
    ),
    scored AS (
      SELECT doc_a, doc_b,
             inter / (sa.n_sh + sb.n_sh - inter) AS j
      FROM inter
      JOIN sizes sa ON sa.doc = doc_a
      JOIN sizes sb ON sb.doc = doc_b
    ),
    ts(t) AS (VALUES {", ".join(f"({t})" for t in _SWEEP_TS)})
    SELECT t AS threshold,
           CAST(COUNT(CASE WHEN j >= t THEN 1 END) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT CASE WHEN j >= t THEN doc_b END)
                AS BIGINT) AS n_docs_droppable
    FROM ts CROSS JOIN scored
    GROUP BY t
    """.format(sets3=_DUCK_SETS3),
)
def dup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X127 — near-dup threshold sensitivity report: for each candidate
    Jaccard threshold, how many pairs fire and how many documents a
    keep-smallest-id policy could drop (distinct larger-id members).
    This is the tuning artifact a dedup rollout reads BEFORE picking
    X2/X3's threshold — one pass over the same pair-intersection
    stream the production threshold would consume, so the sweep costs
    one query, not |thresholds| queries.

    Scale: identical machinery and cost envelope to ngram_dup_pairs
    (session-cached shingle sets, single postings shuffle, stop-
    shingle bound 64 — the sweep reads the UNFILTERED pair stream X2
    filters, which X2's plan materializes anyway before its threshold
    predicate); the threshold fan-out happens on the folded
    (pair, jaccard) rollup via a broadcast |thresholds|-row join, and
    the result is |thresholds| rows."""
    from seng550_a3_etl_spark.operators.text_dedup import (
        pair_intersections,
    )

    t = load_tables(spark, sf_dir)
    inter = pair_intersections(
        _shingle_sets_df(spark, sf_dir, n=3, hashed=True),
        max_shingle_freq=64,
    )
    scored = inter.select(
        "doc_a",
        "doc_b",
        (
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter"))
        ).alias("j"),
    )
    ts = spark.createDataFrame(
        [(float(x),) for x in _SWEEP_TS], "t double"
    )
    fired = F.when(F.col("j") >= F.col("t"), F.lit(1))
    return (
        F.broadcast(ts)
        .crossJoin(scored)
        .groupBy(F.col("t").alias("threshold"))
        .agg(
            F.count(fired).alias("n_pairs"),
            F.count_distinct(
                F.when(F.col("j") >= F.col("t"), F.col("doc_b"))
            ).alias("n_docs_droppable"),
        )
    )


@query(
    "lang_confusion_matrix",
    oracle=rf"""
    WITH scored AS (
      SELECT lang, t,
             {_duck_marker('en')} AS c_en, {_duck_marker('es')} AS c_es,
             {_duck_marker('de')} AS c_de, {_duck_marker('fr')} AS c_fr,
             {_duck_marker('zh')} AS c_zh
      FROM (SELECT lang, string_split_regex(text, '\s+') AS t
            FROM documents)
    ),
    pred AS (
      SELECT lang, CASE {_LANG_CASE} ELSE 'und' END AS lang_pred
      FROM (SELECT *, greatest(c_en, c_es, c_de, c_fr, c_zh) AS best
            FROM scored)
    )
    SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COUNT(*) / SUM(COUNT(*)) OVER (PARTITION BY lang), 6)
             AS label_share
    FROM pred GROUP BY lang, lang_pred
    """,
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X140 — language-ID confusion matrix: the marker-wordlist
    heuristic's prediction (doc_lang_quality's lang_id) cross-tabulated
    against the corpus's stored ``lang`` label, with each cell's share
    of its label row — the calibration readout that decides whether the
    cheap classifier is good enough to gate corpus routing, and which
    label pairs it confuses.

    Scale: per-row prediction is shuffle-free marker counting; the
    matrix is one |langs|² rollup and the share window runs over that
    rollup, so nothing row-sized survives the first aggregation."""
    t = load_tables(spark, sf_dir)
    pred = t.documents.select(
        "lang", lang_id(tokens(F.col("text"))).alias("lang_pred")
    )
    cells = pred.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "lang_pred",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("label_share"),
    )


def _minhash_quality_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    matches = (
        f"len(list_filter(range(1, {MINHASH_NUM_PERM + 1}), "
        "i -> sa.sig[i] = sb.sig[i]))"
    )
    return f"""
    WITH pairs AS ({ORACLES["minhash_dup_pairs"]}),
    sets_ AS (SELECT * FROM {_DUCK_SETS3} WHERE len(sh) > 0),
    sig AS (SELECT doc, {duck_minhash_signature('sh', MINHASH_NUM_PERM)} AS sig
            FROM sets_)
    SELECT p.doc_a, p.doc_b,
           CAST({matches} AS BIGINT) AS sig_matches,
           {matches} / {float(MINHASH_NUM_PERM)} AS est_jaccard,
           ROUND(p.jaccard, 6) AS exact_jaccard,
           ROUND(abs({matches} / {float(MINHASH_NUM_PERM)} - p.jaccard), 6)
             AS abs_err
    FROM pairs p
    JOIN sig sa ON sa.doc = p.doc_a
    JOIN sig sb ON sb.doc = p.doc_b
    """


@query("minhash_estimate_quality", oracle=_minhash_quality_oracle())
def minhash_estimate_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X141 — MinHash estimator calibration on the verified near-dup
    pairs: per pair, the signature-agreement estimate (matching
    permutations / 8 — an unbiased Jaccard estimator, exact binary
    fraction) against the exact Jaccard, with the absolute error — the
    accuracy gate that justifies trusting banding recall math before a
    run where exact verification is too expensive (the minhash
    counterpart of ann_recall_ivf's IVF gate).

    Scale: rides the session shingle cache; the (doc, sig) table is
    built ONCE (eager localCheckpoint — one row of 8 ints per doc) and
    shared between the LSH banding inside minhash_lsh_pairs and the
    estimate join here, instead of running the per-shingle minima
    aggregation twice. The estimate join touches only the verified
    pairs (threshold-filtered, tiny relative to the corpus) via one
    melt-join over the signature table."""
    t = load_tables(spark, sf_dir)
    sets_ = _shingle_sets_df(spark, sf_dir, n=3, hashed=False)
    signed = _minhash_sigs_df(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        t.documents, "doc_id", "text", n=3, num_perm=MINHASH_NUM_PERM,
        bands=MINHASH_BANDS, threshold=MINHASH_THRESHOLD,
        shingle_sets=sets_, signatures=signed,
    )
    melted = pairs.select(
        F.struct("doc_a", "doc_b", "jaccard").alias("__p"),
        F.posexplode(F.array("doc_a", "doc_b")).alias("__side", "doc"),
    )
    both = (
        melted.join(signed, "doc")
        .groupBy("__p")
        .agg(
            F.first(
                F.when(F.col("__side") == 0, F.col("sig")), ignorenulls=True
            ).alias("sig_a"),
            F.first(
                F.when(F.col("__side") == 1, F.col("sig")), ignorenulls=True
            ).alias("sig_b"),
        )
    )
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda b: b,
        )
    ).cast("long")
    return both.select(
        F.col("__p.doc_a").alias("doc_a"),
        F.col("__p.doc_b").alias("doc_b"),
        matches.alias("sig_matches"),
        (matches / F.lit(float(MINHASH_NUM_PERM))).alias("est_jaccard"),
        F.round(F.col("__p.jaccard"), 6).alias("exact_jaccard"),
        F.round(
            F.abs(
                matches / F.lit(float(MINHASH_NUM_PERM))
                - F.col("__p.jaccard")
            ), 6
        ).alias("abs_err"),
    )


def _qnorm_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    return f"""
    WITH dq AS ({ORACLES["doc_lang_quality"]}),
    scored AS (
      SELECT d.doc_id, d.source, dq.quality AS q
      FROM documents d JOIN dq ON dq.doc_id = d.doc_id
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY q, doc_id)
               AS rn,
             COUNT(*) OVER (PARTITION BY source) AS ns
      FROM scored
    ),
    gtab AS (
      SELECT q, ROW_NUMBER() OVER (ORDER BY q, doc_id) AS gr FROM scored
    ),
    tot AS (SELECT COUNT(*) AS n FROM scored)
    SELECT r.doc_id, r.source, r.q AS q_raw, g.q AS q_norm
    FROM ranked r CROSS JOIN tot
    JOIN gtab g ON g.gr = (r.rn * tot.n + r.ns - 1) // r.ns
    """


@query("quality_quantile_norm", oracle=_qnorm_oracle())
def quality_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X145 — quantile normalization of the quality score across
    sources: each document's score is remapped to the GLOBAL score at
    the same quantile position (global rank ceil(rn·N/n_s), rank-picked,
    never interpolated — the suite's exact-quantile recipe), so
    per-source score distributions become comparable before a single
    quality threshold gates the mix — the distribution-alignment step
    that keeps one well-calibrated source from dominating curation
    (compare X81's per-source calibration report).

    Determinism: ranking is on the ROUNDED (6dp) quality with doc_id
    tiebreak (a total order both engines share); the target rank is
    exact integer math ((rn·N + n_s − 1) div n_s). Scale: one
    source-window shuffle, one distributed global row_number (range
    exchange + per-partition windows + broadcast offsets — NEVER a
    single-partition global window; operators/ranking.py), and an
    integer-key join against the |docs|-row quantile table."""
    from seng550_a3_etl_spark.functions.text import quality_score
    from seng550_a3_etl_spark.operators.ranking import global_row_number

    t = load_tables(spark, sf_dir)
    scored = t.documents.select(
        "doc_id",
        "source",
        F.round(
            quality_score(F.col("text"), tokens(F.col("text"))), 6
        ).alias("q"),
    ).localCheckpoint(eager=True)  # three consumers; score once
    w_src = Window.partitionBy("source").orderBy("q", "doc_id")
    ranked = scored.select(
        "doc_id",
        "source",
        "q",
        F.row_number().over(w_src).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("source"))
        .alias("ns"),
    )
    glob = global_row_number(
        scored.select("q", "doc_id"), ["q", "doc_id"], out="gr"
    ).select(F.col("q").alias("gq"), "gr")
    tot = scored.agg(F.count(F.lit(1)).alias("n"))
    target = F.expr("(rn * n + ns - 1) div ns")
    return (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn("gr", target)
        .join(glob, "gr")
        .select(
            "doc_id",
            "source",
            F.col("q").alias("q_raw"),
            F.col("gq").alias("q_norm"),
        )
    )


# Intra-doc span dedup unit: non-overlapping _DOC_SPAN_K-token blocks.
# 2 tokens on the ~54-token fixture docs (where 181/500 sf0.01 docs
# carry a repeat); production splits on newlines / ~50-token paragraphs.
_DOC_SPAN_K = 2


@query(
    "doc_dedup_spans",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents
    ),
    flat AS (
      SELECT doc_id,
             unnest(list_transform(
               range(0, CAST(ceil(len(tk) / {_DOC_SPAN_K}.0) AS INT)),
               i -> struct_pack(
                 pos := i,
                 b := array_to_string(
                   tk[i*{_DOC_SPAN_K}+1 : i*{_DOC_SPAN_K}+{_DOC_SPAN_K}],
                   ' '))
             )) AS s
      FROM d
    ),
    spans AS (SELECT doc_id, s.pos AS pos, s.b AS b FROM flat),
    kept AS (
      SELECT doc_id, pos, b FROM (
        SELECT *, row_number()
                  OVER (PARTITION BY doc_id, b ORDER BY pos) AS rn
        FROM spans
      ) WHERE rn = 1
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(b, ' ' ORDER BY pos) AS dedup_text
      FROM kept GROUP BY doc_id
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_spans FROM spans GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(t.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(t.n_spans, 0) - COALESCE(a.n_kept, 0) AS BIGINT)
             AS n_dup_spans,
           COALESCE(a.dedup_text, '') AS dedup_text
    FROM d
    LEFT JOIN tot t USING (doc_id)
    LEFT JOIN agg a USING (doc_id)
    """,
)
def doc_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repeated-span REMOVAL (X155; VERDICT r6 #4):
    X55/X89 only measure repetition — this drops it. Every document is
    rebuilt keeping the first occurrence of each distinct
    non-overlapping span, with per-doc span accounting. Thin wrapper
    over ``operators.text_dedup.dedup_doc_spans`` (unit-tested on
    crafted repeats).

    Scale: zero shuffle — the whole computation (span split, keep-first
    via sorted-run marking, reading-order rebuild) is per-row HOF
    expressions in the scan stage, O(s log s) per doc in span count.
    The rebuilt text feeds the canonical dedup / near-dup family
    unchanged."""
    from seng550_a3_etl_spark.operators.text_dedup import dedup_doc_spans
    from seng550_a3_etl_spark.plans.layout import spread_for_cpu

    t = load_tables(spark, sf_dir)
    # CPU-bound per-row rebuild: spread when the scan under-parallelizes
    # (no-op at scale; see spread_for_cpu).
    return spread_for_cpu(t.documents).select(
        "doc_id", "text"
    ).transform(
        lambda d: dedup_doc_spans(d, "doc_id", "text", k=_DOC_SPAN_K)
    )


@query(
    "linear_quality_scores",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(text, '\s+')) AS tok
      FROM documents
    ),
    counts AS (
      SELECT tok,
             COUNT(*) FILTER (lang = 'en') AS c1,
             COUNT(*) FILTER (lang <> 'en') AS c0
      FROM toks GROUP BY tok
    ),
    tot AS (
      SELECT SUM(c1) AS n1, SUM(c0) AS n0, COUNT(*) AS v FROM counts
    ),
    w AS (
      SELECT tok,
             CAST(ROUND(ln(((c1 + 1) / (n1 + v))
                           / ((c0 + 1) / (n0 + v))) * 1e9) AS BIGINT)
               AS w_nano
      FROM counts, tot
    ),
    scored AS (
      SELECT doc_id, COUNT(*) AS n_tokens, SUM(w_nano) AS score_nano
      FROM toks JOIN w USING (tok)
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(s.score_nano, 0) AS BIGINT) AS score_nano,
           COALESCE(s.score_nano, 0) > 0 AS pred_hq
    FROM documents d LEFT JOIN scored s USING (doc_id)
    """,
)
def linear_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier inference (X156; VERDICT r6 #5) — the
    fasttext-style learned quality gate: each document is scored by a
    bag-of-words linear model, score = Σ weight(token) over its tokens
    (with multiplicity). The weight table here is naive-Bayes log-odds
    (add-1 smoothing) of the ``lang='en'`` class, DERIVED from the
    corpus itself so the whole query is self-contained and
    deterministic; production swaps in an externally-trained (token,
    weight) table — the inference plan is identical either way.
    Weights quantize to integer nanos (the X94/PSI ln pattern) so the
    per-doc sum is an exact integer in both engines regardless of
    summation order.

    Scale: the weight build is one map-side-combined groupBy on token
    (vocab-sized output — bounded, ~1M rows on a web corpus); the
    weight table BROADCASTS; inference is explode_outer + broadcast
    LEFT hash join + per-doc partial-agg sum — the corpus shuffles
    only (doc_id, partial sum) rows. explode_outer keeps zero-token
    docs as a null-token row, so no documents re-join is needed to
    zero-preserve them (the naive form paid a full SortMergeJoin on
    doc_id for that); with an externally-supplied weights table the
    corpus is scanned exactly once."""
    t = load_tables(spark, sf_dir)
    toks = t.documents.select(
        "doc_id", "lang", F.explode_outer(tokens(F.col("text"))).alias("tok")
    )
    counts = toks.filter(F.col("tok").isNotNull()).groupBy("tok").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("lang") != "en", 1).otherwise(0)).alias("c0"),
    )
    tot = counts.agg(
        F.sum("c1").alias("n1"),
        F.sum("c0").alias("n0"),
        F.count(F.lit(1)).alias("v"),
    )
    w = counts.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.round(
            F.log(
                ((F.col("c1") + 1) / (F.col("n1") + F.col("v")))
                / ((F.col("c0") + 1) / (F.col("n0") + F.col("v")))
            )
            * 1e9
        )
        .cast("long")
        .alias("w_nano"),
    )
    return (
        toks.join(F.broadcast(w), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("tok").cast("long").alias("n_tokens"),
            F.coalesce(F.sum("w_nano"), F.lit(0)).cast("long").alias(
                "score_nano"
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            "score_nano",
            (F.col("score_nano") > 0).alias("pred_hq"),
        )
    )


def _normalized_docs_oracle() -> str:
    from seng550_a3_etl_spark.functions.text import duck_repair_expr

    return f"""
    WITH n AS (
      SELECT doc_id, text, {duck_repair_expr('text')} AS text_norm
      FROM documents
    )
    SELECT doc_id, text_norm, text_norm <> text AS changed,
           CAST(length(text_norm) AS BIGINT) AS n_chars_norm
    FROM n
    """


@query("normalized_docs", oracle=_normalized_docs_oracle())
def normalized_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-normalization / mojibake-repair stage (X157; VERDICT r6
    #6): the canonicalization pass the curation pipeline (X25) and
    canonical dedup (X91) previously skipped — cp1252-mojibake repair,
    HTML-entity decode, control/zero-width-char strip, whitespace
    collapse — so trivially re-encoded copies hash equal downstream.
    The repair tables live in ``functions/text.py`` and build BOTH
    engines' expressions (``repair_text`` / ``duck_repair_expr``), and
    the cross-engine equivalence is unit-tested on crafted mojibake
    (`tests/test_new_ops.py`), since the parquet fixture itself is
    clean ASCII (changed=false everywhere at sf0.01 — the no-op path
    is the oracle-checked one; the repair path is the unit-tested one).

    Scale: a pure projection — chained literal ``replace`` +
    ``regexp_replace`` in the scan stage, zero shuffle, zero UDFs."""
    from seng550_a3_etl_spark.functions.text import repair_text

    t = load_tables(spark, sf_dir)
    norm = repair_text(F.col("text"))
    return t.documents.select(
        "doc_id",
        norm.alias("text_norm"),
        (norm != F.col("text")).alias("changed"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


# Cross-doc boilerplate unit/threshold: non-overlapping 4-token spans
# occurring in >= 3 distinct documents (C4/CCNet drop "lines seen 3+
# times" — fixture-sized span; production splits on newlines).
_BOILER_K = 4
_BOILER_MIN_DOCS = 3


@query(
    "boilerplate_span_removal",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents
    ),
    flat AS (
      SELECT doc_id, s.pos AS pos, s.b AS b FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(0, CAST(ceil(len(tk) / {_BOILER_K}.0) AS INT)),
                 i -> struct_pack(
                   pos := i,
                   b := array_to_string(
                     tk[i*{_BOILER_K}+1 : i*{_BOILER_K}+{_BOILER_K}], ' '))
               )) AS s
        FROM d
      )
    ),
    freq AS (
      SELECT b, COUNT(DISTINCT doc_id) AS nd FROM flat GROUP BY b
    ),
    joined AS (
      SELECT doc_id, pos, b, nd >= {_BOILER_MIN_DOCS} AS boiler
      FROM flat JOIN freq USING (b)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boiler_spans,
           COALESCE(string_agg(b, ' ' ORDER BY pos)
                      FILTER (NOT boiler), '') AS clean_text
    FROM joined GROUP BY doc_id
    """,
)
def boilerplate_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-document boilerplate removal (X158) — the C4/CCNet rule:
    a span occurring in ≥ ``_BOILER_MIN_DOCS`` distinct documents is
    boilerplate (nav blocks, cookie banners, license headers) and is
    dropped from every document; each doc is rebuilt from its
    surviving spans in reading order, with span accounting.
    Complements X155 (intra-doc repeats) and X89 (which only measures
    cross-doc spans).

    Scale: one map-side-combined distinct-doc count per span, keyed
    ``(hash, span)`` — the 64-bit hash distributes the shuffle, and
    carrying the (short, K-token) span text alongside it makes the
    census exact with no hash-collision assumption (two distinct spans
    sharing an xxhash64 can neither merge counts nor cross-mark). The
    frequent-span set (bounded by the corpus's repeated content, tiny
    relative to the corpus; AQE broadcasts it when it fits) marks
    positions via a LEFT join on the same pair key, and ONE
    groupBy(doc) rebuilds the text. Two data shuffles total. Thin
    wrapper over ``operators.text_dedup.remove_boilerplate_spans``
    (factored r9 so X25-full composes it)."""
    from seng550_a3_etl_spark.operators.text_dedup import (
        remove_boilerplate_spans,
    )

    t = load_tables(spark, sf_dir)
    return remove_boilerplate_spans(
        t.documents, "doc_id", "text", k=_BOILER_K,
        min_docs=_BOILER_MIN_DOCS,
    )


# Cross-doc substring dedup knobs (X198): anchor window length (the
# fixture-sized stand-in for the literature's ~50 tokens), the minimum
# reported span, and the anchor-frequency stop-list that bounds the
# C(freq,2) pair budget. Single-sourced: interpolated into the oracle
# and asserted exact against the fixtures in tests.
_XSPAN_K = 8
_XSPAN_MIN = 12
_XSPAN_MAXF = 64


_XSPAN_CACHE: dict[tuple[str, str], DataFrame] = {}


def _xspan_spans_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The X198 maximal-shared-span frame over the RAW documents with
    the suite knobs — computed ONCE per (Spark application, sf_dir)
    and shared by every consumer (the standalone span query, the
    coverage rollup, the source flow matrix, the census tier): the
    heaviest new r10 operator otherwise re-ran four times per suite
    pass (review r10). Same rationale as ``_shingle_sets_df``: at
    100 TB the span list is a materialized artifact one job writes;
    ``localCheckpoint`` is the session-scoped analog."""
    from seng550_a3_etl_spark.operators.text_dedup import (
        cross_doc_substring_spans,
    )

    _evict_stopped_sessions(_XSPAN_CACHE)
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _XSPAN_CACHE.get(key)
    if cached is not None:
        return cached
    t = load_tables(spark, sf_dir)
    out = cross_doc_substring_spans(
        t.documents,
        "doc_id",
        "text",
        k=_XSPAN_K,
        min_span_tokens=_XSPAN_MIN,
        max_anchor_freq=_XSPAN_MAXF,
    ).localCheckpoint(eager=True)
    _XSPAN_CACHE[key] = out
    return out


def _xspan_ctes(p: str, src: str) -> str:
    """DuckDB CTE chain ending in ``<p>spans`` (doc_a < doc_b, a_start,
    b_start, span_tokens ≥ _XSPAN_MIN): the X198 anchor → stop-list →
    cross-doc pair → per-diagonal island construction over ``src``,
    which must expose (doc_id, tk token-array). Single-sourced so the
    standalone X198 oracle and the X161 stage-7 oracle replay the
    IDENTICAL construction with the identical knobs."""
    return rf"""
    {p}anchors AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len(tk) - {_XSPAN_K - 1}, 0) + 1),
               i -> struct_pack(
                 pos := i - 1,
                 h := {duck_hash64(
                     f"array_to_string(tk[i:i+{_XSPAN_K - 1}], ' ')"
                 )})
             )) AS s
      FROM {src}
    ),
    {p}a2 AS (SELECT doc_id, s.pos AS pos, s.h AS h FROM {p}anchors),
    {p}kept AS (
      SELECT doc_id, pos, h FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY h) AS f FROM {p}a2
      ) WHERE f <= {_XSPAN_MAXF}
    ),
    {p}pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos AS pa, b.pos AS pb
      FROM {p}kept a JOIN {p}kept b USING (h)
      WHERE a.doc_id < b.doc_id
    ),
    {p}runs AS (
      SELECT doc_a, doc_b, pa - pb AS diag, pa,
             pa - row_number() OVER (
               PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS isl
      FROM {p}pairs
    ),
    {p}spans AS (
      SELECT doc_a, doc_b,
             CAST(MIN(pa) AS BIGINT) AS a_start,
             CAST(MIN(pa) - diag AS BIGINT) AS b_start,
             CAST(COUNT(*) + {_XSPAN_K - 1} AS BIGINT) AS span_tokens
      FROM {p}runs GROUP BY doc_a, doc_b, diag, isl
      HAVING COUNT(*) + {_XSPAN_K - 1} >= {_XSPAN_MIN}
    )"""


def _curation_full_oracle() -> str:
    from seng550_a3_etl_spark.functions.text import duck_repair_expr

    sk = _DOC_SPAN_K
    bk = _BOILER_K
    bmin = _BOILER_MIN_DOCS

    def tokcnt(x: str) -> str:
        return (
            f"CASE WHEN coalesce({x}, '') = '' THEN 0 "
            rf"ELSE len(string_split_regex({x}, '\s+')) END"
        )

    return rf"""
    WITH rep AS (
      SELECT doc_id, lang, text, {duck_repair_expr('text')} AS t1
      FROM documents
    ),
    sd_tok AS (
      SELECT doc_id, string_split_regex(t1, '\s+') AS tk FROM rep
    ),
    sd_spans AS (
      SELECT doc_id, s.pos AS pos, s.b AS b FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(0, CAST(ceil(len(tk) / {sk}.0) AS INT)),
                 i -> struct_pack(
                   pos := i,
                   b := array_to_string(tk[i*{sk}+1 : i*{sk}+{sk}], ' '))
               )) AS s
        FROM sd_tok)
    ),
    sd_kept AS (
      SELECT doc_id, pos, b FROM (
        SELECT *, row_number()
                  OVER (PARTITION BY doc_id, b ORDER BY pos) AS rn
        FROM sd_spans) WHERE rn = 1
    ),
    sd_agg AS (
      SELECT doc_id, string_agg(b, ' ' ORDER BY pos) AS t2
      FROM sd_kept GROUP BY doc_id
    ),
    d2 AS (
      SELECT r.doc_id, r.lang,
             {tokcnt('r.text')} AS n0, {tokcnt('r.t1')} AS n1,
             COALESCE(a.t2, '') AS t2
      FROM rep r LEFT JOIN sd_agg a USING (doc_id)
    ),
    bp_tok AS (
      SELECT doc_id, string_split_regex(t2, '\s+') AS tk FROM d2
    ),
    bp_flat AS (
      SELECT doc_id, s.pos AS pos, s.b AS b FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(0, CAST(ceil(len(tk) / {bk}.0) AS INT)),
                 i -> struct_pack(
                   pos := i,
                   b := array_to_string(tk[i*{bk}+1 : i*{bk}+{bk}], ' '))
               )) AS s
        FROM bp_tok)
    ),
    bp_freq AS (
      SELECT b, COUNT(DISTINCT doc_id) AS nd FROM bp_flat GROUP BY b
    ),
    bp_agg AS (
      SELECT doc_id,
             COALESCE(string_agg(b, ' ' ORDER BY pos)
                        FILTER (nd < {bmin}), '') AS t3
      FROM bp_flat JOIN bp_freq USING (b) GROUP BY doc_id
    ),
    base AS (
      SELECT d.doc_id, d.lang, d.n0, d.n1, {tokcnt('d.t2')} AS n2,
             COALESCE(a.t3, '') AS t3, {tokcnt('a.t3')} AS n3
      FROM d2 d LEFT JOIN bp_agg a USING (doc_id)
    ),
    xs_tok AS (
      SELECT doc_id, string_split_regex(t3, '\s+') AS tk
      FROM base WHERE n3 > 0
    ),
    {_xspan_ctes('xs_', 'xs_tok')},
    cut AS (
      SELECT DISTINCT doc_id, pos FROM (
        SELECT doc_b AS doc_id,
               unnest(range(b_start, b_start + span_tokens)) AS pos
        FROM xs_spans)
    ),
    tok4_flat AS (
      SELECT doc_id, lang, s.pos AS pos, s.tok AS tok FROM (
        SELECT doc_id, lang,
               unnest(list_transform(
                 range(1, len(tk) + 1),
                 i -> struct_pack(pos := i - 1, tok := tk[i]))) AS s
        FROM (SELECT b.doc_id, b.lang, t.tk
              FROM base b JOIN xs_tok t USING (doc_id)))
    ),
    tok4 AS (
      SELECT f.doc_id, f.lang, f.pos, f.tok
      FROM tok4_flat f LEFT JOIN cut c
        ON c.doc_id = f.doc_id AND c.pos = f.pos
      WHERE c.doc_id IS NULL
    ),
    d4 AS (
      SELECT b.doc_id, b.lang, b.n3,
             COALESCE(r.t4, '') AS t4,
             COALESCE(r.n4, 0) AS n4
      FROM base b LEFT JOIN (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS t4,
               COUNT(*) AS n4
        FROM tok4 GROUP BY doc_id) r USING (doc_id)
    ),
    q_toks AS (
      SELECT doc_id, lang, tok FROM tok4
    ),
    q_counts AS (
      SELECT tok,
             COUNT(*) FILTER (lang = 'en') AS c1,
             COUNT(*) FILTER (lang <> 'en') AS c0
      FROM q_toks GROUP BY tok
    ),
    q_tot AS (
      SELECT SUM(c1) AS s1_, SUM(c0) AS s0_, COUNT(*) AS v FROM q_counts
    ),
    q_w AS (
      SELECT tok,
             CAST(ROUND(ln(((c1 + 1) / (s1_ + v))
                           / ((c0 + 1) / (s0_ + v))) * 1e9) AS BIGINT)
               AS w_nano
      FROM q_counts, q_tot
    ),
    q_scored AS (
      SELECT doc_id, SUM(w_nano) AS score_nano
      FROM q_toks JOIN q_w USING (tok) GROUP BY doc_id
    ),
    kept AS (
      SELECT b.doc_id, b.t4, b.n4
      FROM d4 b JOIN q_scored s USING (doc_id)
      WHERE b.n4 > 0 AND s.score_nano > 0
    ),
    uniq AS (
      SELECT doc_id, t4, n4 FROM (
        SELECT k.*, MIN(doc_id) OVER (PARTITION BY md5(t4)) AS canon
        FROM kept k) WHERE doc_id = canon
    ),
    usets AS (
      SELECT doc, list_distinct({_duck_shingles(3, 'tk')}) AS sh
      FROM (SELECT doc_id AS doc, string_split_regex(t4, '\s+') AS tk
            FROM uniq)
    ),
    sizes AS (SELECT doc, CAST(len(sh) AS BIGINT) AS n_sh FROM usets),
    ex AS (SELECT doc, unnest(sh) AS s FROM usets),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS inter
      FROM ex a JOIN ex b USING (s)
      WHERE a.doc < b.doc GROUP BY 1, 2
    ),
    near_dupes AS (
      SELECT DISTINCT doc_b FROM inter
      JOIN sizes sa ON sa.doc = doc_a JOIN sizes sb ON sb.doc = doc_b
      WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.8
    ),
    final AS (
      SELECT doc_id, n4 FROM uniq
      WHERE doc_id NOT IN (SELECT doc_b FROM near_dupes)
    )
    SELECT '00_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COALESCE(SUM(n0), 0) AS BIGINT) AS n_tokens FROM base
    UNION ALL
    SELECT '01_repair', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(n1), 0) AS BIGINT) FROM base
    UNION ALL
    SELECT '02_span_dedup', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(n2), 0) AS BIGINT) FROM base
    UNION ALL
    SELECT '03_boilerplate', CAST(COUNT(*) FILTER (n3 > 0) AS BIGINT),
           CAST(COALESCE(SUM(n3), 0) AS BIGINT) FROM base
    UNION ALL
    SELECT '04_substring_trim',
           CAST(COUNT(*) FILTER (n4 > 0) AS BIGINT),
           CAST(COALESCE(SUM(n4), 0) AS BIGINT) FROM d4
    UNION ALL
    SELECT '05_quality_gate', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(n4), 0) AS BIGINT) FROM kept
    UNION ALL
    SELECT '06_exact_dedup', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(n4), 0) AS BIGINT) FROM uniq
    UNION ALL
    SELECT '07_near_dedup', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(n4), 0) AS BIGINT) FROM final
    """


@query("curation_pipeline_full", oracle=_curation_full_oracle())
def curation_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL composed curation pipeline (X161; VERDICT r7/r8 #2)
    — the exact stage chain a 100 TB pretraining-corpus run executes,
    composed from the engine's own verified operators, with per-stage
    survivor/token accounting (the X78 shape):

    1. encoding repair (X157, ``repair_text``) — mojibake/entity/
       control-char fix so re-encoded copies hash equal downstream;
    2. intra-doc repeated-span removal (X155, ``dedup_doc_spans``);
    3. cross-doc boilerplate removal (X158,
       ``remove_boilerplate_spans``) — docs reduced to '' drop here;
    4. cross-doc substring TRIM (X198,
       ``cross_doc_substring_spans``): every maximal verbatim
       ≥12-token span still shared between a doc pair is cut from the
       larger-id side (keep-first — doc_a < doc_b by construction),
       and the trimmed text is REBUILT and fed downstream — the Lee
       et al. 2022 placement, before doc-level dedup, where it
       demonstrably subsumes most of what exact/near dedup would
       otherwise drop (fixture: 1062 tokens + 13 fully-copied docs
       die here; the exact-dedup stage then only finds 7);
    5. linear quality gate (X156 inference shape) — naive-Bayes
       log-odds weights derived from the TRIMMED corpus, integer-nano
       scores, keep score > 0;
    6. exact dedup on the trimmed text (X1 shape — min-id per md5);
    7. near-dup drop (X2, ``ngram_jaccard_pairs`` at Jaccard ≥ 0.8,
       drop the doc_b side).

    Output: one row per stage boundary — (stage, n_docs, n_tokens) of
    the surviving corpus, so the accounting proves WHERE documents and
    tokens die, which is the acceptance artifact data engineers read
    before green-lighting a run (singleton queries verify each stage;
    only this composition verifies the handoffs: rebuilt text from 2
    feeds 3's census, 4's rebuilt trim feeds 5's weight DERIVATION —
    not just its scoring — and 6/7 hash the trimmed bytes).

    Scale & plan: stages 1-2 are per-row HOF projections in the scan;
    stage 3 is the operator's two bounded shuffles; stage 4 is the
    span operator's two exchanges plus a co-partitioned (doc, pos)
    anti-join — the trim rebuild is exploded-relational, never a
    chained HOF (janino compile hazard). The stage frames ``base`` and
    ``d4`` are localCheckpoint-pinned because multiple consumers
    branch off each (stage aggregates, span build, weight build, score
    join) — unlike X25's deliberately-unpinned ``uniq`` (2 consumers,
    thin lineage), their lineages contain collect_list rebuilds, which
    must not replay per branch. Survivor frames ``kept``/``uniq`` pin
    for the same reason (window + pair scan + anti-join fan-out).
    Weights broadcast; the score join shuffles (doc_id, text) once —
    at 100 TB each checkpoint is the stage materialization a
    production pipeline writes anyway."""
    from seng550_a3_etl_spark.functions.text import repair_text
    from seng550_a3_etl_spark.operators.text_dedup import (
        cross_doc_substring_spans,
        dedup_doc_spans_exploded,
        ngram_jaccard_pairs,
        remove_boilerplate_spans,
    )

    def tokcnt(col: Column) -> Column:
        c = F.coalesce(col, F.lit(""))
        return (
            F.when(F.length(c) == 0, F.lit(0))
            .otherwise(F.size(tokens(c)))
            .cast("long")
        )

    t = load_tables(spark, sf_dir)
    # rep pins so the span stage reads a materialized string column:
    # unpinned, the repair HOF inlines into every span-split reference
    # and the composed expression's codegen compile dominates the job
    # at bench scale (r9: 112 s -> ~25 s end-to-end with the pins plus
    # the exploded span stage below).
    from seng550_a3_etl_spark.plans.layout import spread_for_cpu

    rep = spread_for_cpu(t.documents).select(
        "doc_id",
        "lang",
        tokcnt(F.col("text")).alias("n0"),
        repair_text(F.col("text")).alias("t1"),
    ).withColumn("n1", tokcnt(F.col("t1"))).localCheckpoint(eager=True)
    # Exploded form, not the zero-shuffle HOF form the X155 singleton
    # uses: byte-identical output (unit-tested equal), but each
    # generated class stays small — chaining three scan-stage HOF
    # rebuilds in one job is exactly the composition that makes the
    # janino compile the dominant cost (see the operator docstring).
    sd = dedup_doc_spans_exploded(
        rep, "doc_id", "t1", k=_DOC_SPAN_K, carry=("lang", "n0", "n1")
    )
    d2 = sd.select(
        "doc_id", "lang", "n0", "n1", F.col("dedup_text").alias("t2")
    ).withColumn("n2", tokcnt(F.col("t2")))
    bp = remove_boilerplate_spans(
        d2, "doc_id", "t2", k=_BOILER_K, min_docs=_BOILER_MIN_DOCS,
        carry=("lang", "n0", "n1", "n2"),
    )
    base = bp.select(
        "doc_id", "lang", "n0", "n1", "n2",
        F.col("clean_text").alias("t3"),
        tokcnt(F.col("clean_text")).alias("n3"),
    ).localCheckpoint(eager=True)

    s_base = base.agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.coalesce(F.sum("n0"), F.lit(0)).cast("long").alias("s0"),
        F.coalesce(F.sum("n1"), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum("n2"), F.lit(0)).cast("long").alias("s2"),
        F.coalesce(
            F.sum(F.when(F.col("n3") > 0, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("c3"),
        F.coalesce(F.sum("n3"), F.lit(0)).cast("long").alias("s3"),
    )
    rows_base = s_base.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("00_raw").alias("stage"),
                    F.col("c").alias("n_docs"),
                    F.col("s0").alias("n_tokens"),
                ),
                F.struct(
                    F.lit("01_repair").alias("stage"),
                    F.col("c").alias("n_docs"),
                    F.col("s1").alias("n_tokens"),
                ),
                F.struct(
                    F.lit("02_span_dedup").alias("stage"),
                    F.col("c").alias("n_docs"),
                    F.col("s2").alias("n_tokens"),
                ),
                F.struct(
                    F.lit("03_boilerplate").alias("stage"),
                    F.col("c3").alias("n_docs"),
                    F.col("s3").alias("n_tokens"),
                ),
            )
        ).alias("r")
    ).select("r.*")

    # Stage 4 (X198 composed): maximal verbatim ≥12-token spans shared
    # across doc pairs of the boilerplate-cleaned corpus; keep-first —
    # every span row has doc_a < doc_b by construction, so the b-side
    # copy is cut. The cut set is the exploded (doc, position) union of
    # the b-side spans (DISTINCT absorbs overlapping spans from
    # different partners), the rebuild an anti-join on it — the
    # exploded-relational form, not a per-row HOF chain (the janino
    # compile hazard the r9 session notes flag for 3+ chained HOF
    # rebuilds). At 100 TB the cut explode is bounded by shared-span
    # mass, the anti-join co-partitions on (doc, pos), and the rebuild
    # groupBy is the stage materialization a production trim writes.
    spans4 = cross_doc_substring_spans(
        base.filter(F.col("n3") > 0).select("doc_id", "t3"),
        "doc_id",
        "t3",
        k=_XSPAN_K,
        min_span_tokens=_XSPAN_MIN,
        max_anchor_freq=_XSPAN_MAXF,
    )
    cut = spans4.select(
        F.col("doc_b").alias("doc_id"),
        F.explode(
            F.sequence(
                F.col("b_start"),
                F.col("b_start") + F.col("span_tokens") - 1,
            )
        ).alias("pos"),
    ).distinct()
    tok_pos = base.filter(F.col("n3") > 0).select(
        "doc_id", F.posexplode(tokens(F.col("t3"))).alias("pos", "tok")
    )
    re4 = (
        tok_pos.join(cut, ["doc_id", "pos"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("t4"),
            F.count(F.lit(1)).cast("long").alias("n4"),
        )
    )
    d4 = (
        base.join(re4, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("t4", F.lit("")).alias("t4"),
            F.coalesce("n4", F.lit(0)).cast("long").alias("n4"),
        )
        .localCheckpoint(eager=True)
    )
    s4 = d4.agg(
        F.coalesce(
            F.sum(F.when(F.col("n4") > 0, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("n_docs"),
        F.coalesce(F.sum("n4"), F.lit(0)).cast("long").alias("n_tokens"),
    ).select(
        F.lit("04_substring_trim").alias("stage"), "n_docs", "n_tokens"
    )

    toks4 = d4.filter(F.col("n4") > 0).select(
        "doc_id", "lang", F.explode(tokens(F.col("t4"))).alias("tok")
    )
    counts = toks4.groupBy("tok").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("lang") != "en", 1).otherwise(0)).alias("c0"),
    )
    tot = counts.agg(
        F.sum("c1").alias("s1_"),
        F.sum("c0").alias("s0_"),
        F.count(F.lit(1)).alias("v"),
    )
    w = counts.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.round(
            F.log(
                ((F.col("c1") + 1) / (F.col("s1_") + F.col("v")))
                / ((F.col("c0") + 1) / (F.col("s0_") + F.col("v")))
            )
            * 1e9
        )
        .cast("long")
        .alias("w_nano"),
    )
    scored = (
        toks4.join(F.broadcast(w), "tok")
        .groupBy("doc_id")
        .agg(F.sum("w_nano").alias("score_nano"))
    )
    kept = (
        d4.filter(F.col("n4") > 0)
        .select("doc_id", "t4", "n4")
        .join(scored, "doc_id")
        .filter(F.col("score_nano") > 0)
        .select("doc_id", "t4", "n4")
        .localCheckpoint(eager=True)
    )

    w_hash = Window.partitionBy(F.md5("t4"))
    uniq = (
        kept.withColumn("__canon", F.min("doc_id").over(w_hash))
        .filter(F.col("doc_id") == F.col("__canon"))
        .select("doc_id", "t4", "n4")
        .localCheckpoint(eager=True)
    )
    near = (
        ngram_jaccard_pairs(
            uniq, "doc_id", "t4", n=3, threshold=0.8, max_shingle_freq=64
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    final = uniq.join(near, "doc_id", "left_anti")

    def srow(name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("n4"), F.lit(0)).cast("long").alias("n_tokens"),
        ).select(F.lit(name).alias("stage"), "n_docs", "n_tokens")

    return (
        rows_base.unionByName(s4)
        .unionByName(srow("05_quality_gate", kept))
        .unionByName(srow("06_exact_dedup", uniq))
        .unionByName(srow("07_near_dedup", final))
    )


def _source_dedup_matrix_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    return f"""
    WITH pairs AS ({ORACLES["minhash_dup_pairs"]})
    SELECT least(da.source, db.source) AS src_a,
           greatest(da.source, db.source) AS src_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           MAX(p.jaccard) AS max_jaccard
    FROM pairs p
    JOIN documents da ON da.doc_id = p.doc_a
    JOIN documents db ON db.doc_id = p.doc_b
    GROUP BY 1, 2
    """


@query("source_dedup_matrix", oracle=_source_dedup_matrix_oracle())
def source_dedup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication census (X169): near-dup pairs (the
    MinHash-LSH tier, verified Jaccard >= 0.8) rolled up by unordered
    source pair — the diagnostic that tells a curation run WHICH
    sources mirror each other (crawl overlap, syndication) vs which
    duplicate internally, and therefore which pair deserves a
    cross-source canonical-keep rule. Source pair is normalized
    (least, greatest) so the matrix is triangular; max is the only
    float aggregate (order-independent, bit-stable).

    Scale: rides the session-cached pair build (bucketed LSH — never
    all-pairs); the rollup joins the pair list (tiny) to the two-column
    (doc_id, source) projection and folds to |sources|² rows."""
    t = load_tables(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        t.documents, "doc_id", "text", n=3, num_perm=MINHASH_NUM_PERM,
        bands=MINHASH_BANDS, threshold=MINHASH_THRESHOLD,
        shingle_sets=_shingle_sets_df(spark, sf_dir, n=3, hashed=False),
        signatures=_minhash_sigs_df(spark, sf_dir),
    )
    src = t.documents.select("doc_id", "source")
    joined = (
        pairs.select("doc_a", "doc_b", "jaccard")
        .join(
            src.select(
                F.col("doc_id").alias("doc_a"),
                F.col("source").alias("__sa"),
            ),
            "doc_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("doc_b"),
                F.col("source").alias("__sb"),
            ),
            "doc_b",
        )
    )
    return (
        joined.groupBy(
            F.least("__sa", "__sb").alias("src_a"),
            F.greatest("__sa", "__sb").alias("src_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )


_CV_FOLDS = 5


def _cv_folds_oracle() -> str:
    from seng550_a3_etl_spark.functions.hashing import duck_hash64
    from seng550_a3_etl_spark.suite.registry import ORACLES

    h = duck_hash64("CAST(canonical_id AS VARCHAR)", seed=47)
    return f"""
    WITH labels AS ({ORACLES["dup_clusters"]})
    SELECT doc_id, canonical_id,
           CAST({h} % {_CV_FOLDS} AS BIGINT) AS fold
    FROM labels
    """


@query("crossval_fold_assignment", oracle=_cv_folds_oracle())
def crossval_fold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free k-fold assignment (X192): X71's cluster-keyed hash
    split generalized to {k} cross-validation folds — every document in
    a near-dup cluster lands in the SAME fold (hash of the canonical
    id, not the doc id), so no fold's held-out set contains a
    paraphrase of another fold's training data; the failure mode that
    silently inflates every cross-validated quality-classifier score
    (X156) trained on undeduplicated text. Hash-stable: adding
    documents never reassigns an existing cluster's fold.

    Scale: zero shuffle past the (session-cached) cluster-label build —
    the fold is a per-row stable hash, the same X26/X71 construction.
    """
    labels = _labels_df(spark, sf_dir)
    return labels.select(
        "doc_id",
        "canonical_id",
        (
            hash64(F.col("canonical_id").cast("string"), seed=47)
            % _CV_FOLDS
        ).cast("long").alias("fold"),
    )


@query(
    "cross_doc_substring_dedup",
    oracle=rf"""
    WITH xd AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents
    ),
    {_xspan_ctes('x', 'xd')}
    SELECT doc_a, doc_b, a_start, b_start, span_tokens FROM xspans
    """,
)
def cross_doc_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-substring dedup (X198) — the missing rung
    between window-position counting (X89) and doc-level near-dup
    (X2/X3): every maximal verbatim token span of ≥ 12 tokens shared
    between a document pair, with both sides' 0-based offsets — the
    Lee et al. 2022 substring-dedup signal, re-expressed as k-gram
    anchor postings + per-diagonal gaps-and-islands instead of a
    distributed suffix array. Downstream, the b-side offsets are what a
    trimming pass cuts (keep-first: the smaller doc id holds the
    canonical copy).

    Scale: see ``operators.text_dedup.cross_doc_substring_spans`` —
    text never shuffles (hash/pos longs only), the stop-list bounds the
    per-anchor pair budget, two exchanges total. The oracle replays
    the identical anchor/stop-list/island construction in SQL, so the
    stop-list's span-splitting behavior is checked, not idealized."""
    return _xspan_spans_df(spark, sf_dir)


@query(
    "doc_substring_coverage",
    oracle=rf"""
    WITH xd AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents
    ),
    {_xspan_ctes('x', 'xd')},
    cov AS (
      SELECT doc_id, CAST(SUM(cov) AS BIGINT) AS covered FROM (
        SELECT doc_id, isl, MAX(e) - MIN(s) AS cov FROM (
          SELECT doc_id, s, e,
                 SUM(CASE WHEN prev_e IS NULL OR s >= prev_e
                     THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS isl
          FROM (
            SELECT doc_b AS doc_id, b_start AS s,
                   b_start + span_tokens AS e,
                   MAX(b_start + span_tokens) OVER (
                     PARTITION BY doc_b
                     ORDER BY b_start, b_start + span_tokens
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING) AS prev_e
            FROM xspans))
        GROUP BY doc_id, isl)
      GROUP BY doc_id
    )
    SELECT c.doc_id, c.covered,
           CAST(len(d.tk) AS BIGINT) AS n_tokens,
           CAST(c.covered * 1000000 // len(d.tk) AS BIGINT)
             AS covered_ppm
    FROM cov c JOIN xd d USING (doc_id)
    """,
)
def doc_substring_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document substring-duplication burden (X199): for every doc
    that is the KEEP-LAST side of at least one X198 shared span (doc_b
    — the copy a keep-first trim cuts), the total token count covered
    by the UNION of those spans, plus the doc's token count and the
    coverage in exact integer ppm — the per-doc number a trim pass
    reports and a curation dashboard thresholds on ("docs ≥50%
    verbatim-copied from an earlier doc").

    Overlapping spans from different partners must not double-count a
    position, so coverage is the interval union
    (``operators.text_dedup.union_span_coverage`` — the one-exchange
    distributed sweep), not a sum of span lengths. ppm is integer
    ``DIV`` (covered ≤ n_tokens, so the 1e6 numerator is overflow-safe
    at any doc length).

    Scale: the span build's two exchanges + the sweep's one (keyed on
    doc_id) + a doc_id equi-join against the two-column token-count
    projection. Only covered docs emit rows — at web scale this output
    is the trim worklist, proportional to duplicated mass, not corpus
    size."""
    from seng550_a3_etl_spark.operators.text_dedup import (
        union_span_coverage,
    )

    t = load_tables(spark, sf_dir)
    spans = _xspan_spans_df(spark, sf_dir)
    cov = union_span_coverage(
        spans.select(
            F.col("doc_b").alias("doc_id"), "b_start", "span_tokens"
        ),
        ["doc_id"],
        "b_start",
        "span_tokens",
    )
    nt = t.documents.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    return cov.join(nt, "doc_id").select(
        "doc_id",
        "covered",
        "n_tokens",
        F.expr("covered * 1000000 DIV n_tokens").alias("covered_ppm"),
    )


# Census tiers in ladder order; the output carries one in_<tier>
# boolean per entry.
_DELTA_TIERS = (
    "exact",
    "normalized",
    "spandedup",
    "substring",
    "ngram",
    "minhash",
    "simhash",
    "semantic",
)


def _dedup_delta_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES
    from seng550_a3_etl_spark.suite.vectors import (
        _SEMDEDUP_CENT_SQL,
        _SEMDEDUP_THRESHOLD,
        _cos,
    )

    na = _DUCK_NORM.format(col="a.text")
    nb = _DUCK_NORM.format(col="b.text")
    flags = ",\n           ".join(
        f"bool_or(tier = '{t}') AS in_{t}" for t in _DELTA_TIERS
    )
    return rf"""
    WITH xd AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents
    ),
    {_xspan_ctes('x', 'xd')},
    sd AS (SELECT doc_id, dedup_text
           FROM ({ORACLES["doc_dedup_spans"]})),
    sem_assign AS (
      SELECT id, v, bid FROM (
        SELECT id, v, bid, ROW_NUMBER() OVER (
          PARTITION BY id ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT e.vec_id AS id, e.embedding AS v, c.bid,
                     ROUND({_cos('e.embedding', 'c.bv')}, 6) AS sim
              FROM embeddings e, ({_SEMDEDUP_CENT_SQL}) c)
      ) WHERE rn = 1
    ),
    u AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 'exact' AS tier
      FROM documents a JOIN documents b
        ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
      UNION ALL
      SELECT a.doc_id, b.doc_id, 'normalized'
      FROM documents a JOIN documents b
        ON md5({na}) = md5({nb}) AND a.doc_id < b.doc_id
      UNION ALL
      SELECT a.doc_id, b.doc_id, 'spandedup'
      FROM sd a JOIN sd b
        ON md5(a.dedup_text) = md5(b.dedup_text)
       AND a.doc_id < b.doc_id AND a.dedup_text <> ''
      UNION ALL
      SELECT DISTINCT doc_a, doc_b, 'substring' FROM xspans
      UNION ALL
      SELECT doc_a, doc_b, 'ngram'
      FROM ({ORACLES["ngram_dup_pairs"]})
      UNION ALL
      SELECT doc_a, doc_b, 'minhash'
      FROM ({ORACLES["minhash_dup_pairs"]})
      UNION ALL
      SELECT doc_a, doc_b, 'simhash'
      FROM ({ORACLES["simhash_near_pairs"]})
      UNION ALL
      SELECT a.id, b.id, 'semantic'
      FROM sem_assign a JOIN sem_assign b
        ON a.bid = b.bid AND a.id < b.id
      WHERE ROUND({_cos('a.v', 'b.v')}, 6) >= {_SEMDEDUP_THRESHOLD}
    )
    SELECT doc_a, doc_b,
           {flags}
    FROM u GROUP BY doc_a, doc_b
    """


# (applicationId, sf_dir) -> materialized 8-tier census. The census
# is consumed by TWO suite queries (the X146 delta itself and the X202
# funnel) and is pair-set-sized (tiny vs the corpus), so it follows the
# _SHINGLE_CACHE/_XSPAN_CACHE convention: at 100 TB it is a
# materialized artifact one job writes; localCheckpoint is the
# session-scoped analog.
_CENSUS_CACHE: dict[tuple[str, str], DataFrame] = {}


@query("dedup_strategy_delta", oracle=_dedup_delta_oracle())
def dedup_strategy_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X146 (extended r10 per VERDICT r9 #6) — the FULL dedup-family
    agreement census: every candidate duplicate pair flagged with its
    membership in each of the engine's eight dedup tiers —

    - ``exact`` (X1): byte-identical content;
    - ``normalized`` (X91): identical after lowercase/punct/ws
      canonicalization;
    - ``spandedup`` (X155-canonical): identical after intra-doc
      repeated-span removal (catches self-padded copies);
    - ``substring`` (X198): share a maximal verbatim span ≥12 tokens;
    - ``ngram`` (X2): exact shingle Jaccard ≥ 0.8;
    - ``minhash`` (X3): MinHash+LSH verified at the same threshold;
    - ``simhash`` (X4): fingerprint Hamming ≤ 3;
    - ``semantic`` (X164): SemDeDup in-cluster embedding cosine
      ≥ 0.95, keyed by the fixture's vec_id↔doc_id alignment (the
      hybrid-search query's standing convention). The fixture's
      embeddings are random vectors (measured max real-pair cosine
      0.51), so this flag is all-false here by construction — the
      join path and oracle replay are still exercised; at production
      the embeddings derive from the text and the tier is live.

    The census is THE acceptance artifact for choosing a production
    dedup stack: in_ngram ∧ ¬in_minhash quantifies LSH banding recall,
    in_substring ∧ ¬in_ngram counts partial-copy pairs doc-level
    Jaccard misses, in_normalized ∧ ¬in_exact measures reformatting,
    and rows where ONLY the cheap tiers fire justify skipping the
    expensive ones.

    Scale: each tier emits a threshold-filtered PAIR set (tiny vs the
    corpus); hash-equality tiers group by a 128-bit digest and emit
    C(g,2) pairs per group with the bucket HOF (a production census
    caps group size exactly like the posting stop-list); the union is
    one tag column wider than the widest tier and the rollup is a
    single (doc_a, doc_b) groupBy with bool_or flags — one shuffle
    over the union of pair sets. Materialized once per (application,
    sf_dir) and shared with the X202 funnel via ``_CENSUS_CACHE``."""
    _evict_stopped_sessions(_CENSUS_CACHE)
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _CENSUS_CACHE.get(key)
    if cached is not None:
        return cached

    from seng550_a3_etl_spark.operators.similarity import (
        semantic_dedup_pairs,
    )
    from seng550_a3_etl_spark.operators.text_dedup import (
        bucket_pairs,
        dedup_doc_spans_exploded,
    )
    from seng550_a3_etl_spark.suite.vectors import (
        _SEMDEDUP_THRESHOLD,
        _semdedup_cent,
    )

    t = load_tables(spark, sf_dir)
    docs = t.documents

    def hash_tier(keyed: DataFrame, tier: str) -> DataFrame:
        return bucket_pairs(keyed, ["__h"], F.col("doc_id")).select(
            F.col("a").alias("doc_a"),
            F.col("b").alias("doc_b"),
            F.lit(tier).alias("tier"),
        )

    def tag(pairs: DataFrame, tier: str) -> DataFrame:
        return pairs.select(
            "doc_a", "doc_b", F.lit(tier).alias("tier")
        )

    ex = hash_tier(
        docs.select("doc_id", F.md5("text").alias("__h")), "exact"
    )
    nm = hash_tier(
        docs.select(
            "doc_id", F.md5(_spark_norm(F.col("text"))).alias("__h")
        ),
        "normalized",
    )
    sd = dedup_doc_spans_exploded(docs, "doc_id", "text", k=_DOC_SPAN_K)
    sp = hash_tier(
        sd.filter(F.col("dedup_text") != "").select(
            "doc_id", F.md5("dedup_text").alias("__h")
        ),
        "spandedup",
    )
    sub = tag(
        _xspan_spans_df(spark, sf_dir)
        .select("doc_a", "doc_b")
        .distinct(),
        "substring",
    )
    ng = tag(ngram_dup_pairs(spark, sf_dir).select("doc_a", "doc_b"),
             "ngram")
    mh = tag(minhash_dup_pairs(spark, sf_dir).select("doc_a", "doc_b"),
             "minhash")
    sh = tag(simhash_near_pairs(spark, sf_dir).select("doc_a", "doc_b"),
             "simhash")
    cent = _semdedup_cent(t.embeddings)
    sem = tag(
        semantic_dedup_pairs(
            t.embeddings.select(
                F.col("vec_id").alias("id"), F.col("embedding").alias("v")
            ),
            cent,
            threshold=_SEMDEDUP_THRESHOLD,
        ).select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
        ),
        "semantic",
    )
    u = ex
    for frame in (nm, sp, sub, ng, mh, sh, sem):
        u = u.unionByName(frame)
    out = u.groupBy("doc_a", "doc_b").agg(
        *[
            F.max(F.col("tier") == tier).alias(f"in_{tier}")
            for tier in _DELTA_TIERS
        ]
    ).localCheckpoint(eager=True)
    _CENSUS_CACHE[key] = out
    return out


@query(
    "cross_source_span_flow",
    oracle=rf"""
    WITH xd AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents
    ),
    {_xspan_ctes('x', 'xd')}
    SELECT da.source AS src_from, db.source AS src_to,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(COUNT(DISTINCT s.doc_a * 1000000 + s.doc_b) AS BIGINT)
             AS n_pairs,
           CAST(SUM(s.span_tokens) AS BIGINT) AS span_tokens
    FROM xspans s
    JOIN documents da ON da.doc_id = s.doc_a
    JOIN documents db ON db.doc_id = s.doc_b
    GROUP BY 1, 2
    """,
)
def cross_source_span_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional source-level copy flow at substring granularity
    (X200): the X198 maximal shared spans rolled up by (source of the
    keep side, source of the trim side) — under keep-first the smaller
    id (doc_a) is the canonical copy, so a row says "content flowed
    FROM src_from TO src_to". The matrix a curation run reads to find
    syndication/scraper relationships BETWEEN feeds — complementing
    X169's near-dup source matrix, which only sees whole-document
    similarity and is symmetric. ``span_tokens`` is raw span mass
    (per-pair overlaps intentionally not unioned here; X199 reports
    the per-doc union).

    Determinism: the pair key for the distinct count packs
    (doc_a, doc_b) into one integer (ids < 1e6 in every fixture and
    the pack is identical in both engines).

    Scale: the span build's two exchanges; the source attribution is
    two doc_id equi-joins against the (doc_id, source) projection and
    the rollup is |sources|² rows."""
    t = load_tables(spark, sf_dir)
    spans = _xspan_spans_df(spark, sf_dir)
    src = t.documents.select("doc_id", "source")
    return (
        spans.join(
            src.select(
                F.col("doc_id").alias("doc_a"),
                F.col("source").alias("src_from"),
            ),
            "doc_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("doc_b"),
                F.col("source").alias("src_to"),
            ),
            "doc_b",
        )
        .groupBy("src_from", "src_to")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.countDistinct(
                F.col("doc_a") * 1000000 + F.col("doc_b")
            ).cast("long").alias("n_pairs"),
            F.sum("span_tokens").cast("long").alias("span_tokens"),
        )
    )


@query(
    "anchor_stoplist_census",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents
    ),
    a AS (
      SELECT unnest(list_transform(
               range(1, greatest(len(tk) - {_XSPAN_K - 1}, 0) + 1),
               i -> {duck_hash64(
                   f"array_to_string(tk[i:i+{_XSPAN_K - 1}], ' ')"
               )})) AS h
      FROM d
    ),
    freqs AS (SELECT h, COUNT(*) AS f FROM a GROUP BY h)
    SELECT CAST(1 << (length(ltrim(bin(f), '0')) - 1) AS BIGINT)
             AS freq_bucket,
           f > {_XSPAN_MAXF} AS dropped,
           CAST(COUNT(*) AS BIGINT) AS n_anchors,
           CAST(SUM(f) AS BIGINT) AS n_positions
    FROM freqs GROUP BY 1, 2
    """,
)
def anchor_stoplist_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observability for the X198 stop-list approximation (X201): the
    corpus-frequency histogram of k-gram anchors (power-of-two
    buckets), each bucket flagged with whether its anchors fall to the
    ``max_anchor_freq`` stop-list — the artifact that says how much
    window mass the substring pass ignores (dropped positions are
    boilerplate by definition) and where to set the knob. The pow2
    bucket is the HLL bit-length idiom (ltrim-bin), identical in both
    engines.

    Scale: one corpus scan to hashed (h) rows, ONE map-side-combined
    groupBy to |distinct anchors| frequencies, then a ≤64-row bucket
    rollup. Anchor strings never leave the scan — only 60-bit longs
    shuffle."""
    # Anchor frequencies from the shared (h, doc, cnt) instance rollup
    # (r15): total instances per anchor = the per-doc counts summed
    # (_XSPAN_K == _SPAN_K == 8, asserted below so a re-parameterization
    # cannot silently desynchronize the cache from this census).
    assert _XSPAN_K == _SPAN_K
    freqs = (
        _anchor_instances_df(spark, sf_dir)
        .groupBy("h")
        .agg(F.sum("cnt").alias("f"))
    )
    bucket = F.expr(
        "CAST(shiftleft(1L, length(ltrim('0', bin(f))) - 1) AS LONG)"
    )
    return freqs.select(
        bucket.alias("freq_bucket"),
        (F.col("f") > _XSPAN_MAXF).alias("dropped"),
        "f",
    ).groupBy("freq_bucket", "dropped").agg(
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
        F.sum("f").cast("long").alias("n_positions"),
    )


def _tier_funnel_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    rows = []
    for i, t in enumerate(_DELTA_TIERS):
        earlier = " OR ".join(f"in_{e}" for e in _DELTA_TIERS[:i])
        marg = f"in_{t} AND NOT ({earlier})" if earlier else f"in_{t}"
        rows.append(
            f"SELECT {i} AS tier_rank, '{t}' AS tier, "
            f"CAST(COUNT(*) FILTER (in_{t}) AS BIGINT) AS n_pairs, "
            f"CAST(COUNT(*) FILTER ({marg}) AS BIGINT) AS n_marginal "
            "FROM census"
        )
    return (
        f"WITH census AS ({ORACLES['dedup_strategy_delta']})\n"
        + "\nUNION ALL\n".join(rows)
    )


@query("dedup_tier_funnel", oracle=_tier_funnel_oracle())
def dedup_tier_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The X146 census folded into the decision artifact (X202): per
    dedup tier (ladder order), how many pairs it catches and how many
    it catches that NO earlier (cheaper) tier already caught — the
    marginal-recall column is what justifies each tier's cost in a
    production stack ("simhash adds 0 pairs over minhash here ⇒ drop
    it"; "substring adds N pairs doc-level tiers miss ⇒ keep it").

    Scale: one pass over the census (itself pair-set-sized, tiny vs
    the corpus); the funnel is 8 aggregates over the same frame folded
    into ONE agg via conditional counts — no per-tier rescans."""
    census = dedup_strategy_delta(spark, sf_dir)
    aggs = []
    for i, tier in enumerate(_DELTA_TIERS):
        caught = F.col(f"in_{tier}")
        earlier = None
        for e in _DELTA_TIERS[:i]:
            earlier = (
                F.col(f"in_{e}") if earlier is None
                else (earlier | F.col(f"in_{e}"))
            )
        marginal = caught & ~earlier if earlier is not None else caught
        aggs.append(
            F.sum(caught.cast("long")).cast("long").alias(f"__p{i}")
        )
        aggs.append(
            F.sum(marginal.cast("long")).cast("long").alias(f"__m{i}")
        )
    folded = census.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("tier_rank"),
                F.lit(t).alias("tier"),
                F.col(f"__p{i}").alias("n_pairs"),
                F.col(f"__m{i}").alias("n_marginal"),
            )
            for i, t in enumerate(_DELTA_TIERS)
        ]
    )
    return folded.select(F.explode(rows).alias("r")).select("r.*")


_ZIPF_TOP_N = 100

# OLS slope/intercept from the integer-nano sums — ONE shared SQL text
# parsed by both engines, so the double arithmetic is IEEE-identical
# given identical integer inputs.
_ZIPF_SLOPE = (
    "(n * sxy / 1e9 - (sx / 1e9) * (sy / 1e9))"
    " / (n * sxx / 1e9 - (sx / 1e9) * (sx / 1e9))"
)
_ZIPF_INTERCEPT = f"(sy / 1e9 - ({_ZIPF_SLOPE}) * sx / 1e9) / n"


@query(
    "zipf_slope_fit",
    oracle=rf"""
    WITH toks AS (
      SELECT unnest(string_split_regex(text, '\s+')) AS tok FROM documents
    ),
    freqs AS (SELECT tok, COUNT(*) AS f FROM toks GROUP BY tok),
    top AS (
      SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, tok) AS r
      FROM freqs ORDER BY f DESC, tok LIMIT {_ZIPF_TOP_N}
    ),
    terms AS (
      SELECT CAST(ROUND(LN(r) * 1000000000) AS BIGINT) AS x,
             CAST(ROUND(LN(f) * 1000000000) AS BIGINT) AS y,
             CAST(ROUND(LN(r) * LN(f) * 1000000000) AS BIGINT) AS xy,
             CAST(ROUND(LN(r) * LN(r) * 1000000000) AS BIGINT) AS xx
      FROM top
    ),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(xy) AS DOUBLE) AS sxy,
             CAST(SUM(xx) AS DOUBLE) AS sxx
      FROM terms
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           ROUND({_ZIPF_SLOPE}, 6) AS slope,
           ROUND({_ZIPF_INTERCEPT}, 6) AS intercept
    FROM s
    """,
)
def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution (X204): OLS
    slope of ln(freq) against ln(rank) over the top-100 tokens — a
    natural-language corpus sits near −1; a slope drifting toward 0
    flags templated/generated text, one far below −1 flags a
    boilerplate-dominated head. The single-number corpus-health check
    a curation dashboard tracks per crawl.

    Determinism: rank is a row_number on the total order
    (freq DESC, token) shared by both engines; every per-token ln term
    is quantized to integer nanos BEFORE summation (the X69
    order-independent-statistics pattern), and the closing OLS
    arithmetic is ONE shared SQL text evaluated on those identical
    integers — bit-stable.

    Scale: one corpus scan to the token-frequency rollup
    (map-side-combined), then a TakeOrdered top-100 (per-partition
    heaps, never a global sort) and arithmetic on 100 rows. The
    |vocab|-row rollup is the only shuffle."""
    t = load_tables(spark, sf_dir)
    freqs = (
        t.documents.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    top = (
        freqs.orderBy(F.desc("f"), F.asc("tok"))
        .limit(_ZIPF_TOP_N)
        .select(
            "f",
            F.row_number()
            .over(Window.orderBy(F.desc("f"), F.asc("tok")))
            .alias("r"),
        )
    )
    nano = lambda c: F.round(c * 1e9).cast("long")  # noqa: E731
    terms = top.select(
        nano(F.log("r")).alias("x"),
        nano(F.log("f")).alias("y"),
        nano(F.log("r") * F.log("f")).alias("xy"),
        nano(F.log("r") * F.log("r")).alias("xx"),
    )
    s = terms.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("xy").cast("double").alias("sxy"),
        F.sum("xx").cast("double").alias("sxx"),
    )
    return s.select(
        # n_points = fitted rank points (min(|vocab|, top-N)), NOT a
        # token count — named for what it is (review r10)
        F.col("n").cast("long").alias("n_points"),
        F.expr(f"ROUND({_ZIPF_SLOPE}, 6)").alias("slope"),
        F.expr(f"ROUND({_ZIPF_INTERCEPT}, 6)").alias("intercept"),
    )


# LSH band-configuration grid: every (bands, rows_per_band) factoring
# of the 8-permutation signature. The production config is (4, 2).
_BAND_GRID = ((1, 8), (2, 4), (4, 2), (8, 1))


def _pow_chain(base: str, e: int) -> str:
    """x**e for e in {1,2,4,8} as a repeated-squaring product — ONE
    text both engines parse, so the IEEE sequence is identical (pow()
    implementations may differ across engines; chained * cannot)."""
    s = base
    while e > 1:
        s = f"({s} * {s})"
        e //= 2
    return s


def _capture_micros(j: str, bands: int, rpb: int) -> str:
    """round(1e6 * (1 - (1 - j^r)^b)) — the S-curve capture
    probability of an LSH config for a pair at Jaccard ``j``."""
    miss = f"(1.0 - {_pow_chain(j, rpb)})"
    return (
        f"CAST(ROUND((1.0 - {_pow_chain(miss, bands)}) * 1000000)"
        " AS BIGINT)"
    )


def _band_tuning_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    rows = [
        f"SELECT {b} AS bands, {r} AS rows_per_band, "
        "CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        f"CAST(SUM({_capture_micros('jaccard', b, r)}) // COUNT(*)"
        " AS BIGINT) AS est_recall_ppm "
        "FROM pairs"
        for b, r in _BAND_GRID
    ]
    return (
        f"WITH pairs AS ({ORACLES['ngram_dup_pairs']})\n"
        + "\nUNION ALL\n".join(rows)
    )


@query("minhash_band_tuning", oracle=_band_tuning_oracle())
def minhash_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-configuration tuning table (X205): for every (bands,
    rows-per-band) factoring of the 8-perm MinHash signature, the
    expected recall over the VERIFIED near-dup pair set — each pair at
    Jaccard j is captured by at least one band with probability
    1 − (1 − j^r)^b (the S-curve), and averaging that over the exact
    ground-truth pairs (X2) gives the recall each config would deliver
    on THIS corpus. The artifact that justifies the production (4, 2)
    choice with a measurement instead of the generic S-curve plot —
    and at 100 TB it prices a re-banding before anyone re-hashes the
    corpus.

    Determinism: powers are repeated-squaring product chains in ONE
    SQL text shared by both engines (pow() is not cross-engine
    IEEE-stable; chained * is); per-pair capture quantizes to integer
    micros before the sum; the average is integer DIV.

    Scale: one pass over the threshold-filtered pair set (tiny vs the
    corpus, session-cached shingle sets); all four configs fold in ONE
    aggregate — no per-config rescans."""
    pairs = ngram_dup_pairs(spark, sf_dir).select("jaccard")
    aggs = []
    for i, (b, r) in enumerate(_BAND_GRID):
        aggs.append(F.count(F.lit(1)).cast("long").alias(f"__n{i}"))
        aggs.append(
            F.sum(F.expr(_capture_micros("jaccard", b, r))).alias(f"__s{i}")
        )
    folded = pairs.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(b).alias("bands"),
                F.lit(r).alias("rows_per_band"),
                F.col(f"__n{i}").alias("n_pairs"),
                F.expr(f"__s{i} DIV __n{i}").alias("est_recall_ppm"),
            )
            for i, (b, r) in enumerate(_BAND_GRID)
        ]
    )
    return folded.select(F.explode(rows).alias("r")).select("r.*")


_HEAPS_BUCKETS = 10


@query(
    "heaps_vocab_growth",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
      FROM documents
    ),
    fo AS (SELECT tok, MIN(doc_id) AS fd FROM toks GROUP BY tok),
    n AS (SELECT COUNT(*) AS nd,
                 (COUNT(*) + {_HEAPS_BUCKETS - 1}) // {_HEAPS_BUCKETS}
                   AS w
          FROM documents),
    b AS (
      SELECT fd // n.w AS bucket, COUNT(*) AS new_tokens
      FROM fo, n GROUP BY 1
    ),
    g AS (SELECT unnest(range(0, {_HEAPS_BUCKETS})) AS bucket)
    SELECT CAST(LEAST((g.bucket + 1) * n.w, n.nd) AS BIGINT)
             AS prefix_docs,
           CAST(COALESCE(b.new_tokens, 0) AS BIGINT) AS new_tokens,
           CAST(SUM(COALESCE(b.new_tokens, 0)) OVER (
                  ORDER BY g.bucket) AS BIGINT) AS vocab_size
    FROM g LEFT JOIN b USING (bucket), n
    """,
)
def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve (X209): distinct-token count
    at 10 equal document-count prefixes of the corpus (doc_id as
    ingest order) — the companion to X204's Zipf fit: natural text
    grows vocabulary ~n^β (β≈0.5); a curve that flattens early flags
    template/boilerplate corpora, one that stays linear flags
    noise/IDs. Computed WITHOUT a quadratic prefix-distinct: a token
    is new exactly at its FIRST-occurrence doc, so the per-bucket new
    counts are a |vocab|-rollup histogram and the curve is their
    running sum. (On the synthetic fixture the detector fires exactly
    as designed: the generator's closed 31-token vocabulary is
    exhausted inside the first bucket and the curve is flat — the
    template-corpus signature.)

    Scale: one corpus explode → (token, min doc) rollup
    (map-side-combined, the only corpus-sized shuffle) → a 10-row
    histogram; the cumulative window runs over exactly 10 rows
    (bounded by construction, so the single-partition window is
    free). Bucket width derives from the doc count, so the output is
    always 10 rows at any sf."""
    t = load_tables(spark, sf_dir)
    fo = (
        t.documents.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
        )
        .groupBy("tok")
        .agg(F.min("doc_id").alias("fd"))
    )
    # Pinned scalar: consumed by the bucket rollup AND the final
    # projection — unpinned, each consumer re-scanned the corpus.
    n = t.documents.agg(
        F.count(F.lit(1)).alias("nd"),
        F.expr(
            f"(COUNT(1) + {_HEAPS_BUCKETS - 1}) DIV {_HEAPS_BUCKETS}"
        ).alias("w"),
    ).localCheckpoint(eager=True)
    b = (
        fo.crossJoin(F.broadcast(n))
        .groupBy(F.expr("fd DIV w").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("new_tokens"))
    )
    g = spark.range(_HEAPS_BUCKETS).select(F.col("id").alias("bucket"))
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        g.join(b, "bucket", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "bucket",
            F.least((F.col("bucket") + 1) * F.col("w"), F.col("nd"))
            .cast("long")
            .alias("prefix_docs"),
            F.coalesce("new_tokens", F.lit(0))
            .cast("long")
            .alias("new_tokens"),
        )
        .select(
            "prefix_docs",
            "new_tokens",
            F.sum("new_tokens").over(w_cum).cast("long").alias("vocab_size"),
        )
    )


def _cluster_census_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    return f"""
    WITH labels AS ({ORACLES["dup_clusters"]}),
    sizes AS (
      SELECT canonical_id, COUNT(*) AS sz
      FROM labels GROUP BY canonical_id
    )
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(SUM(sz - 1) AS BIGINT) AS n_droppable
    FROM sizes GROUP BY sz
    """


@query("dup_cluster_size_census", oracle=_cluster_census_oracle())
def dup_cluster_size_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution (X214) — the census
    RefinedWeb/C4-style dedup reports publish: for each near-dup
    cluster size, how many clusters, how much document mass, and how
    many docs keep-one-per-cluster dedup would drop (size−1 per
    cluster). The size distribution is the capacity-planning artifact:
    a heavy tail (one giant boilerplate cluster) changes the dedup
    strategy (span removal before doc drop); a flat census says
    doc-level dedup suffices.

    Labels come from the shared per-session materialization
    (:func:`_labels_df` — the X25 gold-table shape), so the pair scan
    and connected components never re-run; the census itself is a
    (canonical_id) rollup followed by a fold over |clusters| rows —
    two map-side-combined exchanges over label-sized (never
    text-sized) rows."""
    sizes = (
        _labels_df(spark, sf_dir)
        .groupBy("canonical_id")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    return sizes.groupBy(F.col("sz").cast("long").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum("sz").cast("long").alias("n_docs"),
        F.sum(F.col("sz") - 1).cast("long").alias("n_droppable"),
    )


def _quality_dup_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    return f"""
    WITH g AS ({ORACLES["gopher_quality_flags"]}),
    labels AS ({ORACLES["dup_clusters"]}),
    sz AS (
      SELECT canonical_id, COUNT(*) AS cs FROM labels GROUP BY 1
    ),
    m AS (
      SELECT d.source, g.pass_gopher, sz.cs >= 2 AS is_dup
      FROM g
      JOIN labels l ON l.doc_id = g.doc_id
      JOIN sz ON sz.canonical_id = l.canonical_id
      JOIN documents d ON d.doc_id = g.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (is_dup) AS BIGINT) AS n_dup,
           CAST(COUNT(*) FILTER (NOT pass_gopher) AS BIGINT) AS n_lowq,
           CAST(COUNT(*) FILTER (is_dup AND NOT pass_gopher)
                AS BIGINT) AS n_dup_lowq,
           CAST(COUNT(*) FILTER (is_dup) * 1000000 // COUNT(*)
                AS BIGINT) AS dup_ppm,
           CAST(CASE WHEN COUNT(*) FILTER (is_dup) = 0 THEN 0
                ELSE COUNT(*) FILTER (is_dup AND NOT pass_gopher)
                     * 1000000 // COUNT(*) FILTER (is_dup) END
                AS BIGINT) AS lowq_given_dup_ppm
    FROM m GROUP BY source
    """


@query("quality_dup_crosstab", oracle=_quality_dup_oracle())
def quality_dup_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality × duplication cross-signal audit (X215): per source,
    the 2×2 census of the X178 Gopher gate against near-dup cluster
    membership (X25 labels, cluster size ≥ 2) — the correlation check
    a curation run reads before ordering its stages: if duplicates are
    disproportionately low-quality (lowq_given_dup_ppm >> the base
    rate implied by n_lowq/n_docs), dedup-first recovers most of the
    quality gate's drops for free; if the signals are independent,
    both stages earn their cost. Counts and conditional rates are
    exact integer ppm.

    Scale: the gate is a map-only projection; dup membership rides
    the shared per-session label materialization (no pair rescan);
    the join is doc_id-co-partitioned label-sized rows and the rollup
    folds to |sources| rows in one map-side-combined exchange."""
    from seng550_a3_etl_spark.suite.quality import gopher_flags_projection

    t = load_tables(spark, sf_dir)
    flags = gopher_flags_projection(t.documents).select(
        "doc_id", "pass_gopher"
    )
    labels = _labels_df(spark, sf_dir)
    sz = labels.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("cs")
    )
    m = (
        flags.join(labels, "doc_id")
        .join(sz, "canonical_id")
        .join(t.documents.select("doc_id", "source"), "doc_id")
        .select("source", "pass_gopher", (F.col("cs") >= 2).alias("is_dup"))
    )
    n_dup = F.count_if(F.col("is_dup"))
    n_dup_lowq = F.count_if(F.col("is_dup") & ~F.col("pass_gopher"))
    return m.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        n_dup.cast("long").alias("n_dup"),
        F.count_if(~F.col("pass_gopher")).cast("long").alias("n_lowq"),
        n_dup_lowq.cast("long").alias("n_dup_lowq"),
        F.expr(
            "CAST(count_if(is_dup) * 1000000 DIV COUNT(*) AS BIGINT)"
        ).alias("dup_ppm"),
        F.expr(
            "CAST(CASE WHEN count_if(is_dup) = 0 THEN 0"
            " ELSE count_if(is_dup AND NOT pass_gopher) * 1000000"
            " DIV count_if(is_dup) END AS BIGINT)"
        ).alias("lowq_given_dup_ppm"),
    )


def _dedup_shift_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    return rf"""
    WITH labels AS ({ORACLES["dup_clusters"]}),
    d AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS nt
      FROM documents
    ),
    j AS (
      SELECT d.source, d.nt, l.canonical_id = d.doc_id AS kept
      FROM d JOIN labels l USING (doc_id)
    ),
    per AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs_kept,
             CAST(SUM(nt) AS BIGINT) AS n_tok,
             CAST(SUM(CASE WHEN kept THEN nt ELSE 0 END) AS BIGINT)
               AS n_tok_kept
      FROM j GROUP BY source
    ),
    tot AS (SELECT SUM(n_tok) AS tb, SUM(n_tok_kept) AS ta FROM per),
    sh AS (
      SELECT source, n_docs, n_docs_kept, n_tok, n_tok_kept,
             CAST(CAST(n_tok AS HUGEINT) * 1000000 // tb AS BIGINT)
               AS share_before_ppm,
             CAST(CAST(n_tok_kept AS HUGEINT) * 1000000 // ta AS BIGINT)
               AS share_after_ppm
      FROM per, tot
    )
    SELECT source, n_docs, n_docs_kept, n_tok, n_tok_kept,
           share_before_ppm, share_after_ppm,
           share_after_ppm - share_before_ppm AS shift_ppm
    FROM sh
    """


@query("dedup_distribution_shift", oracle=_dedup_shift_oracle())
def dedup_distribution_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-induced mixture shift (X220): per source, token share of
    the corpus BEFORE vs AFTER near-dup pruning (keep = cluster
    canonical, the X21 labels) — deduplication is not
    distribution-neutral (boilerplate-heavy sources shrink most), and a
    curation run must re-check its mixture targets against the
    SURVIVOR distribution, not the raw one (the X203 allocator's input
    changes). shift_ppm is the signed per-source drift, computed from
    the two already-floored integer shares so both engines agree
    trivially.

    Scale: rides the session label cache (the materialized-artifact
    analog); one scan-side token projection, one |sources| rollup, and
    arithmetic against a broadcast scalar row — the label build is the
    only shuffled stage and it is shared with four other queries.

    Reference parity: none (no dedup surface in the reference); extends
    the X78/X202 dedup-accounting family."""
    labels = _labels_df(spark, sf_dir)
    t = load_tables(spark, sf_dir)
    d = t.documents.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("__nt"),
    )
    kept = F.col("canonical_id") == F.col("doc_id")
    per = (
        d.join(labels, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias(
                "n_docs_kept"
            ),
            F.sum("__nt").cast("long").alias("n_tok"),
            F.sum(F.when(kept, F.col("__nt")).otherwise(0))
            .cast("long")
            .alias("n_tok_kept"),
        )
        .localCheckpoint(eager=True)  # tot + final both read this
    )
    tot = per.agg(
        F.sum("n_tok").alias("__tb"), F.sum("n_tok_kept").alias("__ta")
    )
    sh = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_docs_kept",
        "n_tok",
        "n_tok_kept",
        F.expr(
            "CAST(CAST(n_tok AS DECIMAL(38,0)) * 1000000 DIV __tb AS LONG)"
        ).alias("share_before_ppm"),
        F.expr(
            "CAST(CAST(n_tok_kept AS DECIMAL(38,0)) * 1000000 DIV __ta"
            " AS LONG)"
        ).alias("share_after_ppm"),
    )
    return sh.withColumn(
        "shift_ppm",
        (F.col("share_after_ppm") - F.col("share_before_ppm")).cast("long"),
    )


def _simhash_census_oracle() -> str:
    """The candidate-set construction replayed in DuckDB — the combo
    tables come from the operator's own simhash_block_combos, so the
    oracle re-parameterizes with the engine."""
    from seng550_a3_etl_spark.operators.text_dedup import (
        simhash_block_combos,
    )

    combos, offsets, widths = simhash_block_combos(3, 60)
    vals = ", ".join(
        f"({c}, {offsets[i]}, {(1 << widths[i]) - 1}, "
        f"{offsets[j]}, {(1 << widths[j]) - 1}, {1 << widths[j]})"
        for c, (i, j) in enumerate(combos)
    )
    return f"""
    WITH fp AS (
      SELECT doc_id AS doc, {duck_simhash('t')} AS fp FROM {_TOKS}
    ),
    ch AS (
      SELECT doc, fp, c,
             ((fp >> oi) & mi) * sj + ((fp >> oj) & mj) AS ck
      FROM fp, (VALUES {vals}) t(c, oi, mi, oj, mj, sj)
    ),
    cand AS (
      SELECT DISTINCT a.doc AS da, b.doc AS db, a.fp AS fa, b.fp AS fb
      FROM ch a JOIN ch b ON a.c = b.c AND a.ck = b.ck AND a.doc < b.doc
    )
    SELECT CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           bit_count(xor(fa, fb)) <= 3 AS within_threshold
    FROM cand GROUP BY 1, 3
    """


@query("simhash_hamming_census", oracle=_simhash_census_oracle())
def simhash_hamming_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash threshold-tuning census (X221): the full Hamming-distance
    histogram of the block-combination candidate set (pairs agreeing on
    >= 1 of the C(5,2) two-block table keys — Manku 2007, shared with
    X4 via simhash_block_combos) — the artifact that tunes X4's
    ``max_hamming`` the way X205's S-curve tunes MinHash banding: the
    mass above the current threshold is exactly what a looser gate
    would admit, and a histogram dominated by high distances means the
    banding is generating junk candidates (verify cost without
    recall). ``within_threshold`` marks the rows the X4 pair query
    keeps today.

    Scale: identical candidate plumbing as X4 (one narrow shuffle on
    (table, 24-bit key), exact popcount per CANDIDATE, never all
    pairs); the census replaces the threshold filter with a <= 61-row
    rollup, so it costs what the pair query already costs. The 24-bit
    pair keys are WHY this stays a census and not a cross join: the
    old 4x15-bit single-chunk banding saturates its 32k keyspace once
    a shard holds ~30k docs, after which every bucket grows with n and
    the candidate budget goes quadratic (r14: measured at 100x in
    COST_DECADES.json).

    Reference parity: none; extends the X63/X205 tuning-census family."""
    return (
        _simhash_cands_df(spark, sf_dir)
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .select(
            "hamming",
            "n_pairs",
            (F.col("hamming") <= 3).alias("within_threshold"),
        )
    )


def _simhash_idf_budget_oracle() -> str:
    """Both fingerprint constructions replayed in DuckDB — the unit-
    weight form via duck_simhash, the IDF-weighted form via
    duck_simhash_idf (which replays BOTH passes: the df/corpus-size fit
    and the weighted vote sums) — then banded with the operator's own
    simhash_block_combos tables."""
    from seng550_a3_etl_spark.functions.hashing import duck_simhash_idf
    from seng550_a3_etl_spark.operators.text_dedup import (
        simhash_block_combos,
    )

    combos, offsets, widths = simhash_block_combos(3, 60)
    vals = ", ".join(
        f"({c}, {offsets[i]}, {(1 << widths[i]) - 1}, "
        f"{offsets[j]}, {(1 << widths[j]) - 1}, {1 << widths[j]})"
        for c, (i, j) in enumerate(combos)
    )
    return f"""
    WITH allfp AS (
      SELECT 'unit' AS variant, doc_id AS doc, {duck_simhash('t')} AS fp
      FROM {_TOKS}
      UNION ALL
      SELECT 'idf' AS variant, doc, fp FROM {duck_simhash_idf(_TOKS)}
    ),
    ch AS (
      SELECT variant, doc,
             c, ((fp >> oi) & mi) * sj + ((fp >> oj) & mj) AS ck
      FROM allfp, (VALUES {vals}) t(c, oi, mi, oj, mj, sj)
    ),
    buckets AS (
      SELECT variant, c, ck, COUNT(*) AS sz FROM ch GROUP BY variant, c, ck
    )
    SELECT variant,
           CAST(SUM(sz) AS BIGINT) AS n_postings,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS collision_buckets,
           CAST(MAX(sz) AS BIGINT) AS max_bucket,
           CAST(SUM(sz * (sz - 1)) // 2 AS BIGINT) AS candidate_budget
    FROM buckets GROUP BY variant
    """


@query("simhash_idf_band_budget", oracle=_simhash_idf_budget_oracle())
def simhash_idf_band_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF-weighted vs unit-weight SimHash banding budget (X251): the
    driver-checked form of the production remedy for clustering-
    dominated banding budgets (functions/hashing.py
    simhash_fingerprints_idf; VERDICT r14 #3). With unit weights the
    corpus's common tokens steer every document's bit votes the same
    way, so same-distribution docs agree on far more than half their
    bits and flood the block-combination buckets at rates far above
    the 2^-24 independent floor — a term that grows with the SQUARE of
    cluster density at any key width. Weighting each token's vote by
    ln(N/df) (Charikar's weighted SimHash, standard IDF) zeroes the
    ubiquitous tokens and lets the rare topical ones set the bits; the
    r14 unit test measured the banding budget collapsing >3x on a
    clustered corpus. This query emits the per-variant candidate
    budget over the SAME C(5,2) block-combination tables the X4 pair
    query banks on — one row per variant (unit / idf) with the posting
    count, bucket census, max bucket, and the sum-of-C(size,2)
    candidate budget — so the remedy's effect is an oracle-checked
    artifact, not a unit-test claim.

    The IDF weights are corpus state fitted IN-QUERY (document
    frequency + corpus size, one map-side-combined groupBy each — the
    unigram_logprob_quality precedent), and the oracle replays both
    passes bit-for-bit via duck_simhash_idf. Scale: two scans of the
    (doc, token) cells (df fit + weighted votes), shuffles carry only
    (token, df) and per-document 60-double vote rows, banding is the
    same one narrow shuffle on (table, 24-bit key) as X4; no stage is
    quadratic at any cluster density — the BUDGET rows it emits are
    exactly the quantity that goes quadratic when fingerprints
    cluster, which is why the census belongs in the driver record.

    Reference parity: none; extends the X205/X221 banding-tuning
    census family."""
    from seng550_a3_etl_spark.functions.hashing import (
        simhash_fingerprints_idf,
    )
    from seng550_a3_etl_spark.operators.text_dedup import simhash_band_keys

    t = load_tables(spark, sf_dir)
    docs = t.documents.select(
        F.col("doc_id").alias("doc"), tokens(F.col("text")).alias("__toks")
    )

    def budget(fps: DataFrame, variant: str) -> DataFrame:
        return (
            simhash_band_keys(fps, "doc", "fp", max_hamming=3, bits=60)
            .groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("sz"))
            .agg(
                F.sum("sz").cast("long").alias("n_postings"),
                F.count(F.lit(1)).cast("long").alias("n_buckets"),
                F.sum((F.col("sz") > 1).cast("long")).alias(
                    "collision_buckets"
                ),
                F.max("sz").cast("long").alias("max_bucket"),
                (F.sum(F.col("sz") * (F.col("sz") - 1)) / 2)
                .cast("long")
                .alias("candidate_budget"),
            )
            .select(F.lit(variant).alias("variant"), "*")
        )

    # unit arm = the session-cached corpus fingerprints (identical
    # construction — simhash_fingerprints over tokens(text); r15)
    unit = budget(_simhash_fps_df(spark, sf_dir), "unit")
    idf = budget(
        simhash_fingerprints_idf(docs, "doc", F.col("__toks"), bits=60),
        "idf",
    )
    return unit.unionByName(idf)


def _chaining_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    return f"""
    WITH labels AS ({ORACLES['dup_clusters']}),
    pairs AS (SELECT doc_a, doc_b FROM ({ORACLES['ngram_dup_pairs']})),
    sz AS (
      SELECT canonical_id, COUNT(*) AS m
      FROM labels GROUP BY canonical_id HAVING COUNT(*) >= 2
    ),
    dp AS (
      SELECT l.canonical_id, COUNT(*) AS nd
      FROM pairs p JOIN labels l ON l.doc_id = p.doc_a
      GROUP BY l.canonical_id
    ),
    cl AS (
      SELECT s.canonical_id, s.m,
             s.m * (s.m - 1) // 2 AS poss,
             COALESCE(d.nd, 0) AS nd
      FROM sz s LEFT JOIN dp d USING (canonical_id)
    )
    SELECT CAST(m AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(COUNT(*) FILTER (WHERE nd < poss) AS BIGINT)
             AS n_chained,
           CAST(SUM(poss) AS BIGINT) AS possible_pairs,
           CAST(SUM(nd) AS BIGINT) AS direct_pairs,
           CAST(SUM(poss) - SUM(nd) AS BIGINT) AS transitive_pairs,
           CAST(SUM(nd) * 1000000 // SUM(poss) AS BIGINT)
             AS density_ppm,
           CAST(MIN(nd * 1000000 // poss) AS BIGINT)
             AS min_density_ppm
    FROM cl GROUP BY m
    """


@query("dup_cluster_chaining_audit", oracle=_chaining_oracle())
def dup_cluster_chaining_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component chaining audit (X224): per dup-cluster size,
    how many of each cluster's C(m,2) member pairs were DIRECTLY
    verified near-dups vs merged only TRANSITIVELY — the standing
    worry with CC-based dedup grouping (RefinedWeb/SemDeDup both flag
    it): A~B and B~C chain A and C into one cluster even when A and C
    share nothing, and a cluster whose pair density is far below 1 is
    dropping non-duplicates if the pipeline keeps one survivor per
    cluster. n_chained counts clusters with at least one unverified
    member pair; min_density_ppm is the worst cluster at that size —
    the row that justifies (or vetoes) survivor-per-cluster pruning at
    a given threshold.

    Scale: rides BOTH session materializations (labels, verified pair
    set) — no new text or pair scan; the audit is a labels-sized
    rollup joined with a pair-set-sized rollup (every verified pair is
    within-cluster by CC construction, so doc_a's label IS the pair's
    cluster), then a <= |distinct sizes| census.

    Reference parity: none (no dedup surface in the reference);
    extends the X202/X214 dedup-observability family."""
    labels = _labels_df(spark, sf_dir)
    pairs = ngram_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sz = (
        labels.groupBy("canonical_id")
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= 2)
    )
    dp = (
        pairs.join(
            labels.select(
                F.col("doc_id").alias("doc_a"), "canonical_id"
            ),
            "doc_a",
        )
        .groupBy("canonical_id")
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    cl = sz.join(dp, "canonical_id", "left").select(
        "m",
        F.expr("m * (m - 1) DIV 2").alias("poss"),
        F.coalesce("nd", F.lit(0)).alias("nd"),
    )
    return cl.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.count_if(F.col("nd") < F.col("poss")).cast("long").alias(
            "n_chained"
        ),
        F.sum("poss").cast("long").alias("possible_pairs"),
        F.sum("nd").cast("long").alias("direct_pairs"),
        (F.sum("poss") - F.sum("nd")).cast("long").alias(
            "transitive_pairs"
        ),
        F.expr("sum(nd) * 1000000 DIV sum(poss)").cast("long").alias(
            "density_ppm"
        ),
        F.min(F.expr("nd * 1000000 DIV poss")).cast("long").alias(
            "min_density_ppm"
        ),
    ).select(
        F.col("m").cast("long").alias("cluster_size"),
        "n_clusters",
        "n_chained",
        "possible_pairs",
        "direct_pairs",
        "transitive_pairs",
        "density_ppm",
        "min_density_ppm",
    )


_CTX_BUDGETS = (128, 512, 2048)


@query(
    "context_budget_waste",
    oracle=f"""
    WITH n AS (
      SELECT CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS nt
      FROM documents
    ),
    folded AS (
      SELECT COUNT(*) AS n_docs, SUM(nt) AS total_tokens,
        {", ".join(
            f'''SUM(CASE WHEN nt > {L} THEN 1 ELSE 0 END) AS over_{L},
            SUM(CASE WHEN nt > {L} THEN nt - {L} ELSE 0 END) AS tr_{L},
            SUM(CASE WHEN nt < {L} THEN {L} - nt ELSE 0 END) AS pad_{L},
            SUM(least(nt, {L})) AS kept_{L}'''
            for L in _CTX_BUDGETS
        )}
      FROM n
    )
    SELECT CAST(budget AS BIGINT) AS budget,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(over_b AS BIGINT) AS n_docs_truncated,
           CAST(tr AS BIGINT) AS truncated_tokens,
           CAST(tr * 1000000 // total_tokens AS BIGINT)
             AS truncated_ppm,
           CAST(pad AS BIGINT) AS padding_tokens,
           CAST(pad * 1000000 // (kept + pad) AS BIGINT)
             AS padding_ppm,
           CAST((kept + budget - 1) // budget AS BIGINT)
             AS packed_seqs_min,
           CAST(n_docs - (kept + budget - 1) // budget AS BIGINT)
             AS seqs_saved_by_packing
    FROM folded,
    (VALUES {", ".join(
        f"({L}, 'over_{L}')" for L in _CTX_BUDGETS
    )}) AS v(budget, tag),
    LATERAL (SELECT
      CASE budget {" ".join(f"WHEN {L} THEN over_{L}" for L in _CTX_BUDGETS)} END AS over_b,
      CASE budget {" ".join(f"WHEN {L} THEN tr_{L}" for L in _CTX_BUDGETS)} END AS tr,
      CASE budget {" ".join(f"WHEN {L} THEN pad_{L}" for L in _CTX_BUDGETS)} END AS pad,
      CASE budget {" ".join(f"WHEN {L} THEN kept_{L}" for L in _CTX_BUDGETS)} END AS kept
    ) AS picked
    """,
)
def context_budget_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length budget planning census (X225): for each candidate
    training sequence length L, the token mass LOST to truncation
    (docs longer than L) and the mass WASTED on padding under naive
    one-doc-per-sequence batching, plus the lower bound on packed
    sequence count (ceil(kept/L)) — the artifact that prices the
    sequence-packing work and picks max_len before a run commits
    (truncation_ppm rises with smaller L, padding_ppm with larger L;
    the crossover is corpus-specific). seqs_saved_by_packing is the
    batch-count reduction packing buys at that L — the direct GPU-hour
    lever.

    Scale: ONE corpus scan folds every (budget, regime) conditional
    sum into a single row (the X205 one-agg pattern); the |budgets|
    output rows are arithmetic on that folded row — budget count never
    adds passes.

    Reference parity: none; extends the X56/X203 budget-planning
    family (the actual packer is the standing mapInPandas operator —
    this is its sizing artifact)."""
    t = load_tables(spark, sf_dir)
    n = t.documents.select(
        F.size(F.filter(tokens(F.col("text")), lambda x: x != ""))
        .cast("long")
        .alias("nt")
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").alias("total_tokens"),
    ]
    for L in _CTX_BUDGETS:
        aggs += [
            F.count_if(F.col("nt") > L).alias(f"over_{L}"),
            F.sum(
                F.when(F.col("nt") > L, F.col("nt") - L).otherwise(0)
            ).alias(f"tr_{L}"),
            F.sum(
                F.when(F.col("nt") < L, L - F.col("nt")).otherwise(0)
            ).alias(f"pad_{L}"),
            F.sum(F.least(F.col("nt"), F.lit(L))).alias(f"kept_{L}"),
        ]
    folded = n.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(L).cast("long").alias("budget"),
                F.col("n_docs").cast("long").alias("n_docs"),
                F.col(f"over_{L}").cast("long").alias("n_docs_truncated"),
                F.col(f"tr_{L}").cast("long").alias("truncated_tokens"),
                F.expr(f"tr_{L} * 1000000 DIV total_tokens")
                .cast("long")
                .alias("truncated_ppm"),
                F.col(f"pad_{L}").cast("long").alias("padding_tokens"),
                F.expr(f"pad_{L} * 1000000 DIV (kept_{L} + pad_{L})")
                .cast("long")
                .alias("padding_ppm"),
                F.expr(f"(kept_{L} + {L} - 1) DIV {L}")
                .cast("long")
                .alias("packed_seqs_min"),
                F.expr(f"n_docs - (kept_{L} + {L} - 1) DIV {L}")
                .cast("long")
                .alias("seqs_saved_by_packing"),
            )
            for L in _CTX_BUDGETS
        ]
    )
    return folded.select(F.explode(rows).alias("r")).select("r.*")


def _selector_agreement_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    # Truncate-toward-zero integer division on a possibly-negative
    # numerator (kappa < 0 when selectors anti-correlate): Spark's DIV
    # truncates, DuckDB's // floors — the sign split makes the oracle
    # truncate too.
    kappa = """
      CASE WHEN knum >= 0 THEN knum * 1000000 // kden
           ELSE -((-knum) * 1000000 // kden) END
    """
    return f"""
    WITH g AS ({ORACLES['gopher_quality_flags']}),
    labels AS ({ORACLES['dup_clusters']}),
    lg AS (
      SELECT doc_id,
             (CASE {_LANG_CASE} ELSE 'und' END) = 'en' AS k
      FROM (
        SELECT doc_id,
               {_duck_marker('en')} AS c_en, {_duck_marker('es')} AS c_es,
               {_duck_marker('de')} AS c_de, {_duck_marker('fr')} AS c_fr,
               {_duck_marker('zh')} AS c_zh,
               greatest({_duck_marker('en')}, {_duck_marker('es')},
                        {_duck_marker('de')}, {_duck_marker('fr')},
                        {_duck_marker('zh')}) AS best
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS t
              FROM documents)
      )
    ),
    sig AS (
      SELECT d.doc_id,
             lg.k AS k_lang,
             g.pass_gopher AS k_quality,
             l.canonical_id = d.doc_id AS k_dedup
      FROM documents d
      JOIN lg ON lg.doc_id = d.doc_id
      JOIN g ON g.doc_id = d.doc_id
      JOIN labels l ON l.doc_id = d.doc_id
    ),
    cells AS (
      SELECT p.pair, p.ka, p.kb FROM sig,
      LATERAL (VALUES
        ('lang~quality', k_lang, k_quality),
        ('lang~dedup', k_lang, k_dedup),
        ('quality~dedup', k_quality, k_dedup)
      ) AS p(pair, ka, kb)
    ),
    ct AS (
      SELECT pair,
             COUNT(*) AS n,
             COUNT(*) FILTER (WHERE ka AND kb) AS a,
             COUNT(*) FILTER (WHERE ka AND NOT kb) AS b,
             COUNT(*) FILTER (WHERE NOT ka AND kb) AS c,
             COUNT(*) FILTER (WHERE NOT ka AND NOT kb) AS d
      FROM cells GROUP BY pair
    )
    SELECT pair,
           CAST(a AS BIGINT) AS n_both,
           CAST(b AS BIGINT) AS n_only_a,
           CAST(c AS BIGINT) AS n_only_b,
           CAST(d AS BIGINT) AS n_neither,
           CAST((a + d) * 1000000 // n AS BIGINT) AS agree_ppm,
           CAST(({kappa}) AS BIGINT) AS kappa_ppm
    FROM (
      SELECT pair, n, a, b, c, d,
             n * (a + d) - ((a + b) * (a + c) + (c + d) * (b + d))
               AS knum,
             n * n - ((a + b) * (a + c) + (c + d) * (b + d)) AS kden
      FROM ct
    )
    """


@query("selector_agreement_census", oracle=_selector_agreement_oracle())
def selector_agreement_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-selector agreement census (X227): the three independent
    keep-signals the curation funnel applies sequentially — language
    gate (X12 argmax lang-id = 'en'), Gopher quality gate (X178
    all-five-rungs), near-dup survivorship (X21 cluster canonical) —
    cross-tabbed pairwise with exact-integer Cohen's kappa: agreement
    says whether two filters are buying overlapping selections (high
    kappa ⇒ the cheaper one nearly subsumes the dearer; kappa ≈ 0 ⇒
    orthogonal signals, both earn their cost). The funnel (X219/X202)
    prices rungs WITHIN one family; this prices agreement ACROSS
    families — together they decide the stack. kappa = (N·(a+d) −
    Σ marginals)/(N² − Σ marginals) stays in exact integers end-to-end
    (ppm by truncating division, sign-split in the oracle so both
    engines truncate).

    Scale: the lang and quality signals are single-scan projections
    (HOF folds, zero shuffle); dedup survivorship rides the session
    label materialization; the three signals join doc_id-keyed once
    and the census folds to 3 rows in one aggregate over an exploded
    3-struct array — pair count never adds passes.

    Reference parity: none; extends the X202/X215/X219 observability
    family."""
    from seng550_a3_etl_spark.functions.text import lang_id, quality_score  # noqa: F401
    from seng550_a3_etl_spark.suite.quality import gopher_flags_projection

    t = load_tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    lang = t.documents.select(
        "doc_id", (lang_id(toks) == "en").alias("k_lang")
    )
    qual = gopher_flags_projection(t.documents).select(
        "doc_id", F.col("pass_gopher").alias("k_quality")
    )
    labels = _labels_df(spark, sf_dir)
    sig = (
        t.documents.select("doc_id")
        .join(lang, "doc_id")
        .join(qual, "doc_id")
        .join(labels, "doc_id")
        .select(
            "k_lang",
            "k_quality",
            (F.col("canonical_id") == F.col("doc_id")).alias("k_dedup"),
        )
    )
    cells = sig.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("lang~quality").alias("pair"),
                    F.col("k_lang").alias("ka"),
                    F.col("k_quality").alias("kb"),
                ),
                F.struct(
                    F.lit("lang~dedup").alias("pair"),
                    F.col("k_lang").alias("ka"),
                    F.col("k_dedup").alias("kb"),
                ),
                F.struct(
                    F.lit("quality~dedup").alias("pair"),
                    F.col("k_quality").alias("ka"),
                    F.col("k_dedup").alias("kb"),
                ),
            )
        ).alias("p")
    ).select("p.*")
    ct = cells.groupBy("pair").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("ka") & F.col("kb")).alias("a"),
        F.count_if(F.col("ka") & ~F.col("kb")).alias("b"),
        F.count_if(~F.col("ka") & F.col("kb")).alias("c"),
        F.count_if(~F.col("ka") & ~F.col("kb")).alias("d"),
    )
    return ct.select(
        "pair",
        F.col("a").cast("long").alias("n_both"),
        F.col("b").cast("long").alias("n_only_a"),
        F.col("c").cast("long").alias("n_only_b"),
        F.col("d").cast("long").alias("n_neither"),
        F.expr("(a + d) * 1000000 DIV n").cast("long").alias("agree_ppm"),
        F.expr(
            "(n * (a + d) - ((a + b) * (a + c) + (c + d) * (b + d)))"
            " * 1000000 DIV"
            " (n * n - ((a + b) * (a + c) + (c + d) * (b + d)))"
        ).cast("long").alias("kappa_ppm"),
    )


_LEN_BUCKETS = ((0, 31, "000-031"), (32, 127, "032-127"),
                (128, 511, "128-511"), (512, None, "512+"))


def _lsh_len_recall_oracle() -> str:
    from seng550_a3_etl_spark.suite.registry import ORACLES

    bucket = " ".join(
        f"WHEN ml <= {hi} THEN '{tag}'"
        for lo, hi, tag in _LEN_BUCKETS if hi is not None
    )
    return f"""
    WITH ng AS (SELECT doc_a, doc_b FROM ({ORACLES['ngram_dup_pairs']})),
    mh AS (SELECT doc_a, doc_b FROM ({ORACLES['minhash_dup_pairs']})),
    u AS (
      SELECT COALESCE(ng.doc_a, mh.doc_a) AS doc_a,
             COALESCE(ng.doc_b, mh.doc_b) AS doc_b,
             ng.doc_a IS NOT NULL AS in_ng,
             mh.doc_a IS NOT NULL AS in_mh
      FROM ng FULL OUTER JOIN mh
        ON ng.doc_a = mh.doc_a AND ng.doc_b = mh.doc_b
    ),
    lens AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS nt
      FROM documents
    ),
    tagged AS (
      SELECT CASE {bucket} ELSE '512+' END AS len_bucket, in_ng, in_mh
      FROM (
        SELECT least(la.nt, lb.nt) AS ml, u.in_ng, u.in_mh
        FROM u
        JOIN lens la ON la.doc_id = u.doc_a
        JOIN lens lb ON lb.doc_id = u.doc_b
      )
    )
    SELECT len_bucket,
           CAST(COUNT(*) FILTER (WHERE in_ng) AS BIGINT) AS n_truth_pairs,
           CAST(COUNT(*) FILTER (WHERE in_ng AND in_mh) AS BIGINT)
             AS n_caught,
           CAST(COUNT(*) FILTER (WHERE in_mh AND NOT in_ng) AS BIGINT)
             AS n_lsh_only,
           CAST(CASE WHEN COUNT(*) FILTER (WHERE in_ng) = 0 THEN -1
                ELSE COUNT(*) FILTER (WHERE in_ng AND in_mh) * 1000000
                     // COUNT(*) FILTER (WHERE in_ng) END AS BIGINT)
             AS recall_ppm
    FROM tagged GROUP BY len_bucket
    """


@query("lsh_recall_by_length", oracle=_lsh_len_recall_oracle())
def lsh_recall_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH recall by document length (X228): the X205 band-tuning
    S-curve prices MinHash recall GLOBALLY; this census breaks it by
    the SHORTER document's token count — the known failure axis (short
    docs have few shingles, so their 8-perm signatures are noisy and
    banding misses them first). A production stack reads this to
    decide a per-length policy: exact-tier short docs, LSH the rest —
    the census names the cutoff. n_lsh_only is the other direction
    (banding collisions that exact Jaccard rejects — the verify
    stage's workload).

    Scale: rides the session tier census (X146 — the pair sets are
    already materialized and flagged; no pair rescan), joined to a
    one-scan length projection on the pair endpoints (pair-set-sized
    join, corpus text never moves); the rollup is <= |buckets| rows.

    Reference parity: none; extends the X202/X205/X221
    dedup-tuning-observability family."""
    census = dedup_strategy_delta(spark, sf_dir).select(
        "doc_a", "doc_b", "in_ngram", "in_minhash"
    ).filter(F.col("in_ngram") | F.col("in_minhash"))
    t = load_tables(spark, sf_dir)
    lens = t.documents.select(
        "doc_id",
        F.size(F.filter(tokens(F.col("text")), lambda x: x != ""))
        .cast("long")
        .alias("nt"),
    )
    ml = F.least("nta", "ntb")
    bucket = F.lit(_LEN_BUCKETS[-1][2])
    for lo, hi, tag in reversed(_LEN_BUCKETS[:-1]):
        bucket = F.when(ml <= hi, F.lit(tag)).otherwise(bucket)
    tagged = (
        census.join(
            lens.select(F.col("doc_id").alias("doc_a"),
                        F.col("nt").alias("nta")),
            "doc_a",
        )
        .join(
            lens.select(F.col("doc_id").alias("doc_b"),
                        F.col("nt").alias("ntb")),
            "doc_b",
        )
        .select(bucket.alias("len_bucket"), "in_ngram", "in_minhash")
    )
    return tagged.groupBy("len_bucket").agg(
        F.count_if(F.col("in_ngram")).cast("long").alias("n_truth_pairs"),
        F.count_if(F.col("in_ngram") & F.col("in_minhash"))
        .cast("long")
        .alias("n_caught"),
        F.count_if(F.col("in_minhash") & ~F.col("in_ngram"))
        .cast("long")
        .alias("n_lsh_only"),
        F.expr(
            "CASE WHEN count_if(in_ngram) = 0 THEN -1"
            " ELSE count_if(in_ngram AND in_minhash) * 1000000"
            " DIV count_if(in_ngram) END"
        ).cast("long").alias("recall_ppm"),
    )


_WINNOW_K = 4       # k-gram shingle size (Schleimer et al. "noise threshold")
_WINNOW_W = 4       # winnowing window (guarantee t = w + k - 1 = 7 tokens)
_WINNOW_MAXFREQ = 64   # stop-print posting cap (the X2 stop-shingle knob)
_WINNOW_MIN_SHARED = 2


def _winnow_oracle() -> str:
    h = duck_hash64("s")
    k, w = _WINNOW_K, _WINNOW_W
    return f"""
    WITH hs AS (
      SELECT doc_id AS doc,
             list_transform({_duck_shingles(k, 't')}, s -> {h}) AS hv
      FROM {_TOKS}
    ),
    prints AS (
      SELECT doc, p FROM (
        SELECT doc,
               unnest(list_distinct(list_transform(
                 generate_series(1, len(hv) - {w} + 1),
                 i -> list_min(hv[i:i+{w - 1}])))) AS p
        FROM hs WHERE len(hv) >= {w}
      )
    ),
    hot AS (SELECT p FROM prints GROUP BY p
            HAVING COUNT(*) > {_WINNOW_MAXFREQ}),
    cold AS (SELECT doc, p FROM prints WHERE p NOT IN (SELECT p FROM hot))
    SELECT a.doc AS doc_a, b.doc AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_prints
    FROM cold a JOIN cold b ON a.p = b.p AND a.doc < b.doc
    GROUP BY 1, 2
    HAVING COUNT(*) >= {_WINNOW_MIN_SHARED}
    """


@query("winnowing_dup_pairs", oracle=_winnow_oracle())
def winnowing_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint candidate pairs (X229; Schleimer, Wilkerson
    & Aiken SIGMOD'03 — the MOSS algorithm): per document, hash every
    k-gram, keep the MINIMUM hash of each window of w consecutive
    k-gram hashes, and pair documents sharing >= 2 selected prints.
    Winnowing's guarantee is LOCAL: any shared run of t = w + k - 1
    tokens is detected with certainty (some window inside the run
    selects the same print on both sides) while storing only ~2/(w+1)
    of the k-gram hashes — the density/guarantee trade neither doc-
    level MinHash (X3, global Jaccard only) nor the exact span scan
    (X198, full posting volume) offers. The plagiarism-detection rung
    of the dedup ladder.

    Scale: selection is a per-row HOF pass (hash array once, window
    minima via sequence+slice — no explode until AFTER the ~2/(w+1)
    thinning); the posting table carries only selected prints, hot
    prints are capped by the X2 stop-list knob, and pairs come from
    the single-shuffle bucket groupBy (C(freq,2) bounded by the cap).
    Corpus text never shuffles — prints are 60-bit longs.

    Reference parity: none; the 13th rung of the dedup family
    (SURVEY §2.10)."""
    from seng550_a3_etl_spark.functions.text import shingles
    from seng550_a3_etl_spark.operators.text_dedup import bucket_pairs
    from seng550_a3_etl_spark.plans.layout import spread_for_cpu

    t = load_tables(spark, sf_dir)
    k, w = _WINNOW_K, _WINNOW_W
    # spread: the hash + window-min fold is interpreted — the scan's
    # partition count IS its parallelism (standing HOF rule). The
    # windowed-doc guard is the scan-cheap token-count precondition
    # (>= 1 window ⟺ tokens >= k + w - 1); written as size(hv) >= w it
    # would push the whole shingle+hash build into the scan's
    # DataFilters (the X216/X222 pathology).
    hs = (
        spread_for_cpu(
            t.documents.filter(F.size(tokens(F.col("text"))) >= k + w - 1)
        )
        .select(
            F.col("doc_id").alias("doc"),
            F.transform(
                shingles(tokens(F.col("text")), k), lambda s: hash64(s)
            ).alias("hv"),
        )
    )
    prints = hs.select(
        "doc",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("hv") - w + 1),
                    lambda i: F.array_min(F.slice(F.col("hv"), i, w)),
                )
            )
        ).alias("p"),
    )
    freq = prints.groupBy("p").agg(F.count(F.lit(1)).alias("__f"))
    cold = prints.join(
        freq.filter(F.col("__f") <= _WINNOW_MAXFREQ).select("p"), "p"
    )
    return (
        bucket_pairs(cold, ["p"], F.col("doc"))
        .groupBy(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_prints"))
        .filter(F.col("n_shared_prints") >= _WINNOW_MIN_SHARED)
    )


@query(
    "snapshot_ngram_novelty",
    oracle=f"""
    WITH sets_ AS {_DUCK_SETS3},
    ex AS (SELECT doc, doc % 2 AS snap, unnest(sh) AS s FROM sets_),
    a_sh AS (SELECT DISTINCT s FROM ex WHERE snap = 0),
    b AS (
      SELECT d.source, ex.doc, ex.s, a_sh.s IS NULL AS novel
      FROM ex
      JOIN (SELECT doc_id AS doc, source FROM documents) d USING (doc)
      LEFT JOIN a_sh ON ex.s = a_sh.s
      WHERE ex.snap = 1
    )
    SELECT source,
           CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_docs_b,
           CAST(COUNT(*) AS BIGINT) AS n_shingles_b,
           CAST(COUNT(*) FILTER (WHERE novel) AS BIGINT) AS n_novel_b,
           CAST(CAST(COUNT(*) FILTER (WHERE novel) AS HUGEINT) * 1000000
                // COUNT(*) AS BIGINT) AS novelty_ppm
    FROM b GROUP BY source
    """,
)
def snapshot_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot n-gram novelty census (X232): split the corpus
    into two ingestion snapshots (doc_id parity — the X223 stand-in
    for "last crawl" vs "this crawl") and report, per source, what
    fraction of the NEW snapshot's distinct-per-doc 3-gram shingle
    instances already occur anywhere in the OLD snapshot. X77 scores
    novelty within ONE corpus; this is the between-snapshot twin the
    crawl pipeline actually watches: novelty collapsing toward zero
    means the new crawl is re-fetching yesterday's web (stop paying
    for it), and per-source novelty ranks which feeds still deliver
    fresh text — the same overlap estimate a memorization audit runs
    before adding a snapshot to training. novelty_ppm is one exact
    truncating division on big-int counts.

    Scale: rides the session-shared hashed shingle sets (one build per
    application, the 100 TB materialized-artifact shape); snapshot A
    contributes only its DISTINCT shingle hashes (one map-side-combined
    distinct, 8-byte longs — corpus text never shuffles), the
    presence probe is ONE hash equi-join of B's postings against that
    set, and the rollup is |sources| rows. Shingle identity via the
    injective-enough 60-bit hash, same argument as X77.

    Reference parity: none; extends the X77/X223 snapshot-diff family."""
    sets_ = _shingle_sets_df(spark, sf_dir, n=3, hashed=True)
    t = load_tables(spark, sf_dir)
    ex = sets_.select(
        "doc", (F.col("doc") % 2).alias("snap"), F.explode("sh").alias("hs")
    )
    a_sh = ex.filter(F.col("snap") == 0).select("hs").distinct()
    b = (
        ex.filter(F.col("snap") == 1)
        .join(
            t.documents.select(F.col("doc_id").alias("doc"), "source"), "doc"
        )
        .join(a_sh.withColumn("__seen", F.lit(1)), "hs", "left")
    )
    novel = F.col("__seen").isNull()
    return b.groupBy("source").agg(
        F.countDistinct("doc").cast("long").alias("n_docs_b"),
        F.count(F.lit(1)).cast("long").alias("n_shingles_b"),
        F.count(F.when(novel, 1)).cast("long").alias("n_novel_b"),
        F.expr(
            "CAST(CAST(count(CASE WHEN __seen IS NULL THEN 1 END) AS "
            "DECIMAL(38,0)) * 1000000 DIV count(1) AS LONG)"
        ).alias("novelty_ppm"),
    )



def _ece_oracle() -> str:
    per_lang = ", ".join(
        f"{_duck_marker(lang)} AS c_{lang}" for lang in LANG_MARKERS
    )
    best = "greatest(" + ", ".join(f"c_{lang}" for lang in LANG_MARKERS) + ")"
    total = " + ".join(f"c_{lang}" for lang in LANG_MARKERS)
    return f"""
    WITH counted AS (
      SELECT d.lang, t, {per_lang}
      FROM {_TOKS} tt JOIN documents d USING (doc_id)
    ),
    scored AS (
      SELECT lang,
             CASE {_LANG_CASE} ELSE 'und' END AS lang_pred,
             CAST(CASE WHEN ({total}) = 0 THEN 0
                  ELSE CAST(best AS HUGEINT) * 1000000 // ({total})
                  END AS BIGINT) AS conf_ppm
      FROM (SELECT *, {best} AS best FROM counted)
    ),
    g AS (
      SELECT least(conf_ppm // 100000, 9) AS bin,
             COUNT(*) AS n, SUM(conf_ppm) AS sc,
             COUNT(*) FILTER (WHERE lang_pred = lang) AS nc
      FROM scored GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS nt FROM g)
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(n AS BIGINT) AS n_docs,
           CAST(CAST(sc AS HUGEINT) // n AS BIGINT) AS mean_conf_ppm,
           CAST(CAST(nc AS HUGEINT) * 1000000 // n AS BIGINT) AS acc_ppm,
           CAST(abs(CAST(sc AS HUGEINT) // n
                    - CAST(nc AS HUGEINT) * 1000000 // n) AS BIGINT)
             AS gap_ppm,
           CAST(CAST(n AS HUGEINT)
                * abs(CAST(sc AS HUGEINT) // n
                      - CAST(nc AS HUGEINT) * 1000000 // n)
                // nt AS BIGINT) AS ece_term_ppm
    FROM g, tot
    """


@query("langid_confidence_ece", oracle=_ece_oracle())
def langid_confidence_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confidence calibration census (X235) — the
    reliability table + expected-calibration-error terms for the
    marker-wordlist classifier (X9/X140): per confidence decile
    (confidence = winning language's share of ALL marker hits, exact
    integer ppm; markerless docs land in bin 0), the doc count, mean
    stated confidence, observed accuracy against the stored ``lang``
    label, the |confidence − accuracy| calibration gap, and the
    n-weighted ECE term (the column sums to ECE; Naeini 2015 / Guo
    2017). X140's confusion matrix says WHERE the classifier errs;
    this says whether its CONFIDENCE can be trusted to route docs —
    the gate before any "keep only confident lang-ID" curation rule,
    where an overconfident bin silently drops a language. Divisions
    are truncating big-int; the gap subtracts two already-floored
    ppms (the X220 recipe), so both engines agree bit-for-bit.

    Scale: ONE corpus scan computes the per-row marker folds (the
    same scan-stage HOFs as X9 — no shuffle), the census is a ≤10-row
    map-side rollup, and the total-count scalar broadcasts back for
    the weighted term. Nothing corpus-sized moves.

    Reference parity: none; extends the X140 classifier-audit family."""
    from seng550_a3_etl_spark.functions.text import marker_count

    t = load_tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    counts = [marker_count(toks, lang) for lang in LANG_MARKERS]
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    scored = (
        t.documents.select(
            "lang",
            lang_id(toks).alias("lang_pred"),
            F.greatest(*counts).alias("__best"),
            total.alias("__total"),
        )
        .select(
            (F.col("lang_pred") == F.col("lang")).alias("correct"),
            F.when(F.col("__total") == 0, F.lit(0))
            .otherwise(
                F.expr(
                    "CAST(CAST(__best AS DECIMAL(38,0)) * 1000000 "
                    "DIV __total AS LONG)"
                )
            )
            .cast("long")
            .alias("conf_ppm"),
        )
    )
    g = scored.groupBy(
        F.least(F.floor(F.col("conf_ppm") / 100_000), F.lit(9))
        .cast("long")
        .alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("conf_ppm").alias("sc"),
        F.count(F.when(F.col("correct"), 1)).alias("nc"),
    )
    tot = g.agg(F.sum("n").alias("nt"))
    mean_conf = "CAST(CAST(sc AS DECIMAL(38,0)) DIV n AS LONG)"
    acc = "CAST(CAST(nc AS DECIMAL(38,0)) * 1000000 DIV n AS LONG)"
    gap = f"abs({mean_conf} - {acc})"
    return g.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.col("n").cast("long").alias("n_docs"),
        F.expr(mean_conf).alias("mean_conf_ppm"),
        F.expr(acc).alias("acc_ppm"),
        F.expr(gap).cast("long").alias("gap_ppm"),
        F.expr(
            f"CAST(CAST(n AS DECIMAL(38,0)) * {gap} DIV nt AS LONG)"
        ).alias("ece_term_ppm"),
    )


def _duck_qmicro(extra: str = "") -> str:
    """DuckDB fragment computing the quantized composite quality score
    (X10) per doc — the SINGLE source of truth for the q_micros
    formula (review r13: preference_pair_mining had re-inlined it
    verbatim; a weight/clamp tweak applied to one copy would silently
    break the other's oracle parity). ``extra`` injects additional
    projected columns (e.g. ``" source,"``) into both SELECTs."""
    return rf"""
      SELECT doc_id,{extra}
             CAST(ROUND((
               least(len(t) / 100.0, 1.0) * 0.25
               + (len(list_distinct(t)) / greatest(len(t), 1)) * 0.25
               + least(((length(text) - (len(t) - 1)) / greatest(len(t), 1))
                       / 8.0, 1.0) * 0.25
               + least(({_duck_marker('en')} / greatest(len(t), 1)) * 10.0,
                       1.0) * 0.25
             ) * 1000000) AS BIGINT) AS q_micros
      FROM (SELECT doc_id,{extra} text, string_split_regex(text, '\s+') AS t
            FROM documents)
"""


_DUCK_QMICRO = _duck_qmicro()


@query(
    "quality_decile_drift",
    oracle=f"""
    WITH q AS ({_DUCK_QMICRO}),
    binned AS (
      SELECT doc_id % 2 AS snap,
             least(q_micros // 100000, 9) AS bin
      FROM q
    ),
    g AS (
      SELECT bin,
             COUNT(*) FILTER (WHERE snap = 0) AS n_a,
             COUNT(*) FILTER (WHERE snap = 1) AS n_b
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT SUM(n_a) AS na, SUM(n_b) AS nb FROM g
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(CAST(n_a AS HUGEINT) * 1000000 // na AS BIGINT)
             AS share_a_ppm,
           CAST(CAST(n_b AS HUGEINT) * 1000000 // nb AS BIGINT)
             AS share_b_ppm,
           CAST(CAST(n_b AS HUGEINT) * 1000000 // nb
                - CAST(n_a AS HUGEINT) * 1000000 // na AS BIGINT)
             AS drift_ppm,
           CAST(abs(CAST(n_b AS HUGEINT) * 1000000 // nb
                    - CAST(n_a AS HUGEINT) * 1000000 // na) AS BIGINT)
             AS abs_drift_ppm
    FROM g, tot
    """,
)
def quality_decile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score distribution drift between snapshots (X236) —
    the population-stability monitor for the composite quality score
    (X10): bin the exact integer-micro score into fixed deciles,
    split the corpus into two ingestion snapshots (doc_id parity, the
    X223/X232 convention), and report per-bin counts, snapshot shares
    (exact ppm), and signed + absolute share drift. Half the
    abs_drift_ppm column's sum is the total-variation distance — the
    exact-arithmetic stand-in for the industry PSI (whose ln() term
    is IEEE-transcendental and engine-divergent; TVD and PSI flag the
    same bins). The TEMPORAL axis complements X94's cross-sectional
    PSI (each source vs the corpus-wide profile): X94 asks "which
    feed is unlike the others", this asks "did the whole corpus move
    between crawls". A drifting quality distribution between crawls is THE
    leading indicator that fixed quality thresholds (X73/X81) are
    about to change the admitted mixture silently.

    Scale: ONE corpus scan (per-row score fold, no shuffle), a 10-row
    census rollup, and one broadcast totals row. Shares subtract as
    already-floored ppms (the X220 recipe) — bit-stable cross-engine.

    Reference parity: none; extends the X223/X232 snapshot-diff
    family to the quality axis."""
    from seng550_a3_etl_spark.functions.text import quality_score

    t = load_tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    q_micros = F.round(
        quality_score(F.col("text"), toks) * 1_000_000
    ).cast("long")
    binned = t.documents.select(
        (F.col("doc_id") % 2).alias("snap"),
        F.least(F.floor(q_micros / 100_000), F.lit(9))
        .cast("long")
        .alias("bin"),
    )
    g = binned.groupBy("bin").agg(
        F.count(F.when(F.col("snap") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("snap") == 1, 1)).alias("n_b"),
    )
    tot = g.agg(F.sum("n_a").alias("na"), F.sum("n_b").alias("nb"))
    share_a = "CAST(CAST(n_a AS DECIMAL(38,0)) * 1000000 DIV na AS LONG)"
    share_b = "CAST(CAST(n_b AS DECIMAL(38,0)) * 1000000 DIV nb AS LONG)"
    return g.crossJoin(F.broadcast(tot)).select(
        F.col("bin"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.expr(share_a).alias("share_a_ppm"),
        F.expr(share_b).alias("share_b_ppm"),
        F.expr(f"{share_b} - {share_a}").cast("long").alias("drift_ppm"),
        F.expr(f"abs({share_b} - {share_a})")
        .cast("long")
        .alias("abs_drift_ppm"),
    )


def _sql_pat(pat: str) -> str:
    """Escape a regex pattern for embedding in a single-quoted DuckDB
    string literal. The current PII/charclass patterns carry no single
    quote, but an unescaped one would silently produce broken oracle
    SQL (ADVICE r12)."""
    return pat.replace("'", "''")


def _charclass_oracle() -> str:
    def stripped(pat: str) -> str:
        return f"length(regexp_replace(text, '{_sql_pat(pat)}', '', 'g'))"

    space_pat = "[ " + "\\t\\n\\r]"
    s_alpha, s_upper = stripped("[A-Za-z]"), stripped("[A-Z]")
    s_digit, s_space = stripped("[0-9]"), stripped(space_pat)
    return f"""
    WITH per AS (
      SELECT source,
             length(text) AS n_chars,
             length(text) - {s_alpha} AS n_alpha,
             length(text) - {s_upper} AS n_upper,
             length(text) - {s_digit} AS n_digit,
             length(text) - {s_space} AS n_space
      FROM documents
    ),
    g AS (
      SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS c,
             SUM(n_alpha) AS a, SUM(n_upper) AS u,
             SUM(n_digit) AS d, SUM(n_space) AS s
      FROM per GROUP BY source
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(c AS BIGINT) AS n_chars,
           CAST(CAST(a AS HUGEINT) * 1000000 // c AS BIGINT) AS alpha_ppm,
           CAST(CAST(d AS HUGEINT) * 1000000 // c AS BIGINT) AS digit_ppm,
           CAST(CAST(s AS HUGEINT) * 1000000 // c AS BIGINT) AS space_ppm,
           CAST(CAST(c - a - d - s AS HUGEINT) * 1000000 // c AS BIGINT)
             AS other_ppm,
           CAST(CASE WHEN a = 0 THEN 0
                ELSE CAST(u AS HUGEINT) * 1000000 // a END AS BIGINT)
             AS upper_per_alpha_ppm
    FROM g
    """


@query("charclass_census", oracle=_charclass_oracle())
def charclass_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class census by source (X238) — the alphabet-level
    corpus fingerprint under the token-level monitors (X9 lang-id,
    X223 vocab drift): per source, exact ppm of alphabetic, digit,
    whitespace, and other characters, plus uppercase share of the
    alphabetics. These are the C4/CCNet pre-filters' raw inputs —
    digit-heavy sources are tables/logs masquerading as text,
    other-heavy sources are markup/encoding damage, and an uppercase
    spike is boilerplate SHOUTING — and, compared across snapshots
    (the X236 pattern), the cheapest possible encoder-upstream drift
    alarm: charset damage shows here one scan earlier than any
    tokenizer metric. Counts come from length deltas under class-
    stripping regex replaces restricted to explicit ASCII classes, so
    both engines' regex semantics coincide exactly.

    Scale: per-row regex folds in the scan (JVM-side, zero shuffle) →
    a |sources| map-side rollup; ppms are truncating big-int
    divisions on the summed counts. Nothing doc-sized moves.

    Reference parity: none; extends the X9/X140/X236 corpus-health
    family below the token level."""
    t = load_tables(spark, sf_dir)
    n = F.length("text")

    def kept(pat: str):
        return n - F.length(F.regexp_replace(F.col("text"), pat, ""))

    per = t.documents.select(
        "source",
        n.cast("long").alias("n_chars"),
        kept("[A-Za-z]").cast("long").alias("n_alpha"),
        kept("[A-Z]").cast("long").alias("n_upper"),
        kept("[0-9]").cast("long").alias("n_digit"),
        kept("[ \\t\\n\\r]").cast("long").alias("n_space"),
    )
    g = per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("c"),
        F.sum("n_alpha").alias("a"),
        F.sum("n_upper").alias("u"),
        F.sum("n_digit").alias("d"),
        F.sum("n_space").alias("s"),
    )

    def ppm(x: str) -> F.Column:
        return F.expr(
            f"CAST(CAST({x} AS DECIMAL(38,0)) * 1000000 DIV c AS LONG)"
        )

    return g.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("c").cast("long").alias("n_chars"),
        ppm("a").alias("alpha_ppm"),
        ppm("d").alias("digit_ppm"),
        ppm("s").alias("space_ppm"),
        ppm("c - a - d - s").alias("other_ppm"),
        F.when(F.col("a") == 0, F.lit(0))
        .otherwise(
            F.expr(
                "CAST(CAST(u AS DECIMAL(38,0)) * 1000000 DIV a AS LONG)"
            )
        )
        .cast("long")
        .alias("upper_per_alpha_ppm"),
    )


@query(
    "source_shingle_jaccard",
    oracle=f"""
    WITH sets_ AS {_DUCK_SETS3},
    ss AS (
      SELECT DISTINCT d.source, ex.s
      FROM (SELECT doc, unnest(sh) AS s FROM sets_) ex
      JOIN (SELECT doc_id AS doc, source FROM documents) d USING (doc)
    ),
    sz AS (SELECT source, COUNT(*) AS n FROM ss GROUP BY source),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS n_common
      FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT sa.source AS source_a, sb.source AS source_b,
           CAST(sa.n AS BIGINT) AS n_shingles_a,
           CAST(sb.n AS BIGINT) AS n_shingles_b,
           CAST(COALESCE(i.n_common, 0) AS BIGINT) AS n_common,
           CAST(CAST(COALESCE(i.n_common, 0) AS HUGEINT) * 1000000
                // (sa.n + sb.n - COALESCE(i.n_common, 0)) AS BIGINT)
             AS jaccard_ppm,
           CAST(CAST(COALESCE(i.n_common, 0) AS HUGEINT) * 1000000
                // least(sa.n, sb.n) AS BIGINT) AS containment_ppm
    FROM sz sa JOIN sz sb ON sa.source < sb.source
    LEFT JOIN inter i
      ON i.source_a = sa.source AND i.source_b = sb.source
    """,
)
def source_shingle_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level shingle-set Jaccard matrix (X239) — the provenance /
    feed-dedup census ABOVE the document level: for every source
    pair, the exact Jaccard and containment (over min) of their
    distinct 3-gram shingle sets. Two feeds that are mirrors or
    re-crawls of each other show up here as a high-Jaccard pair long
    before any doc-pair budget is spent on them (the RefinedWeb/
    RedPajama practice of dropping whole mirrored dumps first), and a
    high containment with low Jaccard names the subset feed — the
    buy-side signal for deduplicating data PURCHASES rather than
    documents. Zero-overlap pairs still appear (zero-preserving LEFT
    join), since "provably disjoint" is the other useful answer.

    Scale: rides the session-shared hashed shingle sets; each source
    contributes its DISTINCT (source, shingle-hash) pairs — one
    map-side distinct of 8-byte longs, corpus text never shuffles;
    the intersection is ONE self equi-join on the shingle hash
    (postings bounded by |sources| per hash — ≤ C(|sources|,2) output
    per shingle), and the matrix is a ≤C(|sources|,2)-row frame with
    broadcast-size set counts. ppms are truncating big-int divisions.

    Reference parity: none. X112 counts DOC-LEVEL near-dup pairs per
    source pair (pairs that cleared a threshold); this measures the
    sources' TOTAL shingle-set overlap directly, catching diffuse
    mirroring that never produces a single qualifying doc pair."""
    sets_ = _shingle_sets_df(spark, sf_dir, n=3, hashed=True)
    t = load_tables(spark, sf_dir)
    # ss feeds THREE consumers (sz + both self-join sides) — pin it
    # once (the standing fan-out rule) or the explode+join+distinct
    # replays per reference.
    ss = (
        sets_.select("doc", F.explode("sh").alias("hs"))
        .join(
            t.documents.select(F.col("doc_id").alias("doc"), "source"),
            "doc",
        )
        .select("source", "hs")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sz = ss.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = ss.select(F.col("source").alias("source_a"), "hs")
    b = ss.select(F.col("source").alias("source_b"), "hs")
    inter = (
        a.join(b, "hs")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sz.select(
        F.col("source").alias("source_a"), F.col("n").alias("na")
    )
    sb = sz.select(
        F.col("source").alias("source_b"), F.col("n").alias("nb")
    )
    nc = F.coalesce("n_common", F.lit(0))
    return (
        sa.join(F.broadcast(sb), F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(inter), ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.col("na").cast("long").alias("n_shingles_a"),
            F.col("nb").cast("long").alias("n_shingles_b"),
            nc.cast("long").alias("n_common"),
            F.expr(
                "CAST(CAST(coalesce(n_common, 0) AS DECIMAL(38,0)) "
                "* 1000000 DIV (na + nb - coalesce(n_common, 0)) AS LONG)"
            ).alias("jaccard_ppm"),
            F.expr(
                "CAST(CAST(coalesce(n_common, 0) AS DECIMAL(38,0)) "
                "* 1000000 DIV least(na, nb) AS LONG)"
            ).alias("containment_ppm"),
        )
    )


def pii_sql_chain() -> tuple[str, str, str, str, str]:
    """(em, ip, ph, t1, t2): the escaped PII patterns plus the
    progressive redaction chain for DuckDB oracles — X56's
    order-matters counting (each match attributes to exactly ONE
    class). Single source of truth for every PII census/gate oracle
    (review r13: the streaming gate had re-inlined it)."""
    from seng550_a3_etl_spark.functions.text import PII_PATTERNS

    (em, _), (ip, _), (ph, _) = (
        (_sql_pat(p), r) for p, r in PII_PATTERNS
    )
    t1 = f"regexp_replace(text, '{em}', '<EMAIL>', 'g')"
    t2 = f"regexp_replace({t1}, '{ip}', '<IP>', 'g')"
    return em, ip, ph, t1, t2


def pii_count_cols() -> "tuple[Column, Column, Column]":
    """Spark columns (n_email, n_ip, n_phone) counted on the
    progressively redacted text — the execution-side twin of
    :func:`pii_sql_chain`, shared by the batch density census (X242)
    and the streaming admission gate (X245)."""
    from seng550_a3_etl_spark.functions.text import PII_PATTERNS

    (em, _), (ip, _), (ph, _) = PII_PATTERNS
    raw = F.col("text")
    t1 = F.regexp_replace(raw, em, "<EMAIL>")
    t2 = F.regexp_replace(t1, ip, "<IP>")
    return (
        F.regexp_count(raw, F.lit(em)).cast("long").alias("n_email"),
        F.regexp_count(t1, F.lit(ip)).cast("long").alias("n_ip"),
        F.regexp_count(t2, F.lit(ph)).cast("long").alias("n_phone"),
    )


def _pii_census_oracle() -> str:
    em, ip, ph, t1, t2 = pii_sql_chain()
    return f"""
    WITH per AS (
      SELECT source,
             len(string_split_regex(text, '\\s+')) AS n_tok,
             len(regexp_extract_all(text, '{em}')) AS n_email,
             len(regexp_extract_all({t1}, '{ip}')) AS n_ip,
             len(regexp_extract_all({t2}, '{ph}')) AS n_phone
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_email) AS BIGINT) AS n_email,
           CAST(SUM(n_ip) AS BIGINT) AS n_ip,
           CAST(SUM(n_phone) AS BIGINT) AS n_phone,
           CAST(COUNT(*) FILTER (WHERE n_email + n_ip + n_phone > 0)
                AS BIGINT) AS docs_with_pii,
           CAST(CAST(COUNT(*) FILTER (WHERE n_email + n_ip + n_phone > 0)
                     AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT)
             AS pii_doc_ppm,
           CAST(CAST(SUM(n_email) + SUM(n_ip) + SUM(n_phone) AS HUGEINT)
                * 1000000 // greatest(SUM(n_tok), 1) AS BIGINT)
             AS hits_per_mtok
    FROM per GROUP BY source
    """


@query("pii_density_census", oracle=_pii_census_oracle())
def pii_density_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII density census by source (X242) — the privacy-risk RANKING
    over the same typed patterns X56 redacts (emails, IPv4, phone
    shapes): per source, match counts per class, documents carrying
    any PII (count + exact ppm), and total hits per million tokens.
    X56 produces the scrubbed text; this is the audit artifact a
    release review actually reads — which feeds are PII-hot (route
    them through the expensive NER pass, or drop them), and whether a
    new snapshot's density jumped (the X236 drift axis applied to
    privacy). Counts run on the PROGRESSIVELY redacted text (emails
    counted on raw text, IPs after email redaction, phones after
    both) so a match is attributed to exactly one class — the same
    order-matters semantics as X56's replacement chain, replayed
    identically by the oracle.

    Scale: three per-row regex counts in the scan (JVM-side, zero
    shuffle — patterns restricted to Java/RE2-identical constructs,
    the X56 contract) → a |sources| map-side rollup; densities are
    truncating big-int divisions on the summed counts.

    Reference parity: none; completes the X56 privacy surface with
    its observability half."""
    n_email, n_ip, n_phone = pii_count_cols()
    t = load_tables(spark, sf_dir)
    per = t.documents.select(
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
        n_email,
        n_ip,
        n_phone,
    )
    any_pii = (
        F.col("n_email") + F.col("n_ip") + F.col("n_phone") > 0
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.sum("n_email").cast("long").alias("n_email"),
        F.sum("n_ip").cast("long").alias("n_ip"),
        F.sum("n_phone").cast("long").alias("n_phone"),
        F.count(F.when(any_pii, 1)).cast("long").alias("docs_with_pii"),
        F.expr(
            "CAST(CAST(count(CASE WHEN n_email + n_ip + n_phone > 0 "
            "THEN 1 END) AS DECIMAL(38,0)) * 1000000 DIV count(1) "
            "AS LONG)"
        ).alias("pii_doc_ppm"),
        F.expr(
            "CAST(CAST(sum(n_email) + sum(n_ip) + sum(n_phone) "
            "AS DECIMAL(38,0)) * 1000000 DIV greatest(sum(n_tok), 1) "
            "AS LONG)"
        ).alias("hits_per_mtok"),
    )


_PREF_PAIRS_PER_SOURCE = 10
_PREF_MIN_GAP_MICROS = 50_000  # 0.05 on the [0,1] composite score

# The q_micros formula is shared with every X10 consumer via
# _duck_qmicro (single source of truth); only the source column is
# added here.
_PREF_SCORED_SQL = _duck_qmicro(" source,")


@query(
    "preference_pair_mining",
    oracle=f"""
    WITH scored AS ({_PREF_SCORED_SQL}),
    chosen AS (
      SELECT source, doc_id, q_micros,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY q_micros DESC, doc_id) AS rk
      FROM scored
    ),
    rejected AS (
      SELECT source, doc_id, q_micros,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY q_micros ASC, doc_id) AS rk
      FROM scored
    )
    SELECT c.source, CAST(c.rk AS BIGINT) AS pair_rank,
           c.doc_id AS chosen_doc, r.doc_id AS rejected_doc,
           c.q_micros AS chosen_q_micros, r.q_micros AS rejected_q_micros,
           c.q_micros - r.q_micros AS gap_micros
    FROM chosen c JOIN rejected r ON c.source = r.source AND c.rk = r.rk
    WHERE c.rk <= {_PREF_PAIRS_PER_SOURCE}
      AND c.doc_id <> r.doc_id
      AND c.q_micros - r.q_micros >= {_PREF_MIN_GAP_MICROS}
    """,
)
def preference_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-contrast preference-pair construction (X244) — the
    DPO/RLHF-era data op the curation catalog lacked: per source, pair
    the top-k highest-composite-quality documents (chosen) 1:1 by rank
    with the bottom-k lowest (rejected), keeping pairs whose exact
    integer-micro quality gap clears a floor — the cheap heuristic
    bootstrap for preference data over an unlabeled corpus (a
    same-source pair controls for domain/style, so the contrast is
    quality, not topic). Deterministic end to end: scores quantize to
    integer micros and both rank orders tie-break on doc_id.

    Scale: per-row scoring folds in the scan stage; both rank windows
    are per-source top-k, which Spark prunes map-side
    (WindowGroupLimit) before the |sources|-keyed shuffle, so the
    frames that reach the final (source, rank) equi-join hold at most
    k rows per source each — at 100 TB nothing corpus-sized sorts or
    shuffles past the scan.

    Reference parity: none; composes the X10 composite score with the
    X29-style per-group rank machinery into a new output family."""
    t = load_tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    scored = t.documents.select(
        "doc_id",
        "source",
        F.round(quality_score(F.col("text"), toks) * 1_000_000)
        .cast("long")
        .alias("q_micros"),
    )
    w_desc = Window.partitionBy("source").orderBy(
        F.col("q_micros").desc(), F.col("doc_id")
    )
    w_asc = Window.partitionBy("source").orderBy(
        F.col("q_micros").asc(), F.col("doc_id")
    )
    chosen = (
        scored.withColumn("rk", F.row_number().over(w_desc))
        .filter(F.col("rk") <= _PREF_PAIRS_PER_SOURCE)
        .select(
            "source",
            F.col("rk").cast("long").alias("pair_rank"),
            F.col("doc_id").alias("chosen_doc"),
            F.col("q_micros").alias("chosen_q_micros"),
        )
    )
    rejected = (
        scored.withColumn("rk", F.row_number().over(w_asc))
        .filter(F.col("rk") <= _PREF_PAIRS_PER_SOURCE)
        .select(
            "source",
            F.col("rk").cast("long").alias("pair_rank"),
            F.col("doc_id").alias("rejected_doc"),
            F.col("q_micros").alias("rejected_q_micros"),
        )
    )
    return (
        chosen.join(rejected, ["source", "pair_rank"])
        .withColumn(
            "gap_micros",
            F.col("chosen_q_micros") - F.col("rejected_q_micros"),
        )
        .filter(
            (F.col("chosen_doc") != F.col("rejected_doc"))
            & (F.col("gap_micros") >= _PREF_MIN_GAP_MICROS)
        )
        .select(
            "source",
            "pair_rank",
            "chosen_doc",
            "rejected_doc",
            "chosen_q_micros",
            "rejected_q_micros",
            "gap_micros",
        )
    )


# --------------------------------------------------------------------------
# X250 — content-defined chunking dedup census (r14): fixed-condition
# rolling-hash chunk boundaries (the LBFS/rsync/CDC family), chunk-hash
# duplication census per source.
# --------------------------------------------------------------------------

_CDC_W = 4    # rolling window width (tokens)
_CDC_DIV = 13  # boundary condition: window hash % DIV == 0 (~1/13 of
#                positions cut => mean chunk ~= DIV tokens)


@query(
    "cdc_chunk_dedup",
    oracle=rf"""
    WITH tk AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '')
               AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id, source, t, {_duck_shingles(_CDC_W, 't')} AS s
      FROM tk
    ),
    cp AS (
      SELECT doc_id, source, t,
             list_transform(
               list_filter(
                 list_transform(range(1, len(s) + 1),
                   i -> struct_pack(i := i, h := {duck_hash64('s[i]')})),
                 x -> x.h % {_CDC_DIV} = 0),
               x -> x.i + {_CDC_W - 1}) AS cuts
      FROM sh
    ),
    ch AS (
      SELECT source, t,
             list_concat([CAST(1 AS BIGINT)],
                         list_transform(cuts, p -> p + 1)) AS ss,
             list_concat(cuts, [CAST(len(t) AS BIGINT)]) AS ee
      FROM cp
    ),
    ex AS (
      SELECT source, t,
             unnest(list_filter(
               list_transform(range(1, len(ss) + 1),
                 j -> struct_pack(s := ss[j], e := ee[j])),
               c -> c.e >= c.s)) AS c
      FROM ch
    ),
    inst AS (
      SELECT source,
             {duck_hash64("array_to_string(t[c.s:c.e], ' ')")} AS h,
             CAST(c.e - c.s + 1 AS BIGINT) AS ntok
      FROM ex
    ),
    fr AS (SELECT *, COUNT(*) OVER (PARTITION BY h) AS f FROM inst)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(ntok) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) FILTER (WHERE f >= 2) AS BIGINT) AS dup_chunks,
           CAST(COALESCE(SUM(ntok) FILTER (WHERE f >= 2), 0) AS BIGINT)
             AS dup_tokens,
           ROUND(CAST(COALESCE(SUM(ntok) FILTER (WHERE f >= 2), 0)
                      AS DOUBLE) / SUM(ntok), 6) AS dup_token_frac
    FROM fr GROUP BY 1
    """,
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup census — the storage-dedup
    technique (LBFS, rsync, restic/borg) applied to corpus curation:
    chunk boundaries are placed where a rolling window hash meets a
    fixed condition (here: the 4-token window's 60-bit hash %13 == 0),
    so chunk edges RESYNCHRONIZE after an insertion/deletion — unlike
    X97's fixed-size token chunks, a one-token edit changes O(1)
    chunks, not every chunk after the edit. The census then counts,
    per source, how many chunk INSTANCES (and their token mass) recur
    verbatim anywhere in the corpus: sub-document duplication at
    variable granularity, the middle rung between X91's whole-doc
    hashing and X198's exact span pairs.

    Engine: the chunk-instance construction is single-sourced in
    operators/text_dedup.py cdc_chunk_instances (shared with the
    streaming ingest guard stream_cdc_chunk_guard) — everything up to
    the chunk hash is per-row HOF expressions in the scan stage, so
    corpus text never shuffles; only (source, 60-bit chunk hash, ntok)
    rows do. One hash-partition window computes corpus-wide chunk
    frequency, one map-side-combined groupBy folds the |sources|-row
    census. Both engines replay the identical construction (shared
    tokenizer, shingle builder, md5-derived hash64, and knobs).

    Scale: the explode emits ~|tokens|/13 chunk rows; the frequency
    window shuffles once on the chunk hash (near-uniform 60-bit keys,
    no skew); the rollup is |sources| rows. At 100 TB the chunk-hash
    frequency table doubles as the dedup index a writer would persist."""
    from seng550_a3_etl_spark.operators.text_dedup import (
        cdc_chunk_instances,
    )

    t = load_tables(spark, sf_dir)
    inst = cdc_chunk_instances(
        t.documents, "doc_id", "text", _CDC_W, _CDC_DIV, carry=["source"]
    ).select("source", "h", "ntok")
    fr = inst.withColumn(
        "f", F.count(F.lit(1)).over(Window.partitionBy("h"))
    )
    return fr.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("ntok").alias("n_tokens"),
        F.sum(F.when(F.col("f") >= 2, 1).otherwise(0)).alias("dup_chunks"),
        F.sum(F.when(F.col("f") >= 2, F.col("ntok")).otherwise(0)).alias(
            "dup_tokens"
        ),
    ).select(
        "source",
        "n_chunks",
        "n_tokens",
        "dup_chunks",
        "dup_tokens",
        F.round(
            F.col("dup_tokens").cast("double") / F.col("n_tokens"), 6
        ).alias("dup_token_frac"),
    )
