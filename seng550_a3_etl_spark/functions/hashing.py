"""Cross-engine-deterministic 60-bit hashing, MinHash, and SimHash.

Spark's native xxhash64 and DuckDB's hash() use different algorithms, so
oracle-checked dedup needs a hash both engines compute identically. We
derive a 60-bit integer from md5 (both engines agree on md5 of UTF-8):

    Spark:  conv(substring(md5(s), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT

15 hex digits = 60 bits, safely inside a signed 64-bit integer. md5 is
~2-3× slower than xxhash64 but still JVM-side and vectorizable; swap
``hash64`` for ``F.xxhash64`` in production when oracle parity is not
required (the operators take the hash function as a parameter).

MinHash signatures and SimHash fingerprints come in two equivalent
forms: per-row HOF column expressions (``minhash_signature`` /
``simhash`` — shuffle-free, used as the executable spec) and
explode+groupBy DataFrame transforms (``minhash_signatures`` /
``simhash_fingerprints`` — whole-stage-codegen hashing plus map-side
partial aggregation; ~7× faster and the form the dedup operators use).
"""

from __future__ import annotations

import hashlib
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 60


def hash64(col: Column, *, seed: int | None = None) -> Column:
    """60-bit deterministic hash of a string column (optionally seeded).

    ``seed`` is KEYWORD-ONLY on purpose: ``F.transform(arr, fn)``
    inspects ``fn``'s positional arity and, for a two-positional-arg
    function, passes the element INDEX as the second argument — which
    here landed in the seed f-string as the index Column's repr,
    silently prefixing every hash with a plan-unique string (r10 bug:
    values stayed internally consistent per plan, so grouping-only
    oracles kept passing, but cross-lineage hash joins matched ZERO
    rows and the documented DuckDB bit-equality was false). With seed
    keyword-only the positional arity is 1 and a bare
    ``F.transform(arr, hash64)`` hashes exactly the element."""
    s = F.concat(F.lit(f"{seed}:"), col) if seed is not None else col
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def duck_hash64(expr: str, seed: int | None = None) -> str:
    """The DuckDB SQL computing exactly :func:`hash64`."""
    s = f"'{seed}:' || {expr}" if seed is not None else expr
    return f"(('0x' || substr(md5({s}), 1, 15))::BIGINT)"


# MinHash permutations are affine maps (A_i * h + B_i) mod MH_PRIME over a
# single md5-derived 30-bit base hash — one md5 per shingle instead of one
# per shingle *per permutation* (8× fewer md5s at num_perm=8; the affine
# reseed is pure codegen'd integer math). 30-bit base keeps A_i * h inside
# a signed 64-bit integer in both engines; MH_PRIME is the largest prime
# below 2^30 (universal-hash family per Carter-Wegman).
MH_DOMAIN = 1 << 30
MH_PRIME = 1073741789


def _mh_coeffs(num_perm: int) -> tuple[list[int], list[int]]:
    a = [
        int(hashlib.md5(f"mh-a:{i}".encode()).hexdigest()[:15], 16)
        % (MH_PRIME - 1)
        + 1
        for i in range(num_perm)
    ]
    b = [
        int(hashlib.md5(f"mh-b:{i}".encode()).hexdigest()[:15], 16) % MH_PRIME
        for i in range(num_perm)
    ]
    return a, b


def minhash_signature(shingles: Column, num_perm: int) -> Column:
    """MinHash signature as an array<long> of ``num_perm`` seeded minima.

    min over the shingle set of a seeded hash approximates a random
    permutation's first element; equality probability per position equals
    the Jaccard similarity (Broder 1997). Empty shingle sets get
    sentinel-free null mins (array_min of empty → null)."""
    a, b = _mh_coeffs(num_perm)
    hs = F.transform(shingles, lambda s: hash64(s) % MH_DOMAIN)

    def _perm(i: int):
        # one-arg lambda only: a two-arg transform lambda is
        # interpreted by Spark as (element, array_index), which made
        # the previous default-arg form a build-time TypeError
        ai, bi = F.lit(a[i]), F.lit(b[i])
        return lambda h: (h * ai + bi) % F.lit(MH_PRIME)

    return F.array(
        *[
            F.array_min(F.transform(hs, _perm(i)))
            for i in range(num_perm)
        ]
    )


def duck_minhash_signature(shingles_expr: str, num_perm: int) -> str:
    """The DuckDB SQL computing exactly :func:`minhash_signature`."""
    a, b = _mh_coeffs(num_perm)
    base = f"({duck_hash64('s')} % {MH_DOMAIN})"
    mins = ", ".join(
        f"list_aggregate(list_transform({shingles_expr}, s -> "
        f"({base} * {a[i]} + {b[i]}) % {MH_PRIME}), 'min')"
        for i in range(num_perm)
    )
    return f"[{mins}]"


def minhash_signatures(
    df: DataFrame, id_col: str, shingles: Column, num_perm: int
) -> DataFrame:
    """(id, sig array<long>) MinHash signatures, explode+groupBy form.

    Semantically identical to projecting :func:`minhash_signature`, but
    the seeded hashes run inside whole-stage codegen over exploded
    shingle rows and the minima are partial-aggregated map-side — at
    scale the shuffle carries only (id, num_perm longs) per document
    per partition, and each shingle is md5-hashed exactly once (the
    permutations are affine reseeds of that one base hash). Rows with an
    empty/null shingle array are absent from the output (mirrors the
    ``size(sh) > 0`` pre-filter every caller applies)."""
    a, b = _mh_coeffs(num_perm)
    ex = df.select(F.col(id_col), F.explode(shingles).alias("__s")).select(
        id_col, (hash64(F.col("__s")) % MH_DOMAIN).alias("__h")
    )
    agg = ex.groupBy(id_col).agg(
        *[
            F.min(
                (F.col("__h") * F.lit(a[i]) + F.lit(b[i])) % F.lit(MH_PRIME)
            ).alias(f"__m{i}")
            for i in range(num_perm)
        ]
    )
    return agg.select(
        id_col,
        F.array(*[F.col(f"__m{i}") for i in range(num_perm)]).alias("sig"),
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str, tokens: Column, bits: int = HASH_BITS
) -> DataFrame:
    """(id, fp) SimHash fingerprints, explode+groupBy form.

    Bit-identical to projecting :func:`simhash` (verified in tests), but
    ~7× faster: the md5 token hash is computed once per token inside
    codegen, the 60 per-bit ±1 sums are literal-shift column aggregates
    with map-side partial aggregation, and the shuffle carries one
    60-long row per (document, partition). Documents whose token array
    is empty/null surface with fp = 0 via the closing left join."""
    # Pack 2 per-bit counters into each 64-bit sum (32 bits/counter): 31
    # aggregate columns instead of 61. The sign test becomes
    # 2*ones_j > n_tokens, which equals the ±1-sum's > 0 — bit-identical
    # fingerprints, ~2× less aggregation state. Counter capacity bounds
    # tokens/doc at 2^31 (the packed SUM itself would overflow signed 64
    # first) — a multi-GB single document; 16-bit packing was rejected
    # because its 65535-token bound is realistic for long documents and
    # overflow silently corrupts neighboring counters.
    ctr_bits, per_long = 32, 2
    n_longs = (bits + per_long - 1) // per_long
    hashed = df.select(F.col(id_col), F.explode(tokens).alias("__t")).select(
        id_col, hash64(F.col("__t")).alias("__h")
    )

    def packed(g: int):
        terms = [
            F.shiftleft(
                F.shiftright(F.col("__h"), g * per_long + s).bitwiseAND(
                    F.lit(1)
                ),
                ctr_bits * s,
            )
            for s in range(per_long)
            if g * per_long + s < bits
        ]
        return reduce(lambda a, b: a + b, terms)

    sums = hashed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(packed(g)).alias(f"__p{g}") for g in range(n_longs)],
    )

    def ones(j: int):
        g, s = j // per_long, j % per_long
        return F.shiftright(F.col(f"__p{g}"), ctr_bits * s).bitwiseAND(
            F.lit((1 << ctr_bits) - 1)
        )

    fp = sums.select(
        id_col,
        reduce(
            lambda a, b: a + b,
            [
                (ones(j) * 2 > F.col("__n")).cast("long") * F.lit(1 << j)
                for j in range(bits)
            ],
        ).alias("fp"),
    )
    return (
        df.select(id_col)
        .join(fp, id_col, "left")
        .select(id_col, F.coalesce("fp", F.lit(0)).cast("long").alias("fp"))
    )


def simhash_onepass(tokens: Column, bits: int = HASH_BITS) -> Column:
    """Per-row SimHash fingerprint in ONE array fold — the stateless
    form a streaming micro-batch needs (:func:`simhash_fingerprints`'s
    explode+groupBy is a streaming AGGREGATION and illegal in append
    mode; :func:`simhash`'s ``bits`` independent folds re-walk the
    token array ``bits`` times and pay a ``bits``-sized codegen chain —
    measured 9.8 s cold / 3.6 s warm for 500 docs at 60 bits).

    One ``aggregate`` carries all ``bits`` ±1 counters as a long-array
    accumulator (zip_with add of each hash's bit-plane 0/1 vector);
    the sign test is the same ``2*ones_j > n_tokens`` identity the
    packed batch form uses, so fingerprints are bit-identical to both
    (asserted in tests/test_hashing.py)."""
    hs = F.transform(tokens, lambda t: hash64(t))
    n = F.size(hs)
    # (h & mask != 0): plain Column methods work on HOF lambda vars,
    # F.shiftright's int-arg signature doesn't (see simhash below).
    ones = F.aggregate(
        hs,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    (h.bitwiseAND(F.lit(1 << j)) != 0).cast("long")
                    for j in range(bits)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    weights = F.array(*[F.lit(1 << j).cast("long") for j in range(bits)])
    fp = F.aggregate(
        F.zip_with(
            ones,
            weights,
            lambda o, w: F.when(o * 2 > n, w).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # coalesce does double duty: null token arrays → fp 0 (the batch
    # form's closing-left-join contract), AND the result becomes
    # non-nullable — without this, a downstream equi-join on a derived
    # chunk key makes InferFiltersFromConstraints push
    # isnotnull(<entire fold>) into the parquet scan's DataFilters,
    # re-evaluating the fold per row BEFORE any repartition (measured:
    # 20 s single-core at sf0.1 vs 2 s with the constraint gone).
    return F.coalesce(fp, F.lit(0).cast("long"))


def simhash(tokens: Column, bits: int = HASH_BITS) -> Column:
    """SimHash fingerprint (Charikar 2002): per bit position j, sum ±1
    over token hashes' j-th bit (with multiplicity); fingerprint bit j is
    the sign. Near-identical token multisets → small Hamming distance.

    Computed as ``bits`` HOF aggregates over the precomputed per-token
    hash array — one pass, JVM-side, no shuffle."""
    # (h & mask != 0) instead of shiftright: plain Column methods work on
    # HOF lambda variables, F.shiftright's int-arg signature doesn't. The
    # closure factory keeps the merge lambda binary (pyspark derives the
    # lambda arity from the Python signature, defaults included).
    def _bit_step(mask: Column):
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(mask) != 0, 1
        ).otherwise(-1)

    hs = F.transform(tokens, lambda t: hash64(t))
    fp = F.lit(0).cast("long")
    for j in range(bits):
        bit_sum = F.aggregate(
            hs, F.lit(0).cast("long"), _bit_step(F.lit(1 << j))
        )
        fp = fp + (bit_sum > 0).cast("long") * F.lit(1 << j)
    return fp


def duck_simhash(tokens_expr: str, bits: int = HASH_BITS) -> str:
    """The DuckDB SQL computing exactly :func:`simhash` (hashes the token
    list once into ``hs``, then sums each bit plane)."""
    h = duck_hash64("t")
    terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> ((h >> {j}) & 1) * 2 - 1)) > 0 "
        f"THEN {1 << j}::BIGINT ELSE 0 END)"
        for j in range(bits)
    )
    return (
        f"(SELECT {terms} FROM "
        f"(SELECT list_transform({tokens_expr}, t -> {h}) AS hs))"
    )


def simhash_fingerprints_idf(
    df: DataFrame, id_col: str, tokens: Column, bits: int = HASH_BITS
) -> DataFrame:
    """(id, fp) IDF-weighted SimHash fingerprints — the documented
    remedy for same-distribution fingerprint clustering (see
    operators/text_dedup.py simhash_block_combos and the r14
    COST_DECADES.json simhash_band_census record): with unit weights,
    the corpus's common tokens steer every document's bit votes the
    same way, so same-language docs agree on far more than half their
    bits and flood any banding's buckets. Weighting each token's vote
    by ln(N / df) (Charikar's weighted SimHash with the standard IDF
    choice) zeroes the ubiquitous tokens (df = N → weight 0) and lets
    the rare, topical tokens — the ones that actually distinguish
    documents — set the bits.

    Two-pass, both distributed: (1) per-token document frequency (one
    groupBy over distinct (doc, token) cells, map-side combined) and
    the corpus size (broadcast one-row frame); (2) per (doc, bit), the
    weighted ±vote sum as ``bits`` double aggregates (map-side
    combined; the shuffle carries one 60-double row per document per
    partition). Within-doc repeats multiply their token's vote by the
    count, matching the unweighted form's semantics. Docs whose token
    array is empty/null surface with fp = 0 via the closing left join,
    mirroring :func:`simhash_fingerprints`. Ties (vote sum exactly 0,
    e.g. every token at weight 0) resolve to bit 0.

    The near-dup pair QUERIES keep the unweighted form (IDF weights are
    corpus state, so weighting changes the verified relation itself);
    the banding-budget comparison IS oracle-checked — the suite's
    ``simhash_idf_band_budget`` fits the df table in-query (the
    ``unigram_logprob_quality`` precedent) and its DuckDB oracle
    replays both passes via :func:`duck_simhash_idf`."""
    ex = df.select(F.col(id_col), F.explode(tokens).alias("__t"))
    tf = ex.groupBy(id_col, "__t").agg(F.count(F.lit(1)).alias("__c"))
    dfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = df.select(
        F.count(F.lit(1)).cast("double").alias("__n_docs")
    )
    weighted = (
        tf.join(dfreq, "__t")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            hash64(F.col("__t")).alias("__h"),
            (
                F.col("__c")
                * F.log(F.col("__n_docs") / F.col("__df"))
            ).alias("__w"),
        )
    )

    def vote(j: int):
        bit = F.shiftright(F.col("__h"), j).bitwiseAND(F.lit(1))
        return F.sum(F.col("__w") * (bit * 2 - 1).cast("double"))

    sums = weighted.groupBy(id_col).agg(
        *[vote(j).alias(f"__s{j}") for j in range(bits)]
    )
    fp = sums.select(
        id_col,
        reduce(
            lambda a, b: a + b,
            [
                (F.col(f"__s{j}") > 0).cast("long") * F.lit(1 << j)
                for j in range(bits)
            ],
        ).alias("fp"),
    )
    return (
        df.select(id_col)
        .join(fp, id_col, "left")
        .select(id_col, F.coalesce("fp", F.lit(0)).alias("fp"))
    )


def duck_simhash_idf(toks_rel: str, bits: int = HASH_BITS) -> str:
    """The DuckDB SQL computing exactly :func:`simhash_fingerprints_idf`
    as a ``(doc, fp)`` relation over ``toks_rel``, a relation exposing
    ``(doc_id, t)`` with ``t`` the token list. Both IDF passes are
    replayed: document frequency + corpus size first, then the 60
    weighted ±vote sums per document. Cross-engine float note: the
    weights are ``c * ln(N/df)`` doubles, so engine libm/summation-order
    differences can move a vote sum by ~1 ulp — a bit flips only when a
    sum sits within ~1e-13 relative of zero, and the one systematic
    zero (every-token-ubiquitous docs: ln(1) = 0 exactly, both engines)
    ties to bit 0 identically on both sides."""
    h = duck_hash64("tok")
    sums = ", ".join(
        f"SUM(w * (((h >> {j}) & 1) * 2 - 1)) AS s{j}" for j in range(bits)
    )
    fp_term = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END)"
        for j in range(bits)
    )
    return f"""(
    WITH __ex AS (
      SELECT doc_id AS doc, unnest(t) AS tok FROM {toks_rel}
    ),
    __tf AS (SELECT doc, tok, COUNT(*) AS c FROM __ex GROUP BY doc, tok),
    __dfreq AS (SELECT tok, COUNT(*) AS dfq FROM __tf GROUP BY tok),
    __nd AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM {toks_rel}),
    __w AS (
      SELECT doc, {h} AS h, c * ln(n_docs / dfq) AS w
      FROM __tf JOIN __dfreq USING (tok) CROSS JOIN __nd
    ),
    __s AS (SELECT doc, {sums} FROM __w GROUP BY doc),
    __fp AS (SELECT doc, {fp_term} AS fp FROM __s)
    SELECT d.doc_id AS doc, COALESCE(f.fp, 0::BIGINT) AS fp
    FROM {toks_rel} d LEFT JOIN __fp f ON f.doc = d.doc_id
    )"""
