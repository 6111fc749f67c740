"""KMV (k-minimum-values) distinct-count sketch, plus the
Misra-Gries exact frequent-items path (:func:`mg_frequent`, X255).

The reference has no approximate aggregates; at 100 TB, exact
COUNT(DISTINCT) shuffles every distinct value. Spark's built-in
``approx_count_distinct`` (HLL++) covers that, but its estimate is not
replayable by another engine, so it can only get a rows-only check. KMV
(Bar-Yossef et al. 2002, "Counting distinct elements in a data stream")
is the sketch that IS exactly replayable: keep the k smallest distinct
hash values; if fewer than k exist the answer is exact, else estimate
``(k-1) / u_(k)`` where ``u_(k)`` is the k-th minimum normalized to
[0,1). With the cross-engine md5-60bit hash, Spark and DuckDB derive
bit-identical estimates — an oracle-checkable approximate aggregate.

Scale shape: a partition-local min-k combine (Arrow batches, O(k) state
per key) bounds the shuffle to ≤ k hashes per key per partition —
the same partial/final split a native UDAF would get — then one
groupBy merge re-takes the global min-k. min-k-of-distinct is a
semilattice merge, so the two-level result equals the single-pass
result exactly (property-tested in tests/test_sketch.py).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from seng550_a3_etl_spark.functions.hashing import HASH_BITS, hash64

_H = "__kmv_h"


def _estimate(hs: Column, k: int) -> Column:
    """hs = sorted array of ≤ |distinct| merged hash minima."""
    m = F.size(hs)
    scale = float((k - 1) * (1 << HASH_BITS))  # 6 sig bits — exact double
    return F.when(m < k, m.cast("double")).otherwise(
        F.lit(scale) / F.element_at(hs, k).cast("double")
    )


def duck_kmv_estimate(hs_expr: str, k: int) -> str:
    """DuckDB SQL computing exactly :func:`_estimate` over a sorted list."""
    scale = (k - 1) * (1 << HASH_BITS)
    return (
        f"CASE WHEN len({hs_expr}) < {k} THEN CAST(len({hs_expr}) AS DOUBLE) "
        f"ELSE CAST({scale} AS DOUBLE) / CAST({hs_expr}[{k}] AS DOUBLE) END"
    )


def _partition_minks(
    keys: Sequence[str], k: int
) -> "callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]":
    def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[tuple, list] = {}
        for pdf in batches:
            for key_vals, grp in pdf.groupby(list(keys), dropna=False, sort=False):
                if not isinstance(key_vals, tuple):
                    key_vals = (key_vals,)
                merged = state.get(key_vals)
                hs = grp[_H].unique()
                if merged is None:
                    pool = set(hs)
                else:
                    pool = set(merged)
                    pool.update(hs)
                state[key_vals] = sorted(pool)[:k]
            # O(k · n_keys) state regardless of partition size
        rows = [
            (*key_vals, h) for key_vals, hs in state.items() for h in hs
        ]
        yield pd.DataFrame(rows, columns=[*keys, _H])

    return combine


def kmv_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    k: int = 64,
    est_col: str = "est_distinct",
) -> DataFrame:
    """Per-``keys`` distinct-count estimate of ``value`` (string column).

    Exact below k distinct values, (k-1)/u_(k) above; relative error
    ~1/sqrt(k-2). Deterministic: same inputs → same estimate, in Spark
    and in the DuckDB oracle (build its SQL with
    :func:`duck_kmv_estimate`).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    keys = list(keys)
    hashed = (
        df.select(*keys, value.alias("__v"))
        .where(F.col("__v").isNotNull())
        .select(*keys, hash64(F.col("__v")).alias(_H))
    )
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in hashed.schema.fields
    )
    partial = hashed.mapInPandas(_partition_minks(keys, k), schema)
    return partial.groupBy(*keys).agg(
        _estimate(F.slice(F.array_sort(F.collect_set(_H)), 1, k), k).alias(
            est_col
        )
    )


def kmv_setops(
    a: DataFrame, b: DataFrame, a_key: str, b_key: str, k: int
) -> DataFrame:
    """KMV set-operation estimates between two key columns (Beyer et
    al., distinct-value synopses under multiset operations): one row
    with ``est_union`` ((k-1)/u_k over the merged re-minimized sketch)
    and ``est_inter`` (union estimate scaled by the fraction of merged
    minima present in BOTH side sketches). When the true union holds
    fewer than k keys both estimates degenerate to exact counts
    (k_eff = |merged|) — the property unit tests pin.

    Scale: each side folds to its k smallest distinct hashes via
    TakeOrdered (per-partition heaps + driver merge, never a global
    sort); the algebra then runs on two k-element arrays in one task."""

    def side(df: DataFrame, key: str, out: str) -> DataFrame:
        hashed = df.select(
            hash64(F.col(key).cast("string")).alias("h")
        ).distinct()
        return (
            hashed.orderBy("h")
            .limit(k)
            .agg(F.sort_array(F.collect_list("h")).alias(out))
        )

    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat("la", "lb"))), 1, k
    )
    m = side(a, a_key, "la").crossJoin(side(b, b_key, "lb")).select(
        "la", "lb", merged.alias("hm")
    )
    est_union = _estimate(F.col("hm"), k)
    k_int = F.size(
        F.filter(
            F.col("hm"),
            lambda x: F.array_contains("la", x) & F.array_contains("lb", x),
        )
    )
    k_eff = F.least(F.lit(k), F.size("hm"))
    return m.select(
        F.lit(k).cast("long").alias("k"),
        est_union.alias("est_union"),
        (k_int / k_eff.cast("double") * est_union).alias("est_inter"),
    )


# HyperLogLog constants: m=64 registers (alpha_64 from Flajolet et al.
# 2007, the m>=64 closed form 0.7213/(1+1.079/m) truncated to the
# canonical table value). The hash64 domain is 60 bits: 6 bucket bits +
# a 54-bit rho field, so register values lie in [1, 55] (55 = all-54-
# zeros convention) and the indicator sum scaled by 2^55 is an exact
# BIGINT in both engines — the same integer-exactness trick as KMV.
HLL_M = 64
HLL_ALPHA = 0.709
_HLL_RHO_FIELD = HASH_BITS - 6  # 54
_HLL_SCALE = 1 << (_HLL_RHO_FIELD + 1)  # 2^55
# Precomputed double literal shared verbatim with the oracle so the one
# float division is bit-identical: alpha * m^2 * 2^55.
HLL_NUMER = HLL_ALPHA * HLL_M * HLL_M * float(_HLL_SCALE)


def hll_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    est_col: str = "est_distinct",
) -> DataFrame:
    """Per-``keys`` HyperLogLog distinct-count estimate of ``value`` —
    the register-sketch counterpart of :func:`kmv_distinct` (bit-
    pattern observables instead of order statistics; Flajolet-Fuss-
    Gandouet-Meunier 2007). Raw estimator only (no small/large-range
    correction): corrections need ln(), whose cross-engine bit-equality
    is not guaranteed, while the raw path is integer arithmetic plus
    ONE double division — deterministic, hence oracle-checkable.

    Scale: the register table is the whole state — ≤ m rows per key
    after one (keys, bucket) max-rho aggregation with map-side combine;
    registers merge by MAX, so partial aggregation is exact and the
    shuffle carries (keys, 64 longs) per partition regardless of row
    count. Returns one row per key group: ``n_zero_regs``, the scaled
    integer register sum, and the estimate.
    """
    keys = list(keys)
    hashed = (
        df.select(*keys, value.alias("__v"))
        .where(F.col("__v").isNotNull())
        .select(*keys, hash64(F.col("__v")).alias("__h"))
    )
    # bucket = low 6 bits; rho = leading zeros of the 54-bit remainder
    # + 1 (bin() renders no leading zeros, so rho = 55 - bitlen; the
    # all-zeros remainder gives bin='0' -> ltrim '' -> rho 55).
    regs = hashed.select(
        *keys,
        (F.col("__h") % HLL_M).alias("__b"),
        (
            F.lit(_HLL_RHO_FIELD + 1)
            - F.length(F.expr(f"ltrim('0', bin(__h div {HLL_M}))"))
        ).alias("__rho"),
    ).groupBy(*keys, "__b").agg(F.max("__rho").alias("__m"))
    agg = regs.groupBy(*keys).agg(
        F.sum(
            F.expr(
                f"shiftleft(cast(1 as bigint), {_HLL_RHO_FIELD + 1} - __m)"
            )
        ).alias("__present_sum"),
        F.count(F.lit(1)).alias("__n_present"),
    )
    reg_sum = F.col("__present_sum") + (
        F.lit(HLL_M) - F.col("__n_present")
    ) * F.lit(_HLL_SCALE)
    return agg.select(
        *keys,
        (F.lit(HLL_M) - F.col("__n_present")).cast("long").alias(
            "n_zero_regs"
        ),
        reg_sum.cast("long").alias("reg_sum"),
        F.round(F.lit(HLL_NUMER) / reg_sum.cast("double"), 4).alias(est_col),
    )


def duck_hll_estimate(table: str, key_cols: str, value_expr: str) -> str:
    """DuckDB SQL replaying :func:`hll_distinct` bit-for-bit (same
    md5-60bit hash, same register math, same precomputed numerator)."""
    from seng550_a3_etl_spark.functions.hashing import duck_hash64

    rho_field = _HLL_RHO_FIELD
    return f"""
    WITH __hashed AS (
      SELECT {key_cols}, {duck_hash64(value_expr)} AS h
      FROM {table} WHERE {value_expr} IS NOT NULL
    ),
    __regs AS (
      SELECT {key_cols}, h % {HLL_M} AS b,
             MAX({rho_field + 1} - length(ltrim(bin(h // {HLL_M}), '0')))
               AS m
      FROM __hashed GROUP BY ALL
    ),
    __agg AS (
      SELECT {key_cols},
             SUM(1::BIGINT << ({rho_field + 1} - m)) AS present_sum,
             COUNT(*) AS n_present
      FROM __regs GROUP BY ALL
    )
    SELECT {key_cols},
           CAST({HLL_M} - n_present AS BIGINT) AS n_zero_regs,
           CAST(present_sum + ({HLL_M} - n_present) * {_HLL_SCALE}::BIGINT
                AS BIGINT) AS reg_sum,
           ROUND({HLL_NUMER!r} / CAST(present_sum
                 + ({HLL_M} - n_present) * {_HLL_SCALE}::BIGINT AS DOUBLE),
                 4) AS est
    FROM __agg
    """


def _mg_summaries(capacity: int):
    """Partition-local Misra-Gries summary kernel (Arrow batches,
    O(capacity) state regardless of partition size).

    Batch-compaction form: after folding a batch into the counter, if
    more than ``capacity`` items are tracked, subtract the
    (capacity+1)-th largest count from every entry and drop the
    non-positive. Each compaction removes >= (capacity+1) * v units of
    mass (at least capacity+1 entries hold >= v), so the cumulative
    decrement any single item can suffer is <= n_p / (capacity+1) —
    the classic Misra-Gries bound. Hence any item with partition
    frequency > n_p / (capacity+1) survives in the summary.

    Every partition also emits a (pid, NULL, 0, n_p) sentinel row so
    the exact partition size reaches the merge even when compaction
    empties the summary (all-uniform partitions legitimately keep
    nothing)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import collections

        counter: collections.Counter = collections.Counter()
        n_p = 0
        pid = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["pid"].iloc[0])
            vals = pdf["v"].tolist()
            n_p += len(vals)
            counter.update(vals)
            if len(counter) > capacity:
                cs = sorted(counter.values(), reverse=True)
                v = cs[capacity]
                counter = collections.Counter(
                    {k: c - v for k, c in counter.items() if c > v}
                )
        if pid is not None:
            yield pd.DataFrame(
                {
                    "pid": pid,
                    "v": [None, *counter.keys()],
                    "mgc": [0, *counter.values()],
                    "np": n_p,
                }
            )

    return gen


def mg_frequent(
    df: DataFrame,
    value: Column,
    threshold_denom: int,
    capacity: int | None = None,
) -> DataFrame:
    """EXACT frequent items (count * threshold_denom > n, i.e. share
    > 1/threshold_denom) via the two-phase Misra-Gries plan (Misra &
    Gries 1982; mergeable-summaries form of Agarwal et al. 2012) — the
    bounded-memory member of the heavy-hitter trio: X75
    ``vocab_top_tokens`` shuffles the full |domain| rollup, X150
    ``cms_heavy_hitters`` trades a fixed sketch for overestimates;
    this path shuffles <= capacity+1 rows PER PARTITION and still
    returns exact counts.

    Phase 1 builds per-partition MG summaries (see
    :func:`_mg_summaries`); the union of summary keys is a GUARANTEED
    superset of the true frequent items for any partition layout: if
    count(x) > n / threshold_denom with capacity >= threshold_denom,
    then by averaging some partition has count_p(x) > n_p /
    (capacity+1), where the MG bound keeps x. Phase 2 re-scans the
    input once, broadcast-semi-joins the candidate set, and recounts
    exactly — so the OUTPUT is deterministic and layout-independent
    even though the intermediate summaries are not (the reason this
    op's correctness gate is the synthetic-skew property suite in
    tests/test_new_ops.py rather than a fixture oracle: every fixture
    domain is either 31-token tiny or near-uniform, so a share
    threshold is degenerate there — see SURVEY X255).

    Returns (item string, cnt long, share_ppm long) with exact integer
    counts and integer-DIV ppm shares. Scale: two scans; the phase-1
    shuffle is (capacity+1) * n_partitions rows; the phase-2 rollup is
    |candidates|-bounded with the candidate list broadcast.
    """
    if threshold_denom < 2:
        raise ValueError("threshold_denom must be >= 2")
    capacity = capacity or 4 * threshold_denom
    if capacity < threshold_denom:
        raise ValueError(
            "capacity must be >= threshold_denom for the MG "
            "candidate-superset guarantee"
        )
    vals = (
        df.select(value.cast("string").alias("v"))
        .where(F.col("v").isNotNull())
        .withColumn("pid", F.spark_partition_id())
    )
    summaries = vals.mapInPandas(
        _mg_summaries(capacity), "pid int, v string, mgc long, np long"
    )
    # Two consumers (total + candidates) of the tiny summary frame.
    summaries = summaries.localCheckpoint()
    n = summaries.groupBy("pid").agg(F.max("np").alias("np")).agg(
        F.sum("np").alias("n")
    )
    cands = summaries.where(F.col("v").isNotNull()).select("v").distinct()
    counts = (
        df.select(value.cast("string").alias("v"))
        .where(F.col("v").isNotNull())
        .join(F.broadcast(cands), "v")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(n))
        .where(F.col("cnt") * threshold_denom > F.col("n"))
        .select(
            F.col("v").alias("item"),
            F.col("cnt").cast("long").alias("cnt"),
            F.expr("cnt * 1000000 DIV n").alias("share_ppm"),
        )
    )
