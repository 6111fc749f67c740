"""Property-based tests (hypothesis) for the shared posting-pair
machinery (pair_intersections / containment_pairs / ngram_jaccard_pairs)
and the interval-concurrency sweep — random inputs vs set-math /
point-coverage brute force, beyond the fixed fixtures the
definition-level tests use."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from seng550_a3_etl_spark.operators.text_dedup import (
    containment_pairs,
    ngram_jaccard_pairs,
)

# Tiny vocab so random docs actually share shingles.
_words = st.sampled_from(["a", "b", "c", "d"])
_doc = st.lists(_words, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=0, max_size=8)


def _sets3(text: str) -> set:
    t = text.split(" ") if text else [""]
    return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}


@given(docs=_corpus)
@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pair_machinery_matches_set_math(spark, docs):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)] or [(0, "")],
        "doc_id long, text string",
    )
    if not docs:
        df = df.limit(0)
    sets = {i: _sets3(d) for i, d in enumerate(docs)}
    sets = {i: s for i, s in sets.items() if s}

    expect_j, expect_c = {}, {}
    ids = sorted(sets)
    for x, a in enumerate(ids):
        for b in ids[x + 1 :]:
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            union = len(sets[a]) + len(sets[b]) - inter
            if inter / union >= 0.6:
                expect_j[(a, b)] = inter
            if max(inter / len(sets[a]), inter / len(sets[b])) >= 0.6:
                expect_c[(a, b)] = inter

    got_j = {
        (r.doc_a, r.doc_b): r.inter
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.6
        ).collect()
    }
    got_c = {
        (r.doc_a, r.doc_b): r.inter
        for r in containment_pairs(
            df, "doc_id", "text", n=3, threshold=0.6
        ).collect()
    }
    assert got_j == expect_j
    assert got_c == expect_c
    assert set(got_j) <= set(got_c)  # containment dominates Jaccard


_sessions = st.lists(
    st.tuples(
        st.integers(0, 3_000_000),  # start, in seconds over ~35 days
        st.integers(0, 90_000),  # duration seconds (can cross midnight)
    ),
    min_size=1,
    max_size=12,
)


@given(sess=_sessions)
@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_interval_sweep_matches_point_coverage(spark, sess):
    """The +1/-1 sweep (as used by session_concurrency, rebuilt here on
    raw intervals) equals brute-force point coverage with midnight
    splitting, for random intervals including midnight-crossing and
    instant-touching ones."""
    from datetime import datetime, time, timedelta

    base = datetime(2020, 1, 1)
    iv = [
        (base + timedelta(seconds=s), base + timedelta(seconds=s + d))
        for s, d in sess
    ]
    # brute force: split at midnight, then per day check coverage at
    # every segment start point
    segs = []
    for lo, hi in iv:
        d = lo.date()
        while d <= hi.date():
            a = max(lo, datetime.combine(d, time.min))
            b = min(
                hi,
                datetime.combine(d + timedelta(days=1), time.min)
                - timedelta(microseconds=1),
            )
            segs.append((d, a, b))
            d += timedelta(days=1)
    by_day: dict = {}
    for d, a, b in segs:
        by_day.setdefault(d, []).append((a, b))
    expect = {
        d.isoformat(): max(
            sum(1 for a2, b2 in xs if a2 <= a <= b2) for a, _ in xs
        )
        for d, xs in by_day.items()
    }

    from pyspark.sql import Window

    df = spark.createDataFrame(
        iv, "session_start timestamp, session_end timestamp"
    )
    day = F.explode(
        F.sequence(
            F.col("session_start").cast("date"),
            F.col("session_end").cast("date"),
        )
    ).alias("day")
    seg = df.select(day, "session_start", "session_end").select(
        "day",
        F.greatest(
            F.col("session_start"), F.col("day").cast("timestamp")
        ).alias("a"),
        F.least(
            F.col("session_end"),
            F.date_add(F.col("day"), 1).cast("timestamp")
            - F.expr("INTERVAL 1 MICROSECOND"),
        ).alias("b"),
    )
    pts = seg.select(
        "day", F.col("a").alias("ts"), F.lit(1).alias("delta")
    ).unionAll(seg.select("day", F.col("b"), F.lit(-1)))
    w = (
        Window.partitionBy("day")
        .orderBy(F.col("ts"), F.col("delta").desc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        r.day: r.peak
        for r in pts.select("day", F.sum("delta").over(w).alias("live"))
        .groupBy("day")
        .agg(F.max("live").cast("int").alias("peak"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"), "peak"
        )
        .collect()
    }
    assert got == expect


# HLL (X139): register construction vs a pure-Python replay on random
# multisets — beyond the fixed-cardinality unit tests in test_sketch.py.
_hll_vals = st.lists(
    st.integers(0, 400).map(lambda i: f"u{i}"), min_size=1, max_size=120
)


@given(vals=_hll_vals)
@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_hll_registers_match_python_replay(spark, vals):
    import hashlib

    from seng550_a3_etl_spark.operators.sketch import (
        HLL_M,
        HLL_NUMER,
        hll_distinct,
    )

    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v string")
    row = hll_distinct(df, ["grp"], F.col("v")).collect()[0]

    regs: dict[int, int] = {}
    for v in set(vals):
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        b, r = h % HLL_M, h // HLL_M
        rho = 55 - r.bit_length()  # bit_length(0) == 0 -> rho 55
        regs[b] = max(regs.get(b, 0), rho)
    reg_sum = sum(1 << (55 - m) for m in regs.values()) + (
        HLL_M - len(regs)
    ) * (1 << 55)
    assert row.n_zero_regs == HLL_M - len(regs)
    assert row.reg_sum == reg_sum
    assert row.est_distinct == round(HLL_NUMER / float(reg_sum), 4)
