"""Property-based tests (hypothesis) for operators/stats: the
largest-remainder allocation and the weighted median on random integer
inputs vs Python brute force — invariants the fixed-fixture suite
queries can't sweep (degenerate weights, single-row groups, heavy
ties)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from seng550_a3_etl_spark.operators.stats import (
    largest_remainder,
    weighted_median,
)

# Groups of (total, [weights]) — weights >= 1 so proportionality is
# well-defined (the operators document sum(w) > 0 as a precondition).
_group = st.tuples(
    st.integers(min_value=0, max_value=10_000),
    st.lists(st.integers(min_value=1, max_value=500), min_size=1,
             max_size=6),
)
_groups = st.lists(_group, min_size=1, max_size=5)


def _brute_allocate(total: int, weights: list[int]) -> list[int]:
    tw = sum(weights)
    base = [total * w // tw for w in weights]
    rem = total - sum(base)
    order = sorted(
        range(len(weights)),
        key=lambda i: (-(total * weights[i] % tw), i),
    )
    for i in order[:rem]:
        base[i] += 1
    return base


@given(groups=_groups)
@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_largest_remainder_matches_brute_force(spark, groups):
    rows = [
        (g, i, w, total)
        for g, (total, weights) in enumerate(groups)
        for i, w in enumerate(weights)
    ]
    df = spark.createDataFrame(
        rows, "grp long, idx long, w long, total long"
    )
    out = largest_remainder(
        df, ["grp"], "w", "total", ["idx"], out_col="alloc"
    )
    got = {(r.grp, r.idx): r.alloc for r in out.collect()}
    for g, (total, weights) in enumerate(groups):
        expect = _brute_allocate(total, weights)
        alloc = [got[(g, i)] for i in range(len(weights))]
        assert alloc == expect
        assert sum(alloc) == total  # the invariant the operator exists for


def _brute_wmedian(pairs: list[tuple[int, int]]) -> int:
    # pairs of (value, weight); lower weighted median — smallest value
    # whose cumulative weight in value order reaches half the total.
    tot = sum(w for _, w in pairs)
    cum = 0
    for v, w in sorted(pairs, key=lambda p: p[0]):
        cum += w
        if 2 * cum >= tot:
            return v
    raise AssertionError("unreachable")


_wpairs = st.lists(
    st.tuples(
        st.integers(min_value=-100, max_value=100),
        st.integers(min_value=1, max_value=50),
    ),
    min_size=1,
    max_size=12,
)


@given(pairs=_wpairs)
@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_weighted_median_matches_brute_force(spark, pairs):
    df = spark.createDataFrame(
        [(0, i, v, w) for i, (v, w) in enumerate(pairs)],
        "grp long, idx long, v long, w long",
    )
    out = weighted_median(df, ["grp"], "v", "w", ["idx"]).collect()
    assert len(out) == 1
    assert out[0].wmedian == _brute_wmedian(pairs)
    assert out[0].total_weight == sum(w for _, w in pairs)
    assert out[0].n_rows == len(pairs)
