"""Connected-components tests: the driver-side union-find path and the
distributed min-label loop must produce identical labelings, and both
must match brute-force reachability."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from seng550_a3_etl_spark.operators import graph


def _brute_components(edge_rows):
    adj: dict = {}
    for s, t in edge_rows:
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    labels = {}
    for start in adj:
        if start in labels:
            continue
        seen, stack = {start}, [start]
        while stack:
            n = stack.pop()
            for m in adj[n]:
                if m not in seen:
                    seen.add(m)
                    stack.append(m)
        lo = min(seen)
        for n in seen:
            labels[n] = lo
    return labels


_edges = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), max_size=15
)


@given(edges=_edges)
@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_both_paths_match_brute_force(spark, edges):
    df = spark.createDataFrame(
        edges or [(0, 0)], "src long, dst long"
    )
    if not edges:
        df = df.limit(0)
    expect = _brute_components(edges)

    fast = {
        (r.node, r.label)
        for r in graph.connected_components(df).collect()
    }
    assert fast == set(expect.items())

    orig = graph.DRIVER_EDGE_THRESHOLD
    try:
        graph.DRIVER_EDGE_THRESHOLD = -1  # force the distributed loop
        dist = {
            (r.node, r.label)
            for r in graph.connected_components(df).collect()
        }
    finally:
        graph.DRIVER_EDGE_THRESHOLD = orig
    assert dist == set(expect.items())


def test_non_convergence_raises(spark):
    """A diameter->max_iter graph must fail loudly, not return a partial
    labeling as if it converged."""
    import pytest

    chain = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(chain, "src long, dst long")
    orig = graph.DRIVER_EDGE_THRESHOLD
    try:
        graph.DRIVER_EDGE_THRESHOLD = -1
        with pytest.raises(RuntimeError, match="did not converge"):
            graph.connected_components(df, max_iter=3)
    finally:
        graph.DRIVER_EDGE_THRESHOLD = orig


def test_convergence_exactly_at_max_iter_does_not_raise(spark):
    """A diameter-d graph with max_iter=d must succeed: the implementation
    allows one extra zero-change round to confirm the fixpoint, so
    finishing on the last permitted update round is not an error."""
    d = 5
    chain = [(i, i + 1) for i in range(d)]
    df = spark.createDataFrame(chain, "src long, dst long")
    orig = graph.DRIVER_EDGE_THRESHOLD
    try:
        graph.DRIVER_EDGE_THRESHOLD = -1
        got = {
            (r.node, r.label)
            for r in graph.connected_components(df, max_iter=d).collect()
        }
    finally:
        graph.DRIVER_EDGE_THRESHOLD = orig
    assert got == {(i, 0) for i in range(d + 1)}


def test_threshold_boundary_parity(spark):
    """Exercise the adaptive gate AT its boundary (VERDICT r4 #7): with
    the threshold set to exactly the edge count the union-find path runs
    (<=), one below it the distributed loop runs — both must label a
    random-ish graph identically and match brute force."""
    import random

    rng = random.Random(550)
    edges = list({
        tuple(sorted((rng.randrange(40), rng.randrange(40))))
        for _ in range(60)
    })
    df = spark.createDataFrame(edges, "src long, dst long")
    expect = set(_brute_components(edges).items())

    orig = graph.DRIVER_EDGE_THRESHOLD
    try:
        graph.DRIVER_EDGE_THRESHOLD = len(edges)  # == count: union-find
        below = {
            (r.node, r.label)
            for r in graph.connected_components(df).collect()
        }
        graph.DRIVER_EDGE_THRESHOLD = len(edges) - 1  # distributed loop
        above = {
            (r.node, r.label)
            for r in graph.connected_components(df).collect()
        }
    finally:
        graph.DRIVER_EDGE_THRESHOLD = orig
    assert below == expect
    assert above == expect


def test_long_chain_converges(spark):
    # a path graph is the worst case for min-label propagation
    # (diameter = n); labels must still reach the global minimum
    chain = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(chain, "src long, dst long")
    orig = graph.DRIVER_EDGE_THRESHOLD
    try:
        graph.DRIVER_EDGE_THRESHOLD = -1
        got = {
            (r.node, r.label)
            for r in graph.connected_components(df).collect()
        }
    finally:
        graph.DRIVER_EDGE_THRESHOLD = orig
    assert got == {(i, 0) for i in range(13)}


def test_pagerank_step_two_node_cycle(spark):
    from seng550_a3_etl_spark.operators.graph import pagerank_step

    e = spark.createDataFrame(
        [(1, 2, 1), (2, 1, 1)], "src long, dst long, w long"
    )
    rows = {r.node: r.pr for r in pagerank_step(e).collect()}
    # symmetric 2-cycle: uniform is the fixpoint, one step preserves it
    assert rows[1] == rows[2] == 0.5


def test_pagerank_step_star_mass_and_sink(spark):
    from seng550_a3_etl_spark.operators.graph import pagerank_step

    # 3 leaves all pointing at hub 0; leaves get only teleport mass
    e = spark.createDataFrame(
        [(i, 0, 1) for i in (1, 2, 3)], "src long, dst long, w long"
    )
    rows = {r.node: r.pr for r in pagerank_step(e).collect()}
    teleport = round((1.0 - 0.85) / 4, 9)
    assert rows[1] == rows[2] == rows[3] == teleport
    # hub receives d * (1/N) from each leaf (full out-weight each)
    assert abs(rows[0] - (teleport + 0.85 * 3 / 4)) < 1e-9
