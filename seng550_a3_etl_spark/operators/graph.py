"""Connected components over a pair/edge list — the clustering step that
turns near-dup *pairs* (operators/text_dedup.py, operators/similarity.py)
into dedup *groups* with one canonical survivor per group.

Iterative min-label propagation (the large-scale classic, cf. GraphX /
Hash-to-Min): every node starts labeled with itself; each round a node
takes the minimum label among itself and its neighbors; at fixpoint each
node's label is the minimum node id of its component. Rounds needed =
graph diameter — for dedup clusters (near-cliques around a duplicated
document) that is 2-3, so the loop is short and each round is one
shuffle join + one aggregate. ``localCheckpoint`` truncates the lineage
every round so the plan does not grow with iterations (the standard
Spark iterative-algorithm pattern).

Not SQL-expressible in one query on the Spark side (requires a driver
loop), but a DuckDB ``WITH RECURSIVE`` reachability closure computes the
same fixpoint — the suite's ``dup_clusters`` oracle does exactly that,
so even this iterative operator is fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _union_find_labels(edge_rows, spark, node_type: str) -> DataFrame:
    """Driver-side union-find for edge lists below the adaptive
    threshold — same min-label-per-component fixpoint as the iterative
    path, without ~10 Spark jobs of per-job overhead on tiny graphs."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for s, t in edge_rows:
        parent.setdefault(s, s)
        parent.setdefault(t, t)
        rs, rt = find(s), find(t)
        if rs != rt:
            parent[max(rs, rt)] = min(rs, rt)
    rows = [(n, find(n)) for n in parent]
    return spark.createDataFrame(
        rows, f"node {node_type}, label {node_type}"
    )


# Below this many edges the graph fits trivially on the driver and the
# distributed loop's per-job overhead dominates; mirror Spark's own
# size-gated physical planning (broadcast-vs-shuffle) and solve locally.
DRIVER_EDGE_THRESHOLD = 200_000


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(node, label) for every node in ``edges``; label = min node id in
    the node's component. Edges are treated as undirected; iteration
    stops at fixpoint (or ``max_iter`` as a runaway bound).

    Adaptive physical strategy: edge lists under
    :data:`DRIVER_EDGE_THRESHOLD` are solved by driver-side union-find
    (exactly equal output); larger graphs run the distributed min-label
    loop, whose state never leaves the executors."""
    # Pre-partition both sides on their join keys: Dataset.localCheckpoint
    # preserves outputPartitioning, so every round's two joins are
    # co-partitioned zero-exchange joins and the only shuffle left per
    # round is the neighbor-min groupBy. The change flag rides along in
    # the checkpointed round output, so detecting the fixpoint is a scan
    # of in-memory data, not an extra join job.
    # Materialize the incoming edge list ONCE before symmetrizing: the
    # union references it twice, and Spark replans (recomputes) each
    # reference — for edges produced by an expensive near-dup pair scan
    # that would double the dominant cost.
    e0 = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("t")
    ).localCheckpoint(eager=True)
    if e0.count() <= DRIVER_EDGE_THRESHOLD:
        return _union_find_labels(
            [(r.s, r.t) for r in e0.collect()],
            edges.sparkSession,
            edges.schema[src].dataType.simpleString(),
        )
    sym = (
        e0.union(e0.select(F.col("t"), F.col("s")))
        .distinct()
        .repartition("t")
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .repartition("node")
        .localCheckpoint(eager=True)
    )
    # max_iter + 1: a diameter-d component needs d label-update rounds
    # plus ONE zero-change round to confirm the fixpoint — without the
    # extra round, convergence exactly at round max_iter would be
    # indistinguishable from non-convergence and raise spuriously.
    changed = 0
    for _ in range(max_iter + 1):
        nbr_min = (
            sym.join(labels, sym["t"] == labels["node"])
            .groupBy("s")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["s"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (F.coalesce("nbr_label", F.col("label")) < F.col("label")).alias(
                    "__chg"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("__chg").limit(1).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    if changed != 0:
        # One round propagates labels one hop, so a component with
        # diameter > max_iter exits here with labels that are NOT a valid
        # component labeling — never report that silently as converged.
        raise RuntimeError(
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds (label propagation still changing); "
            f"raise max_iter — rounds needed equals the graph diameter"
        )
    return labels


def pagerank_step(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    damping: float = 0.85,
) -> DataFrame:
    """One weighted-PageRank power iteration from the uniform start —
    the other iterative graph primitive (besides connected components)
    a corpus pipeline wants: rank parts/domains/documents by weighted
    in-link mass. Full PageRank iterates this from the driver exactly
    like :func:`seng550_a3_etl_spark.operators.clustering.kmeans_step`
    (each step is bounded-cost; no corpus-sized driver state).

    Returns (node, pr): pr(v) = (1-d)/N + d * sum over in-edges of
    w(u,v)/outw(u) * 1/N, with each edge contribution quantized to
    integer PICO units before the per-node sum, so the distributed
    reduction is order-independent and engine-exact (the X69 pattern;
    the ~1e-12 per-edge quantization is far below any ranking
    granularity). Nodes with no in-edges keep the teleport term.

    Scale: out-weights are one partial+final agg over edges; the
    contribution shuffle carries (dst, long) pairs with map-side
    combine; N is a scalar broadcast. Per step: two hash shuffles on
    node ids, nothing corpus-sized on the driver."""
    # Four consumers reference the edge list (node set x2, out-weights,
    # contributions); pin it so an expensive upstream build (e.g. the
    # C(basket,2) co-purchase self-join) computes once per step instead
    # of once per reference — in the iterated setting this is also the
    # standard lineage truncation between steps.
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n"))
    outw = edges.groupBy(src).agg(F.sum(weight).alias("__ow"))
    contrib = (
        edges.join(outw, src)
        .crossJoin(F.broadcast(n_nodes))
        .select(
            F.col(dst).alias("node"),
            F.round(
                F.lit(damping)
                * F.col(weight)
                / F.col("__ow")
                / F.col("n")
                * 1e12
            )
            .cast("long")
            .alias("__pico"),
        )
        .groupBy("node")
        .agg(F.sum("__pico").alias("__in"))
    )
    return (
        nodes.join(contrib, "node", "left")
        .crossJoin(F.broadcast(n_nodes))
        .select(
            "node",
            F.round(
                (1.0 - damping) / F.col("n")
                + F.coalesce("__in", F.lit(0)) / 1e12,
                9,
            ).alias("pr"),
        )
    )


# Unsafe-row widths for fixed-width column types (pyspark's Python-side
# DataType has no defaultSize). A type absent from this map is
# variable-width (string, binary, array, ...) — its broadcast size is
# unknowable from a row count, so the gate takes the shuffle arm.
_FIXED_WIDTH_BYTES = {
    "boolean": 1, "tinyint": 1, "smallint": 2, "int": 4, "bigint": 8,
    "float": 4, "double": 8, "date": 4, "timestamp": 8,
    "timestamp_ntz": 8,
}


def _parse_byte_size(raw) -> int | None:
    """Byte count for a Spark size-conf value: plain bytes or a
    k/m/g/t(b) binary-unit suffix; None when unparseable."""
    s = str(raw).strip().lower()
    try:
        return int(s)
    except ValueError:
        pass
    units = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}
    s = s[:-1] if s.endswith("b") and len(s) > 1 else s
    if s and s[-1] in units:
        try:
            return int(float(s[:-1]) * units[s[-1]])
        except ValueError:
            return None
    return None


def _broadcast_threshold_bytes(spark) -> int:
    """Resolved ``spark.sql.autoBroadcastJoinThreshold`` in bytes.
    Parses the k/m/g(b) byte-unit suffix forms the conf accepts (ADVICE
    r15: the old fallback clamped ANY suffixed value to 10 MiB, silently
    overriding a user who lowered the cap with '1m' or raised it with
    '100m'); an unparseable value keeps the conservative default."""
    parsed = _parse_byte_size(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    )
    return parsed if parsed is not None else 10 * 1024 * 1024


def label_prop_step(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    node: str = "node",
    label: str = "label",
    label_rows: int | None = None,
) -> DataFrame:
    """One synchronous weighted label-propagation step (Raghavan 2007,
    the community-detection fixpoint): every node adopts the label whose
    incoming edge-weight mass is largest, tie broken by the SMALLEST
    label — deterministic, so the step is oracle-checkable and the
    driver-iterated loop (the kmeans_step / pagerank_step pattern)
    converges to a stable labeling instead of oscillating on ties.

    ``edges`` must list both directions for an undirected graph (the
    co-purchase build already does). ``labels`` is (node, label); nodes
    with no in-edges keep their current label.

    Scale per step: one hash join of the label table onto the edge
    source (both sides partition by node id — no corpus-sized
    broadcast), one (dst, label) groupBy with map-side partial sums,
    one per-node argmax window. Nothing collects; k steps cost k
    bounded passes, exactly the iterative-algorithm contract the other
    graph operators follow."""
    lbl = labels.select(F.col(node).alias(src), F.col(label).alias("__nl"))
    # Join-strategy pick (guide §3.1): the label side is one row per
    # NODE — smaller than the edge side by the average-degree factor —
    # but in iterated use it arrives as a checkpointed RDD scan with no
    # stats, and the planner, blind to both sides, was broadcasting the
    # EDGE side instead (a 57 MB hashed relation built per step on the
    # sf0.1 co-purchase graph — measured as half the whole step's
    # cost). Decide from the label table's actual size: broadcast it
    # while a hashed relation of FIXED-WIDTH rows (32 B relation
    # overhead + the columns' unsafe-row widths — 48 B for the common
    # (long, long) case) clears the session broadcast threshold; past
    # that, or whenever either column is variable-width (a string label
    # table could blow far past the threshold on a row-count gate —
    # ADVICE r15), force the shuffled-hash join with the LABEL side as
    # build — per-partition hash builds stay node-count-bounded and
    # neither arm ever sorts or broadcasts the edge list. ``label_rows``
    # lets an iterating caller supply the (step-invariant) node count
    # once instead of paying a count() job per step; without it the
    # count is still cheap when labels are checkpoint-materialized
    # between steps, as in suite use.
    bcast_limit = _broadcast_threshold_bytes(edges.sparkSession)
    widths = [
        _FIXED_WIDTH_BYTES.get(f.dataType.simpleString())
        for f in lbl.schema.fields
    ]
    if bcast_limit > 0 and None not in widths and (
        (labels.count() if label_rows is None else label_rows)
        * (32 + sum(widths))
        <= bcast_limit
    ):
        lbl = F.broadcast(lbl)
    else:
        lbl = lbl.hint("shuffle_hash")
    mass = (
        edges.join(lbl, src)
        .groupBy(F.col(dst).alias(node), F.col("__nl"))
        .agg(F.sum(weight).alias("__mass"))
    )
    w_pick = Window.partitionBy(node).orderBy(
        F.desc("__mass"), F.asc("__nl")
    )
    picked = (
        mass.withColumn("__rn", F.row_number().over(w_pick))
        .filter(F.col("__rn") == 1)
        .select(node, F.col("__nl"))
    )
    return labels.join(picked, node, "left").select(
        node, F.coalesce("__nl", label).alias(label)
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle / wedge census over an undirected edge list.

    Returns one row ``(n_edges, n_wedges, n_triangles)`` — the inputs to
    the global clustering coefficient ``3*T / W`` that graph-quality and
    community-structure monitors track (e.g. on a near-dup or
    co-occurrence graph, a sudden clustering jump flags template spam).

    Scale design (degree orientation + edge-iterator close): a naive
    wedge join fans out C(deg, 2) per node — quadratic in the max
    degree, fatal on skewed graphs. Orienting every edge from the
    (degree, id)-SMALLER endpoint to the larger caps every node's
    out-degree at O(sqrt(m)) (Suri-Vassilvitskii), bounding total
    wedges at O(m^1.5) regardless of skew. Triangles then close WITHOUT
    materializing those wedges: per oriented edge (lo→hi), the closing
    count is |N+(lo) ∩ N+(hi)| — a codegen'd sorted-array intersection
    of two orientation-bounded adjacency lists (Latapy's
    edge-iterator), exactly once per triangle because orientation is a
    total order (the triangle's two larger vertices appear only in its
    smallest vertex's edge row). Replacing the wedge self-join +
    semi-join with the intersection cut the co-purchase census from
    9.7 s to ~4 s at sf0.1: the dense part graph (m=1.2M, n=20k) emits
    41M wedge rows through an exchange in the join form, vs 1.2M
    edge rows carrying bounded arrays here. The remaining shuffles:
    edge dedup, degree agg, the orientation join, one adjacency
    groupBy, and the two edge↔adjacency joins — all O(m).
    """
    # The canonical edge set feeds FIVE consumers (two degree legs, the
    # orientation join, the closing semi-join, the edge count) and the
    # degree table three; without lineage pins Spark replays the
    # upstream edge build for each reference — measured 28 parquet
    # scans / 55 exchanges for the co-purchase query. localCheckpoint
    # materializes each once (the cluster analog is a persisted edge
    # gold table).
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    # Orient each edge from the (deg, id)-smaller endpoint ("lo") to the
    # larger ("hi"); ties break on node id so the order is total.
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    lo_is_a = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lo_is_a, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(lo_is_a, F.col("b")).otherwise(F.col("a")).alias("hi"),
        )
    )
    oriented = oriented.localCheckpoint(eager=False)
    adj = oriented.groupBy("lo").agg(
        F.sort_array(F.collect_list("hi")).alias("nbrs")
    )
    tri_counts = (
        oriented.join(
            adj.select(F.col("lo"), F.col("nbrs").alias("n_lo")), "lo"
        )
        .join(
            adj.select(
                F.col("lo").alias("hi"), F.col("nbrs").alias("n_hi")
            ),
            "hi",
            "left",
        )
        .select(
            F.when(
                F.col("n_hi").isNull(), F.lit(0)
            )
            .otherwise(
                F.size(F.array_intersect("n_lo", "n_hi"))
            )
            .cast("long")
            .alias("c")
        )
    )
    n_wedges = deg.select(
        F.expr("sum(CAST(deg AS BIGINT) * (deg - 1)) div 2").alias("n_wedges")
    )
    return (
        e.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(F.broadcast(n_wedges))
        .crossJoin(
            F.broadcast(
                tri_counts.agg(
                    F.coalesce(F.sum("c"), F.lit(0))
                    .cast("long")
                    .alias("n_triangles")
                )
            )
        )
    )


def pagerank_iterate(
    edges: DataFrame,
    steps: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    damping: float = 0.85,
) -> DataFrame:
    """``steps`` weighted-PageRank power iterations — the driver-looped
    fixpoint :func:`pagerank_step` is one round of, with the rank
    vector carried between rounds as integer PICO units so every
    intermediate state (not just the first step) is order-independent
    and engine-exact: pr₀ = round(1e12/N); each round,
    pr'(v) = round((1-d)/N·1e12) + Σ_u round(d·w(u,v)·pr(u)/ow(u)).
    The per-edge round keeps the distributed sum exact (X69), and
    because the state is integer, iterate(k) is bit-reproducible and an
    unrolled SQL oracle can replay all k rounds.

    Scale: the edge list and out-weights are pinned once; each round is
    one src-key join + one dst-key aggregation (two node-key shuffles,
    same as pagerank_step), with the rank frame checkpointed per round
    for lineage truncation — cost is steps × bounded, nothing
    corpus-sized on the driver. Returns (node, pr_pico, pr)."""
    edges = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d"),
        F.col(weight).alias("__w"),
    ).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("__s").alias("node"))
        .union(edges.select(F.col("__d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("__n"))
    outw = edges.groupBy("__s").agg(
        F.sum("__w").alias("__ow")
    ).localCheckpoint(eager=True)
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node",
        F.round(F.lit(1e12) / F.col("__n")).cast("long").alias("__p"),
    )
    tele = (
        F.round((F.lit(1.0) - F.lit(damping)) / F.col("__n") * F.lit(1e12))
        .cast("long")
    )
    for _ in range(steps):
        contrib = (
            edges.join(outw, "__s")
            .join(ranks, edges["__s"] == ranks["node"])
            .select(
                F.col("__d").alias("node"),
                F.round(
                    F.lit(damping) * F.col("__w") * F.col("__p")
                    / F.col("__ow")
                )
                .cast("long")
                .alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                (tele + F.coalesce("__in", F.lit(0))).alias("__p"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        "node",
        F.col("__p").alias("pr_pico"),
        F.round(F.col("__p") / 1e12, 9).alias("pr"),
    )
