"""Distributed graph algorithms over edge DataFrames.

Companion to the label-propagation connected components in
``operators/clustering.py``: PageRank is the other canonical iterative
graph kernel, and its Spark shape is the template for any fixed-point
computation — the edge set NEVER moves to the driver, each iteration is
one join + one aggregation over DataFrames, and per-iteration
``localCheckpoint`` truncates lineage so N iterations don't compile an
N-deep plan (the measured cache-bypass/lineage pathologies are in
ARCHITECTURE.md).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Weighted PageRank over a directed edge DataFrame.

    Nodes are every id appearing as ``src`` or ``dst``. Each iteration:

        rank'(v) = (1-d)/N + d * (dangling_mass/N
                                  + sum_{u->v} rank(u) * w(u,v)/W(u))

    where W(u) is u's total out-weight and dangling_mass is the rank held
    by nodes with no out-edges (redistributed uniformly, so total rank
    stays 1 — asserted in tests). Scale shape per iteration: one equi-join
    ranks |x| edges on ``src`` (both sides can be pre-partitioned on the
    node id; the edge side's partitioning is reused every iteration), one
    groupBy ``dst``, plus two scalar aggregates (dangling mass) — no
    driver-side graph state, only the convergence loop counter lives in
    Python.
    """
    w = F.lit(1.0) if weight is None else F.col(weight).cast("double")
    # invalid-input contract: an edge with an unknown endpoint is not an
    # edge — dropped up front (a NULL node would otherwise enter the node
    # set and the dangling-mass anti-join with engine-specific semantics)
    e = edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull()).select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), w.alias("_w")
    )
    # Normalized transition weights (out-weight via a window over _src —
    # same partitioning as the per-iteration join, and avoids a
    # self-join lineage ambiguity), checkpointed once: every iteration
    # reuses this exact DataFrame and its partitioning.
    from pyspark.sql import Window

    total_out = F.sum("_w").over(Window.partitionBy("_src"))
    trans = (
        e.select("_src", "_dst", (F.col("_w") / total_out).alias("_p"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        # empty graph: no nodes, no ranks — not a divide-by-zero abort
        return nodes.withColumn("rank", F.lit(0.0))
    has_out = trans.select(F.col("_src").alias("node")).distinct()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    # Optimization r8 (guide §2.4): the dangling mass used to be a
    # separate collect() job per iteration (2 jobs/iter). It is a scalar
    # aggregate, so attach it as a broadcast 1-row frame instead — the
    # per-iteration checkpoint materializes everything in ONE job, and
    # the arithmetic is unchanged: dangling/n was a double division on
    # the driver and is the identical IEEE double division in the plan.
    for _ in range(n_iter):
        dang = ranks.join(has_out, "node", "left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        contrib = (
            trans.join(ranks, trans["_src"] == ranks["node"])
            .select(F.col("_dst").alias("node"), (F.col("rank") * F.col("_p")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("_dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def _undirected_simple(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Collapse a directed/multi edge list to canonical undirected (u<v)."""
    return (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .distinct()
    )


def degree_oriented_edges(und: DataFrame) -> DataFrame:
    """Orient canonical undirected edges by the total order (degree, id).

    Each edge points from its (deg, id)-smaller endpoint to the larger:
    ``s -> t`` with ``(deg(s), s) < (deg(t), t)``. Output carries the
    target's key (``t_deg``) so downstream wedge enumeration can compare
    out-neighbors in the SAME order without re-joining degrees. The
    classic skew bound: max oriented out-degree is O(sqrt(|E|)) for ANY
    graph (a node keeps an out-edge only toward >=-degree endpoints, and
    there can be at most 2*sqrt(|E|) nodes of degree >= sqrt(|E|)) — so a
    power-law hub with degree d contributes O(|E|) wedge pairs instead of
    the id-orientation's worst-case d^2. Cost over the id orientation:
    one degree aggregation + two id-keyed joins, all hash-partitioned.
    """
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    e = und.join(
        deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u"
    ).join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("t_deg"),
    )


def triangle_counts_deg(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts with DEGREE orientation — the hub-safe
    variant of :func:`triangle_counts` (same output, same oracle).

    Every triangle {x,y,z} ordered by (deg, id) as x < y < z has oriented
    edges x->y, x->z, y->z, so enumerating out-neighbor pairs of each
    node (in the same (deg, id) order) and closing with one more oriented
    equi-join produces each triangle exactly once. Wedge work per node is
    (oriented out-degree)^2 <= O(|E|) total by the sqrt bound documented
    on :func:`degree_oriented_edges` — this is the 100 TB default; the
    id-oriented sibling stays as the simpler fixture oracle twin.
    """
    und = _undirected_simple(edges, src, dst)
    o = degree_oriented_edges(und).localCheckpoint(eager=True)
    o1 = o.select(F.col("s").alias("a"), F.col("t").alias("b"), F.col("t_deg").alias("_db"))
    o2 = o.select(F.col("s").alias("a"), F.col("t").alias("c"), F.col("t_deg").alias("_dc"))
    wedges = o1.join(o2, "a").filter(
        (F.col("_db") < F.col("_dc"))
        | ((F.col("_db") == F.col("_dc")) & (F.col("b") < F.col("c")))
    )
    closing = o.select(F.col("s").alias("b"), F.col("t").alias("c"))
    tris = wedges.join(closing, ["b", "c"])
    per_node = (
        tris.select(F.col("a").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    return nodes.join(per_node, "node", "left").select(
        "node", F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles")
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph.

    ``edges`` is treated as undirected: direction and duplicates are
    collapsed, self-loops dropped. The enumeration orients every edge
    low-id -> high-id and closes wedges (u<v<w), so each triangle is
    produced exactly once — three joins, no all-pairs stage.

    Scale shape: the wedge join is keyed on the shared middle node and the
    closing check is an equi-join on (u, w) — both hash joins. Work is
    sum over nodes of (oriented out-degree)^2, which a power-law hub of
    degree d blows up to d^2 under this id orientation —
    :func:`triangle_counts_deg` is the DEGREE-oriented sibling that bounds
    oriented out-degree by O(sqrt(|E|)) and is the default at scale; this
    variant stays as the transparently-correct u<v<w enumeration (both are
    checked against the same oracle, plus an equality test).
    """
    und = (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .distinct()
    )
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = e1.join(e2, "b").filter(F.col("a") < F.col("c"))
    closing = und.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tris = wedges.join(closing, ["a", "c"])
    per_node = (
        tris.select(F.col("a").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    return nodes.join(per_node, "node", "left").select(
        "node", F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles")
    )


def bfs_distances(
    edges: DataFrame,
    source,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Unweighted shortest-path (hop) distances from ``source`` over an
    undirected view of the edge list. Unreachable nodes get NULL.

    Frontier-style iteration on DataFrames: each round relaxes every
    known distance through the edge list (equi-join on the node id) and
    keeps the per-node minimum; convergence is "no distance changed".
    Per round: one join + one groupBy, both keyed on node ids, and a
    ``localCheckpoint`` truncates lineage (same discipline as pagerank /
    connected components above — iteration N must not compile an N-deep
    plan). Rounds are bounded by graph diameter. The driver holds only
    the loop counter and a changed-row count. Raises if ``max_iter``
    rounds pass without convergence rather than returning partial
    distances (the silent-wrong-labels failure mode tests flagged on
    connected components).
    """
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = und.select(F.col("u").alias("node")).distinct()
    dist = nodes.select(
        "node",
        F.when(F.col("node") == F.lit(source), F.lit(0)).alias("dist"),
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        relaxed = (
            dist.filter(F.col("dist").isNotNull())
            .join(und, dist["node"] == und["u"])
            .select(F.col("v").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        new_dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_dist.alias("n")
            .join(dist.alias("o"), "node")
            .filter(~F.col("n.dist").eqNullSafe(F.col("o.dist")))
            .count()
        )
        dist = new_dist
        if changed == 0:
            return dist.select("node", F.col("dist").cast("long").alias("dist"))
    raise RuntimeError(f"bfs did not converge after {max_iter} rounds")


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 16,
) -> DataFrame:
    """The k-core of an undirected simple graph: the maximal subgraph in
    which every node has degree >= ``k``, found by iterative peeling —
    drop all nodes of degree < k, which lowers neighbors' degrees, and
    repeat to the fixed point. Returns (node, degree) with degree
    measured INSIDE the core.

    Scale shape (same BSP discipline as pagerank/bfs_distances/
    connected_components in this module): the edge set never reaches the
    driver; each round is one degree aggregation plus two semi-joins
    that drop edges touching peeled nodes, with ``localCheckpoint``
    truncating lineage so R rounds don't compile an R-deep plan. The
    edge set only shrinks, so per-round cost is monotonically
    non-increasing; rounds needed is the peeling depth (<= the
    degeneracy ordering's span, small for real graphs — 6 on the
    co-purchase fixture). Raises after ``max_iter`` rounds without
    convergence rather than returning a non-fixpoint: callers align
    ``max_iter`` with their oracle's unroll depth so an under-deep
    check fails loudly instead of silently diverging.
    """
    if k < 1:
        raise ValueError("k_core requires k >= 1 (k=0 is the whole node set)")
    live = _undirected_simple(edges, src, dst).localCheckpoint(eager=True)

    # Optimization r8 (guide §2.3/§2.4): the peel used to RECOUNT every
    # node's degree from the full edge list each round (one wide agg +
    # two edge-list semi-join shuffles + an extra checkpoint job), even
    # though a round only removes the FRONTIER — the few nodes that just
    # fell under k. Degrees are now maintained incrementally: a kept
    # node's new degree is its old degree minus its removed incident
    # edges, and an edge is removed exactly when it touches a peeled
    # node — plain set algebra, so the fixpoint (node, degree) set is
    # identical to the recount's (the unrolled DuckDB oracle pins it;
    # tests/test_graph.py pins incremental == recount on fuzzed graphs).
    # The peeled side of every join is frontier-sized and shrinks to
    # zero, so AQE runtime-converts these to broadcast joins and the
    # surviving edge list is never re-shuffled — per-round cost is
    # O(frontier), not O(edges). One recount-vs-incremental difference
    # is intentional: a kept node that loses its LAST edge stays in the
    # degree table at 0 and is peeled next round (the recount drops it
    # implicitly); it has no edges, so no other node is affected and the
    # fixpoint is unchanged.
    deg = (
        live.select(F.col("u").alias("node"))
        .unionAll(live.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
        .localCheckpoint(eager=True)
    )
    live_lazy = None  # next round's edge set, materialized only if needed
    for _ in range(max_iter):
        peeled = deg.filter(F.col("degree") < k)
        n_peeled = peeled.count()
        if n_peeled == 0:
            # converged: the deferred live update is never materialized —
            # the final productive round's edge checkpoint would be dead
            return deg.select("node", "degree")
        if live_lazy is not None:
            live = live_lazy.localCheckpoint(eager=True)
        # The frontier count is already in hand (the convergence check),
        # so make the broadcast decision ourselves (guide §3.1): a
        # checkpointed filter has no usable size estimate, and the
        # static SortMergeJoin plan sorts + shuffles the FULL edge list
        # against a frontier of a few thousand ids every round. 16 bytes
        # a row vs the session's autoBroadcastJoinThreshold keeps the
        # decision scale-adaptive — a huge round-0 peel of a power-law
        # graph stays a shuffled join.
        conf_val = deg.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
        units = {"k": 1024, "m": 1024**2, "g": 1024**3}
        m = re.fullmatch(r"(-?\d+)\s*([kmg]?)b?", conf_val.strip().lower())
        bcast_bar = (
            int(m.group(1)) * units.get(m.group(2), 1)
            if m
            else 10 * 1024 * 1024
        )
        if 0 < bcast_bar and n_peeled * 16 <= bcast_bar:
            peeled = F.broadcast(peeled)
        peeled_u = peeled.select(F.col("node").alias("u"))
        peeled_v = peeled.select(F.col("node").alias("v"))
        # decrement = removed incident edges whose OTHER endpoint is n
        # (rows landing on peeled nodes are dropped by the kept-join)
        dec = (
            live.join(peeled_u, "u", "left_semi")
            .select(F.col("v").alias("node"))
            .unionAll(
                live.join(peeled_v, "v", "left_semi")
                .select(F.col("u").alias("node"))
            )
            .groupBy("node")
            .agg(F.count("*").alias("_d"))
        )
        deg = (
            deg.filter(F.col("degree") >= k)
            .join(dec, "node", "left")
            .select(
                "node",
                (
                    F.col("degree") - F.coalesce(F.col("_d"), F.lit(0))
                ).alias("degree"),
            )
            .localCheckpoint(eager=True)
        )
        live_lazy = live.join(peeled_u, "u", "left_anti").join(
            peeled_v, "v", "left_anti"
        )
    raise RuntimeError(
        f"k_core(k={k}) did not converge after {max_iter} peel rounds; "
        "raise max_iter (and the oracle's unroll depth) to the graph's "
        "peeling depth"
    )


def label_propagation(
    edges: DataFrame,
    n_rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation over the
    undirected simple graph: every node starts labeled with its own id;
    each round it adopts the most frequent label among its neighbors
    (ties to the smallest label). Returns (node, label) after exactly
    ``n_rounds`` rounds.

    Fixed-round synchronous LPA is chosen deliberately over
    run-to-stability: synchronous updates can oscillate on near-bipartite
    structure (the classic LPA failure), so "stability" is not a
    well-defined stopping rule — whereas "the label state after R
    synchronous rounds" is exact, deterministic, and SQL-unrollable,
    which makes the iterative kernel value-checkable (same contract as
    k_core's unrolled fixpoint). Production variants damp oscillation
    with semi-synchronous coloring; the per-round algebra is identical.

    Scale shape (BSP like pagerank/k_core here): each round is one
    gather (two edge-label equi-joins, edge-partitioned), one
    (node, label) count, and one per-node argmin — min over
    (-count, label) structs, a partial-aggregable agg, NOT a window —
    with localCheckpoint truncating lineage per round. Hub nodes bound
    reducer width by their degree; labels are node ids so state is
    2 longs per node.
    """
    und = _undirected_simple(edges, src, dst).localCheckpoint(eager=True)
    labels = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(n_rounds):
        lab_u = labels.select(F.col("node").alias("u"), F.col("label"))
        lab_v = labels.select(F.col("node").alias("v"), F.col("label"))
        gathered = (
            und.join(lab_v, "v").select(F.col("u").alias("node"), "label")
        ).unionAll(
            und.join(lab_u, "u").select(F.col("v").alias("node"), "label")
        )
        counts = gathered.groupBy("node", "label").agg(F.count("*").alias("c"))
        labels = (
            counts.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("nc"), F.col("label").alias("l")
                    )
                ).alias("_m")
            )
            .select("node", F.col("_m.l").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels


def pagerank_exact(
    edges: DataFrame,
    n_iter: int = 10,
    damp_num: int = 85,
    damp_den: int = 100,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Integer fixed-point PageRank — bit-deterministic and therefore
    SQL-oracle-checkable, unlike the float kernel above (whose
    accumulation order is partition-dependent in the last ULPs).

    Ranks live in integer ``1/scale`` units (pico-units at the default);
    every operation is exact BIGINT arithmetic with floor division:

        contrib(v) = sum over u->v of (rank(u) * w(u,v)) div W(u)
        rank'(v)   = ((den-num)*scale) div (den*N)
                     + (num * (contrib(v) + D div N)) div den

    with D the dangling mass. Floor losses mean total rank decays by a
    few units per iteration (bounded by ~2*edges+N units) — a DEFINED
    deterministic variant, not an approximation error; the float kernel
    remains the analytically-clean reference (numpy-pinned), and the two
    agree to ~1e-9 after 10 iterations (tested). Overflow bound:
    rank*w <= scale * max_weight must stay under 2^63 — fine through
    SF where per-edge weights < ~9e6.

    Scale shape identical to :func:`pagerank`: one edge join + one agg
    per iteration, localCheckpoint lineage truncation, only the loop
    counter and the (scalar) dangling mass on the driver.
    """
    w = F.lit(1).cast("long") if weight is None else F.col(weight).cast("long")
    # same invalid-input contract as pagerank: null-endpoint edges dropped
    e = edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull()).select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), w.alias("_w")
    )
    from pyspark.sql import Window

    total_out = F.sum("_w").over(Window.partitionBy("_src"))
    trans = e.select(
        "_src", "_dst", "_w", total_out.alias("_tw")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        # empty graph: no nodes, no ranks — not a divide-by-zero abort
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    has_out = trans.select(F.col("_src").alias("node")).distinct()
    base = ((damp_den - damp_num) * scale) // (damp_den * n)
    ranks = nodes.withColumn("rank", F.lit(scale // n).cast("long"))
    # Same job-fusion as the float kernel (r8): the dangling mass rides
    # as a broadcast scalar, 1 job/iteration instead of 2. Exactness:
    # ranks are non-negative, so Python's ``dangling // n`` equals SQL
    # ``_dm div n`` — every operation stays the same BIGINT arithmetic.
    for _ in range(n_iter):
        dang = ranks.join(has_out, "node", "left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("_dm")
        )
        contrib = (
            trans.join(ranks, trans["_src"] == ranks["node"])
            .select(
                F.col("_dst").alias("node"),
                F.expr("(rank * _w) div _tw").alias("c0"),
            )
            .groupBy("node")
            .agg(F.sum("c0").alias("c"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                F.expr(
                    f"CAST({base} + ({damp_num} * (coalesce(c, CAST(0 AS BIGINT))"
                    f" + (_dm div {n}))) div {damp_den} AS BIGINT)"
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
