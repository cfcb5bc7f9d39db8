"""Graph queries: the nation-level trade network and PageRank over it.

The edge build is a pure relational pipeline (oracled); the iterative
kernel is rows-only (float fixed-point has no single-query SQL twin) and
is pinned against an independent numpy implementation in
tests/test_graph.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from masd_spark.operators.graph import pagerank
from masd_spark.queries import register
from masd_spark.sources.tables import load_table


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed nation->nation edges weighted by line items shipped from
    a supplier nation (dst) to a customer nation (src)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("weight"))
    )


@register(
    "graph_trade_edges",
    oracle="""
    SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
           CAST(count(*) AS BIGINT) AS weight
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1, 2
    """,
)
def graph_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation-to-nation trade graph: one fact|x|fact equi-join on the
    order key (the only real shuffle), dimension lookups broadcast, then
    a 25x25-bounded aggregation. The edge list feeds the iterative
    kernels (PageRank below, components in operators/clustering.py).
    """
    return _trade_edges(spark, sf_dir)


# graph_pagerank_trade (the float kernel) is registered BELOW its exact
# twin — its error-bound oracle composes _pagerank_exact_oracle().


# Undirected simple nation-pair edge CTEs shared by the triangle and BFS
# oracles. The shape matters for DuckDB's planner: with `c_nationkey <>
# s_nationkey` sitting in the 4-table join block, the optimizer joined
# customer x supplier FIRST on that inequality (14.4M-row nested loop at
# sf0.1, 144M rows after the orders hash join — ~80s per CTE reference,
# and the triangle oracle references `und` four times: 400s total, found
# by scripts/parity_sweep.py at sf0.1). Building the distinct nation
# pairs from pure equi-joins and applying `<>` AFTER — behind MATERIALIZED
# fences so the filter can't be pushed back into the join and the CTE is
# computed once — takes the same oracle to 0.1s with identical output.
_UND_EDGES_SQL = """
    np AS MATERIALIZED (
        SELECT c.c_nationkey AS cn, s.s_nationkey AS sn
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ),
    und AS MATERIALIZED (
        SELECT DISTINCT least(cn, sn) AS u, greatest(cn, sn) AS v
        FROM np WHERE cn <> sn
    )
"""

# Shared by the id-oriented and degree-oriented triangle queries — both
# orientations must reproduce this enumeration exactly.
_TRIANGLE_ORACLE = f"""
    WITH {_UND_EDGES_SQL},
    tris AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM und e1
        JOIN und e2 ON e1.v = e2.u
        JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    membership AS (
        SELECT a AS node FROM tris
        UNION ALL SELECT b FROM tris
        UNION ALL SELECT c FROM tris
    ),
    nodes AS (
        SELECT u AS node FROM und UNION SELECT v FROM und
    )
    SELECT n.node AS nationkey,
           CAST(coalesce(m.cnt, 0) AS BIGINT) AS n_triangles
    FROM nodes n
    LEFT JOIN (SELECT node, count(*) AS cnt FROM membership GROUP BY 1) m
      ON n.node = m.node
    """


@register(
    "graph_triangle_counts",
    oracle=_TRIANGLE_ORACLE,
)
def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation triangle counts in the undirected trade graph —
    clustering-structure analysis on the same edge list PageRank uses.
    The kernel (operators/graph.py:triangle_counts) orients edges
    low-id -> high-id and closes wedges with two hash joins, so each
    triangle is enumerated exactly once and no all-pairs stage exists;
    ``graph_triangle_counts_deg`` runs the hub-safe (degree, id)
    orientation against the same oracle.
    """
    from masd_spark.operators.graph import triangle_counts

    edges = _trade_edges(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    out = triangle_counts(edges)
    return out.select(F.col("node").cast("long").alias("nationkey"), "n_triangles")


@register(
    "graph_triangle_counts_deg",
    oracle=_TRIANGLE_ORACLE,
)
def graph_triangle_counts_deg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-oriented triangle counting (operators/graph.py:
    triangle_counts_deg): orientation toward the (degree, id)-larger
    endpoint bounds per-node wedge fan-out by O(sqrt(|E|)) — the
    production default on power-law graphs — and must reproduce the
    id-oriented enumeration exactly (same oracle; plus a skewed-hub
    fixture test bounding the max wedge-list in tests/test_graph.py).
    """
    from masd_spark.operators.graph import triangle_counts_deg

    edges = _trade_edges(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    out = triangle_counts_deg(edges)
    return out.select(F.col("node").cast("long").alias("nationkey"), "n_triangles")


_BFS_SOURCE = 0


@register(
    "graph_bfs_distances",
    oracle=f"""
    WITH RECURSIVE {_UND_EDGES_SQL},
    sym AS (
        SELECT u, v FROM und UNION SELECT v, u FROM und
    ),
    bfs AS (
        SELECT {_BFS_SOURCE} AS node, 0 AS dist
        UNION
        SELECT sym.v AS node, bfs.dist + 1 AS dist
        FROM bfs JOIN sym ON sym.u = bfs.node
        WHERE bfs.dist < 30
    ),
    nodes AS (SELECT DISTINCT u AS node FROM sym)
    SELECT n.node AS nationkey,
           CAST(m.d AS BIGINT) AS dist
    FROM nodes n
    LEFT JOIN (SELECT node, min(dist) AS d FROM bfs GROUP BY 1) m
      ON n.node = m.node
    """,
)
def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distances from nation 0 over the undirected trade graph —
    frontier BFS as iterative DataFrame relaxation
    (operators/graph.py:bfs_distances). The oracle is a RECURSIVE CTE
    with set-semantics union: (node, dist) pairs saturate at the
    diameter, so recursion terminates without path enumeration (which
    would be exponential on this dense graph). Distances are exact
    integers — one of the few iterative kernels with a true SQL oracle,
    closing the "iterative = rows-only" gap for the BFS family.
    """
    from masd_spark.operators.graph import bfs_distances

    edges = _trade_edges(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    out = bfs_distances(edges, _BFS_SOURCE)
    return out.select(F.col("node").cast("long").alias("nationkey"), "dist")


_KCORE_K = 80
_KCORE_ROUNDS = 16


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled-fixpoint SQL for iterative k-core peeling: ``rounds``
    identical peel blocks (degree over the surviving subgraph, keep
    degree >= k). Peeling is idempotent at the fixed point, so any
    unroll depth >= the actual peeling depth is a TRUE oracle — and the
    Spark operator raises if it needs more than ``rounds`` iterations,
    so an under-deep unroll fails loudly instead of comparing against a
    non-fixpoint."""
    parts = [
        """
    WITH und AS MATERIALIZED (
        SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                        greatest(a.l_partkey, b.l_partkey) AS v
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    nodes0 AS MATERIALIZED (SELECT u AS node FROM und UNION SELECT v AS node FROM und)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(f""",
    deg{i} AS MATERIALIZED (
        SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
            SELECT e.u AS node FROM und e
            JOIN nodes{i - 1} a ON e.u = a.node
            JOIN nodes{i - 1} b ON e.v = b.node
            UNION ALL
            SELECT e.v AS node FROM und e
            JOIN nodes{i - 1} a ON e.u = a.node
            JOIN nodes{i - 1} b ON e.v = b.node
        ) GROUP BY node
    ),
    nodes{i} AS MATERIALIZED (SELECT node FROM deg{i} WHERE degree >= {k})""")
    parts.append(f"""
    SELECT node AS partkey, degree FROM deg{rounds} WHERE degree >= {k}
    """)
    return "".join(parts)


@register("graph_kcore_parts", oracle=_kcore_oracle(_KCORE_K, _KCORE_ROUNDS))
def graph_kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80-core of the part co-purchase graph (parts are adjacent when
    some order contains both): the densely cross-sold assortment that
    survives removing every part with fewer than 80 strong neighbors.
    Edge build is one fact-fact self-equi-join on the order key (basket^2
    bounded, never parts^2); the peel loop is the BSP kernel in
    operators/graph.py:k_core. The oracle unrolls the fixpoint to 16 peel
    rounds (6 needed on the fixture) — extra rounds are no-ops at the
    fixed point, and the Spark side raises past 16, so the iterative
    kernel is VALUE-checkable like graph_bfs_distances' recursive CTE.
    """
    from masd_spark.operators.graph import k_core

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    b = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("dst")
    )
    pairs = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("src"))
        .join(b, "o")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
    core = k_core(pairs, k=_KCORE_K, max_iter=_KCORE_ROUNDS)
    return core.select(F.col("node").alias("partkey"), "degree")


_LPA_ROUNDS = 3


def _lpa_oracle(rounds: int) -> str:
    """Unrolled synchronous label propagation: ``rounds`` identical
    gather/argmax blocks over the co-purchase graph. Unlike k-core's
    idempotent peel, LPA rounds are NOT idempotent — the unroll depth
    must EQUAL the operator's n_rounds (both pinned to _LPA_ROUNDS)."""
    parts = [
        """
    WITH und AS MATERIALIZED (
        SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                        greatest(a.l_partkey, b.l_partkey) AS v
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    lab0 AS MATERIALIZED (
        SELECT node, node AS label FROM (
            SELECT u AS node FROM und UNION SELECT v AS node FROM und
        )
    )"""
    ]
    for i in range(1, rounds + 1):
        parts.append(f""",
    g{i} AS MATERIALIZED (
        SELECT e.u AS node, l.label FROM und e JOIN lab{i - 1} l ON l.node = e.v
        UNION ALL
        SELECT e.v AS node, l.label FROM und e JOIN lab{i - 1} l ON l.node = e.u
    ),
    lab{i} AS MATERIALIZED (
        SELECT node, label FROM (
            SELECT node, label,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY count(*) DESC, label ASC) AS rn
            FROM g{i} GROUP BY node, label
        ) WHERE rn = 1
    )""")
    parts.append(f"""
    SELECT node AS partkey, CAST(label AS BIGINT) AS community
    FROM lab{rounds}
    """)
    return "".join(parts)


@register("graph_label_propagation", oracle=_lpa_oracle(_LPA_ROUNDS))
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Communities in the part co-purchase graph by 3 rounds of
    synchronous label propagation (most-frequent neighbor label, ties to
    the smallest id). The iterative kernel is value-checked against an
    unrolled 3-round SQL twin — exact, not a fixpoint approximation
    (see _lpa_oracle on why the depths must match). Same edge build as
    graph_kcore_parts: one fact-fact self-equi-join on the order key,
    basket^2 bounded.
    """
    from masd_spark.operators.graph import label_propagation

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("dst"))
    edges = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("src"))
        .join(b, "o")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
    out = label_propagation(edges, n_rounds=_LPA_ROUNDS)
    return out.select(
        F.col("node").cast("bigint").alias("partkey"),
        F.col("label").cast("bigint").alias("community"),
    )


_PR_SCALE = 10**12
_PR_ITER = 10

_PR_EDGES_SQL = """
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               CAST(count(*) AS BIGINT) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        -- pagerank kernels drop null-endpoint edges (not an edge);
        -- also keeps the dangling NOT IN subquery null-free
        WHERE c.c_nationkey IS NOT NULL AND s.s_nationkey IS NOT NULL
        GROUP BY 1, 2
"""


def _pagerank_exact_oracle(n_iter: int = _PR_ITER, scale: int = _PR_SCALE) -> str:
    """Unrolled n_iter-round twin of pagerank_exact: identical BIGINT
    floor arithmetic per round; every round CTE MATERIALIZED (each is
    referenced twice by the next — the k-core inlining lesson)."""
    parts = [
        f"""edges AS MATERIALIZED ({_PR_EDGES_SQL}),
    trans AS MATERIALIZED (
        SELECT src, dst, w,
               CAST(sum(w) OVER (PARTITION BY src) AS BIGINT) AS tw
        FROM edges
    ),
    nodes AS MATERIALIZED (
        SELECT DISTINCT node
        FROM (SELECT src AS node FROM edges
              UNION ALL SELECT dst FROM edges)
    ),
    st AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
    r0 AS MATERIALIZED (
        SELECT node, CAST({scale} // st.n AS BIGINT) AS rank
        FROM nodes CROSS JOIN st
    )"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(f"""d{i} AS MATERIALIZED (
        SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS d
        FROM r{i - 1}
        WHERE node NOT IN (SELECT DISTINCT src FROM trans)
    ),
    r{i} AS MATERIALIZED (
        SELECT n.node,
               CAST((15 * {scale}) // (100 * st.n)
                    + (85 * (coalesce(c.c, 0) + d{i}.d // st.n)) // 100
                    AS BIGINT) AS rank
        FROM nodes n CROSS JOIN st CROSS JOIN d{i}
        LEFT JOIN (
            SELECT t.dst AS node,
                   CAST(sum((r.rank * t.w) // t.tw) AS BIGINT) AS c
            FROM trans t JOIN r{i - 1} r ON t.src = r.node
            GROUP BY 1
        ) c ON c.node = n.node
    )""")
    return (
        "WITH " + ",\n    ".join(parts)
        + f"""
    SELECT node AS nationkey, rank AS pagerank_pico,
           ROUND(rank / {scale}.0, 6) AS pagerank
    FROM r{n_iter}"""
    )


@register("graph_pagerank_trade_exact", oracle=_pagerank_exact_oracle())
def graph_pagerank_trade_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer fixed-point PageRank over the trade graph — the
    HASH-CHECKABLE variant of graph_pagerank_trade: ranks in pico-units,
    every per-round operation exact BIGINT floor arithmetic, so the
    10-round unrolled SQL twin reproduces it bit-for-bit (the same
    quantize-then-iterate recipe that oracles MMR and label
    propagation). Agreement with the float kernel is ~1e-9 after 10
    rounds (tested) — the quantization is a determinism device, not an
    accuracy loss. (operators/graph.py:pagerank_exact)
    """
    from masd_spark.operators.graph import pagerank_exact

    edges = _trade_edges(spark, sf_dir)
    ranks = pagerank_exact(edges, n_iter=_PR_ITER, scale=_PR_SCALE, weight="weight")
    return ranks.select(
        F.col("node").cast("long").alias("nationkey"),
        F.col("rank").alias("pagerank_pico"),
        F.round(F.col("rank") / F.lit(float(_PR_SCALE)), 6).alias("pagerank"),
    )


@register(
    "graph_pagerank_trade",
    oracle=f"""
    SELECT nationkey, pagerank_pico, TRUE AS float_within_tol
    FROM ({_pagerank_exact_oracle()}) t
    """,
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (10 iterations, d=0.85) over the trade graph:
    which nation's suppliers sit most central in the purchase flow.

    Oracled via the r7 error-bound-contract pattern (VERDICT r7 item 2,
    following sketch_hll_error_bound): the float kernel's iterative fixed
    point is not engine-portable, but the integer fixed-point twin
    (pagerank_exact, pico-units — independently hash-checked as
    graph_pagerank_trade_exact) IS, so this query joins the float ranks
    against the exact twin per node and emits (nationkey, pagerank_pico,
    float_within_tol). DuckDB replays the exact twin and states TRUE —
    the value hash fails if the float kernel strays more than 1e-6 from
    the provable reference (measured agreement ~1e-9 after 10 rounds) or
    if either side loses/garbles a node. The float kernel alone remains
    the 100 TB path; the twin join is the verification surface.
    """
    from masd_spark.operators.graph import pagerank_exact

    edges = _trade_edges(spark, sf_dir)
    ranks = pagerank(edges, n_iter=_PR_ITER, damping=0.85, weight="weight")
    exact = pagerank_exact(
        edges, n_iter=_PR_ITER, scale=_PR_SCALE, weight="weight"
    ).select(
        F.col("node").cast("long").alias("nationkey"),
        F.col("rank").alias("pagerank_pico"),
    )
    flt = ranks.select(
        F.col("node").cast("long").alias("nationkey"),
        F.col("rank").alias("_float_rank"),
    )
    return exact.join(flt, "nationkey", "full").select(
        "nationkey",
        "pagerank_pico",
        (
            F.col("_float_rank").isNotNull()
            & F.col("pagerank_pico").isNotNull()
            & (
                F.abs(
                    F.col("_float_rank")
                    - F.col("pagerank_pico") / F.lit(float(_PR_SCALE))
                )
                <= F.lit(1e-6)
            )
        ).alias("float_within_tol"),
    )
