"""Graph kernel checks: edge-build parity, PageRank vs an independent
numpy reference, rank conservation, dangling-node handling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from masd_spark.operators.graph import pagerank
from masd_spark.queries import load_all
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query

REGISTRY = load_all()


def test_trade_edges_parity(spark):
    compare_query(spark, REGISTRY["graph_trade_edges"], SF_ORACLE)


def test_pagerank_contract_parity(spark):
    compare_query(spark, REGISTRY["graph_pagerank_trade"], SF_ORACLE)


def _numpy_pagerank(edges, n_iter, d):
    """Independent dense reference: edges = [(src, dst, w)]."""
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    P = np.zeros((n, n))
    for s, t, w in edges:
        P[idx[s], idx[t]] += w
    out_w = P.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = r[out_w == 0].sum()
        contrib = np.zeros(n)
        for i in range(n):
            if out_w[i] > 0:
                contrib += r[i] * P[i] / out_w[i]
        r = (1 - d) / n + d * (contrib + dangling / n)
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy_on_trade_graph(spark):
    edges_df = REGISTRY["graph_trade_edges"].fn(spark, SF_ORACLE)
    edges = [(r.src, r.dst, r.weight) for r in edges_df.collect()]
    want = _numpy_pagerank(edges, n_iter=10, d=0.85)
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges_df, n_iter=10, damping=0.85, weight="weight"
        ).collect()
    }
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6, (v, got[v], want[v])
    # and the registered contract query reports every node within tol
    contract = REGISTRY["graph_pagerank_trade"].fn(spark, SF_ORACLE).collect()
    assert {r.nationkey for r in contract} == set(want)
    assert all(r.float_within_tol for r in contract)


def test_pagerank_conserves_total_rank(spark):
    edges_df = REGISTRY["graph_trade_edges"].fn(spark, SF_ORACLE)
    ranks = pagerank(edges_df, n_iter=5, weight="weight")
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9, total


def test_pagerank_dangling_sink_absorbs_then_redistributes(spark):
    """A pure sink (no out-edges) must collect rank from its sources and
    hand it back uniformly — not leak it (total stays 1)."""
    edges = spark.createDataFrame(
        [(1, 3), (2, 3)], "src int, dst int"
    )
    ranks = pagerank(edges, n_iter=20)
    got = {r.node: r["rank"] for r in ranks.collect()}
    want = _numpy_pagerank([(1, 3, 1.0), (2, 3, 1.0)], 20, 0.85)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
    assert got[3] > got[1] == got[2]
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_triangle_counts_parity(spark):
    compare_query(spark, REGISTRY["graph_triangle_counts"], SF_ORACLE)


def test_triangle_counts_handshake(spark):
    """Sum of per-node counts is 3x the number of distinct triangles, and
    a planted 4-clique (every node in 3 triangles) comes back exact."""
    df = REGISTRY["graph_triangle_counts"].fn(spark, SF_ORACLE)
    total = df.agg(F.sum("n_triangles")).collect()[0][0]
    assert total % 3 == 0 and total > 0

    from masd_spark.operators.graph import triangle_counts

    # K4 plus a pendant edge: nodes 0-3 in C(3,2)=3 triangles each, node 9 in 0.
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a != b] + [(0, 9)],
        "src int, dst int",
    )
    out = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3, 9: 0}


def test_triangle_counts_deg_parity(spark):
    compare_query(spark, REGISTRY["graph_triangle_counts_deg"], SF_ORACLE)


def test_triangle_orientations_agree(spark):
    """Degree orientation must reproduce the id-oriented enumeration
    exactly on the fixture trade graph AND on a planted clique+hub."""
    from masd_spark.operators.graph import triangle_counts, triangle_counts_deg

    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a != b]
        + [(0, h) for h in range(100, 160)],  # node 0 is a hub
        "src int, dst int",
    )
    by_id = sorted(map(tuple, triangle_counts(edges).collect()))
    by_deg = sorted(map(tuple, triangle_counts_deg(edges).collect()))
    assert by_id == by_deg


def test_degree_orientation_bounds_hub_wedges(spark):
    """The point of degree orientation: a star hub generates ZERO wedges
    (all its edges orient toward it — spokes have lower degree), where id
    orientation at a low-id hub generates C(n,2). The max wedge-list
    (oriented out-degree) must collapse from n to O(1)."""
    from masd_spark.operators.graph import (
        _undirected_simple,
        degree_oriented_edges,
    )

    n_spokes = 200
    # hub id 0: under id orientation every one of its 200 edges is
    # outgoing -> 200-long wedge list. One planted triangle (1,2,3) keeps
    # the triangle path nontrivial.
    edges = spark.createDataFrame(
        [(0, s) for s in range(1, n_spokes + 1)] + [(1, 2), (2, 3), (1, 3)],
        "src int, dst int",
    )
    und = _undirected_simple(edges, "src", "dst")
    id_out = (
        und.groupBy("u").count().agg(F.max("count")).collect()[0][0]
    )  # id orientation: out-edges are exactly the u side
    deg_out = (
        degree_oriented_edges(und)
        .groupBy("s")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert id_out == n_spokes
    assert deg_out <= 3  # spokes: 1 out-edge; triangle nodes: <=3

    from masd_spark.operators.graph import triangle_counts_deg

    # triangles: {1,2,3} plus {0,a,b} for each pair of 1,2,3 (the hub is
    # adjacent to every spoke) -> every participant sits in 3 of the 4.
    out = {r.node: r.n_triangles for r in triangle_counts_deg(edges).collect()}
    assert out[0] == out[1] == out[2] == out[3] == 3
    assert out[10] == 0


def test_bfs_parity(spark):
    compare_query(spark, REGISTRY["graph_bfs_distances"], SF_ORACLE)


def test_bfs_planted_chain_and_island(spark):
    """Chain 0-1-2-3 gives distances 0,1,2,3; a disconnected pair gets
    NULL; edge direction is ignored (undirected view)."""
    from masd_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 0), (1, 2), (3, 2), (8, 9)], "src int, dst int"
    )
    out = {r.node: r.dist for r in bfs_distances(edges, 0).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3, 8: None, 9: None}


def test_kcore_parity(spark):
    compare_query(spark, REGISTRY["graph_kcore_parts"], SF_ORACLE)


def _kcore_fixture(spark):
    """5-clique (nodes 0-4) with a 3-node tail 5-6-7 hanging off node 0:
    for k=2 the tail peels one node per round (7, then 6, then 5) — a
    genuinely multi-round fixpoint."""
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    tail = [(0, 5), (5, 6), (6, 7)]
    return spark.createDataFrame(clique + tail, ["src", "dst"])


def test_kcore_planted_clique_and_tail(spark):
    from masd_spark.operators.graph import k_core

    edges = _kcore_fixture(spark)
    core2 = {
        (r["node"], r["degree"]) for r in k_core(edges, k=2).collect()
    }
    # tail gone; clique survives with its internal degree 4
    assert core2 == {(n, 4) for n in range(5)}
    core4 = {(r["node"], r["degree"]) for r in k_core(edges, k=4).collect()}
    assert core4 == {(n, 4) for n in range(5)}
    assert k_core(edges, k=5).count() == 0


def test_kcore_incremental_matches_reference_peel(spark):
    """r8: the peel maintains degrees incrementally (decrement by removed
    frontier edges) instead of recounting from the edge list each round.
    Pin the fixpoint against an independent Python simultaneous-peel
    reference on fuzzed graphs — the equivalence the rewrite relies on."""
    import random

    from masd_spark.operators.graph import k_core

    rng = random.Random(7)
    for _ in range(4):
        n = rng.randint(6, 18)
        edges = {(0, 1)}
        for _ in range(rng.randint(5, 40)):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        k = rng.randint(1, 4)
        live = set(edges)
        deg: dict[int, int] = {}
        while True:
            deg = {}
            for u, v in live:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
            peel = {x for x, d in deg.items() if d < k}
            if not peel:
                break
            live = {
                (u, v) for u, v in live if u not in peel and v not in peel
            }
        expect = {(x, d) for x, d in deg.items()}
        df = spark.createDataFrame(sorted(edges), ["src", "dst"])
        got = {(r["node"], r["degree"]) for r in k_core(df, k=k).collect()}
        assert got == expect, (k, sorted(edges))


def test_kcore_peels_zero_degree_straggler(spark):
    """A kept node that loses its LAST edge sits at degree 0 for one
    round in the incremental peel (the recount dropped it implicitly);
    it must still vanish from the fixpoint. Path a-b-c at k=2: endpoints
    peel first, b drops 2 -> 0, core is empty."""
    from masd_spark.operators.graph import k_core

    df = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    assert k_core(df, k=2).count() == 0


def test_kcore_raises_when_unroll_too_shallow(spark):
    """The peel loop must fail loudly if max_iter is below the peeling
    depth — that is the contract that keeps the unrolled SQL oracle
    honest."""
    from masd_spark.operators.graph import k_core

    edges = _kcore_fixture(spark)
    with pytest.raises(RuntimeError, match="did not converge"):
        k_core(edges, k=2, max_iter=2)


def test_label_propagation_parity(spark):
    compare_query(spark, REGISTRY["graph_label_propagation"], SF_ORACLE)


def test_label_propagation_planted_communities(spark):
    """Two 4-cliques joined by one bridge edge must settle into two
    distinct communities (each clique adopts its own minimum id), and
    community labels must be members of their own community."""
    from masd_spark.operators.graph import label_propagation

    clique_a = [(u, v) for u in range(4) for v in range(4) if u < v]
    clique_b = [(u, v) for u in range(10, 14) for v in range(10, 14) if u < v]
    edges = spark.createDataFrame(
        clique_a + clique_b + [(3, 10)], ["src", "dst"]
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, n_rounds=3).collect()
    }
    labels_a = {got[n] for n in range(4)}
    labels_b = {got[n] for n in range(10, 14)}
    assert labels_a == {0}
    assert labels_b == {10}


def test_label_propagation_round_zero_and_determinism(spark):
    """0 rounds returns self-labels; the result is independent of input
    partitioning (the argmax tie-break is total)."""
    from masd_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 8)], ["src", "dst"]
    )
    zero = {
        r["node"]: r["label"]
        for r in label_propagation(edges, n_rounds=0).collect()
    }
    assert zero == {n: n for n in (1, 2, 3, 4, 7, 8)}
    one = sorted(
        map(tuple, label_propagation(edges, n_rounds=2).collect())
    )
    two = sorted(
        map(tuple, label_propagation(edges.repartition(5), n_rounds=2).collect())
    )
    assert one == two


def test_pagerank_exact_parity(spark):
    from tests.oracle import compare_query

    compare_query(spark, REGISTRY["graph_pagerank_trade_exact"], SF_ORACLE)


def test_pagerank_exact_agrees_with_float_kernel(spark):
    """Pico-unit floor arithmetic is a determinism device, not an
    accuracy loss: after 10 rounds the integer and float kernels agree
    to well under the 6dp surface — which is exactly the boolean the
    registered contract query (graph_pagerank_trade) now hashes; this
    test recomputes the comparison from the raw kernels."""
    edges_df = REGISTRY["graph_trade_edges"].fn(spark, SF_ORACLE)
    flt = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges_df, n_iter=10, damping=0.85, weight="weight"
        ).collect()
    }
    ext = {
        r.nationkey: r.pagerank
        for r in REGISTRY["graph_pagerank_trade_exact"].fn(spark, SF_ORACLE).collect()
    }
    assert set(flt) == set(ext)
    assert max(abs(flt[k] - ext[k]) for k in flt) <= 1e-6
