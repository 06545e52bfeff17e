"""Semantics tests for graph feature operators on a tiny hand-checked
graph, plus Mahalanobis vs a direct numpy computation.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.operators import graph, mahalanobis

# edges: a→b (two transfers), b→a, a→c, c→b, b→c, d→d (self loop)
TRANSFERS = [
    ("a", "b", 10.0, 1), ("a", "b", 5.0, 2), ("b", "a", 7.0, 3),
    ("a", "c", 1.0, 4), ("c", "b", 2.0, 5), ("b", "c", 3.0, 6),
    ("d", "d", 9.0, 7),
]


@pytest.fixture(scope="module")
def edges(spark):
    df = spark.createDataFrame(TRANSFERS, "src string, dst string, amount double, ts long")
    return graph.aggregate_edges(df, "src", "dst", "amount", "ts").cache()


def test_edge_aggregation_collapses_parallel(edges):
    ab = edges.filter("src = 'a' AND dst = 'b'").collect()[0]
    assert ab.amount == 15.0 and ab.cnt == 2 and ab.first_ts == 1


def test_node_features(edges):
    nf = {r.node: r for r in graph.node_features(edges).collect()}
    assert nf["a"].out_degree == 2 and nf["a"].in_degree == 1
    assert nf["a"].total_output_amount == 16.0
    assert nf["a"].balance_proxy == 7.0 - 16.0
    assert nf["b"].in_transfer_count == 3  # 2 parallel a→b + 1 c→b


def test_self_loop(edges):
    flags = {r.node: r.has_self_loop for r in graph.self_loop_flag(edges).collect()}
    assert flags["d"] == 1 and flags["a"] == 0


def test_mutual_pairs(edges):
    mp = {r.node: r for r in graph.mutual_pair_features(edges).collect()}
    # mutual pairs: a⇄b and b⇄c
    assert mp["a"].two_node_loop_count == 1
    assert mp["b"].two_node_loop_count == 2
    assert mp["a"].two_node_loop_amount == 15.0 + 7.0


def test_triangles(edges):
    # directed cycle a→b? no: cycles are a→c→b→a (a→c, c→b, b→a) ✓
    tf = {r.node: r for r in graph.triangle_features(edges).collect()}
    assert set(tf) == {"a", "b", "c"}
    assert all(tf[n].triangle_count == 1 for n in "abc")
    assert tf["a"].triangle_amount == 1.0 + 2.0 + 7.0


def test_egonet(edges):
    ego = {r.node: r for r in graph.egonet_features(edges).collect()}
    # ego(a) = {a,b,c}; directed non-self edges within: a→b,b→a,a→c,c→b,b→c = 5
    assert ego["a"].ego_n == 3 and ego["a"].ego_m == 5
    assert ego["a"].ego_density == pytest.approx(5 / 6)
    assert ego["d"].ego_n == 1 and ego["d"].ego_m == 0


def test_mahalanobis_matches_numpy(spark):
    rng = np.random.RandomState(7)
    x = rng.normal(size=(200, 3)) * [1.0, 5.0, 0.3] + [0, 10, -2]
    rows = [(int(i), float(a), float(b), float(c)) for i, (a, b, c) in enumerate(x)]
    df = spark.createDataFrame(rows, "id long, f1 double, f2 double, f3 double")
    out = {r.id: r.d for r in mahalanobis.mahalanobis(
        df, ["f1", "f2", "f3"], "d").select("id", "d").collect()}
    mu = x.mean(axis=0)
    inv = np.linalg.inv(np.cov(x, rowvar=False))
    z = x - mu
    expect = np.sqrt(np.einsum("ij,jk,ik->i", z, inv, z))
    for i in range(200):
        assert out[i] == pytest.approx(expect[i], rel=1e-9)


def test_mahalanobis_drops_zero_variance(spark):
    rows = [(i, float(i % 7), 3.0) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, f1 double, f2 double")
    out = mahalanobis.mahalanobis(df, ["f1", "f2"], "d").collect()
    assert all(np.isfinite(r.d) for r in out)  # constant f2 excluded, no inversion blowup


def test_triangles_orientations_agree(spark):
    """Both total orders (id and degree) must count each directed cycle
    exactly once per participant. The degree order picks 'z' (degree 2,
    HIGHEST id) as the cycle's pivot while the id order picks 'x' —
    results must be identical anyway."""
    rows = [("x", "y", 1.0, 1), ("y", "z", 2.0, 2), ("z", "x", 4.0, 3)]
    # fan edges pump up deg(x) and deg(y) so z is degree-minimal
    rows += [("x", f"f{i}", 0.5, 10 + i) for i in range(5)]
    rows += [(f"g{i}", "y", 0.5, 20 + i) for i in range(5)]
    df = spark.createDataFrame(rows, "src string, dst string, amount double, ts long")
    e = graph.aggregate_edges(df, "src", "dst", "amount", "ts")
    for orientation in ("id", "degree"):
        tf = {r.node: r for r in
              graph.triangle_features(e, orientation=orientation).collect()}
        assert set(tf) == {"x", "y", "z"}
        assert all(tf[n].triangle_count == 1 for n in "xyz")
        assert tf["z"].triangle_amount == pytest.approx(7.0)
        assert tf["z"].triangle_tx == 3


def test_egonet_routes_agree_on_hub_graph(spark):
    """Min-degree routing must produce the identical (n, m, density) as
    the fixed via-dst expansion — exercised on a hub-and-spoke graph
    where every edge picks the spoke side, plus a clique where degrees
    tie and the tiebreak goes via dst."""
    rows = [("hub", f"s{i}", 1.0, i) for i in range(12)]
    rows += [(f"s{i}", "hub", 1.0, 100 + i) for i in range(6)]
    rows += [("s0", "s1", 1.0, 200), ("s1", "s2", 1.0, 201),
             ("s2", "s0", 1.0, 202)]
    df = spark.createDataFrame(rows, "src string, dst string, amount double, ts long")
    e = graph.aggregate_edges(df, "src", "dst", "amount", "ts")
    a = {r.node: (r.ego_n, r.ego_m, r.ego_density)
         for r in graph.egonet_features(e, method="expand", route_by_degree=False).collect()}
    b = {r.node: (r.ego_n, r.ego_m, r.ego_density)
         for r in graph.egonet_features(e, method="expand", route_by_degree=True).collect()}
    assert a == b
    c = {r.node: (r.ego_n, r.ego_m, r.ego_density)
         for r in graph.egonet_features(e, method="expand", route_by_degree="auto").collect()}
    assert a == c
    w = {r.node: (r.ego_n, r.ego_m, r.ego_density)
         for r in graph.egonet_features(e, method="wedge").collect()}
    assert a == w
    # hand check: ego(s0) = {s0, hub, s1, s2}; edges within: hub->s0/s1/s2,
    # s0/s1/s2->hub, s0->s1, s1->s2, s2->s0 = 9
    assert a["s0"][0] == 4 and a["s0"][1] == 9


def test_egonet_wedge_matches_expand_on_random_multigraph(spark):
    """The triangle-decomposition m-count (incident rows + per-triangle
    opposite-pair multiplicity credits) must equal the expansion count on
    a random MULTIgraph with self-loops, duplicate rows, and a node whose
    only edge is a self-loop (ego size 1, m 0)."""
    import random

    rng = random.Random(7)
    rows = [(f"n{rng.randrange(40)}", f"n{rng.randrange(40)}", 1.0, i)
            for i in range(500)]
    rows += [("n0", "n0", 1.0, 900), ("lonely", "lonely", 1.0, 901)]
    rows += rows[:40]  # duplicate rows: w(pair) multiplicity > 2
    df = spark.createDataFrame(
        rows, "src string, dst string, amount double, ts long")
    a = {r.node: (r.ego_n, r.ego_m, round(r.ego_density, 9))
         for r in graph.egonet_features(df, method="expand", route_by_degree=True).collect()}
    w = {r.node: (r.ego_n, r.ego_m, round(r.ego_density, 9))
         for r in graph.egonet_features(df, method="wedge").collect()}
    assert a == w
    wd = {r.node: (r.ego_n, r.ego_m, round(r.ego_density, 9))
          for r in graph.egonet_features(
              df, method="wedge", orientation="degree").collect()}
    assert a == wd
    assert a["lonely"] == (1, 0, 0.0)


def test_egonet_auto_routing_decision(spark):
    """'auto' measures both intermediate sizes exactly: routes on a
    hub-and-spoke graph (min-degree shrinks the expansion 40×), stays
    plain on a cycle where the sizes are identical and routing's extra
    union/attach would buy nothing."""
    from pyspark.sql import functions as F
    from anomaly_detector_faironchain_spark.operators.graph import (
        _egonet_route_choice,
    )

    def er_for(edge_rows):
        e = spark.createDataFrame(edge_rows, "src string, dst string")
        und = e.union(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst"))).distinct()
        degu = und.groupBy(F.col("src").alias("nd")).agg(
            F.count(F.lit(1)).alias("__deg__"))
        return (
            e.join(degu.withColumnRenamed("nd", "src")
                       .withColumnRenamed("__deg__", "__ds__"), "src")
            .join(degu.withColumnRenamed("nd", "dst")
                      .withColumnRenamed("__deg__", "__dd__"), "dst")
        )

    # spokes point AT the hub: plain via-dst expands every edge through
    # the deg-40 hub (Σ deg(dst) = 1600), routing through the deg-1 spoke
    # side (Σ min = 40)
    hub = [(f"s{i}", "hub") for i in range(40)]
    assert _egonet_route_choice(er_for(hub), auto_ratio=1.0) is True
    cycle = [(f"n{i}", f"n{(i + 1) % 20}") for i in range(20)]
    assert _egonet_route_choice(er_for(cycle), auto_ratio=1.0) is False


def _uf_components(edges):
    """Reference union-find over python tuples -> {id: min-of-component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for x in list(parent):
        comp.setdefault(find(x), []).append(x)
    out = {}
    for members in comp.values():
        lo = min(members)
        for m in members:
            out[m] = lo
    return out


def test_connected_components_known_shapes(spark):
    """Path, cycle, star, isolated self-loop, and two singletons joined
    late — labels are the order-minimal member everywhere."""
    edges = [
        ("a1", "a2"), ("a2", "a3"), ("a3", "a4"),          # path
        ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),          # cycle
        ("c9", "c1"), ("c9", "c2"), ("c9", "c3"),          # star (hub=c9)
        ("d1", "d1"),                                       # self-loop only
        ("e2", "e1"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.id: r.component
           for r in graph.connected_components(df).collect()}
    assert got == {
        "a1": "a1", "a2": "a1", "a3": "a1", "a4": "a1",
        "b1": "b1", "b2": "b1", "b3": "b1",
        "c1": "c1", "c2": "c1", "c3": "c1", "c9": "c1",
        "d1": "d1",
        "e1": "e1", "e2": "e1",
    }


def test_connected_components_matches_union_find(spark):
    """Random sparse graph (long paths + cross links) vs a pure-python
    union-find: identical labeling, and convergence well under max_iter
    despite a diameter a label-propagation loop could not handle in the
    same round count."""
    import random

    rng = random.Random(7)
    edges = [(f"n{i:04d}", f"n{i + 1:04d}") for i in range(0, 400)
             if i % 37 != 0]  # broken path -> many long chains
    edges += [(f"n{rng.randrange(500):04d}", f"n{rng.randrange(500):04d}")
              for _ in range(60)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.id: r.component
           for r in graph.connected_components(df, max_iter=12).collect()}
    assert got == _uf_components(edges)


def test_connected_components_empty(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert graph.connected_components(df).count() == 0


def test_pagerank_matches_dense_power_iteration(spark):
    """Random directed graph incl. a dangling node and a self-loop vs a
    numpy dense power iteration of the identical formula."""
    import random

    rng = random.Random(11)
    n = 40
    edges = {(f"v{rng.randrange(n):02d}", f"v{rng.randrange(n):02d}")
             for _ in range(120)}
    edges.add(("v38", "v39"))  # ensure v39 exists even if never a source
    edges = sorted(edges)
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.id: r.pagerank
           for r in graph.pagerank(df, n_iter=8).collect()}

    ids = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(ids)}
    nn = len(ids)
    out = {v: 0 for v in ids}
    for u, _ in edges:
        out[u] += 1
    pr = np.full(nn, 1.0 / nn)
    d = 0.85
    for _ in range(8):
        nxt = np.full(nn, (1 - d) / nn)
        dangling = sum(pr[idx[v]] for v in ids if out[v] == 0)
        nxt += d * dangling / nn
        for u, v in edges:
            nxt[idx[v]] += d * pr[idx[u]] / out[u]
        pr = nxt
    assert set(got) == set(ids)
    for v in ids:
        assert abs(got[v] - pr[idx[v]]) < 1e-12, v
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_connected_components_strategies_agree(spark):
    """agg (skew-safe default) and window min strategies must label
    identically — exercised on a hub graph plus chains."""
    edges = [("hub", f"x{i:03d}") for i in range(50)]
    edges += [(f"y{i}", f"y{i+1}") for i in range(20)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = {r.id: r.component
         for r in graph.connected_components(df, min_strategy="agg").collect()}
    b = {r.id: r.component
         for r in graph.connected_components(df, min_strategy="window").collect()}
    assert a == b and len(a) == 51 + 21


def _motif_reference_frame(df):
    """Per-node dict of the three standalone kernels' outputs, absent
    motifs filled with 0 — the contract fused_motif_features unifies."""
    nodes = {r.node for r in df.select(F.col("src").alias("node")).union(
        df.select(F.col("dst"))).distinct().collect()}
    mut = {r.node: (r.two_node_loop_count, r.two_node_loop_amount,
                    r.two_node_loop_tx)
           for r in graph.mutual_pair_features(df).collect()}
    tri = {r.node: (r.triangle_count, r.triangle_amount, r.triangle_tx)
           for r in graph.triangle_features(df).collect()}
    ego = {r.node: (r.ego_n, r.ego_m, round(r.ego_density, 9))
           for r in graph.egonet_features(df, method="wedge").collect()}
    return {
        v: (mut.get(v, (0, 0.0, 0)), tri.get(v, (0, 0.0, 0)),
            ego.get(v, (1, 0, 0.0)))
        for v in nodes
    }


def _motif_fused_frame(df, orientation="id"):
    return {
        r.node: (
            (r.two_node_loop_count, r.two_node_loop_amount,
             r.two_node_loop_tx),
            (r.triangle_count, r.triangle_amount, r.triangle_tx),
            (r.ego_n, r.ego_m, round(r.ego_density, 9)),
        )
        for r in graph.fused_motif_features(df, orientation=orientation)
        .collect()
    }


def test_fused_motif_features_matches_standalone_kernels(spark):
    """One triangle enumeration must reproduce mutual_pair_features,
    triangle_features AND egonet_features(wedge) exactly — random dense
    directed graph with self-loops and a self-loop-only node, both pivot
    orientations."""
    import random

    rng = random.Random(11)
    rows = [(f"n{rng.randrange(30)}", f"n{rng.randrange(30)}",
             float(rng.randrange(1, 100)), i) for i in range(400)]
    rows += [("n0", "n0", 5.0, 900), ("lonely", "lonely", 2.0, 901)]
    df = graph.aggregate_edges(
        spark.createDataFrame(
            rows, "src string, dst string, amount double, ts long"),
        "src", "dst", "amount", "ts")
    want = _motif_reference_frame(df)
    assert _motif_fused_frame(df) == want
    assert _motif_fused_frame(df, orientation="degree") == want
    assert want["lonely"][2] == (1, 0, 0.0)


def test_fused_motif_features_on_hub_graph(spark):
    """Hub-skew shape (mega-hub low in the id order): degree orientation
    must agree with id orientation and with the standalone kernels."""
    rows = [("a_hub", f"x{i:03d}", 1.0, i) for i in range(60)]
    rows += [(f"x{i:03d}", "a_hub", 2.0, 100 + i) for i in range(0, 60, 2)]
    rows += [(f"x{i:03d}", f"x{i+1:03d}", 3.0, 200 + i) for i in range(59)]
    rows += [("x000", "x002", 1.5, 300), ("x002", "x000", 1.5, 301)]
    df = graph.aggregate_edges(
        spark.createDataFrame(
            rows, "src string, dst string, amount double, ts long"),
        "src", "dst", "amount", "ts")
    want = _motif_reference_frame(df)
    assert _motif_fused_frame(df) == want
    assert _motif_fused_frame(df, orientation="degree") == want
