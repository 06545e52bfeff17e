"""Dense-graph wedge guard (round-4 judge item 2).

The motif wedge shuffle is Σ_pivot C(d₊,2) rows — quadratic in degree —
and measured to fill >60 GB of disk on a densified 20M-edge graph
(BENCH/scale_sf1_r4.json). The guard estimates that volume exactly from
the degree distribution, escalates id→degree orientation, then excludes
top hubs (the reference's whitelist semantics,
extract_motif_features.py:32-44,83-94) — automatically and reported.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.analysis import pipeline
from anomaly_detector_faironchain_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(s, d, float(10 * (i + 1)), i + 1) for i, (s, d) in enumerate(pairs)],
        "src string, dst string, amount double, cnt long",
    )


def _star(spark, n_leaves=6):
    return _edges(spark, [("hub", f"l{i}") for i in range(n_leaves)])


def _complete(spark, n=8):
    return _edges(
        spark,
        [(f"v{i:02d}", f"v{j:02d}") for i in range(n) for j in range(n)
         if i != j],
    )


# --------------------------- estimator ------------------------------------

def test_estimate_wedges_star(spark):
    e = _star(spark, 6)
    # id order: "hub" < "l0".. so the hub pivots all 6 pairs -> C(6,2)
    assert graph.estimate_wedges(e, "id") == 15
    # degree order: every leaf (deg 1) sits below the hub -> leaves pivot
    # their single pair each -> zero wedges
    assert graph.estimate_wedges(e, "degree") == 0


def test_estimate_wedges_complete_graph(spark):
    e = _complete(spark, 5)
    # K5: pivot out-degrees 4,3,2,1,0 under ANY total order
    want = 6 + 3 + 1 + 0 + 0
    assert graph.estimate_wedges(e, "id") == want
    assert graph.estimate_wedges(e, "degree") == want


def test_estimate_matches_actual_wedge_join(spark):
    """The estimate must equal the EXACT number of rows the kernel's
    wedge self-join shuffles (p1 ⋈ p2 on the pivot, b<c filter)."""
    import random

    rng = random.Random(7)
    pairs = {(f"n{rng.randrange(12)}", f"n{rng.randrange(12)}")
             for _ in range(40)}
    e = _edges(spark, [(s, d) for s, d in pairs if s != d])
    und = e.select(F.least("src", "dst").alias("lo"),
                   F.greatest("src", "dst").alias("hi")).distinct()
    actual = (
        und.alias("p1")
        .join(und.alias("p2"), F.col("p1.lo") == F.col("p2.lo"))
        .filter(F.col("p1.hi") < F.col("p2.hi"))
        .count()
    )
    assert graph.estimate_wedges(e, "id") == actual


def test_hub_threshold_steps_through_tie_classes():
    hist = [(4, 10), (2, 5), (1, 100)]  # degree -> node count
    assert graph._hub_threshold(hist, 3) == (4, 0.3)
    assert graph._hub_threshold(hist, 10) == (4, 1.0)
    assert graph._hub_threshold(hist, 12) == (2, 0.4)
    tau, frac = graph._hub_threshold(hist, 10_000)  # k >= n_nodes
    assert tau == 0 and frac == 1.0


# --------------------------- guard ladder ---------------------------------

def test_guard_rung1_requested_orientation_fits(spark):
    e = _complete(spark, 5)
    ori, excl, rep = graph.motif_wedge_guard(e, wedge_budget=100)
    assert ori == "id" and excl is None
    assert rep["n_excluded"] == 0 and rep["wedge_rows"] == 10


def test_guard_rung2_escalates_to_degree_orientation(spark):
    # star: id-order volume 15 > budget 5, degree-order volume 0 fits —
    # the guard must NOT exclude anything
    e = _star(spark, 6)
    ori, excl, rep = graph.motif_wedge_guard(e, wedge_budget=5)
    assert ori == "degree" and excl is None
    assert rep["n_excluded"] == 0 and rep["wedge_rows"] == 0
    assert [s["orientation"] for s in rep["steps"]] == ["id", "degree"]


def test_guard_rung3_excludes_hubs_on_dense_graph(spark):
    # K8 is uniformly dense: degree orientation cannot help (volume
    # identical), so the guard must exclude hubs until the estimate fits
    e = _complete(spark, 8)
    full = graph.estimate_wedges(e, "degree")
    ori, excl, rep = graph.motif_wedge_guard(e, wedge_budget=3)
    assert ori == "degree" and excl is not None
    assert rep["n_excluded"] == excl.count() > 0
    assert rep["wedge_rows"] <= 3 < full
    # deterministic: same decision twice
    _, excl2, rep2 = graph.motif_wedge_guard(e, wedge_budget=3)
    assert sorted(r.node for r in excl.collect()) == \
        sorted(r.node for r in excl2.collect())
    assert rep2["n_excluded"] == rep["n_excluded"]


# --------------------------- fused output ---------------------------------

def test_fused_guard_off_equals_guard_on_low_degree(spark):
    """Parity: on a graph under budget the guarded output is the
    unguarded output plus a constant motif_excluded=0 column."""
    import random

    rng = random.Random(3)
    raw = [(f"a{rng.randrange(30)}", f"a{rng.randrange(30)}")
           for _ in range(80)]
    e = _edges(spark, raw)
    plain = {r.node: r for r in graph.fused_motif_features(e).collect()}
    guarded = graph.fused_motif_features(e, wedge_budget=10**9).collect()
    assert len(guarded) == len(plain)
    for r in guarded:
        assert r.motif_excluded == 0
        p = plain[r.node]
        assert (r.two_node_loop_count, r.triangle_count, r.ego_n,
                r.ego_m) == \
            (p.two_node_loop_count, p.triangle_count, p.ego_n, p.ego_m)
        assert abs((r.ego_density or 0) - (p.ego_density or 0)) < 1e-12


def test_fused_guard_excludes_hubs_with_null_rows(spark):
    """Hub exclusion semantics = reference whitelist: excluded nodes get
    all-null feature rows; kept nodes are computed over the
    hub-filtered graph (== running the kernel on manually filtered
    edges); nodes isolated by the exclusion still get their
    zero-filled ego={v} row."""
    e = _complete(spark, 8)
    reports = []
    out = graph.fused_motif_features(e, wedge_budget=3,
                                     on_guard=reports.append)
    rows = out.collect()
    assert len(rows) == 8  # every original node present
    assert len(reports) == 1 and reports[0]["n_excluded"] > 0
    excluded = {r.node for r in rows if r.motif_excluded == 1}
    assert len(excluded) == reports[0]["n_excluded"]
    for r in rows:
        if r.motif_excluded == 1:
            assert r.triangle_count is None and r.ego_n is None \
                and r.ego_density is None
        else:
            assert r.triangle_count is not None
    # kept-node parity vs manually whitelist-filtered kernel
    kept_edges = e.filter(~F.col("src").isin(excluded)
                          & ~F.col("dst").isin(excluded))
    manual = {r.node: r for r in graph.fused_motif_features(
        kept_edges).collect()}
    for r in rows:
        if r.motif_excluded == 1:
            continue
        if r.node in manual:
            m = manual[r.node]
            assert (r.triangle_count, r.ego_n, r.ego_m) == \
                (m.triangle_count, m.ego_n, m.ego_m)
        else:
            # isolated by the exclusion: ego = {v}
            assert (r.triangle_count, r.ego_n, r.ego_m,
                    r.ego_density) == (0, 1, 0, 0.0)


# --------------------------- pipeline -------------------------------------

def _tt(spark):
    from anomaly_detector_faironchain_spark.etl import abstract, rawgen

    rt = rawgen.raw_native_transfers(spark, 1200, 40)
    return abstract.build_abstract_token_transfer(
        abstract.clean_native_transfers(rt))


def test_pipeline_guard_default_adds_flag_only(spark):
    tt = _tt(spark)
    guarded = pipeline.run_anomaly_analysis(
        tt, include_iforest=False).cache()
    plain = pipeline.run_anomaly_analysis(
        tt, include_iforest=False, wedge_budget=None).cache()
    try:
        assert set(guarded.columns) - set(plain.columns) == \
            {"motif_excluded"}
        assert guarded.filter("motif_excluded = 1").count() == 0
        a = {r.account_sid: r.final_score_0_100 for r in guarded.collect()}
        b = {r.account_sid: r.final_score_0_100 for r in plain.collect()}
        assert a == b
    finally:
        guarded.unpersist()
        plain.unpersist()


def test_pipeline_guard_excluded_hubs_score_null(spark):
    tt = _tt(spark)
    reports = []
    res = pipeline.run_anomaly_analysis(
        tt, include_iforest=False, wedge_budget=10,
        on_guard=reports.append).cache()
    try:
        assert reports and reports[0]["n_excluded"] > 0
        excl = res.filter("motif_excluded = 1")
        n_excl = excl.count()
        assert n_excl == reports[0]["n_excluded"]
        # excluded hubs: null motif features AND null scores, like the
        # reference's whitelist rows; everyone else fully scored
        for r in excl.collect():
            assert r.triangle_loop_count is None
            assert r.final_score_0_100 is None
        assert res.filter(
            "motif_excluded = 0 AND final_score_0_100 IS NULL"
        ).count() == 0
        assert res.count() == pipeline.run_anomaly_analysis(
            tt, include_iforest=False, wedge_budget=None).count()
    finally:
        res.unpersist()
