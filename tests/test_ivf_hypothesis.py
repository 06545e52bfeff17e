"""IVF ANN recall vs brute force, and Hypothesis property tests pinning
constraint-count semantics against a plain-Python reference model.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.operators import similarity, stats
from anomaly_detector_faironchain_spark.plans.spec import (
    InRange,
    NotNull,
    TableSpec,
)

SF = "/root/testdata/sf0.001"


def test_ivf_centroids_deterministic_and_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    c1 = similarity.kmeans_centroids(emb, "vec_id", "embedding", k=8, iters=3)
    c2 = similarity.kmeans_centroids(emb, "vec_id", "embedding", k=8, iters=3)
    assert [[round(x, 8) for x in c] for c in c1] == \
           [[round(x, 8) for x in c] for c in c2]

    qids = list(range(10))
    exact = similarity.cosine_topk(emb, "vec_id", "embedding", qids, k=5)
    approx = similarity.ivf_topk(emb, "vec_id", "embedding", qids, c1,
                                 k=5, nprobe=4)
    ex = {(r.qid, r.nid) for r in exact.collect()}
    ap = {(r.qid, r.nid) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    # nprobe=4 of k=8 cells scans ~half the corpus → recall well above chance
    assert recall >= 0.5, f"recall@5 = {recall}"
    # every ANN hit must be a real corpus neighbor with a valid score
    assert all(-1.0001 <= r.cos <= 1.0001 for r in approx.collect())


# --- Hypothesis: fused profile counts == plain-Python reference model ----

rows_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
        st.one_of(st.none(), st.floats(min_value=-50, max_value=50,
                                       allow_nan=False)),
    ),
    min_size=1, max_size=60,
)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=rows_strategy)
def test_profile_violation_counts_match_python_model(spark_h, rows):
    spark = spark_h
    df = spark.createDataFrame(rows, "a int, b double")
    spec = TableSpec(
        name="t", constraints=(NotNull("a"), InRange("b", -10.0, 10.0)),
    )
    prof = stats.profile_table(df, spec).collect()[0]
    exp_null_a = sum(1 for a, _ in rows if a is None)
    exp_range_b = sum(
        1 for _, b in rows if b is not None and not (-10.0 <= b <= 10.0)
    )
    assert prof["violations__not_null(a)"] == exp_null_a
    assert prof["violations__in_range(b)"] == exp_range_b
    assert prof["n_rows"] == len(rows)
    nn = [b for _, b in rows if b is not None]
    if nn:
        assert prof["min__b"] == min(nn) and prof["max__b"] == max(nn)


# session-scoped spark fixture alias usable inside @given (function-scoped
# fixtures are incompatible with Hypothesis)
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_h(spark):
    return spark


def test_semantic_dedup_learned_centroids_recall_vs_bruteforce(spark):
    """The learned-centroid SemDeDup path (iters>0, not SQL-replicable —
    the oracle covers iters=0) must recover most of the near-dup pairs
    brute force finds: planted near-copies land in their source's cell
    unless the perturbation crosses a cluster boundary."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    orig = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    pert = orig.select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.zip_with(
            "embedding", F.reverse("embedding"),
            lambda x, y: x + F.lit(0.05) * y,
        ).alias("embedding"),
    )
    aug = orig.unionByName(pert)
    out = similarity.semantic_dedup(
        aug, "vec_id", "embedding", k=8, iters=3, threshold=0.9
    )
    dropped = {r.id for r in out.filter("NOT keep").collect()}
    n = emb.count()
    # brute-force ground truth: every planted copy has cos≈0.997 with its
    # source (max natural pair ≈0.51), so the true drop set is exactly
    # the n planted ids
    recall = len({i for i in dropped if i >= 100_000}) / n
    assert recall >= 0.8, f"planted-duplicate recall = {recall}"
    # nothing outside the planted set may be dropped at this threshold
    assert all(i >= 100_000 for i in dropped)
