"""EP2 parity: the full anomaly-analysis pipeline on a synthetic star,
with the scoring math cross-checked against a pandas/numpy replication of
the REFERENCE's own formulas (rank(method='average'), ddof=1 z-scores,
np.cov + inv Mahalanobis) on identical feature rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.analysis import pipeline
from anomaly_detector_faironchain_spark.etl import abstract, rawgen


@pytest.fixture(scope="module")
def tt(spark):
    rt = rawgen.raw_native_transfers(spark, 3000, 80)
    return abstract.build_abstract_token_transfer(
        abstract.clean_native_transfers(rt)
    ).cache()


@pytest.fixture(scope="module")
def result(tt):
    return pipeline.run_anomaly_analysis(tt).cache()


def test_result_shape_and_ranges(result):
    cols = set(result.columns)
    for c in ["account_sid", "address", "in_degree", "out_degree",
              "total_input_amount", "total_output_amount",
              "two_node_loop_count", "triangle_loop_count", "egonet_density",
              "H1_flag", "H6_flag", "H1_description",
              "mahalanobis_distance", "rule_score_100",
              "mahalanobis_distance_stats_score_100", "final_score_0_100",
              "final_score_top_percent", "final_score_top_percent_display",
              "is_infra"]:
        assert c in cols, c
    bad = result.filter(
        (F.col("final_score_0_100") < 0) | (F.col("final_score_0_100") > 100)
    ).count()
    assert bad == 0
    # no *_log/*_z/*_ratio intermediates in the output (reference :92-96)
    assert not [c for c in cols if c.endswith(("_log", "_z", "_ratio"))]


def test_rule_flag_consistency(result):
    rows = result.collect()
    for r in rows:
        if r.H2_flag == 1:
            assert r.out_degree == 0
        if r.H3_flag == 1:
            assert r.in_degree == 1
        if r.H5_flag == 1:
            assert r.two_node_loop_count >= 1
        if r.H6_flag == 1:
            assert r.triangle_loop_count >= 1
        # descriptions attach iff flagged (reference F10 pattern)
        assert (r.H1_description != "") == (r.H1_flag == 1)


def test_infra_split_and_remerge(tt):
    some = tt.limit(1).collect()[0].spender_address_sid.split("_", 1)[1]
    res = pipeline.run_anomaly_analysis(tt, infra_addresses=[some])
    infra_rows = res.filter(F.col("is_infra") == 1).collect()
    assert infra_rows and all(r.final_score_0_100 is None for r in infra_rows)
    n_total = res.count()
    assert n_total == pipeline.run_anomaly_analysis(tt).count()


def test_scores_match_reference_formulas(result):
    """Replicate the reference's pandas/numpy math on the final feature
    rows and compare scores."""
    pdf = result.filter(F.col("is_infra") == 0).toPandas()

    # reference preprocess_features (statistical_anomaly_detection.py:18-57)
    f = pd.DataFrame()
    for c in pipeline.LOG_FEATURES:
        f[f"{c}_log"] = np.log1p(pdf[c].astype(float))
    f["log_degree_ratio"] = np.log((pdf["in_degree"] + 1) / (pdf["out_degree"] + 1))
    f["log_amount_ratio"] = np.log(
        (pdf["total_input_amount"] + 1) / (pdf["total_output_amount"] + 1)
    )
    f["egonet_density"] = pdf["egonet_density"].astype(float)
    z = (f - f.mean()) / f.std(ddof=1)

    # reference Mahalanobis, with pinv instead of inv: the reference's
    # feature set is rank-deficient by construction (the log-ratios are
    # exact differences of the logged features), so plain inv() is
    # undefined noise — see operators/mahalanobis.py docstring
    keep = [c for c in z.columns if z[c].std(ddof=1) > 0 and np.isfinite(z[c]).all()]
    x = z[keep].to_numpy()
    cov = np.cov(x, rowvar=False)
    inv = np.linalg.pinv(cov, hermitian=True)
    mu = x.mean(axis=0)
    d = np.sqrt(np.einsum("ij,jk,ik->i", x - mu, inv, x - mu))
    np.testing.assert_allclose(
        pdf["mahalanobis_distance"].to_numpy(), d, rtol=1e-6, atol=1e-8
    )

    # reference hazen percentile + final score
    ranks = pd.Series(d).rank(method="average")
    maha_pct = ((ranks - 0.5) / len(d) * 100.0).astype(np.float32)
    np.testing.assert_allclose(
        pdf["mahalanobis_distance_stats_score_100"].to_numpy(),
        maha_pct.to_numpy(), rtol=1e-5,
    )
    main_any = pdf[["H1_flag", "H2_flag", "H3_flag", "H4_flag"]].any(axis=1).astype(int)
    raw = main_any + pdf["H5_flag"] + pdf["H6_flag"]
    rule100 = (raw * (100.0 / 3.0)).round(2).astype(np.float32)
    np.testing.assert_allclose(pdf["rule_score_100"].to_numpy(), rule100.to_numpy())
    final = np.float32((rule100.astype(np.float64) + maha_pct.astype(np.float64)) / 2)
    np.testing.assert_allclose(
        pdf["final_score_0_100"].to_numpy(), final, rtol=1e-5
    )
