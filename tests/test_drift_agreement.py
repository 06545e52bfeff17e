"""Drift constraints inside validate_table, approx-screen uniqueness,
and the detector-agreement kernel.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.operators import agreement
from anomaly_detector_faironchain_spark.operators import drift as drift_ops
from anomaly_detector_faironchain_spark.plans.compiler import validate_table
from anomaly_detector_faironchain_spark.plans.spec import Drift, TableSpec, Unique

SF = "/root/testdata/sf0.001"


def test_drift_constraint_flags_only_drifted_partition(spark):
    # three partitions; partition 'c' gets a shifted lang distribution
    rows = []
    for p, langs in (("a", "xxyyz"), ("b", "xxyyz"), ("c", "zzzzz")):
        for i, ch in enumerate(langs * 40):
            rows.append((p, ch, i))
    df = spark.createDataFrame(rows, "part string, lang string, i long")
    ref_hist = drift_ops.categorical_histogram(
        df.filter(F.col("part") == "a"), "lang"
    )
    spec = TableSpec(
        name="t", partition_col="part",
        constraints=(Drift("lang", method="psi", categorical=True, threshold=0.2),),
    )
    res = validate_table(df, spec, drift_refs={"lang": ref_hist},
                         materialize_violations=False)
    verdicts = {r.partition_id: r.passed for r in res.verdicts.collect()}
    assert verdicts == {"a": True, "b": True, "c": False}


def test_drift_ks_constraint(spark):
    rows = [("a", float(i % 100)) for i in range(2000)]
    rows += [("b", float(i % 100) + 60.0) for i in range(2000)]  # shifted
    df = spark.createDataFrame(rows, "part string, v double")
    ref = drift_ops.numeric_histogram(
        df.filter("part = 'a'"), "v", 32, 0.0, 200.0
    )
    spec = TableSpec(
        name="t", partition_col="part",
        constraints=(Drift("v", method="ks", bins=32, lo=0.0, hi=200.0,
                           threshold=0.3),),
    )
    res = validate_table(df, spec, drift_refs={"v": ref},
                         materialize_violations=False)
    verdicts = {r.partition_id: r.passed for r in res.verdicts.collect()}
    assert verdicts["a"] and not verdicts["b"]


def test_approx_screen_finds_bulk_duplication(spark):
    # partition 'dup' is ~50% duplicated — far beyond HLL error margins;
    # partition 'ok' is clean and must not trigger the exact pass
    base = spark.range(5000).select(
        F.lit("ok").alias("part"), F.concat(F.lit("k"), "id").alias("key")
    )
    dup = spark.range(2000).select(
        F.lit("dup").alias("part"),
        F.concat(F.lit("d"), (F.col("id") % 1000)).alias("key"),
    )
    df = base.unionByName(dup)
    spec = TableSpec(
        name="t", partition_col="part",
        constraints=(Unique("key", mode="approx_screen"),),
    )
    res = validate_table(df, spec, materialize_violations=False)
    verdicts = {r.partition_id: (r.passed, r.n_violations) for r in res.verdicts.collect()}
    assert verdicts["ok"][0] is True
    assert verdicts["dup"][0] is False and verdicts["dup"][1] == 1000


def test_agreement_kernels(spark):
    sup = spark.read.parquet(f"{SF}/supplier.parquet")
    # a column agrees with itself perfectly
    assert agreement.spearman(sup, "s_acctbal", "s_acctbal") == pytest.approx(1.0)
    ov = agreement.topq_overlap(sup, "s_suppkey", "s_acctbal", "s_acctbal", q=0.1)
    assert ov["jaccard"] == pytest.approx(1.0)
    assert agreement.cohens_kappa_top_q(sup, "s_acctbal", "s_acctbal", q=0.1) == pytest.approx(1.0)
    # negated column: top-q sets are disjoint, kappa ≤ 0
    neg = sup.withColumn("neg_bal", -F.col("s_acctbal"))
    ov2 = agreement.topq_overlap(neg, "s_suppkey", "s_acctbal", "neg_bal", q=0.1)
    assert ov2["intersection"] == 0
    assert agreement.cohens_kappa_top_q(neg, "s_acctbal", "neg_bal", q=0.1) <= 0
