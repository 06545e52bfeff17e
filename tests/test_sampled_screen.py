"""sample-first validation screen: certify-from-sample vs exact escalation.

Covers the three decision branches (confident pass, confident fail,
escalate-to-exact), the zero-sampled-partition guard (a partition too
small for the sample must surface as an exact row, not vanish), and the
agreement between a certified verdict and the exact ground truth.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.operators.sampled import (
    _hex_threshold,
    sampled_row_screen,
)
from anomaly_detector_faironchain_spark.plans.spec import (
    InRange,
    NotNull,
    TableSpec,
)


def _frame(spark):
    # 3 partitions: "clean" (no violations), "broken" (~20% violations),
    # "tiny" (3 rows — expected sample catch at 20% is <1 row)
    base = spark.range(0, 8000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "clean").otherwise("broken").alias("p"),
        F.when(
            (F.col("id") % 2 == 1) & (F.col("id") % 5 == 0), F.lit(-1.0)
        ).otherwise(F.lit(10.0)).alias("v"),
    )
    # all-clean tiny partition: a sample of <=3 rows with k=0 can never
    # certify pass at 1% tolerance, so it MUST escalate to an exact scan
    tiny = spark.createDataFrame(
        [(100001, "tiny", 10.0), (100002, "tiny", 10.0),
         (100003, "tiny", 10.0)],
        "id long, p string, v double",
    )
    return base.unionByName(tiny)


SPEC = TableSpec(
    name="t",
    partition_col="p",
    constraints=(InRange("v", 0.0, 100.0), NotNull("v")),
)


def test_three_branches_and_tiny_partition(spark):
    out = sampled_row_screen(
        _frame(spark), SPEC, sample_key="id", fraction=0.25, tolerance=0.01
    )
    rows = {(r["partition_id"], r["check_id"]): r for r in out.collect()}
    # complete grid: every (partition, check) has exactly one verdict
    assert len(rows) == 6

    broken = rows[("broken", "in_range(v)")]
    assert broken["method"] == "sample" and broken["passed"] is False
    assert broken["rate_lcb"] > 0.01  # certified fail from the sample

    clean = rows[("clean", "in_range(v)")]
    assert clean["method"] == "sample" and clean["passed"] is True
    assert clean["n_violations"] == 0 and clean["rate_ucb"] <= 0.01

    # tiny partition: k=0 over <=3 sampled rows -> Wilson can't certify
    # either way -> exact scan over just that partition
    t = rows[("tiny", "in_range(v)")]
    assert t["method"] == "exact"
    assert t["n_scanned"] == 3 and t["n_violations"] == 0
    assert t["passed"] is True


def test_certified_verdicts_match_exact_truth(spark):
    df = _frame(spark)
    out = sampled_row_screen(
        df, SPEC, sample_key="id", fraction=0.25, tolerance=0.01
    )
    part = F.coalesce(F.col("p").cast("string"), F.lit("__null__"))
    truth = {
        r["p"]: r["k"]
        for r in df.select(part.alias("p"), "v")
        .groupBy("p")
        .agg(
            F.sum(
                (
                    F.col("v").isNotNull()
                    & ~F.col("v").between(0.0, 100.0)
                ).cast("long")
            ).alias("k"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("p", (F.col("k") / F.col("n") <= 0.01).alias("k"))
        .collect()
    }
    for r in out.filter(F.col("check_id") == "in_range(v)").collect():
        assert r["passed"] == truth[r["partition_id"]], r


def test_exact_stage_skipped_when_everything_certifies(spark):
    # one big clean partition + one big broken partition, no tiny one:
    # at 25% the sample certifies both -> no exact rows at all
    df = _frame(spark).filter(F.col("p") != "tiny")
    out = sampled_row_screen(
        df, SPEC, sample_key="id", fraction=0.25, tolerance=0.01
    )
    assert out.filter(F.col("method") == "exact").count() == 0


def test_hex_threshold_validation():
    thr, eff = _hex_threshold(0.25)
    assert thr == "4000" and eff == 0.25
    with pytest.raises(ValueError):
        _hex_threshold(0.0)
    with pytest.raises(ValueError):
        _hex_threshold(1.0)


def test_no_row_checks_raises(spark):
    df = _frame(spark)
    with pytest.raises(ValueError):
        sampled_row_screen(
            df,
            TableSpec(name="t", partition_col="p", constraints=()),
            sample_key="id",
            fraction=0.25,
        )
