"""QuantileBounds constraint: exact-mode semantics, vacuous pass,
length vs direct form, serde, and checkpoint parquet-name safety."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.plans import (
    NotNull,
    QuantileBounds,
    TableSpec,
)
from anomaly_detector_faironchain_spark.plans.compiler import validate_table
from anomaly_detector_faironchain_spark.plans.serde import (
    spec_from_json,
    spec_to_json,
)


def _spec(*cons):
    return TableSpec(name="t", partition_col="part", constraints=tuple(cons))


def test_exact_rank_and_mixed_verdicts(spark):
    # part a: values 1..10 → p50 = value at rank ceil(0.5*10) = 5
    # part b: values 101..107 → p50 = value at rank ceil(3.5) = 104
    rows = [("a", float(i)) for i in range(1, 11)] + [
        ("b", float(i)) for i in range(101, 108)
    ]
    df = spark.createDataFrame(rows, "part string, v double")
    res = validate_table(
        df,
        _spec(QuantileBounds("v", q=0.5, lo=0.0, hi=50.0)),
        materialize_violations=False,
    )
    got = {r.partition_id: r for r in res.verdicts.collect()}
    assert got["a"].metric == 5.0 and bool(got["a"].passed)
    assert got["b"].metric == 104.0 and not got["b"].passed


def test_length_form_and_one_sided_bounds(spark):
    df = spark.createDataFrame(
        [("a", "x" * n) for n in (1, 2, 3, 4, 100)], "part string, s string"
    )
    res = validate_table(
        df,
        _spec(
            QuantileBounds("s", q=0.99, length=True, hi=10.0),  # p99=100 fails
            QuantileBounds("s", q=0.5, length=True, lo=2.0),  # p50=3 passes
        ),
        materialize_violations=False,
    )
    got = {r.check_id: r for r in res.verdicts.collect()}
    assert got["quantile(length(s),q=0.99)"].metric == 100.0
    assert not got["quantile(length(s),q=0.99)"].passed
    assert got["quantile(length(s),q=0.5)"].metric == 3.0
    assert bool(got["quantile(length(s),q=0.5)"].passed)


def test_all_null_partition_passes_vacuously(spark):
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 3.0), ("b", None), ("b", None)],
        "part string, v double",
    )
    res = validate_table(
        df,
        _spec(QuantileBounds("v", q=0.5, lo=0.0, hi=1.5)),
        materialize_violations=False,
    )
    got = {r.partition_id: r for r in res.verdicts.collect()}
    assert bool(got["b"].passed) and got["b"].metric is None
    assert not got["a"].passed  # p50 = 2.0 > 1.5


def test_serde_roundtrip():
    spec = _spec(
        QuantileBounds("content", q=0.99, length=True, lo=1.0, hi=2.0),
        NotNull("content"),
    )
    assert spec_from_json(spec_to_json(spec)) == spec


def test_checkpoint_profile_parquet_safe(spark, tmp_path):
    # the fused profile (incl. the quantile metric column) is persisted
    # by the checkpoint layer — parquet rejects "(),=" and dots break
    # F.col, so the metric alias must stay sanitized end-to-end
    from anomaly_detector_faironchain_spark.plans.checkpoint import (
        run_with_checkpoint,
    )

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(20)] + [("b", float(i)) for i in range(5)],
        "part string, v double",
    )
    res = run_with_checkpoint(
        df,
        _spec(QuantileBounds("v", q=0.95, hi=1000.0)),
        str(tmp_path / "ckpt"),
    )
    assert res is not None and res.passed()
    # resume: nothing left
    assert (
        run_with_checkpoint(
            df,
            _spec(QuantileBounds("v", q=0.95, hi=1000.0)),
            str(tmp_path / "ckpt"),
        )
        is None
    )
