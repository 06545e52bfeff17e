"""Multi-table suites: concurrent validate_suite parity with the
serial per-table path, in-suite ref resolution, suite-document serde,
and the CLI surface (one --spec file validating a whole schema)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark import cli
from anomaly_detector_faironchain_spark.plans.compiler import validate_table
from anomaly_detector_faironchain_spark.plans.multi import (
    suite_refs,
    validate_suite,
)
from anomaly_detector_faironchain_spark.plans.serde import (
    spec_from_json,
    suite_from_json,
    suite_to_json,
)
from anomaly_detector_faironchain_spark.plans.spec import (
    ForeignKey,
    InRange,
    NotNull,
    TableSpec,
    Unique,
)


@pytest.fixture(scope="module")
def two_tables(spark):
    cust = spark.range(20).select(
        F.col("id").alias("c_id"),
        (F.col("id") % 3).cast("string").alias("segment"),
    )
    orders = spark.range(200).select(
        F.col("id").alias("o_id"),
        # ids 0..21 as customer keys: 20 and 21 dangle -> FK violations
        (F.col("id") % 22).alias("o_cust"),
        (F.col("id") % 5).cast("string").alias("bucket"),
        (F.col("id") % 100).cast("double").alias("amount"),
    )
    return {"customers": cust, "orders": orders}


SPECS = {
    "customers": TableSpec(
        name="customers",
        partition_col="segment",
        constraints=(NotNull("c_id"), Unique("c_id")),
        profile_len_cols=(),
    ),
    "orders": TableSpec(
        name="orders",
        partition_col="bucket",
        constraints=(
            NotNull("o_id", "o_cust"),
            ForeignKey(("o_cust",), "customers", ("c_id",)),
            InRange("amount", 0.0, 99.0),
        ),
        profile_len_cols=(),
    ),
}


def _verdict_set(res):
    return {
        (r.table, r.partition_id, r.check_id, r.passed, r.n_violations)
        for r in res.verdicts.collect()
    }


def test_validate_suite_matches_serial_path(spark, two_tables):
    results = validate_suite(two_tables, SPECS, max_parallel=2)
    assert set(results) == {"customers", "orders"}
    assert results["customers"].passed() is True
    assert results["orders"].passed() is False  # dangling FK keys
    for name, spec in SPECS.items():
        serial = validate_table(
            two_tables[name], spec,
            refs=suite_refs(spec, two_tables),
        )
        assert _verdict_set(results[name]) == _verdict_set(serial)
        serial.unpersist()
    for res in results.values():
        res.unpersist()


def test_suite_refs_resolution_order_and_missing(spark, two_tables):
    # in-suite table wins over an external ref of the same name
    external = {"customers": two_tables["customers"].limit(0)}
    refs = suite_refs(SPECS["orders"], two_tables, external)
    assert refs["customers"] is two_tables["customers"]
    with pytest.raises(ValueError, match="neither in the suite"):
        suite_refs(SPECS["orders"], {"orders": two_tables["orders"]}, {})
    with pytest.raises(ValueError, match="specs without input tables"):
        validate_suite({"orders": two_tables["orders"]}, SPECS)


def test_suite_document_round_trips():
    text = suite_to_json(SPECS, inputs={"orders": "/data/orders"})
    specs, inputs = suite_from_json(text)
    assert specs == SPECS
    assert inputs == {"orders": "/data/orders"}
    # a single-table doc loads as a suite of one
    single = json.dumps({"table": "t", "constraints": [
        {"type": "NotNull", "cols": ["a"]}]})
    specs1, inputs1 = suite_from_json(single)
    assert list(specs1) == ["t"] and inputs1 == {}
    # and the single-table loader refuses a suite doc
    with pytest.raises(ValueError, match="multi-table suite"):
        spec_from_json(text)
    with pytest.raises(ValueError, match="duplicate table"):
        suite_from_json(suite_to_json(
            {"a": SPECS["customers"], "b": SPECS["customers"]}))
    with pytest.raises(ValueError, match="unknown suite-document"):
        suite_from_json('{"suite": [], "extra": 1}')


def test_cli_validates_whole_suite(spark, two_tables, tmp_path, capsys):
    for name, df in two_tables.items():
        df.write.parquet(str(tmp_path / "data" / name))
    (tmp_path / "suite.json").write_text(suite_to_json(SPECS))
    rc = cli.main([
        "validate", "--input", str(tmp_path / "data"),
        "--out", str(tmp_path / "out"),
        "--spec", str(tmp_path / "suite.json"),
    ])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2 and summary["passed"] is False
    assert summary["tables"]["customers"]["passed"] is True
    assert summary["tables"]["orders"]["passed"] is False
    v = spark.read.parquet(str(tmp_path / "out" / "orders" / "verdicts"))
    fk = {r.partition_id: r.passed
          for r in v.filter(F.col("check_id").startswith("fk")).collect()}
    assert False in fk.values()
    viol = spark.read.parquet(
        str(tmp_path / "out" / "orders" / "violations"))
    assert viol.count() > 0
