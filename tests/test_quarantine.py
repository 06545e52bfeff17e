"""Row-level quarantine split (plans/quarantine.split_rows): clean rows
keep the input schema, quarantined rows carry the sorted check-id list;
partition-level constraints never blame rows; the mark stays map-only
(no Exchange); and the CLI --quarantine flag writes both sides."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark import cli
from anomaly_detector_faironchain_spark.plans.quarantine import split_rows
from anomaly_detector_faironchain_spark.plans.serde import spec_to_json
from anomaly_detector_faironchain_spark.plans.spec import (
    InRange,
    InSet,
    NotNull,
    TableSpec,
    Unique,
)


def _spec(*constraints):
    return TableSpec(name="t", constraints=tuple(constraints),
                     profile_len_cols=())


def test_split_routes_rows_and_names_checks(spark):
    df = spark.createDataFrame(
        [
            (1, "en", 5.0),     # clean
            (2, None, 5.0),     # null lang
            (3, "xx", 5.0),     # bad domain
            (4, "xx", 99.0),    # bad domain AND out of range
            (5, "en", -1.0),    # out of range
        ],
        "id long, lang string, v double",
    )
    clean, quar = split_rows(
        df, _spec(NotNull("lang"), InSet("lang", ("en", "de")),
                  InRange("v", 0.0, 10.0)),
    )
    assert clean.columns == df.columns  # schema untouched
    assert [r.id for r in clean.collect()] == [1]
    got = {r.id: list(r.failed_checks) for r in quar.collect()}
    assert got == {
        2: ["not_null(lang)"],
        3: ["in_set(lang)"],
        4: ["in_range(v)", "in_set(lang)"],  # array_sort order
        5: ["in_range(v)"],
    }


def test_partition_level_constraints_do_not_blame_rows(spark):
    # Unique violations exist, but uniqueness is partition-level — no
    # single row is at fault, so the split keeps everything clean
    df = spark.createDataFrame([(1,), (1,), (2,)], "id long")
    clean, quar = split_rows(df, _spec(Unique("id")))
    assert clean.count() == 3 and quar.count() == 0
    assert "failed_checks" in quar.columns


def test_failed_checks_name_collision_rejected(spark):
    df = spark.range(3).withColumn("failed_checks", F.lit("x"))
    with pytest.raises(ValueError, match="failed_checks"):
        split_rows(df, _spec(NotNull("id")))


def test_split_mark_is_map_only(spark):
    df = spark.range(100).select(
        F.col("id"), F.lit("en").alias("lang"),
    )
    clean, quar = split_rows(
        df, _spec(NotNull("lang"), InSet("lang", ("en",))),
    )
    for side in (clean, quar):
        plan = side._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_cli_quarantine_flag(spark, tmp_path, capsys):
    df = spark.range(50).select(
        (F.col("id") % 2).cast("string").alias("bucket"),
        F.when(F.col("id") % 10 != 0, F.col("id").cast("double"))
        .alias("v"),
    )
    df.write.parquet(str(tmp_path / "in"))
    suite = TableSpec(name="t", partition_col="bucket",
                      constraints=(NotNull("v"),), profile_len_cols=())
    (tmp_path / "suite.json").write_text(spec_to_json(suite))
    rc = cli.main([
        "validate", "--input", str(tmp_path / "in"),
        "--out", str(tmp_path / "out"),
        "--spec", str(tmp_path / "suite.json"),
        "--quarantine", str(tmp_path / "q"),
    ])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2  # 5 null rows fail NotNull
    assert summary["quarantine"]["quarantined"] == 5
    assert summary["quarantine"]["clean"] == 45
    q = spark.read.parquet(str(tmp_path / "q" / "quarantine"))
    assert set(q.columns) == {"bucket", "v", "failed_checks"}
    assert all(r.failed_checks == ["not_null(v)"] for r in q.collect())
    c = spark.read.parquet(str(tmp_path / "q" / "clean"))
    assert set(c.columns) == {"bucket", "v"} and c.count() == 45
