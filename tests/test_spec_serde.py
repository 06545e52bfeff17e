"""Declarative-suite serde: TableSpec <-> JSON round trips, loud
failure on config typos, and the `cli validate --spec` surface a user
shipping suites as config files would hit (the reference's equivalent
rules live as Python in preprocessing/validation/validate_*.py)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark import cli
from anomaly_detector_faironchain_spark.plans.serde import (
    constraint_from_dict,
    spec_from_json,
    spec_to_json,
)
from anomaly_detector_faironchain_spark.plans.spec import (
    Benford,
    CardinalityBounds,
    Correlation,
    CountMatch,
    DistributionOutlier,
    Drift,
    ForeignKey,
    Freshness,
    FunctionalDependency,
    InRange,
    InSet,
    LengthInRange,
    MonotonicPerKey,
    NotNull,
    ProfileOutlier,
    Regex,
    RowCheck,
    SchemaMatch,
    TableSpec,
    Unique,
    VectorShape,
)
from anomaly_detector_faironchain_spark.specs import north_rule_spec

EVERY_CONSTRAINT = (
    NotNull("a", "b"),
    Unique("sid", mode="approx_screen", rsd=0.01, rsd_margin=2.0),
    ForeignKey(("repo",), "repos", ("repo",)),
    FunctionalDependency("commit", dependent="repo"),
    Regex("commit", "[0-9a-f]{40}"),
    InRange("size", 0.0, 1e9),
    InSet("lang", ("py", "rs")),
    LengthInRange("content", 1, 1 << 20),
    VectorShape("emb", 16, norm_lo=0.5),  # norm_hi stays +inf
    RowCheck("sha", "sha2(content, 256) = sha", "sha parity"),
    Drift("size", method="ks", bins=16, lo=None, hi=None, threshold=0.1),
    MonotonicPerKey("repo", order_col="ts", value_col="v", strict=True),
    CountMatch(("repo",), ref_table="manifest", expected_col="n"),
    Benford("amount", threshold=0.012, scale=4),
    Freshness("ts", max_age=3600.0, as_of=1.7e9),
    Correlation("a", "b", lo=-0.5, hi=0.9, allow_undefined=False),
    CardinalityBounds("lang", hi_abs=10, mode="approx"),
    DistributionOutlier("size", bins=8, lo=0.0, hi=100.0, psi_max=0.3),
    ProfileOutlier(metric="null_fraction", col="lang", z_max=4.0),
    SchemaMatch((("repo", "string"), ("n", "bigint")), allow_extra=False),
)


def test_every_constraint_type_round_trips():
    spec = TableSpec(
        name="t",
        partition_col="bucket",
        refs={"repos": "/data/repos", "manifest": "/data/manifest"},
        profile_len_cols=("path", "content"),
        constraints=EVERY_CONSTRAINT,
    )
    back = spec_from_json(spec_to_json(spec))
    assert back == spec
    # strict JSON: VectorShape's +inf must not leak as a bare Infinity
    json.loads(spec_to_json(spec), parse_constant=pytest.fail)
    assert back.constraints[8].norm_hi == float("inf")
    # the canonical built-in suite round-trips too
    nr = north_rule_spec()
    assert spec_from_json(spec_to_json(nr)) == nr


def test_profile_len_cols_none_means_all_strings():
    spec = TableSpec(name="t", constraints=(NotNull("a"),),
                     profile_len_cols=None)
    back = spec_from_json(spec_to_json(spec))
    assert back.profile_len_cols is None and back.partition_col is None


def test_typos_fail_loudly():
    with pytest.raises(ValueError, match="unknown constraint type"):
        constraint_from_dict({"type": "NotNul", "cols": ["a"]})
    with pytest.raises(ValueError, match="unknown fields.*col "):
        constraint_from_dict({"type": "NotNull", "col ": ["a"]})
    with pytest.raises(ValueError, match="missing 'type'"):
        constraint_from_dict({"cols": ["a"]})
    with pytest.raises(ValueError, match="unknown TableSpec fields"):
        spec_from_json('{"table": "t", "constraints": [], "tabel": "x"}')
    with pytest.raises(ValueError, match="needs 'table'"):
        spec_from_json('{"constraints": []}')


def test_cli_validate_runs_a_spec_file(spark, tmp_path, capsys):
    df = spark.range(100).select(
        (F.col("id") % 4).cast("string").alias("bucket"),
        F.col("id").cast("double").alias("size"),
        F.when(F.col("id") < 95, F.format_string("k%d", "id"))
        .alias("key"),
    )
    df.write.parquet(str(tmp_path / "in"))
    suite = TableSpec(
        name="t",
        partition_col="bucket",
        profile_len_cols=(),
        constraints=(
            NotNull("key"),           # 5 null keys -> fails
            InRange("size", 0.0, 1e6),
            Unique("key"),
        ),
    )
    spec_path = tmp_path / "suite.json"
    spec_path.write_text(spec_to_json(suite))
    rc = cli.main([
        "validate", "--input", str(tmp_path / "in"),
        "--out", str(tmp_path / "out"), "--spec", str(spec_path),
    ])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2 and summary["passed"] is False  # null keys caught
    verdicts = spark.read.parquet(str(tmp_path / "out" / "verdicts"))
    rows = {(r.check_id, r.partition_id): r.passed
            for r in verdicts.collect()}
    assert rows[("not_null(key)", "3")] is False
    assert rows[("in_range(size)", "0")] is True
