"""Streaming incremental validation, guarded SQL surface, and
checkpoint/resume semantics.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from anomaly_detector_faironchain_spark.datagen import source_files as gen
from anomaly_detector_faironchain_spark.plans import (
    InSet,
    NotNull,
    TableSpec,
    Unique,
)
from anomaly_detector_faironchain_spark.plans.checkpoint import (
    completed_partitions,
    run_with_checkpoint,
)
from anomaly_detector_faironchain_spark.plans.sqlapi import (
    SqlGuardError,
    guard_sql,
    run_sql,
    top_failing_partitions,
)
from anomaly_detector_faironchain_spark.streaming import validate_stream

SF = "/root/testdata/sf0.001"


def _docs_spec() -> TableSpec:
    return TableSpec(
        name="documents",
        partition_col="source",
        constraints=(
            NotNull("doc_id", "text", "lang"),
            Unique("doc_id"),
            InSet("lang", ("en", "de", "es", "fr", "zh")),
        ),
    )


def test_streaming_matches_batch(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    in_dir = tmp_path / "in"
    # two file drops — two micro-batches under availableNow+maxFilesPerTrigger
    docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(str(in_dir / "a"))
    docs.filter("doc_id % 2 = 1").coalesce(1).write.parquet(str(in_dir / "b"))
    out = tmp_path / "out"
    validate_stream(
        spark,
        f"{in_dir}/*",
        docs.schema,
        _docs_spec(),
        str(out),
        max_files_per_trigger=1,
    )
    got = spark.read.parquet(str(out / "verdicts"))
    assert got.select("batch_id").distinct().count() >= 2
    # summed violations across micro-batches == batch run on the full table
    from anomaly_detector_faironchain_spark.plans.compiler import validate_table
    batch = validate_table(docs, _docs_spec())
    merged = got.groupBy("check_id").agg(F.sum("n_violations").alias("v"))
    ref = batch.verdicts.groupBy("check_id").agg(F.sum("n_violations").alias("v"))
    assert {(r.check_id, r.v) for r in merged.collect()} == \
           {(r.check_id, r.v) for r in ref.collect()}


def test_sql_guard_rejects_non_select_and_ddl():
    with pytest.raises(SqlGuardError):
        guard_sql("DROP TABLE t")
    with pytest.raises(SqlGuardError):
        guard_sql("SELECT * FROM t; CREATE TABLE x AS SELECT 1")
    with pytest.raises(SqlGuardError):
        guard_sql("  update t set a=1")
    assert guard_sql("  SELECT doc_id FROM t LIMIT 3").startswith("SELECT")


def test_run_sql_executes_guarded_select(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = run_sql(spark, docs, "SELECT lang, count(*) AS n FROM t GROUP BY lang")
    assert out.count() > 0 and set(out.columns) == {"lang", "n"}


def test_top_failing_partitions_ranking(spark):
    from anomaly_detector_faironchain_spark.plans.compiler import validate_table
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bad_spec = TableSpec(
        name="documents", partition_col="source",
        constraints=(InSet("lang", ("en",)),),  # most rows violate
    )
    res = validate_table(docs, bad_spec)
    top = top_failing_partitions(res.verdicts, n=5).collect()
    assert len(top) == 5
    assert [r.ranking for r in top] == [1, 2, 3, 4, 5]
    viols = [r.n_violations for r in top]
    assert viols == sorted(viols, reverse=True)


def test_checkpoint_resume_skips_completed(spark, tmp_path):
    files = gen.generate_source_files(spark, 1000, seed=3, partitions=4)
    man = gen.manifest(files)
    repos, _ = gen.companion_dims(files)
    df = files.join(man, "file_sid")
    from anomaly_detector_faironchain_spark.specs import north_rule_spec
    out = tmp_path / "ckpt"
    r1 = run_with_checkpoint(df, north_rule_spec(), str(out), refs={"repos": repos})
    assert r1 is not None and r1.passed()
    done = completed_partitions(str(out))
    assert len(done) > 1
    # full re-run: nothing left to validate
    assert run_with_checkpoint(df, north_rule_spec(), str(out), refs={"repos": repos}) is None
    # invalidate ONE partition manifest → only that partition re-scans
    victim = sorted(done)[0]
    mdir = Path(out) / "_manifest"
    for f in mdir.glob("*.json"):
        if json.loads(f.read_text())["partition_id"] == victim:
            f.unlink()
    r2 = run_with_checkpoint(df, north_rule_spec(), str(out), refs={"repos": repos})
    assert r2 is not None
    scanned = [r.partition_id for r in r2.profile.select("partition_id").collect()]
    assert scanned == [victim]
