"""Drive the CLI's EP1/EP2 subcommands through main() — the surfaces a
reference user migrating their run_preprocessing / run_build_abstract /
run_*_pipeline invocations would hit."""

from __future__ import annotations

import json

import pytest

from anomaly_detector_faironchain_spark import cli
from anomaly_detector_faironchain_spark.etl import rawgen


@pytest.fixture(scope="module")
def raw_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("cli_raw")
    rawgen.raw_blocks(spark, 40).write.parquet(f"{base}/blocks")
    rawgen.raw_native_transfers(spark, 2000, 40).write.parquet(
        f"{base}/transfers"
    )
    return str(base)


def test_cli_etl_builds_five_tables(spark, raw_dirs, tmp_path, capsys):
    out = str(tmp_path / "abstract")
    rc = cli.main([
        "etl", "--blocks", f"{raw_dirs}/blocks",
        "--transfers", f"{raw_dirs}/transfers", "--out", out,
    ])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and summary["checks_passed"]
    assert set(summary["tables"]) == {
        "abstract_block", "abstract_transaction", "abstract_token_transfer",
        "abstract_account", "abstract_token",
    }
    assert summary["tables"]["abstract_token"] == 1
    assert summary["tables"]["abstract_token_transfer"] > 0


def test_cli_analyze_writes_result(spark, raw_dirs, tmp_path, capsys):
    abstract_dir = str(tmp_path / "abs2")
    cli.main([
        "etl", "--blocks", f"{raw_dirs}/blocks",
        "--transfers", f"{raw_dirs}/transfers", "--out", abstract_dir,
        "--skip-checks",
    ])
    capsys.readouterr()
    out = str(tmp_path / "result")
    rc = cli.main([
        "analyze",
        "--transfers", f"{abstract_dir}/abstract_token_transfer",
        "--tx", f"{abstract_dir}/abstract_transaction",
        "--blocks", f"{abstract_dir}/abstract_block",
        "--out", out, "--min-amount", "0",
    ])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and summary["accounts"] > 0
    res = spark.read.parquet(out)
    cols = set(res.columns)
    assert {"final_score_0_100", "H1_flag", "is_infra"} <= cols


def test_cli_analyze_csv_flag_roundtrips(spark, raw_dirs, tmp_path, capsys):
    """--csv writes the result as CSV next to the parquet (reference
    output parity: run_anomaly_analysis_pipeline.py:99 writes CSV at
    every stage); read it back and match row counts."""
    abstract_dir = str(tmp_path / "abs3")
    cli.main([
        "etl", "--blocks", f"{raw_dirs}/blocks",
        "--transfers", f"{raw_dirs}/transfers", "--out", abstract_dir,
        "--skip-checks", "--csv",
    ])
    capsys.readouterr()
    # EP1 CSV exports exist and round-trip
    tt_csv = spark.read.option("header", True).csv(
        f"{abstract_dir}/csv/abstract_token_transfer")
    tt_pq = spark.read.parquet(f"{abstract_dir}/abstract_token_transfer")
    assert tt_csv.count() == tt_pq.count()
    assert set(tt_csv.columns) == set(tt_pq.columns)

    out = str(tmp_path / "result3")
    rc = cli.main([
        "analyze",
        "--transfers", f"{abstract_dir}/abstract_token_transfer",
        "--out", out, "--min-amount", "0", "--no-iforest", "--csv",
    ])
    capsys.readouterr()
    assert rc == 0
    res_csv = spark.read.option("header", True).csv(f"{out}_csv")
    res_pq = spark.read.parquet(out)
    assert res_csv.count() == res_pq.count()
    assert set(res_csv.columns) == set(res_pq.columns)


def test_cli_validate_snapshot_mode(spark, tmp_path, capsys):
    from anomaly_detector_faironchain_spark.datagen import (
        source_files as gen,
    )
    from anomaly_detector_faironchain_spark.plans.snapshots import (
        SnapshotTable,
    )
    from pyspark.sql import functions as F

    files = gen.generate_source_files(spark, 3000, seed=11)
    full = files.join(gen.manifest(files), "file_sid")
    repos_df, _ = gen.companion_dims(files)
    repos_path = str(tmp_path / "repos")
    repos_df.write.parquet(repos_path)

    table = SnapshotTable.create(str(tmp_path / "snaptbl"))
    table.append(full.filter(F.col("bucket") < 8))

    out = str(tmp_path / "ck")
    args = [
        "validate", "--input", str(tmp_path / "snaptbl"), "--out", out,
        "--ref", f"repos={repos_path}", "--snapshot",
    ]
    rc = cli.main(args)
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and s1["status"] == "complete" and s1["snapshot"] == 1

    # watermark current -> already_complete, nothing scanned
    rc = cli.main(args)
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and s2["status"] == "already_complete"

    # append -> exactly the increment validates
    table.append(full.filter(F.col("bucket") >= 8))
    rc = cli.main(args)
    s3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and s3["status"] == "complete" and s3["snapshot"] == 2


def test_cli_skew_reports_heavy_keys(spark, tmp_path, capsys):
    src = str(tmp_path / "skewed")
    spark.createDataFrame(
        [("mega",)] * 500 + [(f"k{i}",) for i in range(50)], "repo string"
    ).write.parquet(src)
    rc = cli.main(["skew", "--input", src, "--key", "repo", "--top", "3"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["key_col"] == "repo"
    assert out["hitters"][0] == {
        "key": "mega", "est_count": 500, "err_bound": 0
    }
    assert len(out["hitters"]) == 3


def test_cli_validate_report_flag(spark, tmp_path, capsys):
    src = str(tmp_path / "docs_src")
    spark.createDataFrame(
        [(i, "en" if i % 5 else "xx", f"t{i}") for i in range(50)],
        "doc_id long, lang string, text string",
    ).write.parquet(src)
    import json as _json
    spec = {
        "table": "docs", "partition_col": "lang",
        "constraints": [
            {"type": "NotNull", "cols": ["doc_id"]},
            {"type": "InSet", "col": "lang", "values": ["en"]},
        ],
    }
    spec_file = tmp_path / "spec.json"
    spec_file.write_text(_json.dumps(spec))
    out = str(tmp_path / "rep_out")
    rc = cli.main([
        "validate", "--input", src, "--out", out,
        "--spec", str(spec_file), "--report",
    ])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2 and not summary["passed"]  # xx rows violate InSet
    report = (tmp_path / "rep_out" / "report.md").read_text()
    assert "Overall: FAIL" in report
    assert "in_set(lang)" in report and "Violation samples" in report
    assert "`xx`" in report  # the failing partition is named


def test_cli_screen_certifies_and_escalates(spark, tmp_path, capsys):
    """`cli screen`: sample-first verdicts over a source_files table with
    one deliberately corrupted bucket — the screen must fail overall, and
    the summary must account rows_scanned per method."""
    from anomaly_detector_faironchain_spark.datagen import (
        source_files as gen,
    )
    from pyspark.sql import functions as F

    files = gen.generate_source_files(spark, 6000, seed=13)
    full = files.join(gen.manifest(files), "file_sid")
    # corrupt ~25% of bucket 3's shas -> certified fail from the sample
    corrupted = full.withColumn(
        "content_sha256",
        F.when(
            (F.col("bucket") == 3) & (F.xxhash64("file_sid") % 4 == 0),
            F.lit("0" * 64),
        ).otherwise(F.col("content_sha256")),
    )
    inp = str(tmp_path / "screen_in")
    corrupted.write.parquet(inp)

    out = str(tmp_path / "screen_out")
    rc = cli.main([
        "screen", "--input", inp, "--out", out, "--key", "file_sid",
        "--fraction", "0.2", "--tolerance", "0.01",
    ])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2 and summary["passed"] is False
    assert summary["by_method"]["sample"]["failed"] >= 1
    back = spark.read.parquet(out)
    # the corrupted bucket's sha check must be a certified-fail sample row
    bad = back.filter(
        (F.col("partition_id") == "3")
        & (F.col("check_id") == "row_check(sha_invariant)")
    ).collect()
    assert len(bad) == 1 and bad[0]["passed"] is False
    assert bad[0]["method"] == "sample"


def test_cli_suggest_writes_runnable_spec(spark, tmp_path, capsys):
    """`cli suggest`: profile a table, write the suggested spec JSON,
    then `validate --spec` must run it unchanged and pass (the spec is
    self-consistent on the input that produced it)."""
    df = spark.createDataFrame(
        [(i, ["open", "closed"][i % 2], f"{i:04x}ff", i % 7) for i in range(200)],
        "id long, status string, commit string, grp int",
    )
    inp = str(tmp_path / "suggest_in")
    df.write.parquet(inp)

    spec_path = str(tmp_path / "suggested.json")
    rc = cli.main([
        "suggest", "--input", inp, "--name", "t", "--exact",
        "--fd", "commit->id", "--out", spec_path,
    ])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and summary["n_suggestions"] > 0
    text = open(spec_path, encoding="utf-8").read()
    assert '"NotNull"' in text and '"InSet"' in text
    assert '"FunctionalDependency"' in text  # commit unique -> FD holds
    capsys.readouterr()

    out = str(tmp_path / "suggest_validate")
    rc2 = cli.main([
        "validate", "--input", inp, "--out", out, "--spec", spec_path,
    ])
    summary2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc2 == 0 and summary2["passed"] is True


def test_cli_corpus_report(spark, tmp_path, capsys):
    src = str(tmp_path / "corpus_src")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .write.parquet(src)
    out = str(tmp_path / "corpus.md")
    rc = cli.main([
        "corpus-report", "--input", src, "--out", out,
        "--top-sources", "5",
    ])
    assert rc == 0
    import json as _json
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["status"] == "ok"
    md = open(out, encoding="utf-8").read()
    assert md.startswith("# Corpus report")
    assert "BPE-ish tokens" in md
    assert "## Languages" in md
    assert "## Top 5 sources" in md
    # doc count in the header matches the input
    n = spark.read.parquet(src).count()
    assert f"**{n:,} documents" in md
