"""The --py-files artifact must be importable exactly the way Spark uses
it: zip appended to sys.path of a FRESH interpreter (no repo checkout on
the path). north rule: "run via spark-submit --py-files".
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import package_pyfiles  # noqa: E402


def test_zip_imports_in_clean_interpreter(tmp_path):
    out = str(tmp_path / "adfs.zip")
    members = package_pyfiles.build(out)
    assert any(m.endswith("cli.py") for m in members)
    assert any(m.endswith("plans/compiler.py") or m.endswith("plans\\compiler.py")
               for m in members)
    assert not any("test" in m.split(os.sep)[0] for m in members)

    probe = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "from anomaly_detector_faironchain_spark.plans import "
        "TableSpec, NotNull; "
        "from anomaly_detector_faironchain_spark import cli, suite; "
        "s = TableSpec(name='t', partition_col=None, "
        "constraints=(NotNull('a'),)); "
        "print(s.constraints[0].check_id())"
    )
    # cwd=tmp_path so the repo checkout is NOT importable — only the zip
    r = subprocess.run(
        [sys.executable, "-c", probe, out],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert r.returncode == 0, r.stderr
    assert "not_null(a)" in r.stdout


def test_zip_build_is_deterministic(tmp_path):
    a, b = str(tmp_path / "a.zip"), str(tmp_path / "b.zip")
    package_pyfiles.build(a)
    package_pyfiles.build(b)
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()


def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    """The north rule's launch shape, literally: `spark-submit
    --py-files adfs.zip cli.py validate ...` in a fresh JVM, with the
    repo checkout NOT importable (the driver script's dir is the
    package dir, whose PARENT is what imports need — so every import
    must resolve from the zip)."""
    import json
    import shutil

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pytest

        pytest.skip("spark-submit not on PATH")

    src = str(tmp_path / "docs_src")
    spark.createDataFrame(
        [(i, "en", f"t{i}") for i in range(40)],
        "doc_id long, lang string, text string",
    ).write.parquet(src)
    spec_file = tmp_path / "spec.json"
    spec_file.write_text(json.dumps({
        "table": "docs", "partition_col": "lang",
        "constraints": [
            {"type": "NotNull", "cols": ["doc_id", "text"]},
            {"type": "InSet", "col": "lang", "values": ["en"]},
        ],
    }))

    zip_path = str(tmp_path / "adfs.zip")
    package_pyfiles.build(zip_path)
    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    cli_script = os.path.join(
        repo_root, "anomaly_detector_faironchain_spark", "cli.py"
    )
    out = str(tmp_path / "ck")
    r = subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path, cli_script,
         "validate", "--input", src, "--out", out,
         "--spec", str(spec_file), "--report"],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": ""}, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["passed"] and summary["partitions"] == 1
    assert (tmp_path / "ck" / "report.md").read_text().startswith(
        "# Validation report"
    )
