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
