"""Build the spark-submit --py-files artifact (BASELINE.json north rule:
"run via spark-submit --py-files on a multi-executor cluster").

Produces a single zip containing the `anomaly_detector_faironchain_spark`
package — importable straight off sys.path, which is exactly how Spark
ships --py-files to executors (the zip is appended to every Python
worker's sys.path). Usage:

    python tools/package_pyfiles.py [out.zip]            # default dist/adfs.zip
    spark-submit --py-files dist/adfs.zip \
        -m anomaly_detector_faironchain_spark.cli validate ...

Only .py sources are packaged (no tests, no __pycache__, no data) so the
artifact stays small enough to broadcast to 1000 executors without
stressing the driver's file server.
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "anomaly_detector_faironchain_spark"


def build(out_path: str, repo_root: str | None = None) -> list[str]:
    """Write the zip; returns the archive member names (sorted, deterministic
    order so repeated builds are byte-stable modulo timestamps)."""
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(root, PKG)
    members: list[str] = []
    for dirpath, dirnames, filenames in os.walk(pkg_dir):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            members.append(os.path.relpath(full, root))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for rel in members:
            # fixed timestamp → byte-identical rebuilds (reproducible artifact)
            info = zipfile.ZipInfo(rel.replace(os.sep, "/"), (2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(os.path.join(root, rel), "rb") as f:
                zf.writestr(info, f.read(), zipfile.ZIP_DEFLATED)
    return members


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/adfs.zip"
    names = build(out)
    size = os.path.getsize(out)
    print(f"{out}: {len(names)} modules, {size} bytes")
