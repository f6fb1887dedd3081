"""Build ``dist/inform_spark.zip`` for ``spark-submit --py-files``.

Cluster launch path (north_star: "launched via spark-submit --py-files on
multi-executor clusters"): the whole ``inform_spark`` package is shipped
as one zip that Spark adds to ``sys.path`` on the driver AND every
executor, so pandas-UDF closures unpickle cluster-side without any
shared filesystem.

Usage::

    python scripts/make_pyfiles_zip.py [out_zip]
    spark-submit --master ... --py-files dist/inform_spark.zip your_job.py
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "inform_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "inform_spark")
    # deterministic archive: sorted walk, fixed timestamp, no .pyc
    entries = []
    for root, dirs, files in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                arc = os.path.relpath(full, REPO)
                entries.append((full, arc))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for full, arc in entries:
            info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                z.writestr(info, f.read(), zipfile.ZIP_DEFLATED)
    return out_path


if __name__ == "__main__":
    out = build_zip(sys.argv[1] if len(sys.argv) > 1 else None)
    print(out)
