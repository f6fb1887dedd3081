"""Cluster launch path: spark-submit --py-files inform_spark.zip.

North-star evidence (BASELINE.json: "launched via spark-submit
--py-files on multi-executor clusters"): the package must run shipped as
a zip — no repo checkout on the workers. The test builds the zip, then
spark-submits the smoke job from an EMPTY cwd so the only way
``import inform_spark`` can succeed (driver side and inside executor
pandas-UDF workers) is via the --py-files distribution.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or os.path.join(
    os.path.dirname(sys.executable), "spark-submit"
)


def test_zip_is_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from make_pyfiles_zip import build_zip
    finally:
        sys.path.pop(0)
    a = build_zip(str(tmp_path / "a.zip"))
    b = build_zip(str(tmp_path / "b.zip"))
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on PATH"
)
def test_spark_submit_pyfiles_smoke(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from make_pyfiles_zip import build_zip
    finally:
        sys.path.pop(0)
    zip_path = build_zip(str(tmp_path / "inform_spark.zip"))

    env = dict(os.environ)
    # keep the job off the repo: PYTHONPATH cleared, cwd is a scratch dir
    env.pop("PYTHONPATH", None)
    env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[2]",
            "--conf",
            "spark.ui.enabled=false",
            "--conf",
            "spark.sql.shuffle.partitions=4",
            "--py-files",
            zip_path,
            os.path.join(REPO, "scripts", "submit_smoke.py"),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert lines, out.stdout[-2000:]
    res = json.loads(lines[-1])
    assert res["ok"] > 0 and res["documents"] > 0 and res["spans"] > 0
    # the package really came from the zip, not the checkout
    assert "inform_spark.zip" in res["pkg"], res["pkg"]
