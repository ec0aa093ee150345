"""spark-submit --py-files deployment smoke (north rule: the job runs via
spark-submit on multi-executor clusters; here local[4] stands in)."""

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles(tmp_path):
    sys.path.insert(0, ROOT)
    from tools.make_pyfiles_zip import build

    zip_path = build(str(tmp_path / "geowave_spark.zip"))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            os.path.join(ROOT, "tools", "job_spatial_join.py"),
            "--sf-dir", "/root/testdata/sf0.001",
        ],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["join_rows"] > 0
    assert out["master"] == "local[4]"
