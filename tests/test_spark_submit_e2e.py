"""Real spark-submit --py-files end-to-end: the packaged zip is the ONLY
source of ispaq_spark (neutral cwd, scrubbed PYTHONPATH), proving the
artifact a cluster deployment ships is complete — the failure modes this
catches (module missing from the zip, data files assumed on disk,
cwd-relative imports) never show up under in-repo pytest runs.

The submitted job is the reference CLI re-target end-to-end: declarative
request -> pages read -> quality pipeline -> resumable snapshot sink
(scripts/run_job.py), on its own local[4] JVM.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
)


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    zip_path = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "package_pyfiles.py"),
         str(tmp_path / "dist")],
        check=True, capture_output=True, text=True,
    ).stdout.splitlines()[0]
    assert zip_path.endswith("ispaq_spark.zip")

    from ispaq_spark.synthesize import pages_df

    inp = tmp_path / "pages"
    pages_df(spark, 200, partitions=2).write.parquet(str(inp))
    out = tmp_path / "metrics"

    env = {**os.environ, "PYTHONPATH": ""}
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         str(REPO / "scripts" / "run_job.py"),
         "-M", "default", "--input", str(inp), "--output", str(out)],
        cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    report = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert report.get("rows_written", report.get("rows", 0)) > 0 or report

    # the sink's parquet is readable and carries the metric columns
    import glob

    parts = glob.glob(str(out / "**" / "*.parquet"), recursive=True)
    assert parts, f"no parquet written under {out}"
    got = spark.read.parquet(*sorted({str(Path(p).parent) for p in parts}))
    assert got.count() == 200
    assert {"url", "keep", "scrubbed_text"} <= set(got.columns)
