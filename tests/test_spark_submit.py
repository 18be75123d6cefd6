"""The north rule's deployment contract, taken literally: the engine ships
as a ``spark-submit --py-files engine.zip`` job. This test runs the REAL
spark-submit binary from a cwd OUTSIDE the repo with the package available
only through the zip — the exact shape a cluster submission has — and
asserts the full suite (including the Arrow-batched decode pass on
executors) completes with the expected violation families.

Regression guarded: _ship_package used to crash under --py-files (it tried
to re-zip the package by walking inside the already-zip-imported archive).
"""

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit binary not available"
)
def test_spark_submit_py_files_runs_full_suite(tmp_path):
    stage = tmp_path / "submit"
    stage.mkdir()
    shutil.make_archive(
        str(stage / "engine"),
        "zip",
        root_dir=REPO,
        base_dir="audit_anomaly_detection_etl_spark",
    )
    shutil.copy(os.path.join(REPO, "jobs", "validate.py"), stage / "job_entry.py")
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--py-files", "engine.zip",
            "job_entry.py",
            "--synth", "300",
            "--checkpoint", str(stage / "ck"),
        ],
        cwd=str(stage),  # outside the repo: the zip is the only import source
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["parts_ran"] == 16 and summary["rows_validated"] == 300
    # decode ran on executors: payload/codec families present for this seed
    assert "payload_snr" in summary["violations_by_check"]
    assert "uniqueness" in summary["violations_by_check"]
