"""End-to-end proof of the north-rule deployment shape:

    spark-submit --py-files dist/engine.zip jobs/validate.py ...

The test stages ``jobs/validate.py`` in a scratch directory that does NOT
contain the package, strips PYTHONPATH, and launches spark-submit with the
archive built by ``scripts/build_dist.py`` — so the engine import can only
be satisfied by the ``--py-files`` zip (driver side via the PYTHONPATH
spark-submit derives from --py-files; executor side via the shipped
archive). A passing run is the evidence that the engine genuinely ships as
a single zip, with no hidden dependence on repo-relative paths or data
files read through ``__file__`` (zipimport has neither).

Kept cheap: 200 synthetic clips on local[2]; one JVM, ~1 min.
"""

from __future__ import annotations

import importlib.util
import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_build_dist():
    spec = importlib.util.spec_from_file_location(
        "build_dist", os.path.join(REPO, "scripts", "build_dist.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dist_archive_is_deterministic(tmp_path):
    bd = _load_build_dist()
    a = bd.build(str(tmp_path / "a.zip"))
    b = bd.build(str(tmp_path / "b.zip"))
    assert a["n_files"] == b["n_files"] > 20
    assert a["sha256"] == b["sha256"]


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_pyfiles_zip_runs_validate(tmp_path):
    bd = _load_build_dist()
    z = bd.build(str(tmp_path / "dist" / "engine.zip"))["path"]

    # Stage the job file AWAY from the repo: its own
    # sys.path.insert(repo_root) then points at tmp_path, which has no
    # package — the import must come from the --py-files archive.
    job_dir = tmp_path / "jobs"
    job_dir.mkdir()
    job = job_dir / "validate.py"
    shutil.copy(os.path.join(REPO, "jobs", "validate.py"), job)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_DRIVER_MEMORY"] = "2g"

    # Provenance pre-checks: with PYTHONPATH stripped and cwd=tmp_path the
    # bare import must FAIL (the package is not pip-installed into
    # site-packages — otherwise the zip-only claim is silently weakened),
    # and with only the zip on sys.path it must resolve FROM the zip.
    probe = subprocess.run(
        ["python", "-c", "import audit_anomaly_detection_etl_spark"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
    )
    assert probe.returncode != 0, (
        "package importable without the zip (site-packages install?) — "
        "the --py-files-only proof would be vacuous"
    )
    probe = subprocess.run(
        [
            "python", "-c",
            "import sys; sys.path.insert(0, sys.argv[1]); "
            "import audit_anomaly_detection_etl_spark as p; print(p.__file__)",
            z,
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
    )
    assert probe.returncode == 0, probe.stderr[-2000:]
    assert "engine.zip" in probe.stdout, probe.stdout
    proc = subprocess.run(
        [
            "spark-submit",
            "--py-files",
            z,
            str(job),
            "--synth",
            "200",
            "--checkpoint",
            str(tmp_path / "ck"),
            "--master",
            "local[2]",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["rows_validated"] == 200
    assert summary["parts_total"] >= 1
    assert summary["passed"] + summary["failed"] == summary["parts_total"]
    # The synth injector plants violations; a run that reports zero found
    # nothing and proves nothing.
    assert sum(summary["violations_by_check"].values()) > 0
