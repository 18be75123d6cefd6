"""End-to-end suite runner: verdicts, kill/resume, idempotency, determinism.

SURVEY.md §5 items 4-5: kill after k partitions -> rerun validates only the
remainder and final verdicts are identical; same seed + different parallelism
-> identical verdict + violation tables.
"""

import os

import pyarrow.parquet as pq
import pytest

from audit_anomaly_detection_etl_spark.plans import checkpoint as ck
from audit_anomaly_detection_etl_spark.plans.runner import KilledMidRun, ranked_violations, run_suite
from audit_anomaly_detection_etl_spark.plans.spec import SuiteSpec


def _run(spark, clip_dir, ckdir, **kw):
    return run_suite(
        spark,
        clips_root=os.path.join(clip_dir, "clips"),
        ref_root=os.path.join(clip_dir, "clips_ref"),
        hist_ref_path=os.path.join(clip_dir, "hist_ref.parquet"),
        checkpoint_dir=str(ckdir),
        **kw,
    )


def _expected(clip_dir):
    return pq.read_table(os.path.join(clip_dir, "violations_expected.parquet")).to_pandas()


def test_full_run_verdicts_and_violation_parity(spark, clip_dir, tmp_path):
    res = _run(spark, clip_dir, tmp_path / "ck")
    assert len(res.verdicts) == 16 and len(res.ran_parts) == 16
    assert res.schema_issues == []

    exp = _expected(clip_dir)
    v = ranked_violations(spark, res.violations_path).toPandas()
    # exact violation-row parity vs generator sidecar (key, check-family)
    # sets; an unknown codec is caught twice (schema domain check + payload
    # decode) — both normalize to the sidecar's 'codec' family
    fam = v.check.where(~((v.check == "schema_constraint") & (v.detail == "codec:domain")), "codec")
    assert set(zip(v.key, fam)) == set(zip(exp.clip_id, exp.check))
    # ranked: severity monotone non-increasing
    assert v.severity.is_monotonic_decreasing

    # partition verdicts: a part fails iff it owns >=1 violation
    bad_parts = set(v[v.part.notna()].part.astype(int))
    for p, verdict in res.verdicts.items():
        assert verdict.passed == (p not in bad_parts), p
        assert verdict.snapshot_id == res.snapshot_id
        assert verdict.metrics["column_stats"], "metrics rows recorded"
        assert verdict.metrics["drift"], "drift metrics recorded"
    # drift: clean generation must not trip PSI in any partition
    assert all(not m["drifted"] for m in res.drift_metrics)


def test_kill_then_resume_runs_only_pending(spark, clip_dir, tmp_path):
    ckdir = tmp_path / "ck2"
    with pytest.raises(KilledMidRun):
        _run(spark, clip_dir, ckdir, wave_size=4, fail_after_waves=2)
    store = ck.CheckpointStore(str(ckdir))
    # 2 waves x 4 parts checkpointed before the kill
    done_before = len(os.listdir(ckdir)) - 1  # minus violations dir
    assert done_before == 8

    res = _run(spark, clip_dir, ckdir, wave_size=4)
    assert sorted(res.ran_parts + res.skipped_parts) == list(range(16))
    assert len(res.skipped_parts) == 8 and len(res.ran_parts) == 8

    # final state identical to an uninterrupted run
    clean = _run(spark, clip_dir, tmp_path / "ck3")
    for p in range(16):
        a, b = res.verdicts[p], clean.verdicts[p]
        assert (a.passed, a.n_rows, a.n_violations, a.violations_by_check) == (
            b.passed,
            b.n_rows,
            b.n_violations,
            b.violations_by_check,
        )
    va = ranked_violations(spark, res.violations_path).toPandas()
    vb = ranked_violations(spark, clean.violations_path).toPandas()
    assert sorted(map(tuple, va[["key", "check"]].values)) == sorted(
        map(tuple, vb[["key", "check"]].values)
    )


def test_rerun_is_noop_and_idempotent(spark, clip_dir, tmp_path):
    ckdir = tmp_path / "ck4"
    first = _run(spark, clip_dir, ckdir)
    again = _run(spark, clip_dir, ckdir)
    assert again.ran_parts == [] and len(again.skipped_parts) == 16
    assert {p: v.n_violations for p, v in again.verdicts.items()} == {
        p: v.n_violations for p, v in first.verdicts.items()
    }


def test_incremental_ingest_revalidates_only_touched_partitions(
    spark, clip_dir, tmp_path
):
    """Partition-grain lineage: appending a file to ONE partition (which
    changes the global snapshot_id) must re-validate exactly that partition
    — every other marker stays valid under its own manifest fingerprint."""
    import shutil

    data = tmp_path / "data"
    shutil.copytree(clip_dir, data)
    ckdir = tmp_path / "ck_inc"
    first = _run(spark, str(data), ckdir)
    assert len(first.ran_parts) == 16

    # incremental ingest into part=3: append a copy of one of its files
    pdir = os.path.join(str(data), "clips", "part=3")
    src = next(f for f in sorted(os.listdir(pdir)) if f.endswith(".parquet"))
    shutil.copy(os.path.join(pdir, src), os.path.join(pdir, "appended-0.parquet"))

    res = _run(spark, str(data), ckdir)
    assert res.snapshot_id != first.snapshot_id
    assert res.ran_parts == [3]
    assert sorted(res.skipped_parts) == [p for p in range(16) if p != 3]
    # untouched partitions keep their original verdicts verbatim
    for p in res.skipped_parts:
        a, b = res.verdicts[p], first.verdicts[p]
        assert (a.passed, a.n_rows, a.n_violations) == (b.passed, b.n_rows, b.n_violations)
    # the touched partition re-validated against its new contents
    # (file duplicated -> every clip_id in it is now a duplicate)
    assert res.verdicts[3].n_rows == 2 * first.verdicts[3].n_rows
    assert not res.verdicts[3].passed


def test_spec_change_invalidates_checkpoints(spark, clip_dir, tmp_path):
    ckdir = tmp_path / "ck5"
    _run(spark, clip_dir, ckdir)
    looser = SuiteSpec(psi_threshold=0.5)
    res = _run(spark, clip_dir, ckdir, spec=looser)
    assert len(res.ran_parts) == 16, "new spec hash must re-validate everything"


def test_non_key_partitioned_kill_resume_catches_cross_wave_dups(
    spark, clip_dir, tmp_path
):
    """key_partitioned=False contract (runner docstring): when the partition
    column is NOT a key function, duplicates span partitions, so uniqueness
    leaves the resumable per-wave plan and runs globally on EVERY invocation
    — a resumed run must still catch duplicate pairs whose halves were
    validated in different waves (one before the kill, one after)."""
    # repartition the synth clips by ROW POSITION (not key hash): sort by
    # clip_id then part = rownum % 8, so the two halves of every injected
    # duplicate pair land in DIFFERENT partitions by construction
    src = pq.read_table(os.path.join(clip_dir, "clips")).to_pandas()
    src = src.sort_values("clip_id").reset_index(drop=True).drop(columns=["part"])
    src["part"] = (src.index % 8).astype("int32")
    dup_ids = set(src.clip_id[src.clip_id.duplicated(keep=False)])
    assert dup_ids, "synth must have injected duplicates"
    cross = src[src.clip_id.isin(dup_ids)].groupby("clip_id").part.nunique()
    assert (cross > 1).all(), "every dup pair must straddle partitions"

    root = str(tmp_path / "npk_clips")
    sdf = spark.createDataFrame(src)
    sdf.write.mode("overwrite").partitionBy("part").parquet(root)

    spec = SuiteSpec(checks=("schema", "stats", "uniqueness"), key_partitioned=False)
    ckdir = tmp_path / "npk_ck"
    with pytest.raises(KilledMidRun):
        run_suite(
            spark, clips_root=root, ref_root=None, hist_ref_path=None,
            checkpoint_dir=str(ckdir), spec=spec, wave_size=4, fail_after_waves=1,
        )

    res = run_suite(
        spark, clips_root=root, ref_root=None, hist_ref_path=None,
        checkpoint_dir=str(ckdir), spec=spec, wave_size=4,
    )
    assert len(res.skipped_parts) == 4 and len(res.ran_parts) == 4  # resumed
    # per-wave plans must NOT contain uniqueness rows (not decomposable here)
    for v in res.verdicts.values():
        assert "uniqueness" not in v.violations_by_check
    # the global pass catches every duplicate row, cross-wave included
    n_dup_rows = int(src.clip_id.isin(dup_ids).sum())
    assert res.global_violations_by_check == {"uniqueness": n_dup_rows}
    gv = spark.read.parquet(res.global_violations_path).toPandas()
    assert set(gv.key) == dup_ids
    # and ranked output folds both sources
    ranked = ranked_violations(
        spark, res.violations_path, res.global_violations_path
    ).toPandas()
    assert set(gv.key) <= set(ranked.key)


def test_determinism_across_parallelism(clip_dir, tmp_path):
    """Same input at local[2] vs local[4] -> identical verdicts + violations.

    Runs the real spark-submit entry (jobs/validate.py) in two subprocesses —
    separate JVMs, different parallelism and shuffle layouts.
    """
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outs = []
    for i, master in enumerate(["local[2]", "local[4]"]):
        ckdir = tmp_path / f"det{i}"
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(repo, "jobs", "validate.py"),
                "--data", os.path.join(clip_dir, "clips"),
                "--ref", os.path.join(clip_dir, "clips_ref"),
                "--hist-ref", os.path.join(clip_dir, "hist_ref.parquet"),
                "--checkpoint", str(ckdir),
                "--master", master,
            ],
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        summary = json.loads(proc.stdout.strip().splitlines()[-1])
        viols = pq.read_table(str(ckdir / "violations")).to_pandas()
        outs.append(
            (
                summary["passed"],
                summary["failed"],
                summary["violations_by_check"],
                sorted(map(tuple, viols[["key", "check"]].values)),
            )
        )
    assert outs[0] == outs[1]


def test_verdict_diff_flags_flips_and_deltas(tmp_path):
    """verdict_diff: pass->fail flips, violation-mass changes, appeared and
    removed partitions; identical stores diff to empty."""
    from audit_anomaly_detection_etl_spark.plans.checkpoint import (
        CheckpointStore,
        PartitionVerdict,
        verdict_diff,
    )

    def v(part, passed, nv, by_check):
        return PartitionVerdict(
            part=part, passed=passed, n_rows=100, n_violations=nv,
            violations_by_check=by_check, metrics={}, snapshot_id="s",
            spec_hash="h", engine_version="x", part_fingerprint="f",
        )

    a = CheckpointStore(str(tmp_path / "a"))
    b = CheckpointStore(str(tmp_path / "b"))
    a.write(v(0, True, 0, {}))                      # flips to fail in b
    b.write(v(0, False, 3, {"uniqueness": 3}))
    a.write(v(1, False, 5, {"payload_snr": 5}))     # improves but still fails
    b.write(v(1, False, 2, {"payload_snr": 2}))
    a.write(v(2, True, 0, {}))                      # unchanged
    b.write(v(2, True, 0, {}))
    a.write(v(3, True, 0, {}))                      # removed in b
    b.write(v(4, True, 0, {}))                      # new in b

    d = {r["part"]: r for r in verdict_diff(a, b)}
    assert set(d) == {0, 1, 3, 4}
    assert d[0]["status"] == "flipped_to_fail"
    assert d[0]["check_delta"] == {"uniqueness": 3}
    assert d[1]["status"] == "violations_changed"
    assert d[1]["check_delta"] == {"payload_snr": -3}
    assert d[3]["status"] == "removed"
    assert d[4]["status"] == "new"

    assert verdict_diff(a, a) == []
