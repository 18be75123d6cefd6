"""Quarantine sink (plans/runner.quarantine_rows + jobs/validate.py
--quarantine): full violating rows with per-key violation summaries — the
subtract-from-training table. Exact oracle: the quarantined key set must be
precisely the violation keys that exist in the clips table, duplicates
included, with checks/max_severity consistent with the violation rows."""

import os

from audit_anomaly_detection_etl_spark.plans.runner import (
    quarantine_rows,
    ranked_violations,
    run_suite,
)


def test_quarantine_rows_exactly_cover_violating_clip_rows(spark, clip_dir, tmp_path):
    res = run_suite(
        spark,
        clips_root=os.path.join(clip_dir, "clips"),
        ref_root=os.path.join(clip_dir, "clips_ref"),
        hist_ref_path=os.path.join(clip_dir, "hist_ref.parquet"),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    clips = spark.read.parquet(os.path.join(clip_dir, "clips"))
    v = ranked_violations(spark, res.violations_path).toPandas()
    q = quarantine_rows(clips, spark.read.parquet(res.violations_path)).toPandas()

    clip_keys = {r["clip_id"] for r in clips.select("clip_id").collect()}
    expected_keys = set(v.key) & clip_keys  # ghost refs have no clip row
    assert set(q.clip_id) == expected_keys

    # duplicates fan out: every detail copy of a violating key is quarantined
    from collections import Counter

    detail_mult = Counter(r["clip_id"] for r in clips.select("clip_id").collect())
    got_mult = Counter(q.clip_id)
    for k in expected_keys:
        assert got_mult[k] == detail_mult[k], k

    # per-key summary agrees with the violation rows
    by_key = v[v.key.isin(expected_keys)].groupby("key")
    exp_checks = by_key.check.apply(lambda s: sorted(set(s))).to_dict()
    exp_sev = by_key.severity.max().to_dict()
    exp_n = by_key.size().to_dict()
    for _, row in q.drop_duplicates("clip_id").iterrows():
        assert list(row["checks"]) == exp_checks[row["clip_id"]]
        assert row["max_severity"] == exp_sev[row["clip_id"]]
        assert row["n_violations"] == exp_n[row["clip_id"]]

    # full payload rides along: the original columns are present
    assert {"bytes", "sr_hz", "dur_ms", "codec", "transcript"} <= set(q.columns)


def test_quarantine_cli_writes_partitioned_table(spark, tmp_path):
    """End-to-end through the job entry: --quarantine writes a part-
    partitioned parquet table whose count lands in the summary."""
    import jobs.validate as job

    ck = str(tmp_path / "ck")
    qdir = str(tmp_path / "quar")
    summary = job.main(
        ["--synth", "400", "--checkpoint", ck, "--quarantine", qdir, "--top", "1"]
    )
    assert summary["quarantined_rows"] is not None and summary["quarantined_rows"] > 0
    back = spark.read.parquet(qdir)
    assert back.count() == summary["quarantined_rows"]
    assert "part" in back.columns and "checks" in back.columns


def test_quarantine_with_custom_part_col(spark):
    """quarantine_rows with a non-default part_col: the violations frame
    always names its partition column 'part' (VIOLATION_SCHEMA); part_col
    applies only to the clips side of the join."""
    clips = spark.createDataFrame(
        [("a", 0, b"x"), ("b", 1, b"y"), ("c", 0, b"z")],
        "clip_id string, pt int, bytes binary",
    )
    viols = spark.createDataFrame(
        [("a", "uniqueness", "dup", 0, 4.0), ("a", "codec", "bad", 0, 5.0)],
        "key string, check string, detail string, part int, severity double",
    )
    out = quarantine_rows(clips, viols, key_col="clip_id", part_col="pt").collect()
    assert len(out) == 1
    r = out[0]
    assert r["clip_id"] == "a" and r["pt"] == 0
    assert r["checks"] == ["codec", "uniqueness"]
    assert r["max_severity"] == 5.0 and r["n_violations"] == 2


def test_quarantine_empty_violations_is_empty(spark):
    clips = spark.createDataFrame(
        [("a", 0, b"x")], "clip_id string, part int, bytes binary"
    )
    viols = spark.createDataFrame(
        [], "key string, check string, detail string, part int, severity double"
    )
    assert quarantine_rows(clips, viols).count() == 0


def test_quarantine_cap_saturation_is_surfaced(spark, tmp_path):
    """With the violations sink capped below a series' exact count, the
    quarantine key set is incomplete — the summary must say so instead of
    silently under-quarantining (the cap keeps example rows; verdict counts
    stay exact, so saturation is exactly detectable)."""
    import json

    import jobs.validate as job

    spec_path = str(tmp_path / "spec.json")
    with open(spec_path, "w") as f:
        json.dump({"max_violation_rows_per_check": 1}, f)
    summary = job.main(
        [
            "--synth", "400", "--checkpoint", str(tmp_path / "ck"),
            "--quarantine", str(tmp_path / "quar"), "--spec", spec_path,
            "--top", "1",
        ]
    )
    assert summary["quarantine_complete"] is False
    sat = summary["capped_violation_series"]
    assert sat and all(s["n_violations"] > 1 for s in sat)
