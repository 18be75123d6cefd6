"""Constraint suggestion (operators/profiler.py): profile -> suggested spec
-> re-applying the spec to the profiled data yields zero violations (the
closure property), and planted out-of-profile rows ARE flagged by it."""

import pytest
from pyspark.sql import functions as F

from audit_anomaly_detection_etl_spark.operators import profiler, schema_check


@pytest.fixture(scope="module")
def clips(spark, clip_dir):
    return spark.read.parquet(f"{clip_dir}/clips")


PROFILE_COLS = ["clip_id", "sr_hz", "dur_ms", "codec", "transcript"]


@pytest.fixture(scope="module")
def profile(clips):
    return profiler.suggest_constraints(
        clips, PROFILE_COLS, value_cols=("codec",)
    ).collect()


def test_profile_shape_and_flags(profile, clips):
    by_col = {r["col"]: r for r in profile}
    assert set(by_col) == set(PROFILE_COLS)
    n = clips.count()
    assert all(r["n_rows"] == n for r in profile)
    # synth plants duplicate clip_ids, so clip_id is NOT a unique key here
    assert not by_col["clip_id"]["suggest_unique_key"]
    assert by_col["clip_id"]["suggest_not_null"]
    # codec is a small closed domain with materialized values
    assert by_col["codec"]["is_categorical"]
    vals = by_col["codec"]["allowed_csv"].split(",")
    assert vals == sorted(vals) and len(vals) == by_col["codec"]["n_distinct"]
    # numeric bounds come back as the observed extremes
    mn = clips.agg(F.min("sr_hz")).first()[0]
    mx = clips.agg(F.max("sr_hz")).first()[0]
    assert by_col["sr_hz"]["min_num"] == float(mn)
    assert by_col["sr_hz"]["max_num"] == float(mx)
    # transcript has planted NULLs -> no NOT NULL suggestion
    assert by_col["transcript"]["n_null"] > 0
    assert not by_col["transcript"]["suggest_not_null"]


def test_closure_property(profile, clips):
    """The suggested spec re-applied to the profiled data is violation-free
    BY CONSTRUCTION — any row it flags would falsify the profile."""
    spec = profiler.spec_from_suggestions(profile, key_col="clip_id")
    assert schema_check.constraint_violations(clips, spec).count() == 0


def test_suggested_spec_flags_out_of_profile_rows(profile, clips, spark):
    spec = profiler.spec_from_suggestions(profile, key_col="clip_id")
    bad = spark.createDataFrame(
        [
            ("x-null-codec", None, 16000, 1000, "t", 0),
            ("x-bad-domain", "opus", 16000, 1000, "t", 0),
            ("x-oob-sr", "pcm16", 10_000_000, 1000, "t", 0),
        ],
        "clip_id string, codec string, sr_hz int, dur_ms int, transcript string, part int",
    )
    got = {
        r["detail"]
        for r in schema_check.constraint_violations(bad, spec).collect()
    }
    assert "codec:null" in got
    assert "codec:domain" in got
    assert "sr_hz:above_max" in got


def test_value_cols_requires_profiling_gate(clips):
    # a non-string value_cols entry is a caller error, not a silent collect
    with pytest.raises(ValueError):
        profiler.suggest_constraints(clips, ["sr_hz"], value_cols=("sr_hz",))


def test_allowed_values_bounds(clips):
    vals = profiler.allowed_values(clips, "codec")
    assert vals == sorted(vals) and 1 <= len(vals) <= 20
    with pytest.raises(ValueError):
        profiler.allowed_values(clips, "clip_id", allowed_max=5)


def test_comma_values_withhold_csv(spark):
    """A categorical value containing the csv join char would split into
    phantom domain values and break the closure property — the csv is
    withheld; allowed_values stays the authoritative (list) path."""
    df = spark.createDataFrame(
        [("red,green",), ("blue",), ("red,green",)], "c string"
    )
    r = profiler.suggest_constraints(df, ["c"], value_cols=("c",)).collect()[0]
    assert r["is_categorical"] and r["allowed_csv"] is None
    assert profiler.allowed_values(df, "c") == ["blue", "red,green"]


def test_empty_table_suggests_nothing(spark):
    empty = spark.createDataFrame([], "a string, b int")
    rows = profiler.suggest_constraints(empty).collect()
    assert {r["col"] for r in rows} == {"a", "b"}
    for r in rows:
        assert r["n_rows"] == 0 and r["n_distinct"] == 0
        assert not r["suggest_not_null"] and not r["suggest_unique_key"]


def test_approx_tier_counts_within_rsd(clips):
    ex = {
        r["col"]: r["n_distinct"]
        for r in profiler.suggest_constraints(clips, ["clip_id", "codec"]).collect()
    }
    ap = {
        r["col"]: r["n_distinct"]
        for r in profiler.suggest_constraints(
            clips, ["clip_id", "codec"], exact=False, rsd=0.05
        ).collect()
    }
    for c in ex:
        assert abs(ap[c] - ex[c]) <= max(3, 0.15 * ex[c])


def test_suggestions_to_spec_doc_loads_and_widens(profile):
    from audit_anomaly_detection_etl_spark.plans.spec import spec_from_dict

    by_col = {r["col"]: r for r in profile}
    doc = profiler.suggestions_to_spec_doc(
        profile, key_col="clip_id", margin=0.1,
        values={"codec": by_col["codec"]["allowed_csv"].split(",")},
    )
    spec = spec_from_dict(doc)  # the written file must always load
    cols = {c.name: c for c in spec.schema_spec.columns}
    assert spec.schema_spec.key_col == "clip_id"
    assert "part" not in cols
    assert cols["codec"].allowed == by_col["codec"]["allowed_csv"].split(",")
    # margin widens the observed range by 10% of the range on each side
    lo, hi = by_col["sr_hz"]["min_num"], by_col["sr_hz"]["max_num"]
    assert cols["sr_hz"].min_value == pytest.approx(lo - 0.1 * (hi - lo))
    assert cols["sr_hz"].max_value == pytest.approx(hi + 0.1 * (hi - lo))
    assert cols["transcript"].nullable  # planted NULLs -> stays nullable


def test_suggestions_to_spec_doc_requires_key(profile):
    # synth plants duplicate clip_ids, so nothing is suggested as a key
    with pytest.raises(ValueError):
        profiler.suggestions_to_spec_doc(profile)


def test_suggest_spec_job_end_to_end(clip_dir, tmp_path):
    """jobs/suggest_spec.py writes a spec file that jobs/validate.py --spec
    runs cleanly: the schema_constraint family is empty by construction on
    the profiled data (domain/range/null suggestions describe it exactly)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec_path = str(tmp_path / "spec.json")
    r = subprocess.run(
        [
            sys.executable, os.path.join(repo, "jobs", "suggest_spec.py"),
            "--data", f"{clip_dir}/clips", "--out", spec_path,
            "--key-col", "clip_id", "--master", "local[4]",
        ],
        capture_output=True, text=True, check=True,
    )
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["key_col"] == "clip_id" and summary["n_columns"] >= 5
    v = subprocess.run(
        [
            sys.executable, os.path.join(repo, "jobs", "validate.py"),
            "--data", f"{clip_dir}/clips", "--ref", f"{clip_dir}/clips_ref",
            "--hist-ref", f"{clip_dir}/hist_ref.parquet",
            "--spec", spec_path, "--checkpoint", str(tmp_path / "ck"),
            "--master", "local[4]",
        ],
        capture_output=True, text=True, check=True,
    )
    out = json.loads(v.stdout.strip().splitlines()[-1])
    assert "schema_constraint" not in out["violations_by_check"]
    # the content checks still fire on the planted corruption
    assert out["violations_by_check"].get("uniqueness", 0) > 0
