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
