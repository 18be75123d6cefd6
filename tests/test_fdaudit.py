import pytest
from pyspark.sql import Row

from audit_anomaly_detection_etl_spark.operators import fdaudit


@pytest.fixture(scope="module")
def audited(spark):
    rows = (
        # perfect FD: pcm16 -> 16000
        [Row(codec="pcm16", sr=16000)] * 5
        # broken FD: ulaw mostly 8000, two deviants
        + [Row(codec="ulaw", sr=8000)] * 6
        + [Row(codec="ulaw", sr=16000), Row(codec="ulaw", sr=44100)]
        # tie: two values x2 each -> dominant must be the MIN rhs ('22050' < '8000' lexically... use ints)
        + [Row(codec="alaw", sr=8000)] * 2
        + [Row(codec="alaw", sr=22050)] * 2
        # null pollution: dominant is a real value, nulls count as violations
        + [Row(codec="g722", sr=48000)] * 3
        + [Row(codec="g722", sr=None)]
        # all-null group: dominant_rhs is NULL but the group is single-valued
        + [Row(codec="opus", sr=None)] * 2
    )
    df = spark.createDataFrame(rows, "codec string, sr int")
    out = fdaudit.fd_audit(df, ["codec"], "sr")
    return {r["codec"]: r for r in out.collect()}


def test_perfect_fd(audited):
    r = audited["pcm16"]
    assert r["fd_holds"] and r["conformance"] == 1.0
    assert r["dominant_rhs"] == "16000" and r["n_violations"] == 0


def test_broken_fd_counts_deviants(audited):
    r = audited["ulaw"]
    assert not r["fd_holds"] and r["n_rhs_values"] == 3
    assert r["dominant_rhs"] == "8000" and r["n_violations"] == 2
    assert r["conformance"] == 0.75


def test_tie_breaks_to_min_rhs(audited):
    r = audited["alaw"]
    # '22050' < '8000' lexicographically — deterministic across engines
    assert r["dominant_rhs"] == "22050" and r["n_violations"] == 2


def test_nulls_count_as_violating_value(audited):
    r = audited["g722"]
    assert r["dominant_rhs"] == "48000" and r["n_violations"] == 1
    assert r["n_rhs_values"] == 2 and not r["fd_holds"]


def test_all_null_group_is_single_valued(audited):
    r = audited["opus"]
    assert r["dominant_rhs"] is None and r["fd_holds"]
    assert r["n_violations"] == 0 and r["conformance"] == 1.0
