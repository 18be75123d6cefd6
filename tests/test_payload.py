"""Payload validation (Arrow-batched decode) vs the generator's expected violations."""

import os

import pyarrow.parquet as pq
import pytest

from audit_anomaly_detection_etl_spark.operators import payload


@pytest.fixture(scope="module")
def report(spark, clip_dir):
    clips = spark.read.parquet(os.path.join(clip_dir, "clips"))
    ref = spark.read.parquet(os.path.join(clip_dir, "clips_ref"))
    return payload.payload_report(clips, ref).cache()


@pytest.fixture(scope="module")
def expected(clip_dir):
    return pq.read_table(os.path.join(clip_dir, "violations_expected.parquet")).to_pandas()


def test_report_covers_every_clip(spark, clip_dir, report):
    clips = spark.read.parquet(os.path.join(clip_dir, "clips"))
    assert report.count() == clips.count()


def test_violations_match_expected_exactly(report, expected):
    """Violation rows exactly match the generator sidecar — the parity
    requirement from BASELINE.json (violation rows 'exactly match the
    reference ETL's anomaly-flag outputs', here vs the synthesized oracle).
    """
    v = payload.payload_violations(report).toPandas()
    got = set(zip(v.key, v.check))
    exp = set(
        zip(expected.clip_id, expected.check)
    ) - {
        (c, k)
        for c, k in zip(expected.clip_id, expected.check)
        if k in ("uniqueness", "referential_missing_ref", "referential_orphan_ref")
    }
    # payload checks cover codec/snr/dur/transcript families
    payload_checks = {"codec", "payload_snr", "transcript_null", "transcript_mismatch"}
    assert {k for _, k in got} <= payload_checks | {"dur_mismatch"}
    assert got == {(c, k) for c, k in exp if k in payload_checks}


def test_snr_present_for_clean_rows(report):
    r = report.toPandas()
    clean = r[r.decode_ok & r.has_ref]
    assert (clean.snr_db.notna()).all()
    assert (clean[clean.transcript_ok].snr_db >= 30.0).mean() > 0.97


def test_severity_ranking(report):
    from pyspark.sql import functions as F

    v = payload.payload_violations(report)
    ranked = v.orderBy(F.desc("severity"), "key").toPandas()
    if len(ranked):
        assert ranked.severity.is_monotonic_decreasing
