"""payload_sample cost tier: the reference-comparison (decode) pass runs on
a deterministic key-hash sample; everything else keeps full coverage."""

import os

import pytest

from audit_anomaly_detection_etl_spark.plans.runner import run_suite
from audit_anomaly_detection_etl_spark.plans.spec import SuiteSpec, spec_from_dict

PAYLOAD_CHECKS = {
    "codec", "payload_snr", "dur_mismatch", "transcript_null",
    "transcript_mismatch",
}


def _by_check(res) -> dict:
    out: dict = {}
    for v in res.verdicts.values():
        for c, n in v.violations_by_check.items():
            out[c] = out.get(c, 0) + n
    return out


def _run(spark, clip_dir, ckdir, sample):
    spec = SuiteSpec(
        checks=("payload",), payload_sample=sample, key_partitioned=True
    )
    return run_suite(
        spark,
        clips_root=os.path.join(clip_dir, "clips"),
        ref_root=os.path.join(clip_dir, "clips_ref"),
        hist_ref_path=None,
        checkpoint_dir=str(ckdir),
        spec=spec,
    )


def test_full_sample_equals_unsampled(spark, clip_dir, tmp_path):
    base = _by_check(_run(spark, clip_dir, tmp_path / "a", None))
    full = _by_check(_run(spark, clip_dir, tmp_path / "b", (1.0, "s")))
    assert base == full and sum(base.values()) > 0


def test_sample_is_deterministic_subset(spark, clip_dir, tmp_path):
    base = _by_check(_run(spark, clip_dir, tmp_path / "a", None))
    half1 = _by_check(_run(spark, clip_dir, tmp_path / "c", (0.5, "s1")))
    half2 = _by_check(_run(spark, clip_dir, tmp_path / "d", (0.5, "s1")))
    assert half1 == half2  # same salt -> identical evidence basis
    assert sum(half1.values()) < sum(base.values())
    assert all(half1.get(c, 0) <= base.get(c, 0) for c in base)
    assert set(half1) <= PAYLOAD_CHECKS


def test_different_salts_cover_different_keys(spark, clip_dir, tmp_path):
    import pyspark.sql.functions as F

    clips = spark.read.parquet(os.path.join(clip_dir, "clips"))

    def keys(salt):
        return {
            r["clip_id"]
            for r in clips.where(
                F.pmod(F.xxhash64(F.concat(F.col("clip_id"), F.lit(salt))), F.lit(10**6))
                < F.lit(500_000)
            ).collect()
        }

    a, b = keys("s1"), keys("s2")
    union = a | b
    assert len(a) == pytest.approx(clips.count() * 0.5, rel=0.15)
    # rotating the salt sweeps coverage: two half-samples cover ~75%
    assert len(union) > len(a) * 1.3


def test_sample_is_part_of_spec_hash_and_loader():
    s0 = SuiteSpec().spec_hash()
    s1 = SuiteSpec(payload_sample=(0.1, "a")).spec_hash()
    s2 = SuiteSpec(payload_sample=(0.1, "b")).spec_hash()
    assert len({s0, s1, s2}) == 3  # fraction/salt are lineage

    spec = spec_from_dict({"payload_sample": [0.25, "epoch-3"]})
    assert spec.payload_sample == (0.25, "epoch-3")
    assert spec_from_dict({"payload_sample": None}).payload_sample is None
    with pytest.raises(ValueError):
        spec_from_dict({"payload_sample": [1.5, "x"]})
    with pytest.raises(ValueError):
        spec_from_dict({"payload_sample": [0.5]})
