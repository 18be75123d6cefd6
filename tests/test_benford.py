import math

import pytest
from pyspark.sql import Row

from audit_anomaly_detection_etl_spark.operators import benford


def _benford_share(d):
    return math.log10(1.0 + 1.0 / d)


@pytest.fixture(scope="module")
def audited(spark):
    # group "ideal": 1000 values with first-digit counts proportional to
    # Benford (rounded) -> tiny MAD, "close"
    ideal = []
    for d in range(1, 10):
        n = round(1000 * _benford_share(d))
        ideal += [Row(g="ideal", v=float(d * 11))] * n  # 11,22,...,99 -> digit d
    # group "flat": every digit equally often -> MAD ~0.0236, nonconforming
    flat = [Row(g="flat", v=float(d * 100 + 1)) for d in range(1, 10)] * 40
    # group "dirty": zeros and NULLs must be excluded from n_values
    dirty = (
        [Row(g="dirty", v=12.5)] * 3
        + [Row(g="dirty", v=0.0), Row(g="dirty", v=0.0), Row(g="dirty", v=None)]
    )
    df = spark.createDataFrame(ideal + flat + dirty, "g string, v double")
    out = benford.benford_audit(df, "v", ["g"])
    return {r["g"]: r for r in out.collect()}


def _exact_mad(counts):
    nt = sum(counts.values())
    return sum(
        abs(counts.get(d, 0) / nt - _benford_share(d)) for d in range(1, 10)
    ) / 9.0


def test_ideal_group_is_close(audited):
    r = audited["ideal"]
    counts = {d: round(1000 * _benford_share(d)) for d in range(1, 10)}
    assert r["n_values"] == sum(counts.values())
    assert r["mad"] == pytest.approx(_exact_mad(counts), abs=5e-7)
    assert r["conformity"] == "close"


def test_flat_group_nonconforming(audited):
    r = audited["flat"]
    assert r["n_values"] == 360
    counts = {d: 40 for d in range(1, 10)}
    assert r["mad"] == pytest.approx(_exact_mad(counts), abs=5e-7)
    assert r["conformity"] == "nonconforming"
    # chi2 for uniform-vs-Benford: sum (40 - 360*p_d)^2 / (360*p_d)
    chi2 = sum(
        (40 - 360 * _benford_share(d)) ** 2 / (360 * _benford_share(d))
        for d in range(1, 10)
    )
    assert r["chi2"] == pytest.approx(chi2, abs=5e-7)


def test_zero_and_null_values_excluded(audited):
    r = audited["dirty"]
    # only the three 12.5 rows carry a first significant digit (digit 1);
    # 0.0 strips to no [1-9] char, NULL is filtered
    assert r["n_values"] == 3
    counts = {1: 3}
    assert r["mad"] == pytest.approx(_exact_mad(counts), abs=5e-7)


def test_digit_extraction_is_string_exact(spark):
    # values that straddle power-of-ten boundaries where float log10
    # binning can mis-assign: 999.999, 1000.0, 0.0001, negative sign
    df = spark.createDataFrame(
        [
            Row(g="x", v=999.999),
            Row(g="x", v=1000.0),
            Row(g="x", v=0.0001),
            Row(g="x", v=-2.5),
        ],
        "g string, v double",
    )
    out = benford.benford_audit(df, "v", ["g"]).collect()[0]
    # digits: 9, 1, 1, 2 -> all four rows counted
    assert out["n_values"] == 4
    counts = {9: 1, 1: 2, 2: 1}
    assert out["mad"] == pytest.approx(_exact_mad(counts), abs=5e-7)
