"""mixed_unit_audit: exact decade semantics and the gap rule on crafted
data — a clean unimodal group, a seconds-vs-milliseconds group, and the
boundary cases (subunit decade -1, contiguous heavy run, single decade)."""

from pyspark.sql import functions as F

from audit_anomaly_detection_etl_spark.operators import column_stats as CS


def _rows():
    rows = []
    # clean: 100 values in decades 1-2 (10..299)
    rows += [("clean", float(10 + i * 2.9)) for i in range(100)]
    # mixed: 80 values at seconds scale (1-9), 20 at milliseconds (1000-9000)
    rows += [("mixed", float(1 + (i % 9))) for i in range(80)]
    rows += [("mixed", float(1000 * (1 + (i % 9)))) for i in range(20)]
    # subunit: all in (0,1) -> single decade -1, never flagged
    rows += [("subunit", 0.01 * (1 + i)) for i in range(50)]
    # trace: decades 0..5 each heavy and contiguous -> gaps of 1, no flag
    for d in range(6):
        rows += [("ramp", float(10**d) * 1.5)] * 10
    # nulls / non-positive are excluded from n_pos
    rows += [("mixed", None), ("mixed", -5.0), ("mixed", 0.0)]
    return rows


def test_gap_rule_and_decades(spark):
    df = spark.createDataFrame(_rows(), "grp string, v double")
    out = {r["grp"]: r for r in CS.mixed_unit_audit(df, "v", "grp").collect()}

    assert out["clean"]["mixed_units"] is False
    assert out["clean"]["heavy_decades"] == "1,2"

    m = out["mixed"]
    assert m["mixed_units"] is True
    assert m["heavy_decades"] == "0,3"
    assert m["max_gap"] == 3
    assert m["n_pos"] == 100  # null/-5/0 excluded

    assert out["subunit"]["heavy_decades"] == "-1"
    assert out["subunit"]["mixed_units"] is False

    r = out["ramp"]
    assert r["heavy_decades"] == "0,1,2,3,4,5"
    assert r["max_gap"] == 1 and r["mixed_units"] is False


def test_heavy_share_threshold(spark):
    # 96% in decade 1, 4% in decade 5: the far cluster is sub-threshold
    rows = [("g", 10.0)] * 96 + [("g", 100000.0)] * 4
    df = spark.createDataFrame(rows, "grp string, v double")
    out = CS.mixed_unit_audit(df, "v", "grp").collect()[0]
    assert out["heavy_decades"] == "1" and out["mixed_units"] is False
    # at a 3% threshold the same data flags
    out2 = CS.mixed_unit_audit(df, "v", "grp", heavy_share=0.03).collect()[0]
    assert out2["mixed_units"] is True and out2["max_gap"] == 4


def test_windows_are_partitioned(spark):
    """Scale contract: both windows run over the decade-grain aggregate
    PARTITIONED by group — no unpartitioned WindowExec anywhere."""
    df = spark.createDataFrame([("g", 1.0)], "grp string, v double")
    plan = (
        CS.mixed_unit_audit(df, "v", "grp")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert m.group(1), "unpartitioned window found:\n" + plan


def test_overflow_decade_is_safe_and_flags(spark):
    """Values >= 1e15 (incl. past 2^63, where Spark's floor->long saturates
    and a bigint cast would throw in the oracle engine) land in the terminal
    overflow decade 15 and still flag against a sane cluster."""
    rows = [("g", 10.0)] * 50 + [("g", 9.3e18)] * 30 + [("g", 1e25)] * 20
    df = spark.createDataFrame(rows, "grp string, v double")
    out = CS.mixed_unit_audit(df, "v", "grp").collect()[0]
    assert out["heavy_decades"] == "1,15"
    assert out["mixed_units"] is True and out["max_gap"] == 14


# ---------------------------------------------------------------------------
# granularity_audit (q137): producer-quantization semantics
# ---------------------------------------------------------------------------


def test_granularity_verdicts_exact(spark):
    rows = []
    # unit grain: 1..200 -> 10% mult10, 2% mult100
    rows += [("unit", i) for i in range(1, 201)]
    # quantized to 100s: 100..9900
    rows += [("q100", 100 * i) for i in range(1, 100)]
    # quantized to 10s with 1% stragglers allowed under the 990000 ppm bar:
    # 199 multiples of 10 + 1 odd value = 99.5% >= 99.0%
    rows += [("q10", 10 * i) for i in range(1, 200)] + [("q10", 7)]
    # constant column: multiple of its own divisors at every matching grain
    rows += [("const", 5000)] * 50
    # negatives quantize by |x|
    rows += [("neg", -1000 * i) for i in range(1, 40)]
    rows += [("unit", None)]  # nulls excluded
    df = spark.createDataFrame(rows, "grp string, v long")
    out = {r["grp"]: r for r in CS.granularity_audit(df, "v", "grp").collect()}

    assert out["unit"]["granularity"] == "unit"
    assert out["unit"]["n"] == 200
    assert out["unit"]["ppm_mult_10"] == 100_000  # exactly 20/200
    assert out["q100"]["granularity"] == "quantized_100"
    assert out["q100"]["n_res_100"] == 1
    assert out["q10"]["granularity"] == "quantized_10"
    assert out["q10"]["ppm_mult_10"] == 995_000
    assert out["const"]["granularity"] == "quantized_1000"
    assert out["neg"]["granularity"] == "quantized_1000"


def test_granularity_threshold_knob(spark):
    # 9 of 10 values are multiples of 10: flagged at 900000 ppm, not at default
    rows = [("g", 10 * i) for i in range(1, 10)] + [("g", 3)]
    df = spark.createDataFrame(rows, "grp string, v long")
    strict = CS.granularity_audit(df, "v", "grp").collect()[0]
    loose = CS.granularity_audit(df, "v", "grp", quantized_share_ppm=900_000).collect()[0]
    assert strict["granularity"] == "unit"
    assert loose["granularity"] == "quantized_10"
