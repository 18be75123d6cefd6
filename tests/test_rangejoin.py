"""Bucketed interval join (operators/rangejoin.py): containment semantics,
bin-boundary correctness, no duplicate pairs, left mode."""

from pyspark.sql import functions as F

from audit_anomaly_detection_etl_spark.operators import rangejoin


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pid string, k string, ts double")


def _ivs(spark, rows):
    return spark.createDataFrame(rows, "k string, s double, e double")


def test_containment_inclusive_and_cross_bin(spark):
    # bin_width 10: interval [5, 25] covers bins 0,1,2
    pts = _pts(spark, [("p1", "a", 5.0), ("p2", "a", 15.0), ("p3", "a", 25.0),
                       ("p4", "a", 25.001), ("p5", "a", 4.999)])
    ivs = _ivs(spark, [("a", 5.0, 25.0)])
    out = rangejoin.interval_join(pts, ivs, "ts", "s", "e", by="k", bin_width=10.0)
    assert sorted(r["pid"] for r in out.collect()) == ["p1", "p2", "p3"]


def test_no_duplicate_pairs_despite_multi_bin_interval(spark):
    pts = _pts(spark, [("p1", "a", 50.0)])
    ivs = _ivs(spark, [("a", 0.0, 100.0)])  # covers 11 bins at width 10
    out = rangejoin.interval_join(pts, ivs, "ts", "s", "e", by="k", bin_width=10.0)
    assert out.count() == 1


def test_overlapping_intervals_all_match(spark):
    pts = _pts(spark, [("p1", "a", 10.0)])
    ivs = _ivs(spark, [("a", 0.0, 20.0), ("a", 5.0, 15.0), ("a", 11.0, 20.0)])
    out = rangejoin.interval_join(pts, ivs, "ts", "s", "e", by="k", bin_width=7.0)
    assert out.count() == 2  # third interval starts after the point


def test_key_isolation(spark):
    pts = _pts(spark, [("p1", "b", 10.0)])
    ivs = _ivs(spark, [("a", 0.0, 20.0)])
    assert rangejoin.interval_join(pts, ivs, "ts", "s", "e", by="k").count() == 0


def test_left_mode_keeps_unmatched(spark):
    pts = _pts(spark, [("p1", "a", 10.0), ("p2", "a", 99.0)])
    ivs = _ivs(spark, [("a", 0.0, 20.0)])
    out = rangejoin.interval_join(pts, ivs, "ts", "s", "e", by="k",
                                  bin_width=10.0, how="left")
    got = {r["pid"]: r for r in out.collect()}
    assert got["p1"]["s"] == 0.0
    assert got["p2"]["s"] is None and out.count() == 2


def test_left_mode_null_column_not_duplicated(spark):
    # regression: a MATCHED point carrying a NULL column must not also be
    # re-emitted through the unmatched branch (null-unsafe anti-join bug)
    pts = spark.createDataFrame(
        [("p1", None, "a", 10.0), ("p2", None, "a", 99.0)],
        "pid string, extra string, k string, ts double",
    )
    ivs = _ivs(spark, [("a", 0.0, 20.0)])
    out = rangejoin.interval_join(pts, ivs, "ts", "s", "e", by="k",
                                  bin_width=10.0, how="left")
    rows = out.collect()
    assert len(rows) == 2
    got = {r["pid"]: r for r in rows}
    assert got["p1"]["s"] == 0.0 and got["p2"]["s"] is None


def test_left_mode_duplicate_point_rows_kept_per_row(spark):
    # two IDENTICAL unmatched point rows both survive the left path
    pts = _pts(spark, [("p1", "a", 99.0), ("p1", "a", 99.0)])
    ivs = _ivs(spark, [("a", 0.0, 20.0)])
    out = rangejoin.interval_join(pts, ivs, "ts", "s", "e", by="k",
                                  bin_width=10.0, how="left")
    assert out.count() == 2


def test_matches_plain_inequality_join(spark):
    import random

    rnd = random.Random(7)
    pts = _pts(spark, [(f"p{i}", rnd.choice("ab"), rnd.uniform(0, 100)) for i in range(200)])
    ivs = _ivs(spark, [])
    iv_rows = []
    for i in range(20):
        s = rnd.uniform(0, 90)
        iv_rows.append((rnd.choice("ab"), s, s + rnd.uniform(1, 30)))
    ivs = _ivs(spark, iv_rows)
    fast = rangejoin.interval_join(pts, ivs, "ts", "s", "e", by="k", bin_width=13.0)
    slow = pts.join(
        ivs, (pts["k"] == ivs["k"]) & (pts["ts"] >= ivs["s"]) & (pts["ts"] <= ivs["e"])
    ).select(pts["pid"], ivs["s"])
    a = sorted((r["pid"], r["s"]) for r in fast.select("pid", "s").collect())
    b = sorted((r["pid"], r["s"]) for r in slow.collect())
    assert a == b and len(a) > 0
