"""Backward as-of join (operators/asof.py): inclusive ties, no-prior rows,
tolerance, multi-key isolation."""

from audit_anomaly_detection_etl_spark.operators import asof


def _mk(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_basic_backward_match_and_nulls(spark):
    left = _mk(spark, [("a", 5.0, "x1"), ("a", 1.0, "x0"), ("b", 9.0, "y0")],
               "k string, ts double, payload string")
    right = _mk(spark, [("a", 2.0, 10.0), ("a", 4.0, 20.0), ("b", 99.0, 30.0)],
                "k string, ts double, snap double")
    out = {(r["k"], r["ts"]): r for r in asof.asof_join(left, right, on="ts", by="k").collect()}
    assert out[("a", 5.0)]["r_ts"] == 4.0 and out[("a", 5.0)]["r_snap"] == 20.0
    assert out[("a", 1.0)]["r_ts"] is None  # before any right row
    assert out[("b", 9.0)]["r_ts"] is None  # right row is in the future


def test_equal_ts_is_inclusive(spark):
    left = _mk(spark, [("a", 3.0, "x")], "k string, ts double, payload string")
    right = _mk(spark, [("a", 3.0, 7.0)], "k string, ts double, snap double")
    r = asof.asof_join(left, right, on="ts", by="k").collect()[0]
    assert r["r_ts"] == 3.0 and r["r_snap"] == 7.0


def test_tolerance_voids_stale_matches(spark):
    left = _mk(spark, [("a", 10.0, "x"), ("a", 20.0, "y")],
               "k string, ts double, payload string")
    right = _mk(spark, [("a", 9.0, 1.0)], "k string, ts double, snap double")
    out = {r["ts"]: r for r in
           asof.asof_join(left, right, on="ts", by="k", tolerance=5.0).collect()}
    assert out[10.0]["r_snap"] == 1.0      # 1s old: within tolerance
    assert out[20.0]["r_snap"] is None     # 11s old: voided


def test_tolerance_on_timestamp_column(spark):
    # regression: interval-vs-double comparison failed analysis for
    # timestamp ordering columns; tolerance is SECONDS there
    from datetime import datetime

    t = datetime(2026, 1, 1, 12, 0)

    def at(s):
        return t.replace(minute=s // 60, second=s % 60)

    left = _mk(spark, [("a", at(10), "x"), ("a", at(20), "y")],
               "k string, ts timestamp, payload string")
    right = _mk(spark, [("a", at(9), 1.0)], "k string, ts timestamp, snap double")
    out = {r["payload"]: r for r in
           asof.asof_join(left, right, on="ts", by="k", tolerance=5.0).collect()}
    assert out["x"]["r_snap"] == 1.0       # 1 s old: within tolerance
    assert out["y"]["r_snap"] is None      # 11 s old: voided


def test_keys_do_not_leak(spark):
    left = _mk(spark, [("a", 5.0, "x"), ("b", 5.0, "y")],
               "k string, ts double, payload string")
    right = _mk(spark, [("a", 1.0, 1.0)], "k string, ts double, snap double")
    out = {r["k"]: r for r in asof.asof_join(left, right, on="ts", by="k").collect()}
    assert out["a"]["r_snap"] == 1.0
    assert out["b"]["r_snap"] is None


def test_left_columns_and_row_count_preserved(spark):
    left = _mk(spark, [("a", float(i), f"p{i}") for i in range(10)],
               "k string, ts double, payload string")
    right = _mk(spark, [("a", 3.5, 42.0)], "k string, ts double, snap double")
    out = asof.asof_join(left, right, on="ts", by="k")
    assert out.count() == 10
    assert set(["k", "ts", "payload", "r_ts", "r_snap"]) == set(out.columns)
    matched = [r for r in out.collect() if r["r_snap"] is not None]
    assert sorted(r["ts"] for r in matched) == [4.0, 5.0, 6.0, 7.0, 8.0, 9.0]
