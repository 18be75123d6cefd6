"""Semantic oracle for operators/drift.wasserstein_drift: a numpy
re-computation of binned W1 on a synthetic corpus where one day's
distribution is mean-shifted — that day (and only that day) must flag."""

import datetime as dt

import numpy as np
import pytest

from audit_anomaly_detection_etl_spark.operators import drift


def _w1_numpy(day_counts, global_counts, width):
    p = day_counts / day_counts.sum()
    q = global_counts / global_counts.sum()
    return width * np.abs(np.cumsum(p) - np.cumsum(q)).sum()


@pytest.fixture(scope="module")
def shifted_df(spark):
    rng = np.random.default_rng(7)
    rows = []
    for day in range(4):
        base = dt.datetime(2024, 3, 1 + day)
        # days 0-2: values ~ N(40, 8); day 3: shifted to N(80, 8)
        mu = 80.0 if day == 3 else 40.0
        for i, v in enumerate(rng.normal(mu, 8.0, size=500)):
            rows.append((base + dt.timedelta(seconds=i), float(np.clip(v, 0, 120))))
    return spark.createDataFrame(rows, "ts timestamp, value double")


def test_w1_matches_numpy_and_flags_shifted_day(shifted_df):
    spec = drift.BinSpec("value", 0.0, 120.0, 24)
    out = drift.wasserstein_drift(shifted_df, spec, w1_norm_threshold=0.10)
    got = {r["window_start"].day: r for r in out.collect()}
    assert len(got) == 4

    # numpy oracle from the same binning
    pdf = shifted_df.toPandas()
    pdf["day"] = pdf["ts"].dt.day
    width = 120.0 / 24
    bins = np.clip(np.floor(pdf["value"] / width).astype(int), 0, 23)
    glob = np.bincount(bins, minlength=24).astype(float)
    for day, g in pdf.groupby("day"):
        dc = np.bincount(bins[g.index], minlength=24).astype(float)
        want = _w1_numpy(dc, glob, width)
        assert got[day]["w1"] == pytest.approx(want, abs=1e-5)
        assert got[day]["n_values"] == 500

    # only the shifted day crosses the 10%-of-range transport threshold
    assert got[4]["drifted"] is True
    assert all(got[d]["drifted"] is False for d in (1, 2, 3))
    # shifted day moved ~3/4 of its mass by ~40 units => w1 ~ 30
    assert got[4]["w1"] > 20.0


def test_novel_categories_exact_set_difference(spark):
    """Planted dictionary diff: tiny novel value surfaces regardless of
    mass; vanished value reported with its reference count; shared values
    silent."""
    ref = spark.createDataFrame(
        [("click",)] * 500 + [("view",)] * 300 + [("legacy",)] * 7,
        "event_type string",
    )
    cur = spark.createDataFrame(
        [("click",)] * 480 + [("view",)] * 310 + [("beta_feature",)] * 1,
        "event_type string",
    )
    out = {
        r["category"]: r
        for r in drift.novel_categories(cur, ref, "event_type").collect()
    }
    assert set(out) == {"beta_feature", "legacy"}
    assert out["beta_feature"]["status"] == "novel"
    assert out["beta_feature"]["n_cur"] == 1 and out["beta_feature"]["n_ref"] == 0
    assert out["legacy"]["status"] == "vanished"
    assert out["legacy"]["n_ref"] == 7 and out["legacy"]["n_cur"] == 0


def test_cusum_detects_planted_level_shift(spark):
    """Daily counts with a +30% mean shift halfway: CUSUM crosses the
    threshold after the shift while no single day is a spike; a stable
    series never flags."""
    import datetime as dt

    import __spark_entry__ as e

    def mk(counts):
        rows = []
        for d, n in enumerate(counts):
            base = dt.datetime(2024, 1, 1 + d)
            rows += [(base + dt.timedelta(seconds=i),) for i in range(n)]
        return spark.createDataFrame(rows, "ts timestamp")

    # stable ~100/day with mild noise
    stable = [100, 102, 98, 101, 99, 100, 103, 97, 100, 101] * 2
    # shifted: same first half, then sustained 130/day
    shifted = stable[:10] + [130, 128, 131, 129, 132, 130, 127, 133, 130, 129]

    q = e.queries()["q118_cusum_changepoint"]

    import tempfile

    for name, counts, expect in (("stable", stable, False), ("shift", shifted, True)):
        d = tempfile.mkdtemp(prefix=f"cusum_{name}_")
        mk(counts).write.mode("overwrite").parquet(f"{d}/events.parquet")
        rows = sorted(q(spark, d).collect(), key=lambda r: r["day"])
        flagged = any(r["level_shift"] for r in rows)
        assert flagged is expect, (name, [r["cusum"] for r in rows])
        if expect:
            # global-mean CUSUM peaks AT the changepoint (the pre-shift half
            # drifts negative, the post-shift half climbs back): the max
            # |cusum| day localizes the shift boundary
            peak = max(range(len(rows)), key=lambda i: abs(rows[i]["cusum"]))
            assert abs(peak - 9) <= 1, peak
