import datetime as dt
import os

import numpy as np
import pytest
from pyspark.sql import Row

from audit_anomaly_detection_etl_spark.functions import stats as stats_k
from audit_anomaly_detection_etl_spark.operators.drift import BinSpec
from audit_anomaly_detection_etl_spark.streaming import drift_stream

SPEC = BinSpec(col="value", lo=0.0, hi=100.0, n_bins=20)
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events():
    rng = np.random.RandomState(7)
    rows = []
    # phase 1 (minutes 0-9): stable distribution, matches the reference
    for i, v in enumerate(np.clip(rng.normal(50, 5, 400), 0, 99.9)):
        rows.append(Row(ts=T0 + dt.timedelta(seconds=(i % 600)), value=float(v)))
    # phase 2 (minutes 20-29): shifted distribution -> drift
    for i, v in enumerate(np.clip(rng.normal(80, 5, 400), 0, 99.9)):
        rows.append(
            Row(ts=T0 + dt.timedelta(minutes=20, seconds=(i % 600)), value=float(v))
        )
    # sentinel far in the future: closes every real window under the
    # watermark so availableNow replay emits them all
    rows.append(Row(ts=T0 + dt.timedelta(hours=3), value=50.0))
    return rows


def _ref_counts():
    rng = np.random.RandomState(3)
    vals = np.clip(rng.normal(50, 5, 2000), 0, 99.9)
    edges = stats_k.histogram_edges(SPEC.lo, SPEC.hi, SPEC.n_bins)
    counts, _ = np.histogram(vals, bins=edges)
    return counts


@pytest.fixture(scope="module")
def batch_scored(spark):
    df = spark.createDataFrame(_events(), "ts timestamp, value double")
    hist = drift_stream.windowed_histogram(df, SPEC, window="10 minutes")
    out = drift_stream.psi_over_windows(hist, SPEC, _ref_counts())
    return {r["window_start"]: r for r in out.collect()}


def test_batch_psi_flags_only_the_shifted_window(batch_scored):
    stable = batch_scored[T0]
    shifted = batch_scored[T0 + dt.timedelta(minutes=20)]
    assert not stable["drifted"] and stable["psi"] < 0.1
    assert shifted["drifted"] and shifted["psi"] > 0.25
    assert shifted["ks"] > shifted["ks_crit"]


def test_catalyst_scores_match_numpy_kernels(spark, batch_scored):
    # recompute each window's dense counts in numpy and compare scores
    df = spark.createDataFrame(_events(), "ts timestamp, value double")
    hist = drift_stream.windowed_histogram(df, SPEC, window="10 minutes").collect()
    ref = _ref_counts()
    by_win = {}
    for r in hist:
        by_win.setdefault(r["window_start"], np.zeros(SPEC.n_bins, dtype=np.int64))[
            r["bin"]
        ] += r["count"]
    for ws, counts in by_win.items():
        got = batch_scored[ws]
        assert got["psi"] == pytest.approx(stats_k.psi(ref, counts), abs=2e-6)
        assert got["ks"] == pytest.approx(stats_k.ks_statistic(ref, counts), abs=2e-6)
        assert got["n_events"] == int(counts.sum())


def test_sliding_windows_cover_each_event_twice(spark):
    df = spark.createDataFrame(_events()[:400], "ts timestamp, value double")
    hist = drift_stream.windowed_histogram(
        df, SPEC, window="10 minutes", slide="5 minutes"
    )
    out = drift_stream.psi_over_windows(hist, SPEC, _ref_counts()).collect()
    # 400 events all inside minutes 0-9 -> three overlapping windows
    # (-5..5, 0..10, 5..15) and every event lands in exactly two of them
    assert sum(r["n_events"] for r in out) == 800


def test_streamed_result_matches_batch(spark, batch_scored, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("driftstream"))
    src, sink, ck = (os.path.join(base, d) for d in ("src", "sink", "ck"))
    df = spark.createDataFrame(_events(), "ts timestamp, value double")
    df.repartition(4).write.parquet(src)

    stream = spark.readStream.schema("ts timestamp, value double").parquet(src)
    q = drift_stream.streaming_drift_monitor(
        stream, SPEC, _ref_counts(), sink_dir=sink, checkpoint_dir=ck,
        window="10 minutes", watermark="30 minutes",
    )
    q.awaitTermination(120)
    got = {r["window_start"]: r for r in spark.read.parquet(sink).collect()}
    # every real window (the sentinel's own stays open past end-of-stream)
    expect = {
        ws: r
        for ws, r in batch_scored.items()
        if ws < T0 + dt.timedelta(hours=1)
    }
    assert set(got) == set(expect)
    for ws, r in expect.items():
        assert got[ws]["psi"] == r["psi"] and got[ws]["ks"] == r["ks"]
        assert got[ws]["drifted"] == r["drifted"]
        assert got[ws]["n_events"] == r["n_events"]


def test_drift_sink_survives_batch_replay_without_duplicates(spark, tmp_path):
    """Same kill-point as the incremental validator's replay test: the sink
    write lands, the offset commit doesn't, the restart replays the batch.
    The batch_id-keyed dynamic overwrite must leave the drift sink with one
    row per finalized window, not two."""
    import glob

    src, sink, ck = (str(tmp_path / d) for d in ("src", "sink", "ck"))
    df = spark.createDataFrame(_events(), "ts timestamp, value double")
    df.repartition(4).write.parquet(src)

    def run():
        stream = spark.readStream.schema("ts timestamp, value double").parquet(src)
        q = drift_stream.streaming_drift_monitor(
            stream, SPEC, _ref_counts(), sink_dir=sink, checkpoint_dir=ck,
            window="10 minutes", watermark="30 minutes",
        )
        q.awaitTermination(120)

    run()
    before = sorted(
        tuple(r) for r in spark.read.parquet(sink).drop("batch_id").collect()
    )
    assert before, "stream must finalize windows"

    commits = sorted(glob.glob(os.path.join(ck, "commits", "[0-9]*")))
    last = commits[-1]
    os.remove(last)
    crc = os.path.join(os.path.dirname(last), f".{os.path.basename(last)}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run()
    after = sorted(
        tuple(r) for r in spark.read.parquet(sink).drop("batch_id").collect()
    )
    assert after == before
