"""Run-over-run metric anomaly screen: operator semantics
(operators/metric_history.py), the checkpoint metrics log
(plans/checkpoint.py), and the end-to-end job wiring."""

import json
import os
import subprocess
import sys

import pytest

from audit_anomaly_detection_etl_spark.operators.metric_history import metric_anomalies
from audit_anomaly_detection_etl_spark.plans import checkpoint as ckpt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "run string, part int, metric string, value double"
    )


def _screen(spark, rows, **kw):
    return metric_anomalies(
        _hist(spark, rows), run_col="run", key_cols=("part",), **kw
    ).collect()


def test_stable_series_not_anomalous(spark):
    rows = [(f"r{i}", 0, "n_rows", 100.0 + (i % 3)) for i in range(6)]
    out = _screen(spark, rows)
    assert len(out) == 1 and not out[0]["anomalous"]
    assert out[0]["n_prior"] == 5


def test_collapse_is_flagged(spark):
    rows = [(f"r{i}", 0, "n_rows", 100.0 + (i % 3)) for i in range(5)]
    rows.append(("r9", 0, "n_rows", 3.0))  # latest run: row count collapsed
    out = _screen(spark, rows)
    assert len(out) == 1 and out[0]["anomalous"]
    assert out[0]["med_prior"] == pytest.approx(101.0)


def test_constant_history_flags_any_change(spark):
    rows = [(f"r{i}", 0, "v", 7.0) for i in range(4)] + [("r9", 0, "v", 7.5)]
    out = _screen(spark, rows)
    assert out[0]["mad_prior"] == 0.0 and out[0]["anomalous"]
    # ... but an identical latest value does not flag
    rows2 = [(f"r{i}", 1, "v", 7.0) for i in range(5)]
    out2 = _screen(spark, rows2)
    assert not out2[0]["anomalous"]


def test_short_history_withheld(spark):
    rows = [("r0", 0, "v", 1.0), ("r1", 0, "v", 2.0), ("r2", 0, "v", 99.0)]
    assert _screen(spark, rows) == []  # only 2 priors < min_history=3


def test_one_outlier_in_history_does_not_widen_envelope(spark):
    # median/MAD: one bad historical run must not mask the next anomaly
    rows = [(f"r{i}", 0, "v", 10.0 + 0.5 * (i % 2)) for i in range(6)]
    rows.append(("r7", 0, "v", 500.0))  # historical glitch
    rows.append(("r9", 0, "v", 60.0))  # latest: real anomaly
    out = _screen(spark, rows)
    assert out[0]["anomalous"]


def test_series_split_by_key_and_metric(spark):
    rows = []
    for i in range(5):
        rows += [
            (f"r{i}", 0, "a", 10.0),
            (f"r{i}", 0, "b", 20.0),
            (f"r{i}", 1, "a", 30.0),
        ]
    rows += [("r9", 0, "a", 10.0), ("r9", 0, "b", 99.0), ("r9", 1, "a", 30.0)]
    out = {(r["part"], r["metric"]): r["anomalous"] for r in _screen(spark, rows)}
    assert out == {(0, "a"): False, (0, "b"): True, (1, "a"): False}


def _verdict(part, n_rows, n_viol, by_check, stats=()):
    return ckpt.PartitionVerdict(
        part=part,
        passed=n_viol == 0,
        n_rows=n_rows,
        n_violations=n_viol,
        violations_by_check=by_check,
        metrics={"column_stats": list(stats)},
        snapshot_id="snap",
        spec_hash="spec",
        engine_version="t",
        part_fingerprint="fp",
    )


def test_metric_rows_flattening():
    v = _verdict(
        0, 100, 3, {"uniqueness": 2, "schema_constraint": 1},
        stats=[{"column": "dur_ms", "mean": 400.0, "nulls": 0, "min": None}],
    )
    rows = dict(ckpt.metric_rows(v))
    assert rows["n_rows"] == 100.0
    assert rows["violations.uniqueness"] == 2.0
    assert rows["colstat.dur_ms.mean"] == 400.0
    assert rows["colstat.dur_ms.nulls"] == 0.0
    assert "colstat.dur_ms.min" not in rows  # None stat dropped


def test_metrics_log_roundtrip_and_screen(spark, tmp_path):
    store = ckpt.CheckpointStore(str(tmp_path))
    # 4 stable runs, then one with a violation spike in part 1
    for i in range(4):
        store.write(_verdict(0, 100, 0, {}))
        store.write(_verdict(1, 100, 1 + (i % 2), {"uniqueness": 1 + (i % 2)}))
        ckpt.append_metrics_log(store, f"r{i}")
    store.write(_verdict(0, 100, 0, {}))
    store.write(_verdict(1, 100, 80, {"uniqueness": 80}))
    ckpt.append_metrics_log(store, "r9")

    # per run: part 0 logs 2 totals, part 1 logs 2 totals + 1 check metric
    hist = ckpt.metrics_history(spark, store)
    assert hist.count() == 5 * (2 + 3)

    rep = ckpt.run_metric_anomaly_report(spark, store)
    flagged = {
        (r["part"], r["metric"]) for r in rep.collect() if r["anomalous"]
    }
    assert (1, "n_violations") in flagged
    assert (1, "violations.uniqueness") in flagged
    assert (0, "n_violations") not in flagged


def test_metrics_log_idempotent_rewrite(spark, tmp_path):
    store = ckpt.CheckpointStore(str(tmp_path))
    store.write(_verdict(0, 10, 0, {}))
    p1 = ckpt.append_metrics_log(store, "r0")
    p2 = ckpt.append_metrics_log(store, "r0")  # same run id: overwrite
    assert p1 == p2
    assert ckpt.metrics_history(spark, store).select("run").distinct().count() == 1


def test_job_end_to_end_metrics_log(tmp_path):
    """Three resumed re-runs build history; the summary reports the log and
    (with min-history lowered) an empty anomaly set on identical metrics."""
    ck = str(tmp_path / "ck")
    out = None
    for i in range(3):
        r = subprocess.run(
            [
                sys.executable, os.path.join(REPO, "jobs", "validate.py"),
                "--synth", "400", "--checkpoint", ck, "--master", "local[4]",
                "--run-id", f"r{i}", "--anomaly-min-history", "2",
            ],
            capture_output=True, text=True, check=True,
        )
        out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["metrics_log_runs"] == 3
    # identical metrics across resumed runs -> screened, nothing anomalous
    assert out["metric_anomalies_top"] == []
