"""Unit tests for the drift-robust time-paired scaling-efficiency metric.

The co-temporal protocol (scripts/bench_scaling.py) runs both parallelism
levels simultaneously; host throughput on this sandbox VM swings up to 3x
WITHIN one 420 s window, so whole-window medians compare rates measured
under different host conditions. `_paired_efficiency` compares each
low-level run only against the high-level runs that overlapped it in wall
time. These tests pin its semantics without any Spark session.
"""

import importlib.util
import os
import sys

_SPEC = importlib.util.spec_from_file_location(
    "bench_scaling",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "bench_scaling.py"),
)
bench_scaling = importlib.util.module_from_spec(_SPEC)
sys.modules.setdefault("bench_scaling", bench_scaling)
_SPEC.loader.exec_module(bench_scaling)

paired = bench_scaling._paired_efficiency


def _run(t0, t1, rate):
    return {"t0": t0, "t1": t1, "rate": rate, "sec": t1 - t0, "clips": 1}


def test_ideal_scaling_is_one():
    # one low run, two high runs inside it, each exactly 4x the low rate
    lo = [_run(0.0, 40.0, 100.0)]
    hi = [_run(0.0, 20.0, 400.0), _run(20.0, 40.0, 400.0)]
    assert paired(lo, hi, ratio=4.0) == 1.0


def test_drift_cancels_in_pairs():
    # Host speeds up 3x mid-window. Whole-window medians are skewed
    # (low's median lands in the slow half, high's in the fast half), but
    # per-pair efficiency is 0.9 everywhere - the paired metric returns it.
    lo = [_run(0.0, 60.0, 100.0), _run(60.0, 80.0, 300.0)]
    hi = [_run(0.0, 30.0, 360.0), _run(30.0, 60.0, 360.0),
          _run(60.0, 70.0, 1080.0), _run(70.0, 80.0, 1080.0)]
    assert paired(lo, hi, ratio=4.0) == 0.9


def test_high_run_assigned_by_midpoint():
    # a high run straddling the boundary pairs with the low run that
    # contains its midpoint (15.0 -> first low run only)
    lo = [_run(0.0, 20.0, 100.0), _run(20.0, 40.0, 100.0)]
    hi = [_run(10.0, 20.0, 400.0), _run(25.0, 35.0, 200.0)]
    effs = paired(lo, hi, ratio=4.0)
    # pairs: (400/(4*100))=1.0 and (200/(4*100))=0.5 -> median 0.75
    assert effs == 0.75


def test_unpaired_low_runs_are_skipped():
    lo = [_run(0.0, 10.0, 100.0), _run(100.0, 110.0, 100.0)]
    hi = [_run(0.0, 10.0, 300.0)]  # only overlaps the first low run
    assert paired(lo, hi, ratio=4.0) == 0.75


def test_legacy_runs_without_timestamps_return_none():
    lo = [{"rate": 100.0, "sec": 10.0, "clips": 1}]
    hi = [{"rate": 400.0, "sec": 10.0, "clips": 1}]
    assert paired(lo, hi, ratio=4.0) is None
    assert paired([], [], ratio=4.0) is None
