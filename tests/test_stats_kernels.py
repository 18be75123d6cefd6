import numpy as np

from audit_anomaly_detection_etl_spark.functions import stats


def test_psi_identical_is_zero():
    c = np.array([10, 20, 30, 40])
    assert stats.psi(c, c) == 0.0
    assert stats.ks_statistic(c, c) == 0.0


def test_psi_detects_shift():
    rng = np.random.default_rng(0)
    a = np.histogram(rng.normal(0, 1, 10000), bins=20, range=(-5, 5))[0]
    b = np.histogram(rng.normal(1.0, 1, 10000), bins=20, range=(-5, 5))[0]
    assert stats.psi(a, b) > 0.25
    assert stats.ks_statistic(a, b) > 0.3


def test_psi_small_noise_is_stable():
    rng = np.random.default_rng(0)
    a = np.histogram(rng.normal(0, 1, 100000), bins=20, range=(-5, 5))[0]
    b = np.histogram(rng.normal(0, 1, 100000), bins=20, range=(-5, 5))[0]
    assert stats.psi(a, b) < 0.01


def test_ks_critical():
    assert 0.0 < stats.ks_critical(1000, 1000) < 0.1
    assert stats.ks_critical(0, 10) == float("inf")


def test_histogram_edges():
    e = stats.histogram_edges(0.0, 10.0, 5)
    assert len(e) == 6 and e[0] == 0.0 and e[-1] == 10.0
