"""Distribution-drift kernels: equi-width histograms, PSI, two-sample KS.

Pure numpy. At scale the engine computes the *histograms* distributedly
(``F.width_bucket`` + groupBy — one shuffle of n_bins rows per column, see
operators/drift.py) and only these tiny kernels run on the driver over the
collected bin counts. This mirrors the reference's global-quantile two-pass
pattern (SURVEY.md A13, features_engineering/nodes.py:519-527) and its
Freedman–Diaconis histogram helper (A19, app_utils/plot_tools.py:61-66),
replacing exact global quantiles with fixed-bin histograms that stay exact
and mergeable at 10^12 rows.
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-9


def histogram_edges(lo: float, hi: float, n_bins: int) -> np.ndarray:
    """Equi-width bin edges; values outside [lo, hi) clamp to edge bins."""
    if not (hi > lo) or n_bins < 1:
        raise ValueError("need hi > lo and n_bins >= 1")
    return np.linspace(lo, hi, n_bins + 1)


def counts_to_probs(counts: np.ndarray) -> np.ndarray:
    counts = np.asarray(counts, dtype=np.float64)
    total = counts.sum()
    if total <= 0:
        return np.full_like(counts, 1.0 / len(counts))
    return counts / total


def psi(expected_counts: np.ndarray, actual_counts: np.ndarray) -> float:
    """Population Stability Index between two aligned histograms.

    PSI = sum_i (a_i - e_i) * ln(a_i / e_i), probabilities floored at eps so
    empty bins don't produce infinities. Rule of thumb: <0.1 stable,
    0.1-0.25 moderate drift, >0.25 major drift.
    """
    e = np.maximum(counts_to_probs(np.asarray(expected_counts)), _EPS)
    a = np.maximum(counts_to_probs(np.asarray(actual_counts)), _EPS)
    return float(np.sum((a - e) * np.log(a / e)))


def ks_statistic(expected_counts: np.ndarray, actual_counts: np.ndarray) -> float:
    """Two-sample Kolmogorov–Smirnov statistic from aligned histograms:
    max |ECDF_expected - ECDF_actual| evaluated at bin boundaries.
    """
    e = counts_to_probs(np.asarray(expected_counts))
    a = counts_to_probs(np.asarray(actual_counts))
    return float(np.max(np.abs(np.cumsum(e) - np.cumsum(a))))


def ks_critical(n: int, m: int, alpha: float = 0.05) -> float:
    """Large-sample KS rejection threshold c(alpha) * sqrt((n+m)/(n*m))."""
    c = {0.10: 1.22, 0.05: 1.36, 0.01: 1.63}.get(alpha, 1.36)
    if n <= 0 or m <= 0:
        return float("inf")
    return c * np.sqrt((n + m) / (n * m))
