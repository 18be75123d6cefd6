"""Semantic oracle for operators/association.cramers_v: scipy-free numpy
chi-square on known contingency tables — a perfectly dependent pair must
give V=1, an independent pair V~0, and the statistic must match the
classical dense-grid formula (the operator uses the observed-cells-only
algebraic form)."""

import numpy as np
import pytest

from audit_anomaly_detection_etl_spark.operators import association


def _chi2_dense(table):
    obs = np.asarray(table, dtype=float)
    n = obs.sum()
    exp = np.outer(obs.sum(1), obs.sum(0)) / n
    mask = exp > 0
    return ((obs[mask] - exp[mask]) ** 2 / exp[mask]).sum()


def _rows_from_table(table):
    rows = []
    for i, row in enumerate(table):
        for j, c in enumerate(row):
            rows.extend([(f"a{i}", f"b{j}")] * c)
    return rows


@pytest.mark.parametrize(
    "table",
    [
        [[40, 10, 5], [8, 35, 12], [3, 9, 50]],  # strong association
        [[30, 30, 30], [20, 20, 20]],  # exact independence
    ],
)
def test_chi2_matches_dense_formula(spark, table):
    df = spark.createDataFrame(_rows_from_table(table), "x string, y string")
    out = association.cramers_v(df, "x", "y").collect()[0]
    want = _chi2_dense(table)
    assert out["chi2"] == pytest.approx(want, abs=1e-4)
    n = float(np.asarray(table).sum())
    k = min(len(table), len(table[0])) - 1
    assert out["cramers_v"] == pytest.approx(np.sqrt(max(want, 0) / (n * k)), abs=1e-5)
    assert out["n"] == int(n)


def test_perfect_dependence_and_independence(spark):
    # y determined by x -> V = 1, associated
    dep = spark.createDataFrame(
        [(f"a{i % 3}", f"b{i % 3}") for i in range(300)], "x string, y string"
    )
    r = association.cramers_v(dep, "x", "y").collect()[0]
    assert r["cramers_v"] == pytest.approx(1.0, abs=1e-9)
    assert r["associated"] is True
    assert r["dof"] == 4

    # exactly uniform grid -> chi2 = 0, not associated
    ind = spark.createDataFrame(
        [(f"a{i % 3}", f"b{j % 4}") for i in range(3) for j in range(4)] * 25,
        "x string, y string",
    )
    r = association.cramers_v(ind, "x", "y").collect()[0]
    assert r["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert r["associated"] is False


def test_constant_column_reports_no_association(spark):
    """dof = 0 (one dimension constant) used to abort with DIVIDE_BY_ZERO
    under ANSI mode; a constant is independent of everything, so the audit
    must report chi2 = 0, V = 0, associated = false, crit = NULL."""
    df = spark.createDataFrame(
        [("x", i % 3) for i in range(30)], "a string, b int"
    )
    r = association.cramers_v(df, "a", "b").collect()[0]
    assert r["n"] == 30 and r["n_a"] == 1 and r["dof"] == 0
    assert r["chi2"] == 0.0
    assert r["cramers_v"] == 0.0
    assert r["chi2_crit"] is None
    assert r["associated"] is False
