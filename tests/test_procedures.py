"""Ordered per-group procedures (SURVEY.md §2.5 W1-W3) vs pandas oracles.

The oracle reimplements the reference semantics directly in pandas
(features_engineering/nodes.py:143-185, 188-222, 387-439) over the same
explicit ordering column, per SURVEY.md §5 item 2.
"""

import numpy as np
import pandas as pd
import pytest

from audit_anomaly_detection_etl_spark.operators import procedures, schema_check


@pytest.fixture(scope="module")
def events_pdf():
    rng = np.random.default_rng(17)
    n = 600
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 12, n).astype(np.int64),
            "event_type": rng.choice(["click", "view", "error", "purchase", "signup"], n),
            "value": np.round(rng.uniform(0.01, 40.0, n), 2),
            "ts": pd.Timestamp("2024-03-01") + pd.to_timedelta(np.sort(rng.uniform(0, 86400, n)), unit="s"),
        }
    )


def test_pace_max_ratio_matches_pandas_oracle(spark, events_pdf):
    df = spark.createDataFrame(events_pdf)
    got = (
        procedures.pace_max_ratio(df, "user_id", "event_id", "value", min_frac=4)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )

    def oracle(g: pd.DataFrame):
        g = g.sort_values("event_id")
        v = g["value"].astype(float)
        minp = max(len(v) // 4, 1)
        fwd = v.expanding(min_periods=minp).median()
        bwd = v[::-1].expanding(min_periods=minp).median()[::-1]
        r = (bwd / fwd).to_numpy()
        return pd.Series(
            {"n": len(v), "max_pace_ratio": np.nanmax(r) if np.any(~np.isnan(r)) else np.nan}
        )

    exp = events_pdf.groupby("user_id").apply(oracle, include_groups=False).sort_index()
    assert (got["n"] == exp["n"]).all()
    np.testing.assert_allclose(got["max_pace_ratio"], exp["max_pace_ratio"], rtol=1e-12)


def test_pace_ratio_groups_straddling_arrow_batches(spark, events_pdf):
    """The packed mapInPandas buffers the trailing group of every Arrow
    batch; force tiny batches so nearly every group straddles a boundary and
    assert results are identical to the default batch size."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    df = spark.createDataFrame(events_pdf)
    base = (
        procedures.pace_max_ratio(df, "user_id", "event_id", "value")
        .toPandas().set_index("user_id").sort_index()
    )
    try:
        spark.conf.set(key, "7")
        tiny = (
            procedures.pace_max_ratio(df, "user_id", "event_id", "value")
            .toPandas().set_index("user_id").sort_index()
        )
    finally:
        spark.conf.set(key, old)
    assert (base["n"] == tiny["n"]).all()
    np.testing.assert_allclose(base["max_pace_ratio"], tiny["max_pace_ratio"], rtol=0, atol=0)


def test_active_duration_matches_pandas_oracle(spark, events_pdf):
    df = spark.createDataFrame(events_pdf)
    got = (
        procedures.active_duration(df, "user_id", "event_id", "ts", "event_type", "view")
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )

    def oracle(g: pd.DataFrame):
        g = g.sort_values("event_id")
        us = g["ts"].astype("int64") / 1000  # ns -> us
        gap = us.diff()
        pause_mask = (g["event_type"] == "view") & gap.notna()
        pause_us = gap[pause_mask].sum()
        total_us = us.iloc[-1] - us.iloc[0] if len(us) else 0.0
        return pd.Series(
            {
                "total_ms": total_us / 1000.0,
                "pause_ms": pause_us / 1000.0,
                "active_ms": (total_us - pause_us) / 1000.0,
                "n_pauses": int(pause_mask.sum()),
            }
        )

    exp = events_pdf.groupby("user_id").apply(oracle, include_groups=False).sort_index()
    np.testing.assert_allclose(got["total_ms"], exp["total_ms"], rtol=1e-9)
    np.testing.assert_allclose(got["pause_ms"], exp["pause_ms"], rtol=1e-9)
    np.testing.assert_allclose(got["active_ms"], exp["active_ms"], rtol=1e-9)
    assert (got["n_pauses"] == exp["n_pauses"]).all()


def test_backtrack_count_matches_quadratic_oracle(spark, events_pdf):
    related = {"error": ["click", "view"], "purchase": ["signup"]}
    df = spark.createDataFrame(events_pdf)
    got = (
        procedures.backtrack_count(
            df, related, "user_id", "event_id", "event_type", "value", threshold=10.0
        )
        .toPandas()
        .set_index("user_id")["n_backtracks"]
        .sort_index()
    )

    # O(n^2) reference-shaped oracle (features_engineering/nodes.py:431-438)
    def oracle(g: pd.DataFrame) -> int:
        g = g.sort_values("event_id").reset_index(drop=True)
        total = 0
        for i, row in g.iterrows():
            targets = related.get(row["event_type"])
            if targets and row["value"] > 10.0:
                later = g.iloc[i + 1 :]
                total += int(later["event_type"].isin(targets).sum())
        return total

    exp = events_pdf.groupby("user_id").apply(oracle, include_groups=False).sort_index()
    assert (got == exp).all()


def test_backtrack_filter_counted_matches_reference_loop(spark, events_pdf):
    """filter_counted=True = the reference's EXACT semantics: the duration
    threshold filters the whole table before the double loop
    (features_engineering/nodes.py:420-439), so counted later rows must pass
    it too."""
    related = {"error": ["click", "view"], "purchase": ["signup"]}
    df = spark.createDataFrame(events_pdf)
    got = (
        procedures.backtrack_count(
            df, related, "user_id", "event_id", "event_type", "value",
            threshold=10.0, filter_counted=True,
        )
        .toPandas()
        .set_index("user_id")["n_backtracks"]
        .sort_index()
    )

    def oracle(g: pd.DataFrame) -> int:
        # reference shape: filter FIRST, then the O(n^2) scan
        g = g.sort_values("event_id")
        g = g[g["value"] > 10.0].reset_index(drop=True)
        total = 0
        for i, row in g.iterrows():
            targets = related.get(row["event_type"])
            if targets:
                later = g.iloc[i + 1 :]
                total += int(later["event_type"].isin(targets).sum())
        return total

    exp = events_pdf.groupby("user_id").apply(oracle, include_groups=False).sort_index()
    assert (got == exp).all()
    # and it genuinely differs from the default semantics on this data
    dflt = (
        procedures.backtrack_count(
            df, related, "user_id", "event_id", "event_type", "value", threshold=10.0
        )
        .toPandas()["n_backtracks"]
    )
    assert dflt.sum() != got.sum()


def test_backtrack_zero_groups_present(spark):
    pdf = pd.DataFrame(
        {
            "event_id": [0, 1],
            "user_id": [1, 2],
            "event_type": ["click", "click"],
            "value": [50.0, 50.0],
        }
    )
    out = procedures.backtrack_count(
        spark.createDataFrame(pdf), {"error": ["click"]}, "user_id", "event_id",
        "event_type", "value", 10.0,
    ).toPandas()
    assert sorted(out["user_id"]) == [1, 2]
    assert (out["n_backtracks"] == 0).all()


def test_format_columns_prunes_and_casts(spark):
    pdf = pd.DataFrame({"a": [1, 2], "b": ["x", "y"], "c": [0.5, 1.5]})
    df = spark.createDataFrame(pdf)
    out = schema_check.format_columns(df, {"ident": ("a", "string"), "val": ("c", "double")})
    assert out.columns == ["ident", "val"]
    assert dict(out.dtypes) == {"ident": "string", "val": "double"}
    rows = {r["ident"]: r["val"] for r in out.collect()}
    assert rows == {"1": 0.5, "2": 1.5}
    # projection reaches the source: unmapped column b absent from the plan
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "b" not in [
        f.split("#")[0] for f in plan.split("[")[-1].rstrip("]").split(", ")
    ]
