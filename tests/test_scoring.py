"""Anomaly-ensemble scoring: numpy-detector unit tests + exact-parity oracles
for the distributed pipeline (the q49/q51 rows-only queries' correctness gate,
mirroring model_training/nodes.py + model_output/nodes.py semantics)."""

import numpy as np
import pandas as pd
import pytest

from audit_anomaly_detection_etl_spark import queries as Q
from audit_anomaly_detection_etl_spark.operators import scoring


def _blob_with_outlier(n=300, d=4, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.normal(0.0, 1.0, size=(n, d))
    X[0] = 25.0  # far outlier
    return X


class TestDetectors:
    def test_iforest_flags_outlier(self):
        X = _blob_with_outlier()
        m = scoring.NumpyIsolationForest(seed=7).fit(X)
        s = m.score_samples(X)
        assert np.argmin(s) == 0
        assert m.decision_function(X)[0] < 0
        # scores live in (-1, 0) like sklearn's
        assert (s < 0).all() and (s > -1).all()

    def test_iforest_deterministic(self):
        X = _blob_with_outlier(seed=11)
        a = scoring.NumpyIsolationForest(seed=5).fit(X).score_samples(X)
        b = scoring.NumpyIsolationForest(seed=5).fit(X).score_samples(X)
        assert np.array_equal(a, b)
        c = scoring.NumpyIsolationForest(seed=6).fit(X).score_samples(X)
        assert not np.array_equal(a, c)

    def test_iforest_contamination_on_fit_set(self):
        X = _blob_with_outlier()
        m = scoring.NumpyIsolationForest(contamination=0.1, seed=1).fit(X)
        frac = float(np.mean(m.decision_function(X) < 0))
        assert 0.05 <= frac <= 0.12  # offset_ at the 10% quantile of fit scores

    def test_robust_z(self):
        X = _blob_with_outlier()
        m = scoring.RobustZDetector(contamination=0.1).fit(X)
        d = m.decision_function(X)
        assert d[0] < 0
        assert float(np.mean(d < 0)) <= 0.11

    def test_robust_z_constant_feature(self):
        X = np.ones((50, 3))
        X[:, 1] = np.arange(50)
        d = scoring.RobustZDetector().fit(X).decision_function(X)
        assert np.isfinite(d).all()

    def test_knn_distance(self):
        X = _blob_with_outlier()
        m = scoring.KnnDistanceDetector(k=20, contamination=0.1).fit(X)
        d = m.decision_function(X)
        assert d[0] < 0
        assert np.argmin(d) == 0
        # novelty scoring of a fresh inlier point is positive
        assert m.decision_function(np.zeros((1, X.shape[1])))[0] > 0


@pytest.fixture(scope="module")
def fitted(spark, sf001):
    feats, model = Q.fit_user_ensemble(spark, sf001)
    pdf = feats.orderBy("user_id").toPandas()
    return feats, model, pdf


class TestEnsemblePipeline:
    def test_q49_exact_parity_vs_numpy(self, spark, sf001, fitted):
        """The distributed pipeline (broadcast-model mapInPandas scoring +
        1-row min-max agg join + vote) must equal a driver-side numpy
        replication of model_output/nodes.py run on the collected features."""
        _feats, model, pdf = fitted
        X = pdf[Q.USER_FEATURE_COLS].to_numpy(np.float64)
        raw = {m: det.decision_function(X) for m, det in model.detectors().items()}
        preds = {m: (raw[m] < 0).astype(int) for m in raw}
        norm = []
        for m in scoring.MODEL_NAMES:
            inv = -raw[m]
            lo, hi = inv.min(), inv.max()
            norm.append((inv - lo) / (hi - lo) if hi > lo else np.zeros_like(inv))
        score = np.mean(norm, axis=0)
        votes = sum(preds[m] for m in scoring.MODEL_NAMES)
        expected = pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "iforest_pred": preds["iforest"],
                "robust_z_pred": preds["robust_z"],
                "knn_pred": preds["knn"],
                "anomaly_prediction": ((preds["iforest"] == 1) & (votes >= 2)).astype(int),
                "anomaly_score": np.round(score, 6),
            }
        )
        got = (
            Q.QUERIES["q49_anomaly_ensemble"](spark, sf001)
            .orderBy("user_id")
            .toPandas()
        )
        for c in ["iforest_pred", "robust_z_pred", "knn_pred", "anomaly_prediction"]:
            assert got[c].tolist() == expected[c].tolist(), c
        assert np.allclose(got["anomaly_score"], expected["anomaly_score"], atol=1e-9)
        assert int(got["anomaly_prediction"].sum()) >= 1  # something fires

    def test_q51_attribution_exact_parity(self, spark, sf001, fitted):
        _feats, model, pdf = fitted
        X = pdf[Q.USER_FEATURE_COLS].to_numpy(np.float64)
        base = model.iforest.decision_function(X)
        cols = sorted(Q.USER_FEATURE_COLS)
        deltas = np.empty((len(pdf), len(cols)))
        for j, c in enumerate(cols):
            Xa = X.copy()
            Xa[:, Q.USER_FEATURE_COLS.index(c)] = model.baseline_[
                Q.USER_FEATURE_COLS.index(c)
            ]
            deltas[:, j] = model.iforest.decision_function(Xa) - base
        got = (
            Q.QUERIES["q51_anomaly_attribution"](spark, sf001)
            .orderBy("user_id", "rank")
            .toPandas()
        )
        assert set(got["rank"]) == {1, 2}
        for i, uid in enumerate(pdf["user_id"]):
            sub = got[got["user_id"] == uid].sort_values("rank")
            order = np.argsort(-deltas[i], kind="stable")[:2]
            assert sub["feature"].tolist() == [cols[j] for j in order]
            assert np.allclose(sub["delta"].to_numpy(), np.round(deltas[i][order], 6), atol=1e-9)

    def test_q50_rank_is_total_order(self, spark, sf001):
        got = Q.QUERIES["q50_ranked_anomalies"](spark, sf001).toPandas()
        assert sorted(got["rank"]) == list(range(1, len(got) + 1))
        s = got.sort_values("rank")
        key = list(zip(-s["anomaly_prediction"], -s["anomaly_score"], s["user_id"]))
        assert key == sorted(key)

    def test_sampled_fit_is_deterministic(self, spark, sf001):
        feats = Q.user_features(spark, sf001)
        m1 = scoring.fit_ensemble(feats, Q.USER_FEATURE_COLS, "user_id", sample_mod=2, seed=9)
        m2 = scoring.fit_ensemble(
            feats.repartition(7), Q.USER_FEATURE_COLS, "user_id", sample_mod=2, seed=9
        )
        assert m1.iforest.offset_ == m2.iforest.offset_
        assert np.array_equal(m1.robust_z.med_, m2.robust_z.med_)
        assert np.array_equal(m1.knn.sample_, m2.knn.sample_)
