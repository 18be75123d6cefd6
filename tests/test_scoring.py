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

    def test_local_density_flags_global_outlier(self):
        X = _blob_with_outlier()
        m = scoring.LocalDensityDetector(k=20, contamination=0.1).fit(X)
        d = m.decision_function(X)
        assert d[0] < 0 and np.argmin(d) == 0
        assert m.decision_function(np.zeros((1, X.shape[1])))[0] > 0

    def test_local_density_is_local_not_global(self):
        """LOF's defining property: a member of a sparse-but-legitimate
        cluster is NOT anomalous (its neighbors are equally sparse), while a
        point locally isolated from a dense cluster IS — even at the same
        absolute kNN distance. A pure kdist detector cannot tell them apart."""
        rng = np.random.default_rng(5)
        dense = rng.normal(0.0, 0.05, size=(200, 2))
        sparse = rng.normal(10.0, 2.0, size=(200, 2))
        X = np.vstack([dense, sparse])
        m = scoring.LocalDensityDetector(k=10, contamination=0.01).fit(X)
        # probe A: sparse-cluster member-alike (2-sigma-ish, still social)
        probe_sparse = np.array([[11.0, 11.0]])
        # probe B: sits 1.0 away from the dense cluster — hugely isolated
        # RELATIVE to dense-cluster spacing, same order of absolute distance
        probe_edge = np.array([[1.0, 1.0]])
        r_sparse = m.offset_ - m.decision_function(probe_sparse)[0]
        r_edge = m.offset_ - m.decision_function(probe_edge)[0]
        assert r_edge > 5 * r_sparse  # local-density ratio separates them
        # while the GLOBAL kdist detector scores them comparably (both ~1.4)
        g = scoring.KnnDistanceDetector(k=10, contamination=0.01).fit(X)
        gd_sparse = g.offset_ - g.decision_function(probe_sparse)[0]
        gd_edge = g.offset_ - g.decision_function(probe_edge)[0]
        assert gd_edge < 5 * gd_sparse

    def test_local_density_numpy_oracle_parity(self):
        """Brute-force O(n^2) re-derivation of the simplified-LOF ratio."""
        rng = np.random.default_rng(12)
        X = rng.normal(0.0, 1.0, size=(80, 3))
        Q_ = rng.normal(0.0, 1.5, size=(15, 3))
        k = 7
        m = scoring.LocalDensityDetector(k=k, contamination=0.1).fit(X)
        S = (X - X.mean(axis=0)) / np.where(X.std(axis=0) > 0, X.std(axis=0), 1.0)
        SQ = (Q_ - X.mean(axis=0)) / np.where(X.std(axis=0) > 0, X.std(axis=0), 1.0)
        fit_kdist = np.array(
            [np.sort(np.linalg.norm(S - s, axis=1))[k] for s in S]  # excl self
        )
        assert np.allclose(m.sample_kdist_, fit_kdist, atol=1e-12)
        exp = []
        for q_ in SQ:
            d = np.linalg.norm(S - q_, axis=1)
            nbrs = np.argsort(d, kind="stable")[:k]
            exp.append(d[nbrs][-1] / max(fit_kdist[nbrs].mean(), 1e-12))
        got = m.offset_ - m.decision_function(Q_)
        assert np.allclose(got, np.asarray(exp), atol=1e-9)


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

    def test_four_member_ensemble_with_lof(self, spark, sf001):
        """include_lof=True adds lof_score/lof_pred through the SAME
        broadcast-scoring + normalize + vote pipeline (min_votes=3 for a
        4-member majority)."""
        feats = Q.user_features(spark, sf001)
        model = scoring.fit_ensemble(
            feats, Q.USER_FEATURE_COLS, "user_id", sample_mod=1,
            seed=Q.ENSEMBLE_SEED, include_lof=True,
        )
        assert set(model.detectors()) == {"iforest", "robust_z", "knn", "lof"}
        out = scoring.anomaly_output(
            scoring.score_ensemble(feats, model), min_votes=3
        )
        pdf = out.orderBy("user_id").toPandas()
        assert {"lof_score", "lof_pred"} <= set(pdf.columns)
        X = feats.orderBy("user_id").toPandas()[Q.USER_FEATURE_COLS].to_numpy(
            np.float64
        )
        exp_pred = (model.lof.decision_function(X) < 0).astype(int)
        assert pdf["lof_pred"].tolist() == exp_pred.tolist()
        votes = sum(
            pdf[f"{m}_pred"].to_numpy() for m in ("iforest", "robust_z", "knn", "lof")
        )
        exp_vote = ((pdf["iforest_pred"].to_numpy() == 1) & (votes >= 3)).astype(int)
        assert pdf["anomaly_prediction"].tolist() == exp_vote.tolist()

    def test_driver_fit_guard_caps_sample(self, spark, sf001):
        """sample_mod=None sizes the fit sample from a count(): with
        max_fit_rows below the table size the mod engages and the driver
        never sees the full table."""
        feats = Q.user_features(spark, sf001)
        n = feats.count()
        assert n > 5
        m = scoring.fit_ensemble(
            feats, Q.USER_FEATURE_COLS, "user_id", max_fit_rows=5, seed=1
        )
        assert 0 < m.knn.sample_.shape[0] < n
        # and the default guard is a no-op below the cap (mod resolves to 1)
        m_full = scoring.fit_ensemble(feats, Q.USER_FEATURE_COLS, "user_id", seed=1)
        assert m_full.knn.sample_.shape[0] == n

    def test_sampled_fit_is_deterministic(self, spark, sf001):
        feats = Q.user_features(spark, sf001)
        m1 = scoring.fit_ensemble(feats, Q.USER_FEATURE_COLS, "user_id", sample_mod=2, seed=9)
        m2 = scoring.fit_ensemble(
            feats.repartition(7), Q.USER_FEATURE_COLS, "user_id", sample_mod=2, seed=9
        )
        assert m1.iforest.offset_ == m2.iforest.offset_
        assert np.array_equal(m1.robust_z.med_, m2.robust_z.med_)
        assert np.array_equal(m1.knn.sample_, m2.knn.sample_)


def test_model_save_load_roundtrip_scores_identically(spark, tmp_path):
    """S8 model persistence: a saved + reloaded ensemble must broadcast and
    score bit-identically to the in-memory one (the reference persists its
    fitted model as a pickle artifact the app reloads)."""
    import audit_anomaly_detection_etl_spark.queries as Q
    from audit_anomaly_detection_etl_spark.operators import scoring

    feats = Q.user_features(spark, "/root/testdata/sf0.001")
    model = scoring.fit_ensemble(
        feats, Q.USER_FEATURE_COLS, "user_id", sample_mod=1, seed=Q.ENSEMBLE_SEED
    )
    p = str(tmp_path / "ensemble.pkl")
    scoring.save_model(model, p)
    loaded = scoring.load_model(p)
    a = scoring.score_ensemble(feats, model).orderBy("user_id").toPandas()
    b = scoring.score_ensemble(feats, loaded).orderBy("user_id").toPandas()
    assert a.equals(b)


def test_load_model_rejects_foreign_pickles(tmp_path):
    import pickle

    import pytest

    from audit_anomaly_detection_etl_spark.operators import scoring

    p = str(tmp_path / "junk.pkl")
    with open(p, "wb") as f:
        pickle.dump({"not": "a model"}, f)
    with pytest.raises(TypeError):
        scoring.load_model(p)
