"""Exact-TreeSHAP oracles (operators/treeshap.py).

The exactness contract, pinned three independent ways:

1. BRUTE-FORCE SHAPLEY: on small trees, phi from the vectorized Algorithm-2
   implementation equals the textbook Shapley sum over all feature subsets
   of the cover-conditioned expectation — including trees with the same
   feature repeated along a path (the UNWIND case).
2. ADDITIVITY: for every row, sum(phi) + base == the forest's mean adjusted
   depth (the exact quantity score_samples transforms) — checked on a
   full-size forest, many seeds.
3. SPARK PARITY: the distributed shap_attribution output equals a
   driver-side forest_shap over the same rows.
"""

from __future__ import annotations

from itertools import combinations
from math import factorial

import numpy as np
import pytest

from audit_anomaly_detection_etl_spark.operators.scoring import (
    NumpyIsolationForest,
)
from audit_anomaly_detection_etl_spark.operators.treeshap import (
    _tree_shap,
    forest_shap,
    tree_expected_value,
)


def _expvalue(tree, x, S):
    """Path-dependent conditional expectation: features in S follow x,
    features outside S average children by cover — the function whose
    Shapley values TreeSHAP computes."""

    def g(node):
        f = int(tree.feature[node])
        if f < 0:
            return float(tree.adjust[node])
        if f in S:
            nxt = tree.left[node] if x[f] <= tree.threshold[node] else tree.right[node]
            return g(int(nxt))
        lc, rc = int(tree.left[node]), int(tree.right[node])
        return (tree.cover[lc] * g(lc) + tree.cover[rc] * g(rc)) / float(
            tree.cover[node]
        )

    return g(0)


def _brute_shap(tree, x, d):
    feats = sorted({int(f) for f in tree.feature if f >= 0})
    phi = np.zeros(d)
    u = len(feats)
    for j in feats:
        others = [f for f in feats if f != j]
        for r in range(u):
            for S in combinations(others, r):
                w = factorial(r) * factorial(u - r - 1) / factorial(u)
                phi[j] += w * (
                    _expvalue(tree, x, set(S) | {j}) - _expvalue(tree, x, set(S))
                )
    return phi


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_brute_force_shapley(seed):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(60, 4))
    forest = NumpyIsolationForest(n_trees=3, sample_size=16, seed=seed + 1).fit(X)
    Xq = rng.normal(size=(6, 4))
    phi_fast, base = forest_shap(forest, Xq)
    phi_brute = np.zeros_like(phi_fast)
    base_b = 0.0
    for tree in forest.trees:
        base_b += tree_expected_value(tree)
        for i in range(len(Xq)):
            phi_brute[i] += _brute_shap(tree, Xq[i], 4)
    phi_brute /= len(forest.trees)
    base_b /= len(forest.trees)
    assert np.abs(phi_fast - phi_brute).max() < 1e-10
    assert abs(base - base_b) < 1e-12


def test_matches_brute_force_on_repeated_feature_paths():
    """Few features + deep-ish trees guarantee the same feature splits more
    than once along a path — the UNWIND branch of the algorithm."""
    rng = np.random.default_rng(3)
    X = rng.normal(size=(400, 2))
    forest = NumpyIsolationForest(n_trees=2, sample_size=64, seed=4).fit(X)
    # sanity: the fixture actually exercises repeats
    has_repeat = False
    for tree in forest.trees:
        node = 0
        # any root-to-leaf walk with a duplicate feature suffices; scan all
        stack = [(0, frozenset())]
        while stack:
            n, seen = stack.pop()
            f = int(tree.feature[n])
            if f < 0:
                continue
            if f in seen:
                has_repeat = True
                break
            stack.append((int(tree.left[n]), seen | {f}))
            stack.append((int(tree.right[n]), seen | {f}))
        if has_repeat:
            break
    assert has_repeat, "fixture regression: no repeated feature on any path"
    Xq = rng.normal(size=(8, 2))
    for tree in forest.trees:
        fast = np.zeros((len(Xq), 2))
        _tree_shap(tree, Xq, fast)
        brute = np.array([_brute_shap(tree, x, 2) for x in Xq])
        assert np.abs(fast - brute).max() < 1e-10


@pytest.mark.parametrize("seed", range(5))
def test_additivity_full_size_forest(seed):
    """sum(phi) + base == mean adjusted depth, exactly (1e-9), on a
    default-size forest — the 'attributions sum to score - baseline'
    contract from the round-4 verdict, in the depth space the transform
    -2^(-d/c_psi) consumes."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(500, 6)) * rng.uniform(0.5, 3.0, size=6)
    forest = NumpyIsolationForest(n_trees=50, sample_size=128, seed=seed).fit(X)
    Xq = rng.normal(size=(40, 6))
    phi, base = forest_shap(forest, Xq)
    depths = np.zeros(len(Xq))
    for tree in forest.trees:
        depths += NumpyIsolationForest._tree_depths(tree, Xq)
    depths /= len(forest.trees)
    assert np.abs(phi.sum(axis=1) + base - depths).max() < 1e-9
    # and the depth-space identity to the actual score
    np.testing.assert_allclose(
        -np.power(2.0, -(phi.sum(axis=1) + base) / forest._c_psi),
        forest.score_samples(Xq),
        rtol=1e-12,
    )


def test_pre_cover_models_raise():
    rng = np.random.default_rng(9)
    forest = NumpyIsolationForest(n_trees=2, sample_size=16, seed=9).fit(
        rng.normal(size=(40, 3))
    )
    for t in forest.trees:
        t.cover = None  # simulate a pre-round-5 pickle
    with pytest.raises(ValueError, match="cover"):
        forest_shap(forest, rng.normal(size=(2, 3)))


def test_spark_attribution_matches_driver(spark):
    """shap_attribution (broadcast-model mapInPandas) == driver-side
    forest_shap: same flagged rows, same top-k features, same phi."""
    import pandas as pd
    from pyspark.sql import functions as F

    from audit_anomaly_detection_etl_spark.operators import scoring, treeshap

    rng = np.random.default_rng(11)
    n = 300
    pdf = pd.DataFrame(
        {
            "id": [f"e{i:04d}" for i in range(n)],
            "f_a": rng.normal(size=n),
            "f_b": rng.normal(size=n),
            "f_c": rng.normal(size=n),
        }
    )
    # plant obvious anomalies so the vote flags a non-empty subset
    pdf.loc[:9, ["f_a", "f_b", "f_c"]] = rng.normal(size=(10, 3)) * 12 + 30
    feats = spark.createDataFrame(pdf)
    cols = ["f_a", "f_b", "f_c"]
    model = scoring.fit_ensemble(feats, cols, id_col="id", sample_mod=1, seed=5)

    att = treeshap.shap_attribution(
        feats, model, id_col="id", top_k=3, flagged_only=True
    ).toPandas()
    assert len(att) > 0 and set(att["rank"]) == {1, 2, 3}

    scored = scoring.anomaly_output(
        scoring.score_ensemble(feats, model)
    ).toPandas()
    flagged = scored[scored["anomaly_prediction"] == 1]
    assert set(att["id"]) == set(flagged["id"])

    sub = pdf.set_index("id").loc[sorted(set(att["id"]))]
    phi, _ = treeshap.forest_shap(model.iforest, sub[cols].to_numpy(float))
    exp = {}
    for row_i, rid in enumerate(sub.index):
        order = np.argsort(phi[row_i], kind="stable")
        for r, ci in enumerate(order[:3], start=1):
            exp[(rid, r)] = (cols[ci], phi[row_i, ci])
    for _, row in att.iterrows():
        feat, val = exp[(row["id"], row["rank"])]
        assert row["feature"] == feat
        assert abs(row["phi"] - val) < 1e-9
    # flagged rows should carry at least one path-shortening (negative) phi
    assert (att[att["rank"] == 1]["phi"] < 0).all()


def test_cover_survives_model_round_trip(tmp_path):
    from audit_anomaly_detection_etl_spark.operators.scoring import (
        load_model,
        save_model,
    )
    from audit_anomaly_detection_etl_spark.operators.scoring import (
        EnsembleModel,
        KnnDistanceDetector,
        RobustZDetector,
    )

    rng = np.random.default_rng(13)
    X = rng.normal(size=(80, 3))
    model = EnsembleModel(
        feature_cols=["a", "b", "c"],
        iforest=NumpyIsolationForest(n_trees=4, sample_size=32, seed=3).fit(X),
        robust_z=RobustZDetector().fit(X),
        knn=KnnDistanceDetector().fit(X),
        baseline_=np.median(X, axis=0),
    )
    p = str(tmp_path / "m.pkl")
    save_model(model, p)
    loaded = load_model(p)
    Xq = rng.normal(size=(7, 3))
    a, ba = forest_shap(model.iforest, Xq)
    b, bb = forest_shap(loaded.iforest, Xq)
    np.testing.assert_array_equal(a, b)
    assert ba == bb
