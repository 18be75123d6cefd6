import math

import pytest
from pyspark.sql import Row

from audit_anomaly_detection_etl_spark.operators import embedqa


@pytest.fixture(scope="module")
def qa_rows(spark):
    rows = [Row(vec_id=i, embedding=[1.0 + i * 0.001, 0.0, 0.0, 0.0]) for i in range(20)]
    rows += [
        Row(vec_id=100, embedding=[10.0, 0.0, 0.0, 0.0]),          # norm outlier
        Row(vec_id=101, embedding=[1.0, 2.0, 3.0]),                # wrong dim
        Row(vec_id=102, embedding=[float("nan"), 0.0, 0.0, 0.0]),  # NaN
        Row(vec_id=103, embedding=[float("inf"), 0.0, 0.0, 0.0]),  # Inf
        Row(vec_id=104, embedding=[0.0, 0.0, 0.0, 0.0]),           # zero norm
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedqa.embedding_qa(df, z_thresh=4.0)
    return {r["vec_id"]: r for r in out.collect()}


def test_clean_vectors_unflagged(qa_rows):
    for i in range(20):
        r = qa_rows[i]
        assert not (r["dim_mismatch"] or r["nonfinite"] or r["zero_norm"] or r["norm_outlier"])
        assert r["dim"] == 4 and r["n_nonfinite"] == 0
        assert r["l2_norm"] == pytest.approx(1.0 + i * 0.001, abs=1e-5)
        assert r["norm_z"] is not None


def test_norm_outlier_flagged_with_z(qa_rows):
    r = qa_rows[100]
    assert r["norm_outlier"] and not (r["dim_mismatch"] or r["nonfinite"] or r["zero_norm"])
    assert r["norm_z"] > 4.0


def test_dim_mismatch_excluded_from_profile(qa_rows):
    r = qa_rows[101]
    assert r["dim_mismatch"] and r["dim"] == 3
    # wrong-dim rows get no z (they are outside the contract, not outliers)
    assert r["norm_z"] is None and not r["norm_outlier"]


def test_nonfinite_flagged(qa_rows):
    for vid in (102, 103):
        r = qa_rows[vid]
        assert r["nonfinite"] and r["n_nonfinite"] == 1
        assert r["norm_z"] is None and not r["norm_outlier"]
    # NaN propagates into the norm; the flag must not depend on it
    assert math.isnan(qa_rows[102]["l2_norm"])


def test_zero_norm_flagged(qa_rows):
    r = qa_rows[104]
    assert r["zero_norm"] and r["l2_norm"] == 0.0
    assert r["norm_z"] is None and not r["norm_outlier"]


def test_explicit_expected_dim_overrides_mode(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0]),
        Row(vec_id=1, embedding=[0.0, 1.0]),
        Row(vec_id=2, embedding=[1.0, 1.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in embedqa.embedding_qa(df, expected_dim=3).collect()}
    assert out[0]["dim_mismatch"] and out[1]["dim_mismatch"]
    assert not out[2]["dim_mismatch"]


# ---------------------------------------------------------------------------
# label_noise_audit
# ---------------------------------------------------------------------------

def test_label_noise_flags_planted_mislabels(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    centers = {0: np.array([10.0, 0.0, 0.0]), 1: np.array([0.0, 10.0, 0.0]),
               2: np.array([0.0, 0.0, 10.0])}
    rows = []
    vid = 0
    for lab, c in centers.items():
        for _ in range(40):
            rows.append((vid, lab, (c + rng.normal(0, 0.5, 3)).tolist()))
            vid += 1
    # plant 5 mislabels: points drawn near center 0 but labeled 1
    planted = []
    for _ in range(5):
        rows.append((vid, 1, (centers[0] + rng.normal(0, 0.5, 3)).tolist()))
        planted.append(vid)
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    out = {r["vec_id"]: r for r in embedqa.label_noise_audit(df).collect()}
    assert len(out) == len(rows)
    for v in planted:
        assert out[v]["suspect"] is True, v
        assert out[v]["nearest_other_label"] == 0
        assert out[v]["margin"] < 0
    # clean points overwhelmingly non-suspect (5 planted pull label-1's
    # centroid slightly, but 0.5-sigma clusters 10 units apart stay clean)
    clean_suspects = [v for v, r in out.items() if r["suspect"] and v not in planted]
    assert clean_suspects == []


def test_label_noise_margin_matches_numpy(spark):
    import numpy as np

    rows = [
        (0, 0, [0.0, 0.0]), (1, 0, [1.0, 0.0]), (2, 0, [0.0, 1.0]),
        (3, 1, [5.0, 5.0]), (4, 1, [6.0, 5.0]), (5, 1, [5.0, 6.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    out = {r["vec_id"]: r for r in embedqa.label_noise_audit(df).collect()}
    c0 = np.mean([[0, 0], [1, 0], [0, 1]], axis=0)
    c1 = np.mean([[5, 5], [6, 5], [5, 6]], axis=0)
    for vid, lab, v in rows:
        v = np.asarray(v, dtype=float)
        own = float(((v - (c0 if lab == 0 else c1)) ** 2).sum())
        other = float(((v - (c1 if lab == 0 else c0)) ** 2).sum())
        r = out[vid]
        assert r["own_d2"] == round(own, 6)
        assert r["nearest_other_d2"] == round(other, 6)
        assert r["suspect"] is (other < own)
