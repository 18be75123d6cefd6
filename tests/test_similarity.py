"""Embedding-LSH scale controls (bits/bands/bucket bound) + recall vs exact,
and shingle-kernel parity on non-ASCII whitespace."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from audit_anomaly_detection_etl_spark.functions import text as T
from audit_anomaly_detection_etl_spark.operators import similarity


def _unit(rng, d=similarity.EMB_DIM):
    v = rng.standard_normal(d)
    return v / np.linalg.norm(v)


@pytest.fixture(scope="module")
def planted(spark):
    """200 random unit vectors + 20 queries that are tight near-dups
    (cos ~0.995) of base vectors 0..19."""
    rng = np.random.default_rng(99)
    base = np.stack([_unit(rng) for _ in range(200)])
    queries = []
    for i in range(20):
        v = base[i] + 0.10 * _unit(rng)
        queries.append(v / np.linalg.norm(v))
    mk = lambda mat, off: spark.createDataFrame(
        [(off + i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id int, embedding array<float>",
    )
    return mk(base, 0), mk(np.stack(queries), 1000)


def test_multiband_recall_beats_single_band(planted):
    base, queries = planted
    # ground truth: nearest base neighbor of query 1000+i is i (planted twin)
    exact = {
        r["query_id"]: r["neighbor_id"]
        for r in similarity.cosine_knn(base, queries, k=1).collect()
    }
    assert sum(exact[1000 + i] == i for i in range(20)) == 20

    def recall(n_bits, n_bands):
        got = {
            r["query_id"]: r["neighbor_id"]
            for r in similarity.lsh_ann_knn(
                base, queries, k=1, n_bits=n_bits, n_bands=n_bands
            ).collect()
        }
        return sum(got.get(1000 + i) == i for i in range(20)) / 20.0

    r_multi = recall(16, 4)
    r_single = recall(16, 1)
    assert r_multi >= r_single
    assert r_multi >= 0.8  # cos~0.995 twins: per-band hit ~0.55, 4 bands ~0.96


def test_neardup_multiband_finds_planted_pairs(planted):
    base, queries = planted
    both = base.unionByName(queries)
    pairs = similarity.embedding_neardup_pairs(
        both, threshold=0.97, n_bits=16, n_bands=4
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    hits = sum((i, 1000 + i) in found for i in range(20))
    assert hits >= 16  # >= 80% recall on cos~0.995 pairs
    for r in pairs:
        assert r["cos"] >= 0.97  # precision exact by construction


def test_bucket_bound_drops_hot_bucket(spark):
    """50 identical vectors collapse into one bucket; max_bucket=10 drops it
    (candidates lost = recall control), max_bucket=None keeps all pairs."""
    rng = np.random.default_rng(5)
    v = _unit(rng)
    rows = [(i, [float(x) for x in v]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    dense = similarity.embedding_neardup_pairs(df, threshold=0.99, max_bucket=None)
    assert dense.count() == 50 * 49 // 2
    bounded = similarity.embedding_neardup_pairs(df, threshold=0.99, max_bucket=10)
    assert bounded.count() == 0


def test_hyperplane_slices_are_disjoint_and_stable():
    b0 = similarity.hyperplanes(16, 0)
    b1 = similarity.hyperplanes(16, 1)
    assert b0[:8] == similarity.HYPERPLANES  # band-0 prefix = oracle literals
    assert b0 != b1 and len(b0) == len(b1) == 16
    assert similarity.hyperplanes(16, 1) == b1  # deterministic pool


def test_shingles_fast_matches_native_on_unicode_whitespace(spark):
    texts = [
        "plain ascii three word shingle text",
        "tab\tand\nnewline  collapse   here ok",
        "nbsp\xa0stays\xa0joined like spark says",  # java \s does NOT split NBSP
        "trailing spaces   ",
        "",
        None,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = df.select(
        T.shingles(F.col("text"), 3).alias("native"),
        T.shingles_fast(F.col("text"), 3).alias("fast"),
    ).collect()
    for r in out:
        assert sorted(r["native"]) == sorted(r["fast"] or [])


# ---------------------------------------------------------------------------
# IVF (coarse-quantizer lists + nprobe probing)
# ---------------------------------------------------------------------------

def test_kmeans_fit_deterministic_unit_centroids(planted):
    base, _ = planted
    c1 = similarity.kmeans_fit(base, n_centroids=4, sample_n=128, seed=7)
    c2 = similarity.kmeans_fit(base, n_centroids=4, sample_n=128, seed=7)
    assert c1 == c2  # bit-stable across invocations
    for c in c1:
        assert abs(float(np.linalg.norm(c)) - 1.0) < 1e-5


def test_ivf_assign_matches_numpy_argmax(spark):
    rng = np.random.default_rng(5)
    vecs = np.stack([_unit(rng) for _ in range(50)])
    # the DataFrame column is array<float>: model the same float32 rounding
    # before the float64 dot, so near-tie argmax agrees with the plan
    vecs = vecs.astype(np.float32).astype(np.float64)
    C = np.asarray(similarity.CENTROIDS)
    expect = np.argmax(vecs @ C.T, axis=1)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id int, embedding array<float>",
    )
    got = {
        r["vec_id"]: r["list_id"]
        for r in df.select(
            "vec_id",
            similarity.ivf_assign("embedding", similarity.CENTROIDS).alias("list_id"),
        ).collect()
    }
    for i in range(50):
        assert got[i] == int(expect[i])


def test_ivf_recall_grows_with_nprobe_and_exact_at_full_probe(planted):
    base, queries = planted
    cents = similarity.kmeans_fit(base, n_centroids=8, sample_n=200, seed=3)

    def recall(nprobe):
        got = {
            r["query_id"]: r["neighbor_id"]
            for r in similarity.ivf_knn(
                base, queries, centroids=cents, k=1, nprobe=nprobe
            ).collect()
        }
        return sum(got.get(1000 + i) == i for i in range(20)) / 20.0

    r1, r8 = recall(1), recall(8)
    # planted twins are extremely close -> even 1 probe finds most; probing
    # every list degenerates to exact brute force
    assert r8 == 1.0
    assert r1 <= r8 and r1 >= 0.5


def test_ivf_probes_orders_by_dot_then_index(spark):
    # a query exactly ON centroid 3: its first probe must be list 3
    v = [float(x) for x in similarity.CENTROIDS[3]]
    df = spark.createDataFrame([(0, v)], "vec_id int, embedding array<float>")
    probes = df.select(
        similarity.ivf_probes("embedding", similarity.CENTROIDS, 2).alias("p")
    ).collect()[0]["p"]
    assert probes[0] == 3 and len(probes) == 2
