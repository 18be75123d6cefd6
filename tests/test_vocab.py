"""Vocabulary / distinct-count operator (operators/vocab.py): exact tier
matches a pandas re-derivation; approx tier (HLL) lands within tolerance of
exact — the round-2 review's approx-distinct switch, mirroring the
exact/approx quantile switch in operators/outliers.py."""

import pytest
from pyspark.sql import functions as F

from audit_anomaly_detection_etl_spark.operators import vocab


@pytest.fixture(scope="module")
def docs(spark, sf001):
    return spark.read.parquet(f"{sf001}/documents.parquet")


def test_vocabulary_exact_matches_brute_force(spark, docs):
    got = {r["token"]: (r["tf"], r["df"]) for r in vocab.vocabulary(docs, min_tf=20).collect()}
    pdf = docs.select("doc_id", "text").toPandas()
    tf: dict = {}
    df_sets: dict = {}
    for _i, row in pdf.iterrows():
        toks = " ".join(row["text"].lower().split()).split()
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
            df_sets.setdefault(t, set()).add(row["doc_id"])
    exp = {t: (n, len(df_sets[t])) for t, n in tf.items() if n >= 20}
    assert got == exp and len(got) > 0


def test_approx_df_within_tolerance(spark, docs):
    exact = {r["token"]: r["df"] for r in vocab.vocabulary(docs, min_tf=20).collect()}
    approx = {
        r["token"]: r["df"]
        for r in vocab.vocabulary(docs, min_tf=20, exact=False, rsd=0.02).collect()
    }
    assert set(exact) == set(approx)  # tf threshold unaffected by the switch
    for t, d in exact.items():
        assert abs(approx[t] - d) <= max(3.0, 0.1 * d), (t, d, approx[t])


def test_distinct_counts_tiers(spark, sf001):
    ev = spark.read.parquet(f"{sf001}/events.parquet")
    exact = {
        r["user_id"]: r
        for r in vocab.distinct_counts(ev, "user_id", "event_type").collect()
    }
    approx = {
        r["user_id"]: r
        for r in vocab.distinct_counts(ev, "user_id", "event_type", exact=False).collect()
    }
    assert set(exact) == set(approx)
    for u, r in exact.items():
        assert r["n_rows"] == approx[u]["n_rows"]
        # event_type cardinality is tiny (5) — HLL is exact there
        assert approx[u]["n_distinct"] == r["n_distinct"]


def test_approx_plan_has_no_expand(spark, docs):
    """The point of the switch at scale: exact distinct plans an Expand/
    double-shuffle; the HLL path is a plain partial+final hash aggregate."""
    from scripts.audit_plans import plan_of

    exact_plan = plan_of(vocab.vocabulary(docs, min_tf=20, exact=True))
    approx_plan = plan_of(vocab.vocabulary(docs, min_tf=20, exact=False))
    assert "Expand" in exact_plan or exact_plan.count("HashAggregate") >= 4
    assert "Expand" not in approx_plan
    assert approx_plan.count("Exchange") <= exact_plan.count("Exchange")


def test_zipf_audit_separates_natural_from_uniform(spark):
    """A corpus drawn from a true Zipf law fits slope ~ -1 with high r2; a
    uniform-frequency vocabulary is flat and fails the audit."""
    from audit_anomaly_detection_etl_spark.operators import vocab

    # deterministic zipf corpus: term k (1-based) appears floor(2000/k) times
    zipf_docs = []
    for k in range(1, 101):
        zipf_docs.extend([f"term{k:03d}"] * (2000 // k))
    df = spark.createDataFrame(
        [(" ".join(zipf_docs),)], "text string"
    )
    r = vocab.zipf_audit(df, top_n=100).collect()[0]
    assert r["n_terms"] == 100
    assert r["top_tf"] == 2000
    assert -1.1 < r["slope"] < -0.9
    assert r["r2"] > 0.99
    assert r["zipf_ok"] is True

    flat = spark.createDataFrame(
        [(" ".join([f"w{k}" for k in range(200)] * 10),)], "text string"
    )
    r = vocab.zipf_audit(flat, top_n=100).collect()[0]
    assert r["slope"] == 0.0 or abs(r["slope"]) < 0.05
    assert r["zipf_ok"] is False


def test_vocab_divergence_bounds(spark):
    """Identical slices -> JSD ~ 0; disjoint vocabularies -> JSD = ln 2."""
    from pyspark.sql import functions as F

    from audit_anomaly_detection_etl_spark.operators import vocab

    same = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(200)], "i long, text string"
    )
    r = vocab.vocab_divergence(same, F.col("i") % 2 == 0).collect()[0]
    assert r["jsd"] == 0.0
    assert r["diverged"] is False

    disjoint = spark.createDataFrame(
        [(0, "aaa bbb ccc")] * 100 + [(1, "xxx yyy zzz")] * 100,
        "side long, text string",
    )
    r = vocab.vocab_divergence(disjoint, F.col("side") == 0).collect()[0]
    assert r["jsd_norm"] == 1.0  # ln2-normalized, fully disjoint
    assert r["diverged"] is True
    assert r["k"] == 6
