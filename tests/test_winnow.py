"""Winnowing fingerprints (functions/text.py) + winnow_neardup_pairs
(operators/dedup.py): the MOSS guarantee, degenerate rows, bucket bound."""

import hashlib

import pytest
from pyspark.sql import functions as F

from audit_anomaly_detection_etl_spark.functions import text as T
from audit_anomaly_detection_etl_spark.operators import dedup

K, W = 3, 4


def _py_winnow(text: str, k: int = K, w: int = W) -> list[str]:
    """Reference implementation: plain-python winnowing, md5-lexicographic."""
    ws = text.strip().lower().split()
    grams = [
        hashlib.md5(" ".join(ws[i : i + k]).encode()).hexdigest()
        for i in range(len(ws) - k + 1)
    ]
    if not grams:
        return []
    if len(grams) < w:
        return [min(grams)]
    seen, out = set(), []
    for j in range(len(grams) - w + 1):
        m = min(grams[j : j + w])
        if m not in seen:
            seen.add(m)
            out.append(m)
    return out


def _spark_fps(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    return {
        r["id"]: sorted(r["fps"])
        for r in df.select(
            "id", T.winnow_fingerprints(F.col("text"), K, W).alias("fps")
        ).collect()
    }


def test_matches_python_oracle(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "short one",                      # < k words -> empty
        "exactly three words",            # 1 gram < w -> single fingerprint
        "one two three four five six",    # 4 grams = w -> single window
        "",
        "a a a a a a a a a a",            # all-identical grams
    ]
    got = _spark_fps(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == sorted(_py_winnow(t)), f"text {i}"


def test_shared_passage_guarantee(spark):
    """Any shared run of >= k+w-1 words must share a fingerprint."""
    passage = "alpha beta gamma delta epsilon zeta"  # k+w-1 = 6 words
    a = "unrelated prefix words here " + passage
    b = passage + " different suffix tail tokens"
    got = _spark_fps(spark, [a, b])
    assert set(got[0]) & set(got[1])


def test_pairs_find_planted_dup_and_respect_bucket_bound(spark):
    passage = "omega psi chi phi upsilon tau sigma rho pi omicron"
    texts = [
        ("d0", "intro words then " + passage),
        ("d1", passage + " with other ending"),
        ("d2", "completely different content about something else entirely here"),
    ]
    df = spark.createDataFrame(texts, "doc_id string, text string")
    pairs = dedup.winnow_neardup_pairs(df, k=K, w=W, min_shared=2).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [("d0", "d1")]
    assert pairs[0]["shared"] >= 2
    # a max_bucket of 0 drops every fingerprint bucket -> no pairs (recall
    # control, mirrors the MinHash hot-bucket bound)
    assert dedup.winnow_neardup_pairs(df, k=K, w=W, min_shared=1, max_bucket=0).count() == 0


@pytest.mark.parametrize("n_words", [0, 1, 2, 3, 5, 6, 7, 20])
def test_fingerprint_count_bounds(spark, n_words):
    text = " ".join(f"w{i}" for i in range(n_words))
    got = _spark_fps(spark, [text])[0]
    assert got == sorted(_py_winnow(text))
