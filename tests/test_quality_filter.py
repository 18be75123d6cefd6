import pytest
from pyspark.sql import Row

from audit_anomaly_detection_etl_spark.operators import quality_filter as qf


@pytest.fixture(scope="module")
def verdicts(spark):
    long_clean = " ".join(
        "the quick brown fox jumps over a lazy dog near the old mill stream "
        "while birds of every kind sing to greet the bright morning sun".split()
    )
    rows = [
        Row(doc_id="keep", text=long_clean),
        Row(doc_id="short", text="just five small words here"),
        Row(doc_id="shouty", text="!!! ??? ### $$$ %%% " + long_clean),
        Row(doc_id="nostop", text=" ".join(f"token{i} widget gadget gizmo" for i in range(8))),
        Row(doc_id="loop", text="the spam spam spam spam " * 8 + long_clean),
        Row(doc_id="empty", text="   "),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    return {r["doc_id"]: r for r in qf.filter_verdicts(df).collect()}


def test_clean_doc_kept(verdicts):
    r = verdicts["keep"]
    assert r["keep"] and r["n_fail"] == 0 and r["first_fail"] is None


def test_short_doc_first_fail(verdicts):
    r = verdicts["short"]
    assert not r["keep"] and r["too_short"] and r["first_fail"] == "too_short"


def test_punct_rule_fires(verdicts):
    r = verdicts["shouty"]
    assert r["high_punct"] and r["first_fail"] == "high_punct"


def test_stopword_rule_fires(verdicts):
    r = verdicts["nostop"]
    assert r["low_stopword"] and not r["too_short"]
    # repetition also fires (tiny vocab), but stopword attributes first
    assert r["first_fail"] == "low_stopword"


def test_repetition_rule_fires_alone(verdicts):
    r = verdicts["loop"]
    assert r["repetitive"] and r["first_fail"] == "repetitive"
    assert not (r["too_short"] or r["high_punct"] or r["low_stopword"])


def test_empty_doc_structural_fail(verdicts):
    r = verdicts["empty"]
    assert r["n_words"] == 0 and r["too_short"]
    # empty docs never reach the repetition join; flag must default False
    assert not r["repetitive"] and r["first_fail"] == "too_short"
