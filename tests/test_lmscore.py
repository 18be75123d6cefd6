"""Bigram LM scoring (operators/lmscore.py) vs a hand-computed model and a
plain-python re-derivation."""

import math
from collections import Counter

from audit_anomaly_detection_etl_spark.operators import lmscore


def _py_scores(texts, train=None, min_count=1):
    train = texts if train is None else train

    def bigrams(t):
        ws = t.lower().split()
        return list(zip(ws, ws[1:]))

    c2 = Counter(b for _, t in train for b in bigrams(t))
    if min_count > 1:
        c2 = Counter({b: c for b, c in c2.items() if c >= min_count})
    tb = [b for _, t in train for b in bigrams(t)]
    c1 = Counter(w1 for w1, _ in tb)
    vocab = {w for b in tb for w in b}
    out = {}
    for did, t in texts:
        bs = bigrams(t)
        if not bs:
            continue
        s = [-math.log((c2.get(b, 0) + 1.0) / (c1.get(b[0], 0) + len(vocab))) for b in bs]
        out[did] = (len(bs), round(sum(s) / len(s), 6))
    return out


ROWS = [
    (1, "the cat sat on the mat"),
    (2, "the cat"),
    (3, "solo"),
    (4, "on the mat the cat sat"),
]


def test_self_trained_scores_match_python(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score"])
        for r in lmscore.lm_scores(df).collect()
    }
    exp = _py_scores(ROWS)
    assert got == exp
    assert 3 not in got  # zero-bigram doc excluded


def test_hand_computed_value(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["lm_score"] for r in lmscore.lm_scores(df).collect()}
    # doc2: single bigram (the,cat): c2=2, c1(the)=3, V=5 -> -ln(3/8)
    assert got[2] == round(-math.log(3.0 / 8.0), 6)


def test_cross_corpus_training(spark):
    train = spark.createDataFrame(
        [(10, "good clean text here"), (11, "good clean text again")],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(1, "good clean text"), (2, "zz qq vv")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["lm_score"] for r in lmscore.lm_scores(score, train=train).collect()}
    exp = _py_scores(
        [(1, "good clean text"), (2, "zz qq vv")],
        train=[(10, "good clean text here"), (11, "good clean text again")],
    )
    assert got == {k: v[1] for k, v in exp.items()}
    assert got[2] > got[1]  # out-of-domain text scores worse


def test_min_count_prunes_to_unseen(spark):
    rows = [(i, "aa bb") for i in range(5)] + [(99, "cc dd")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["lm_score"] for r in lmscore.lm_scores(df, min_count=3).collect()}
    exp = _py_scores(rows, min_count=3)
    assert got == {k: v[1] for k, v in exp.items()}
    # (cc,dd) pruned from the model -> scores as unseen, worse than (aa,bb)
    assert got[99] > got[0]


def test_lm_scores_approx_vocab_tier_tracks_exact(spark):
    from audit_anomaly_detection_etl_spark.operators import lmscore

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i % 5} epsilon zeta") for i in range(60)],
        "doc_id long, text string",
    )
    exact = {
        r["doc_id"]: r["lm_score"] for r in lmscore.lm_scores(docs).collect()
    }
    approx = {
        r["doc_id"]: r["lm_score"]
        for r in lmscore.lm_scores(docs, exact_vocab=False, rsd=0.02).collect()
    }
    assert set(exact) == set(approx)
    for k in exact:
        # V only Laplace-smooths the denominator: scores track within ~rsd
        assert abs(exact[k] - approx[k]) <= 0.05 * max(1.0, abs(exact[k])), k
