"""PII redaction (operators/pii.py), sequence packing (operators/packing.py)
and benchmark decontamination (dedup.ngram_contamination): each operator vs a
plain-python re-derivation on small synthetic inputs."""

import re

import pytest
from pyspark.sql import functions as F

from audit_anomaly_detection_etl_spark.operators import dedup, packing, pii

ROWS = [
    ("a", "g1", "contact john.doe@example.com or +1-202-555-0147 today"),
    ("b", "g1", "server at 10.1.0.2 and 192.168.0.254 rebooted"),
    ("c", "g2", "no identifiers here at all"),
    ("d", "g2", "two mails x@y.io z@w.co plus ip 8.8.8.8"),
    ("e", "g2", ""),
]

_PY_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(ROWS, "id string, grp string, text string")


def _py_redact(s):
    for _, pat, repl in _PY_PATTERNS:
        s = re.sub(pat, repl, s)
    return s


def test_redact_matches_python_re(spark, pii_df):
    got = {
        r["id"]: r["red"]
        for r in pii_df.select("id", pii.redact(F.col("text")).alias("red")).collect()
    }
    for rid, _, text in ROWS:
        assert got[rid] == _py_redact(text), rid


def test_pii_counts_matches_python_re(spark, pii_df):
    cols = [c.alias(n) for n, c in pii.pii_counts(F.col("text")).items()]
    got = {r["id"]: r.asDict() for r in pii_df.select("id", *cols).collect()}
    for rid, _, text in ROWS:
        for name, pat, _ in _PY_PATTERNS:
            assert got[rid][name] == len(re.findall(pat, text)), (rid, name)


def test_pii_stats_grouped(spark, pii_df):
    got = {r["grp"]: r.asDict() for r in pii.pii_stats(pii_df, group_cols=["grp"]).collect()}
    assert got["g1"]["n_rows"] == 2
    assert got["g1"]["rows_with_pii"] == 2
    assert got["g1"]["n_email"] == 1 and got["g1"]["n_phone"] == 1
    assert got["g1"]["n_ipv4"] == 2
    assert got["g2"]["rows_with_pii"] == 1  # only 'd'
    assert got["g2"]["n_email"] == 2 and got["g2"]["n_ipv4"] == 1
    for g in ("g1", "g2"):
        exp = sum(
            len(t) - len(_py_redact(t)) for _, gg, t in ROWS if gg == g
        )
        assert got[g]["redacted_chars"] == exp, g


def test_pack_offsets_contiguous_stream(spark):
    # 6 docs in one stream with word counts 3,5,2,7,1,4 -> cum 3,8,10,17,18,22
    docs = [
        (f"d{i}", "s0", " ".join(["tok"] * n))
        for i, n in enumerate([3, 5, 2, 7, 1, 4])
    ] + [("z0", "s1", "a b c d e f g h")]  # second stream independent
    df = spark.createDataFrame(docs, "doc_id string, source string, text string")
    got = {r["doc_id"]: r.asDict() for r in packing.pack_offsets(df, ctx=8).collect()}
    # stream s0, ctx=8: offsets [0,3),[3,8),[8,10),[10,17),[17,18),[18,22)
    exp = {
        "d0": (0, 0, 1),
        "d1": (0, 0, 1),
        "d2": (1, 1, 1),
        "d3": (1, 2, 2),  # spans the 8/16 boundary
        "d4": (2, 2, 1),
        "d5": (2, 2, 1),
    }
    for did, (s, e, n) in exp.items():
        r = got[did]
        assert (r["start_pack"], r["end_pack"], r["n_packs"]) == (s, e, n), did
    assert (got["z0"]["start_pack"], got["z0"]["end_pack"]) == (0, 0)
    # invariant: within a stream, consecutive docs tile the token line
    assert sum(g["n_tokens"] for g in got.values() if g["stream"] == "s0") == 22


def test_pack_offsets_drops_empty_docs(spark):
    df = spark.createDataFrame(
        [("a", "s", "one two"), ("b", "s", "   "), ("c", "s", "three")],
        "doc_id string, source string, text string",
    )
    got = {r["doc_id"] for r in packing.pack_offsets(df, ctx=4).collect()}
    assert got == {"a", "c"}


def test_ngram_contamination_exact_overlap(spark):
    bench = spark.createDataFrame(
        [("b1", "the quick brown fox jumps"), ("b2", "pack my box with jugs")],
        "doc_id string, text string",
    )
    corpus = spark.createDataFrame(
        [
            ("c1", "said the quick brown fox ran"),  # shares 'the quick brown fox'
            ("c2", "totally unrelated text body here"),
            ("c3", "the quick brown fox jumps high and pack my box with jugs"),
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (r["matched_grams"], r["bench_docs"])
        for r in dedup.ngram_contamination(corpus, bench, n=4).collect()
    }
    assert "c2" not in got
    assert got["c1"] == (1, 1)
    # c3: grams of b1 present: 'the quick brown fox','quick brown fox jumps';
    # grams of b2: 'pack my box with','my box with jugs' -> 4 grams, 2 docs
    assert got["c3"] == (4, 2)


def test_ngram_contamination_max_df_drops_boilerplate(spark):
    # a gram present in 3 benchmark docs is dropped at max_df=2
    bench = spark.createDataFrame(
        [(f"b{i}", "standard header line four then unique tail %d" % i) for i in range(3)],
        "doc_id string, text string",
    )
    corpus = spark.createDataFrame(
        [("c1", "standard header line four then something else")],
        "doc_id string, text string",
    )
    assert dedup.ngram_contamination(corpus, bench, n=5).count() > 0
    hits = dedup.ngram_contamination(corpus, bench, n=5, max_df=2).count()
    assert hits == 0  # the only shared 5-gram sits in all 3 bench docs
