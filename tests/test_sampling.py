"""Split assignment + mixing weights (operators/sampling.py) vs hashlib /
numpy re-derivations."""

import hashlib
import math

from pyspark.sql import functions as F

from audit_anomaly_detection_etl_spark.operators import sampling


def _py_bucket(doc_id, salt=""):
    return int(hashlib.md5((str(doc_id) + salt).encode()).hexdigest()[:4], 16)


def test_split_thresholds_cover_space():
    ths = sampling.split_thresholds(sampling.DEFAULT_SPLITS)
    assert ths == [("train", 58982), ("val", 62259), ("test", 65536)]
    # non-normalized fractions are normalized
    ths2 = sampling.split_thresholds([("a", 2.0), ("b", 2.0)])
    assert ths2 == [("a", 32768), ("b", 65536)]


def test_assign_split_matches_hashlib(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    got = {
        r["doc_id"]: r["split"]
        for r in sampling.assign_split(df).collect()
    }
    ths = sampling.split_thresholds(sampling.DEFAULT_SPLITS)
    for i in range(300):
        b = _py_bucket(i)
        exp = next(name for name, bound in ths if b < bound)
        assert got[i] == exp, (i, b)


def test_salt_rerolls_but_is_deterministic(spark):
    df = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    s1 = {r["doc_id"]: r["split"] for r in sampling.assign_split(df, salt="a").collect()}
    s1b = {r["doc_id"]: r["split"] for r in sampling.assign_split(df, salt="a").collect()}
    s2 = {r["doc_id"]: r["split"] for r in sampling.assign_split(df, salt="b").collect()}
    assert s1 == s1b
    assert s1 != s2  # virtually certain over 400 ids
    # both salts still produce roughly 90/5/5
    for s in (s1, s2):
        frac = sum(1 for v in s.values() if v == "train") / len(s)
        assert 0.8 < frac < 0.98


def test_mixing_weights_math(spark):
    rows = [("s0", "a b c"), ("s0", "d e"), ("s1", "f g h i j k l m n o")]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r["source"]: r.asDict() for r in sampling.mixing_weights(df, alpha=0.5).collect()}
    n = {"s0": 5.0, "s1": 10.0}
    tot = 15.0
    tot_pw = sum(math.pow(v, 0.5) for v in n.values())
    for s, nt in n.items():
        w = math.pow(nt, 0.5) / tot_pw
        p = nt / tot
        assert got[s]["n_tokens"] == int(nt)
        assert abs(got[s]["p_tokens"] - round(p, 6)) < 1e-9
        assert abs(got[s]["weight"] - round(w, 6)) < 1e-9
        assert abs(got[s]["sample_factor"] - round(w / p, 6)) < 1e-9
    # alpha=0.5 upsamples the smaller source, downsamples the bigger
    assert got["s0"]["sample_factor"] > 1 > got["s1"]["sample_factor"]


def test_mixing_weights_alpha_one_is_natural(spark):
    rows = [("s0", "a b"), ("s1", "c d e f")]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r["source"]: r["sample_factor"] for r in sampling.mixing_weights(df, alpha=1.0).collect()}
    assert got == {"s0": 1.0, "s1": 1.0}


def test_split_leakage_finds_planted_cross_split_dup(spark):
    from audit_anomaly_detection_etl_spark.operators import sampling

    # find two ids hashing to different splits, then give them identical text
    probe = spark.createDataFrame(
        [(f"id-{i}",) for i in range(200)], "doc_id string"
    )
    assigned = {r["doc_id"]: r["split"] for r in sampling.assign_split(probe).collect()}
    by_split = {}
    for k, v in assigned.items():
        by_split.setdefault(v, []).append(k)
    assert len(by_split) >= 2
    (s1, ids1), (s2, ids2) = sorted(by_split.items())[:2]

    rows = [(ids1[0], "THE  leaked Text"), (ids2[0], "the leaked text")]
    rows += [(i, f"unique text {i}") for i in ids1[1:4] + ids2[1:4]]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = sampling.split_leakage(docs).collect()
    assert len(out) == 1
    leak = out[0]
    assert leak["n_splits"] == 2 and leak["n_docs"] == 2
    assert leak["splits"] == ",".join(sorted([s1, s2]))
    assert leak["first_doc"] == min(ids1[0], ids2[0])


def test_mixture_materialize_converges_to_temperature_shares(spark):
    """The realized mixture's per-source doc mass must track epochs_s =
    weight/p (alpha temperature), and the copy fan-out must be exact:
    every doc appears floor(epochs) or floor(epochs)+1 times."""
    import math

    from audit_anomaly_detection_etl_spark.operators import sampling

    # two lopsided sources: 'big' 900 docs x 20 tokens, 'small' 100 x 20
    rows = []
    for i in range(900):
        rows.append((i, "big", "tok " * 20))
    for i in range(900, 1000):
        rows.append((i, "small", "tok " * 20))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = sampling.mixture_materialize(df, alpha=0.3).toPandas()

    # exact epochs from the same arithmetic
    nb, ns = 900 * 20, 100 * 20
    tot, tot_pw = nb + ns, nb**0.3 + ns**0.3
    def epochs(n):
        return (n**0.3 / tot_pw) / (n / tot)

    eb, es = epochs(nb), epochs(ns)
    per_doc = out.groupby("doc_id").size()
    by_src = out.groupby("source")["doc_id"].count()
    # per-doc copy count is floor(e) or floor(e)+1, never anything else
    for src, e, ids in (("big", eb, range(900)), ("small", es, range(900, 1000))):
        counts = {per_doc.get(i, 0) for i in ids}
        assert counts <= {math.floor(e), math.floor(e) + 1}, (src, counts)
    # realized mass within a few % of expectation (hash coin, not RNG)
    assert abs(by_src["big"] / 900 - eb) < 0.05
    assert abs(by_src["small"] / 100 - es) < 0.1
    # deterministic: second run identical
    out2 = sampling.mixture_materialize(df, alpha=0.3).toPandas()
    a = out.sort_values(["doc_id", "copy"]).reset_index(drop=True)
    b = out2.sort_values(["doc_id", "copy"]).reset_index(drop=True)
    assert a.equals(b)
