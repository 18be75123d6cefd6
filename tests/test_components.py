"""Connected components / dedup clustering (operators/components.py) vs a
plain-python union-find oracle, including the shapes that stress the
large-star/small-star iteration (chains, not just LSH cliques)."""

import pytest

from audit_anomaly_detection_etl_spark.operators import components


def _uf_components(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min member id
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "doc_a string, doc_b string")
    return {
        r["node"]: r["component"]
        for r in components.connected_components(df).collect()
    }


def test_chain_converges_to_single_component(spark):
    # a path graph a-b-c-...-j: worst case for naive label propagation
    ids = [f"n{i:02d}" for i in range(10)]
    edges = list(zip(ids, ids[1:]))
    got = _run(spark, edges)
    assert got == {n: "n00" for n in ids}


def test_multiple_clusters_and_cliques(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("a", "c"),      # clique {a,b,c}
        ("x", "y"),                               # pair {x,y}
        ("p", "q"), ("q", "r"), ("r", "s"),       # chain {p,q,r,s}
    ]
    nodes = {n for e in edges for n in e}
    exp = _uf_components(nodes, edges)
    assert _run(spark, edges) == exp


def test_duplicate_and_reversed_edges_are_harmless(spark):
    edges = [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c")]
    got = _run(spark, edges)
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_dedup_clusters_verdicts(spark):
    docs = spark.createDataFrame(
        [(f"d{i}",) for i in range(6)], "doc_id string"
    )
    pairs = spark.createDataFrame(
        [("d0", "d3"), ("d3", "d5"), ("d1", "d2")], "doc_a string, doc_b string"
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["keep"])
        for r in components.dedup_clusters(docs, pairs).collect()
    }
    assert got["d0"] == ("d0", 3, True)
    assert got["d3"] == ("d0", 3, False)
    assert got["d5"] == ("d0", 3, False)
    assert got["d1"] == ("d1", 2, True)
    assert got["d2"] == ("d1", 2, False)
    assert got["d4"] == ("d4", 1, True)  # singleton keeps itself


def test_empty_pairs_all_singletons(spark):
    docs = spark.createDataFrame([("a",), ("b",)], "doc_id string")
    pairs = spark.createDataFrame([], "doc_a string, doc_b string")
    got = {r["doc_id"]: r.asDict() for r in components.dedup_clusters(docs, pairs).collect()}
    assert all(
        v["cluster_id"] == k and v["cluster_size"] == 1 and v["keep"]
        for k, v in got.items()
    )


@pytest.mark.parametrize("n", [33])
def test_random_graph_matches_union_find(spark, n):
    import random

    rng = random.Random(7)
    nodes = [f"v{i:03d}" for i in range(n)]
    edges = [tuple(rng.sample(nodes, 2)) for _ in range(n // 2)]
    exp = _uf_components({x for e in edges for x in e}, edges)
    assert _run(spark, edges) == exp
