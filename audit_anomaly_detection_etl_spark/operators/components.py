"""Connected components + canonical-document retention for dedup pipelines.

The dedup tiers (minhash_lsh_pairs, winnow_neardup_pairs,
embedding_neardup_pairs, audiofp.neardup_pairs) emit near-duplicate PAIRS;
an actual dedup decision needs the transitive closure — duplicate CLUSTERS
— and one canonical survivor per cluster. This module closes that gap.

Algorithm: alternating large-star / small-star (the MapReduce-scale
connected-components construction — converges in O(log^2 n) rounds on any
graph, and in 1-2 rounds on the near-clique clusters LSH bucketing
produces). Each round is one shuffle-by-node; no driver-side graph state,
no collect — the edge list never leaves the executors. Per-round
``localCheckpoint`` truncates the iterative lineage so round count doesn't
compound the plan.

Component labels are the MINIMUM node id of the component (lexicographic
for string ids) — deterministic, so retention ("keep the canonical doc") is
reproducible across runs and engines.

No reference-repo analogue — training-data-pipeline extension surface like
dedup/ANN (README "training-data ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _canon(e: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (u, v) with u < v, deduped."""
    return (
        e.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to u's min neighborhood
    label m = min(N(u) + {u})."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
    return (
        sym.withColumn("m", m)
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Direct edges large->small, then connect every small neighbor (and u
    itself) to the min label of u's small neighborhood."""
    d = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    dm = d.withColumn(
        "m", F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
    )
    out = dm.select(F.col("v").alias("u"), F.col("m").alias("v")).union(
        dm.select("u", F.col("m").alias("v"))
    )
    return out.where(F.col("u") != F.col("v")).distinct()


def _edge_digest(e: DataFrame) -> tuple:
    """O(1)-width convergence probe: (count, sum of xxhash64(u,v)). One
    hash-agg job per round; a collision would need two edge sets with equal
    count AND equal 64-bit hash sum (adversarially negligible for a
    convergence check — correctness of the final labels does not depend on
    it, only the round at which iteration stops)."""
    r = e.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) sum: immune to ANSI long-overflow on the hash sum
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return (r["n"], r["h"])


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component =
    min node id of the connected component.

    ``max_iter`` is a backstop only — large-star/small-star provably
    converges in O(log^2 n) alternations and the loop exits on the first
    stable edge set (near-clique LSH clusters stabilize in 1-2 rounds).
    """
    e = _canon(
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint()
    nodes = e.select("u").union(e.select(F.col("v").alias("u"))).distinct()
    prev = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint()
        cur = _edge_digest(e)
        if cur == prev:
            break
        prev = cur
    # converged star graph: every non-root points at its root (one edge per
    # node; the min-agg is a no-op then, and keeps labels single-valued even
    # on a max_iter backstop exit)
    labels = e.groupBy(F.col("u").alias("node")).agg(
        F.min("v").alias("component")
    )
    roots = nodes.join(
        labels.select(F.col("node").alias("u")), "u", "left_anti"
    ).select(F.col("u").alias("node"), F.col("u").alias("component"))
    return labels.union(roots)


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Per-document dedup verdict from a near-dup pair list: ``(doc_id,
    cluster_id, cluster_size, keep)``. Singletons (docs in no pair) form
    their own cluster; ``keep`` marks the canonical (min-id) survivor —
    ``WHERE keep`` is the post-dedup corpus, ``WHERE NOT keep`` the
    kill-list.

    Scale shape: components over the PAIR graph (tiny vs the corpus — only
    near-dup docs appear), broadcast-joined back to the full corpus when
    small; cluster sizes via one partitioned window over cluster_id.
    """
    cc = connected_components(pairs, src=src, dst=dst).withColumnRenamed(
        "node", id_col
    )
    d = docs.select(id_col).join(cc, id_col, "left")
    d = d.select(
        id_col,
        F.coalesce("component", F.col(id_col)).alias("cluster_id"),
    )
    w = Window.partitionBy("cluster_id")
    size = F.count(F.lit(1)).over(w)
    # canonical = min doc id of the cluster WITHIN docs, not the raw
    # cluster label: when docs is a filtered subset of the pair graph's
    # nodes (quarantine removed the label doc, a re-run over a slice), the
    # min-node label may not be present and `doc_id == cluster_id` would
    # leave the whole cluster keeper-less — every copy killed. Same window
    # as cluster_size, so no extra shuffle; identical output whenever docs
    # covers the graph (min node of the component IS the min present doc).
    return d.select(
        id_col,
        "cluster_id",
        size.cast("long").alias("cluster_size"),
        (F.col(id_col) == F.min(id_col).over(w)).alias("keep"),
    )
