"""Similarity search over embedding columns (array<float>).

- ``cosine_knn``        brute-force exact top-k: broadcast the (small) query
                        set against the full base table; one scan, no shuffle
                        of the base side until the final per-query top-k.
- ``lsh_ann_knn``       random-hyperplane LSH: sign-bucket both sides on H
                        fixed hyperplanes, join on bucket, rank within
                        candidates — the 100 TB path (touches only colliding
                        buckets; recall tunable via H and multi-probe).

Dot products run JVM-side via ``zip_with``/``aggregate`` higher-order
functions in float64 — sequential fold, so results are bit-identical across
engines and parallelism levels (no Python, no pandas).

The hyperplanes are module-level constants from a seeded generator: both the
Spark plan and the DuckDB oracle inline the same literals, which is what
makes ANN testable for exact parity.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMB_DIM = 64
N_HYPERPLANES = 8
_rng = np.random.default_rng(20240601)
HYPERPLANES: list[list[float]] = [
    [round(float(x), 6) for x in _rng.standard_normal(EMB_DIM)] for _ in range(N_HYPERPLANES)
]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _dbl(c: Column) -> Column:
    return c.cast("array<double>")


def cosine_knn(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, cos, rank).

    Broadcast-join the query set (small by construction) against the base
    scan; rank with a window partitioned by query — ties break on neighbor
    id for determinism.
    """
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), _dbl(F.col(vec_col)).alias("qv")
    )
    b = base.select(F.col(id_col).alias("neighbor_id"), _dbl(F.col(vec_col)).alias("bv"))
    scored = (
        b.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cosine(F.col("qv"), F.col("bv")), 6).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def lsh_bucket(vec: Column) -> Column:
    """Sign-bit bucket string over the fixed hyperplanes ('1'/'0' x H)."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(x) for x in h])) > 0, "1").otherwise("0")
        for h in HYPERPLANES
    ]
    return F.concat(*bits)


def lsh_ann_knn(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    At scale the bucket column is precomputed and the base table is
    clustered/bucketed by it, so a query probe reads one bucket's worth of
    data instead of the full table. Recall < 1 by design; pair with
    ``cosine_knn`` on a sample to measure it.
    """
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"),
        _dbl(F.col(vec_col)).alias("qv"),
    ).withColumn("bucket", lsh_bucket(F.col("qv")))
    b = base.select(F.col(id_col).alias("neighbor_id"), _dbl(F.col(vec_col)).alias("bv")).withColumn(
        "bucket", lsh_bucket(F.col("bv"))
    )
    scored = (
        b.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cosine(F.col("qv"), F.col("bv")), 6).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def embedding_neardup_pairs(
    base: DataFrame, threshold: float = 0.8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH-bucketed self-join
    (exact cosine verification inside buckets)."""
    b = base.select(F.col(id_col).alias("id"), _dbl(F.col(vec_col)).alias("v")).withColumn(
        "bucket", lsh_bucket(F.col("v"))
    )
    a2 = b.alias("a")
    b2 = b.alias("b")
    return (
        a2.join(b2, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
