"""Similarity search over embedding columns (array<float>).

- ``cosine_knn``        brute-force exact top-k: broadcast the (small) query
                        set against the full base table; one scan, no shuffle
                        of the base side until the final per-query top-k.
- ``lsh_ann_knn``       random-hyperplane LSH: sign-bucket both sides, join on
                        bucket, rank within candidates — the 100 TB path
                        (touches only colliding buckets).
- ``embedding_neardup_pairs``  bucketed self-join near-dup mining with exact
                        cosine verification inside buckets.

Scale controls (the bits/bands/bound trade-off):
- ``n_bits`` sets bucket granularity: expected bucket size is n / 2^n_bits
  for random signs, so pick n_bits ~ log2(n / target_bucket). 8 bits (256
  buckets) is the small-data default that the DuckDB oracle inlines; at 10^9
  rows use 16-24 bits or per-bucket self-joins degenerate quadratically.
- ``n_bands`` recovers recall lost to finer buckets: b independent
  hyperplane tables; candidates collide in ANY band (same banded design as
  dedup.minhash_lsh_pairs). Per-band collision for angle theta is
  (1 - theta/pi)^n_bits; overall 1 - (1 - p)^n_bands.
- ``max_bucket`` bounds pathological buckets (duplicate-heavy corpora where
  one bucket swallows the table): oversized buckets are dropped via a
  broadcast anti-join, mirroring dedup.py's hot-bucket control. Dropped
  buckets lose candidates (recall), never precision.

Dot products run JVM-side via ``zip_with``/``aggregate`` higher-order
functions in float64 — a *sequential* fold, so signs (and hence buckets) are
bit-identical across engines and parallelism levels; that is what makes ANN
testable for exact parity (numpy's reordered summation could flip the sign
of a near-zero dot). The fold is interpreted, not codegen'd — O(dim) per bit
per row; at production scale precompute the bucket column once at ingest and
cluster/bucket the table by it, so probes never recompute it.

The hyperplanes come from one seeded generator: both the Spark plan and the
DuckDB oracle inline the same literals.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMB_DIM = 64
N_HYPERPLANES = 8  # default band-0 bits; the oracle SQL inlines these
MAX_BITS = 24
MAX_BANDS = 4
_rng = np.random.default_rng(20240601)
# one fixed pool, sliced per (band, bit): band b uses rows [b*MAX_BITS, ...)
_POOL: list[list[float]] = [
    [round(float(x), 6) for x in _rng.standard_normal(EMB_DIM)]
    for _ in range(MAX_BANDS * MAX_BITS)
]
# band 0's first 8 planes — the literals q25/q26's oracle SQL reproduces
HYPERPLANES: list[list[float]] = _POOL[:N_HYPERPLANES]


def hyperplanes(n_bits: int = N_HYPERPLANES, band: int = 0) -> list[list[float]]:
    assert n_bits <= MAX_BITS and band < MAX_BANDS
    return _POOL[band * MAX_BITS : band * MAX_BITS + n_bits]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero (or NULL) vector — e.g. a failed upstream embedding
    # job writing zeros — has norm 0, and plain division would kill the whole
    # query under ANSI mode (DIVIDE_BY_ZERO). NULL from try_divide coalesces
    # to similarity 0.0: the degenerate vector matches nothing and can never
    # outrank a genuine neighbor.
    return F.coalesce(F.try_divide(dot(a, b), norm(a) * norm(b)), F.lit(0.0))


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


def lsh_bucket(vec: Column, planes: list[list[float]] | None = None) -> Column:
    """Sign-bit bucket string ('1'/'0' per plane) over the given hyperplanes
    (default: the 8-bit band-0 set the oracle inlines)."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(x) for x in h])) > 0, "1").otherwise("0")
        for h in (planes if planes is not None else HYPERPLANES)
    ]
    return F.concat(*bits)


def _band_buckets(df: DataFrame, vec: str, n_bits: int, n_bands: int) -> DataFrame:
    """Explode each row into (band, bkey) membership rows (plus the original
    columns) — one row per band, same single-pass shape as dedup's band
    table."""
    structs = [
        F.struct(
            F.lit(b).alias("band"),
            lsh_bucket(F.col(vec), hyperplanes(n_bits, b)).alias("bkey"),
        )
        for b in range(n_bands)
    ]
    return df.select("*", F.explode(F.array(*structs)).alias("__bb")).select(
        *df.columns, F.col("__bb.band").alias("band"), F.col("__bb.bkey").alias("bkey")
    )


def _bound_buckets(bands: DataFrame, max_bucket: int | None) -> DataFrame:
    """Drop pathologically hot (band, bkey) buckets — broadcast anti-join on
    the tiny oversized-bucket list (dedup.py:162-165 pattern)."""
    if max_bucket is None:
        return bands
    sizes = bands.groupBy("band", "bkey").agg(F.count(F.lit(1)).alias("bn"))
    return bands.join(
        F.broadcast(sizes.where(F.col("bn") > max_bucket)), ["band", "bkey"], "left_anti"
    )


def lsh_ann_knn(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = N_HYPERPLANES,
    n_bands: int = 1,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Approximate top-k: candidates share any band's bucket with the query.

    At scale the band/bucket columns are precomputed and the base table is
    clustered by them, so a probe reads colliding buckets instead of the
    full table. Recall < 1 by design — tunable via (n_bits, n_bands); pair
    with ``cosine_knn`` on a sample to measure it (tests/test_similarity.py).
    """
    from pyspark.sql.window import Window

    q = _band_buckets(
        queries.select(F.col(id_col).alias("query_id"), _dbl(F.col(vec_col)).alias("qv")),
        "qv",
        n_bits,
        n_bands,
    )
    b = _band_buckets(
        base.select(F.col(id_col).alias("neighbor_id"), _dbl(F.col(vec_col)).alias("bv")),
        "bv",
        n_bits,
        n_bands,
    )
    b = _bound_buckets(b, max_bucket)
    cand = (
        b.join(F.broadcast(q), ["band", "bkey"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "neighbor_id", "bv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", F.round(cosine(F.col("qv"), F.col("bv")), 6).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


N_CENTROIDS = 8
# fixed seeded centroids (unit-normalized) for oracle-exact IVF: production
# fits them with kmeans_fit; the catalog query inlines THESE literals in
# both engines so results are bit-comparable
_crng = np.random.default_rng(20240815)
CENTROIDS: list[list[float]] = []
for _ in range(N_CENTROIDS):
    _c = _crng.standard_normal(EMB_DIM)
    _c = _c / np.linalg.norm(_c)
    CENTROIDS.append([round(float(x), 6) for x in _c])
del _c


def kmeans_fit(
    base: DataFrame,
    n_centroids: int = N_CENTROIDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 2048,
    n_iters: int = 10,
    seed: int = 0,
) -> list[list[float]]:
    """Driver-side spherical k-means on a deterministic sample — the IVF
    train step (Faiss-style: coarse quantizers are fit on a sample, never
    the full corpus; at 10^9 rows the sample is still ~10^5 vectors and fits
    on the driver). Assignment/probing stay distributed (``ivf_knn``).

    Deterministic: sample = first ``sample_n`` rows by ``id_col``; seeded
    init; argmax assignment breaks ties on the lowest centroid index; empty
    clusters keep their previous centroid. Centroids are unit-normalized and
    rounded to 6dp so they can be inlined as plan literals.
    """
    rows = (
        base.orderBy(id_col)
        .limit(sample_n)
        .select(_dbl(F.col(vec_col)).alias("v"))
        .collect()
    )
    X = np.asarray([r.v for r in rows], dtype=np.float64)
    if X.size == 0:
        raise ValueError(
            "kmeans_fit: the base table is empty — no vectors to fit "
            "centroids on."
        )
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    # fewer sample rows than requested centroids: clamp instead of letting
    # rng.choice fail with a cryptic sampling error — IVF with fewer lists
    # is still correct, just coarser
    n_centroids = min(n_centroids, len(X))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=n_centroids, replace=False)].copy()
    for _ in range(n_iters):
        assign = np.argmax(X @ C.T, axis=1)  # ties -> lowest index (numpy argmax)
        for j in range(n_centroids):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-12:
                    C[j] = m / n
    return [[round(float(x), 6) for x in c] for c in C]


def _centroid_dots(vec: str, centroids: list[list[float]]) -> list[Column]:
    return [
        dot(F.col(vec), F.array(*[F.lit(x) for x in c])) for c in centroids
    ]


def ivf_assign(vec: str, centroids: list[list[float]]) -> Column:
    """Coarse-list id: argmax centroid dot, ties to the lowest index.
    Sequential-fold dots (see module docstring) keep the assignment
    bit-identical across engines and parallelism levels."""
    ds = _centroid_dots(vec, centroids)
    best, best_d = F.lit(0), ds[0]
    for i in range(1, len(ds)):
        best = F.when(ds[i] > best_d, F.lit(i)).otherwise(best)
        best_d = F.greatest(best_d, ds[i])
    return best


def ivf_probes(vec: str, centroids: list[list[float]], nprobe: int) -> Column:
    """The ``nprobe`` nearest list ids for a query vector (dot desc, index
    asc on ties), as an array — exploded by the caller."""
    ds = _centroid_dots(vec, centroids)
    ranked = F.sort_array(
        F.array(*[F.struct((-d).alias("nd"), F.lit(i).alias("i")) for i, d in enumerate(ds)])
    )
    return F.slice(ranked, 1, nprobe).getField("i")


def ivf_knn(
    base: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]] | None = None,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: base rows are bucketed into coarse lists
    (nearest centroid); each query probes only its ``nprobe`` nearest lists;
    exact cosine ranks the candidates.

    100 TB path: ``list_id`` is computed once at ingest and the table is
    partitioned/clustered by it, so a probe's scan prunes to nprobe/n_lists
    of the data — the probe side broadcasts (queries are small by
    construction) and the base side never shuffles before the final
    per-query top-k. Recall is tunable via (n_centroids, nprobe):
    nprobe = n_centroids degenerates to exact brute force.
    """
    from pyspark.sql.window import Window

    C = centroids if centroids is not None else CENTROIDS
    b = base.select(
        F.col(id_col).alias("neighbor_id"), _dbl(F.col(vec_col)).alias("bv")
    ).withColumn("list_id", ivf_assign("bv", C))
    q = (
        queries.select(F.col(id_col).alias("query_id"), _dbl(F.col(vec_col)).alias("qv"))
        .withColumn("list_id", F.explode(ivf_probes("qv", C, nprobe)))
    )
    scored = (
        b.join(F.broadcast(q), "list_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("bv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def embedding_neardup_pairs(
    base: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = N_HYPERPLANES,
    n_bands: int = 1,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded LSH self-join with
    exact cosine verification inside buckets. Precision is exact (threshold
    applied to true cosine); bits/bands/bound set the recall/cost point."""
    b = _band_buckets(
        base.select(F.col(id_col).alias("id"), _dbl(F.col(vec_col)).alias("v")),
        "v",
        n_bits,
        n_bands,
    )
    b = _bound_buckets(b, max_bucket)
    a2 = b.alias("a")
    b2 = b.alias("b")
    pairs = (
        a2.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.select(
            "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos")
        )
        .where(F.col("cos") >= threshold)
    )
