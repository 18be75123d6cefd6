"""Embedding-column hygiene validation.

The embedding analogue of the audio payload checks (operators/payload.py):
before any dedup / ANN / training consumer touches an ``array<float>``
column, every vector needs a verdict on the failures that silently poison
downstream cosine math — wrong dimensionality (a concat/truncation bug
upstream), NaN/Inf elements (overflowed encoder), zero norm (cosine is
undefined — the all-zeros "null embedding" sentinel), and norm outliers
(an un-normalized batch mixed into a normalized corpus).

No reference-repo analogue — the reference validates scalar columns only
(src/audit_anomaly_detection/pipelines/data_quality checks); this extends
the same per-row verdict shape to vector payloads.

Scale shape (10^12 vectors): one narrow whole-stage-codegen pass computes
(dim, non-finite count, L2 norm) per vector — no shuffle, no Python; the
corpus profile (modal dim, finite-norm mean/stddev) is ONE 1-row aggregate
broadcast back, so flags are a second narrow pass. Nothing ever leaves the
JVM and the only shuffle is the 1-row aggregate's.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_INF = float("inf")


def _nonfinite_count(vec: Column) -> Column:
    """Elements that are NaN or +/-Inf (float32 payloads cast exactly to
    double, so the predicate is parity-safe across engines)."""
    return F.size(F.filter(vec, lambda x: x.isNaN() | (F.abs(x) == F.lit(_INF))))


def _l2_norm(vec: Column) -> Column:
    # element-wise cast float->double is exact; products and the ordered
    # left-fold sum are then bit-identical to DuckDB's list_sum over
    # CAST(... AS DOUBLE[]) (same parity route as similarity.cosine / q24)
    d = vec.cast("array<double>")
    return F.sqrt(F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x * x))


def embedding_qa(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    expected_dim: int | None = None,
    z_thresh: float = 4.0,
    zero_tol: float = 1e-6,
) -> DataFrame:
    """Per-vector hygiene verdict: ``(id, dim, n_nonfinite, l2_norm,
    norm_z, dim_mismatch, nonfinite, zero_norm, norm_outlier)``.

    ``expected_dim=None`` derives the contract dimension as the corpus
    modal dim (majority rules — the minority is the bug). The norm profile
    (mean/stddev) is fit only on clean vectors (right dim, finite, nonzero)
    so the outlier z is not dragged by the very rows it should flag; a
    degenerate profile (stddev 0 or a single clean row) yields NULL z and
    no outlier flags. Norm and z rounded to 6dp (cross-engine float parity
    — see queries.py header).
    """
    m = df.select(
        F.col(id_col),
        F.size(F.col(vec_col)).alias("dim"),
        _nonfinite_count(F.col(vec_col)).alias("n_nonfinite"),
        _l2_norm(F.col(vec_col)).alias("__norm"),
    )
    clean = (F.col("n_nonfinite") == 0) & (F.col("__norm") > zero_tol)
    if expected_dim is None:
        mode_dim = F.mode(F.col("dim")).alias("__dim0")
    else:
        mode_dim = F.first(F.lit(int(expected_dim))).alias("__dim0")
    # profile stats must condition on the *final* dim contract; with a
    # derived dim that needs two 1-row aggregates (mode first, then the
    # norm profile of right-dim clean rows) — both broadcast, both tiny
    prof0 = m.agg(mode_dim)
    with_dim = m.crossJoin(F.broadcast(prof0))
    clean_ok = clean & (F.col("dim") == F.col("__dim0"))
    prof = with_dim.agg(
        F.first("__dim0").alias("__dim0"),
        F.avg(F.when(clean_ok, F.col("__norm"))).alias("__mu"),
        F.stddev_samp(F.when(clean_ok, F.col("__norm"))).alias("__sd"),
    )
    j = m.crossJoin(F.broadcast(prof))
    z = F.when(
        (F.col("__sd") > 0) & clean & (F.col("dim") == F.col("__dim0")),
        (F.col("__norm") - F.col("__mu")) / F.col("__sd"),
    )
    return j.select(
        F.col(id_col),
        "dim",
        "n_nonfinite",
        F.round("__norm", 6).alias("l2_norm"),
        F.round(z, 6).alias("norm_z"),
        (F.col("dim") != F.col("__dim0")).alias("dim_mismatch"),
        (F.col("n_nonfinite") > 0).alias("nonfinite"),
        (F.col("__norm") <= zero_tol).alias("zero_norm"),
        F.coalesce(F.abs(z) > z_thresh, F.lit(False)).alias("norm_outlier"),
    )
