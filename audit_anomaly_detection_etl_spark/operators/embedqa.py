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
        # a NULL vector (upstream embedding job emitted nothing) must be
        # FLAGGED, not NULL-flagged: norm 0.0 puts it on the zero_norm
        # verdict, so `WHERE zero_norm` catches it — otherwise every flag
        # is NULL and the row silently escapes all downstream filters.
        # Matches the q83 oracle's coalesce(list_sum(..), 0) exactly.
        F.when(F.col(vec_col).isNull(), F.lit(0.0))
        .otherwise(_l2_norm(F.col(vec_col)))
        .alias("__norm"),
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


def label_noise_audit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Centroid-margin label-noise screen: flag vectors that sit closer to
    ANOTHER label's centroid than to their own — the classic first-pass
    mislabeled-example detector (the cheap end of confident-learning; a
    vector whose margin is negative is either labeled wrong or lives on a
    genuine class boundary, and both deserve human eyes before training).

    Two narrow passes over the vectors, both JVM-side:
    1. centroids: posexplode -> (label, pos) avg -> re-assembled per-label
       array (n_labels rows — tiny). The explode multiplies rows by dim but
       feeds straight into a two-phase hash agg (map-side combine), so the
       shuffle carries n_labels x dim rows per task.
    2. scoring: vectors crossJoin the BROADCAST centroid table; squared
       distance is a sequential zip_with/aggregate fold (no explode, no
       Python); one hash agg to (vec, own/nearest-other) grain. The
       nearest-other argmin is min(struct(d2, label)) — deterministic
       tie-break by label on both engines.

    Deliberately NOT localCheckpoint'ed: the two consumers of the input need
    different projections and at 10^12 rows re-scanning pruned parquet twice
    beats pinning the full vector column once.

    Returns (vec_id, label, own_d2, nearest_other_label, nearest_other_d2,
    margin, suspect): margin = nearest_other_d2 - own_d2, suspect when
    margin < 0.
    """
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("label"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).where(F.col("v").isNotNull() & F.col("label").isNotNull())

    pos = e.select("label", F.posexplode("v").alias("pos", "val"))
    cpos = pos.groupBy("label", "pos").agg(F.avg("val").alias("c"))
    cent = (
        cpos.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("cv")
        )
        .select(F.col("label").alias("cand"), "cv")
    )

    d2 = F.aggregate(
        F.zip_with("v", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    d = e.crossJoin(F.broadcast(cent)).select("vec_id", "label", "cand", d2.alias("d2"))
    agg = d.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("cand") == F.col("label"), F.col("d2"))).alias("own_d2"),
        F.min(
            F.when(
                F.col("cand") != F.col("label"), F.struct(F.col("d2"), F.col("cand"))
            )
        ).alias("m"),
    )
    margin = F.col("m.d2") - F.col("own_d2")
    return agg.select(
        "vec_id",
        "label",
        F.round("own_d2", 6).alias("own_d2"),
        F.col("m.cand").alias("nearest_other_label"),
        F.round("m.d2", 6).alias("nearest_other_d2"),
        F.round(margin, 6).alias("margin"),
        (margin < 0).alias("suspect"),
    )
