"""Deterministic corpus splitting + temperature-weighted source mixing.

Two bookkeeping operators every training-data pipeline needs downstream of
dedup/filtering:

- ``assign_split``: stable train/val/test assignment by hashing the doc id
  into a 16-bit bucket (md5 prefix — portable across engines, unlike
  xxhash64 which DuckDB lacks). Membership is a pure function of
  (doc_id, salt), so re-runs, backfills and cross-engine audits agree;
  changing ``salt`` re-rolls the split without touching the data.
- ``mixing_weights``: per-source sampling weights under temperature
  ``alpha`` (w_s proportional to p_s^alpha, the multilingual/multi-corpus
  mixing rule from the XLM-R / T5 lineage): alpha=1 is natural
  proportions, alpha=0 uniform over sources; ``sample_factor`` = how many
  epochs of a source a weighted sampler consumes relative to one natural
  pass.

No reference-repo analogue — training-data-pipeline extension surface
(README "training-data ops").

Scale shape: split assignment is a per-row codegen expression (one md5 +
mod — no shuffle at all until the caller aggregates); mixing is a two-phase
hash agg to ~#sources rows, then a broadcast join against the 1-row total
(never an unpartitioned window).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

DEFAULT_SPLITS: tuple[tuple[str, float], ...] = (
    ("train", 0.90),
    ("val", 0.05),
    ("test", 0.05),
)

_BUCKETS = 65536  # first 4 md5 hex chars


def split_thresholds(splits: Sequence[tuple[str, float]]) -> list[tuple[str, int]]:
    """Cumulative upper bucket bounds per split over the 16-bit space. The
    last split absorbs the floor() remainder so bounds always cover
    [0, 65536)."""
    total = sum(f for _, f in splits)
    acc = 0.0
    out = []
    for name, frac in splits[:-1]:
        acc += frac
        out.append((name, int(_BUCKETS * acc / total)))
    out.append((splits[-1][0], _BUCKETS))
    return out


def hash_bucket(id_col: Column, salt: str = "") -> Column:
    """16-bit bucket from the md5 hex prefix of (id || salt) — identical in
    any engine with md5 + hex parsing (DuckDB: ('0x'||substr(md5(..),1,4))::BIGINT)."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("int")


def assign_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    splits: Sequence[tuple[str, float]] = DEFAULT_SPLITS,
    salt: str = "",
) -> DataFrame:
    """``docs`` plus a ``split`` column (deterministic hash membership)."""
    b = hash_bucket(F.col(id_col), salt)
    expr = None
    for name, bound in split_thresholds(splits):
        cond = b < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return docs.withColumn("split", expr)


def split_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    splits: Sequence[tuple[str, float]] = DEFAULT_SPLITS,
    salt: str = "",
) -> DataFrame:
    """Per (source, split): doc and token counts — the leakage-audit table
    (val/test token mass per source, and that no source is train-only)."""
    d = assign_split(docs, id_col, splits, salt)
    tok = F.size(T.words(T.normalized_text(F.col(text_col)))).cast("long")
    return (
        d.select(F.col(source_col).alias("source"), "split", tok.alias("nt"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
        )
    )


def mixing_weights(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.3,
) -> DataFrame:
    """Per source: ``(source, n_docs, n_tokens, p_tokens, weight,
    sample_factor)`` where weight ∝ p_tokens^alpha (normalized) and
    sample_factor = weight / p_tokens (expected epochs under the weighted
    sampler per natural epoch). Ratios rounded to 6dp (cross-engine float
    parity — see queries.py header)."""
    tok = F.size(T.words(T.normalized_text(F.col(text_col)))).cast("long")
    per = (
        docs.select(F.col(source_col).alias("source"), tok.alias("nt"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("nt").alias("n_tokens"))
    )
    # totals via broadcast 1-row aggregates — never an unpartitioned window
    tot = per.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))).alias("tot_pw"),
    )
    j = per.crossJoin(F.broadcast(tot))
    # try_divide: a ZERO-token source (all docs empty/whitespace — a broken
    # extractor is exactly what this report surfaces) makes p = 0 and
    # sample_factor = 0/0, which ANSI plain division turns into a
    # query-killing DIVIDE_BY_ZERO. NULL matches DuckDB's x/0 semantics, so
    # the oracle needs no change.
    p = F.try_divide(F.col("n_tokens").cast("double"), F.col("tot_tokens"))
    w = F.try_divide(
        F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)), F.col("tot_pw")
    )
    return j.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(p, 6).alias("p_tokens"),
        F.round(w, 6).alias("weight"),
        F.round(F.try_divide(w, p), 6).alias("sample_factor"),
    )


def split_leakage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    splits: Sequence[tuple[str, float]] = DEFAULT_SPLITS,
    salt: str = "",
    prefix_chars: int | None = None,
) -> DataFrame:
    """Cross-split contamination: normalized-content fingerprints
    (T.fingerprint_md5) that land in MORE than one split — the id-hash
    splitter guarantees a *document* never straddles splits, but duplicate
    *content* under different ids does, and an eval example whose text sits
    in train is leakage that silently inflates benchmark scores.

    ``prefix_chars`` switches the key from the whole normalized text to its
    first N characters — the prefix-dedup heuristic (near-identical
    train/eval examples usually share an opening even when tails diverge).

    Per leaked fingerprint: distinct-split count, doc count, the sorted
    split list, and a representative doc id. Hash agg on the fingerprint
    (map-side combine); per-group state is bounded by ``len(splits)``, so
    10^12 docs reduce to one shuffle of fingerprint groups — the same
    budget as exact dedup (q20).
    """
    d = assign_split(docs, id_col, splits, salt)
    norm = T.normalized_text(F.col(text_col))
    if prefix_chars is not None:
        norm = F.substring(norm, 1, prefix_chars)
    g = (
        d.select(
            F.md5(norm).alias("text_md5"),
            "split",
            F.col(id_col).alias("doc_id"),
        )
        .groupBy("text_md5")
        .agg(
            # distinct grain: per text_md5 over the SPLIT label domain
            # (<= #splits, a handful) — exact is free
            F.countDistinct("split").cast("long").alias("n_splits"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.array_join(F.array_sort(F.collect_set("split")), ",").alias("splits"),
            F.min("doc_id").alias("first_doc"),
        )
    )
    return g.where(F.col("n_splits") > 1)


def mixture_materialize(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.3,
    rate: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Materialize the temperature-weighted training mixture that
    ``mixing_weights`` only *reports*: each document is emitted
    ``floor(epochs_s)`` times plus one more with probability
    ``frac(epochs_s)``, where ``epochs_s = rate * sample_factor(source)``
    — so low-resource sources upsample (multiple copies) and dominant
    sources downsample (hash-thresholded keep), and the realized token
    shares converge to the alpha-temperature distribution.

    Determinism contract (same as assign_split/q74): the extra-copy coin is
    ``hash16(doc_id || salt) < floor(frac * 65536)`` — a pure function of
    the id, so re-runs, backfills and both engines agree row-for-row; no
    RNG state anywhere.

    Scale shape: per-source epochs are aggregate-grain (one row per source,
    broadcast back); the copy fan-out is ``explode(sequence(1, n))`` guarded
    for n < 1 (F.sequence runs DESCENDING on an empty range — see CLAUDE.md)
    — a narrow projection, no shuffle beyond the weights aggregation.

    Returns (doc_id, source, copy) with copy in [1, n_copies].
    """
    # same aggregates as mixing_weights but UNROUNDED (the report rounds for
    # display; the sampler must not compound rounding)
    tok = F.size(T.words(T.normalized_text(F.col(text_col)))).cast("long")
    per = (
        docs.select(F.col(source_col).alias("source"), tok.alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").alias("n_tokens"))
    )
    tot = per.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))).alias("tot_pw"),
    )
    # try_divide (see mixing_weights): a zero-token source would otherwise
    # abort the whole materialization with DIVIDE_BY_ZERO under ANSI; NULL
    # epochs flow to NULL n_copies, which the >= 1 filter drops — a source
    # with no tokens contributes no training copies, the right verdict
    p = F.try_divide(F.col("n_tokens").cast("double"), F.col("tot_tokens"))
    wgt = F.try_divide(
        F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)), F.col("tot_pw")
    )
    factors = per.crossJoin(F.broadcast(tot)).select(
        "source", (F.lit(rate) * F.try_divide(wgt, p)).alias("epochs")
    )
    j = docs.select(
        F.col(id_col).alias("doc_id"), F.col(source_col).alias("source")
    ).join(F.broadcast(factors), "source")
    base = F.floor(F.col("epochs")).cast("int")
    frac_thresh = F.floor((F.col("epochs") - base) * _BUCKETS).cast("int")
    extra = (hash_bucket(F.col("doc_id"), salt) < frac_thresh).cast("int")
    n_copies = (base + extra).alias("n_copies")
    fan = j.select("doc_id", "source", n_copies).where(F.col("n_copies") >= 1)
    return fan.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy"),
    )
