"""Sequence packing: map documents to fixed-size training context windows.

Pretraining consumes documents as one concatenated token stream cut into
``ctx``-token windows ("packs"); a document therefore lands in a contiguous
pack range determined purely by its token offset in its stream. This module
computes that assignment as data: per document, its stream token offsets and
``[start_pack, end_pack]`` span — the bookkeeping a data pipeline needs for
epoch planning, contamination tracing (which eval pack saw which doc) and
pack-boundary statistics.

No reference-repo analogue — training-data-pipeline extension surface, like
dedup/ANN/vocab.

Scale shape: one scan + a per-stream window cumulative sum (ROWS frame,
unique order key). Streams are the natural parallel unit — real pipelines
pack each shard independently, so ``stream_col`` at 10^12 docs is a shard
id with millions of values, never a handful of hot streams; the window is
always partitioned (audit_plans.py bans the unpartitioned form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T


def segment_plan(
    df: DataFrame,
    id_col: str = "clip_id",
    dur_col: str = "dur_ms",
    window_ms: int = 30_000,
    hop_ms: int = 15_000,
) -> DataFrame:
    """Fixed-window segmentation plan: map each item of duration ``dur_col``
    (ms) to overlapping training windows of ``window_ms`` advancing by
    ``hop_ms`` — the standard chunking step that turns long recordings into
    trainable examples (ASR/SSL pipelines window 30 s context from
    arbitrary-length clips).

    Segment ``k`` covers ``[k*hop, min(k*hop + window, dur))``; the last
    window starts at the smallest multiple of ``hop`` whose window reaches
    ``dur`` (``k_max = ceil((dur - window) / hop)`` when ``dur > window``,
    else 0), so every sample is covered and no window starts past the end.
    Items with ``dur <= 0`` emit no segments.

    Purely declarative: one projection + ``explode(sequence(...))`` —
    codegen end-to-end, no shuffle, no UDF; output rows ~ ``dur/hop`` per
    item, generated executor-side. ``k_max >= 0`` always, so the
    descending-``sequence`` pitfall (CLAUDE.md) cannot trigger.
    """
    if window_ms <= 0 or hop_ms <= 0:
        raise ValueError("window_ms and hop_ms must be positive")
    dur = F.col(dur_col).cast("long")
    k_max = F.when(
        dur <= F.lit(window_ms), F.lit(0).cast("long")
    ).otherwise(F.ceil((dur - F.lit(window_ms)) / F.lit(float(hop_ms))).cast("long"))
    segs = df.where(dur > 0).select(
        F.col(id_col),
        dur.alias("__dur"),
        F.explode(F.sequence(F.lit(0).cast("long"), k_max)).alias("seg_idx"),
    )
    start = F.col("seg_idx") * F.lit(hop_ms)
    end = F.least(start + F.lit(window_ms), F.col("__dur"))
    return segs.select(
        id_col,
        "seg_idx",
        start.cast("long").alias("start_ms"),
        end.cast("long").alias("end_ms"),
        (end - start).cast("long").alias("seg_ms"),
    )


def pack_offsets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_col: str = "source",
    ctx: int = 512,
) -> DataFrame:
    """Per-doc pack assignment: ``(doc_id, stream, n_tokens, start_pack,
    end_pack, n_packs)`` under concat-and-chunk packing with ``ctx``-token
    windows, documents ordered by ``id_col`` within each stream.

    Token counts are whitespace words (T.words) — swap in
    T.bpe_token_count for the BPE-ish estimate; the offset algebra is
    count-function-agnostic. Zero-token docs are excluded (they occupy no
    stream positions).
    """
    tok = F.size(T.words(T.normalized_text(F.col(text_col)))).cast("long")
    w = (
        Window.partitionBy("stream")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(stream_col).alias("stream"),
        tok.alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    d = d.withColumn("cum", F.sum("n_tokens").over(w))
    start_pack = F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(float(ctx)))
    end_pack = F.floor((F.col("cum") - 1) / F.lit(float(ctx)))
    return d.select(
        "doc_id",
        "stream",
        "n_tokens",
        start_pack.cast("long").alias("start_pack"),
        end_pack.cast("long").alias("end_pack"),
        (end_pack - start_pack + 1).cast("long").alias("n_packs"),
    )
