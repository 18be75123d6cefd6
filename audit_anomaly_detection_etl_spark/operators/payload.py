"""Audio payload validation: Arrow-batched decode + per-row invariants.

The north rule's heavy check (BASELINE.json ``input_hint``): decode codec
bytes to PCM inside *vectorized* pandas UDFs — Arrow batches, no per-row
Python serialization — and assert, per clip:

- decoded-PCM allclose vs reference at SNR >= 30 dB
- transcript byte-equality vs reference
- dur_ms consistency: dur_ms == round(n_samples / sr_hz * 1000)
- codec known / payload byte-length valid

Reference analogue: the per-event value-modification and substring checks
(SURVEY.md A10/A11) — the one place the reference's per-row semantics become
compute-heavy, hence the only Python hot path in this engine
(SURVEY.md §2.10).

Scale notes:
- ``mapInPandas`` streams Arrow batches; ``arrow_max_records`` in session.py
  bounds batch memory because clips can be minutes long. The per-batch loop
  is over *clips*, and each iteration is numpy over the whole clip — the
  Python interpreter touches each row once, the samples never.
- join with the reference table is key-equi on ``clip_id``; both sides are
  table-scale, so this is the engine's one big sort-merge join. On a real
  deployment both tables are bucketed/partitioned identically (our synth
  writes both hive-partitioned by ``part``) so a storage-partitioned join
  can elide the shuffle; AQE skew-split covers hot partitions from
  long-duration clips otherwise.
- left join: clips with no ref row still get decode/dur/codec checks; the
  SNR/transcript invariants are skipped there (referential.py reports them).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import codecs
from . import VIOLATION_COLS

SNR_THRESHOLD_DB = 30.0

REPORT_SCHEMA = (
    "clip_id string, part int, codec string, decode_ok boolean, snr_db double, "
    "dur_ok boolean, transcript_ok boolean, transcript_null boolean, has_ref boolean"
)


def _validate_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        n = len(pdf)
        out = {
            "clip_id": pdf["clip_id"].to_numpy(),
            "part": pdf["part"].to_numpy(),
            "codec": pdf["codec"].to_numpy(),
            "decode_ok": np.zeros(n, dtype=bool),
            "snr_db": np.full(n, np.nan),
            "dur_ok": np.zeros(n, dtype=bool),
            "transcript_ok": np.zeros(n, dtype=bool),
            "transcript_null": np.zeros(n, dtype=bool),
            "has_ref": np.zeros(n, dtype=bool),
        }
        raw_col = pdf["bytes"].to_numpy()
        ref_col = pdf["pcm_ref"].to_numpy()
        sr_col = pdf["sr_hz"].to_numpy()
        dur_col = pdf["dur_ms"].to_numpy()
        tr_col = pdf["transcript"].to_numpy()
        trr_col = pdf["transcript_ref"].to_numpy()
        for i in range(n):
            codec = out["codec"][i]
            raw = raw_col[i]
            try:
                pcm = codecs.decode(raw, codec)
            except ValueError:
                continue  # decode_ok stays False (unknown codec / torn bytes)
            out["decode_ok"][i] = True
            sr = int(sr_col[i])
            out["dur_ok"][i] = sr > 0 and int(dur_col[i]) == round(len(pcm) / sr * 1000)
            tr = tr_col[i]
            out["transcript_null"][i] = tr is None or (isinstance(tr, float) and np.isnan(tr))
            ref = ref_col[i]
            if ref is not None:
                out["has_ref"][i] = True
                ref_pcm = np.frombuffer(ref, dtype=np.float32)
                out["snr_db"][i] = codecs.snr_db(ref_pcm, pcm)
                trr = trr_col[i]
                out["transcript_ok"][i] = (not out["transcript_null"][i]) and tr == trr
        yield pd.DataFrame(out)


def payload_report(clips: DataFrame, clips_ref: DataFrame) -> DataFrame:
    """Per-clip validation report (REPORT_SCHEMA). Lazy: one join + one
    mapInPandas stage; column pruning keeps only the 8 needed input columns
    at the scans.
    """
    ref = clips_ref.select("clip_id", "pcm_ref", "transcript_ref")
    joined = clips.select("clip_id", "part", "bytes", "sr_hz", "dur_ms", "codec", "transcript").join(
        ref, "clip_id", "left"
    )
    return joined.mapInPandas(_validate_batches, schema=REPORT_SCHEMA)


def payload_violations(report: DataFrame) -> DataFrame:
    """VIOLATION_SCHEMA rows from the report flags. Severities rank the final
    output like the reference's (prediction, score) sort (SURVEY.md O1).
    """
    checks = F.array_compact(
        F.array(
            F.when(~F.col("decode_ok"), F.struct(F.lit("codec").alias("c"), F.lit(5.0).alias("s"), F.lit("payload failed to decode").alias("d"))),
            F.when(
                F.col("decode_ok") & F.col("has_ref") & (F.coalesce(F.col("snr_db"), F.lit(-1e9)) < SNR_THRESHOLD_DB),
                F.struct(F.lit("payload_snr").alias("c"), F.lit(4.0).alias("s"), F.concat(F.lit("snr_db="), F.round("snr_db", 2).cast("string")).alias("d")),
            ),
            F.when(F.col("decode_ok") & ~F.col("dur_ok"), F.struct(F.lit("dur_mismatch").alias("c"), F.lit(2.5).alias("s"), F.lit("dur_ms != decoded length").alias("d"))),
            F.when(F.col("transcript_null"), F.struct(F.lit("transcript_null").alias("c"), F.lit(1.5).alias("s"), F.lit("null transcript").alias("d"))),
            F.when(
                ~F.col("transcript_null") & F.col("has_ref") & ~F.col("transcript_ok"),
                F.struct(F.lit("transcript_mismatch").alias("c"), F.lit(2.0).alias("s"), F.lit("transcript differs from reference").alias("d")),
            ),
        )
    )
    return (
        report.select("clip_id", "part", F.explode(checks).alias("v"))
        .select(
            F.col("clip_id").alias("key"),
            F.col("v.c").alias("check"),
            F.col("v.d").alias("detail"),
            F.col("part"),
            F.col("v.s").alias("severity"),
        )
        .select(*VIOLATION_COLS)
    )
