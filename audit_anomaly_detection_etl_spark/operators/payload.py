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
from . import VIOLATION_COLS, remap_key_part

SNR_THRESHOLD_DB = 30.0

REPORT_SCHEMA = (
    "clip_id string, part int, codec string, decode_ok boolean, snr_db double, "
    "dur_ok boolean, transcript_ok boolean, transcript_null boolean, has_ref boolean"
)


def _validate_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Whole-batch vectorized validation — the Python interpreter never loops
    over samples, and the per-clip math (decode, noise/signal energy) runs as
    ONE numpy op per codec group over the concatenation of all clips in the
    Arrow batch, with per-clip reductions via ``np.add.reduceat`` over the
    segment offsets. The only O(n_rows) Python left is byte-length probing of
    the object-typed binary columns (unavoidable for Arrow binary arrays in
    pandas; cost is one ``len()`` per clip, not per sample).
    """
    for pdf in batches:
        n = len(pdf)
        raw_col = pdf["bytes"].to_numpy()
        ref_col = pdf["pcm_ref"].to_numpy()
        # NULL metadata arrives as NaN floats; a straight int64 cast turns
        # NaN into INT64_MIN garbage. Null sr/dur is the schema/byte_length
        # checks' defect (no-double-count) — mask it out of the dur check.
        meta_ok = (
            ~(pd.isna(pdf["sr_hz"]) | pd.isna(pdf["dur_ms"]))
        ).to_numpy(dtype=bool)
        sr_col = pdf["sr_hz"].fillna(0).to_numpy(dtype=np.int64)
        dur_col = pdf["dur_ms"].fillna(0).to_numpy(dtype=np.int64)
        tr_vals = pdf["transcript"].to_numpy()
        trr_vals = pdf["transcript_ref"].to_numpy()

        decode_ok = np.zeros(n, dtype=bool)
        snr = np.full(n, np.nan)
        dur_ok = np.zeros(n, dtype=bool)
        has_ref = np.array([r is not None for r in ref_col], dtype=bool)
        transcript_null = pd.isna(pdf["transcript"]).to_numpy()

        byte_lens = np.array([len(r) if r is not None else -1 for r in raw_col], dtype=np.int64)
        ref_lens = np.array([len(r) if r is not None else -1 for r in ref_col], dtype=np.int64)
        codec_col = pdf["codec"].to_numpy()

        for codec in pd.unique(codec_col):
            if codec not in codecs.CODECS:
                continue  # decode_ok stays False: unknown codec
            bps = codecs.bytes_per_sample(codec)
            idx = np.flatnonzero(
                (codec_col == codec) & (byte_lens >= 0) & (byte_lens % bps == 0)
            )
            if idx.size == 0:
                continue  # torn payloads keep decode_ok False
            decode_ok[idx] = True
            lens = byte_lens[idx] // bps
            # one vectorized decode over the concatenation of every clip in
            # this codec group (all codecs are elementwise maps)
            pcm_all = codecs.decode(b"".join(raw_col[i] for i in idx), codec)
            starts = np.zeros(idx.size, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            sr = sr_col[idx]
            with np.errstate(divide="ignore", invalid="ignore"):
                dur_ok[idx] = np.where(
                    meta_ok[idx],
                    (sr > 0)
                    & (dur_col[idx] == np.round(lens / np.maximum(sr, 1) * 1000.0)),
                    True,  # null metadata: not this check's defect
                )

            # SNR vs reference: rows with a ref row; float32 ref => 4 B/sample
            m = has_ref[idx]
            if not m.any():
                continue
            ref_ok = (ref_lens[idx] % 4 == 0) & (ref_lens[idx] // 4 == lens) & (lens > 0)
            snr[idx[m & ~ref_ok]] = float("-inf")  # length mismatch / torn ref
            g = np.flatnonzero(m & ref_ok)
            if g.size == 0:
                continue
            rows = idx[g]
            # float32 element math + float64 ACCUMULATION (reduceat dtype):
            # the decoded PCM is float32, so diffs/squares are computed at
            # source precision (a bit-exact pair still subtracts to exactly
            # 0.0) while the per-clip energy sums accumulate in float64 —
            # same inf/-inf semantics, ~1e-5 dB on finite SNR, and half the
            # allocation traffic of promoting both 700 MB sides to float64
            # (the dominant cost with 32 workers contending for memory
            # bandwidth; the numpy math itself is ~2.5 cpu-s per 24k clips)
            ref_all = np.frombuffer(b"".join(ref_col[i] for i in rows), dtype=np.float32)
            test_all = np.concatenate(
                [pcm_all[starts[j] : starts[j] + lens[j]] for j in g]
            )
            seg = np.zeros(g.size, dtype=np.int64)
            np.cumsum(lens[g][:-1], out=seg[1:])
            d = ref_all - test_all
            np.square(d, out=d)
            noise = np.add.reduceat(d, seg, dtype=np.float64)
            sig = np.add.reduceat(np.square(ref_all), seg, dtype=np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                s = 10.0 * np.log10(sig / noise)
            # order matches codecs.snr_db: a bit-exact match is +inf even
            # when both sides are all-zero (noise==0 wins over sig==0)
            s[sig == 0.0] = float("-inf")  # silent reference can't attest
            s[noise == 0.0] = float("inf")  # bit-exact
            # any remaining NaN is corruption, not a verdict: inf/inf from
            # float32 overflow (|x| > ~1.8e19 squares past f32 max) or NaN
            # samples in either side. Spark orders NaN ABOVE every number,
            # so a NaN snr_db would silently PASS the `< threshold` check —
            # force it to a fail. (The pre-LUT float64 path could not
            # overflow here but passed NaN samples the same silent way.)
            s[np.isnan(s)] = float("-inf")
            snr[rows] = s

        # transcript byte-equality is independent of audio decode success
        transcript_ok = ~transcript_null & has_ref & (tr_vals == trr_vals)
        yield pd.DataFrame(
            {
                "clip_id": pdf["clip_id"].to_numpy(),
                "part": pdf["part"].to_numpy(),
                "codec": codec_col,
                "decode_ok": decode_ok,
                "snr_db": snr,
                "dur_ok": dur_ok,
                "transcript_ok": transcript_ok,
                "transcript_null": transcript_null,
                "has_ref": has_ref,
            }
        )


def payload_report(clips: DataFrame, clips_ref: DataFrame) -> DataFrame:
    """Per-clip validation report (REPORT_SCHEMA). Lazy: one join + one
    mapInPandas stage; column pruning keeps only the 8 needed input columns
    at the scans.

    Flag independence (deliberate): transcript flags (``transcript_null`` /
    ``transcript_ok``) are evaluated for EVERY clip, including clips whose
    audio failed to decode — a torn payload does not suppress transcript
    violations (each check attests its own invariant). Likewise ``snr_db``
    for a ref row of matching *length zero* is -inf (a silent/empty
    reference cannot attest the signal), via the ``lens > 0`` term in
    ``ref_ok``. Covered by tests/test_payload.py::test_flags_decoupled_from_decode.
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


def byte_length_audit(
    clips: DataFrame,
    tolerance_samples: int = 1,
    key_col: str = "clip_id",
    part_col: str = "part",
) -> DataFrame:
    """Pre-decode triage: does the payload's BYTE LENGTH match what the
    declared (dur_ms, sr_hz, codec) metadata promises? ``expected_bytes =
    round(dur_ms/1000 * sr_hz) * bytes_per_sample(codec)`` — a truncated
    upload, a payload written under a different codec than declared, or a
    dur_ms in the wrong unit all show up WITHOUT decoding a single sample.

    This is the cheap tier in front of the SNR decode check (q33): at
    10^12 clips it is a whole-stage-codegen projection over three metadata
    columns + the binary length (parquet stores byte length in the column
    data; no PCM ever materializes in Python). Verdicts: ``ok`` (within
    ``tolerance_samples``), ``truncated``, ``oversized``, ``unknown_codec``,
    ``bad_meta`` (non-positive dur/sr or null payload).

    Returns (clip_id, part, n_bytes, expected_bytes, delta_samples,
    verdict).
    """
    bps = F.create_map(
        *[
            x
            for c in codecs.CODECS
            for x in (F.lit(c), F.lit(codecs.bytes_per_sample(c)))
        ]
    )[F.col("codec")]
    n_bytes = F.length(F.col("bytes")).cast("long")
    exp_samples = F.round(F.col("dur_ms").cast("double") / 1000.0 * F.col("sr_hz"))
    exp_bytes = (exp_samples * bps).cast("long")
    byte_delta = n_bytes - exp_bytes
    delta = F.when(bps.isNotNull(), byte_delta / bps).cast("long")
    bad_meta = (
        F.col("bytes").isNull()
        | F.col("dur_ms").isNull()
        | F.col("sr_hz").isNull()
        | (F.col("dur_ms") <= 0)
        | (F.col("sr_hz") <= 0)
    )
    # verdict compares BYTES, not the truncated-toward-zero sample delta: a
    # payload short by 1.75 samples would otherwise cast to -1 and pass the
    # 1-sample tolerance. Misaligned lengths (n_bytes % bps != 0) can never
    # decode and are never 'ok' regardless of tolerance.
    verdict = (
        F.when(bad_meta, F.lit("bad_meta"))
        .when(bps.isNull(), F.lit("unknown_codec"))
        .when(
            (F.abs(byte_delta) <= tolerance_samples * bps) & (n_bytes % bps == 0),
            F.lit("ok"),
        )
        .when(byte_delta < 0, F.lit("truncated"))
        .otherwise(F.lit("oversized"))
    )
    # metadata column names (bytes/sr_hz/dur_ms/codec) are the input-hint
    # contract; only the key/partition columns are spec-configurable, and
    # they normalize to (clip_id, part) in the output
    return clips.select(
        F.col(key_col).alias("clip_id"),
        F.col(part_col).alias("part"),
        n_bytes.alias("n_bytes"),
        F.when(~bad_meta & bps.isNotNull(), exp_bytes).alias("expected_bytes"),
        F.when(~bad_meta & bps.isNotNull(), delta).alias("delta_samples"),
        verdict.alias("verdict"),
    )


def byte_length_violations(
    clips: DataFrame,
    tolerance_samples: int = 1,
    key_col: str = "clip_id",
    part_col: str = "part",
    report_unknown_codec: bool = True,
) -> DataFrame:
    """Suite adapter for ``byte_length_audit``: violation rows for payloads
    whose byte length contradicts the declared metadata (truncated /
    oversized / unknown codec). ``bad_meta`` rows are NOT re-reported — the
    schema constraints own null/non-positive metadata (no-double-count rule,
    like speaking_rate/loudness). For the same reason the runner passes
    ``report_unknown_codec=False`` whenever the schema check is also
    enabled: the allowed-codec domain constraint already owns declared-codec
    validity, and a third report of the same defect would only inflate the
    count. Severity 4.5: corruption-class, just under payload SNR failures.
    Pure codegen — safe to enable on every wave (and default-ON: at 10^12
    clips this is the cheapest violation source in the suite, catching
    truncation before the expensive decode pass)."""
    audit = byte_length_audit(clips, tolerance_samples, key_col, part_col)
    skip = ("ok", "bad_meta") if report_unknown_codec else ("ok", "bad_meta", "unknown_codec")
    bad = audit.where(~F.col("verdict").isin(*skip))
    return bad.select(
        F.col("clip_id").alias("key"),
        F.lit("byte_length").alias("check"),
        F.concat(
            F.col("verdict"),
            F.lit(": bytes="),
            F.col("n_bytes").cast("string"),
            F.lit(" expected="),
            F.coalesce(F.col("expected_bytes").cast("string"), F.lit("?")),
            F.lit(" delta_samples="),
            F.coalesce(F.col("delta_samples").cast("string"), F.lit("?")),
        ).alias("detail"),
        F.col("part"),
        F.lit(4.5).alias("severity"),
    )


# ---------------------------------------------------------------------------
# declared-codec plausibility sniff (mislabeled companding law)
# ---------------------------------------------------------------------------

CODEC_SNIFF_SCHEMA = (
    "clip_id string, part int, codec string, decode_ok boolean, "
    "roughness_declared double, best_alt_codec string, "
    "roughness_best_alt double, roughness_ratio double, suspect_codec boolean"
)

# a wrong-law decode looks noise-like: white noise has first-difference
# energy ~2x signal energy, correctly decoded band-limited audio sits far
# below 1. Measured on the synth corpus: own-law roughness median 0.096
# (max 1.23 on noise-heavy content), cross-law median 0.93 -- the RATIO
# separates them by ~10x while absolute thresholds would flag noisy-but-
# correct clips.
_SNIFF_MIN_ROUGHNESS = 0.5
_SNIFF_RATIO = 3.0
_SNIFF_MIN_RMS = 1e-4


def codec_sniff_audit(
    clips: DataFrame,
    ratio_threshold: float = _SNIFF_RATIO,
    min_declared_roughness: float = _SNIFF_MIN_ROUGHNESS,
) -> DataFrame:
    """Mislabeled-codec detection from payload CONTENT: decode each clip
    under its declared codec AND every byte-length-consistent alternative,
    compare waveform roughness (first-difference energy over signal
    energy), and flag clips whose declared decode is noise-like while an
    alternative decodes to plausible audio.

    This is the corruption class the other payload tiers cannot see:
    ``byte_length_audit`` is blind to ulaw<->alaw swaps (both 1 byte per
    sample, identical size arithmetic), and the SNR check needs a
    reference row — a mislabeled clip with no ref row decodes "cleanly"
    into garbage and passes everything. The flag is deliberately RELATIVE
    (declared/alternative ratio >= ``ratio_threshold`` and declared
    roughness >= ``min_declared_roughness``): noise-heavy but correctly
    labeled content scores ~equal roughness under every law and stays
    clean, while a swapped label shows ~10x separation.

    Reference analogue: the per-event value-plausibility flags
    (SURVEY.md A10) applied at the payload-content level.

    Scale notes: one ``mapInPandas`` pass; for each candidate codec the
    batch's consistent clips decode as ONE concatenation with per-clip
    roughness from ``np.add.reduceat`` sums (the cross-clip boundary
    difference is subtracted exactly like audio_features' ZCR
    correction). Candidate count is a constant (4), so the pass stays
    O(batch bytes), never per-sample Python.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            raw_col = pdf["bytes"].to_numpy()
            codec_col = pdf["codec"].to_numpy()
            byte_lens = np.array(
                [len(r) if r is not None else -1 for r in raw_col], dtype=np.int64
            )
            cands = list(codecs.CODECS)
            rough = np.full((n, len(cands)), np.nan)
            rms2 = np.full((n, len(cands)), np.nan)
            for ci, cand in enumerate(cands):
                bps = codecs.bytes_per_sample(cand)
                idx = np.flatnonzero((byte_lens > 0) & (byte_lens % bps == 0))
                if idx.size == 0:
                    continue
                lens = byte_lens[idx] // bps
                # junk byte patterns reinterpreted as f32 can hold SIGNALING
                # NaNs; the widening cast quiets them and numpy warns — the
                # NaN itself is handled (isfinite gate below), so silence it
                with np.errstate(invalid="ignore"):
                    x = codecs.decode(
                        b"".join(raw_col[i] for i in idx), cand
                    ).astype(np.float64)
                seg = np.zeros(idx.size, dtype=np.int64)
                np.cumsum(lens[:-1], out=seg[1:])
                energy = np.add.reduceat(x * x, seg)
                d2 = (x[1:] - x[:-1]) ** 2
                d2 = np.append(d2, 0.0)
                # zero the cross-clip boundary diffs BEFORE the reduceat:
                # junk reinterpretations reach ~1e38, so a boundary d2 of
                # ~1e76 absorbs the real clip sum in float64 and the
                # subtract-after pattern (audio_features' zcr, safe there
                # because flips are 0/1) returns exactly 0 here
                d2[seg + lens - 1] = 0.0
                diff_sum = np.add.reduceat(d2, seg)
                with np.errstate(divide="ignore", invalid="ignore"):
                    r = (diff_sum / np.maximum(lens - 1, 1)) / (energy / lens)
                ok = (lens > 1) & (energy > 0) & np.isfinite(r)
                rough[idx[ok], ci] = r[ok]
                rms2[idx[ok], ci] = energy[ok] / lens[ok]
            cand_index = {c: i for i, c in enumerate(cands)}
            decl_ci = np.array([cand_index.get(c, -1) for c in codec_col])
            rows = np.arange(n)
            has_decl = decl_ci >= 0
            decl = np.full(n, np.nan)
            decl_rms2 = np.full(n, np.nan)
            decl[has_decl] = rough[rows[has_decl], decl_ci[has_decl]]
            decl_rms2[has_decl] = rms2[rows[has_decl], decl_ci[has_decl]]
            alt = rough.copy()
            alt[rows[has_decl], decl_ci[has_decl]] = np.nan
            alt_filled = np.where(np.isnan(alt), np.inf, alt)
            best_ci = np.argmin(alt_filled, axis=1)
            best_r = alt_filled[rows, best_ci]
            best_ci = np.where(np.isfinite(best_r), best_ci, -1)
            best_r = np.where(np.isfinite(best_r), best_r, np.nan)
            with np.errstate(divide="ignore", invalid="ignore"):
                ratio = decl / best_r
            decode_ok = np.isfinite(decl)
            suspect = (
                decode_ok
                & np.isfinite(ratio)
                & (decl >= min_declared_roughness)
                & (ratio >= ratio_threshold)
                & (decl_rms2 >= _SNIFF_MIN_RMS**2)
            )
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"].to_numpy(),
                    "part": pdf["part"].to_numpy(),
                    "codec": codec_col,
                    "decode_ok": decode_ok,
                    "roughness_declared": np.round(decl, 6),
                    "best_alt_codec": [
                        cands[c] if c >= 0 else None for c in best_ci
                    ],
                    "roughness_best_alt": np.round(best_r, 6),
                    "roughness_ratio": np.round(ratio, 6),
                    "suspect_codec": suspect,
                }
            )

    pruned = clips.select("clip_id", "part", "bytes", "codec")
    return pruned.mapInPandas(batches, schema=CODEC_SNIFF_SCHEMA)


def codec_sniff_violations(
    clips: DataFrame,
    ratio_threshold: float = _SNIFF_RATIO,
    key_col: str = "clip_id",
    part_col: str = "part",
) -> DataFrame:
    """Suite adapter for ``codec_sniff_audit``: violation rows for clips
    whose payload content contradicts the declared codec. Severity 4.2:
    corruption-class (every downstream consumer decodes garbage), just
    below byte-length mismatches (4.5) which are the cheaper, more certain
    signal. Undecodable clips are NOT re-reported (codec/payload checks
    own that class).

    Cost note: runs its own multi-candidate decode pass (~4x one decode of
    the wave); enable for ingest audits of untrusted producers rather than
    every run.
    """
    src = remap_key_part(clips, key_col, part_col)
    audit = codec_sniff_audit(src, ratio_threshold=ratio_threshold)
    bad = audit.where(F.col("suspect_codec"))
    return bad.select(
        F.col("clip_id").alias("key"),
        F.lit("codec_sniff").alias("check"),
        F.concat(
            F.lit("declared="),
            F.col("codec"),
            F.lit(" roughness="),
            F.round("roughness_declared", 3).cast("string"),
            F.lit(" best_alt="),
            F.coalesce(F.col("best_alt_codec"), F.lit("?")),
            F.lit(" ratio="),
            F.round("roughness_ratio", 2).cast("string"),
        ).alias("detail"),
        F.col("part").alias("part"),
        F.lit(4.2).alias("severity"),
    )
