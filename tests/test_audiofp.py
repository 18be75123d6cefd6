"""Exact oracles for acoustic landmark fingerprinting (operators/audiofp.py).

The binary/FFT path has no SQL oracle (driver records q69 rows-only), so
parity is pinned here: an INDEPENDENT plain-python fingerprinter (naive
loops, no vectorized rank tricks) must reproduce the operator's fingerprint
multiset exactly, and the end-to-end near-dup join must recover the melody
fixture's transitive ground truth with zero false positives at the default
threshold.
"""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

import numpy as np
import pytest

from audit_anomaly_detection_etl_spark.functions import codecs
from audit_anomaly_detection_etl_spark.operators import audiofp
from audit_anomaly_detection_etl_spark.sources import synth


def _reference_fingerprints(raw: bytes, codec: str, sr: int) -> list[tuple[int, int]]:
    """Naive reimplementation: explicit loops over frames, bands, anchors."""
    pcm = codecs.decode(raw, codec).astype(np.float64)
    pcm = codecs.resample_linear(pcm, sr, audiofp.TARGET_SR).astype(np.float64)
    n_fft, hop = audiofp.N_FFT, audiofp.HOP
    if len(pcm) < n_fft:
        return []
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)
    n_frames = 1 + (len(pcm) - n_fft) // hop
    mags = []
    for fr in range(n_frames):
        seg = pcm[fr * hop : fr * hop + n_fft] * hann
        mags.append(np.abs(np.fft.rfft(seg)))
    mag = np.stack(mags)
    floor = audiofp.FLOOR_MULT * np.median(mag)

    peaks: list[tuple[int, int]] = []  # (t, f)
    edges = audiofp.BAND_EDGES
    for fr in range(n_frames):
        for lo, hi in zip(edges[:-1], edges[1:]):
            f_best, m_best = lo, -1.0
            for b in range(lo, hi):
                if mag[fr, b] > m_best:
                    f_best, m_best = b, mag[fr, b]
            if m_best > floor:
                peaks.append((fr, f_best))
    peaks.sort()

    out: list[tuple[int, int]] = []
    for i, (t1, f1) in enumerate(peaks):
        n_paired = 0
        for t2, f2 in peaks[i + 1 :]:
            if t2 == t1:
                continue
            if t2 - t1 > audiofp.MAX_DT:
                break
            out.append(((f1 << 16) | (f2 << 8) | (t2 - t1), t1))
            n_paired += 1
            if n_paired == audiofp.FANOUT:
                break
    return out


@pytest.fixture(scope="module")
def melody():
    return synth.generate_melody_clips(n_base=40, n_dup=12, seed=5)


def test_fingerprints_match_reference_impl(spark, melody):
    sample = melody.iloc[:6]
    clips = spark.createDataFrame(sample.drop(columns=["dup_of"]))
    got = defaultdict(list)
    for r in audiofp.fingerprints(clips).collect():
        got[r.clip_id].append((r.h, r.t))
    for row in sample.itertuples():
        exp = _reference_fingerprints(row.bytes, row.codec, row.sr_hz)
        assert sorted(got[row.clip_id]) == sorted(exp), row.clip_id
        assert len(exp) > 0  # the fixture must actually exercise the path


def test_neardup_exact_recall_and_precision(spark, melody):
    groups = defaultdict(set)
    for r in melody.itertuples():
        groups[r.dup_of if r.dup_of else r.clip_id].add(r.clip_id)
    truth = set()
    for g in groups.values():
        truth |= {tuple(sorted(p)) for p in combinations(g, 2)}

    clips = spark.createDataFrame(melody.drop(columns=["dup_of"]))
    pairs = audiofp.neardup_pairs(clips).collect()
    got = {tuple(sorted((r.clip_a, r.clip_b))) for r in pairs}
    assert got == truth  # 13 transitive true pairs, zero false positives


def test_offset_reports_the_time_shift(spark, melody):
    """A dup = silence-prepended base: winning offset must equal the shift
    in frames (t_a - t_b with a = base, which sorts before 'dup')."""
    dups = melody[melody["dup_of"].notna()]
    # pick same-rate uncompressed dups: shift maps to frames exactly
    cand = dups[(dups["sr_hz"] == 8000) & (dups["codec"] == "pcm_s16le")]
    assert len(cand) > 0
    clips = spark.createDataFrame(melody.drop(columns=["dup_of"]))
    by_pair = {
        tuple(sorted((r.clip_a, r.clip_b))): r.offset
        for r in audiofp.neardup_pairs(clips).collect()
    }
    base_len = {
        r.clip_id: len(codecs.decode(r.bytes, r.codec)) for r in melody.itertuples()
    }
    for row in cand.itertuples():
        shift_samples = base_len[row.clip_id] - base_len[row.dup_of]
        shift_frames = shift_samples / audiofp.HOP
        off = by_pair[tuple(sorted((row.clip_id, row.dup_of)))]
        assert abs(-off - shift_frames) <= 2, (row.clip_id, off, shift_frames)


def test_degenerate_clips_yield_no_fingerprints(spark):
    import pandas as pd

    silence = codecs.encode(np.zeros(8000), "pcm_s16le")
    rows = pd.DataFrame(
        {
            "clip_id": ["empty", "badcodec", "short", "silence", "nullbytes"],
            "part": [0, 0, 0, 0, 0],
            "bytes": [b"", b"\x00" * 1000, b"\x00\x01" * 10, silence, None],
            "codec": ["pcm_s16le", "nope", "pcm_s16le", "pcm_s16le", "pcm_s16le"],
            "sr_hz": [8000, 8000, 8000, 8000, 8000],
        }
    )
    out = audiofp.fingerprints(spark.createDataFrame(rows)).collect()
    assert out == []


def test_landmarks_match_bruteforce_on_random_constellations():
    """The searchsorted pairing must equal the naive O(p^2) walk — order
    included — over constellations denser and duplicate-heavier than real
    audio produces (many peaks per frame, runs of equal t)."""

    def brute(t, f):
        out = []
        peaks = list(zip(t.tolist(), f.tolist()))
        for i, (t1, f1) in enumerate(peaks):
            n = 0
            for t2, f2 in peaks[i + 1 :]:
                if t2 == t1:
                    continue
                if t2 - t1 > audiofp.MAX_DT:
                    break
                out.append(((f1 << 16) | (f2 << 8) | (t2 - t1), t1))
                n += 1
                if n == audiofp.FANOUT:
                    break
        return out

    rng = np.random.default_rng(7)
    for trial in range(50):
        p = int(rng.integers(0, 40))
        t = np.sort(rng.integers(0, 12, size=p)).astype(np.int64)
        f = rng.integers(1, 129, size=p).astype(np.int64)
        # sort by (t, f) exactly like _constellation does
        order = np.lexsort((f, t))
        t, f = t[order], f[order]
        h, at = audiofp._landmarks(t, f)
        assert list(zip(h.tolist(), at.tolist())) == brute(t, f), f"trial {trial}"
