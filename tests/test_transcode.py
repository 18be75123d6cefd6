"""Exact numpy oracle for operators/media.transcode_qa: the round-trip SNR
per clip recomputed on the driver, plus verdict edges (bit-exact cap,
degraded hot signal, undecodable)."""

import numpy as np
import pandas as pd
import pytest

from audit_anomaly_detection_etl_spark.functions import codecs
from audit_anomaly_detection_etl_spark.operators import media
from audit_anomaly_detection_etl_spark.sources import synth


def _snr(ref, rt):
    sig = float((ref**2).sum())
    err = float(((ref - rt) ** 2).sum())
    if err <= 0:
        return 120.0
    return min(10.0 * np.log10(sig / err), 120.0)


def test_transcode_qa_matches_numpy_oracle(spark):
    t = synth.generate_clips(n_clips=200, n_parts=4, seed=13)
    clips = spark.createDataFrame(t.clips.to_pandas())
    got = media.transcode_qa(clips, "ulaw").toPandas().set_index("clip_id")
    checked = 0
    for _, row in t.clips.to_pandas().iterrows():
        g = got.loc[row["clip_id"]]
        if isinstance(g, pd.DataFrame):
            g = g.iloc[0]
        if row["codec"] not in codecs.CODECS:
            assert g["verdict"] == "undecodable"
            continue
        ref = codecs.decode(row["bytes"], row["codec"]).astype(np.float64)
        rt = codecs.decode(codecs.encode(ref, "ulaw"), "ulaw").astype(np.float64)
        assert g["snr_db"] == pytest.approx(round(_snr(ref, rt), 6), abs=2e-6)
        checked += 1
    assert checked > 150


def test_transcode_verdict_edges(spark):
    sr = 8000
    tt = np.arange(sr, dtype=np.float64) / sr
    sine = lambda a: (a * np.sin(2 * np.pi * 300 * tt))  # noqa: E731
    rows = [
        # pcm16 -> pcm16 identity round trip = bit exact -> 120 cap
        ("exact", 0, codecs.encode(sine(0.5), "pcm_s16le"), "pcm_s16le", sr),
        # moderate sine through ulaw ~ 30+ dB
        ("mid", 0, codecs.encode(sine(0.3), "pcm_s16le"), "pcm_s16le", sr),
        ("badcodec", 0, b"\x00" * 100, "opus", sr),
        ("silence", 0, codecs.encode(np.zeros(100), "pcm_s16le"), "pcm_s16le", sr),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["clip_id", "part", "bytes", "codec", "sr_hz"])
    )
    # identity target: pcm16 -> pcm16
    out = media.transcode_qa(df, "pcm_s16le").toPandas().set_index("clip_id")
    assert out.loc["exact"]["snr_db"] == 120.0
    assert out.loc["exact"]["verdict"] == "transparent"
    assert out.loc["badcodec"]["verdict"] == "undecodable"
    assert out.loc["silence"]["verdict"] == "undecodable"  # zero signal

    out2 = media.transcode_qa(df, "ulaw").toPandas().set_index("clip_id")
    assert 20.0 < out2.loc["mid"]["snr_db"] < 120.0


def test_bandwidth_audit_flags_upsampled_content(spark):
    """300 Hz tone in a 48 kHz container -> band_limited; broadband noise at
    16 kHz -> not; silence and undecodable -> exempt (never flagged)."""
    rng = np.random.default_rng(9)
    sr_hi, sr_lo = 48000, 16000
    t_hi = np.arange(sr_hi, dtype=np.float64) / sr_hi
    tone = 0.4 * np.sin(2 * np.pi * 300 * t_hi)  # zcr ~ 600/48000 -> ratio 0.0125
    noise = (0.2 * rng.standard_normal(sr_lo)).clip(-0.9, 0.9)
    rows = [
        ("tone48k", 0, codecs.encode(tone, "pcm_s16le"), "pcm_s16le", sr_hi),
        ("noise16k", 0, codecs.encode(noise, "pcm_s16le"), "pcm_s16le", sr_lo),
        ("silent", 0, codecs.encode(np.zeros(1000), "pcm_s16le"), "pcm_s16le", sr_hi),
        ("bad", 0, b"\x01\x02\x03", "opus", sr_hi),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["clip_id", "part", "bytes", "codec", "sr_hz"])
    )
    out = (
        media.bandwidth_audit(media.audio_features(df), df)
        .toPandas()
        .set_index("clip_id")
    )
    assert out.loc["tone48k"]["band_limited"]
    assert out.loc["tone48k"]["bw_ratio"] == pytest.approx(300.0 / 24000.0, rel=0.05)
    assert not out.loc["noise16k"]["band_limited"]
    assert out.loc["noise16k"]["bw_ratio"] > 0.2
    assert not out.loc["silent"]["band_limited"]
    assert out.loc["silent"]["bw_ratio"] is None or np.isnan(out.loc["silent"]["bw_ratio"])
    assert not out.loc["bad"]["band_limited"]


def test_bandwidth_audit_conflicting_dup_rates_deterministic(spark):
    """Duplicate clip_ids with CONFLICTING declared sr_hz: the declared side
    collapses to min(sr_hz) — deterministic across shuffles, and the most
    conservative band-limit denominator. (dropDuplicates would keep an
    arbitrary copy and flip band_limited between runs.)"""
    rng = np.random.default_rng(5)
    noise = (0.2 * rng.standard_normal(16000)).clip(-0.9, 0.9)
    payload = codecs.encode(noise, "pcm_s16le")
    rows = [
        ("dup", 0, payload, "pcm_s16le", 16000),
        ("dup", 0, payload, "pcm_s16le", 48000),  # re-ingest, metadata "fixed"
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["clip_id", "part", "bytes", "codec", "sr_hz"])
    )
    out = media.bandwidth_audit(media.audio_features(df), df).toPandas()
    # both feature rows join the SAME declared rate: min = 16000
    assert set(out["sr_hz"]) == {16000}
    assert len(out) == 2  # both dup copies audited, no k^2 fan-out


def test_adpcm_transcode_per_clip_oracle(spark):
    """adpcm_dvi target: SNR per clip must equal the DIRECT per-clip
    audioop round trip — the stateful path may never encode the batch
    concatenation (the predictor recurrence would bleed across clips)."""
    t = synth.generate_clips(n_clips=120, n_parts=4, seed=13)
    clips = spark.createDataFrame(t.clips.to_pandas())
    got = media.transcode_qa(clips, "adpcm_dvi").toPandas().set_index("clip_id")
    checked = 0
    verdicts = set()
    for _, row in t.clips.to_pandas().iterrows():
        g = got.loc[row["clip_id"]]
        if isinstance(g, pd.DataFrame):
            g = g.iloc[0]
        if row["codec"] not in codecs.CODECS:
            assert g["verdict"] == "undecodable"
            continue
        ref = codecs.decode(row["bytes"], row["codec"]).astype(np.float64)
        rt = codecs.decode(codecs.encode(ref, "adpcm_dvi"), "adpcm_dvi")[: len(ref)]
        assert g["snr_db"] == pytest.approx(round(_snr(ref, rt.astype(np.float64)), 6), abs=2e-6)
        verdicts.add(g["verdict"])
        checked += 1
    assert checked > 90
    # 4-bit ADPCM sits ~20-28 dB on this corpus: mostly below the 25 dB
    # default, never transparent — the audit exists to SHOW that
    assert "degraded" in verdicts
    assert "transparent" not in verdicts


def test_adpcm_batch_equals_isolated_clip(spark):
    """Clip order/neighbors in the Arrow batch must not change a clip's
    adpcm round-trip SNR (would fail under concatenated encoding)."""
    sr = 8000
    tt = np.arange(sr, dtype=np.float64) / sr
    mk = lambda a, f: a * np.sin(2 * np.pi * f * tt)  # noqa: E731
    pcms = [mk(0.5, 300), mk(0.05, 1200), mk(0.9, 440)]
    rows = [
        ("c0", 0, codecs.encode(pcms[0], "pcm_s16le"), "pcm_s16le", sr),
        ("c1", 0, codecs.encode(pcms[1], "pcm_s16le"), "pcm_s16le", sr),
        ("c2", 0, codecs.encode(pcms[2], "pcm_s16le"), "pcm_s16le", sr),
    ]
    cols = ["clip_id", "part", "bytes", "codec", "sr_hz"]
    batch = (
        media.transcode_qa(
            spark.createDataFrame(pd.DataFrame(rows, columns=cols)), "adpcm_dvi"
        )
        .toPandas()
        .set_index("clip_id")["snr_db"]
    )
    for i, r in enumerate(rows):
        solo = (
            media.transcode_qa(
                spark.createDataFrame(pd.DataFrame([r], columns=cols)), "adpcm_dvi"
            )
            .toPandas()["snr_db"]
            .iloc[0]
        )
        assert batch[f"c{i}"] == pytest.approx(solo, abs=1e-9), i


def test_adpcm_odd_length_and_kernel_contract():
    """Kernel contract: odd inputs are zero-padded (never truncated), decode
    returns the even padded count, and the pad trims back out losslessly."""
    # odd length; starts at 0 where the fresh ADPCM predictor state starts
    # (a signal jumping straight to full scale is slew-limited for the
    # first few hundred samples while the step size adapts — real codec
    # behavior, not an implementation defect)
    pcm = np.linspace(0.0, 0.4, 333)
    rt = codecs.decode(codecs.encode(pcm, "adpcm_dvi"), "adpcm_dvi")
    assert len(rt) == 334
    # the padded trailing sample decodes near zero; the real samples carry
    # the signal (SNR of the trimmed round trip is finite and positive)
    err = pcm - rt[:333].astype(np.float64)
    assert 10 * np.log10(np.mean(pcm**2) / np.mean(err**2)) > 15.0
    # adpcm is transcode-only: excluded from the suite's declared-codec
    # domain and from the byte-length arithmetic
    assert "adpcm_dvi" not in codecs.CODECS
    assert "adpcm_dvi" in codecs.STATEFUL_TRANSCODE_CODECS
    with pytest.raises(KeyError):
        codecs.bytes_per_sample("adpcm_dvi")
