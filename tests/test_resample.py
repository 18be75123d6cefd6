"""Linear resampling kernel (functions/codecs.py) + distributed
normalize-to-target-rate operator (operators/media.py)."""

import numpy as np
import pytest

from audit_anomaly_detection_etl_spark.functions import codecs
from audit_anomaly_detection_etl_spark.operators import media


class TestKernel:
    def test_identity_when_rates_match(self):
        pcm = np.array([0.1, -0.2, 0.3])
        out = codecs.resample_linear(pcm, 8000, 8000)
        assert out.dtype == np.float32
        np.testing.assert_allclose(out, pcm.astype(np.float32))

    def test_lengths(self):
        assert len(codecs.resample_linear(np.zeros(8000), 8000, 16000)) == 16000
        assert len(codecs.resample_linear(np.zeros(8000), 8000, 4000)) == 4000
        assert len(codecs.resample_linear(np.zeros(0), 8000, 16000)) == 0

    def test_constant_signal_preserved(self):
        out = codecs.resample_linear(np.full(100, 0.5), 8000, 16000)
        np.testing.assert_allclose(out, 0.5, atol=1e-7)

    def test_sine_frequency_preserved(self):
        # 440 Hz at 8 kHz upsampled to 16 kHz: peak bin stays at 440 Hz
        sr, f = 8000, 440.0
        t = np.arange(sr) / sr
        pcm = np.sin(2 * np.pi * f * t)
        up = codecs.resample_linear(pcm, sr, 2 * sr)
        spec = np.abs(np.fft.rfft(up.astype(np.float64)))
        peak_hz = np.argmax(spec) * (2 * sr) / len(up)
        assert abs(peak_hz - f) < 2.0

    def test_deterministic(self):
        rng = np.random.default_rng(4)
        pcm = rng.random(1000) - 0.5
        a = codecs.resample_linear(pcm, 22050, 16000)
        b = codecs.resample_linear(pcm, 22050, 16000)
        assert a.tobytes() == b.tobytes()


class TestOperator:
    def test_mixed_rates_normalize_and_bad_rows_quarantine(self, spark):
        rng = np.random.default_rng(9)
        rows = []
        for i, sr in enumerate([8000, 16000, 22050]):
            pcm = (rng.random(sr // 10) - 0.5).astype(np.float64)  # 100 ms
            rows.append((f"c{i}", 0, codecs.encode(pcm, "ulaw"), sr, "ulaw"))
        rows.append(("bad", 1, b"\x01\x02\x03", 8000, "mystery_codec"))
        df = spark.createDataFrame(
            rows, "clip_id string, part int, bytes binary, sr_hz int, codec string"
        )
        out = {r["clip_id"]: r for r in media.resample_audio(df, target_sr=16000).collect()}
        for i in range(3):
            r = out[f"c{i}"]
            assert r["ok"] and r["sr_hz"] == 16000
            # 100 ms at 16 kHz = 1600 samples regardless of source rate
            assert abs(r["n_samples"] - 1600) <= 1
            assert len(r["bytes"]) == 2 * r["n_samples"]  # pcm_s16le
        assert not out["bad"]["ok"] and out["bad"]["bytes"] is None

    def test_roundtrip_snr(self, spark):
        # downsample then decode: band-limited content survives allclose-ish
        rng = np.random.default_rng(12)
        t = np.arange(1600) / 16000
        pcm = (0.4 * np.sin(2 * np.pi * 300 * t)).astype(np.float64)
        df = spark.createDataFrame(
            [("x", 0, codecs.encode(pcm, "pcm_f32le"), 16000, "pcm_f32le")],
            "clip_id string, part int, bytes binary, sr_hz int, codec string",
        )
        r = media.resample_audio(df, target_sr=16000, out_codec="pcm_f32le").collect()[0]
        back = codecs.decode(r["bytes"], "pcm_f32le")
        assert codecs.snr_db(pcm, back) > 60  # identity path: float32 cast only


class TestTrimSilence:
    def test_bounds_on_constructed_signal(self, spark):
        sr = 8000
        sil = np.zeros(sr // 5)                      # 200 ms silence
        t = np.arange(sr // 2) / sr                  # 500 ms tone
        tone = 0.5 * np.sin(2 * np.pi * 440 * t)
        pcm = np.concatenate([sil, tone, sil, sil])  # 200 | 500 | 400 ms
        df = spark.createDataFrame(
            [("a", 0, codecs.encode(pcm, "pcm_f32le"), sr, "pcm_f32le")],
            "clip_id string, part int, bytes binary, sr_hz int, codec string",
        )
        r = media.trim_silence_bounds(df, threshold_db=-40.0, frame_ms=20.0).collect()[0]
        assert r["ok"]
        assert r["start_ms"] == pytest.approx(200.0, abs=20.0)
        assert r["end_ms"] == pytest.approx(700.0, abs=20.0)
        assert r["active_ratio"] == pytest.approx(500.0 / 1100.0, abs=0.05)

    def test_all_silent_and_bad_rows(self, spark):
        sr = 8000
        df = spark.createDataFrame(
            [
                ("quiet", 0, codecs.encode(np.zeros(sr), "ulaw"), sr, "ulaw"),
                ("bad", 0, b"xx", sr, "mystery"),
            ],
            "clip_id string, part int, bytes binary, sr_hz int, codec string",
        )
        out = {r["clip_id"]: r for r in media.trim_silence_bounds(df).collect()}
        q = out["quiet"]
        assert q["ok"] and q["start_ms"] == 0.0 and q["end_ms"] == 0.0 and q["active_ratio"] == 0.0
        assert not out["bad"]["ok"]
