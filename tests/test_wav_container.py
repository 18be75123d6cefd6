"""WAV/RIFF container codec (functions/codecs.py) + container-vs-table
consistency validation (operators/media.py)."""

import numpy as np
import pytest

from audit_anomaly_detection_etl_spark.functions import codecs
from audit_anomaly_detection_etl_spark.operators import media


def _pcm(n=800, seed=3):
    rng = np.random.default_rng(seed)
    return (rng.random(n) * 1.8 - 0.9).astype(np.float64)


class TestWavCodec:
    @pytest.mark.parametrize("codec", codecs.CODECS)
    def test_roundtrip_all_codecs(self, codec):
        pcm = _pcm()
        wav = codecs.encode_wav(pcm, 8000, codec)
        m = codecs.parse_wav(wav)
        assert (m["sr_hz"], m["codec"], m["n_channels"], m["n_samples"]) == (8000, codec, 1, 800)
        assert codecs.snr_db(pcm, codecs.decode(m["data"], codec)) > 30

    def test_extra_chunks_and_padding_tolerated(self):
        import struct

        wav = codecs.encode_wav(_pcm(5), 16000, "ulaw")
        # splice an odd-sized LIST chunk between header and fmt
        extra = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"
        patched = wav[:12] + extra + wav[12:]
        patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
        m = codecs.parse_wav(patched)
        assert m["n_samples"] == 5 and m["codec"] == "ulaw"

    @pytest.mark.parametrize(
        "raw", [b"", b"RIFF", b"RIFFxxxxWAVE", b"nope" * 10, codecs.encode_wav(_pcm(5), 8000)[:20]]
    )
    def test_torn_or_foreign_buffers_raise(self, raw):
        with pytest.raises(ValueError):
            codecs.parse_wav(raw)

    def test_unknown_format_tag_parses_with_null_codec(self):
        import struct

        wav = bytearray(codecs.encode_wav(_pcm(5), 8000, "pcm_s16le"))
        struct.pack_into("<H", wav, 20, 0x55)  # mp3 tag — container valid, undecodable
        m = codecs.parse_wav(bytes(wav))
        assert m["codec"] is None and m["sr_hz"] == 8000


class TestWavConsistency:
    def _table(self, spark):
        rows = []
        # r0 consistent; r1 wrong sr; r2 wrong codec; r3 wrong duration;
        # r4 torn container
        pcm = _pcm(800)  # 100 ms at 8 kHz
        good = codecs.encode_wav(pcm, 8000, "ulaw")
        rows.append(("r0", 0, good, 8000, 100.0, "ulaw"))
        rows.append(("r1", 0, good, 16000, 100.0, "ulaw"))
        rows.append(("r2", 0, good, 8000, 100.0, "alaw"))
        rows.append(("r3", 1, good, 8000, 400.0, "ulaw"))
        rows.append(("r4", 1, good[:30], 8000, 100.0, "ulaw"))
        return spark.createDataFrame(
            rows,
            "clip_id string, part int, bytes binary, sr_hz int, dur_ms double, codec string",
        )

    def test_metadata_and_violations(self, spark):
        df = self._table(spark)
        meta = {r["clip_id"]: r for r in media.wav_metadata(df).collect()}
        assert meta["r0"]["wav_ok"] and meta["r0"]["container_sr"] == 8000
        assert meta["r0"]["container_dur_ms"] == pytest.approx(100.0)
        assert not meta["r4"]["wav_ok"] and "torn" in meta["r4"]["parse_error"]

        viols = media.wav_consistency_violations(df).collect()
        by_key = {}
        for v in viols:
            by_key.setdefault(v["key"], set()).add(v["check"])
        assert "r0" not in by_key
        # container dur (container_sr-based) still matches the table's 100ms
        assert by_key["r1"] == {"wav_sr_mismatch"}
        assert by_key["r2"] == {"wav_codec_mismatch"}
        assert by_key["r3"] == {"wav_dur_mismatch"}
        assert by_key["r4"] == {"wav_unparseable"}
        sev = {v["check"]: v["severity"] for v in viols}
        assert sev["wav_unparseable"] == 5.0

    def test_null_durations_are_violations_not_silent_passes(self, spark):
        # r5: container declares sr=0 -> parses wav_ok with NULL duration;
        # r6: table's declared duration is NULL. Both must emit
        # wav_dur_mismatch (abs(NULL - x) > tol is NULL, which previously
        # dropped the row entirely).
        import struct

        good = codecs.encode_wav(_pcm(800), 8000, "ulaw")
        zero_sr = bytearray(good)
        struct.pack_into("<I", zero_sr, 24, 0)  # fmt chunk sample rate := 0
        rows = [
            ("r5", 0, bytes(zero_sr), 0, 100.0, "ulaw"),
            ("r6", 0, good, 8000, None, "ulaw"),
        ]
        df = spark.createDataFrame(
            rows,
            "clip_id string, part int, bytes binary, sr_hz int, dur_ms double, codec string",
        )
        by_key = {}
        for v in media.wav_consistency_violations(df).collect():
            by_key.setdefault(v["key"], set()).add(v["check"])
        assert "wav_dur_mismatch" in by_key.get("r5", set())
        assert by_key.get("r6") == {"wav_dur_mismatch"}
