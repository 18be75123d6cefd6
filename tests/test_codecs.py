import numpy as np
import pytest

from audit_anomaly_detection_etl_spark.functions import codecs


def _tone(n=8000, sr=8000, f0=220.0, amp=0.55, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    return np.clip(amp * np.sin(2 * np.pi * f0 * t) + 0.05 * rng.standard_normal(n), -0.999, 0.999)


@pytest.mark.parametrize("codec", codecs.CODECS)
def test_roundtrip_snr_above_30db(codec):
    pcm = _tone()
    dec = codecs.decode(codecs.encode(pcm, codec), codec)
    assert dec.dtype == np.float32
    assert len(dec) == len(pcm)
    # the per-row invariant from BASELINE.json input_hint: SNR >= 30 dB
    assert codecs.snr_db(pcm, dec) >= 30.0


@pytest.mark.parametrize("codec", codecs.CODECS)
def test_payload_length(codec):
    pcm = _tone(n=1234)
    raw = codecs.encode(pcm, codec)
    assert len(raw) == 1234 * codecs.bytes_per_sample(codec)


def test_f32_lossless():
    pcm = _tone().astype(np.float32)
    dec = codecs.decode(codecs.encode(pcm, "pcm_f32le"), "pcm_f32le")
    assert np.array_equal(pcm, dec)
    assert codecs.snr_db(pcm, dec) == float("inf")


def test_corruption_detected():
    pcm = _tone()
    rng = np.random.default_rng(1)
    bad = np.clip(pcm + 0.5 * rng.standard_normal(len(pcm)), -0.999, 0.999)
    dec = codecs.decode(codecs.encode(bad, "pcm_s16le"), "pcm_s16le")
    assert codecs.snr_db(pcm, dec) < 30.0


def test_truncation_is_neg_inf():
    pcm = _tone(n=100)
    raw = codecs.encode(pcm, "pcm_s16le")[:-10]
    assert codecs.snr_db(pcm, codecs.decode(raw, "pcm_s16le")) == float("-inf")


def test_unknown_codec_raises():
    with pytest.raises(ValueError):
        codecs.decode(b"\x00\x01", "opus")
    with pytest.raises(ValueError):
        codecs.encode(np.zeros(4), "mp3")


def test_ulaw_alaw_monotone_small_values():
    # companding must preserve ordering of magnitudes
    vals = np.linspace(-0.9, 0.9, 101)
    for codec in ("ulaw", "alaw"):
        dec = codecs.decode(codecs.encode(vals, codec), codec)
        assert np.all(np.diff(dec) >= 0)


@pytest.mark.parametrize("codec", ["ulaw", "alaw"])
def test_g711_lut_matches_arithmetic_exhaustively(codec):
    """The LUT hot path must be bit-identical to the spec-defining
    arithmetic kernels over the ENTIRE input domain: all 256 payload bytes
    for decode, every int16 quantization level (plus out-of-range floats
    that clip onto it) for encode."""
    dec_arith = getattr(codecs, f"_decode_{codec}_arith")
    enc_arith = getattr(codecs, f"_encode_{codec}_arith")
    all_bytes = bytes(range(256))
    np.testing.assert_array_equal(codecs.decode(all_bytes, codec), dec_arith(all_bytes))
    grid = np.arange(-32768, 32768, dtype=np.float64) / 32768.0
    assert codecs.encode(grid, codec) == enc_arith(grid)
    # off-grid + beyond-full-scale floats take the same clip->quantize path
    rng = np.random.default_rng(3)
    x = rng.uniform(-1.5, 1.5, 100_000)
    assert codecs.encode(x, codec) == enc_arith(x)


@pytest.mark.parametrize("codec", ["ulaw", "alaw"])
def test_g711_encode_never_raises_on_nonfinite(codec):
    """The encode hot path must not raise on NaN/inf samples (a corrupt
    f32 payload decodes to them): the arithmetic kernels emit a garbage
    byte without raising, and plain LUT fancy-indexing would IndexError on
    NaN -> INT32_MIN and abort the whole Arrow batch in transcode/resample
    stages. Output stays one byte per sample; finite samples unaffected."""
    x = np.array([0.25, np.nan, -0.5, np.inf, -np.inf, 0.0], dtype=np.float32)
    out = codecs.encode(x, codec)
    assert len(out) == x.size
    clean = codecs.encode(np.nan_to_num(x, nan=0.0, posinf=1.0, neginf=-1.0), codec)
    # finite positions identical to encoding the same finite values alone
    for i in (0, 2, 5):
        assert out[i] == clean[i]
