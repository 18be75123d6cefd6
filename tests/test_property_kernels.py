"""Property-based tests (hypothesis) for the pure-numpy kernels — the
codec transforms and drift statistics that everything payload- and
drift-related sits on. No SparkSession: these run per-example, so only
driver-side kernels belong here."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from audit_anomaly_detection_etl_spark.functions import codecs, stats

# float PCM in the codecs contract range [-1, 1), no NaN/Inf
pcm_arrays = arrays(
    np.float64,
    st.integers(min_value=1, max_value=400),
    elements=st.floats(min_value=-1.0, max_value=0.999, width=64,
                       allow_nan=False, allow_infinity=False),
)

count_arrays = arrays(
    np.float64,
    st.integers(min_value=2, max_value=64),
    elements=st.integers(min_value=0, max_value=10_000).map(float),
)


@settings(max_examples=60, deadline=None)
@given(pcm_arrays)
def test_pcm_s16le_roundtrip_quantization_bound(pcm):
    out = codecs.decode(codecs.encode(pcm, "pcm_s16le"), "pcm_s16le")
    assert out.shape == pcm.shape
    # int16 quantization: error bounded by one LSB
    assert np.max(np.abs(out - pcm)) <= 1.0 / 32768.0 + 1e-12


@settings(max_examples=60, deadline=None)
@given(pcm_arrays)
def test_pcm_f32le_roundtrip_is_float32_exact(pcm):
    out = codecs.decode(codecs.encode(pcm, "pcm_f32le"), "pcm_f32le")
    np.testing.assert_array_equal(out, pcm.astype(np.float32))


@settings(max_examples=60, deadline=None)
@given(pcm_arrays, st.sampled_from(["ulaw", "alaw"]))
def test_g711_roundtrip_snr_floor(pcm, codec):
    """G.711 companding holds near-constant SNR for signals comfortably
    above the quantizer floor; silence-adjacent samples are excluded from
    the guarantee the same way payload checks exclude them."""
    rms = float(np.sqrt(np.mean(pcm**2)))
    if rms < 1e-2:
        return  # below companding's useful range — no SNR guarantee
    out = codecs.decode(codecs.encode(pcm, codec), codec).astype(np.float64)
    assert out.shape == pcm.shape
    snr = codecs.snr_db(pcm, out)
    assert snr >= 25.0, (codec, rms, snr)
    # companded code is idempotent: re-encoding the decoded signal is stable
    out2 = codecs.decode(codecs.encode(out, codec), codec).astype(np.float64)
    np.testing.assert_allclose(out2, out, atol=2e-4)


@settings(max_examples=80, deadline=None)
@given(count_arrays)
def test_psi_ks_identity_and_bounds(counts):
    if counts.sum() == 0:
        counts = counts + 1.0
    # identical distributions: both metrics are ~0 (up to the PSI epsilon)
    assert stats.psi(counts, counts) < 1e-6
    assert stats.ks_statistic(counts, counts) == 0.0
    # count SCALING leaves both metrics unchanged (they compare shapes)
    assert abs(stats.psi(counts, counts * 7.0)) < 1e-6
    assert stats.ks_statistic(counts, counts * 7.0) < 1e-12


@settings(max_examples=80, deadline=None)
@given(count_arrays, count_arrays)
def test_ks_bounds_and_symmetry(a, b):
    if a.sum() == 0:
        a = a + 1.0
    n = max(len(a), len(b))
    a = np.resize(a, n)
    b = np.resize(b, n)
    if b.sum() == 0:
        b = b + 1.0
    ks = stats.ks_statistic(a, b)
    assert 0.0 <= ks <= 1.0 + 1e-12
    assert ks == stats.ks_statistic(b, a)  # symmetric
    # PSI is non-negative (it is a sum of f(x) >= 0 terms)
    assert stats.psi(a, b) >= -1e-12


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=10_000),
       st.integers(min_value=1, max_value=10_000))
def test_ks_critical_monotone_in_sample_size(n, m):
    """More data -> tighter KS critical value; always positive."""
    c = stats.ks_critical(n, m)
    assert c > 0
    assert stats.ks_critical(n * 4, m * 4) < c


# --- parse_wav adversarial-bytes contract --------------------------------
# The RIFF walker feeds the wav_metadata mapInPandas pass, which catches
# ONLY ValueError (operators/media.py) — any other exception type from a
# malformed payload would kill the whole Arrow batch, failing every clip in
# it instead of just the torn one. Contract: arbitrary bytes either parse
# to a dict or raise ValueError; mutated VALID containers too.

_garbage = st.binary(max_size=64)
_mutation = st.tuples(
    st.integers(min_value=0, max_value=199),  # flip position (mod len)
    st.integers(min_value=0, max_value=255),  # new byte value
    st.integers(min_value=0, max_value=200),  # truncation point (mod len+1)
)


@settings(max_examples=200, deadline=None)
@given(_garbage)
def test_parse_wav_garbage_bytes_contract(raw):
    try:
        m = codecs.parse_wav(raw)
        assert isinstance(m, dict) and "data" in m
    except ValueError:
        pass  # the one allowed failure mode


@settings(max_examples=200, deadline=None)
@given(_mutation)
def test_parse_wav_mutated_valid_container_contract(mut):
    pcm = np.linspace(-0.5, 0.5, 40, dtype=np.float64)
    raw = bytearray(codecs.encode_wav(pcm, 8000, "pcm_s16le"))
    pos, val, cut = mut
    raw[pos % len(raw)] = val
    raw = bytes(raw[: cut % (len(raw) + 1)])
    try:
        m = codecs.parse_wav(raw)
        assert isinstance(m, dict)
    except ValueError:
        pass


@settings(max_examples=200, deadline=None)
@given(
    st.one_of(
        st.binary(max_size=64),
        st.binary(max_size=60).map(lambda b: b"\xff\xd8" + b),   # JPEG magic
        st.binary(max_size=56).map(
            lambda b: b"\x89PNG\r\n\x1a\n" + b                   # PNG magic
        ),
    )
)
def test_sniff_image_never_raises(raw):
    from audit_anomaly_detection_etl_spark.operators.media import _sniff_image

    fmt, w, h = _sniff_image(raw)  # contract: 3-tuple, no exception
    assert fmt in (None, "png", "jpeg")
    assert w is None or w >= 0
