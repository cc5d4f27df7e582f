"""Property-based tests (hypothesis) for the pure driver-side helpers —
the parsers and sizing functions whose contracts are "never raise on
arbitrary input" and "exact roundtrip on valid input". No SparkSession:
every example is microseconds, so hundreds of adversarial inputs run per
suite pass."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from datawarehousefinal_spark.operators.dedup import _auto_combo_size
from datawarehousefinal_spark.operators.multimodal import (
    sniff_audio_meta_bytes,
    sniff_image_dims,
    synth_image_bytes,
    synth_wav_bytes,
)
from datawarehousefinal_spark.sources.readers import (
    ENCODING_FALLBACK_CHAIN,
    detect_encoding,
)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=256))
def test_sniff_image_dims_total_on_arbitrary_bytes(payload):
    """Report-don't-throw: any byte string yields a 3-tuple, and a
    recognized format always carries both dims."""
    fmt, w, h = sniff_image_dims(payload)
    if fmt is None:
        assert w is None and h is None
    else:
        assert fmt in ("png", "gif", "bmp", "jpeg")
        assert isinstance(w, int) and isinstance(h, int)


@settings(max_examples=100, deadline=None)
@given(
    st.sampled_from(["png", "gif", "bmp", "jpeg"]),
    st.integers(min_value=1, max_value=65535),
    st.integers(min_value=1, max_value=65535),
)
def test_sniff_image_dims_roundtrips_synth_headers(fmt, w, h):
    assert sniff_image_dims(synth_image_bytes(fmt, w, h)) == (fmt, w, h)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=256))
def test_sniff_audio_total_on_arbitrary_bytes(payload):
    fmt, ch, sr, bits = sniff_audio_meta_bytes(payload)
    if fmt is None:
        assert ch is None and sr is None and bits is None
    else:
        assert fmt == "wav"


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=65535),
    st.integers(min_value=1, max_value=2**31 - 1),
    st.sampled_from([8, 16, 24, 32]),
)
def test_sniff_audio_roundtrips_synth_headers(ch, sr, bits):
    assert sniff_audio_meta_bytes(synth_wav_bytes(ch, sr, bits)) == (
        "wav", ch, sr, bits,
    )


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=1024))
def test_detect_encoding_total_and_in_chain(raw):
    """Any byte string resolves to a member of the fallback chain (the
    last codec decodes every byte value), never an exception."""
    assert detect_encoding(raw) in ENCODING_FALLBACK_CHAIN


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_detect_encoding_utf8_text_is_utf8(s):
    """utf-8 bytes of any text — including a probe cut mid-codepoint by
    the truncation-trim — detect as utf-8."""
    raw = s.encode("utf-8")
    assert detect_encoding(raw) == "utf-8"
    assert detect_encoding(raw[: max(0, len(raw) - 1)]) == "utf-8"


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=10**12),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=10**6),
)
def test_auto_combo_size_bounds_and_monotonicity(n, max_hamming, max_bucket):
    cs = _auto_combo_size(n, max_hamming, max_bucket)
    assert 2 <= cs <= 8
    # more distinct fingerprints can never pick a NARROWER key
    assert _auto_combo_size(n * 2, max_hamming, max_bucket) >= cs
    # and the recall guarantee holds by construction
    assert cs <= (max_hamming + cs) - max_hamming
