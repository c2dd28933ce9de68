"""G.711 mu-law wire codec: conformance vs CPython audioop, round-trip
quality, and chunk encoding."""

import numpy as np
import pytest

from piper_tpu.runtime.codec import (
    RAW_FORMATS,
    encode_chunk,
    mulaw_decode,
    mulaw_encode,
)

audioop = pytest.importorskip("audioop")  # stdlib <= 3.12; oracle only


def test_encode_matches_audioop_exhaustive():
    # every int16 value
    pcm = np.arange(-32768, 32768, dtype=np.int16)
    ours = mulaw_encode(pcm).tobytes()
    theirs = audioop.lin2ulaw(pcm.tobytes(), 2)
    assert ours == theirs


def test_decode_matches_audioop_exhaustive():
    codes = np.arange(256, dtype=np.uint8)
    ours = mulaw_decode(codes)
    theirs = np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), "<i2")
    assert np.array_equal(ours, theirs)


def test_round_trip_snr():
    rng = np.random.default_rng(0)
    t = np.linspace(0.0, 1.0, 22050)
    sig = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(
        t.shape
    )
    pcm = (np.clip(sig, -1, 1) * 32767).astype(np.int16)
    back = mulaw_decode(mulaw_encode(pcm)).astype(np.float64)
    err = back - pcm.astype(np.float64)
    snr_db = 10 * np.log10(np.sum(pcm.astype(np.float64) ** 2) / np.sum(err**2))
    assert snr_db > 30  # telephony-grade companding


def test_decode_monotonic_in_magnitude():
    # decoded magnitudes grow monotonically as encoded magnitude grows
    pcm = np.arange(0, 32768, 7, dtype=np.int16)
    dec = mulaw_decode(mulaw_encode(pcm)).astype(np.int32)
    assert np.all(np.diff(dec) >= 0)


def test_encode_chunk_formats():
    audio = np.array([0.0, 0.5, -0.5, 1.5, -1.5], np.float32)
    s16 = encode_chunk(audio, "s16le")
    assert len(s16) == 2 * audio.size
    pcm = np.frombuffer(s16, "<i2")
    assert pcm[3] == 32767 and pcm[4] == -32767  # clipped
    ul = encode_chunk(audio, "mulaw")
    assert len(ul) == audio.size
    # decodes near the original
    back = mulaw_decode(np.frombuffer(ul, np.uint8)) / 32767.0
    assert np.allclose(back[:3], audio[:3], atol=0.02)
    with pytest.raises(ValueError):
        encode_chunk(audio, "opus")
    assert set(RAW_FORMATS) == {"s16le", "mulaw"}


def test_mulaw_encode_jnp_bit_exact_exhaustive():
    """The in-graph (device-side) encoder used by wire_format='mulaw'
    must match the host codec on every int16 value."""
    import jax
    import jax.numpy as jnp

    from piper_tpu.runtime.codec import mulaw_encode_jnp

    pcm = np.arange(-32768, 32768, dtype=np.int16)
    dev = np.asarray(jax.jit(mulaw_encode_jnp)(jnp.asarray(pcm)))
    assert np.array_equal(dev, mulaw_encode(pcm))
