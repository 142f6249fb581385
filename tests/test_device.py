"""Parity of the JAX device plane against the numpy oracle.

The oracle (``synth/oracle.py``) pins the reference semantics
(NVorbis/Mapping.cs + Mode.cs + Floor1.cs + Mdct.cs); the device plane must
match it within the 1e-6 parity budget on every fixture, sample for sample.
"""

import numpy as np
import pytest

import nvorbis_tpu as nv

from conftest import fixture_path

FIXTURES = ["1test.ogg", "2test.ogg", "3test.ogg", "issue6test.ogg"]


@pytest.mark.parametrize("name", FIXTURES)
def test_jax_engine_matches_oracle(name):
    r1 = nv.VorbisReader(fixture_path(name), engine="oracle")
    pcm_oracle = r1.read_all()
    r1.dispose()

    r2 = nv.VorbisReader(fixture_path(name), engine="jax")
    pcm_jax = r2.read_all()
    r2.dispose()

    assert len(pcm_oracle) == len(pcm_jax)
    # budget: f32 device basis vs f64 oracle basis rounds at ~sqrt(n)*eps;
    # observed max ~1.1e-6 on the fixtures (the reference's own f32 FFT
    # differs from the f64 transform by the same order)
    np.testing.assert_allclose(pcm_jax, pcm_oracle, atol=2e-6, rtol=0)


def test_jax_engine_seek_matches_oracle():
    name = "3test.ogg"
    target = 100_000
    count = 4096

    r1 = nv.VorbisReader(fixture_path(name), engine="oracle")
    r1.sample_position = target
    a = np.zeros(count * r1.channels, dtype=np.float32)
    na = r1.read_samples(a)
    r1.dispose()

    r2 = nv.VorbisReader(fixture_path(name), engine="jax")
    r2.sample_position = target
    b = np.zeros(count * r2.channels, dtype=np.float32)
    nb = r2.read_samples(b)
    r2.dispose()

    assert na == nb

    np.testing.assert_allclose(b, a, atol=1e-6, rtol=0)


def test_jax_engine_small_reads_match_bulk():
    """Read-ahead batching must be invisible to chunked read() callers."""
    name = "1test.ogg"
    r1 = nv.VorbisReader(fixture_path(name), engine="jax")
    bulk = r1.read_all()
    r1.dispose()

    r2 = nv.VorbisReader(fixture_path(name), engine="jax")
    chunks = []
    buf = np.zeros(313 * r2.channels, dtype=np.float32)
    while True:
        n = r2.read_samples(buf)
        if n == 0:
            break
        chunks.append(buf[:n].copy())
    r2.dispose()
    chunked = np.concatenate(chunks)
    # the streaming pipeline synthesizes its ramp-up windows (<=32 frames)
    # on the host oracle — cheap seeks/startup — so the first frames differ
    # from the device program by f32 rounding only
    np.testing.assert_allclose(bulk, chunked, atol=2e-6, rtol=0)


def test_device_synth_batch_padding():
    """Power-of-two padding frames must decode to silence and be sliced off."""
    from nvorbis_tpu.synth.device import DeviceSynth

    r = nv.VorbisReader(fixture_path("1test.ogg"), engine="oracle")
    dec = r._stream_decoder
    setup = dec._setup
    mode = setup.modes[0]
    synth = DeviceSynth(setup, mode, max_posts=dec._max_posts)
    B, C, n2, P = 3, setup.channels, synth.n2, dec._max_posts
    rng = np.random.default_rng(0)
    residue = rng.standard_normal((B, C, n2)).astype(np.float32)
    ys = np.zeros((B, C, P), dtype=np.int32)
    used = np.zeros((B, C, P), dtype=np.bool_)
    has_floor = np.zeros((B, C), dtype=np.bool_)
    widx = np.zeros(B, dtype=np.int32)
    out = synth(residue, ys, used, has_floor, widx)
    assert out.shape == (B, C, synth.n)
    # no floor -> curve 0 -> silence
    np.testing.assert_array_equal(out, np.zeros_like(out))
    r.dispose()
