"""Seek, forward-only streaming, and corruption paths on synthetic streams —
extends the fixture-based coverage in test_seek.py / test_ogg.py to codec
topologies (5.1 coupling, extreme blocks) the fixtures never hit."""

import io

import numpy as np

import nvorbis_tpu as nv
from nvorbis_tpu.testgen.vorbis_writer import make_simple_spec


class _ForwardOnly(io.RawIOBase):
    def __init__(self, data):
        self._b = io.BytesIO(data)

    def readable(self):
        return True

    def seekable(self):
        return False

    def readinto(self, b):
        return self._b.readinto(b)


def _spec51():
    return make_simple_spec(channels=6, sample_rate=48000, residue_type=2,
                            couplings=[(0, 1), (2, 3), (4, 5)])


def test_seek_synthetic_51():
    blob = _spec51().build_stream(np.random.default_rng(41), 40)
    full = nv.VorbisReader(blob, engine="oracle").read_all()
    r = nv.VorbisReader(blob, engine="oracle")
    C = r.channels
    for target in (0, 1000, 7777, r.total_samples - 500):
        r.sample_position = target
        want = (r.total_samples - target) * C
        buf = np.zeros(min(want, 4096 * C), dtype=np.float32)
        n = r.read_samples(buf)
        assert n > 0
        np.testing.assert_allclose(
            buf[:n], full[target * C : target * C + n], atol=1e-7
        )


def test_forward_only_synthetic():
    blob = _spec51().build_stream(np.random.default_rng(42), 20)
    ref = nv.VorbisReader(blob, engine="oracle").read_all()
    r = nv.VorbisReader(_ForwardOnly(blob), engine="oracle")
    got = r.read_all()
    assert len(got) == len(ref)
    np.testing.assert_array_equal(got, ref)


def test_truncated_synthetic_decodes_partially():
    blob = _spec51().build_stream(np.random.default_rng(43), 200)
    ref = nv.VorbisReader(blob, engine="oracle").read_all()
    r = nv.VorbisReader(blob[: len(blob) * 2 // 3], engine="oracle")
    got = r.read_all()
    assert 0 < len(got) < len(ref)
    np.testing.assert_array_equal(got, ref[: len(got)])


def test_mid_stream_bitflip_degrades_gracefully():
    blob = bytearray(_spec51().build_stream(np.random.default_rng(44), 200))
    blob[len(blob) // 2] ^= 0xFF  # corrupt one byte mid-file (CRC rejects)
    r = nv.VorbisReader(bytes(blob), engine="oracle")
    got = r.read_all()
    assert len(got) > 0
    assert np.isfinite(got).all()


def test_seek_jax_engine_matches_oracle():
    spec = make_simple_spec(channels=2, residue_type=2)
    blob = spec.build_stream(np.random.default_rng(45), 40)
    a = nv.VorbisReader(blob, engine="oracle")
    b = nv.VorbisReader(blob, engine="jax")
    for target in (123, 9000):
        a.sample_position = target
        b.sample_position = target
        ba = np.zeros(2048 * 2, np.float32)
        bb = np.zeros(2048 * 2, np.float32)
        na = a.read_samples(ba)
        nb = b.read_samples(bb)
        assert na == nb
        assert float(np.abs(ba[:na] - bb[:nb]).max()) <= 2e-6


def test_forward_only_jax_engine():
    """Non-seekable source through the batched device engine."""
    spec = make_simple_spec(channels=2, residue_type=2)
    blob = spec.build_stream(np.random.default_rng(46), 30)
    ref = nv.VorbisReader(blob, engine="oracle").read_all()
    got = nv.VorbisReader(_ForwardOnly(blob), engine="jax").read_all()
    assert len(got) == len(ref)
    assert float(np.abs(got - ref).max()) <= 2e-6
