"""Co-batched multi-stream decoding (parallel/batch.py) — results must match
per-stream decodes, including across chunk boundaries and on a device mesh."""

import numpy as np
import pytest

import nvorbis_tpu as nv
from nvorbis_tpu.parallel.batch import BatchDecoder

from conftest import fixture_path


def _single(path):
    return nv.VorbisReader(path, engine="jax").read_all()


@pytest.mark.slow
def test_batch_mixed_streams_match_single():
    paths = [
        fixture_path("3test.ogg"),
        fixture_path("1test.ogg"),
        fixture_path("issue6test.ogg"),
        fixture_path("3test.ogg"),
        fixture_path("2test.ogg"),
    ]
    outs = BatchDecoder(paths).decode_all()
    for p, o in zip(paths, outs):
        ref = _single(p)
        assert len(o) == len(ref)
        np.testing.assert_allclose(o, ref, atol=2e-7, rtol=0)


@pytest.mark.slow
def test_batch_multi_chunk_stream(tmp_path):
    from nvorbis_tpu.testgen.ogg_writer import make_long_stream

    out = str(tmp_path / "long.ogg")
    make_long_stream(fixture_path("3test.ogg"), 32, out)  # > CHUNK_FRAMES
    ref = _single(out)
    (o,) = BatchDecoder([out]).decode_all()
    assert len(o) == len(ref)
    np.testing.assert_allclose(o, ref, atol=2e-7, rtol=0)


@pytest.mark.slow
def test_batch_on_device_mesh():
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = Mesh(np.array(devices[:8]), ("stream",))
    paths = [fixture_path("3test.ogg"), fixture_path("issue6test.ogg")]
    outs = BatchDecoder(paths, mesh=mesh).decode_all()
    for p, o in zip(paths, outs):
        ref = _single(p)
        assert len(o) == len(ref)
        np.testing.assert_allclose(o, ref, atol=2e-7, rtol=0)


def test_batch_updates_stream_stats_and_position():
    bd = BatchDecoder([fixture_path("3test.ogg")])
    (o,) = bd.decode_all()
    st = bd._streams[0]
    assert st.decoder.sample_position == len(o) // 2
    assert st.decoder._stats.packet_count > 0


@pytest.mark.slow
def test_batch_sixteen_streams():
    """Scale check: 16 co-batched streams (mixed fixtures) stay per-stream
    exact — exercises slot/table stacking and the shared-cap chunking."""
    import numpy as np
    import nvorbis_tpu as nv
    from nvorbis_tpu.parallel.batch import BatchDecoder
    from tests.conftest import fixture_path

    names = (["1test.ogg", "2test.ogg", "3test.ogg", "issue6test.ogg"] * 4)
    raws = [open(fixture_path(n), "rb").read() for n in names]
    outs = BatchDecoder(raws).decode_all()
    refs = {}
    for n, got in zip(names, outs):
        if n not in refs:
            refs[n] = nv.VorbisReader(fixture_path(n), engine="oracle").read_all()
        assert len(got) == len(refs[n])
        assert float(np.abs(got - refs[n]).max()) <= 2e-6


def test_batch_mixed_topologies_and_fixtures():
    """One BatchDecoder call over disparate topologies (stereo fixture,
    5.1 synthetic, mono type-0 synthetic) — groups split and decode
    independently, each per-stream exact."""
    import numpy as np
    import nvorbis_tpu as nv
    from nvorbis_tpu.parallel.batch import BatchDecoder
    from nvorbis_tpu.testgen.vorbis_writer import make_simple_spec
    from tests.conftest import fixture_path

    fixture = open(fixture_path("3test.ogg"), "rb").read()
    surround = make_simple_spec(
        channels=6, sample_rate=48000, residue_type=2,
        couplings=[(0, 1), (2, 3), (4, 5)],
    ).build_stream(np.random.default_rng(95), 16)
    mono0 = make_simple_spec(
        channels=1, residue_type=0, couplings=[],
    ).build_stream(np.random.default_rng(96), 16)

    sources = [fixture, surround, mono0, fixture]
    outs = BatchDecoder(sources).decode_all()
    for src, got in zip(sources, outs):
        ref = nv.VorbisReader(src, engine="oracle").read_all()
        assert len(got) == len(ref)
        # jax-vs-oracle differ by f32 reduction order in the 1024-term IMDCT
        # matmul (~sqrt(n)*eps ≈ 4e-6 relative); scales with signal peak
        tol = 5e-6 * max(1.0, float(np.abs(ref).max()) if len(ref) else 1.0)
        assert float(np.abs(got - ref).max()) <= tol


@pytest.mark.slow
def test_batch_heterogeneous_stereo_fleet(tmp_path):
    """The bench's batch64_mixed fleet shape (4 distinct stereo 44.1 kHz
    setups: two real encoder outputs + two synthetic topologies with
    different residue configurations/codebooks): symbol-mode co-batching
    keys on codebook content, so the fleet fragments into multiple groups
    — and every stream still decodes exactly."""
    import numpy as np
    import nvorbis_tpu as nv
    from nvorbis_tpu.testgen.ogg_writer import make_long_stream
    from nvorbis_tpu.testgen.vorbis_writer import make_simple_spec

    long3 = str(tmp_path / "l3.ogg")
    long6 = str(tmp_path / "l6.ogg")
    make_long_stream(fixture_path("3test.ogg"), 2, long3)
    make_long_stream(fixture_path("issue6test.ogg"), 2, long6)
    spec_a = make_simple_spec(channels=2, sample_rate=44100, residue_type=2)
    spec_b = make_simple_spec(channels=2, sample_rate=44100, residue_type=1,
                              n_stages=1, couplings=[])
    sources = [
        open(long3, "rb").read(),
        open(long6, "rb").read(),
        spec_a.build_stream(np.random.default_rng(2), 24),
        spec_b.build_stream(np.random.default_rng(3), 24),
    ] * 2

    bd = BatchDecoder(sources)
    groups = {
        BatchDecoder._group_key(st.decoder._setup, st.native)
        for st in bd._streams if st.native is not None
    }
    # the synthetic specs must not co-batch with the fixtures or each
    # other; the two libvorbis files may share static codebooks
    assert len(groups) >= 3
    outs = bd.decode_all()
    for src, got in zip(sources, outs):
        ref = nv.VorbisReader(src, engine="oracle").read_all()
        assert len(got) == len(ref)
        tol = 5e-6 * max(1.0, float(np.abs(ref).max()) if len(ref) else 1.0)
        assert float(np.abs(got - ref).max()) <= tol


def test_batch_floor0_stream_falls_back():
    """A Floor0 stream (no native representation) must degrade to the
    pure-Python host plane inside a batch, not raise — the reference
    decodes Floor0 streams through the same pipeline as every other
    (NVorbis/Floor0.cs)."""
    from nvorbis_tpu.testgen.vorbis_writer import make_simple_spec

    f0 = make_simple_spec(
        channels=2, residue_type=2, floor_type=0
    ).build_stream(np.random.default_rng(21), 12)
    fixture = open(fixture_path("1test.ogg"), "rb").read()

    outs = BatchDecoder([f0, fixture]).decode_all()
    for src, got in zip([f0, fixture], outs):
        ref = nv.VorbisReader(src, engine="oracle").read_all()
        assert len(got) == len(ref)
        tol = 5e-6 * max(1.0, float(np.abs(ref).max()))
        assert float(np.abs(got - ref).max()) <= tol


def test_batch_no_native_falls_back(monkeypatch):
    """With the native plane disabled every stream degrades to the Python
    host plane; the batch still returns correct PCM."""
    monkeypatch.setenv("NVT_NO_NATIVE", "1")
    raw = open(fixture_path("1test.ogg"), "rb").read()
    outs = BatchDecoder([raw, raw]).decode_all()
    ref = nv.VorbisReader(raw, engine="oracle").read_all()
    for got in outs:
        assert len(got) == len(ref)
        assert float(np.abs(got - ref).max()) <= 5e-6


def test_int16_transport_quality(monkeypatch):
    """NVT_FETCH_INT16 halves link bytes at ~3e-5 quantization error; the
    batch output must stay within the 16-bit bound of the exact decode."""
    raw = open(fixture_path("1test.ogg"), "rb").read()
    (exact,) = BatchDecoder([raw]).decode_all()
    monkeypatch.setenv("NVT_FETCH_INT16", "1")
    (quant,) = BatchDecoder([raw]).decode_all()
    assert len(quant) == len(exact)
    assert float(np.abs(quant - exact).max()) <= 1.0 / 32767 + 1e-6
    # and it is genuinely quantized (not the f32 path by accident)
    assert float(np.abs(quant - exact).max()) > 0


def _corrupt_audio_packet(blob, frac, mode):
    """Flip bits inside one mid-stream audio packet and REPAIR the page CRC,
    so the packet reaches the codec layer and fails there (rather than the
    container dropping the page).  mode="type" sets the packet-type bit
    (clean "not audio" rejection); mode="payload" garbles mid-packet bytes
    (mid-decode bail with partial data)."""
    import struct

    from nvorbis_tpu.ogg.crc import crc32
    from nvorbis_tpu.testgen.ogg_writer import split_pages

    pages = split_pages(blob)
    k = max(2, int(len(pages) * frac))
    while True:
        pg = bytearray(pages[k])
        if not (pg[5] & 0x01):  # skip continued-packet pages
            seg = pg[26]
            off = 27 + seg
            if mode == "type":
                pg[off] |= 0x01
            else:
                mid = off + max(4, (len(pg) - off) // 2)
                pg[mid] ^= 0xFF
                pg[mid + 1] ^= 0x5A
            pg[22:26] = b"\0\0\0\0"
            pg[22:26] = struct.pack("<I", crc32(bytes(pg)))
            pages[k] = bytes(pg)
            return b"".join(pages)
        k += 1


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["type", "payload"])
def test_fast_planes_match_oracle_on_bad_packets(tmp_path, mode):
    """A corrupted (CRC-valid) mid-stream packet must flow through the
    vectorized dispatchers' scalar fallback — the drain-previous-tail
    semantics of StreamDecoder.cs:352-356 — identically to the oracle, in
    BOTH the bulk (single-stream read_all) and batch planes."""
    from nvorbis_tpu.testgen.ogg_writer import make_long_stream

    out = str(tmp_path / "long.ogg")
    make_long_stream(fixture_path("3test.ogg"), 4, out)
    blob = open(out, "rb").read()
    blob = _corrupt_audio_packet(blob, 0.3, mode)
    blob = _corrupt_audio_packet(blob, 0.7, mode)

    ref = nv.VorbisReader(blob, engine="oracle").read_all()
    assert len(ref) > 0

    got_bulk = nv.VorbisReader(blob, engine="jax").read_all()
    assert len(got_bulk) == len(ref)
    tol = 5e-6 * max(1.0, float(np.abs(ref).max()))
    assert float(np.abs(got_bulk - ref).max()) <= tol

    outs = BatchDecoder([blob, blob]).decode_all()
    for got in outs:
        assert len(got) == len(ref)
        assert float(np.abs(got - ref).max()) <= tol


def test_fast_planes_bad_packets_51_coupled(tmp_path):
    """Same bad-packet drain parity on a coupled 5.1 Residue2 synthetic:
    the no-energy/coupling interaction after a drained frame is the
    topology the stereo fixture never exercises."""
    from nvorbis_tpu.testgen.vorbis_writer import make_simple_spec

    spec = make_simple_spec(channels=6, sample_rate=48000, residue_type=2,
                            couplings=[(0, 1), (2, 3), (4, 5)])
    blob = spec.build_stream(np.random.default_rng(11), 120)
    blob = _corrupt_audio_packet(blob, 0.5, "payload")

    ref = nv.VorbisReader(blob, engine="oracle").read_all()
    assert len(ref) > 0

    got_bulk = nv.VorbisReader(blob, engine="jax").read_all()
    assert len(got_bulk) == len(ref)
    tol = 5e-6 * max(1.0, float(np.abs(ref).max()))
    assert float(np.abs(got_bulk - ref).max()) <= tol

    (got_batch,) = BatchDecoder([blob]).decode_all()
    assert len(got_batch) == len(ref)
    assert float(np.abs(got_batch - ref).max()) <= tol
