"""End-to-end decode tests on synthetic streams from testgen/vorbis_writer:
codec topologies the bundled fixtures never exercise (Floor0, Residue0/2,
5.1 coupling, multi-submap, extreme block sizes).

Each test decodes with the numpy oracle and the batched device engine and
requires bit-for-bit agreement in length plus <=2e-6 sample agreement
(matmul-IMDCT vs scalar-IMDCT rounding), mirroring the north-star parity
budget.  The oracle itself is validated against the reference on the real
fixtures in test_decode.py; these tests extend that trust to the wider
grammar.
"""

import numpy as np
import pytest

import nvorbis_tpu as nv
from nvorbis_tpu.testgen.vorbis_writer import (
    BitWriter, BookSpec, make_simple_spec, _float32_pack,
)
from nvorbis_tpu.utils.bitmath import vorbis_float32


def _decode_both(blob, tol=2e-6):
    o = nv.VorbisReader(blob, engine="oracle")
    pcm_o = o.read_all()
    j = nv.VorbisReader(blob, engine="jax")
    pcm_j = j.read_all()
    assert len(pcm_o) == len(pcm_j)
    assert len(pcm_o) > 0
    assert np.isfinite(pcm_o).all()
    d = float(np.abs(pcm_o - pcm_j).max()) if len(pcm_o) else 0.0
    assert d <= tol, f"oracle/jax diff {d}"
    return pcm_o, o


def test_float32_pack_roundtrip():
    for x in (0.0, 1.0, -1.0, 0.25, -0.125, 3.5, 1e-4 * 0, 2.0, -2.0, 0.0625):
        assert float(vorbis_float32(_float32_pack(x))) == x


def test_bitwriter_roundtrip():
    from nvorbis_tpu.ogg.bitreader import BitReader

    bw = BitWriter()
    vals = [(5, 3), (0, 1), (1023, 10), (0x564342, 24), (7, 64)]
    for v, n in vals:
        bw.write(v, n)
    r = BitReader(bw.to_bytes())
    for v, n in vals:
        assert r.read_bits(n) == v


def test_stereo_coupled_residue2():
    spec = make_simple_spec(channels=2, residue_type=2)
    rng = np.random.default_rng(11)
    blob = spec.build_stream(rng, 40)
    pcm, r = _decode_both(blob)
    assert r.channels == 2
    assert r.sample_rate == 44100


def test_5dot1_surround_48k_residue2_coupling():
    """The BASELINE '5.1 @ 48 kHz Residue2/coupling' configuration."""
    spec = make_simple_spec(
        channels=6, sample_rate=48000, residue_type=2,
        couplings=[(0, 1), (2, 3), (4, 5), (0, 2)],
    )
    rng = np.random.default_rng(12)
    blob = spec.build_stream(rng, 24)
    pcm, r = _decode_both(blob)
    assert r.channels == 6
    assert r.sample_rate == 48000


def test_residue_type0():
    spec = make_simple_spec(channels=1, residue_type=0, couplings=[])
    rng = np.random.default_rng(13)
    blob = spec.build_stream(rng, 30)
    _decode_both(blob)


def test_residue_type1_uncoupled():
    spec = make_simple_spec(channels=2, residue_type=1, couplings=[])
    rng = np.random.default_rng(14)
    blob = spec.build_stream(rng, 30)
    _decode_both(blob)


def test_floor0_lsp():
    """Floor type 0 (LSP) end to end — no bundled fixture uses it.

    Looser tolerance: LSP gains push unclipped magnitudes to O(10), so the
    f32-matmul IMDCT carries ~1e-5 absolute error vs the f64 oracle."""
    spec = make_simple_spec(channels=1, residue_type=1, couplings=[],
                            floor_type=0)
    rng = np.random.default_rng(15)
    blob = spec.build_stream(rng, 20)
    _decode_both(blob, tol=1e-4)


def test_extreme_block_sizes():
    spec = make_simple_spec(channels=1, residue_type=1, couplings=[],
                            block0=64, block1=8192)
    rng = np.random.default_rng(16)
    blob = spec.build_stream(rng, 24)
    _decode_both(blob)


def test_silent_channels_no_energy_coupling():
    """Floors transmitting no energy: do-not-decode + coupling propagation
    (NVorbis/Mapping.cs:112-119, StreamDecoder zero-fill semantics)."""
    spec = make_simple_spec(channels=2, residue_type=2)
    rng = np.random.default_rng(17)

    def schedule(i):
        if i % 5 == 1:
            return (0,)     # mag silent, angle drives both
        if i % 5 == 3:
            return (0, 1)   # fully silent frame
        return ()

    blob = spec.build_stream(rng, 30, silent_schedule=schedule)
    _decode_both(blob)


def test_multi_submap():
    """Two submaps with distinct residues (channel mux routing)."""
    from nvorbis_tpu.testgen.vorbis_writer import (
        Floor1Spec, MappingSpec, ModeSpec, ResidueSpec, StreamSpec,
    )

    post_book = BookSpec(1, 256)
    classbook = BookSpec(2, 16)
    vq1 = BookSpec(4, 16, map_type=1, min_value=-2.0, delta=0.25, value_bits=5)
    vq2 = BookSpec(2, 16, map_type=2, min_value=-1.0, delta=0.125, value_bits=5)
    books = [post_book, classbook, vq1, vq2]
    floor = Floor1Spec(range_bits=8, partitions=2, class_dim=2,
                       post_book=post_book)
    res_a = ResidueSpec(1, 0, 128, 16, 4, classbook,
                        [[vq1], [vq2], [None], [vq1]])
    res_b = ResidueSpec(1, 0, 64, 8, 4, classbook,
                        [[vq2], [None], [vq1], [None]])
    mapping = MappingSpec(couplings=[], mux=[0, 1],
                          submaps=((0, 0), (0, 1)))
    spec = StreamSpec(2, 44100, 256, 2048, books, [floor], [res_a, res_b],
                      [mapping], [ModeSpec(0), ModeSpec(1)])
    rng = np.random.default_rng(18)
    blob = spec.build_stream(rng, 24)
    _decode_both(blob)


def test_native_unpack_parity_on_synthetic():
    """The C++ host plane must agree with the python oracle on synthetic
    streams too (it is the production unpack path)."""
    from nvorbis_tpu.native import NativeUnpacker

    spec = make_simple_spec(channels=6, sample_rate=48000, residue_type=2,
                            couplings=[(0, 1), (2, 3), (4, 5)])
    rng = np.random.default_rng(19)
    blob = spec.build_stream(rng, 16)

    r = nv.VorbisReader(blob, engine="oracle")
    dec = r._stream_decoder
    native = NativeUnpacker(dec._setup, dec._max_posts)
    if native._lib is None:
        pytest.skip("native library unavailable")

    raw = []
    while True:
        p = dec._packet_provider.get_next_packet()
        if p is None:
            break
        raw.append(bytes(p.data))
        p.done()
    residue, ys, used, has_floor, meta = native.unpack(raw)
    assert meta[:, 0].all(), "all packets should unpack ok"

    # python-side unpack for comparison
    from nvorbis_tpu.codec.frames import unpack_audio_packet
    from nvorbis_tpu.ogg.bitreader import BitReader

    setup = dec._setup
    for i, data in enumerate(raw):
        pkt = BitReader(data)
        sym = unpack_audio_packet(setup, pkt, dec._floor_id_map,
                                  dec._max_posts)
        assert sym is not None
        mode_idx = int(meta[i, 1])
        assert setup.modes.index(sym.mode) == mode_idx
        n2 = sym.mode.block_size // 2
        np.testing.assert_array_equal(residue[i, :, :n2], sym.residue)
        np.testing.assert_array_equal(has_floor[i], sym.has_floor)


def test_batch_decoder_on_synthetic_51():
    """Co-batched multi-stream decode of 5.1 surround synthetic streams."""
    from nvorbis_tpu.parallel.batch import BatchDecoder

    spec = make_simple_spec(channels=6, sample_rate=48000, residue_type=2,
                            couplings=[(0, 1), (2, 3), (4, 5)])
    blobs = [
        spec.build_stream(np.random.default_rng(20 + k), 16,
                          serial=0x5150 + k)
        for k in range(3)
    ]
    outs = BatchDecoder(blobs).decode_all()
    for blob, got in zip(blobs, outs):
        ref = nv.VorbisReader(blob, engine="oracle").read_all()
        assert len(got) == len(ref)
        assert float(np.abs(got - ref).max()) <= 2e-6


def test_long_codewords_overflow_decode():
    """Codes longer than the 10-bit prefix table exercise the overflow list
    (NVorbis/Huffman.cs:9, Codebook.cs:294-320) in both the python and C++
    decoders."""
    from nvorbis_tpu.testgen.vorbis_writer import (
        BookSpec, Floor1Spec, MappingSpec, ModeSpec, ResidueSpec, StreamSpec,
    )

    # complete Kraft code: lengths 1..13 + a second 13 (sum == 1); the
    # 11-13 bit codes overflow MAX_TABLE_BITS=10
    lengths = list(range(1, 14)) + [13]
    long_book = BookSpec(1, 14, lengths=lengths)
    post_book = BookSpec(1, 256)
    classbook = BookSpec(2, 16)
    vq_long = BookSpec(2, 14, lengths=lengths, map_type=2,
                       min_value=-1.0, delta=0.125, value_bits=5)
    books = [long_book, post_book, classbook, vq_long]
    floor = Floor1Spec(post_book=long_book)  # 14 entries < range: valid vals
    res = ResidueSpec(2, 0, 128, 16, 4, classbook,
                      [[vq_long], [None], [vq_long], [None]])
    mapping = MappingSpec(couplings=[(0, 1)])
    spec = StreamSpec(2, 44100, 256, 2048, books, [floor], [res],
                      [mapping], [ModeSpec(0), ModeSpec(1)])
    rng = np.random.default_rng(81)
    blob = spec.build_stream(rng, 30)
    _decode_both(blob)


def test_ordered_and_sparse_codebooks():
    """Ordered (run-length) and sparse codebook header forms decode the
    same as their explicit-length equivalents
    (NVorbis/Codebook.cs:76-123 both branches)."""
    from nvorbis_tpu.testgen.vorbis_writer import (
        Floor1Spec, MappingSpec, ModeSpec, ResidueSpec, StreamSpec,
    )

    # ordered: non-decreasing complete code 1..13 + 13
    ordered_book = BookSpec(1, 14, lengths=list(range(1, 14)) + [13],
                            ordered=True)
    # sparse: complete code over the used entries, two unused holes
    sparse_lengths = [2, 2, -1, 3, 3, -1, 3, 3, -1, -1]  # Kraft sum = 1
    sparse_vq = BookSpec(2, 10, lengths=sparse_lengths, map_type=2,
                         min_value=-1.0, delta=0.125, value_bits=5,
                         sparse=True)
    classbook = BookSpec(2, 16)
    books = [ordered_book, sparse_vq, classbook]
    floor = Floor1Spec(post_book=ordered_book)
    res = ResidueSpec(2, 0, 128, 16, 4, classbook,
                      [[sparse_vq], [None], [sparse_vq], [None]])
    mapping = MappingSpec(couplings=[(0, 1)])
    spec = StreamSpec(2, 44100, 256, 2048, books, [floor], [res],
                      [mapping], [ModeSpec(0), ModeSpec(1)])
    blob = spec.build_stream(np.random.default_rng(91), 24)
    _decode_both(blob)
