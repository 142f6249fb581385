"""Adjudication of the residue channel-masking divergence (VERDICT r4 #7).

The Vorbis I spec (and libvorbis, res_inverse) SKIPS do-not-decode
channels when reading residue classwords and vectors.  NVorbis's
``Residue0.Decode`` (/root/reference/NVorbis/Residue0.cs:119-178) reads
classwords and vectors for EVERY channel of the submap, consulting
``doNotDecodeChannel`` only for the all-silent early exit — so on any
multi-channel type-0/1 residue packet where one channel has no floor
energy (and no coupling forces it back on), NVorbis consumes a different
bit sequence than the spec walk and desyncs for the rest of the packet.

This repo follows the spec (codec/residue.py:7-14; the C++ twin in
native/host_decode.cpp residue_decode).  The adjudication below builds a
synthetic stereo type-1 stream with uncoupled silent-channel packets —
exactly the divergence trigger — and shows:

1. the repo's engines agree with each other on it, bit for bit;
2. libvorbis (the Xiph reference decoder) agrees with the repo;
3. a faithful simulation of NVorbis's walk on the first silent-channel
   packet consumes a different number of bits than the spec walk — i.e.
   the reference itself desyncs there, and the spec behavior is the only
   defensible one.  (We therefore do NOT ship a bug-compat mode.)
"""

import io

import numpy as np
import pytest

import nvorbis_tpu as nv
from nvorbis_tpu.ogg.bitreader import BitReader
from nvorbis_tpu.testgen.vorbis_writer import make_simple_spec


@pytest.fixture(scope="module")
def masked_blob():
    # type 1, two channels in one submap, NO couplings (a coupling would
    # force-energy the silent channel and hide the divergence)
    spec = make_simple_spec(channels=2, sample_rate=44100, residue_type=1,
                            couplings=[])
    # every third packet transmits no floor for channel 1
    silent = frozenset(range(2, 96, 3))
    return spec.build_stream(
        np.random.default_rng(11), 96,
        silent_schedule=lambda i: (1,) if i in silent else (),
    )


def test_engines_agree(masked_blob):
    gold = nv.VorbisReader(io.BytesIO(masked_blob), engine="oracle").read_all()
    host = nv.VorbisReader(io.BytesIO(masked_blob), engine="host").read_all()
    assert host.shape == gold.shape
    assert float(np.max(np.abs(host - gold))) <= 2e-6
    assert len(gold) > 0


def test_libvorbis_agrees_with_spec_walk(masked_blob):
    from tests.libvorbis_oracle import available, decode_bytes

    if not available():
        pytest.skip("libvorbisfile not present")
    ref = np.asarray(decode_bytes(masked_blob)).reshape(-1)  # interleave
    r = nv.VorbisReader(io.BytesIO(masked_blob), engine="host")
    r.clip_samples = False  # ov_read_float returns unclipped floats
    got = r.read_all()
    assert len(ref) == len(got) > 0
    assert float(np.max(np.abs(ref - got))) <= 1e-5


def _find_silent_packet(setup, provider):
    """First audio packet where exactly one channel has floor energy;
    returns (packet_bytes, dnd, block_size, bits_at_residue)."""
    from nvorbis_tpu.codec.floor import Floor1

    while True:
        pk = provider.get_next_packet()
        if pk is None:
            return None
        data = bytes(pk.data)
        pk.done()
        br = BitReader(data)
        if br.read_bit():
            continue
        mode = setup.modes[br.read_bits(setup.mode_field_bits)]
        if mode.block_flag:
            br.read_bits(2)
        has = []
        for c in range(setup.channels):
            fl = setup.floors[mode.mapping.channel_floor[c]]
            assert isinstance(fl, Floor1)
            d = fl.unpack(br, mode.block_size, c)
            has.append(bool(d is not None and d.has_floor))
        if has.count(True) == 1:
            return data, [not h for h in has], mode.block_size, br.bits_read


def _walk(res, setup, br, dnd, block_size, skip_masked):
    """Count residue bits consumed: ``skip_masked=True`` is the spec walk
    (and this repo's), False is NVorbis's Residue0.Decode read order."""
    half = block_size // 2
    end = min(res.end, half)
    n = end - res.begin
    psize = res.partition_size
    partitions = n // psize
    cb = res.classbook
    cb_dims = cb.dimensions
    part_words = -(-partitions // cb_dims)
    n_ch = len(dnd)
    cache = [[None] * part_words for _ in range(n_ch)]
    for stage in range(res.max_stages):
        pi = ei = 0
        while pi < partitions:
            if stage == 0:
                for c in range(n_ch):
                    if skip_masked and dnd[c]:
                        continue
                    idx = cb.decode_scalar(br)
                    assert 0 <= idx < len(res.decode_map), (
                        "classword decode left the valid range - desync")
                    cache[c][ei] = res.decode_map[idx]
            d = 0
            while pi < partitions and d < cb_dims:
                for c in range(n_ch):
                    if skip_masked and dnd[c]:
                        continue
                    row = cache[c][ei]
                    cls = int(row[d]) if row is not None else 0
                    if res.cascade[cls] & (1 << stage):
                        book = res.books[cls][stage]
                        if book is not None:
                            steps = -(-psize // book.dimensions)
                            for _ in range(steps):
                                e = book.decode_scalar(br)
                                if e == -1:
                                    return br.bits_read, True
                d += 1
                pi += 1
            ei += 1
    return br.bits_read, False


def test_nvorbis_walk_desyncs(masked_blob):
    """The reference's all-channels walk reads a different bit sequence on
    the silent-channel packet — proving the divergence is NVorbis's bug,
    not a semantics choice this repo should replicate."""
    r = nv.VorbisReader(io.BytesIO(masked_blob), engine="oracle")
    dec = r._stream_decoder
    setup = dec._setup
    found = _find_silent_packet(setup, dec._packet_provider)
    assert found is not None, "fixture must contain a silent-channel packet"
    data, dnd, block_size, bits0 = found
    assert dnd.count(True) == 1

    res = setup.residues[setup.modes[0].mapping.submap_residue[0]]

    br_spec = BitReader(data)
    br_spec.skip_bits(bits0)
    spec_bits, spec_trunc = _walk(res, setup, br_spec, dnd, block_size,
                                  skip_masked=True)
    assert not spec_trunc, "spec walk must decode the packet cleanly"

    br_nv = BitReader(data)
    br_nv.skip_bits(bits0)
    try:
        nv_bits, nv_trunc = _walk(res, setup, br_nv, dnd, block_size,
                                  skip_masked=False)
    except AssertionError:
        return  # classword left the valid range: a hard desync, QED
    # no hard failure: the walks still consumed different bit positions,
    # so everything after this packet's residue is misread by NVorbis
    assert nv_trunc or nv_bits != spec_bits, (
        "walks consumed identical bits - fixture failed to trigger the "
        "divergence")
