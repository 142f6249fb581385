"""Multiplexed (page-interleaved) physical streams: multiple logical serials
concurrently in one container — the reference surfaces each as its own
stream decoder (NVorbis/VorbisReader.cs:74-87, Ogg/PageReader.cs:125-158)."""

import numpy as np

import nvorbis_tpu as nv
from nvorbis_tpu.testgen.ogg_writer import interleave_streams, split_pages
from nvorbis_tpu.testgen.vorbis_writer import make_simple_spec


def _two_streams():
    spec = make_simple_spec(channels=2, residue_type=2)
    a = spec.build_stream(np.random.default_rng(61), 30, serial=0xAAA1)
    b = spec.build_stream(np.random.default_rng(62), 24, serial=0xBBB2)
    return a, b


def test_split_pages_roundtrip():
    a, _ = _two_streams()
    assert b"".join(split_pages(a)) == a


def test_multiplexed_streams_decode_independently():
    a, b = _two_streams()
    ref_a = nv.VorbisReader(a, engine="oracle").read_all()
    ref_b = nv.VorbisReader(b, engine="oracle").read_all()

    mux = interleave_streams(a, b)
    r = nv.VorbisReader(mux, engine="oracle")
    while len(r.streams) < 2 and r.find_next_stream():
        pass
    assert len(r.streams) == 2

    # decoders are added in construction-COMPLETION order (nested page reads
    # during header decode can finish another serial first — same semantics
    # as the reference's ProcessNewStream); map by serial
    by_serial = {
        d._packet_provider.stream_serial: i for i, d in enumerate(r.streams)
    }
    r.switch_streams(by_serial[0xAAA1])
    got_a = r.read_all()
    # returns whether the stream PARAMETERS changed (same spec -> False)
    assert r.switch_streams(by_serial[0xBBB2]) is False
    got_b = r.read_all()
    np.testing.assert_array_equal(got_a, ref_a)
    np.testing.assert_array_equal(got_b, ref_b)


def test_ignore_stream_event():
    # chained layout: the second serial appears only when scanning forward,
    # after the user has attached the new-stream handler
    a, b = _two_streams()
    chained = a + b
    seen = []

    def cb(args):
        seen.append(args.stream_decoder)
        args.ignore_stream = True

    r = nv.VorbisReader(chained, engine="oracle")
    assert len(r.streams) == 1
    r.new_stream = cb
    while r.find_next_stream():
        pass
    assert len(seen) == 1
    assert len(r.streams) == 1  # the second serial was rejected
