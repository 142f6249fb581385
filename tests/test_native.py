"""Bit-exactness of the C++ host plane against the Python host plane.

The native unpack (nvorbis_tpu/native/host_decode.cpp) must produce the same
dense tensors as codec/frames.py::unpack_audio_packet for every packet —
including floor bail-outs, residue truncation handling, and bit accounting.
"""

import numpy as np
import pytest

import nvorbis_tpu as nv
from nvorbis_tpu.codec.frames import unpack_audio_packet

from conftest import fixture_path

FIXTURES = ["1test.ogg", "2test.ogg", "3test.ogg", "issue6test.ogg"]


def _native_or_skip(setup, max_posts):
    try:
        from nvorbis_tpu.native import NativeUnpacker

        return NativeUnpacker(setup, max_posts)
    except Exception as e:  # toolchain unavailable
        pytest.skip(f"native host plane unavailable: {e}")


@pytest.mark.parametrize("name", FIXTURES)
def test_native_unpack_bit_exact(name):
    r = nv.VorbisReader(fixture_path(name), engine="oracle")
    dec = r._stream_decoder
    setup, fmap, mposts = dec._setup, dec._floor_id_map, dec._max_posts
    nu = _native_or_skip(setup, mposts)

    pkts = []
    while True:
        p = dec._packet_provider.get_next_packet()
        if p is None:
            break
        pkts.append(p)
    raw = [bytes(p.data) for p in pkts]
    residue, ys, used, has_floor, meta = nu.unpack(raw)

    for i, p in enumerate(pkts):
        p.reset()
        frame = unpack_audio_packet(setup, p, fmap, mposts)
        if frame is None:
            assert meta[i, 0] != 1
            continue
        assert meta[i, 0] == 1
        n2 = frame.n // 2
        np.testing.assert_array_equal(frame.residue, residue[i, :, :n2])
        np.testing.assert_array_equal(frame.floor1_ys, ys[i])
        np.testing.assert_array_equal(frame.floor1_used, used[i].astype(bool))
        np.testing.assert_array_equal(frame.has_floor, has_floor[i].astype(bool))
        assert meta[i, 1] == setup.modes.index(frame.mode)
        assert meta[i, 2] == frame.window_index
        assert meta[i, 3] == frame.bits_read
        # rows beyond this block's n2 stay zero
        assert not residue[i, :, n2:].any()
    r.dispose()


def test_native_truncated_packets_match_python():
    """Truncating an audio packet at every byte boundary must bail the same
    way as the Python path (graceful partial decode, same tensors)."""
    r = nv.VorbisReader(fixture_path("1test.ogg"), engine="oracle")
    dec = r._stream_decoder
    setup, fmap, mposts = dec._setup, dec._floor_id_map, dec._max_posts
    nu = _native_or_skip(setup, mposts)

    # take a real mid-stream audio packet of useful size
    from nvorbis_tpu.ogg.packets import Packet

    data = b""
    for _ in range(20):
        p = dec._packet_provider.get_next_packet()
        if p is not None and len(p.data) >= 40:
            data = bytes(p.data)
    assert len(data) >= 40

    truncs = sorted(set([0, 1, 2, 3, 5, 8, 13, 21, len(data) // 2, len(data) - 1]))
    raw = [data[:t] for t in truncs]
    residue, ys, used, has_floor, meta = nu.unpack(raw)
    for i, t in enumerate(truncs):
        pk = Packet(data[:t])
        frame = unpack_audio_packet(setup, pk, fmap, mposts)
        if frame is None:
            assert meta[i, 0] != 1
            continue
        assert meta[i, 0] == 1
        n2 = frame.n // 2
        np.testing.assert_array_equal(frame.residue, residue[i, :, :n2])
        np.testing.assert_array_equal(frame.floor1_ys, ys[i])
        np.testing.assert_array_equal(frame.floor1_used, used[i].astype(bool))
    r.dispose()
