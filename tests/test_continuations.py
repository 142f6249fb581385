"""Forced multi-page packet continuations: packets split across 3+ pages
with granule -1 middle pages must stitch back bit-exactly
(NVorbis/PacketProvider.CreatePacket 324-438 semantics; page validation
StreamPageReader.AddPage 58-69)."""

import numpy as np

import nvorbis_tpu as nv
from nvorbis_tpu.testgen.ogg_writer import (
    make_continuation_stream, split_pages, _repaginate,
)
from tests.conftest import fixture_path


def test_stream_really_has_multipage_packets():
    blob, _ = make_continuation_stream(fixture_path("3test.ogg"))
    pages = split_pages(blob)
    cont = sum(1 for p in pages if p[5] & 0x01)
    assert cont > 100  # plenty of continuation pages


def test_multi_page_continuations_roundtrip():
    src = fixture_path("3test.ogg")
    plain, total = _repaginate(src, 1, 0x51)
    ref = nv.VorbisReader(plain, engine="oracle").read_all()

    blob, total_c = make_continuation_stream(src)
    assert total_c == total
    got_o = nv.VorbisReader(blob, engine="oracle").read_all()
    got_j = nv.VorbisReader(blob, engine="jax").read_all()
    np.testing.assert_array_equal(got_o, ref)
    assert len(got_o) == len(got_j)
    assert float(np.abs(got_o - got_j).max()) <= 2e-6


def test_continuation_seek():
    blob, _ = make_continuation_stream(fixture_path("3test.ogg"))
    full = nv.VorbisReader(blob, engine="oracle").read_all()
    r = nv.VorbisReader(blob, engine="oracle")
    C = r.channels
    for target in (4410, 44100):
        r.sample_position = target
        buf = np.zeros(4096 * C, np.float32)
        n = r.read_samples(buf)
        assert n > 0
        np.testing.assert_allclose(
            buf[:n], full[target * C : target * C + n], atol=1e-7
        )
