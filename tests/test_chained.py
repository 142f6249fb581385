"""Chained (multi-logical-stream) container handling.

Reference surface: NVorbis/VorbisReader.cs:280-305 (FindNextStream /
SwitchStreams) + NewStreamEventArgs.IgnoreStream.
"""

import numpy as np
import pytest

import nvorbis_tpu as nv
from nvorbis_tpu.testgen.ogg_writer import make_chained_stream

from conftest import fixture_path


@pytest.fixture(scope="module")
def chained(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("chain") / "chain3.ogg")
    make_chained_stream(fixture_path("1test.ogg"), 3, out)
    return out


def test_chained_discovery_and_switch(chained):
    r = nv.VorbisReader(chained, engine="oracle")
    assert len(r.streams) == 1
    outs = [r.read_all()]
    while r.find_next_stream():
        # returns False here: the links share channels/sample-rate
        # (VorbisReader.cs:291-305 semantics)
        assert r.switch_streams(len(r.streams) - 1) is False
        outs.append(r.read_all())
    assert len(outs) == 3
    # every link carries the same audio
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])
    r.dispose()


def test_chained_jax_engine_matches_oracle(chained):
    ro = nv.VorbisReader(chained, engine="oracle")
    a = ro.read_all()
    ro.dispose()
    rj = nv.VorbisReader(chained, engine="jax")
    b = rj.read_all()
    assert rj.find_next_stream()
    rj.switch_streams(1)
    c = rj.read_all()
    rj.dispose()
    np.testing.assert_allclose(b, a, atol=2e-6, rtol=0)
    np.testing.assert_allclose(c, a, atol=2e-6, rtol=0)


def test_ignore_stream_callback(chained):
    seen = []

    def cb(ea):
        seen.append(ea.stream_decoder)
        ea.ignore_stream = True

    r = nv.VorbisReader(chained, engine="oracle")
    r.new_stream = cb
    # every remaining link is discovered, offered, and ignored
    assert not r.find_next_stream()
    assert len(r.streams) == 1
    assert len(seen) == 2
    r.dispose()
