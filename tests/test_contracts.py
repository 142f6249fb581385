"""Every stock implementation must satisfy its formal contract
(nvorbis_tpu/contracts.py — the Contracts/*.cs parity layer)."""

import numpy as np
import pytest

import nvorbis_tpu as nv
from nvorbis_tpu import contracts as C
from nvorbis_tpu.ogg.container import ContainerReader

from conftest import fixture_path


def test_stock_implementations_satisfy_contracts(fixture_dir):
    path = str(fixture_dir / "1test.ogg")
    r = nv.VorbisReader(path, engine="oracle")
    assert isinstance(r, C.IVorbisReader)
    dec = r.streams[0]
    assert isinstance(dec, C.IStreamDecoder)
    assert isinstance(dec.stats, C.IStreamStats)
    assert isinstance(dec.tags, C.ITagData)
    assert isinstance(dec._pipeline, C.ISynthesisEngine)
    assert isinstance(dec._packet_provider, C.IPacketProvider)
    r.dispose()

    cont = ContainerReader(path)
    assert isinstance(cont, C.IContainerReader)
    cont.new_stream_callback = None
    assert cont.try_init()
    prov = cont.get_streams()[0]
    pkt = prov.get_next_packet()
    assert isinstance(pkt, C.IPacket)
    pkt.done()
    cont.dispose()


def test_jax_pipeline_satisfies_engine_contract(fixture_dir):
    r = nv.VorbisReader(str(fixture_dir / "1test.ogg"), engine="jax")
    assert isinstance(r._stream_decoder._pipeline, C.ISynthesisEngine)
    r.dispose()


def test_forward_only_provider_satisfies_contract(fixture_dir):
    import io

    class FwdOnly(io.BytesIO):
        def seekable(self):
            return False

    raw = open(fixture_dir / "1test.ogg", "rb").read()
    cont = ContainerReader(FwdOnly(raw))
    cont.new_stream_callback = None
    assert cont.try_init()
    prov = cont.get_streams()[0]
    assert isinstance(prov, C.IPacketProvider)
    assert prov.can_seek is False
    cont.dispose()


def test_custom_engine_can_be_injected(fixture_dir):
    """The engine seam is real: a user-supplied object satisfying
    ISynthesisEngine can replace the pipeline."""

    class CountingOracle:
        def __init__(self, inner):
            self._inner = inner
            self.calls = 0

        def next_result(self, need_frames=None):
            self.calls += 1
            return self._inner.next_result(need_frames)

        def reset(self):
            self._inner.reset()

    r = nv.VorbisReader(str(fixture_dir / "1test.ogg"), engine="oracle")
    dec = r._stream_decoder
    dec._pipeline = CountingOracle(dec._pipeline)
    assert isinstance(dec._pipeline, C.ISynthesisEngine)
    pcm = r.read_all()
    assert len(pcm) > 0 and dec._pipeline.calls > 0
    r.dispose()
