"""Small reference-parity API surfaces: obsolete 0.9-era members, weak
provider references, and thread-safe shared container reads."""

import gc
import threading

import numpy as np
import pytest

import nvorbis_tpu as nv

from conftest import fixture_path


def test_obsolete_members(fixture_dir):
    r = nv.VorbisReader(str(fixture_dir / "3test.ogg"), engine="oracle")
    assert r.vendor == "Xiph.Org libVorbis I 20070622"
    assert r.comments == []  # fixture carries no tags beyond the vendor
    with pytest.raises(NotImplementedError):
        r.is_parameter_change
    with pytest.raises(NotImplementedError):
        r.clear_parameter_change()
    # decoded_time/position mirror the canonical properties, incl. set
    r.decoded_time = 1.0
    assert abs(r.time_position - 1.0) < 0.05
    assert r.decoded_position == r.sample_position
    r.decoded_position = 0
    assert r.sample_position == 0
    r.dispose()


def test_container_weak_provider_refs(fixture_dir):
    """ContainerReader holds weak references (ContainerReader.cs:73,127):
    once a provider's last strong referent is dropped, get_streams prunes."""
    from nvorbis_tpu.ogg.container import ContainerReader

    providers = []
    c = ContainerReader(str(fixture_dir / "1test.ogg"))
    c.new_stream_callback = lambda pp: providers.append(pp) or True
    assert c.try_init()
    assert len(c.get_streams()) == 1
    # while the serial is still routed, the page index holds the provider
    # strongly (StreamPageReader.cs:9 parity): no premature collection
    providers.clear()
    gc.collect()
    assert len(c.get_streams()) == 1
    # retire the stream (EOS reached scanning for more streams), drop user
    # refs: the provider island is now collectable and get_streams prunes
    while c.find_next_stream():
        pass
    gc.collect()
    assert len(c.get_streams()) == 0
    c.dispose()


def test_concurrent_multi_stream_reads(tmp_path):
    """Two decoders over one shared container pulled from two threads: the
    page-read lock (PageReader.cs:95-113 parity) keeps both streams exact."""
    from nvorbis_tpu.testgen.ogg_writer import make_chained_stream

    chained = str(tmp_path / "chained.ogg")
    make_chained_stream(fixture_path("1test.ogg"), 2, chained)

    # the links are identical regenerated streams: a fresh sequential decode
    # of link 0 is the per-stream reference
    ref_reader = nv.VorbisReader(chained, engine="oracle")
    ref = ref_reader.read_all()
    ref_reader.dispose()
    assert len(ref) > 0

    r = nv.VorbisReader(chained, engine="oracle")
    while r.find_next_stream():
        pass
    assert len(r.streams) == 2

    results = {}

    def pull(idx):
        dec = r.streams[idx]
        out, buf = [], np.zeros(4096, dtype=np.float32)
        while True:
            n = dec.read(buf, 0, len(buf))
            if n == 0:
                break
            out.append(buf[:n].copy())
        results[idx] = np.concatenate(out) if out else np.zeros(0)

    threads = [threading.Thread(target=pull, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for i in range(2):
        assert len(results[i]) == len(ref)
        np.testing.assert_allclose(results[i], ref, atol=1e-7, rtol=0)
    r.dispose()
