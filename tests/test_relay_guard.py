"""The library must never hang a user on a dead TPU tunnel.

``VorbisReader(path)`` with the default ``engine="auto"`` consults
``utils/relay.jax_backend_safe`` before the first jax backend touch and
falls back to the numpy oracle engine (with a warning); an explicit
``engine="jax"`` raises instead.  ``BatchDecoder`` raises before its first
device dispatch.
"""

import socket
import threading

import numpy as np
import pytest

import nvorbis_tpu as nv
from nvorbis_tpu.utils import relay


def test_probe_dead_port(monkeypatch):
    # bind-then-close yields a port with nothing listening
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    monkeypatch.setattr(relay, "_RELAY_ADDR", ("127.0.0.1", port))
    assert relay.tpu_link_alive(timeout=1.0) is False


def test_probe_live_port(monkeypatch):
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    def _accept():
        try:
            conn, _ = srv.accept()
            conn.close()
        except OSError:
            pass  # server socket closed at test end

    t = threading.Thread(target=_accept, daemon=True)
    t.start()
    try:
        monkeypatch.setattr(relay, "_RELAY_ADDR", ("127.0.0.1", port))
        assert relay.tpu_link_alive(timeout=1.0) is True
    finally:
        srv.close()


def test_backend_safe_without_plugin(monkeypatch):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    assert relay.jax_backend_safe() is True


def test_auto_falls_back_to_host(fixture_dir, monkeypatch):
    monkeypatch.setattr(relay, "jax_backend_safe", lambda: False)
    # 3test is above NVT_DEVICE_MIN_SECS, so auto targets the device and
    # must route to the host engine (full-speed, jax-free) instead; a
    # short fixture would take the oracle before the relay probe
    from nvorbis_tpu.engine.batcher import HostPipeline

    gold = nv.VorbisReader(
        str(fixture_dir / "3test.ogg"), engine="oracle"
    ).read_all()
    r = nv.VorbisReader(str(fixture_dir / "3test.ogg"))
    assert isinstance(r._stream_decoder._pipeline, HostPipeline)
    pcm = r.read_all()
    assert len(pcm) == len(gold)
    assert np.abs(pcm - gold).max() <= 2e-6
    r.dispose()


def test_auto_falls_back_to_oracle_without_native(fixture_dir, monkeypatch):
    # relay dead AND no native plane: the oracle pipeline is the last rung
    monkeypatch.setattr(relay, "jax_backend_safe", lambda: False)
    monkeypatch.setenv("NVT_NO_NATIVE", "1")
    from nvorbis_tpu import native as native_mod
    from nvorbis_tpu.stream_decoder import _OraclePipeline

    native_mod.reset()
    try:
        r = nv.VorbisReader(str(fixture_dir / "3test.ogg"))
        assert isinstance(r._stream_decoder._pipeline, _OraclePipeline)
        pcm = r.read_all()
        assert len(pcm) > 0 and np.isfinite(pcm).all()
        r.dispose()
    finally:
        monkeypatch.delenv("NVT_NO_NATIVE")
        native_mod.reset()


def test_explicit_jax_raises(fixture_dir, monkeypatch):
    monkeypatch.setattr(relay, "jax_backend_safe", lambda: False)
    with pytest.raises(RuntimeError, match="relay"):
        nv.VorbisReader(str(fixture_dir / "1test.ogg"), engine="jax")


def test_batch_decoder_relay_down_decodes_host(fixture_dir, monkeypatch):
    # a dead relay must not zero a batch decode: auto routes to the host
    # engine and returns full parity PCM (the round-3 0.0-artifact class)
    from nvorbis_tpu.parallel.batch import BatchDecoder

    monkeypatch.setattr(relay, "jax_backend_safe", lambda: False)
    raw = open(fixture_dir / "1test.ogg", "rb").read()
    gold = nv.VorbisReader(
        str(fixture_dir / "1test.ogg"), engine="oracle"
    ).read_all()
    bd = BatchDecoder([raw, raw])
    assert bd._host_mode
    outs = bd.decode_all()
    assert len(outs) == 2
    for o in outs:
        assert len(o) == len(gold)
        assert np.abs(o - gold).max() <= 2e-6


def test_fetch_watchdog_passthrough_and_retry(monkeypatch):
    """The fetch watchdog returns results/errors transparently, retries a
    hung attempt once, and raises TimeoutError when both attempts hang
    (the 2026-08-16 wedged-relay incident: a transfer stream stalled
    permanently while the relay kept accepting fresh connections)."""
    import time

    from nvorbis_tpu.utils import fetch

    monkeypatch.setenv("NVT_FETCH_TIMEOUT", "0.2")
    assert fetch._with_watchdog(lambda: 42, nbytes=0) == 42

    with pytest.raises(ValueError, match="boom"):
        fetch._with_watchdog(
            lambda: (_ for _ in ()).throw(ValueError("boom")), nbytes=0
        )

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            time.sleep(5)  # first attempt "wedges"
        return "recovered"

    assert fetch._with_watchdog(flaky, nbytes=0) == "recovered"
    assert calls["n"] == 2

    # the poisoned section un-poisons in a finally: an assertion failure
    # in between must not cascade "already wedged" into every later
    # fetch-touching test in this process
    try:
        with pytest.raises(TimeoutError, match="wedged"):
            fetch._with_watchdog(lambda: time.sleep(5), nbytes=0)

        # double expiry poisons the process: later fetches fail fast
        # instead of eating the full double timeout each
        assert fetch.link_wedged()
        with pytest.raises(TimeoutError, match="already wedged"):
            fetch._with_watchdog(lambda: 1, nbytes=0)
    finally:
        # un-poison directly: monkeypatch.setattr would RESTORE the
        # poisoned True at teardown and break later device-touching tests
        fetch._wedged = False

    monkeypatch.setenv("NVT_FETCH_TIMEOUT", "0")  # disabled: direct call
    assert fetch._with_watchdog(lambda: "direct", nbytes=1 << 40) == "direct"


def test_short_stream_auto_skips_device(fixture_dir, monkeypatch):
    """Under engine="auto", streams shorter than NVT_DEVICE_MIN_SECS never
    touch the device (a remote device pays ~1 s fixed latency per decode:
    measured 108x host vs 0.9x device on the 0.39 s fixture) — they decode
    on the host engine (oracle when no native plane exists)."""
    from nvorbis_tpu.engine.batcher import HostPipeline
    from nvorbis_tpu.stream_decoder import _OraclePipeline

    r = nv.VorbisReader(str(fixture_dir / "1test.ogg"))
    assert isinstance(r._stream_decoder._pipeline,
                      (HostPipeline, _OraclePipeline))
    assert not type(r._stream_decoder._pipeline).__name__ == "JaxPipeline"
    pcm = r.read_all()
    assert len(pcm) > 0
    r.dispose()

    # without the native plane the short-stream lane is the numpy oracle
    monkeypatch.setenv("NVT_NO_NATIVE", "1")
    from nvorbis_tpu import native as native_mod

    native_mod.reset()
    try:
        r = nv.VorbisReader(str(fixture_dir / "1test.ogg"))
        assert isinstance(r._stream_decoder._pipeline, _OraclePipeline)
        r.dispose()
    finally:
        monkeypatch.delenv("NVT_NO_NATIVE")
        native_mod.reset()


def test_bulk_timeout_recovers_on_oracle(fixture_dir, monkeypatch):
    """A wedged device link mid-decode_all (fetch watchdog TimeoutError)
    degrades to the host oracle on seekable sources: read_all still
    returns the full, correct PCM."""
    from nvorbis_tpu.engine import bulk as bulk_mod

    gold = nv.VorbisReader(
        str(fixture_dir / "3test.ogg"), engine="oracle"
    ).read_all()

    def wedge(self):
        raise TimeoutError("transfer stream wedged (simulated)")

    monkeypatch.setattr(bulk_mod.BulkDecoder, "run", wedge)
    r = nv.VorbisReader(str(fixture_dir / "3test.ogg"), engine="jax")
    with pytest.warns(RuntimeWarning, match="host oracle"):
        pcm = r.read_all()
    assert len(pcm) == len(gold)
    assert np.abs(pcm - gold).max() <= 2e-6
    r.dispose()


def test_fetch_np_sliced_path(monkeypatch):
    """The >chunk-size fetch path (slice rows at pow2 boundaries, fetch
    pieces from the pool, concatenate) only executes on non-CPU backends;
    force it on CPU arrays so its logic is covered in CI."""
    import jax
    import numpy as np

    from nvorbis_tpu.utils import fetch

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("NVT_FETCH_CHUNK_BYTES", str(256 * 1024))
    rng = np.random.default_rng(0)
    host = rng.standard_normal((200_000, 2)).astype(np.float32)  # 1.6 MB
    arr = jax.device_put(host)
    out = fetch.fetch_np(arr)
    assert out.shape == host.shape and np.array_equal(out, host)

    # quantized int16 fetch path dequantizes exactly as the fused epilogue
    q = np.round(np.clip(host, -1, 1) * 32767.0).astype(np.int16)
    back = fetch.fetch_pcm(jax.device_put(q), quantized=True)
    assert back.dtype == np.float32
    assert np.abs(back - np.clip(host, -1, 1)).max() < 4e-5


def test_streaming_host_only_keyed_on_relay(fixture_dir, monkeypatch):
    """JaxPipeline pins streaming reads host-only ONLY when the tunnel
    relay is the device transport (its per-window round trips wedge
    sessions).  A forced worker (NVT_FETCH_WORKER=1) on direct-attached
    hardware — no relay plugin configured — must keep the device
    streaming path (VERDICT r4 #9)."""
    from nvorbis_tpu.engine.batcher import JaxPipeline

    # direct-attach: plugin absent, worker forced -> device streaming
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("NVT_FETCH_WORKER", "1")
    r = nv.VorbisReader(str(fixture_dir / "3test.ogg"), engine="jax")
    pipe = r._stream_decoder._pipeline
    assert isinstance(pipe, JaxPipeline)
    assert not pipe._host_only
    r.dispose()

    # tunnel relay answering -> streaming stays host-only (patch the
    # policy fn: this process's jax is pinned to cpu, so the real
    # relay_configured correctly reports False here)
    import nvorbis_tpu.utils.relay as relay_mod

    monkeypatch.setattr(relay_mod, "relay_configured", lambda: True)
    monkeypatch.delenv("NVT_FETCH_WORKER", raising=False)
    r = nv.VorbisReader(str(fixture_dir / "3test.ogg"), engine="jax")
    pipe = r._stream_decoder._pipeline
    assert isinstance(pipe, JaxPipeline)
    assert pipe._host_only
    r.dispose()
