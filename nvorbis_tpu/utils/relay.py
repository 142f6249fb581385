"""Accelerator-link liveness guard.

In this image a remote-TPU plugin registers itself into every Python
process (via sitecustomize when ``PALLAS_AXON_POOL_IPS`` is set) and
force-selects its platform.  When its stdio relay is dead, the *first
touch* of the jax backend — even ``jnp.asarray(...)`` — hangs forever
instead of erroring.  A library user calling ``VorbisReader(path)`` must
never block forever, so ``engine="auto"`` consults :func:`jax_backend_safe`
before constructing the device pipeline and falls back to the numpy
synthesis engine when the link is provably dead.

The probe is a single 3-second TCP connect; environments without the
plugin (no env var) or already pinned to CPU pass without any socket work.
"""

import os
import socket
import sys

_RELAY_ADDR = ("127.0.0.1", 8082)


def _relay_addr():
    """Probe address; ``NVT_RELAY_ADDR=host:port`` overrides (lets tests
    and bench dry-runs point the probe at a provably dead port to exercise
    the relay-down ladder end to end).  Falls back to the module global
    (tests monkeypatch ``_RELAY_ADDR`` directly)."""
    v = os.environ.get("NVT_RELAY_ADDR")
    if v:
        host, _, port = v.rpartition(":")
        try:
            return (host or "127.0.0.1", int(port))
        except ValueError:
            pass
    return _RELAY_ADDR

# short-TTL probe memo, keyed by address: every VorbisReader/BatchDecoder
# construction consults the guard, and a service opening dozens of readers
# against a SYN-dropping relay would otherwise pay the full connect
# timeout per reader.  The TTL is short because the answer legitimately
# changes mid-process (relay phases) and a stale True reintroduces the
# hang this module exists to prevent.
_probe_cache = {}
_PROBE_TTL = 5.0


def tpu_link_alive(timeout: float = 3.0) -> bool:
    """One cheap TCP probe of the relay; True if it accepts connections."""
    import time

    addr = _relay_addr()
    hit = _probe_cache.get(addr)
    now = time.monotonic()
    if hit is not None and now - hit[0] < _PROBE_TTL:
        return hit[1]
    s = socket.socket()
    s.settimeout(timeout)
    try:
        s.connect(addr)
        ok = True
    except OSError:
        ok = False
    finally:
        s.close()
    _probe_cache[addr] = (now, ok)
    return ok


def relay_configured() -> bool:
    """True when this process's jax would use the tunnel-relay TPU plugin
    and the relay answers — the environment whose transfer sessions can
    wedge (see engine/device_worker.py).  False when the plugin is absent
    or jax is pinned to another platform."""
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False
    jax = sys.modules.get("jax")
    if jax is not None:
        try:
            platforms = jax.config.jax_platforms
        except AttributeError:
            platforms = None
        if platforms and "axon" not in platforms:
            return False
    return tpu_link_alive()


def host_engine_preferred() -> bool:
    """``engine="auto"`` policy: should bulk decode route to the host
    engine (engine/host.py) instead of the device planes?

    True when the jax backend is unsafe to touch (dead tunnel relay — the
    host engine is the only hang-free full-speed path), and also when the
    device sits behind the tunnel relay even if it answers: the relay wire
    moves PCM at a measured 7-44 MB/s (20-125x realtime for stereo f32 at
    zero compute cost) while the host engine sustains 500-1300x on one
    core (NOTES.md rounds 3-4).  On direct-attached devices (no relay
    plugin) the device planes win and ``auto`` keeps them.

    ``NVT_PREFER_DEVICE=1`` reverts to the device path (on-chip
    validation benches); ``NVT_ENGINE=host`` forces the host engine.
    """
    if os.environ.get("NVT_ENGINE") == "host":
        return True
    if not jax_backend_safe():
        # an unsafe backend overrides NVT_PREFER_DEVICE: auto must never
        # hang or raise, and the host engine is the full-speed safe path
        return True
    if os.environ.get("NVT_PREFER_DEVICE"):
        return False
    return relay_configured()


def jax_backend_safe() -> bool:
    """True when touching the jax backend cannot hang on a dead TPU link.

    Safe when: the plugin is not registered at all (env var unset), jax's
    platform config has been pinned away from the plugin (e.g. the test
    conftest's ``jax.config.update("jax_platforms", "cpu")``), or the relay
    answers a TCP connect.
    """
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True
    jax = sys.modules.get("jax")
    if jax is not None:
        try:
            platforms = jax.config.jax_platforms
        except AttributeError:
            platforms = None
        if platforms and "axon" not in platforms:
            return True
    return tpu_link_alive()
