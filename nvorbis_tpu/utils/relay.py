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


def tpu_link_alive(timeout: float = 3.0) -> bool:
    """One cheap TCP probe of the relay; True if it accepts connections."""
    s = socket.socket()
    s.settimeout(timeout)
    try:
        s.connect(_RELAY_ADDR)
        return True
    except OSError:
        return False
    finally:
        s.close()


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
