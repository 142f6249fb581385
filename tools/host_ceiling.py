"""Host-plane ceiling: the headline workload with the device stubbed out.

Measures what the host side of the batch plane (packetize, C++ unpack,
lapping plans, dispatch staging, PCM emit) can sustain with zero device
compute and zero link cost — the throughput bound that binds on a
direct-attached device.  The stub replaces the compiled chunk program with
a numpy zeros factory and the device fetch with identity, so every numpy
staging op, segment-table build, and emit memmove still runs for real.

Usage: python tools/host_ceiling.py [n_streams] [repeats] [timed_rounds]
Prints phase spans + an x-realtime number; also emitted by bench.py as the
``host_ceiling`` stderr metric (VERDICT r2 item 1).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# the stub never dispatches: keep jax off any real backend and silent.
# The env var alone is NOT enough — the axon accelerator plugin
# force-selects its platform over JAX_PLATFORMS at import, and a wedged
# tunnel then hangs backend init forever (observed 2026-08-17: this
# script timed out at 400 s minutes after a relay wedge while the same
# code had just run fine in a healthy phase).  Pin the config value too,
# exactly like __graft_entry__._pin_cpu_mesh — this metric must be
# measurable with the relay DOWN, that is its whole point.
_os.environ["JAX_PLATFORMS"] = "cpu"
_os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax as _jax

_jax.config.update("jax_platforms", "cpu")

import sys
import time

import numpy as np

from nvorbis_tpu.utils.hostmem import enable_page_recycling

enable_page_recycling()  # NVT_NO_MALLOPT=1 measures the un-fixed baseline

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 2

import os

os.makedirs("/root/repo/.benchcache", exist_ok=True)
path = f"/root/repo/.benchcache/long3_x{REPEATS}.ogg"
if not os.path.exists(path):
    from nvorbis_tpu.testgen.ogg_writer import make_long_stream

    make_long_stream("/root/reference/TestFiles/3test.ogg", REPEATS, path)

raw = open(path, "rb").read()
raws = [raw] * N


def install_stub():
    """Route the batch plane's device boundary to numpy no-ops."""
    import nvorbis_tpu.parallel.batch as batch
    import nvorbis_tpu.utils.fetch as fetch
    import nvorbis_tpu.utils.relay as relay

    class _StubJnp:
        @staticmethod
        def asarray(a):
            return np.asarray(a)

    _outs = {}

    def _stub_program(cfg, mesh_key=None):
        C, L_pad = cfg[0], cfg[1]
        i16 = cfg[5]
        dt = np.int16 if i16 else np.float32

        def fn(*args):
            # cached per shape: the real path lands fetches in RECYCLED
            # malloc buffers (warm pages); a fresh np.zeros per chunk made
            # the stub's emit pay first-touch faults the real path never
            # pays, understating the ceiling
            key = (L_pad, C, i16)
            out = _outs.get(key)
            if out is None:
                out = _outs[key] = np.zeros((L_pad, C), dtype=dt)
            return out

        return fn

    def _stub_fetch(out, quantized=False):
        return out.astype(np.float32) / 32767.0 if quantized else out

    batch.jnp = _StubJnp()
    batch._batch_program = _stub_program
    batch.fetch_pcm = _stub_fetch
    batch.block_ready = lambda x: None
    fetch.fetch_pcm = _stub_fetch
    fetch.block_ready = lambda x: None
    relay.jax_backend_safe = lambda *a, **k: True
    batch.jax_backend_safe = lambda *a, **k: True


def once():
    from nvorbis_tpu.parallel.batch import BatchDecoder

    bd = BatchDecoder(raws)
    outs = bd.decode_all()
    total = 0.0
    for st, o in zip(bd._streams, outs):
        total += len(o) / st.decoder.channels / st.decoder.sample_rate
    return total


def main():
    install_stub()
    from nvorbis_tpu.utils import profiling

    t0 = time.perf_counter()
    audio = once()  # warm (builds packet tables, caches)
    t_warm = time.perf_counter() - t0
    print(
        f"warm: {audio:.0f}s audio in {t_warm:.1f}s = {audio / t_warm:.1f}x",
        file=sys.stderr,
    )

    best = 0.0
    for _ in range(ROUNDS):
        profiling.enable(True)
        profiling.reset()
        t0 = time.perf_counter()
        audio = once()
        dt = time.perf_counter() - t0
        x = audio / dt
        best = max(best, x)
        print(
            f"timed: {audio:.0f}s audio in {dt:.1f}s = {x:.1f}x",
            file=sys.stderr,
        )
        profiling.report(sys.stderr)
    print(f"host_ceiling_x: {best:.1f}")
    return best


if __name__ == "__main__":
    main()
