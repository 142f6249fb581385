"""Device->host transfer helper.

Through a remote TPU link the transfer strategy dominates end-to-end decode
throughput, and the optimum is relay-dependent:

- round 1's relay had a pathological slow path for single multi-MB fetches
  (one 2.6 MB fetch took minutes while the same bytes as four ~0.6 MB
  slices arrived in ~0.2 s), so this helper sliced at 512 KB;
- round 2's relay is the opposite: each fetch pays a ~30 ms dispatch
  round-trip for the on-device slice program plus per-request overhead, so
  512 KB slicing measured 5.8 MB/s while whole-array fetches of the same
  data measured 25-40 MB/s (tools/link_probe.py, /tmp span traces).

The strategy is therefore env-tunable: ``NVT_FETCH_CHUNK_BYTES`` sets the
slice size (default 32 MB — large enough to amortize round-trips, small
enough to bound a pathological fetch and keep the thread pool overlapped).
``0`` disables slicing entirely.  On the CPU backend (tests, virtual
meshes) it degrades to a plain copy.
"""

import os
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

_DEFAULT_CHUNK_BYTES = 32 * 1024 * 1024
_pool = None


def _watchdog_base() -> float:
    """``NVT_FETCH_TIMEOUT`` (seconds, default 120; 0 disables): base of
    the device->host fetch watchdog.  The axon relay has been observed to
    wedge a long-lived session's transfer stream permanently while still
    accepting fresh connections (2026-08-16: a bench sat 24 min at ~0
    bytes/s on a link that served a new process at full rate) — without a
    watchdog the decode, and anything driving it, hangs forever."""
    v = os.environ.get("NVT_FETCH_TIMEOUT", "")
    return float(v) if v else 120.0


_wedged = False


def link_wedged() -> bool:
    """True once a watchdog timeout has fired in this process: the relay
    session's transfer stream is dead and every later device->host fetch
    would eat the full double timeout before failing.  Fresh processes
    get fresh sessions (measured working at full rate minutes after a
    wedge), so the right recovery is restart-the-work, not retry here."""
    return _wedged


def _with_watchdog(fn, nbytes):
    """Run ``fn`` (a blocking fetch) with a generous size-scaled timeout;
    retry once on expiry (jax arrays are immutable, a second device_get is
    safe), then raise.  The stuck attempt's daemon thread is abandoned —
    leaking one thread beats hanging the process."""
    global _wedged
    base = _watchdog_base()
    if base <= 0:
        return fn()
    if _wedged:
        raise TimeoutError(
            "device->host transfer stream already wedged in this process "
            "(previous watchdog expiry); restart the process for a fresh "
            "relay session"
        )
    # +1 s per 512 KB: a 32 MB piece gets base+64 s — far above any slow
    # phase measured (7 MB/s), unreachable only when truly wedged
    timeout = base + nbytes / (512 * 1024)
    last = None
    for _ in range(2):
        box = {}

        def run():
            try:
                box["out"] = fn()
            except BaseException as e:  # surfaced on the caller thread
                box["err"] = e

        t = threading.Thread(target=run, daemon=True)
        t.start()
        t.join(timeout)
        if not t.is_alive():
            if "err" in box:
                raise box["err"]
            return box["out"]
        last = timeout
    _wedged = True
    raise TimeoutError(
        f"device->host fetch exceeded {last:.0f}s twice — transfer "
        "stream wedged (relay stalled); aborting instead of hanging"
    )


def _max_chunk_bytes() -> int:
    v = os.environ.get("NVT_FETCH_CHUNK_BYTES", "")
    if not v:
        return _DEFAULT_CHUNK_BYTES
    return int(v) or (1 << 62)


def int16_transport_enabled() -> bool:
    """Opt-in lossy PCM transport (``NVT_FETCH_INT16=1``).

    Through a bandwidth-capped link the float32 PCM download can bound
    end-to-end throughput (measured 2026-08: ~25 MB/s tunnel => ~70x
    realtime ceiling for stereo 44.1 kHz f32).  Quantizing to 16 bits
    on-device — the delivery precision of virtually every audio sink, and
    exactly what libvorbisfile's ov_read() hands out — halves the link
    bytes.  ~3e-5 quantization error, so parity tests never enable it.
    """
    return os.environ.get("NVT_FETCH_INT16", "") not in ("", "0")


def overlap_fetches() -> bool:
    """Should decode loops overlap device->host fetches with the next
    chunk's upload/compute?  Default yes.

    Measured A/B through the axon tunnel relay (8 streams, 16-repeat
    fixture, span traces 2026-08-16): overlapped 15.8x vs serialized
    9.8x — the fetch thread loses some rate to relay multiplexing, but
    hiding the next chunk's device compute + host collect under the
    transfer wins overall.  Keep ``NVT_FETCH_OVERLAP=0`` as an escape
    hatch for relays where a concurrent upload stalls fetches entirely.
    """
    return os.environ.get("NVT_FETCH_OVERLAP", "") != "0"


def ready_on_main() -> bool:
    """``NVT_READY_MAIN`` (default on): decode loops block on each chunk's
    device compute on the main thread before handing the transfer to the
    fetch worker, so the worker's device->host transfer is the only relay
    traffic while it runs.  In-process alternating A/B
    (tools/ab_variants.py, 2026-08-16) won every adjacent pair: 9.3/8.7,
    19.9/15.7, 25.4/23.8 x-realtime.  Set ``0`` to overlap compute into
    the fetch worker instead (better when transfers and dispatch ride
    independent paths, e.g. direct-attached devices)."""
    return os.environ.get("NVT_READY_MAIN", "1") != "0"


def block_ready(arr):
    """``jax.block_until_ready`` under the fetch watchdog: the wedge can
    hit the completion wait (observed busy-spinning at 67% CPU with zero
    relay traffic), not just the transfer.  Safe to retry — jax arrays
    are immutable and waiting is idempotent.  CPU backend waits directly:
    there is no relay to wedge (and no reason to burn a thread)."""
    import jax

    if jax.default_backend() == "cpu":
        return jax.block_until_ready(arr)
    nbytes = getattr(arr, "nbytes", 0) or 0
    return _with_watchdog(lambda: jax.block_until_ready(arr), nbytes)


def _get_pool():
    global _pool
    if _pool is None:
        _pool = ThreadPoolExecutor(max_workers=2)
    return _pool


def fetch_np(arr) -> np.ndarray:
    """Fetch a jax array to host memory as numpy, robustly."""
    import jax

    from nvorbis_tpu.utils.profiling import span

    max_bytes = _max_chunk_bytes()
    if jax.default_backend() == "cpu":
        return np.asarray(jax.block_until_ready(arr))
    if arr.nbytes <= max_bytes:
        with span("fetch.ready"):
            arr = block_ready(arr)
        with span("fetch.xfer"):
            return _with_watchdog(lambda: np.asarray(arr), arr.nbytes)

    rows = arr.shape[0]
    row_bytes = max(1, arr.nbytes // max(1, rows))
    chunk = max(1, max_bytes // row_bytes)
    # power-of-two chunk rows keep the set of slice shapes tiny
    p = 1
    while p * 2 <= chunk:
        p *= 2
    chunk = p

    with span("fetch.ready"):
        arr = block_ready(arr)
        slices = [arr[i : i + chunk] for i in range(0, rows, chunk)]
        block_ready(slices)
    with span("fetch.xfer"):
        parts = list(_get_pool().map(
            lambda s: _with_watchdog(lambda: np.asarray(s), s.nbytes),
            slices,
        ))
        return np.concatenate(parts, axis=0)


def dequantize_i16(host: np.ndarray) -> np.ndarray:
    """int16 wire samples -> float32 in [-CLIP_LIMIT, CLIP_LIMIT].

    +/-32767 would dequantize to exactly +/-1.0 — just past the library's
    documented +/-0.99999994 output bound, and enough to spuriously set
    ``has_clipped`` downstream — so clamp; the 6e-8 excess is far inside
    the ~3e-5 lossy-transport budget."""
    from nvorbis_tpu.utils.bitmath import CLIP_LIMIT

    out = host.astype(np.float32) * np.float32(1.0 / 32767.0)
    np.clip(out, -CLIP_LIMIT, CLIP_LIMIT, out=out)
    return out


def fetch_pcm(arr, quantized: bool = False) -> np.ndarray:
    """Fetch device PCM to host; int16 over the wire when opted in via
    ``NVT_FETCH_INT16=1`` (see :func:`int16_transport_enabled`).

    ``quantized=True``: the chunk program already emitted int16 in its
    epilogue (fused quantization) — just fetch and dequantize."""
    if quantized:
        return dequantize_i16(fetch_np(arr))
    if not int16_transport_enabled():
        return fetch_np(arr)
    import jax.numpy as jnp

    q = jnp.round(jnp.clip(arr, -1.0, 1.0) * 32767.0).astype(jnp.int16)
    return dequantize_i16(fetch_np(q))
