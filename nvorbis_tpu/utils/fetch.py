"""Device->host transfer helper.

Through a remote TPU link, a single large device->host copy can fall into a
pathologically slow path (measured: one 2.6 MB fetch taking minutes, while
the same bytes as four ~0.6 MB slices arrive in ~0.2 s).  This helper

1. blocks until the array is computed (fetching an in-flight array can also
   hit the slow path),
2. slices the array on-device into <=512 KB pieces along axis 0 (slice
   programs are tiny and cached per shape),
3. fetches the pieces concurrently from a small thread pool.

On the CPU backend (tests, virtual meshes) it degrades to a plain copy.
"""

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

_MAX_CHUNK_BYTES = 512 * 1024
_pool = None


def int16_transport_enabled() -> bool:
    """Opt-in lossy PCM transport (``NVT_FETCH_INT16=1``).

    Through a bandwidth-capped link the float32 PCM download can bound
    end-to-end throughput (measured ~33 MB/s tunnel => ~90x realtime
    ceiling for stereo 44.1 kHz f32).  Quantizing to 16 bits on-device —
    the delivery precision of virtually every audio sink, and exactly what
    libvorbisfile's ov_read() hands out — halves the link bytes.  ~3e-5
    quantization error, so parity tests never enable it.
    """
    return os.environ.get("NVT_FETCH_INT16", "") not in ("", "0")


def _get_pool():
    global _pool
    if _pool is None:
        _pool = ThreadPoolExecutor(max_workers=6)
    return _pool


def fetch_np(arr) -> np.ndarray:
    """Fetch a jax array to host memory as numpy, robustly."""
    import jax

    if jax.default_backend() == "cpu" or arr.nbytes <= _MAX_CHUNK_BYTES:
        return np.asarray(jax.block_until_ready(arr))

    rows = arr.shape[0]
    row_bytes = max(1, arr.nbytes // max(1, rows))
    chunk = max(1, _MAX_CHUNK_BYTES // row_bytes)
    # power-of-two chunk rows keep the set of slice shapes tiny
    p = 1
    while p * 2 <= chunk:
        p *= 2
    chunk = p

    arr = jax.block_until_ready(arr)
    slices = [arr[i : i + chunk] for i in range(0, rows, chunk)]
    jax.block_until_ready(slices)
    parts = list(_get_pool().map(np.asarray, slices))
    return np.concatenate(parts, axis=0)


def fetch_pcm(arr) -> np.ndarray:
    """Fetch device PCM (float32) to host; int16 over the wire when opted
    in via ``NVT_FETCH_INT16=1`` (see :func:`int16_transport_enabled`)."""
    if not int16_transport_enabled():
        return fetch_np(arr)
    import jax.numpy as jnp

    q = jnp.round(jnp.clip(arr, -1.0, 1.0) * 32767.0).astype(jnp.int16)
    host = fetch_np(q)
    return host.astype(np.float32) * np.float32(1.0 / 32767.0)
