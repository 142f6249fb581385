"""Measure the TPU tunnel link: host->device upload, device->host fetch,
and a compute-only dispatch rate.  One JSON line per measurement.

The decode pipeline's throughput ceiling through a bandwidth-capped link is
link_B/s / PCM_B/s — for stereo 44.1 kHz f32 PCM (352.8 kB/s of audio) a
33 MB/s link caps at ~90x realtime, int16 at ~180x.  This probe answers
which regime the *current* environment is in.

Usage: python tools/link_probe.py [MB]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json
import sys
import time

from nvorbis_tpu.utils.relay import jax_backend_safe

if not jax_backend_safe():
    print("relay down; refusing to init jax", file=sys.stderr)
    sys.exit(2)

import jax
import jax.numpy as jnp
import numpy as np

MB = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def main():
    print(f"backend: {jax.default_backend()} {jax.devices()}", file=sys.stderr)
    nbytes = MB * 1024 * 1024
    host = np.zeros(nbytes // 4, np.float32)

    # upload
    dev = jax.device_put(host)
    dev.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        jax.device_put(host).block_until_ready()
    up = 3 * nbytes / (time.perf_counter() - t0)
    print(json.dumps({"metric": "h2d_MBps", "value": round(up / 1e6, 1),
                      "size_MB": MB}), flush=True)

    # fetch — must fetch a device-COMPUTED value: device_put keeps the host
    # buffer alive and np.asarray of it is a free host copy
    g = jax.jit(lambda x: x + 1.0)
    computed = g(dev)
    computed.block_until_ready()
    np.asarray(computed)
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(g(dev))
    down = 3 * nbytes / (time.perf_counter() - t0)
    print(json.dumps({"metric": "d2h_MBps", "value": round(down / 1e6, 1),
                      "size_MB": MB}), flush=True)

    # dispatch latency (tiny op round trip)
    f = jax.jit(lambda x: x + 1.0)
    small = jax.device_put(np.zeros(8, np.float32))
    f(small).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        f(small).block_until_ready()
    lat = (time.perf_counter() - t0) / 20
    print(json.dumps({"metric": "dispatch_roundtrip_ms",
                      "value": round(lat * 1e3, 2)}), flush=True)

    # MXU sanity: 4096^3 matmul TFLOP/s
    a = jax.device_put(np.ones((4096, 4096), np.float32))
    b = jax.device_put(np.ones((4096, 4096), np.float32))
    mm = jax.jit(lambda a, b: a @ b)
    mm(a, b).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        r = mm(a, b)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / 5
    print(json.dumps({"metric": "matmul_f32_tflops",
                      "value": round(2 * 4096**3 / dt / 1e12, 2)}), flush=True)


if __name__ == "__main__":
    main()
