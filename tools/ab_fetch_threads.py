"""A/B: does concurrent d2h fetching aggregate tunnel-relay bandwidth?

Fetches the same device-computed 16 MB payload as K concurrent row
slices (K threads) vs one straight-line np.asarray, alternating A/B in
the same process so relay phase drift cancels.  If the tunnel is
latency/window-bound, K>1 should aggregate; if it is plain
bandwidth-bound, K>1 only adds overhead.

Usage: python tools/ab_fetch_threads.py [MB] [cycles]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

from nvorbis_tpu.utils.relay import jax_backend_safe

if not jax_backend_safe():
    print("relay down", file=sys.stderr)
    sys.exit(2)

import jax
import numpy as np

# jax_backend_safe() is also True when the plugin is absent or the
# platform is pinned to CPU — this tool would then time host-to-host
# copies and print meaningless multi-GB/s "tunnel" rates
if jax.default_backend() == "cpu":
    print("default backend is cpu (no tunnel to measure)", file=sys.stderr)
    sys.exit(2)

MB = int(sys.argv[1]) if len(sys.argv) > 1 else 16
CYCLES = int(sys.argv[2]) if len(sys.argv) > 2 else 3

nbytes = MB * 1024 * 1024
rows = 256
base = jax.device_put(np.zeros((rows, nbytes // 4 // rows), np.float32))
base.block_until_ready()
# each fetch gets a FRESH computed array: np.asarray of a previously
# fetched jax array returns its cached host copy (measured: "250 GB/s")
g = jax.jit(lambda x, s: x + s)
np.asarray(g(base, 0.5))  # warm compile + one real transfer

pools = {k: ThreadPoolExecutor(max_workers=k) for k in (2, 4)}
_seq = [0]


def fetch_k(k):
    _seq[0] += 1
    dev = g(base, float(_seq[0]))
    dev.block_until_ready()
    if k == 1:
        t0 = time.perf_counter()
        out = np.asarray(dev)
        return out, time.perf_counter() - t0
    chunk = rows // k
    slices = [dev[i : i + chunk] for i in range(0, rows, chunk)]
    jax.block_until_ready(slices)
    t0 = time.perf_counter()
    parts = list(pools[k].map(np.asarray, slices))
    dt = time.perf_counter() - t0
    # concatenate OUTSIDE the timed window: the k=1 path doesn't pay a
    # full-payload host memcpy, so timing it here biases against k>1
    out = np.concatenate(parts, axis=0)
    return out, dt


results = {1: [], 2: [], 4: []}
for c in range(CYCLES):
    for k in (1, 2, 4, 4, 2, 1):  # palindrome: drift cancels
        out, dt = fetch_k(k)
        assert out.nbytes == nbytes
        rate = nbytes / dt / 1e6
        results[k].append(round(rate, 1))
        print(f"cycle {c} k={k}: {rate:.1f} MB/s", file=sys.stderr, flush=True)

for k, v in results.items():
    med = round(statistics.median(v), 1)
    print(json.dumps({"workers": k, "median_MBps": med, "samples": v}))
