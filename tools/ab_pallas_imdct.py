"""On-chip A/B: fused Pallas IMDCT+window kernel vs the XLA dot+gather.

Runs on whatever backend jax resolves (intended: the real TPU). For each
(rows, n) shape drawn from the decode hot path — rows = chunk_frames x
channels, n = block size — times:

  a) XLA:    (spec @ basis) * windows[widx]   (one jitted fn, HIGHEST)
  b) Pallas: ops.pallas_imdct.imdct_window_pallas (compiled, not interpret)

and prints one JSON line per cell with ms/call, effective TFLOP/s, and the
max-abs deviation between the two results.  Exits nonzero if the relay is
down so it can never hang a driver.

Usage: python tools/ab_pallas_imdct.py [reps]
"""

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

from nvorbis_tpu.ops.pallas_imdct import imdct_window_pallas

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 50


@jax.jit
def xla_ref(spectrum, basis, windows, widx):
    out = jnp.dot(
        spectrum, basis,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out * windows[widx]


def timeit(fn, *args):
    fn(*args).block_until_ready()  # compile + warm
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = fn(*args)
    r.block_until_ready()
    return (time.perf_counter() - t0) / REPS


def main():
    print(f"backend: {jax.default_backend()} {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    # rows = chunk_frames * channels; n = block size (short, long)
    cells = [
        (256, 256), (1024, 256), (4096, 256),
        (256, 2048), (1024, 2048), (4096, 2048),
        (8192, 2048),
    ]
    for rows, n in cells:
        n2 = n // 2
        spec = jnp.asarray(rng.standard_normal((rows, n2)), jnp.float32)
        basis = jnp.asarray(rng.standard_normal((n2, n)), jnp.float32)
        windows = jnp.asarray(rng.standard_normal((4, n)), jnp.float32)
        widx = jnp.asarray(rng.integers(0, 4, rows), jnp.int32)

        t_xla = timeit(xla_ref, spec, basis, windows, widx)
        try:
            t_pl = timeit(imdct_window_pallas, spec, basis, windows, widx)
            a = xla_ref(spec, basis, windows, widx)
            b = imdct_window_pallas(spec, basis, windows, widx)
            dev = float(jnp.max(jnp.abs(a - b)))
            err = None
        except Exception as e:
            t_pl, dev, err = None, None, f"{type(e).__name__}: {e}"
        flops = 2.0 * rows * n2 * n
        line = {
            "rows": rows, "n": n,
            "xla_ms": round(t_xla * 1e3, 4),
            "xla_tflops": round(flops / t_xla / 1e12, 3),
            "pallas_ms": round(t_pl * 1e3, 4) if t_pl else None,
            "pallas_tflops": round(flops / t_pl / 1e12, 3) if t_pl else None,
            "speedup": round(t_xla / t_pl, 3) if t_pl else None,
            "max_abs_dev": dev, "error": err,
        }
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
