"""On-chip A/B: fused Pallas IMDCT+window kernel vs the XLA dot+select.

Timing through the axon relay needs care: independent dispatches of the
same jitted fn pipeline/dedupe (a naive loop measured an impossible 1852
"TFLOP/s"), so each variant is timed as ONE jitted program that runs the
op K times under ``lax.scan`` with a data dependency between iterations
(the next spectrum is perturbed by a scalar derived from the previous
output).  Wall time of that program / K isolates per-op device time from
the ~30 ms relay round-trip.

Prints one JSON line per (rows, n) cell with ms/op, effective TFLOP/s,
and the max-abs deviation between the two results.

Usage: python tools/ab_pallas_imdct.py [K]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import functools
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

K = int(sys.argv[1]) if len(sys.argv) > 1 else 50


def xla_op(spectrum, basis, windows, widx):
    out = jnp.dot(
        spectrum, basis,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out * windows[widx]


def chained(op):
    """One program: K sequential ops with a cross-iteration dependency."""

    @jax.jit
    def run(spectrum, basis, windows, widx):
        def body(spec, _):
            out = op(spec, basis, windows, widx)
            # data dependency: next input derives from this output
            bump = out[0, 0] * 1e-20
            return spec + bump, out[0, 0]

        _, outs = jax.lax.scan(body, spectrum, None, length=K)
        return outs

    return run


def timeit_chain(run, *args):
    run(*args).block_until_ready()  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run(*args).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / K


def main():
    print(f"backend: {jax.default_backend()} {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    cells = [
        (1024, 256), (4096, 256),
        (1024, 2048), (4096, 2048), (8192, 2048),
    ]
    pallas_op = functools.partial(imdct_window_pallas)
    for rows, n in cells:
        n2 = n // 2
        spec = jnp.asarray(rng.standard_normal((rows, n2)), jnp.float32)
        basis = jnp.asarray(rng.standard_normal((n2, n)), jnp.float32)
        windows = jnp.asarray(rng.standard_normal((4, n)), jnp.float32)
        widx = jnp.asarray(rng.integers(0, 4, rows), jnp.int32)

        t_xla = timeit_chain(chained(xla_op), spec, basis, windows, widx)
        try:
            t_pl = timeit_chain(chained(pallas_op), spec, basis, windows,
                                widx)
            a = xla_op(spec, basis, windows, widx)
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
            "max_abs_dev": dev,
            "error": (err.splitlines()[0][:300] if err else None),
        }
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
