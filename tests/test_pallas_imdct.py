"""Pallas fused IMDCT+window kernel vs the XLA reference formulation
(interpret mode on CPU; the real lowering runs on TPU)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvorbis_tpu.ops.pallas_imdct import imdct_window_pallas
from nvorbis_tpu.synth.oracle import imdct_basis


@pytest.mark.parametrize("n,rows", [(256, 8), (2048, 16), (512, 130)])
def test_pallas_matches_xla(n, rows):
    n2 = n // 2
    rng = np.random.default_rng(0)
    spec = rng.standard_normal((rows, n2)).astype(np.float32)
    basis = imdct_basis(n, np.float32)
    W = 4
    win = rng.standard_normal((W, n)).astype(np.float32)
    widx = rng.integers(0, W, size=rows).astype(np.int32)

    want = (
        jnp.dot(spec, basis, precision=jax.lax.Precision.HIGHEST)
        * win[widx]
    )
    got = imdct_window_pallas(
        jnp.asarray(spec), jnp.asarray(basis), jnp.asarray(win),
        jnp.asarray(widx), bm=8, bn=128, bk=64, interpret=True,
    )
    # tile-order float accumulation differs from the single-pass XLA dot;
    # with |pcm| ~ sqrt(n2) the tile sums land within ~2e-4 relative
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=2e-4)


def test_pallas_wired_into_synth_core_interpret():
    """NVT_PALLAS=interpret routes synth_core through the fused Pallas
    kernel; a full fixture decode must match the oracle engine.  Runs in a
    subprocess: the flag is read at trace time and this process's jit
    caches already hold the XLA-dot programs."""
    import subprocess
    import sys

    code = """
import numpy as np, nvorbis_tpu as nv
path = "/root/reference/TestFiles/1test.ogg"
ref = nv.VorbisReader(path, engine="oracle").read_all()
got = nv.VorbisReader(path, engine="jax").read_all()
assert len(got) == len(ref)
d = float(np.abs(got - ref).max())
assert d <= 2e-6, d
print("PALLAS_OK", d)
"""
    env = dict(os.environ, NVT_PALLAS="interpret", JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = subprocess.run(
        [sys.executable, "-c", code], env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PALLAS_OK" in out.stdout
