"""Pallas TPU kernel: IMDCT-as-matmul with the Vorbis lapping window fused
into the epilogue.

The synthesis hot loop is ``pcm[b,c,:] = (spectrum[b,c,:] @ basis) *
window[widx[b]]`` (NVorbis/Mdct.cs:65-313 + Mode.cs:159-166 semantics, with
the IMDCT expressed as a dense ``[n/2, n]`` cosine basis).  XLA already maps
this onto the MXU; this kernel exists to (a) pin the fusion — the window
multiply happens in VMEM on the accumulator tile before the single HBM
write-back, and (b) serve as the tuning point for on-chip experiments.

Grid: ``(M/bm, N/bn, K/bk)`` with the contraction innermost ("arbitrary"),
accumulating in a float32 VMEM scratch.  The per-row window select is an
MXU-friendly one-hot matmul (``W <= 4`` windows), not a gather.

Numerics: float32 accumulation in K-major order — within 1e-6 of
``jnp.dot(..., precision=HIGHEST)`` but not bit-identical to it (tile-order
float sums differ); the decode engines keep the XLA matmul as the default
until on-chip profiling justifies switching.

STATUS (2026-08-17, NOTES.md "Pallas kernel mandate"): FROZEN as a
reference kernel.  On-chip A/B at equal f32 precision measured
0.85-0.96x vs the XLA dot at every hot shape, and device compute is <1%
of end-to-end wall in every reachable regime (the link or the host plane
binds first), so there is no target a fused variant could visibly move.
Kept compiling and tested behind ``NVT_PALLAS``; not extended.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(onehot_ref, spec_ref, basis_ref, win_ref, out_ref, acc_ref, *,
            n_k, bm, bn):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # precision=HIGHEST forces true f32 MXU passes: the Mosaic default
    # multiplies in bf16, which measured max-abs ~1.5 on decode-scale
    # values (vs the 1e-6 parity budget)
    acc_ref[:] += jnp.dot(
        spec_ref[:], basis_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(k == n_k - 1)
    def _():
        # fused window: each row's window selected from a caller-built f32
        # one-hot (a 1-D s32 operand trips Mosaic's layout verifier on
        # v5e).  W is tiny and static, so the select is an exact VPU
        # weighted sum — a one-hot MXU matmul would truncate the window
        # to bf16 (breaking the 1e-6 parity budget).
        W = onehot_ref.shape[1]
        win = onehot_ref[:, 0:1] * win_ref[0:1, :]
        for w in range(1, W):
            win += onehot_ref[:, w : w + 1] * win_ref[w : w + 1, :]
        out_ref[:] = acc_ref[:] * win


@functools.partial(
    jax.jit, static_argnames=("bm", "bn", "bk", "interpret")
)
def imdct_window_pallas(spectrum, basis, windows, widx,
                        bm=128, bn=512, bk=512, interpret=False):
    """Windowed IMDCT: ``[(rows, n2) @ (n2, n)] * windows[widx]``.

    spectrum ``[rows, n2]`` f32 (rows = flattened (frame, channel), padded to
    a multiple of ``bm`` by the caller or here), basis ``[n2, n]``, windows
    ``[W, n]``, widx ``[rows]`` int32 (per-row window index).  Returns
    ``[rows, n]`` f32.
    """
    rows, n2 = spectrum.shape
    n = basis.shape[1]
    W = windows.shape[0]
    bm = min(bm, max(8, rows))
    bn = min(bn, n)
    bk = min(bk, n2)
    pad_m = (-rows) % bm
    if pad_m:
        spectrum = jnp.pad(spectrum, [(0, pad_m), (0, 0)])
        widx = jnp.pad(widx, [(0, pad_m)])
    M = spectrum.shape[0]
    n_k = n2 // bk
    assert n2 % bk == 0 and n % bn == 0, "block sizes must divide shapes"

    # one-hot window select materialized outside the kernel: XLA fuses it
    # into the pallas_call's operand stream, and 2-D f32 avoids the 1-D
    # s32 Mosaic layout-verification failure seen on v5e
    onehot = (
        widx[:, None] == jax.lax.broadcasted_iota(jnp.int32, (M, W), 1)
    ).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, bm=bm, bn=bn),
        grid=(M // bm, n // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, W), lambda i, j, k: (i, 0)),        # onehot
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),       # spectrum
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),       # basis
            pl.BlockSpec((W, bn), lambda i, j, k: (0, j)),        # windows
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(onehot, spectrum, basis, windows)
    return out[:rows]
