"""Device plane: batched Vorbis frame synthesis as one fused XLA program.

Each :class:`DeviceSynth` is specialized to one *mode* of one stream setup
(block size, windows, mapping topology, per-channel floor configuration are
all static), and compiles one jitted program per padded batch size.  The
program performs, for a batch of ``B`` frames over ``C`` channels:

1. inverse square-polar channel coupling (``NVorbis/Mapping.cs:137-182``),
2. floor1 curve render — the closed form of the reference's integer Bresenham
   walk (``NVorbis/Floor1.cs:316-341``) vectorized over bins — plus the
   256-entry inverse-dB gain gather (``NVorbis/Floor1.cs:345-410``),
3. floor multiply (``NVorbis/Floor1.cs:186-222``),
4. inverse MDCT as an MXU matmul against a precomputed ``[n/2, n]`` cosine
   basis (the same transform the reference computes with the stb_vorbis
   8-step FFT, ``NVorbis/Mdct.cs:65-313``),
5. window multiply with the per-frame lapping window (``NVorbis/Mode.cs:153-170``).

All ops are static-shaped; the only data-dependent values are tensor
contents, so XLA fuses 1-3 and 5 around the single matmul.  bfloat16 is NOT
used: the parity budget (1e-6 vs the scalar oracle) requires float32 with
``Precision.HIGHEST`` on the MXU.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from nvorbis_tpu.codec.floor import INVERSE_DB_TABLE, Floor1
from nvorbis_tpu.synth.oracle import imdct_basis

# pad value for unused floor-post slots: larger than any bin index so padded
# posts never match `xs <= bin`, but still keeps xs sorted
_XS_PAD = np.int32(1 << 24)


def _render_floor1_curves(xs, ys, used, has_floor, idb_table, n2):
    """Vectorized floor1 polyline render -> linear gains ``[B, C, n2]``.

    ``xs``: int32 sorted post X positions (padded with ``_XS_PAD``) — either
    ``[C, P]`` (static per-stream tables, the single-stream path) or
    ``[B, C, P]`` (per-frame tables, the stream-agnostic sharded path);
    ``ys``/``used``: ``[B, C, P]`` per-frame post values and used flags in
    the same sorted order; ``has_floor``: ``[B, C]``.

    Closed form of ``Floor1.RenderLineMulti`` (NVorbis/Floor1.cs:316-341):
    for bin x between enclosing used posts (lx,ly)-(hx,hy),
    ``y = ly + sign(dy) * floor((x-lx)*|dy| / adx)`` with
    ``adx = min(hx, n2) - lx`` (the reference clips X but not Y at n2, which
    alters the final segment's slope; reproduced).
    """
    if xs.ndim == 2:
        xs = xs[None]  # [1, C, P], broadcasts over the batch
    B, C, P = ys.shape
    bins = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, n2), 3)
    xs_b = xs[:, :, :, None]  # [1|B, C, P, 1]
    used_b = used[:, :, :, None]  # [B, C, P, 1]
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, P, 1), 2)

    # left neighbor: largest used post with xs <= bin
    le = used_b & (xs_b <= bins)  # [B, C, P, n2]
    left = jnp.max(jnp.where(le, p_idx, -1), axis=2)  # [B, C, n2]
    # right neighbor: smallest used post with xs > bin
    gt = used_b & (xs_b > bins)
    right = jnp.min(jnp.where(gt, p_idx, P), axis=2)  # [B, C, n2]

    left_safe = jnp.clip(left, 0, P - 1)
    right_safe = jnp.clip(right, 0, P - 1)
    has_right = right < P

    lx = jnp.take_along_axis(xs, left_safe, axis=2)  # broadcast over B
    ly = jnp.take_along_axis(ys, left_safe, axis=2)
    hx = jnp.take_along_axis(xs, right_safe, axis=2)
    hy = jnp.take_along_axis(ys, right_safe, axis=2)

    dy = hy - ly
    adx = jnp.minimum(hx, n2) - lx
    adx_safe = jnp.maximum(adx, 1)
    t = bins[0, 0] - lx  # [B, C, n2] via broadcast
    off = (t * jnp.abs(dy)) // adx_safe
    y = ly + jnp.where(dy < 0, -off, off)
    y = jnp.where(has_right & (adx > 0), y, ly)
    y = jnp.clip(y, 0, 255)

    gains = jnp.take(idb_table, y)  # [B, C, n2]
    return jnp.where(has_floor[:, :, None], gains, jnp.float32(0.0))


def _apply_inverse_coupling(residue, coupling_steps):
    """Inverse square-polar coupling over ``residue [B, C, n2]``.

    Step list is static and unrolled in reverse order
    (NVorbis/Mapping.cs:137-182).  Channels flagged do-not-decode carry
    all-zero residue, for which the transform is the identity, so no
    per-frame execute mask is needed.
    """
    for mag, ang in reversed(coupling_steps):
        m = residue[:, mag]
        a = residue[:, ang]
        m_pos = m > 0
        a_pos = a > 0
        new_m = jnp.where(m_pos, jnp.where(a_pos, m, m + a), jnp.where(a_pos, m, m - a))
        new_a = jnp.where(m_pos, jnp.where(a_pos, m - a, m), jnp.where(a_pos, m + a, m))
        residue = residue.at[:, mag].set(new_m).at[:, ang].set(new_a)
    return residue


class DeviceSynth:
    """Compiled batched synthesis for one (setup, mode) pair."""

    def __init__(self, setup, mode, max_posts=None):
        self.mode = mode
        mapping = mode.mapping
        self.channels = setup.channels
        self.n = mode.block_size
        self.n2 = self.n // 2
        self.coupling_steps = tuple(zip(mapping.coupling_mag, mapping.coupling_ang))

        # per-channel floor config (static for a given mode/mapping)
        floors = [setup.floors[mapping.channel_floor[c]] for c in range(self.channels)]
        self.floor1_mask = np.array([isinstance(f, Floor1) for f in floors], dtype=bool)
        self.has_floor0 = bool((~self.floor1_mask).any())

        if max_posts is None:
            max_posts = 1
            for f in floors:
                if isinstance(f, Floor1):
                    max_posts = max(max_posts, f.post_count)
        self.max_posts = max_posts

        xs = np.full((self.channels, max_posts), _XS_PAD, dtype=np.int32)
        for c, f in enumerate(floors):
            if isinstance(f, Floor1):
                xs[c, : f.post_count] = f.xs_sorted
        self._xs = xs

        self._windows = np.stack(mode.windows).astype(np.float32)  # [W, n]
        self._basis = imdct_basis(self.n, np.float32)  # [n2, n]
        self._fns = {}

    # -- program ------------------------------------------------------------

    def make_fn(self):
        """Build the pure batched synthesis closure (constants captured)."""
        xs = jnp.asarray(self._xs)
        windows = jnp.asarray(self._windows)
        basis = jnp.asarray(self._basis)
        idb = jnp.asarray(INVERSE_DB_TABLE)
        n = self.n
        n2 = self.n2
        coupling = self.coupling_steps
        floor1_mask = jnp.asarray(self.floor1_mask)
        has_f0 = self.has_floor0

        def synth(residue, ys, used, has_floor, window_index, f0_curves):
            residue = _apply_inverse_coupling(residue, coupling)
            curve = _render_floor1_curves(xs, ys, used, has_floor, idb, n2)
            if has_f0:
                curve = jnp.where(floor1_mask[None, :, None], curve, f0_curves)
            spectrum = residue * curve
            pcm = jnp.dot(
                spectrum.reshape(-1, n2),
                basis,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(residue.shape[0], residue.shape[1], n)
            win = jnp.take(windows, window_index, axis=0)  # [B, n]
            return pcm * win[:, None, :]

        return synth

    def _build(self, batch):
        return jax.jit(self.make_fn())

    @staticmethod
    def _bucket(b: int) -> int:
        """Round batch size up to a coarse bucket to bound recompiles.

        Two compiled sizes per readahead window (16 and 64) cover the steady
        state; tiny pads cost almost nothing on device.
        """
        if b <= 16:
            return 16
        p = 16
        while p < b:
            p <<= 2
        return p

    def __call__(self, residue, ys, used, has_floor, window_index, f0_curves=None):
        """Synthesize a batch; numpy in, numpy ``[B, C, n]`` out.

        Inputs are padded up to the next power-of-two batch size (padding
        frames decode to silence and are sliced off).
        """
        b = residue.shape[0]
        bp = self._bucket(b)
        if bp != b:
            pad = [(0, bp - b)] + [(0, 0)] * (residue.ndim - 1)
            residue = np.pad(residue, pad)
            ys = np.pad(ys, [(0, bp - b), (0, 0), (0, 0)])
            used = np.pad(used, [(0, bp - b), (0, 0), (0, 0)])
            has_floor = np.pad(has_floor, [(0, bp - b), (0, 0)])
            window_index = np.pad(window_index, [(0, bp - b)])
            if f0_curves is not None:
                f0_curves = np.pad(f0_curves, [(0, bp - b), (0, 0), (0, 0)])
        if f0_curves is None:
            f0_curves = np.zeros((bp, self.channels, self.n2), dtype=np.float32)

        fn = self._fns.get(bp)
        if fn is None:
            fn = self._build(bp)
            self._fns[bp] = fn
        out = fn(
            jnp.asarray(residue),
            jnp.asarray(ys),
            jnp.asarray(used),
            jnp.asarray(has_floor),
            jnp.asarray(window_index),
            jnp.asarray(f0_curves),
        )
        return np.asarray(out)[:b]
