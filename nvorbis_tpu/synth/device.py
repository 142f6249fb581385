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
    B, C, P = ys.shape
    if xs.ndim == 2:
        xs = jnp.broadcast_to(xs[None], (B, C, P))
    else:
        xs = jnp.broadcast_to(xs, (B, C, P))

    # Neighbor search is O(n2) per channel (not O(P*n2)): scatter each used
    # post's index at its bin position, then a cumulative max gives, per bin,
    # the largest used post with xs <= bin; a reverse cumulative min (shifted
    # by one) gives the smallest used post with xs > bin.  Posts at/after n2
    # cannot be scattered but can still be right neighbors (the reference
    # clips X at n2 mid-segment) — folded in via a per-channel fallback.
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (B, C, P), 2)
    in_range = used & (xs < n2)
    xs_cl = jnp.clip(xs, 0, n2 - 1)
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (B, C, P), 0)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (B, C, P), 1)

    left_scat = jnp.full((B, C, n2), -1, dtype=jnp.int32)
    left_scat = left_scat.at[b_idx, c_idx, xs_cl].max(jnp.where(in_range, p_idx, -1))
    left = jax.lax.cummax(left_scat, axis=2)  # [B, C, n2]

    right_scat = jnp.full((B, C, n2), P, dtype=jnp.int32)
    right_scat = right_scat.at[b_idx, c_idx, xs_cl].min(jnp.where(in_range, p_idx, P))
    rc = jax.lax.cummin(right_scat[:, :, ::-1], axis=2)[:, :, ::-1]
    # right[x] = min over bins > x, plus used posts at/after n2
    tail_fallback = jnp.min(jnp.where(used & (xs >= n2), p_idx, P), axis=2)
    right = jnp.concatenate(
        [rc[:, :, 1:], jnp.full((B, C, 1), P, dtype=jnp.int32)], axis=2
    )
    right = jnp.minimum(right, tail_fallback[:, :, None])

    left_safe = jnp.clip(left, 0, P - 1)
    right_safe = jnp.clip(right, 0, P - 1)
    has_right = right < P

    lx = jnp.take_along_axis(xs, left_safe, axis=2)
    ly = jnp.take_along_axis(ys, left_safe, axis=2)
    hx = jnp.take_along_axis(xs, right_safe, axis=2)
    hy = jnp.take_along_axis(ys, right_safe, axis=2)

    dy = hy - ly
    adx = jnp.minimum(hx, n2) - lx
    adx_safe = jnp.maximum(adx, 1)
    bins = jax.lax.broadcasted_iota(jnp.int32, (B, C, n2), 2)
    t = bins - lx
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


def synth_spectra(residue, ys, used, has_floor, xs, basis, coupling,
                  f0_curves=None, has_f0=False):
    """Un-windowed synthesis body: coupling -> floor render -> floor
    multiply -> IMDCT matmul.  Returns PCM ``[B, C, n]``."""
    n2 = residue.shape[-1]
    n = basis.shape[-1]
    residue = _apply_inverse_coupling(residue, coupling)
    curve = _render_floor1_curves(
        xs, ys, used, has_floor, jnp.asarray(INVERSE_DB_TABLE), n2
    )
    if has_f0:
        # channels whose floor is Floor0 have no floor1 posts: xs[...,0] is
        # the pad value; substitute the host-rendered curve there
        floor1_mask = xs[..., 0] < _XS_PAD  # [C] or [B, C]
        if floor1_mask.ndim == 1:
            floor1_mask = floor1_mask[None]
        curve = jnp.where(floor1_mask[:, :, None], curve, f0_curves)
    spectrum = residue * curve
    return jnp.dot(
        spectrum.reshape(-1, n2),
        basis,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(residue.shape[0], residue.shape[1], n)


def synth_core(residue, ys, used, has_floor, window_index, xs, windows, basis,
               coupling, f0_curves=None, has_f0=False):
    """The synthesis body (traceable, stream-agnostic): coupling -> floor
    render -> floor multiply -> IMDCT matmul -> window.  Returns windowed
    PCM ``[B, C, n]``."""
    pcm = synth_spectra(
        residue, ys, used, has_floor, xs, basis, coupling,
        f0_curves=f0_curves, has_f0=has_f0,
    )
    win = jnp.take(windows, window_index, axis=0)  # [B, n]
    return pcm * win[:, None, :]


@functools.partial(jax.jit, static_argnames=("coupling", "has_f0"))
def _synth_program(
    residue, ys, used, has_floor, window_index, f0_curves, xs, windows, basis,
    *, coupling, has_f0,
):
    """Jitted wrapper of :func:`synth_core`.

    All per-stream tables (floor X positions, window set, IMDCT basis) are
    *arguments*, so the jit cache is shared across every stream/reader with
    the same shapes and coupling topology — opening a new file never
    recompiles.
    """
    return synth_core(
        residue, ys, used, has_floor, window_index, xs, windows, basis,
        coupling, f0_curves=f0_curves, has_f0=has_f0,
    )


class DeviceSynth:
    """Batched synthesis front-end for one (setup, mode) pair.

    Holds the stream's device-resident constant tables (floor X positions,
    windows, IMDCT basis) and feeds them to the shared jitted
    :func:`_synth_program`.
    """

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
        # device-resident constants, transferred once per stream
        self._xs_dev = jnp.asarray(self._xs)
        self._windows_dev = jnp.asarray(self._windows)
        self._basis_dev = jnp.asarray(self._basis)

    # -- program ------------------------------------------------------------

    def make_fn(self):
        """Pure batched synthesis closure over this stream's tables
        (for the driver's single-chip compile check)."""
        xs, windows, basis = self._xs_dev, self._windows_dev, self._basis_dev
        coupling = self.coupling_steps
        has_f0 = self.has_floor0

        def synth(residue, ys, used, has_floor, window_index, f0_curves):
            return _synth_program(
                residue, ys, used, has_floor, window_index, f0_curves,
                xs, windows, basis, coupling=coupling, has_f0=has_f0,
            )

        return synth

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

    def dispatch(self, residue, ys, used, has_floor, window_index, f0_curves=None):
        """Dispatch a batch asynchronously; returns ``(device_array, b)``.

        Inputs are padded up to a coarse bucket size (padding frames decode
        to silence).  The result is a live jax array — conversion to numpy
        (and thus the device sync) is deferred to the caller so host unpack
        of the next window overlaps device compute.
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
            f0_curves = np.zeros((1, 1, 1), dtype=np.float32)
            if self.has_floor0:
                f0_curves = np.zeros((bp, self.channels, self.n2), dtype=np.float32)
        out = _synth_program(
            jnp.asarray(residue),
            jnp.asarray(ys),
            jnp.asarray(used),
            jnp.asarray(has_floor),
            jnp.asarray(window_index),
            jnp.asarray(f0_curves),
            self._xs_dev,
            self._windows_dev,
            self._basis_dev,
            coupling=self.coupling_steps,
            has_f0=self.has_floor0,
        )
        return out, b

    def __call__(self, residue, ys, used, has_floor, window_index, f0_curves=None):
        """Synchronous convenience wrapper: numpy in, numpy ``[B, C, n]`` out."""
        out, b = self.dispatch(residue, ys, used, has_floor, window_index, f0_curves)
        return np.asarray(out)[:b]
