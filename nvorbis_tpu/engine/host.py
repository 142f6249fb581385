"""Host engine: full-stream decode with NO device (and no jax) anywhere.

``engine="host"`` — and ``engine="auto"`` whenever touching the jax backend
is unsafe (dead tunnel relay) or the device sits behind the tunnel relay
(measured: the host plane sustains hundreds of x realtime while the relay
wire caps at 20-125x for stereo f32; NOTES.md rounds 3-4) — decodes
through:

1. the C++ unpacker's dense plane (``native/__init__.py:unpack_view``):
   Ogg packet bytes -> residue ``[B, C, n2]`` f32 + floor posts, one call
   per ~4096-frame chunk;
2. batched numpy synthesis: inverse coupling, vectorized floor polyline
   render, and an O(n log n) IMDCT via DCT-IV (scipy's pocketfft) in place
   of the oracle's O(n^2/2) matmul — the mapping is exact (verified at
   1e-13 relative against the basis matmul, tests/test_host_engine.py);
3. host overlap-add over the shared segment-table formulation
   (``engine/plan.build_segments`` — the same tiling the device planes
   gather through), written directly into the interleaved output buffer.

This module and everything it imports MUST stay jax-free: the relay-down
``engine="auto"`` promise is that no code path can reach jax backend init
(which hangs forever on a dead tunnel — the round-1 0.0-artifact class).
tests/test_host_engine.py decodes with ``import jax`` blocked to pin this.

Parity: outputs match the numpy oracle at <= 2e-6 absolute (same bound the
device planes are tested to).  The default DCT-IV runs in float32 (measured
max abs error 2e-7 vs the f64 path on decode-scale spectra);
``NVT_HOST_F64=1`` selects the float64 transform.

Reference behavior anchors: NVorbis/StreamDecoder.cs:320-541 (read loop,
lapping, trim), NVorbis/Mapping.cs:95-198 (synthesis order),
NVorbis/Mdct.cs:65-313 (the reference's own O(n log n) IMDCT).
"""

import os

import numpy as np

from nvorbis_tpu.utils.bitmath import CLIP_LIMIT
from nvorbis_tpu.engine.plan import (
    CAP_PER_SIZE,
    CHUNK_FRAMES,
    StreamPlanner,
    build_segments,
    peek_mode_index,
)

try:  # scipy is a hard dependency of jax, so it is always present in this
    # image; the guard keeps the module importable in minimal environments
    # (the matmul fallback is the oracle's exact transform)
    from scipy.fft import dct as _dct4
except Exception:  # pragma: no cover
    _dct4 = None


def _f64_enabled() -> bool:
    return bool(os.environ.get("NVT_HOST_F64"))


def imdct_rows(spec: np.ndarray, n: int) -> np.ndarray:
    """IMDCT of ``[R, n/2]`` -> ``[R, n]`` float32 via a length-n/2 DCT-IV.

    The Vorbis I transform (synth/oracle.py:imdct_basis)

        y[i] = sum_k X[k] cos(pi/(2n) (2i+1+n/2) (2k+1))

    restricted to m = i + n/4 is exactly DCT-IV_{n/2}(X)[m], and the
    remaining output range folds back by the transform's symmetries
    g[m+n] = -g[m], g[n-1-m] = -g[m]:

        y[i] = g[i+n4]          i in [0, n4)
        y[i] = -g[3*n4-1-i]     i in [n4, 3*n4)   (g reversed)
        y[i] = -g[i-3*n4]       i in [3*n4, n)

    with n4 = n/4.  Verified exact (1e-13 relative) against the basis
    matmul for every block size (tests/test_host_engine.py).
    """
    n2 = n // 2
    n4 = n // 4
    if _dct4 is None:  # pragma: no cover - scipy ships with jax
        from nvorbis_tpu.synth.oracle import imdct_basis

        return (spec.astype(np.float64) @ imdct_basis(n)).astype(np.float32)
    if _f64_enabled():
        g = _dct4(spec.astype(np.float64), type=4, axis=-1,
                  overwrite_x=True)
    else:
        # callers hand over ownership of ``spec`` (fresh gathers or
        # in-place-mutated buckets); skipping pocketfft's input copy is
        # ~9% of the transform
        g = _dct4(spec, type=4, axis=-1, overwrite_x=True)
    y = np.empty((spec.shape[0], n), dtype=g.dtype)
    y[:, :n4] = g[:, n4:n2]
    y[:, n4 : 3 * n4] = -g[:, ::-1]
    y[:, 3 * n4 :] = -g[:, :n4]
    # the DCT-IV is 2x the mathematical sum (pocketfft convention); fold
    # the 0.5 into the output cast
    y *= 0.5
    return y.astype(np.float32, copy=False)


class HostSynth:
    """Per-setup synthesis caches for the host engine."""

    def __init__(self, setup):
        self.setup = setup
        self._win_stacks = {}  # mode idx -> [W, n] f32 window table

    def windows_for(self, mode_idx):
        tab = self._win_stacks.get(mode_idx)
        if tab is None:
            tab = np.stack(self.setup.modes[mode_idx].windows)
            self._win_stacks[mode_idx] = tab
        return tab

    def synthesize(self, mode_idx, res_b, ys_b, used_b, hf_b, widx_b):
        """Batched synthesis of one mode bucket.

        ``res_b``: ``[b, C, n2]`` f32 raw residue (owned; mutated in
        place).  Returns windowed PCM ``[b, C, n]`` f32.  Pipeline order
        per NVorbis/Mapping.DecodePacket (95-198): inverse coupling,
        floor curve multiply, IMDCT, window — identical to
        synth/oracle.py:synthesize_frame batched over frames.
        """
        from nvorbis_tpu.codec.floor import (
            INVERSE_DB_TABLE,
            render_polyline_batch,
        )
        from nvorbis_tpu.codec.frames import apply_inverse_coupling

        setup = self.setup
        mode = setup.modes[mode_idx]
        mapping = mode.mapping
        n = mode.block_size
        n2 = n // 2
        b, C = res_b.shape[:2]

        # inverse coupling: the oracle's in-place [C, ...] transform
        # broadcasts over the batch via a channel-first view.  Execute
        # every step: do-not-decode channels carry all-zero residue, for
        # which the transform is the identity
        apply_inverse_coupling(res_b.transpose(1, 0, 2), mapping, [True] * C)

        # floor curves multiplied in place per channel; channels with no
        # floor energy are silence (Mapping.cs:192-196, Floor1.cs:218-221)
        for c in range(C):
            hf = hf_b[:, c]
            sub = np.flatnonzero(hf)
            if len(sub) < b:
                res_b[~hf.astype(bool), c] = 0.0
            if not len(sub):
                continue
            fl = setup.floors[mapping.channel_floor[c]]
            p = fl.post_count
            ylines = render_polyline_batch(
                fl.xs_sorted, ys_b[sub, c, :p], used_b[sub, c, :p], n2
            )
            res_b[sub, c] *= INVERSE_DB_TABLE[np.clip(ylines, 0, 255)]

        return self.synthesize_spec(mode_idx, res_b, widx_b)

    def synthesize_spec(self, mode_idx, spec_b, widx_b):
        """IMDCT + window over ready spectra (the C++ spectrum-mode output
        of native/__init__.py:unpack_spec_view, bit-identical to the
        coupling + floor-multiply stages above)."""
        n = self.setup.modes[mode_idx].block_size
        b, C = spec_b.shape[:2]
        pcm = imdct_rows(spec_b.reshape(b * C, n // 2), n).reshape(b, C, n)
        win_tab = self.windows_for(mode_idx)
        pcm *= win_tab[widx_b][:, None, :]
        return pcm


def _overlap_add(out, rows_all, n_max, s, prim, sec, sl, L_real):
    """Overlap-add one chunk's segments into ``out`` (``[L, C]`` view).

    Segments tile ``[0, L_real)`` contiguously (engine/plan.build_segments);
    ``prim``/``sec`` are flat element indices ``row * n_max + offset`` into
    ``rows_all`` ``[rows, C, n_max]``.  Consecutive same-shape segments
    (the overwhelmingly common case: runs of equal-size frames) vectorize
    into one strided copy + one strided add per run.
    """
    nseg = len(s)
    if nseg == 0:
        return
    lens = np.empty(nseg, np.int64)
    if nseg > 1:
        np.subtract(s[1:], s[:-1], out=lens[:-1])
    lens[-1] = L_real - s[-1]

    if nseg > 1:
        has2 = sl > 0
        brk = lens[1:] != lens[:-1]
        brk |= (prim[1:] - prim[:-1]) != n_max
        brk |= sl[1:] != sl[:-1]
        brk |= has2[1:] != has2[:-1]
        brk |= ((sec[1:] - sec[:-1]) != n_max) & has2[1:]
        starts = np.concatenate(([0], np.flatnonzero(brk) + 1))
    else:
        starts = np.zeros(1, np.int64)
    ends = np.append(starts[1:], nseg)

    for a, e in zip(starts, ends):
        L = int(lens[a])
        if L <= 0:
            continue
        R = int(e - a)
        r0, off = divmod(int(prim[a]), n_max)
        s0 = int(s[a])
        ov = out[s0 : s0 + R * L].reshape(R, L, -1)
        ov[:] = rows_all[r0 : r0 + R, :, off : off + L].transpose(0, 2, 1)
        slv = int(sl[a])
        if slv:
            sr0, soff = divmod(int(sec[a]), n_max)
            ov[:, :slv, :] += rows_all[
                sr0 : sr0 + R, :, soff : soff + slv
            ].transpose(0, 2, 1)


class HostBulkDecoder:
    """Chunked whole-stream decoder: C++ unpack + numpy synthesis + host
    overlap-add.  The host twin of engine/bulk.BulkDecoder — same packet
    pull, same lapping planner, same segment formulation — with the fused
    XLA program replaced by :class:`HostSynth` and the device fetch by a
    direct write into the interleaved output buffer."""

    def __init__(self, decoder, native, table=None, clip=False):
        self._dec = decoder
        self._native = native
        self._table = table  # pre-built packet table (parallel/batch.py)
        # clip=True clamps final samples to +/-CLIP_LIMIT at OLA store
        # time (identical values to a post-hoc np.clip, which cost
        # ~0.15 s/round on clipping content); self.maxabs always reports
        # the PRE-clamp magnitude for has_clipped
        self._clip = clip
        # C++ unpack packet-pool width (0 = auto); the batch plane's
        # per-stream outer threading sets 1 so pools do not multiply
        self.unpack_threads = 0
        # whole-stream decode: the page-recycling win is measured here
        # (see utils/hostmem.py; NVT_NO_MALLOPT opts out)
        from nvorbis_tpu.utils.hostmem import enable_page_recycling

        enable_page_recycling()
        self._last_plan = None
        self._synth = HostSynth(decoder._setup)
        # spectrum mode: coupling + floor render fused into the C++ unpack
        # (bit-identical to the Python stages — tests/test_host_engine.py);
        # NVT_HOST_NO_SPEC=1 pins the Python path for A/Bs and tests
        self._spec = (
            getattr(native, "has_spec", False)
            and (getattr(native, "spec_only", False)  # Floor0: spec is the
                 # ONLY native lane — the ys-posts path cannot express it
                 or not os.environ.get("NVT_HOST_NO_SPEC"))
        )
        # fused lane: DCT-IV in scipy, then ONE C++ pass mapping the DCT
        # output to IMDCT order, windowing and scattering into the row
        # space (nvt_imdct_finish), and one C++ overlap-add (nvt_ola) —
        # numerically identical to the numpy lane (same f32 ops: *0.5 is
        # exact, multiplies cannot FP-contract), which stays as the
        # NVT_HOST_NO_SPEC/NVT_HOST_F64 testing path
        self._fused = (
            self._spec and _dct4 is not None and not _f64_enabled()
            and hasattr(getattr(native, "_lib", None), "nvt_imdct_finish")
        )
        # fully-fused lane (default; NVT_HOST_FUSED_OLA=0 keeps the
        # two-pass finish+ola as the A/B twin): skip the rows_all
        # materialization entirely — nvt_finish_ola computes every output
        # sample straight from its frame's DCT bucket with the exact
        # finish op order (bit-identical; the build pins
        # -ffp-contract=off so the add cannot fuse into an FMA),
        # region-split per segment.  The carry row is materialized per
        # chunk by a 1-frame finish call.  A/B: 5/5 adjacent wins,
        # median 1.81 vs 1.98 s/round (~10%) — the ~67 MB/chunk row
        # space written once and read ~1.3x is gone.
        self._fused2 = (
            self._fused
            and os.environ.get("NVT_HOST_FUSED_OLA", "1") != "0"
            and hasattr(native._lib, "nvt_finish_ola")
        )

    def run(self):
        """Decode the remainder of the stream; returns interleaved float32
        (clamped to +/-CLIP_LIMIT when constructed with clip=True;
        ``self.maxabs`` carries the pre-clamp magnitude either way)."""
        from nvorbis_tpu.ogg.fast_packets import (
            PacketTableCursor,
            plan_job_arr,
            table_for_decoder,
        )
        from nvorbis_tpu.utils.profiling import span

        dec = self._dec
        setup = dec._setup
        C = setup.channels
        planner = StreamPlanner(dec._current_position)

        mfb = setup.mode_field_bits
        n_modes = len(setup.modes)
        n_max = setup.block1_size

        cursor = None
        table = self._table if self._table is not None else (
            table_for_decoder(dec)
        )
        if table is not None:
            cursor = PacketTableCursor(table)
        w_max = max(len(m.overlaps) for m in setup.modes)
        ov_tab = np.zeros((n_modes, w_max, 3), dtype=np.int64)
        blk_tab = np.zeros(n_modes, dtype=np.int64)
        for mi, m in enumerate(setup.modes):
            blk_tab[mi] = m.block_size
            for wi, svt in enumerate(m.overlaps):
                ov_tab[mi, wi] = svt

        # output: preallocate from the stream's final granule when the
        # packet table knows it (end trim only shrinks); otherwise grow
        pcm = None
        if table is not None:
            gran, fl = table[2], table[3]
            with_g = gran[(fl & 2) != 0]
            if len(with_g):
                bound = int(with_g[-1]) + setup.block1_size
                pcm = np.empty((bound, C), dtype=np.float32)
        chunks = [] if pcm is None else None

        carry = None  # (pcm row [C, n_max] f32, FramePlan) of last good frame
        chunk_base = 0
        provider_done = False
        # clip detection (and, with clip=True, the clamp itself) rides the
        # OLA pass on both lanes: every output sample goes through it
        # exactly once as its final value.  self.maxabs reports the
        # pre-clamp magnitude after run()
        maxabs = np.zeros(1, dtype=np.float32)
        self.maxabs = None
        # per-mode window-table base pointers for the native bucket prep
        # (the tables live on self._synth for the run's lifetime)
        win_tabs = None
        win_ptrs = None
        if self._fused2 and self._native is not None:
            try:
                win_tabs = [self._synth.windows_for(mi)
                            for mi in range(n_modes)]
                win_ptrs = np.array([w.ctypes.data for w in win_tabs],
                                    dtype=np.int64)
            except Exception:
                win_tabs = win_ptrs = None
        tight_unpack = (
            win_ptrs is not None
            and hasattr(self._native, "unpack_spec_ptr")
            and not os.environ.get("NVT_NO_TIGHT_UNPACK")
        )

        while not provider_done:
            inv_perm = None  # spec rows permuted (mode-sorted) when set
            rows_sorted = False  # residue rows known mode-ascending
            resid_bufs = None  # tight per-bucket buffers when set
            bucket_lo_of = None
            if cursor is not None:
                size_counts = {}
                with span("host.pull"):
                    job = cursor.pull(
                        setup, blk_tab, CHUNK_FRAMES, size_counts,
                        CAP_PER_SIZE
                    )
                provider_done = cursor.done
                if job is None:
                    break
                with span("host.unpack"):
                    if (self._fused and mfb <= 7
                            and not os.environ.get(
                                "NVT_NO_SORTED_UNPACK")):
                        # unpack the chunk's packets in mode-sorted order
                        # (peeked from each packet's first byte) so every
                        # synthesis bucket below is a contiguous row range
                        # — the DCT consumes slices instead of paying a
                        # ~17 MB gather copy per chunk.  No packet bytes
                        # move: the C++ side takes per-packet spans.
                        data_v, off_v = job["view"]
                        first = data_v[off_v[:-1]]
                        mkey = ((first.astype(np.int64) >> 1)
                                & ((1 << mfb) - 1))
                        need_perm = bool(np.any(mkey[1:] < mkey[:-1]))
                        if need_perm:
                            perm = np.argsort(
                                mkey, kind="stable").astype(np.int64)
                            starts = np.ascontiguousarray(off_v[:-1][perm])
                            ends = np.ascontiguousarray(off_v[1:][perm])
                            sk = mkey[perm]
                        else:
                            starts, ends = off_v[:-1], off_v[1:]
                            sk = mkey
                        if tight_unpack and len(sk) >= 256:
                            # (below ~256 frames the bucket bookkeeping
                            # outweighs the reshape copy it avoids —
                            # small files keep the wide lane)
                            # per-bucket TIGHT buffers (stride = the
                            # mode's own n2): the short-block bucket
                            # feeds the DCT with no reshape copy
                            counts = np.bincount(sk, minlength=n_modes)
                            n2_modes = blk_tab >> 1
                            resid_bufs = {}
                            base = np.zeros(n_modes, dtype=np.int64)
                            for m in np.flatnonzero(counts):
                                bb = np.empty(
                                    (int(counts[m]), C, int(n2_modes[m])),
                                    dtype=np.float32)
                                resid_bufs[int(m)] = bb
                                base[m] = bb.ctypes.data
                            lo_of = np.zeros(n_modes, dtype=np.int64)
                            np.cumsum(counts[:-1], out=lo_of[1:])
                            r_in = (np.arange(len(sk), dtype=np.int64)
                                    - lo_of[sk])
                            strides_pk = n2_modes[sk]
                            meta_p = self._native.unpack_spec_ptr(
                                data_v, np.ascontiguousarray(starts),
                                np.ascontiguousarray(ends),
                                base[sk] + r_in * (C * strides_pk * 4),
                                strides_pk,
                                n_threads=self.unpack_threads,
                            )
                            residue = None  # reconstructed only if the
                            bucket_lo_of = lo_of  # fallback loop needs it
                        elif need_perm:
                            residue, meta_p = self._native.unpack_spec_sv(
                                data_v, starts, ends,
                                n_threads=self.unpack_threads,
                            )
                        else:
                            residue, meta_p = (
                                self._native.unpack_spec_view(
                                    *job["view"],
                                    n_threads=self.unpack_threads,
                                ))
                        if need_perm:
                            inv_perm = np.empty_like(perm)
                            inv_perm[perm] = np.arange(
                                len(perm), dtype=np.int64)
                            meta = meta_p[inv_perm]  # original frame order
                        else:
                            meta = meta_p
                        rows_sorted = True  # permuted, or already ascending
                        ys = used = has_floor = None
                    elif self._spec:
                        residue, meta = self._native.unpack_spec_view(
                            *job["view"], n_threads=self.unpack_threads
                        )
                        ys = used = has_floor = None
                    else:
                        residue, ys, used, has_floor, meta = (
                            self._native.unpack_view(
                                *job["view"],
                                n_threads=self.unpack_threads,
                            )
                        )
            else:
                packets = []
                raw = []
                size_counts = {}
                while len(packets) < CHUNK_FRAMES:
                    p = dec._packet_provider.get_next_packet()
                    if p is None:
                        provider_done = True
                        break
                    packets.append(p)
                    data = bytes(p.data)
                    raw.append(data)
                    mi = peek_mode_index(data, mfb)
                    if mi is not None and mi < n_modes:
                        bsz = setup.modes[mi].block_size
                        size_counts[bsz] = size_counts.get(bsz, 0) + 1
                        if size_counts[bsz] >= CAP_PER_SIZE:
                            break
                if not packets:
                    break
                with span("host.unpack"):
                    if self._spec:
                        residue, meta = self._native.unpack_spec(
                            raw, n_threads=self.unpack_threads
                        )
                        ys = used = has_floor = None
                    else:
                        residue, ys, used, has_floor, meta = (
                            self._native.unpack(
                                raw, n_threads=self.unpack_threads
                            )
                        )
                grans = [p.granule_position for p in packets]
                job = {
                    "n": len(packets),
                    "granules": grans,
                    # array forms unlock the vectorized planner
                    # (plan_job_arr's fast path; the sequential add()
                    # loop cost ~16% of a forward-only decode)
                    "gran_arr": np.array(
                        [g if g is not None else -1 for g in grans],
                        dtype=np.int64),
                    "has_gran": np.array([g is not None for g in grans],
                                         dtype=bool),
                    "eos": np.array([p.is_end_of_stream for p in packets],
                                    dtype=bool),
                    "resync": np.array([p.is_resync for p in packets],
                                       dtype=bool),
                    "ovh_bits": np.array(
                        [p.container_overhead_bits for p in packets],
                        dtype=np.int64),
                }
            if not self._spec:
                used = used.astype(bool)
                has_floor = has_floor.astype(bool)
            with span("host.plan"):
                pa, plans, self._last_plan = plan_job_arr(
                    planner, ov_tab, blk_tab, setup, meta, job,
                    dec._stats, self._last_plan,
                )
            if cursor is None:
                for p in packets:
                    p.done()

            nF = pa.shape[0]
            ok = pa[:, 0] == 1
            rof = np.arange(nF, dtype=np.int64)

            # synthesize every good frame, bucketed by mode, into a flat
            # row space (row nF = the carry frame from the previous chunk)
            # — or, on the fully-fused lane, keep the DCT buckets and
            # per-frame source records for nvt_finish_ola (no row space)
            if self._fused2:
                rows_all = None
                g_bufs = []
                gs_ptrs = []
                nbuck = -1
                if rows_sorted and win_ptrs is not None and nF:
                    # native bucket prep: fills the per-frame source
                    # records + the dense bucket table in one call;
                    # returns -1 (fall back) on any bad frame
                    fbuck = np.empty(nF + 1, dtype=np.int64)
                    frow = np.empty(nF + 1, dtype=np.int64)
                    fns = np.empty(nF + 1, dtype=np.int32)
                    fwin = np.empty(nF + 1, dtype=np.int64)
                    fwidx = np.empty(nF + 1, dtype=np.int32)
                    bucket_t = np.empty((3, n_modes), dtype=np.int64)
                    nbuck = self._native._lib.nvt_bucket_prep(
                        nF, pa.ctypes.data, meta.ctypes.data, n_modes,
                        blk_tab.ctypes.data, win_ptrs.ctypes.data,
                        fbuck.ctypes.data, frow.ctypes.data,
                        fns.ctypes.data, fwidx.ctypes.data,
                        fwin.ctypes.data, bucket_t[0].ctypes.data,
                        bucket_t[1].ctypes.data, bucket_t[2].ctypes.data,
                    )
                if nbuck < 0:
                    fbuck = np.full(nF + 1, -1, dtype=np.int64)
                    frow = np.zeros(nF + 1, dtype=np.int64)
                    fns = np.zeros(nF + 1, dtype=np.int32)
                    fwin = np.zeros(nF + 1, dtype=np.int64)  # float*/frame
                    fwidx = np.zeros(nF + 1, dtype=np.int32)
            else:
                with span("host.alloc"):
                    rows_all = np.empty((nF + 1, C, n_max),
                                        dtype=np.float32)
            if residue is None and not (self._fused2 and nbuck >= 0):
                # tight buckets but the fast lane bailed (bad frame /
                # plan edge): reconstruct the wide row space the
                # fallback loops expect (rare; correctness path)
                residue = np.zeros((nF, C, n_max // 2), dtype=np.float32)
                for m, bb in resid_bufs.items():
                    lo = int(bucket_lo_of[m])
                    residue[lo : lo + bb.shape[0], :, : bb.shape[2]] = bb
            with span("host.synth"):
                if self._fused2 and nbuck >= 0:
                    # bucket-table lane: each bucket is a contiguous row
                    # range of the mode-sorted residue; only the DCT and
                    # the g bookkeeping remain in Python
                    for b in range(nbuck):
                        m = int(bucket_t[0, b])
                        lo = int(bucket_t[1, b])
                        cntb = int(bucket_t[2, b])
                        n = int(blk_tab[m])
                        with span("host.dct"):
                            if resid_bufs is not None:
                                # tight bucket buffer: already [cnt, C,
                                # n/2] contiguous — reshape is free
                                x = resid_bufs[m].reshape(-1, n // 2)
                            else:
                                sel = residue[lo : lo + cntb]
                                x = sel[:, :, : n // 2].reshape(-1, n // 2)
                            g = _dct4(
                                x, type=4, axis=-1,
                                overwrite_x=x.flags.c_contiguous,
                            )
                            if not g.flags.c_contiguous:
                                g = np.ascontiguousarray(g)
                        g_bufs.append(g)
                        gs_ptrs.append(g.ctypes.data)
                elif ok.any():
                    mode_r = meta[:nF, 1].astype(np.int64)
                    for m in np.unique(mode_r[ok]):
                        idx = np.flatnonzero(ok & (mode_r == m))
                        n = setup.modes[int(m)].block_size
                        if self._fused:
                            if inv_perm is not None:
                                rows = inv_perm[idx]
                                lo = int(rows[0])
                                if len(rows) == int(rows[-1]) - lo + 1:
                                    # the common case by construction:
                                    # contiguous mode bucket, zero-copy
                                    # for the full-width mode
                                    sel = residue[lo : lo + len(rows)]
                                else:  # bad frames punched holes
                                    sel = residue[rows]
                            else:
                                sel = residue[idx]
                            with span("host.dct"):
                                # overwrite_x skips pocketfft's internal
                                # input copy (~9% of the transform;
                                # spectrum rows are consumed exactly once
                                # — carries copy from rows_all).  ONLY
                                # when the input is C-contiguous: on a
                                # strided view scipy returns a STRIDED
                                # result view, and nvt_imdct_finish reads
                                # g.ctypes.data as contiguous rows — that
                                # aliasing read garbage for every row but
                                # the first (caught by parity tests)
                                x = sel[:, :, : n // 2].reshape(
                                    -1, n // 2
                                )
                                g = _dct4(
                                    x, type=4, axis=-1,
                                    overwrite_x=x.flags.c_contiguous,
                                )
                                if not g.flags.c_contiguous:
                                    # belt and braces for the ctypes
                                    # consumer below
                                    g = np.ascontiguousarray(g)
                            widx = np.ascontiguousarray(meta[idx, 2])
                            win_tab = self._synth.windows_for(int(m))
                            if self._fused2:
                                bi = len(g_bufs)
                                g_bufs.append(g)  # keep alive for the call
                                gs_ptrs.append(g.ctypes.data)
                                fbuck[idx] = bi
                                frow[idx] = np.arange(
                                    len(idx), dtype=np.int64)
                                fns[idx] = n
                                fwidx[idx] = widx
                                fwin[idx] = (win_tab.ctypes.data
                                             + widx.astype(np.int64)
                                             * (n * 4))
                                continue
                            with span("host.finish"):
                                self._native._lib.nvt_imdct_finish(
                                    g.ctypes.data, len(idx), C, n,
                                    idx.ctypes.data, widx.ctypes.data,
                                    win_tab.ctypes.data,
                                    rows_all.ctypes.data, n_max,
                                )
                            continue
                        widx = meta[idx, 2].astype(np.int64)
                        if self._spec:
                            out_b = self._synth.synthesize_spec(
                                int(m), residue[idx][:, :, : n // 2], widx
                            )
                        else:
                            out_b = self._synth.synthesize(
                                int(m),
                                residue[idx][:, :, : n // 2],
                                ys[idx], used[idx], has_floor[idx],
                                widx,
                            )
                        rows_all[idx, :, :n] = out_b
                if carry is not None and rows_all is not None:
                    rows_all[nF] = carry[0]

            prev_plan = carry[1] if carry is not None else None
            L_real = planner.emitted - chunk_base
            if L_real > 0:
                with span("host.segs"):
                    c_s, c_prim, c_sec, c_sl = build_segments(
                        pa, rof, n_max, prev_plan, nF, chunk_base
                    )
                if pcm is not None:
                    if chunk_base + L_real > pcm.shape[0]:
                        # stream outran the granule-derived bound
                        # (malformed granules); grow with slack
                        grown = np.empty(
                            (chunk_base + L_real + n_max, C), np.float32
                        )
                        grown[: pcm.shape[0]] = pcm
                        pcm = grown
                    out = pcm[chunk_base : chunk_base + L_real]
                else:
                    out = np.empty((L_real, C), dtype=np.float32)
                    chunks.append(out)
                with span("host.ola"):
                    if self._fused:
                        nseg = len(c_s)
                        lens = np.empty(nseg, np.int64)
                        if nseg:
                            if nseg > 1:
                                np.subtract(
                                    c_s[1:], c_s[:-1], out=lens[:-1]
                                )
                            lens[-1] = L_real - c_s[-1]
                        if nseg and self._fused2:
                            gs_arr = np.array(gs_ptrs or [0],
                                              dtype=np.int64)
                            if carry is not None:
                                carr = carry[0]
                            else:
                                carr = np.zeros((C, n_max),
                                                dtype=np.float32)
                            self._native._lib.nvt_finish_ola(
                                gs_arr.ctypes.data, fbuck.ctypes.data,
                                frow.ctypes.data, fns.ctypes.data,
                                fwin.ctypes.data, carr.ctypes.data,
                                n_max, C,
                                c_s.ctypes.data, c_prim.ctypes.data,
                                c_sec.ctypes.data, c_sl.ctypes.data,
                                lens.ctypes.data, nseg, out.ctypes.data,
                                maxabs.ctypes.data,
                                CLIP_LIMIT if self._clip else 0.0,
                            )
                        elif nseg:
                            self._native._lib.nvt_ola(
                                rows_all.ctypes.data, n_max, C,
                                c_s.ctypes.data, c_prim.ctypes.data,
                                c_sec.ctypes.data, c_sl.ctypes.data,
                                lens.ctypes.data, nseg, out.ctypes.data,
                                maxabs.ctypes.data,
                                CLIP_LIMIT if self._clip else 0.0,
                            )
                    else:
                        _overlap_add(
                            out, rows_all, n_max, c_s, c_prim, c_sec,
                            c_sl, L_real,
                        )
                        if out.size:
                            # same chunk-local semantics as the fused
                            # lane: track pre-clamp magnitude, then clip
                            m = max(float(out.max()), -float(out.min()))
                            if m > maxabs[0]:
                                maxabs[0] = m
                            if self._clip:
                                np.clip(out, -CLIP_LIMIT, CLIP_LIMIT,
                                        out=out)
                chunk_base = planner.emitted

            good = np.flatnonzero(ok)
            if len(good) and not provider_done:
                # (a final chunk's carry feeds no next window — the EOS
                # trim already owns the tail; skipping the 1-frame finish
                # was a measurable fixed cost on 1-chunk files)
                lg = int(good[-1])
                if self._fused2:
                    # materialize the carry row with a 1-frame finish —
                    # the only finished row the fused lane ever stores
                    n_l = int(fns[lg])
                    cbuf = np.zeros((C, n_max), dtype=np.float32)
                    g_ptr = (gs_ptrs[int(fbuck[lg])]
                             + int(frow[lg]) * C * (n_l // 2) * 4)
                    idx0 = np.zeros(1, dtype=np.int64)
                    w32 = np.array([fwidx[lg]], dtype=np.int32)
                    win_tab = self._synth.windows_for(int(meta[lg, 1]))
                    self._native._lib.nvt_imdct_finish(
                        g_ptr, 1, C, n_l, idx0.ctypes.data,
                        w32.ctypes.data, win_tab.ctypes.data,
                        cbuf.ctypes.data, n_max,
                    )
                    crow = cbuf
                else:
                    crow = rows_all[lg].copy()
                carry = (
                    crow,
                    plans[lg] if plans is not None else self._last_plan,
                )

        dec._eos_found = True
        dec._prev_buf = None
        dec._prev_start = dec._prev_end = dec._prev_stop = 0
        dec._current_position = planner.stream_pos0 + planner.emitted
        dec._has_position = planner.has_position

        self.maxabs = float(maxabs[0])
        if pcm is not None:
            return pcm[: max(0, planner.emitted)].reshape(-1)
        if not chunks:
            return np.zeros(0, dtype=np.float32)
        return np.concatenate([c.reshape(-1) for c in chunks])
