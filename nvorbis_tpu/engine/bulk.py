"""Bulk decode: whole-stream (chunked) synthesis + overlap-add ON DEVICE.

The streaming path fetches every frame's full windowed block ``[C, n]`` and
overlap-adds on the host — ~2x the audio bytes across the device->host link
plus one round trip per window.  For a full-stream decode the lapped
overlap-add is a *static dataflow* once the per-frame lapping offsets are
known, so this module:

1. runs the int-only lapping state machine of the reference read loop
   (``NVorbis/StreamDecoder.cs:417-541``: first-packet discard, failed-packet
   tail drain, granule position pickup, end-of-stream trim) on the host over
   the native unpack metadata — producing one absolute scatter offset per
   frame;
2. compiles ONE fused XLA program per chunk shape that synthesizes every
   frame (all mode buckets) AND scatter-adds the windowed blocks into a flat
   ``[L, C]`` sample buffer — each output position receives at most the two
   lapped contributions, and float addition of two terms is commutative, so
   the result is bit-identical to the host overlap-add;
3. fetches exactly the final samples (plus bounded padding) once per chunk.

Device->host traffic becomes ~1x the audio bytes and the dispatch count
drops to one per ~2048 frames — this is what makes the TPU path fast through
a high-latency link.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from nvorbis_tpu.synth.device import DeviceSynth, synth_core

# planning machinery lives in the jax-free engine/plan.py (shared with the
# host engine); these re-exports keep the historical import surface
from nvorbis_tpu.engine.plan import (  # noqa: F401
    CAP_PER_SIZE,
    CHUNK_FRAMES,
    L_QUANTUM,
    FramePlan,
    StreamPlanner,
    build_segments,
    pad_quantum,
    peek_mode_index,
    plan_window,
    round_up as _round_up,
)


@functools.lru_cache(maxsize=64)
def _bulk_program(cfg):
    """Build the fused synthesize + overlap-add program for one chunk shape.

    ``cfg``: (C, L_pad, S_pad, buckets) with buckets a tuple of
    ("d", B_pad, n, coupling) — dense residue input — or
    ("s", B_pad, n, coupling, st, N_pad) — residue symbol input, where
    ``st`` is the residue's plan_static geometry and N_pad the padded flat
    id count (see synth/residue_sym.py).

    The overlap-add is *gather*-formulated (XLA TPU scatters with duplicate
    indices serialize; gathers do not): the host planner tiles the output
    range into contiguous segments, each owned by one frame's consumed
    window and lapped by at most the previous frame's tail
    (``NVorbis/StreamDecoder.cs:532-541`` semantics), so

        out[p] = rows[prim[f] + t] + (t < sec_len[f]) * rows[sec[f] + t]

    with ``f = searchsorted(segE, p) - 1`` and ``t = p - segE[f]``.

    Takes, per bucket: residue, ys, used, has_floor, window_index, xs,
    windows, basis, sl; then segE [S_pad+1], prim [S_pad] (flat element
    index of the segment's first primary sample), sec [S_pad], sec_len
    [S_pad].  Output: raw (unclipped) samples ``[L_pad, C]``.
    """
    C, L_pad, S_pad, buckets = cfg[:4]
    n_max = max(b[2] for b in buckets)

    def fn(*flat):
        from nvorbis_tpu.synth.residue_sym import reconstruct_spectrum

        i = 0
        all_rows = []
        for b in buckets:
            if b[0] == "s":
                _, B, n, coupling, st, _npad = b
                (classes, ids_flat, frame_base, ys, used, has_floor,
                 window_index, xs, windows, basis, sl,
                 g_t, pr_t, mg_t) = flat[i : i + 14]
                i += 14
                # classes travel as uint8 (4x fewer upload bytes through a
                # bandwidth-capped link); widen on device
                residue = reconstruct_spectrum(
                    classes.astype(jnp.int32), ids_flat, frame_base,
                    (g_t, pr_t, mg_t), st, C,
                )
            else:
                _, B, n, coupling = b
                (residue, ys, used, has_floor, window_index, xs, windows,
                 basis, sl) = flat[i : i + 9]
                i += 9
            pcm = synth_core(
                residue, ys, used, has_floor, window_index, xs, windows,
                basis, coupling, sl=sl,
            )  # [B, C, n]
            pcm = pcm.transpose(0, 2, 1)  # [B, n, C]
            if n < n_max:
                pcm = jnp.pad(pcm, [(0, 0), (0, n_max - n), (0, 0)])
            all_rows.append(pcm)
        segE, prim, sec, sec_len = flat[i : i + 4]

        rows = jnp.concatenate(all_rows, axis=0).reshape(-1, C)
        nrows = rows.shape[0]

        p = jax.lax.broadcasted_iota(jnp.int32, (L_pad,), 0)
        f = jnp.clip(jnp.searchsorted(segE, p, side="right") - 1, 0, S_pad - 1)
        t = p - jnp.take(segE, f)
        i1 = jnp.clip(jnp.take(prim, f) + t, 0, nrows - 1)
        a = jnp.take(rows, i1, axis=0)
        live2 = t < jnp.take(sec_len, f)
        i2 = jnp.clip(jnp.take(sec, f) + t, 0, nrows - 1)
        b = jnp.where(live2[:, None], jnp.take(rows, i2, axis=0), 0.0)
        out = a + b
        if len(cfg) > 4 and cfg[4]:
            # int16 transport quantization fused (NVT_FETCH_INT16); the
            # stream decoder's clip pass runs after dequantization, and
            # quantization's own clip(-1,1) subsumes it numerically
            out = jnp.round(
                jnp.clip(out, -1.0, 1.0) * 32767.0
            ).astype(jnp.int16)
        return out

    return jax.jit(fn)


class BulkDecoder:
    """Chunked whole-stream decoder over the native host plane."""

    def __init__(self, decoder, native):
        self._dec = decoder
        self._native = native
        self._synths = {}
        self._last_plan = None
        # residue symbol mode: ship classes+ids, rebuild spectra on device
        self._sym = getattr(native, "sym_plans", None) is not None
        self._plan_tabs = {}
        # tunnel-relay environments run device work in a respawnable child
        # (wedge survival at device speed; engine/device_worker.py)
        from nvorbis_tpu.engine.device_worker import worker_mode_enabled

        self._use_worker = worker_mode_enabled()
        self._worker = None
        self._mode_tbl = {}  # id(mode) -> list of ("t", key, i) refs

    def _worker_refs(self, mode, synth, plan=None):
        """Register (once) and return this mode's table refs for the
        worker child: [xs, windows, basis, sl] (+5 residue plan tables)."""
        refs = self._mode_tbl.get(id(mode))
        if refs is None:
            from nvorbis_tpu.engine.device_worker import (
                get_worker, next_table_key,
            )

            if self._worker is None:
                self._worker = get_worker()
            arrs = [synth._xs, synth._windows, synth._basis, synth._sl]
            if plan is not None:
                arrs += [plan.groups_np, plan.pair_np, plan.vq_mega_np]
            tkey = next_table_key()
            self._worker.register_tables(tkey, arrs)
            refs = [("t", tkey, i) for i in range(len(arrs))]
            self._mode_tbl[id(mode)] = refs
        return refs

    def _tabs_for(self, plan):
        t = self._plan_tabs.get(id(plan))
        if t is None:
            from nvorbis_tpu.synth.residue_sym import plan_tables_dev

            t = plan_tables_dev(plan)
            self._plan_tabs[id(plan)] = t
        return t

    def _synth_for(self, mode):
        s = self._synths.get(id(mode))
        if s is None:
            s = DeviceSynth(
                self._dec._setup, mode, max_posts=self._dec._max_posts
            )
            self._synths[id(mode)] = s
        return s

    def run(self):
        """Decode the remainder of the stream; returns interleaved float32
        (unclipped) or None when the bulk path cannot be used."""
        from concurrent.futures import ThreadPoolExecutor

        # function-level import: fast_packets imports this module
        from nvorbis_tpu.ogg.fast_packets import (
            PacketTableCursor, plan_job_arr, table_for_decoder,
        )

        dec = self._dec
        setup = dec._setup
        planner = StreamPlanner(dec._current_position)
        out_chunks = []
        # one fetch worker: device->host transfers overlap the next chunk's
        # host unpack + upload (see parallel/batch.py for the same pattern;
        # on by default — measured faster even through the tunnel relay —
        # NVT_FETCH_OVERLAP=0 serializes for relays where a concurrent
        # upload stalls fetches, utils.fetch.overlap_fetches)
        from nvorbis_tpu.utils.fetch import (
            block_ready, overlap_fetches, ready_on_main,
        )

        overlap = overlap_fetches()
        pool = ThreadPoolExecutor(max_workers=1)

        carry = None  # (rows dict, meta row, plan) of last good frame
        mfb = setup.mode_field_bits
        n_modes = len(setup.modes)

        # packet-table fast lane: one C++ packetization pass, vectorized
        # window pulls + plans; any anomaly keeps the Python provider
        cursor = None
        table = table_for_decoder(dec)
        if table is not None:
            cursor = PacketTableCursor(table)
        w_max = max(len(m.overlaps) for m in setup.modes)
        ov_tab = np.zeros((n_modes, w_max, 3), dtype=np.int64)
        blk_tab = np.zeros(n_modes, dtype=np.int64)
        for mi, m in enumerate(setup.modes):
            blk_tab[mi] = m.block_size
            for wi, svt in enumerate(m.overlaps):
                ov_tab[mi, wi] = svt

        provider_done = False
        while not provider_done:
            from nvorbis_tpu.utils.profiling import span

            if cursor is not None:
                size_counts = {}
                job = cursor.pull(
                    setup, blk_tab, CHUNK_FRAMES, size_counts, CAP_PER_SIZE
                )
                provider_done = cursor.done
                if job is None:
                    break
                with span("bulk.unpack"):
                    if self._sym:
                        classes, ids, ys, used, has_floor, meta = (
                            self._native.unpack_sym_view(*job["view"])
                        )
                        residue = (classes, ids)
                    else:
                        residue, ys, used, has_floor, meta = (
                            self._native.unpack_view(*job["view"])
                        )
                used = used.astype(bool)
                has_floor = has_floor.astype(bool)
                pa, plans, self._last_plan = plan_job_arr(
                    planner, ov_tab, blk_tab, setup, meta, job,
                    dec._stats, self._last_plan,
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
                        n = setup.modes[mi].block_size
                        size_counts[n] = size_counts.get(n, 0) + 1
                        if size_counts[n] >= CAP_PER_SIZE:
                            break
                if not packets:
                    break

                with span("bulk.unpack"):
                    if self._sym:
                        classes, ids, ys, used, has_floor, meta = (
                            self._native.unpack_sym(raw)
                        )
                        residue = (classes, ids)
                    else:
                        residue, ys, used, has_floor, meta = (
                            self._native.unpack(raw)
                        )
                used = used.astype(bool)
                has_floor = has_floor.astype(bool)

                job = {
                    "n": len(packets),
                    "granules": [p.granule_position for p in packets],
                    "eos": [p.is_end_of_stream for p in packets],
                    "resync": [p.is_resync for p in packets],
                    "ovh_bits": [p.container_overhead_bits for p in packets],
                }
                pa, plans, self._last_plan = plan_job_arr(
                    planner, ov_tab, blk_tab, setup, meta, job,
                    dec._stats, self._last_plan,
                )
                for p in packets:
                    p.done()

            chunk_base = out_chunks[-1][1] if out_chunks else 0
            with span("bulk.dispatch"):
                finish = self._dispatch_chunk(
                    residue, ys, used, has_floor, meta, pa, carry,
                    chunk_base, planner.emitted,
                )

            def _run(f=finish):
                with span("bulk.fetch"):
                    return f() if callable(f) else f

            if overlap:
                dev_out = getattr(finish, "device_out", None)
                if dev_out is not None and ready_on_main():
                    # see parallel/batch.py _ready_on_main: keep the fetch
                    # worker's transfer as the only relay traffic
                    with span("bulk.ready"):
                        block_ready(dev_out)
                out_chunks.append((pool.submit(_run), planner.emitted))
                # bound in-flight fetches to two chunks
                if len(out_chunks) > 2:
                    out_chunks[-3] = (
                        out_chunks[-3][0].result()
                        if hasattr(out_chunks[-3][0], "result")
                        else out_chunks[-3][0],
                        out_chunks[-3][1],
                    )
            else:
                # tunnel relay: serialize relay use — an overlapped fetch
                # is stalled by the next chunk's uploads (see
                # utils.fetch.overlap_fetches)
                out_chunks.append((_run(), planner.emitted))

            # carry the last good frame into the next chunk (its tail may
            # still lap into samples emitted there)
            good = np.flatnonzero(pa[:, 0])
            last_good = int(good[-1]) if len(good) else None
            if last_good is not None:
                crow = {
                    "ys": ys[last_good].copy(),
                    "used": used[last_good].copy(),
                    "has_floor": has_floor[last_good].copy(),
                    "meta": meta[last_good].copy(),
                }
                if self._sym:
                    crow["classes"] = residue[0][last_good].copy()
                    crow["ids"] = (
                        residue[1][last_good, : meta[last_good, 5]].copy()
                    )
                else:
                    crow["residue"] = residue[last_good].copy()
                # the vectorized plan path boxes only the window's final
                # plan — with every frame good, the last good row IS it
                carry = (crow, plans[last_good] if plans is not None
                         else self._last_plan)

        dec._eos_found = True
        dec._prev_buf = None
        dec._prev_start = dec._prev_end = dec._prev_stop = 0
        dec._current_position = planner.stream_pos0 + planner.emitted
        dec._has_position = planner.has_position

        try:
            if not out_chunks:
                return np.zeros(0, dtype=np.float32)
            return np.concatenate([
                c[0].result() if hasattr(c[0], "result") else c[0]
                for c in out_chunks
            ])
        finally:
            pool.shutdown(wait=False)
            if self._worker is not None and self._mode_tbl:
                # release this decode's device-resident tables in the
                # worker child (every chunk referencing them has resolved
                # or been abandoned by now); without this a long-lived
                # process decoding many files accumulated tables in child
                # HBM and tbl-*.bin files in the RAM-backed spool forever
                for refs in self._mode_tbl.values():
                    self._worker.drop_tables(refs[0][1])
                self._mode_tbl.clear()

    def _dispatch_chunk(self, residue, ys, used, has_floor, meta, pa,
                        carry, chunk_base, chunk_end):
        """Synthesize + overlap-add one chunk on device; returns a callable
        resolving to the interleaved samples of [chunk_base, chunk_end).

        ``pa``: the window's ``[nF, 5]`` int64 lapping-plan columns
        (ok, pos_base, start, valid, total) from :func:`plan_job_arr` —
        bucketing, flat-row assignment and the segment table are all
        whole-array ops (per-frame Python loops here were the dominant
        residual host cost; see parallel/batch.py for the same shape)."""
        dec = self._dec
        setup = dec._setup
        C = setup.channels

        L_real = max(0, chunk_end - chunk_base)
        if L_real == 0:
            return np.zeros(0, dtype=np.float32)
        # program shape quantized (engine/plan.pad_quantum: few distinct
        # compiles, <=25% padded rows); the fetch slices down to an
        # L_QUANTUM multiple on device so the padding is never transferred
        L_pad = pad_quantum(L_real, L_QUANTUM)

        # bucket rows by mode
        nF = pa.shape[0]
        ok = pa[:, 0] == 1
        mode_r = meta[:nF, 1].astype(np.int64)
        buckets = {
            int(m): np.flatnonzero(ok & (mode_r == m))
            for m in np.unique(mode_r[ok])
        } if ok.any() else {}

        # prepend the carry frame to its mode's bucket
        carry_extra = {}
        if carry is not None:
            c_mode = int(carry[0]["meta"][1])
            carry_extra[c_mode] = carry

        cfg_buckets = []
        args = []
        rof = np.full(nF, -1, dtype=np.int64)  # packet row -> flat row
        carry_row = None
        n_max = 0
        row_base = 0
        mode_ids = sorted(set(list(buckets) + list(carry_extra)))
        for mode_idx in mode_ids:
            ridx = buckets.get(mode_idx, np.zeros(0, dtype=np.int64))
            mode = setup.modes[mode_idx]
            synth = self._synth_for(mode)
            n2, n = synth.n2, synth.n
            n_max = max(n_max, n)
            extra = 1 if mode_idx in carry_extra else 0
            B = len(ridx) + extra
            B_pad = synth._bucket(B)

            ys_b = np.zeros((B_pad, C, ys.shape[2]), dtype=np.int16)
            used_b = np.zeros((B_pad, C, used.shape[2]), dtype=bool)
            hf_b = np.zeros((B_pad, C), dtype=bool)
            widx_b = np.zeros(B_pad, dtype=np.int32)

            if self._sym:
                from nvorbis_tpu.synth.residue_sym import (
                    CLASS_SENTINEL, flatten_ids, plan_static, round_ids,
                )

                res_cfg = setup.residues[mode.mapping.submap_residue[0]]
                plan = self._native.sym_plans[id(res_cfg)]
                st = plan_static(plan, n)
                n_part, chr_c = st.n_part, st.chr_count
                cls_b = np.full((B_pad, chr_c, max(1, n_part)),
                                CLASS_SENTINEL, dtype=np.uint8)
                base_b = np.zeros(B_pad, dtype=np.int32)
                id_parts = []
                pos = 0
                classes_w, ids_w = residue  # window outputs
            else:
                res_b = np.zeros((B_pad, C, n2), dtype=np.float32)

            j = 0
            if extra:
                crow, _ = carry_extra[mode_idx]
                if self._sym:
                    cls_b[0, :, :n_part] = crow["classes"][:chr_c, :n_part]
                    base_b[0] = pos
                    id_parts.append(crow["ids"])
                    pos += len(crow["ids"])
                else:
                    res_b[0] = crow["residue"][:, :n2]
                ys_b[0] = crow["ys"]
                used_b[0] = crow["used"]
                hf_b[0] = crow["has_floor"]
                widx_b[0] = crow["meta"][2]
                carry_row = row_base
                j = 1
            # bulk-gather frame rows (fancy indexing beats a per-frame loop)
            if len(ridx):
                R = len(ridx)
                dst = slice(j, j + R)
                ys_b[dst] = ys[ridx]
                used_b[dst] = used[ridx]
                hf_b[dst] = has_floor[ridx]
                widx_b[dst] = meta[ridx, 2]
                if self._sym:
                    cls_b[dst, :, :n_part] = (
                        classes_w[ridx][:, :chr_c, :n_part]
                    )
                    flat_rows, base_rows = flatten_ids(
                        ids_w[ridx], meta[ridx, 5]
                    )
                    base_b[dst] = pos + base_rows
                    id_parts.append(flat_rows)
                    pos += len(flat_rows)
                else:
                    res_b[dst] = residue[ridx][:, :, :n2]
                rof[ridx] = row_base + j + np.arange(R)
                j += R

            wrap = ((lambda a: ("a", a)) if self._use_worker
                    else jnp.asarray)
            if self._sym:
                N_pad = round_ids(pos)
                flat = np.full(N_pad, -1, dtype=np.int16)
                if pos:
                    flat[:pos] = np.concatenate(id_parts).astype(np.int16)
                cfg_buckets.append(
                    ("s", B_pad, n, synth.coupling_steps, st, N_pad)
                )
                if self._use_worker:
                    tab_refs = self._worker_refs(mode, synth, plan)
                else:
                    tab_refs = [synth._xs_dev, synth._windows_dev,
                                synth._basis_dev, synth._sl_dev,
                                *self._tabs_for(plan)]
                args.extend([
                    wrap(cls_b), wrap(flat), wrap(base_b),
                    wrap(ys_b), wrap(used_b), wrap(hf_b), wrap(widx_b),
                    tab_refs[0], tab_refs[1], tab_refs[2], tab_refs[3],
                    *tab_refs[4:],
                ])
            else:
                cfg_buckets.append(("d", B_pad, n, synth.coupling_steps))
                if self._use_worker:
                    tab_refs = self._worker_refs(mode, synth)
                else:
                    tab_refs = [synth._xs_dev, synth._windows_dev,
                                synth._basis_dev, synth._sl_dev]
                args.extend([
                    wrap(res_b), wrap(ys_b), wrap(used_b),
                    wrap(hf_b), wrap(widx_b),
                    tab_refs[0], tab_refs[1], tab_refs[2], tab_refs[3],
                ])
            row_base += B_pad

        # --- segment table: contiguous tiling of [0, L_real) --------------
        # (shared formulation: engine/plan.build_segments — also consumed by
        # the host engine's numpy overlap-add, engine/host.py)
        prev_plan = carry[1] if carry is not None else None
        c_s, c_prim, c_sec, c_sl = build_segments(
            pa, rof, n_max, prev_plan, carry_row, chunk_base
        )

        n_segs = len(c_s)
        S_pad = _round_up(max(1, n_segs), 256)
        segE = np.full(S_pad + 1, np.int32(L_pad + 1))
        prim = np.zeros(S_pad, dtype=np.int32)
        sec = np.zeros(S_pad, dtype=np.int32)
        sec_len = np.zeros(S_pad, dtype=np.int32)
        segE[:n_segs] = c_s
        prim[:n_segs] = c_prim
        sec[:n_segs] = c_sec
        sec_len[:n_segs] = c_sl
        # keep segE sorted for the padded tail
        segE[n_segs:] = L_pad + 1 + np.arange(n_segs, S_pad + 1,
                                              dtype=np.int32)
        wrap = (lambda a: ("a", a)) if self._use_worker else jnp.asarray
        args.extend([wrap(segE), wrap(prim), wrap(sec), wrap(sec_len)])
        from nvorbis_tpu.utils.fetch import int16_transport_enabled

        i16 = int16_transport_enabled()
        cfg = (C, L_pad, S_pad, tuple(cfg_buckets), i16)
        # device-side slice to the fetch quantum: per-L_real shapes would
        # each compile, but L_QUANTUM multiples repeat across chunks
        L_fetch = min(L_pad, _round_up(L_real, L_QUANTUM))

        if self._use_worker:
            if self._worker is None:
                from nvorbis_tpu.engine.device_worker import get_worker

                self._worker = get_worker()
            seq = self._worker.submit(
                "bulk", cfg, args, L_fetch, L_fetch * C * (2 if i16 else 4)
            )

            def finish():
                from nvorbis_tpu.utils.fetch import dequantize_i16

                host = self._worker.result(seq)
                if i16:
                    host = dequantize_i16(host)
                return host[:L_real].reshape(-1)

            finish.device_out = None
            return finish

        fn = _bulk_program(cfg)
        out = fn(*args)

        # async chunked fetch: the device->host copy of this chunk overlaps
        # the host unpack + dispatch of the next one
        from nvorbis_tpu.utils.fetch import fetch_pcm

        out_f = out[:L_fetch] if L_fetch != L_pad else out

        def finish():
            return fetch_pcm(out_f, quantized=i16)[:L_real].reshape(-1)

        finish.device_out = out_f
        return finish
