"""Lapping-plan machinery shared by every bulk decode plane (jax-free).

The reference's read loop (``NVorbis/StreamDecoder.cs:417-541``) interleaves
packet decode with overlap-add state: first-packet discard, failed-packet
tail drain, granule position pickup, end-of-stream trim.  For whole-stream
decodes that state machine is *static dataflow* once per-frame metadata is
known, so this module hosts the int-only planner and the segment-table
formulation consumed by

- the device bulk plane (``engine/bulk.py``) — fused XLA synthesize +
  gather overlap-add programs;
- the multi-stream batch plane (``parallel/batch.py``);
- the host engine (``engine/host.py``) — C++ unpack + numpy synthesis +
  host overlap-add, no jax import anywhere in its graph.

This module MUST NOT import jax (directly or transitively): the host
engine's contract is that a decode can run with jax entirely unimportable
(see tests/test_host_engine.py), which is what makes the relay-down
``engine="auto"`` fallback provably hang-free.
"""

import os

import numpy as np


def _env_pow2(name: str, default: int) -> int:
    """Env-tunable size rounded DOWN to a power of two (the padded bucket
    shapes — and therefore the compiled-program cache — only repeat across
    chunks for power-of-two caps); malformed values fall back to the
    default instead of raising at import."""
    v = os.environ.get(name, "")
    try:
        n = int(v) if v else default
    except ValueError:
        return default
    if n < 1:
        return default
    return 1 << (n.bit_length() - 1)


CHUNK_FRAMES = _env_pow2("NVT_CHUNK_FRAMES", 4096)
# per-block-size collection cap: full chunks then hold exactly this many
# frames of the dominant size, so their padded bucket shapes — and
# therefore the compiled program — repeat across chunks
CAP_PER_SIZE = _env_pow2("NVT_CAP_PER_SIZE", max(1, CHUNK_FRAMES // 2))
L_QUANTUM = 65536


def round_up(x, q):
    return -(-x // q) * q


def pad_quantum(b: int, lo: int = 16) -> int:
    """Padded-extent quantum for compiled device-program shapes: the
    {1, 1.25, 1.5, 1.75} x pow2 grid.

    Pure next-pow2 wastes up to 2x of every gather/matmul row in the chunk
    program (measured on-chip 2026-08-18: a 2,100-frame long bucket padded
    to 4,096 and a 2.2M-sample OLA padded to 4.2M were the two biggest
    terms of the 1.4 s/chunk device wall).  Two mantissa bits cap the
    waste at 25% (mean ~12%) for at most 4x the compiled-shape variants —
    and a steady decode re-uses one or two shapes, so the variant count
    stays trivially small in practice.  ``NVT_PAD_POW2=1`` reverts to the
    pure pow2 grid (A/B twin)."""
    if b <= lo:
        return lo
    p = lo
    while p < b:
        p <<= 1
    if p == lo or os.environ.get("NVT_PAD_POW2"):
        return p
    half = p >> 1  # b is in (half, p]
    for frac in (5, 6, 7):
        q = (half * frac) >> 2
        if b <= q:
            return q
    return p


def peek_mode_index(data: bytes, mode_field_bits: int):
    """Read an audio packet's mode number from its first bits (type bit 0 +
    mode field, LSB-first) without a full unpack; None for non-audio/empty
    packets.  Used to count frames per block size while collecting chunks."""
    if not data or (data[0] & 1):
        return None
    head = int.from_bytes(data[:3], "little")
    return (head >> 1) & ((1 << mode_field_bits) - 1)


class FramePlan:
    """Per-packet lapping plan entry (ints only)."""

    __slots__ = ("ok", "pos_base", "start", "valid", "total", "samples")

    def __init__(self, ok, pos_base=0, start=0, valid=0, total=0, samples=0):
        self.ok = ok
        self.pos_base = pos_base  # scatter index of the frame's sample 0
        self.start = start
        self.valid = valid
        self.total = total
        self.samples = samples  # consumed contribution (for stats)


class StreamPlanner:
    """Incremental replication of the reference read-loop lapping state.

    Feed packets in order via :meth:`add`; consult ``emitted`` (total
    consumed samples, in scatter coordinates) and ``stream_pos0`` (stream
    sample position of scatter coordinate 0).
    """

    def __init__(self, start_position=0):
        self.emitted = 0          # scatter coord of the next consumed sample
        self.stream_pos0 = start_position
        self.has_position = False
        self.prev = None          # (A, start, valid, total) of previous frame
        self.prev_drained = False
        self.first = True
        self.eos_found = False

    def add(self, ok, start, valid, total, granule, is_eos, is_resync,
            block_size=None, prev_plan=None):
        """Returns a FramePlan for this packet.

        ``prev_plan``: the previous good frame's plan — its scatterable tail
        is clamped to this frame's block capacity (mirrors the reference's
        fixed-size scratch discard of overlap spill on malformed
        window-flag transitions)."""
        if is_resync:
            self.has_position = False
        if is_eos:
            self.eos_found = True
        if not ok:
            # failed packet: drain the previous frame's tail
            # (StreamDecoder.cs:352-356 via _prev_end = _prev_stop)
            if self.prev is not None and not self.prev_drained:
                A, p_start, p_valid, p_total = self.prev
                self.emitted = A + (p_total - p_start)
                self.prev_drained = True
            return FramePlan(False)

        if self.prev is None:
            # very first frame: all of it is lapping lead-in
            # (StreamDecoder.cs:448-451); consumed region starts empty
            A = -(valid - start)
            samples = 0
        elif self.prev_drained:
            p_A, p_start, p_valid, p_total = self.prev
            A = p_A + (p_total - p_start)
            samples = valid - start
        else:
            p_A, p_start, p_valid, p_total = self.prev
            A = p_A + (p_valid - p_start)
            samples = valid - start

        # end-of-stream trim to the final granule (StreamDecoder.cs:428-437).
        # NB: the reference trims with the *pre-pickup* position (the pickup
        # below runs after the packet is lapped, StreamDecoder.cs:358-363)
        if granule is not None and is_eos:
            actual_end = self.stream_pos0 + self.emitted + samples
            diff = granule - actual_end
            if diff < 0:
                valid += diff
                samples += diff

        # granule position pickup (StreamDecoder.cs:358-363, 480-484)
        if granule is not None and not self.has_position:
            self.has_position = True
            buffered = self.emitted
            self.stream_pos0 = granule - samples - buffered

        if prev_plan is not None and not self.prev_drained and self.prev is not None:
            # clamp the previous frame's lapped tail to this block's room and
            # to this frame's consumed span.  For spec-valid streams the tail
            # always equals the next frame's overlap half, so this is a
            # no-op; on malformed window-flag sequences it drops the spill
            # the reference writes into (and re-laps from) scratch beyond the
            # consumed range — garbage either way
            room = (block_size if block_size is not None else total) - start
            prev_plan.total = min(
                prev_plan.total,
                prev_plan.valid + max(0, min(room, valid - start)),
            )

        plan = FramePlan(True, A, start, valid, total, samples)
        self.prev = (A, start, valid, total)
        self.prev_drained = False
        self.first = False
        self.emitted = A + (valid - start)
        return plan


def plan_window(planner, start, valid, total, gran, has_gran, eos, blocks):
    """Vectorized :meth:`StreamPlanner.add` over one all-good window.

    Preconditions (caller guarantees ok=True and no resync for every
    packet; this function checks the rest): planner not mid-drain, eos
    only at the window's last packet, and the previous-frame tail clamp a
    no-op everywhere.  Returns ``(pa, samples, last_plan)`` — ``pa`` the
    ``[n, 5]`` int64 (ok, pos_base, start, valid, total) column view —
    boxing only the final FramePlan (the carry object the next window's
    sequential path may clamp in place); per-frame object creation is
    pure overhead for the array-consuming dispatchers.  Returns None when
    a precondition fails — the caller then replays the window through the
    sequential ``add`` loop, which owns every edge case.

    All arithmetic mirrors ``add`` exactly: A is the cumulative sum of
    consumed spans, the end-trim uses the pre-pickup position, and the
    granule pickup fires at the first granule-bearing packet.
    """
    n = len(start)
    if n == 0:
        return np.zeros((0, 5), dtype=np.int64), np.zeros(0, np.int64), None
    if planner.prev_drained and planner.prev is not None:
        return None
    if eos[:-1].any() if n > 1 else False:
        return None

    start = start.astype(np.int64)
    valid = valid.astype(np.int64)
    total = total.astype(np.int64)
    vs = valid - start

    if planner.prev is None:
        A0 = -int(vs[0])
        samples0 = 0
        p_valid0 = p_total0 = None
    else:
        pA, ps, pv, pt = planner.prev
        A0 = pA + (pv - ps)
        samples0 = int(vs[0])
        p_valid0, p_total0 = pv, pt

    # previous-tail clamp must be a no-op (spec-valid window sequences):
    # prev.total <= prev.valid + max(0, min(block - start, valid - start))
    room_cap = np.maximum(0, np.minimum(blocks - start, vs))
    if p_total0 is not None and p_total0 > p_valid0 + int(room_cap[0]):
        return None
    if n > 1 and (total[:-1] > valid[:-1] + room_cap[1:]).any():
        return None

    A = np.empty(n, dtype=np.int64)
    A[0] = A0
    if n > 1:
        np.cumsum(vs[:-1], out=A[1:])
        A[1:] += A0
    samples = vs.copy()
    samples[0] = samples0

    # granule-pickup index: in the sequential path a pickup at packet k
    # adjusts stream_pos0 BEFORE the final packet's trim when k < n-1; at
    # k == n-1 the trim runs first (pre-pickup, the reference's order —
    # StreamDecoder.cs:358-363 vs 428-437)
    pk = None
    pk_buffered = 0
    if not planner.has_position:
        idx = np.flatnonzero(has_gran)
        if len(idx):
            pk = int(idx[0])
            # buffered count the sequential add() reads at pickup time
            # (self.emitted BEFORE the packet): A[pk] for pk >= 1, but the
            # window-entry emitted for pk == 0 — on a fresh stream
            # emitted is 0 while A[0] is -vs[0] (the lead-in), and using
            # A[0] over-trims the EOS by exactly vs[0]
            pk_buffered = int(A[pk]) if pk else planner.emitted

    # end-trim at the final packet (granule + eos), pre-pickup position
    trim_valid = int(valid[n - 1])
    if eos[n - 1] and has_gran[n - 1]:
        if planner.has_position or pk == n - 1 or pk is None:
            # position known, or the trim packet IS the pickup packet
            # (trim uses the pre-pickup default — single-window small
            # files land here; falling back to the sequential loop for
            # them cost ~25 python add() calls per 1test decode)
            pos0_eff = planner.stream_pos0
        else:
            pos0_eff = int(gran[pk]) - int(samples[pk]) - pk_buffered
        actual_end = pos0_eff + int(A[n - 1]) + int(samples[n - 1])
        diff = int(gran[n - 1]) - actual_end
        if diff < 0:
            # the no-op-clamp precondition above used the PRE-trim span;
            # if the trimmed final span is now shorter than the previous
            # frame's lapped tail, the sequential path clamps that tail
            # (add(): prev_plan.total <- fit the post-trim room; OLA
            # otherwise gets a secondary overlap longer than the final
            # segment).  When the previous frame is INSIDE this window
            # the clamp is just total[n-2] — done in-array (single-window
            # small files end here every decode); only a previous-window
            # boxed plan (n == 1) still needs the sequential path's
            # in-place object mutation
            trimmed_vs = int(vs[n - 1]) + diff
            room_t = max(0, min(int(blocks[n - 1] - start[n - 1]),
                                trimmed_vs))
            if n > 1:
                if int(total[n - 2]) > int(valid[n - 2]) + room_t:
                    total = total.copy()
                    total[n - 2] = int(valid[n - 2]) + room_t
            elif p_total0 is not None and p_total0 > p_valid0 + room_t:
                return None
            trim_valid += diff
            samples[n - 1] += diff
            valid = valid.copy()
            valid[n - 1] = trim_valid

    # granule position pickup at the first granule-bearing packet (pk
    # computed above; at pk == n-1 this reads the POST-trim samples, the
    # sequential order)
    if pk is not None:
        planner.has_position = True
        planner.stream_pos0 = (
            int(gran[pk]) - int(samples[pk]) - pk_buffered
        )

    planner.prev = (int(A[n - 1]), int(start[n - 1]), int(valid[n - 1]),
                    int(total[n - 1]))
    planner.prev_drained = False
    planner.first = False
    planner.eos_found |= bool(eos[n - 1])
    planner.emitted = int(A[n - 1]) + int(valid[n - 1]) - int(start[n - 1])
    pa = np.empty((n, 5), dtype=np.int64)
    pa[:, 0] = 1
    pa[:, 1] = A
    pa[:, 2] = start
    pa[:, 3] = valid
    pa[:, 4] = total
    last_plan = FramePlan(True, int(A[n - 1]), int(start[n - 1]),
                          int(valid[n - 1]), int(total[n - 1]),
                          int(samples[n - 1]))
    return pa, samples, last_plan


def _build_segments_native(pa, rof, n_max, prev_plan, carry_row,
                           chunk_base):
    """C++ :func:`build_segments` (nvt_build_segments): the scalar walk
    in one call.  Used only for all-good windows (the numpy fast path's
    own condition — it carries a defensive ``min(sl, length)`` clamp the
    bad-frame scalar walk deliberately omits); returns None to fall
    back."""
    from nvorbis_tpu.native import load as _load

    lib = _load()
    nF = pa.shape[0]
    if lib is None or not nF or not bool((pa[:, 0] == 1).all()):
        return None
    if not (pa.flags.c_contiguous and rof.flags.c_contiguous):
        return None
    prev = np.empty(5, dtype=np.int64)
    has_prev = prev_plan is not None
    if has_prev:
        prev[0] = prev_plan.pos_base
        prev[1] = prev_plan.start
        prev[2] = prev_plan.valid
        prev[3] = prev_plan.total
        prev[4] = carry_row
    out = np.empty((4, nF + 1), dtype=np.int64)
    k = lib.nvt_build_segments(
        nF, pa.ctypes.data, rof.ctypes.data, n_max,
        1 if has_prev else 0, prev.ctypes.data, chunk_base,
        out[0].ctypes.data, out[1].ctypes.data, out[2].ctypes.data,
        out[3].ctypes.data,
    )
    return out[0, :k], out[1, :k], out[2, :k], out[3, :k]


def build_segments(pa, rof, n_max, prev_plan, carry_row, chunk_base):
    """Tile one chunk's output range into lapped segments.

    Every consumer of the chunk planes reconstructs the reference's
    overlap-add (``NVorbis/StreamDecoder.cs:532-541``) as a contiguous
    tiling of ``[0, chunk_len)``: each good frame contributes its consumed
    span ``[start, valid)`` lapped by at most the previous frame's tail;
    a failed packet drains the previous tail as its own segment
    (StreamDecoder.cs:352-356 silence-drain semantics).

    ``pa``: ``[nF, 5]`` int64 plan columns (ok, pos_base, start, valid,
    total).  ``rof``: packet row -> flat synthesis row (-1 when absent).
    ``n_max``: row stride of the flat synthesis coordinate space.
    ``prev_plan`` / ``carry_row``: the previous chunk's final good frame
    and its flat row.  Returns ``(s, prim, sec, sec_len)`` int64 arrays:
    segment output starts (chunk-relative, clipped to >= 0), primary and
    secondary flat element indices (``row * n_max + offset``), and the
    lapped secondary length (0 = no secondary).
    """
    nF = pa.shape[0]
    res = _build_segments_native(pa, rof, n_max, prev_plan, carry_row,
                                 chunk_base)
    if res is not None:
        return res
    ok = pa[:, 0] == 1
    if ok.all() and nF:
        # fast path: every frame laps its predecessor (the carry frame
        # for the first row)
        A_c = pa[:, 1]
        st_c = pa[:, 2]
        v_c = pa[:, 3]
        t_c = pa[:, 4]
        s_ = A_c - chunk_base
        length = v_c - st_c
        prim_ = rof * n_max + st_c
        sec_ = np.zeros(nF, dtype=np.int64)
        sl_ = np.zeros(nF, dtype=np.int64)
        sl_[1:] = t_c[:-1] - v_c[:-1]
        sec_[1:] = rof[:-1] * n_max + v_c[:-1]
        if prev_plan is not None:
            sl_[0] = prev_plan.total - prev_plan.valid
            sec_[0] = carry_row * n_max + prev_plan.valid
        # clip lead-in segments (carry frame spans the chunk boundary;
        # the stream's first-ever frame plans s<0)
        d = np.maximum(0, -s_)
        if d.any():
            s_ = s_ + d
            length = length - d
            prim_ = prim_ + d
            sec_ = sec_ + d
            sl_ = np.maximum(0, sl_ - d)
        # defensive: a secondary overlap can never exceed its segment (the
        # planner guarantees this for spec-valid streams and falls back to
        # the sequential clamp otherwise, but the OLA kernels write sl
        # samples unconditionally — keep the invariant local)
        np.minimum(sl_, length, out=sl_)
        keep = length > 0
        return s_[keep], prim_[keep], sec_[keep], sl_[keep]

    # scalar walk: bad frames drain the previous tail once
    if prev_plan is not None:
        p_pos, p_start = prev_plan.pos_base, prev_plan.start
        p_valid, p_total = prev_plan.valid, prev_plan.total
        p_row = carry_row
        drained = False
    else:
        p_pos = p_start = p_valid = p_total = p_row = 0
        drained = True
    segs = []
    for i in range(nF):
        if not pa[i, 0]:
            if not drained:
                s = p_pos + (p_valid - p_start) - chunk_base
                segs.append((s, p_total - p_valid,
                             p_row * n_max + p_valid, 0, 0))
                drained = True
            continue
        s = pa[i, 1] - chunk_base
        length = pa[i, 3] - pa[i, 2]
        sec_flat = sec_len_ = 0
        if not drained:
            sec_len_ = p_total - p_valid
            sec_flat = p_row * n_max + p_valid
        segs.append((s, length, rof[i] * n_max + pa[i, 2],
                     sec_flat, sec_len_))
        p_pos, p_start = pa[i, 1], pa[i, 2]
        p_valid, p_total = pa[i, 3], pa[i, 4]
        p_row = rof[i]
        drained = False
    clipped = []
    for s, length, pr_, se_, sl2 in segs:
        if s < 0:
            d = -s
            s, length = 0, length - d
            pr_ += d
            se_ += d
            sl2 = max(0, sl2 - d)
        if length > 0:
            clipped.append((s, pr_, se_, sl2))
    c_s = np.array([c[0] for c in clipped], dtype=np.int64)
    c_prim = np.array([c[1] for c in clipped], dtype=np.int64)
    c_sec = np.array([c[2] for c in clipped], dtype=np.int64)
    c_sl = np.array([c[3] for c in clipped], dtype=np.int64)
    return c_s, c_prim, c_sec, c_sl
