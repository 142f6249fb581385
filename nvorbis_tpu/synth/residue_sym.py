"""Device-side residue reconstruction from VQ symbol streams.

The dense host path materializes each frame's spectrum as ``[C, n2]`` float32
on the CPU and ships ~8 KB/frame over the host->device link.  In symbol mode
the C++ host plane instead emits (a) per-partition classification bytes and
(b) the raw codebook entry ids in a canonical (stage, channel,
partition)-major layout (``native/host_decode.cpp`` residue symbol
emission) — ~0.5 KB/frame — and this module rebuilds the spectrum on device
with table gathers:

    value(bin) = sum over stages of VQ[book(class(bin), s)][id(bin, s), elem]

where every index is derived from the uploaded classes/ids plus small static
tables.  Addition order matches the bitstream accumulation order (stage
ascending, one contribution per stage per bin), so results are bit-identical
to the dense path (NVorbis/Residue0.cs:119-201 semantics).

Gating (``plan_for_setup`` returns None otherwise): single-submap mappings,
stage-book entry counts that fit int16, and — for residue types 1/2 — vector
dims dividing the partition size (otherwise vectors overshoot partition
boundaries, which the partition-local addressing cannot express; the dense
path handles those).
"""

from typing import NamedTuple

import numpy as np

CLASS_SENTINEL = 255

# ids arrays are padded to multiples of this so chunk programs re-compile
# only when the symbol volume crosses a large quantum
IDS_QUANTUM = 1 << 17


class ResiduePlan:
    """Static symbol-layout tables for one residue config."""

    __slots__ = (
        "residue_type", "begin", "end", "psize", "S", "n_cls", "channels",
        "groups_np", "pair_np", "vq_mega_np", "stage_widths", "_tabs_dev",
    )

    def __init__(self, residue, channels):
        self.residue_type = residue.residue_type
        self.begin = residue.begin
        self.end = residue.end
        self.psize = residue.partition_size
        self.S = max(1, residue.max_stages)
        self.n_cls = residue.classifications
        self.channels = channels

        psize, S, n_cls = self.psize, self.S, self.n_cls
        groups = np.zeros((256, S), dtype=np.int32)
        # per-(cls, stage) ROW table, gathered once per PARTITION on device
        # (index count B*CHR*n_part, psize x fewer than element gathers —
        # the element-wise (div, vq_base, dims) triple's three big gathers
        # measured ~35% of the whole on-chip chunk program each; see NOTES
        # round 5).  pair_np[cls*S+s, w] packs the two per-element words:
        #   [..., 0]: (slot_group << 16) | dims   (-1 = dead element)
        #   [..., 1]: vq_base + element_offset    (addr = base + id*dims)
        div = np.full((n_cls, S, psize), -1, dtype=np.int32)
        base_t = np.zeros((n_cls, S, psize), dtype=np.int32)
        mega = []
        mega_off = {}
        mega_len = 0
        live_dims = [[] for _ in range(S)]

        for cls in range(n_cls):
            row = residue.books[cls]
            for s in range(len(row)):
                book = row[s]
                if book is None or not (residue.cascade[cls] & (1 << s)):
                    continue
                d = book.dimensions
                live_dims[s].append(d)
                if id(book) not in mega_off:
                    # 4-float book alignment: keeps every element address
                    # ``vb + (w % d) + id*d`` a multiple of the stage's
                    # group width W (W | d, W | w), so the device can fetch
                    # W consecutive values as ONE row gather of a
                    # [N/W, W]-reshaped table (the two element gathers are
                    # ~100% of the on-chip reconstruction — see NOTES r5)
                    pad = (-mega_len) % 4
                    if pad:
                        mega.append(np.zeros(pad, dtype=np.float32))
                        mega_len += pad
                    mega_off[id(book)] = mega_len
                    arr = np.asarray(book.lookup, dtype=np.float32).ravel()
                    mega.append(arr)
                    mega_len += arr.size
                vb = mega_off[id(book)]
                w = np.arange(psize)
                if self.residue_type == 0:
                    steps = psize // d
                    groups[cls, s] = steps
                    if steps > 0:
                        valid = w < steps * d
                        g = w % steps
                        e = w // steps
                        div[cls, s] = np.where(valid, (g << 16) | d, -1)
                        base_t[cls, s] = np.where(valid, vb + e, 0)
                else:
                    groups[cls, s] = -(-psize // d)
                    div[cls, s] = ((w // d) << 16) | d
                    base_t[cls, s] = vb + (w % d)
        self.groups_np = groups
        self.pair_np = np.stack([div, base_t], axis=-1).reshape(
            n_cls * S, psize, 2
        )
        if mega:
            tail = (-mega_len) % 4
            if tail:
                mega.append(np.zeros(tail, dtype=np.float32))
            self.vq_mega_np = np.concatenate(mega)
        else:
            self.vq_mega_np = np.zeros(4, dtype=np.float32)
        # per-stage element-group width: the largest power of two (<= 4)
        # dividing every live book's dims in that stage.  Within a group of
        # W elements the slot index is constant (g = w // d, W | d) and the
        # VQ addresses are consecutive, so the device gathers ids once per
        # group and mega values W at a time.  Residue type 0 interleaves
        # groups element-wise (g = w % steps) — no grouping there.
        widths = []
        from math import gcd

        for s in range(S):
            if self.residue_type == 0 or not live_dims[s]:
                widths.append(1)
                continue
            g = 0
            for d in live_dims[s]:
                g = gcd(g, d)
            widths.append(4 if g % 4 == 0 else (2 if g % 2 == 0 else 1))
        self.stage_widths = tuple(widths)

    # -- per-block-size geometry ------------------------------------------------

    def chr_count(self) -> int:
        return 1 if self.residue_type == 2 else self.channels

    def half(self, block_size: int) -> int:
        if self.residue_type == 2:
            return block_size * self.channels // 2
        return block_size // 2

    def n_part(self, block_size: int) -> int:
        end = min(self.end, self.half(block_size))
        return max(0, (end - self.begin) // self.psize)

    def max_ids(self, block_size: int) -> int:
        per_stage = self.groups_np[: self.n_cls].max(axis=0)  # [S]
        return int(per_stage.sum()) * self.chr_count() * self.n_part(block_size)


def plan_for_setup(setup):
    """Build ResiduePlans for a setup; None when symbol mode cannot apply."""
    for m in setup.mappings:
        if m.submap_count != 1:
            return None
    plans = {}
    for mode in setup.modes:
        res = setup.residues[mode.mapping.submap_residue[0]]
        if id(res) in plans:
            continue
        for cls in range(res.classifications):
            for s, book in enumerate(res.books[cls]):
                if book is None or not (res.cascade[cls] & (1 << s)):
                    continue
                if book.entries > 32767:
                    return None
                if res.residue_type != 0 and res.partition_size % book.dimensions:
                    return None
                if book.dimensions > 65535:
                    return None  # packed (group << 16) | dims table
        if res.partition_size > 32767:
            return None  # slot group must fit the packed table's high half
        plans[id(res)] = ResiduePlan(res, setup.channels)
    return plans


def sym_geometry(setup, plans):
    """(n_part_max, chr_max, max_ids_max) over all modes — the native unpack
    buffer shape."""
    n_part_max = chr_max = ids_max = 1
    for mode in setup.modes:
        plan = plans[id(setup.residues[mode.mapping.submap_residue[0]])]
        n_part_max = max(n_part_max, plan.n_part(mode.block_size))
        chr_max = max(chr_max, plan.chr_count())
        ids_max = max(ids_max, plan.max_ids(mode.block_size))
    return n_part_max, chr_max, ids_max


def plan_tables_dev(plan):
    """Device-resident constant tables for a plan (uploaded once per plan —
    cached on the plan object, so every consumer shares one device copy)."""
    tabs = getattr(plan, "_tabs_dev", None)
    if tabs is not None:
        return tabs
    import jax.numpy as jnp

    tabs = (
        jnp.asarray(plan.groups_np),
        jnp.asarray(plan.pair_np),
        jnp.asarray(plan.vq_mega_np),
    )
    plan._tabs_dev = tabs
    return tabs


def flatten_ids(ids_rows, counts):
    """Compact per-frame id rows ``[R, max_ids]`` into one flat int16 array
    plus per-frame exclusive-cumsum bases — the chunk-level layout every
    dispatcher uploads (ids beyond each row's count are undefined)."""
    counts = counts.astype(np.int64)
    base = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    # the row width is sized for the chunk's longest frame; a bucket of
    # short frames masks a fraction of it (an O(R*max) boolean compress
    # beat a repeat+2-D-gather 4-5x in an A/B, but only on used columns)
    width = int(counts.max()) if len(counts) else 0
    ids_rows = ids_rows[:, :width]
    keep = np.arange(width)[None, :] < counts[:, None]
    return ids_rows[keep].astype(np.int16, copy=False), base


class SymStatic(NamedTuple):
    """Hashable static geometry for the jitted reconstruction."""

    begin: int
    psize: int
    n_part: int
    chr_count: int
    stages: int
    n_cls: int
    half: int
    residue_type: int
    # per-stage gather-group widths (see ResiduePlan.stage_widths);
    # NVT_SYM_WIDE=0 pins them to 1 (the per-element twin lane)
    widths: tuple = ()


def plan_static(plan, block_size):
    import os

    widths = plan.stage_widths
    if os.environ.get("NVT_SYM_WIDE", "1") == "0":
        widths = (1,) * plan.S
    return SymStatic(
        plan.begin, plan.psize, plan.n_part(block_size), plan.chr_count(),
        plan.S, plan.n_cls, plan.half(block_size), plan.residue_type,
        widths,
    )


def reconstruct_spectrum(classes, ids_flat, frame_base, tabs, st, channels):
    """Traceable: rebuild residue spectra ``[B, C, n2]`` from symbols.

    classes ``[B, CHR, n_part]`` int32 (CLASS_SENTINEL = undecoded),
    ids_flat ``[N]`` int32 (-1 = missing), frame_base ``[B]`` int32 offsets
    into ids_flat; tabs from :func:`plan_tables_dev`; st from
    :func:`plan_static`.
    """
    import jax.numpy as jnp

    begin, psize, n_part, CHR, S, n_cls, half, rtype = st[:8]  # SymStatic
    widths = st.widths or (1,) * S
    groups_t, pair_t, mega_t = tabs
    B = classes.shape[0]
    n_ids = ids_flat.shape[0]
    mega_n = mega_t.shape[0]

    if n_part == 0:
        acc = jnp.zeros((B, CHR, 0), dtype=jnp.float32)
    else:
        coded = n_part * psize
        # canonical (stage, ch, part)-major exclusive prefix of slot counts
        counts = jnp.take(groups_t, classes, axis=0)  # [B, CHR, n_part, S]
        counts_c = counts.transpose(0, 3, 1, 2).reshape(B, -1)
        prefix = jnp.cumsum(counts_c, axis=1) - counts_c  # exclusive
        prefix = prefix.reshape(B, S, CHR, n_part)

        # gather count is THE cost on chip — the on-chip dissection
        # (tools/ab_recon_gathers.py) measured the two data-dependent
        # element gathers at 97 + 88 ms/iter and EVERYTHING else in the
        # reconstruction at ~0.07 ms.  Three reductions ride below:
        #   1. static per-(cls, stage) words: ONE row gather indexed per
        #      partition (psize x fewer indices);
        #   2. ids: one gather per W-element group (slot is constant
        #      within a group; W = st.widths[s]);
        #   3. mega: one [N/W, W] row gather per group (addresses are
        #      consecutive and W-aligned by the plan's book padding).
        is_cls_p = classes < n_cls  # [B, CHR, n_part]
        cls_safe_p = jnp.where(is_cls_p, classes, 0)
        live_w = {}

        def live_for(w):
            if w not in live_w:
                live_w[w] = jnp.broadcast_to(
                    is_cls_p[:, :, :, None], (B, CHR, n_part, psize // w)
                ).reshape(B, CHR, coded // w)
            return live_w[w]

        acc = jnp.zeros((B, CHR, coded), dtype=jnp.float32)
        for s in range(S):
            W = widths[s] if s < len(widths) else 1
            rows = jnp.take(pair_t, cls_safe_p * S + s, axis=0)
            if W > 1:
                rows = rows[:, :, :, ::W]  # group-leader element per group
            pe = rows[..., 0].reshape(B, CHR, coded // W)  # (group<<16)|dims
            base = rows[..., 1].reshape(B, CHR, coded // W)  # vq_base + off
            live = live_for(W) & (pe >= 0)
            g = pe >> 16
            dm = pe & 0xFFFF
            sb = jnp.broadcast_to(
                prefix[:, s][:, :, :, None], (B, CHR, n_part, psize // W)
            ).reshape(B, CHR, coded // W)
            slot = frame_base[:, None, None] + sb + g
            idv = jnp.take(ids_flat, jnp.clip(slot, 0, n_ids - 1)).astype(
                jnp.int32
            )
            live = live & (idv >= 0)
            addr = base + idv * dm
            if W > 1:
                mega_w = mega_t.reshape(-1, W)
                val = jnp.take(
                    mega_w,
                    jnp.clip(addr >> (W.bit_length() - 1), 0,
                             mega_w.shape[0] - 1),
                    axis=0,
                )  # [B, CHR, coded//W, W]
                acc = acc + jnp.where(
                    live[..., None], val, jnp.float32(0.0)
                ).reshape(B, CHR, coded)
            else:
                val = jnp.take(mega_t, jnp.clip(addr, 0, mega_n - 1))
                acc = acc + jnp.where(live, val, jnp.float32(0.0))

    if rtype == 2:
        full = jnp.zeros((B, half), dtype=jnp.float32)
        full = jnp.pad(
            acc.reshape(B, -1), [(0, 0), (begin, half - begin - acc.shape[-1] * 1)]
        ) if acc.shape[-1] else full
        # de-interleave: [B, n2*C] -> [B, n2, C] -> [B, C, n2]
        n2 = half // channels
        return full.reshape(B, n2, channels).transpose(0, 2, 1)
    # types 0/1: CHR == channels, half == n2
    if acc.shape[-1]:
        return jnp.pad(
            acc, [(0, 0), (0, 0), (begin, half - begin - acc.shape[-1])]
        )
    return jnp.zeros((B, channels, half), dtype=jnp.float32)


def round_ids(n: int) -> int:
    """Pad symbol counts to a coarse quantum to bound recompiles."""
    return max(IDS_QUANTUM, -(-n // IDS_QUANTUM) * IDS_QUANTUM)
