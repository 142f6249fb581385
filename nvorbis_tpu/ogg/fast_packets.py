"""Packet-table fast lane: windowed cursor over a native packetization.

``nvt_packetize`` (native/__init__.py) turns one logical stream into a
packed payload blob + per-packet tables in a single C++ pass.  This module
is the Python consumer: :func:`build_table` locates the stream's bytes and
serial, and :class:`PacketTableCursor` slices decode windows out of the
table with vectorized mode peeks — no per-packet Python objects.  Both the
multi-stream batch plane (parallel/batch.py) and the single-stream bulk
plane (engine/bulk.py) pull through it; any stream the packetizer cannot
represent stays on the Python provider, which owns the reference's
recovery semantics.
"""

import numpy as np

from nvorbis_tpu.engine.plan import FramePlan, peek_mode_index, plan_window
from nvorbis_tpu.native import PKT_EOS, PKT_HAS_GRANULE, packetize
from nvorbis_tpu.native import load as _native_load


_NO_TABLE = object()  # negative-cache sentinel on the decoder


def table_for_decoder(decoder, skip_packets=3, max_bytes=None):
    """Build a packet table for a StreamDecoder's logical stream, or None.

    Snapshots the container bytes from the decoder's seekable provider and
    packetizes from the stream's first page onward (so a chained container
    reusing a serial cannot alias an earlier logical stream).

    The result (positive or negative) is cached on the decoder: the header
    parse (stream_decoder._try_table_headers) and the bulk planes all want
    the same table, and the C++ scan plus the snapshot read were measured
    ~90 us even on a 67 kB file.  ``max_bytes`` bounds the snapshot for
    opportunistic callers (the open path): when the stream is larger,
    return None WITHOUT caching so a later bulk decode still builds it.
    """
    cached = getattr(decoder, "_pkt_table", None)
    if cached is not None:
        return None if cached is _NO_TABLE else cached
    prov = decoder._packet_provider
    index = getattr(prov, "_index", None)
    if index is None:  # forward-only provider
        return None
    reader = getattr(index, "_reader", None)
    stream = getattr(reader, "_stream", None)
    if stream is None:
        return None
    offsets = getattr(index, "_offsets", None)
    if not offsets:
        return None
    first_off = abs(offsets[0])
    try:
        pos = stream.tell()
        if max_bytes is not None:
            end = stream.seek(0, 2)
            if end - first_off > max_bytes:
                stream.seek(pos)
                return None
        stream.seek(first_off)
        raw = stream.read()
        stream.seek(pos)
    except (OSError, ValueError, AttributeError):
        return None
    table = packetize(raw, prov.stream_serial)
    if table is None or len(table[1]) - 1 <= skip_packets:
        decoder._pkt_table = _NO_TABLE
        return None
    decoder._pkt_table = table
    return table


def plan_job_arr(planner, ov_tab, blk_tab, setup, meta, job, stats,
                 last_plan):
    """Array-first :func:`plan_job` for the batch dispatcher.

    Returns ``(pa, plans, last_plan)``: ``pa`` the ``[nj, 5]`` int64
    (ok, pos_base, start, valid, total) columns, ``plans`` the boxed
    FramePlan list — or None on the vectorized path, where only the
    final (carry) plan exists as an object and per-frame boxing would be
    pure overhead (93k objects/round measured before removal).
    """
    nj = job["n"]
    if job.get("gran_arr") is not None and nj:
        res = _plan_window_native(planner, ov_tab, blk_tab, meta, job, nj)
        if res is None and (bool((meta[:nj, 0] == 1).all())
                            and not bool(np.any(job["resync"]))):
            mode_ids = meta[:nj, 1]
            widx = meta[:nj, 2]
            svt = ov_tab[mode_ids, widx]
            res = plan_window(
                planner, svt[:, 0], svt[:, 1], svt[:, 2],
                job["gran_arr"], job["has_gran"], job["eos"],
                blk_tab[mode_ids],
            )
        if res is not None:
            pa, samples, lp = res
            bits = meta[:nj, 3].astype(np.int64)
            totb = meta[:nj, 4].astype(np.int64)
            stats.add_window(samples, bits, totb - bits, job["ovh_bits"])
            return pa, None, (lp if lp is not None else last_plan)
    plans, lp = _plan_sequential(planner, setup, meta, job, stats,
                                 last_plan)
    pa = np.array(
        [(p.ok, p.pos_base, p.start, p.valid, p.total) for p in plans],
        dtype=np.int64,
    ).reshape(len(plans), 5)
    return pa, plans, lp


def _plan_window_native(planner, ov_tab, blk_tab, meta, job, nj):
    """C++ :func:`plan_window` (nvt_plan_window) — same int64 math, one
    call instead of ~20 small-array numpy ops (~70 us/chunk, the fixed
    cost that dominated small-file decodes).  Returns None when the
    native library is unavailable or the window has an edge the fast
    plan rejects (the caller then runs the Python paths, which stay the
    semantic oracle)."""
    lib = _native_load()
    if lib is None:
        return None
    state = np.empty(11, dtype=np.int64)
    state[0] = planner.emitted
    state[1] = planner.stream_pos0
    state[2] = planner.has_position
    prev = planner.prev
    if prev is None:
        state[3:8] = 0
    else:
        state[3] = 1
        state[4:8] = prev
    state[8] = planner.prev_drained
    state[9] = planner.first
    state[10] = planner.eos_found
    pa = np.empty((nj, 5), dtype=np.int64)
    samples = np.empty(nj, dtype=np.int64)
    lp = np.empty(5, dtype=np.int64)
    eos = job["eos"]
    resync = job["resync"]
    gran = job["gran_arr"]
    has_gran = job["has_gran"]
    if not (meta.flags.c_contiguous and gran.flags.c_contiguous
            and has_gran.flags.c_contiguous and eos.flags.c_contiguous
            and resync.flags.c_contiguous):
        return None
    rc = lib.nvt_plan_window(
        nj, meta.ctypes.data, ov_tab.shape[0], ov_tab.shape[1],
        ov_tab.ctypes.data, blk_tab.ctypes.data, gran.ctypes.data,
        has_gran.ctypes.data, eos.ctypes.data, resync.ctypes.data,
        state.ctypes.data, pa.ctypes.data, samples.ctypes.data,
        lp.ctypes.data,
    )
    if not rc:
        return None
    planner.emitted = int(state[0])
    planner.stream_pos0 = int(state[1])
    planner.has_position = bool(state[2])
    planner.prev = (int(state[4]), int(state[5]), int(state[6]),
                    int(state[7]))
    planner.prev_drained = False
    planner.first = False
    planner.eos_found = bool(state[10])
    return pa, samples, FramePlan(True, int(lp[0]), int(lp[1]), int(lp[2]),
                                  int(lp[3]), int(lp[4]))


def _plan_sequential(planner, setup, meta, job, stats, last_plan):
    """The per-packet ``planner.add`` loop — owns every edge case
    (bad packets, resync, granule pickup, prev-tail clamping)."""
    nj = job["n"]
    granules = job["granules"]
    if granules is None:  # table job falling back to the slow path
        granules = [
            int(g) if h else None
            for g, h in zip(job["gran_arr"], job["has_gran"])
        ]
    eos = job["eos"]
    resync = job["resync"]
    ovh_bits = job["ovh_bits"]
    plans = []
    s_samples, s_bits, s_waste, s_cont = [], [], [], []
    for i in range(nj):
        ok = meta[i, 0] == 1
        block_size = None
        if ok:
            mode = setup.modes[meta[i, 1]]
            start, valid, total = mode.overlaps[meta[i, 2]]
            block_size = mode.block_size
        else:
            start = valid = total = 0
        plan = planner.add(
            bool(ok), start, valid, total,
            granules[i], bool(eos[i]), bool(resync[i]),
            block_size=block_size, prev_plan=last_plan,
        )
        if plan.ok:
            last_plan = plan
        total_bits = int(meta[i, 4])
        if plan.ok:
            bits_read = int(meta[i, 3])
            s_samples.append(plan.samples)
            s_bits.append(bits_read)
            s_waste.append(total_bits - bits_read)
        else:
            s_samples.append(0)
            s_bits.append(0)
            s_waste.append(total_bits)
        s_cont.append(int(ovh_bits[i]))
        plans.append(plan)
    stats.add_window(s_samples, s_bits, s_waste, s_cont)
    return plans, last_plan


class PacketTableCursor:
    """Sequential window puller over a packet table.

    ``pull(setup, ov_blk, budget, size_counts, cap)`` returns a job dict
    (see parallel/batch.py phase 1) or None when exhausted; per-block-size
    frame caps match the provider path's check-before-pull loop exactly.
    """

    def __init__(self, table, start_index=3):
        self.table = table
        self.idx = start_index
        self.done = start_index >= len(table[1]) - 1
        # per-table precomputes (sliced per window below: the per-pull
        # mask/astype ops were a measured fixed cost on small files)
        flags = table[3]
        self._has_gran = (flags & PKT_HAS_GRANULE) != 0
        self._eos = (flags & PKT_EOS) != 0
        self._ovh_bits = table[4].astype(np.int64) * 8
        self._no_resync = np.zeros(len(table[1]) - 1, dtype=bool)
        self._sizes = None  # lazy: needs the setup (first pull builds it)

    def _build_sizes(self, setup, blk_tab):
        data, off = self.table[0], self.table[1]
        mfb = setup.mode_field_bits
        nm = len(setup.modes)
        n_total = len(off) - 1
        if mfb <= 7:
            first = data[off[:-1]]
            mode_idx = (first.astype(np.int64) >> 1) & ((1 << mfb) - 1)
            valid = (first & 1) == 0
        else:  # >128 modes: byte-spanning field, peek per packet (rare)
            mode_idx = np.zeros(n_total, dtype=np.int64)
            valid = np.zeros(n_total, dtype=bool)
            for k in range(n_total):
                mi = peek_mode_index(
                    data[off[k] : off[k] + 8].tobytes(), mfb
                )
                if mi is not None:
                    mode_idx[k] = mi
                    valid[k] = True
        valid = valid & (mode_idx < nm)
        self._sizes = np.where(
            valid, blk_tab[np.minimum(mode_idx, nm - 1)], 0
        )

    def pull(self, setup, blk_tab, budget, size_counts, cap):
        data, off, gran, flags, ovh = self.table
        n_total = len(off) - 1
        i0 = self.idx
        if i0 >= n_total:
            self.done = True
            return None
        n_avail = min(budget, n_total - i0)
        if self._sizes is None:
            self._build_sizes(setup, blk_tab)
        sizes = self._sizes[i0 : i0 + n_avail]

        # include up to (and incl.) the packet that reaches the cap —
        # skipped outright when no size can reach it (small windows /
        # final chunks: the per-size cumsum scan was ~30% of a small
        # file's pull)
        k = n_avail
        base_max = max(size_counts.values()) if size_counts else 0
        if n_avail + base_max >= cap:
            for s in np.unique(sizes[sizes > 0]):
                base = size_counts.get(int(s), 0)
                cum = np.cumsum(sizes == s) + base
                if cum[-1] >= cap:
                    k = min(k, int(np.argmax(cum >= cap)) + 1)
            sizes = sizes[:k]
        uq, cnt = np.unique(sizes, return_counts=True)
        for s, c in zip(uq.tolist(), cnt.tolist()):
            if s > 0:
                size_counts[s] = size_counts.get(s, 0) + c
        i1 = i0 + k
        self.idx = i1
        if i1 >= n_total:
            self.done = True

        return {
            "n": k,
            "view": (data[off[i0] : off[i1]],
                     (off[i0 : i1 + 1] - off[i0]).astype(np.int64)),
            "gran_arr": gran[i0:i1],
            "has_gran": self._has_gran[i0:i1],
            "granules": None,  # built lazily if the slow path runs
            "eos": self._eos[i0:i1],
            "resync": self._no_resync[i0:i1],
            "ovh_bits": self._ovh_bits[i0:i1],
        }
