"""Host-plane audio packet unpack: bits -> dense per-frame tensors.

This is the boundary between the sequential host plane and the batched device
plane.  ``unpack_audio_packet`` performs everything that requires bit-serial
work (mode/window flags, floor post decode + unwrap, residue symbol decode +
dense accumulation) and emits a ``FrameSpec`` of plain numpy arrays that
either synthesis backend (numpy oracle or the JAX device program) can consume.

Frame orchestration semantics follow NVorbis/Mapping.DecodePacket (95-198)
and NVorbis/Mode.Decode (153-170), with the residue channel-masking
spec-compliance notes documented in codec/residue.py.
"""

import numpy as np

from nvorbis_tpu.codec.floor import Floor1


class FrameSpec:
    """One unpacked audio frame, ready for batched synthesis."""

    __slots__ = (
        "n",                # block size
        "mode",             # Mode object (windows, lapping)
        "mapping",          # Mapping object
        "window_index",     # 0..3 (long blocks), 0 (short)
        "start", "valid", "total",  # lapping indexes
        "residue",          # np.float32 [C, n2]
        "floor1_ys",        # np.int32 [C, P_max] (sorted, multiplied) or None rows
        "floor1_used",      # np.bool_ [C, P_max]
        "floor1_id",        # np.int32 [C]; -1 when the channel uses floor0/none
        "floor0_curves",    # dict channel -> np.float32 [n2] (rare path)
        "has_floor",        # np.bool_ [C] (floor unpacked non-empty)
        "execute",          # np.bool_ [C] (floor or coupled partner has energy)
        # packet metadata for position tracking / stats
        "granule_pos", "is_end_of_stream", "is_resync",
        "bits_read", "bits_remaining", "container_overhead_bits",
    )


def unpack_audio_packet(setup, packet, floor_id_map, max_posts):
    """Unpack one audio packet; returns FrameSpec or None on a bad packet.

    ``floor_id_map``: dict mapping floor object id() -> dense floor1 index
    (for the device gather tables); ``max_posts``: max post count over all
    floor1 configs in the setup.
    """
    if packet.read_bit():
        return None  # not an audio packet (spec: first bit must be 0)
    mode = setup.modes[packet.read_bits(setup.mode_field_bits)]
    info = mode.get_packet_info(packet)
    if info is None:
        return None
    window_index, start, valid, total = info

    mapping = mode.mapping
    channels = setup.channels
    n = mode.block_size
    n2 = n // 2

    spec = FrameSpec()
    spec.n = n
    spec.mode = mode
    spec.mapping = mapping
    spec.window_index = window_index
    spec.start = start
    spec.valid = valid
    spec.total = total

    # -- floors -------------------------------------------------------------
    floor_data = []
    has_floor = np.zeros(channels, dtype=np.bool_)
    floor1_ys = np.zeros((channels, max_posts), dtype=np.int32)
    floor1_used = np.zeros((channels, max_posts), dtype=np.bool_)
    floor1_id = np.full(channels, -1, dtype=np.int32)
    floor0_curves = {}
    for c in range(channels):
        floor = setup.floors[mapping.channel_floor[c]]
        data = floor.unpack(packet, n, c)
        floor_data.append((floor, data))
        has_floor[c] = data.has_floor
        if isinstance(floor, Floor1):
            floor1_id[c] = floor_id_map[id(floor)]
            if data.has_floor:
                p = floor.post_count
                floor1_ys[c, :p] = data.ys_sorted
                floor1_used[c, :p] = data.used_sorted

    # -- coupling energy propagation (spec 4.3.2 step 2; Mapping.cs:112-119) --
    execute = has_floor.copy()
    for mag, ang in zip(mapping.coupling_mag, mapping.coupling_ang):
        if execute[mag] or execute[ang]:
            execute[mag] = True
            execute[ang] = True

    # -- residues, per submap -------------------------------------------------
    residue = np.zeros((channels, n2), dtype=np.float32)
    do_not_decode = ~execute
    for i in range(mapping.submap_count):
        chans = [c for c in range(channels) if mapping.mux[c] == i]
        res = setup.residues[mapping.submap_residue[i]]
        res.decode(
            packet,
            [bool(do_not_decode[c]) for c in chans],
            n,
            [residue[c] for c in chans],
        )

    # -- floor0 curves (legacy path): render host-side --------------------------
    for c in range(channels):
        floor, data = floor_data[c]
        if not isinstance(floor, Floor1) and execute[c]:
            floor0_curves[c] = floor.curve(data, n)

    spec.residue = residue
    spec.floor1_ys = floor1_ys
    spec.floor1_used = floor1_used
    spec.floor1_id = floor1_id
    spec.floor0_curves = floor0_curves
    spec.has_floor = has_floor
    spec.execute = execute

    spec.granule_pos = packet.granule_position
    spec.is_end_of_stream = packet.is_end_of_stream
    spec.is_resync = packet.is_resync
    spec.bits_read = packet.bits_read
    spec.bits_remaining = packet.bits_remaining
    spec.container_overhead_bits = packet.container_overhead_bits
    return spec


def apply_inverse_coupling(residue, mapping, execute):
    """Inverse square-polar coupling, in place over ``residue [C, n2]``.

    Reference: Mapping.DecodePacket (137-182) — reverse step order, first
    half only, exact float add/sub ordering.
    """
    for i in range(len(mapping.coupling_mag) - 1, -1, -1):
        mag_c = mapping.coupling_mag[i]
        ang_c = mapping.coupling_ang[i]
        if not (execute[mag_c] or execute[ang_c]):
            continue
        m = residue[mag_c]
        a = residue[ang_c]
        m_pos = m > 0
        a_pos = a > 0
        new_m = np.where(
            m_pos,
            np.where(a_pos, m, m + a),
            np.where(a_pos, m, m - a),
        )
        new_a = np.where(
            m_pos,
            np.where(a_pos, m - a, m),
            np.where(a_pos, m + a, m),
        )
        residue[mag_c] = new_m
        residue[ang_c] = new_a
