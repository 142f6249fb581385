"""Vorbis mapping (channel topology): submaps, square-polar coupling steps,
channel muxing, per-submap floor/residue selection.

Reference: NVorbis/Mapping.cs:16-93.  Frame orchestration lives in
``codec/frames.py`` (host unpack) and the synthesis backends.
"""

from nvorbis_tpu.errors import InvalidDataError
from nvorbis_tpu.utils.bitmath import ilog


class Mapping:
    def __init__(self, packet, channels, floors, residues):
        submap_count = 1
        if packet.read_bit():
            submap_count += packet.read_bits(4)

        coupling_steps = 0
        if packet.read_bit():
            coupling_steps = packet.read_bits(8) + 1

        coupling_bits = ilog(channels - 1)
        self.coupling_mag = []
        self.coupling_ang = []
        for _ in range(coupling_steps):
            magnitude = packet.read_bits(coupling_bits)
            angle = packet.read_bits(coupling_bits)
            if magnitude == angle or magnitude > channels - 1 or angle > channels - 1:
                raise InvalidDataError("Invalid magnitude or angle in mapping header!")
            self.coupling_mag.append(magnitude)
            self.coupling_ang.append(angle)

        if packet.read_bits(2) != 0:
            raise InvalidDataError("Reserved bits not 0 in mapping header.")

        mux = [0] * channels
        if submap_count > 1:
            for c in range(channels):
                mux[c] = packet.read_bits(4)
                # NOTE: the reference checks `> submapCount` (not >=),
                # Mapping.cs:57 — replicated for wire compatibility
                if mux[c] > submap_count:
                    raise InvalidDataError(
                        "Invalid channel mux submap index in mapping header!"
                    )
        self.mux = mux

        self.submap_floor = []
        self.submap_residue = []
        for _ in range(submap_count):
            packet.skip_bits(8)  # unused time configuration placeholder
            floor_num = packet.read_bits(8)
            if floor_num >= len(floors):
                raise InvalidDataError("Invalid floor number in mapping header!")
            residue_num = packet.read_bits(8)
            if residue_num >= len(residues):
                raise InvalidDataError("Invalid residue number in mapping header!")
            self.submap_floor.append(floor_num)
            self.submap_residue.append(residue_num)
        self.submap_count = submap_count

        self.channel_floor = [self.submap_floor[mux[c]] for c in range(channels)]
        self.channel_residue = [self.submap_residue[mux[c]] for c in range(channels)]
        self.channels = channels
