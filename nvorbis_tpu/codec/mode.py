"""Vorbis modes: block flag, mapping selection, window tables, lapping math.

Reference: NVorbis/Mode.cs.  The Vorbis window is
``sin(pi/2 * sin^2((i+.5)/n * pi/2))`` (Mode.CalcWindow, 69-100), computed
here with the same float32 rounding points as the reference.
"""

import numpy as np

from nvorbis_tpu.errors import InvalidDataError

# The reference uses `const float M_PI2 = 3.1415926539f / 2` (Mode.cs:15);
# as float32 this equals float32(pi)/2, promoted to double inside the
# window expression.
M_PI2 = float(np.float32(3.1415926539) / np.float32(2))


def calc_window(prev_block_size: int, block_size: int, next_block_size: int) -> np.ndarray:
    """Build one lapping window (float32[block_size]).

    Reference: Mode.CalcWindow (Mode.cs:69-100).
    """
    arr = np.zeros(block_size, dtype=np.float32)
    left = prev_block_size // 2
    right = next_block_size // 2
    left_begin = block_size // 4 - left // 2
    right_begin = block_size - block_size // 4 - right // 2

    i = np.arange(left, dtype=np.float64)
    x = np.sin((i + 0.5) / left * M_PI2).astype(np.float32)
    x = x * x
    arr[left_begin : left_begin + left] = np.sin(
        (x * np.float32(M_PI2)).astype(np.float64)
    ).astype(np.float32)

    arr[left_begin + left : right_begin] = 1.0

    i = np.arange(right, dtype=np.float64)
    x = np.sin((right - i - 0.5) / right * M_PI2).astype(np.float32)
    x = x * x
    arr[right_begin : right_begin + right] = np.sin(
        (x * np.float32(M_PI2)).astype(np.float64)
    ).astype(np.float32)
    return arr


def calc_overlap(prev_block_size: int, block_size: int, next_block_size: int):
    """(start, valid, total) lapping indexes (Mode.CalcOverlap, 102-117)."""
    left_half = prev_block_size // 4
    right_half = next_block_size // 4
    start = block_size // 4 - left_half
    total = block_size // 4 * 3 + right_half
    valid = total - right_half * 2
    return start, valid, total


class Mode:
    def __init__(self, packet, channels, block0_size, block1_size, mappings):
        self.channels = channels
        self.block_flag = packet.read_bit()
        if packet.read_bits(32) != 0:
            raise InvalidDataError("Mode header had invalid window or transform type!")
        mapping_idx = packet.read_bits(8)
        if mapping_idx >= len(mappings):
            raise InvalidDataError("Mode header had invalid mapping index!")
        self.mapping_idx = mapping_idx
        self.mapping = mappings[mapping_idx]

        if self.block_flag:
            self.block_size = block1_size
            sizes = [
                (block0_size, block1_size, block0_size),
                (block1_size, block1_size, block0_size),
                (block0_size, block1_size, block1_size),
                (block1_size, block1_size, block1_size),
            ]
            self.windows = [calc_window(*s) for s in sizes]
            self.overlaps = [calc_overlap(*s) for s in sizes]
        else:
            self.block_size = block0_size
            self.windows = [calc_window(block0_size, block0_size, block0_size)]
            self.overlaps = [
                (0, block0_size // 2, block0_size)
            ]  # Mode.GetPacketInfo:142-148

    def get_packet_info(self, packet):
        """Read the window flags; returns (window_index, start, valid, total)
        or None for a short packet (Mode.GetPacketInfo, 119-151)."""
        if packet.is_short:
            return None
        if self.block_flag:
            prev_flag = packet.read_bit()
            next_flag = packet.read_bit()
            window_index = (1 if prev_flag else 0) + (2 if next_flag else 0)
        else:
            window_index = 0
        start, valid, total = self.overlaps[window_index]
        return window_index, start, valid, total

    def get_packet_sample_count(self, packet) -> int:
        info = self.get_packet_info(packet)
        if info is None:
            return 0
        _, start, valid, _ = info
        return valid - start
