"""Vorbis codebooks: codeword assignment, accelerated Huffman decode, and VQ
lookup tables.

References: NVorbis/Codebook.cs (header parse 59-74, codeword lengths 76-123,
"available"-list codeword assignment 172-206, VQ table build 222-283,
DecodeScalar 294-320) and NVorbis/Huffman.cs (prefix table with
MAX_TABLE_BITS=10 + sorted overflow list, 15-76).
"""

import math

import numpy as np

from nvorbis_tpu.errors import InvalidDataError
from nvorbis_tpu.utils.bitmath import ilog, bit_reverse, vorbis_float32

MAX_TABLE_BITS = 10

_BOOK_SYNC = 0x564342


def compute_codewords(lengths):
    """Assign canonical Vorbis codewords for the given bit lengths.

    Implements the Vorbis I spec assignment (each used entry takes the lowest
    available codeword of its length), tracked with a per-length "available"
    array; returns codes in *bit-reversed* (LSB-first transmission) order, or
    None when the length set over-subscribes the code space.
    """
    n = len(lengths)
    codes = [0] * n
    available = [0] * 33

    k = 0
    while k < n and lengths[k] <= 0:
        k += 1
    if k == n:
        return codes  # all unused

    codes[k] = 0
    for i in range(1, lengths[k] + 1):
        available[i] = 1 << (32 - i)

    for i in range(k + 1, n):
        length = lengths[i]
        if length <= 0:
            continue
        z = length
        while z > 0 and available[z] == 0:
            z -= 1
        if z == 0:
            return None
        res = available[z]
        available[z] = 0
        codes[i] = bit_reverse(res, 32)
        if z != length:
            for y in range(length, z, -1):
                available[y] = res + (1 << (32 - y))
    return codes


class Codebook:
    """One parsed codebook with O(1) prefix decode for codes <= 10 bits."""

    def __init__(self, packet):
        if packet.read_bits(24) != _BOOK_SYNC:
            raise InvalidDataError("Book header had invalid signature!")
        self.dimensions = packet.read_bits(16)
        self.entries = packet.read_bits(24)

        lengths = self._read_lengths(packet)
        self.lengths = lengths
        self._build_decode_tables(lengths)
        self._read_lookup(packet)

    # -- header parsing -----------------------------------------------------

    def _read_lengths(self, packet):
        entries = self.entries
        lengths = [0] * entries
        if packet.read_bit():
            # ordered
            length = packet.read_bits(5) + 1
            i = 0
            while i < entries:
                cnt = packet.read_bits(ilog(entries - i))
                for _ in range(cnt):
                    if i >= entries:
                        raise InvalidDataError("Ordered codebook overran entries")
                    lengths[i] = length
                    i += 1
                length += 1
        else:
            sparse = packet.read_bit()
            for i in range(entries):
                if not sparse or packet.read_bit():
                    lengths[i] = packet.read_bits(5) + 1
                else:
                    lengths[i] = -1
        return lengths

    def _build_decode_tables(self, lengths):
        used = [l for l in lengths if l > 0]
        self.max_bits = max(used) if used else -1
        if self.max_bits < 0:
            # all entries unused; decode always fails
            self.table_bits = 0
            self._tbl_value = np.full(1, -1, dtype=np.int32)
            self._tbl_length = np.zeros(1, dtype=np.int32)
            self._overflow = []
            return

        codes = compute_codewords(lengths)
        if codes is None:
            raise InvalidDataError("Codebook lengths over-subscribe the code space")

        table_bits = min(self.max_bits, MAX_TABLE_BITS)
        size = 1 << table_bits
        tbl_value = np.full(size, -1, dtype=np.int32)
        tbl_length = np.zeros(size, dtype=np.int32)
        overflow = []
        for value, length in enumerate(lengths):
            if length <= 0:
                continue
            code = codes[value]
            if length <= table_bits:
                step = 1 << length
                tbl_value[code::step] = value
                tbl_length[code::step] = length
            else:
                overflow.append((code, (1 << length) - 1, length, value))
        overflow.sort(key=lambda t: (t[2], t[0]))
        self.table_bits = table_bits
        self._tbl_value = tbl_value
        self._tbl_length = tbl_length
        self._overflow = overflow

    def _read_lookup(self, packet):
        self.map_type = packet.read_bits(4)
        self.lookup = None
        if self.map_type == 0:
            return
        min_value = vorbis_float32(packet.read_bits(32))
        delta_value = vorbis_float32(packet.read_bits(32))
        value_bits = packet.read_bits(4) + 1
        sequence_p = packet.read_bit()

        if self.map_type == 1:
            count = self._lookup1_values()
        else:
            count = self.entries * self.dimensions
        mults = np.array(
            [packet.read_bits(value_bits) for _ in range(count)], dtype=np.int64
        )

        entries, dims = self.entries, self.dimensions
        table = np.zeros((entries, dims), dtype=np.float32)
        # per-element value: f32(f32(mult)*delta + min) accumulated in f64
        # when sequence_p (matches the reference's mixed-precision chain;
        # Codebook.cs:245-280)
        if self.map_type == 1:
            idx = np.arange(entries, dtype=np.int64)
            idx_div = 1
            last = np.zeros(entries, dtype=np.float64)
            for d in range(dims):
                moff = (idx // idx_div) % count
                base = mults[moff].astype(np.float32) * delta_value + min_value
                vals = base.astype(np.float64) + last
                table[:, d] = vals.astype(np.float32)
                if sequence_p:
                    last = vals
                idx_div *= count
        else:
            base = (
                mults.reshape(entries, dims).astype(np.float32) * delta_value
                + min_value
            )
            if sequence_p:
                last = np.zeros(entries, dtype=np.float64)
                for d in range(dims):
                    vals = base[:, d].astype(np.float64) + last
                    table[:, d] = vals.astype(np.float32)
                    last = vals
            else:
                table = base.astype(np.float32)
        self.lookup = table

    def _lookup1_values(self) -> int:
        r = int(math.floor(math.exp(math.log(self.entries) / self.dimensions)))
        if math.floor((r + 1) ** self.dimensions) <= self.entries:
            r += 1
        return r

    # -- decode ---------------------------------------------------------------

    def decode_scalar(self, packet) -> int:
        """Decode one Huffman symbol; -1 at end-of-packet / no match.

        Reference: Codebook.DecodeScalar (294-320).
        """
        data, bits_read = packet.try_peek_bits(self.table_bits)
        if bits_read == 0:
            return -1
        length = int(self._tbl_length[data])
        if length > 0:
            packet.skip_bits(length)
            return int(self._tbl_value[data])
        data, _ = packet.try_peek_bits(self.max_bits)
        for code, mask, length, value in self._overflow:
            if code == (data & mask):
                packet.skip_bits(length)
                return value
        return -1

    def __getitem__(self, key):
        entry, dim = key
        return self.lookup[entry, dim]
