"""LSB-first bit reader over a packet's bytes — the L0 primitive.

Vorbis packs bits LSB-first within each byte (reference:
NVorbis/DataPacket.cs:187).  Semantics mirrored from ``DataPacket``:

- ``try_peek_bits(count)`` returns ``(value, bits_read)`` where ``bits_read``
  may be short of ``count`` at end of packet (DataPacket.cs:168-205);
- ``read_bits`` peeks then skips and returns whatever bits were available
  (DataPacket.cs:150-160);
- skipping past the end sets the ``is_short`` flag (DataPacket.cs:255-279);
- ``bits_read`` / ``bits_remaining`` counters feed the stream stats.

Unlike the reference (which pulls bytes lazily across page-continuation
boundaries), a packet's data parts are concatenated up front — observable
behavior is identical and the host decode loop stays simple and fast.
"""


class BitReader:
    __slots__ = (
        "data",
        "_nbits",
        "_pos",
        "is_short",
        "granule_position",
        "is_resync",
        "is_end_of_stream",
        "container_overhead_bits",
    )

    def __init__(self, data: bytes):
        self.data = data
        self._nbits = len(data) * 8
        self._pos = 0
        self.is_short = False
        self.granule_position = None
        self.is_resync = False
        self.is_end_of_stream = False
        self.container_overhead_bits = 0

    # -- counters ---------------------------------------------------------

    @property
    def bits_read(self) -> int:
        return self._pos

    @property
    def bits_remaining(self) -> int:
        return self._nbits - self._pos

    @property
    def total_bits(self) -> int:
        return self._nbits

    def reset(self) -> None:
        self._pos = 0
        self.is_short = False

    # -- core reads -------------------------------------------------------

    def try_peek_bits(self, count: int):
        """Peek up to ``count`` bits (0..64); returns (value, bits_read)."""
        if count < 0 or count > 64:
            raise ValueError("count must be in [0, 64]")
        if count == 0:
            return 0, 0
        pos = self._pos
        avail = self._nbits - pos
        if avail <= 0:
            return 0, 0
        n = count if count < avail else avail
        byte0 = pos >> 3
        bit0 = pos & 7
        nbytes = (bit0 + n + 7) >> 3
        chunk = int.from_bytes(self.data[byte0 : byte0 + nbytes], "little")
        value = (chunk >> bit0) & ((1 << n) - 1)
        return value, n

    def skip_bits(self, count: int) -> None:
        if count <= 0:
            return
        pos = self._pos + count
        if pos > self._nbits:
            pos = self._nbits
            self.is_short = True
        self._pos = pos

    def read_bits(self, count: int) -> int:
        value, _ = self.try_peek_bits(count)
        self.skip_bits(count)
        return value

    def read_bit(self) -> bool:
        return self.read_bits(1) != 0

    # -- helpers (reference: NVorbis/Extensions.cs) -------------------------

    def read_bytes(self, count: int) -> bytes:
        """Read ``count`` whole bytes (bit-aligned or not)."""
        if count > 0 and (self._pos & 7) == 0:
            # byte-aligned fast path: one slice instead of a per-byte
            # peek/skip loop (comment-header strings are byte-aligned and
            # dominated small-file open profiles)
            b0 = self._pos >> 3
            avail = (self._nbits >> 3) - b0
            take = count if count <= avail else avail
            self._pos += take * 8
            if take < count:
                self.is_short = True
            return bytes(self.data[b0 : b0 + take])
        out = bytearray(count)
        got = 0
        for i in range(count):
            v, n = self.try_peek_bits(8)
            if n < 8:
                self.skip_bits(n)
                self.is_short = True
                break
            self.skip_bits(8)
            out[i] = v
            got += 1
        return bytes(out[:got])

    def read_byte(self) -> int:
        return self.read_bits(8)

    def read_int16(self) -> int:
        v = self.read_bits(16)
        return v - (1 << 16) if v & (1 << 15) else v

    def read_uint16(self) -> int:
        return self.read_bits(16)

    def read_int32(self) -> int:
        v = self.read_bits(32)
        return v - (1 << 32) if v & (1 << 31) else v

    def read_uint32(self) -> int:
        return self.read_bits(32)

    def read_int64(self) -> int:
        v = self.read_bits(64)
        return v - (1 << 64) if v & (1 << 63) else v

    def read_uint64(self) -> int:
        return self.read_bits(64)

    def skip_bytes(self, count: int) -> None:
        self.skip_bits(count * 8)
