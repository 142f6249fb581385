import numpy as np
import pytest

from nvorbis_tpu.utils.bitmath import ilog, bit_reverse, vorbis_float32
from nvorbis_tpu.ogg.bitreader import BitReader
from nvorbis_tpu.ogg.crc import crc32, crc32_serial


def test_ilog():
    assert ilog(0) == 0
    assert ilog(1) == 1
    assert ilog(2) == 2
    assert ilog(3) == 2
    assert ilog(4) == 3
    assert ilog(7) == 3
    assert ilog(63) == 6


def test_bit_reverse():
    assert bit_reverse(1, 32) == 1 << 31
    assert bit_reverse(0b1011, 4) == 0b1101
    for bits in (1, 5, 10, 32):
        for v in (0, 1, (1 << bits) - 1):
            assert bit_reverse(bit_reverse(v, bits), bits) == v


def test_vorbis_float32():
    # exponent bias 788: mantissa 1, exponent field 788 => 1.0
    assert vorbis_float32((788 << 21) | 1) == np.float32(1.0)
    # sign bit
    assert vorbis_float32(0x80000000 | (788 << 21) | 1) == np.float32(-1.0)
    # mantissa scaling
    assert vorbis_float32((787 << 21) | 3) == np.float32(1.5)


def test_bitreader_lsb_first():
    # byte 0b10110010: LSB-first reads 0,1,0,0,1,1,0,1
    r = BitReader(bytes([0b10110010]))
    assert [r.read_bit() for _ in range(8)] == [
        False, True, False, False, True, True, False, True,
    ]


def test_bitreader_multibyte():
    r = BitReader(bytes([0x34, 0x12]))  # 0x1234 little-endian
    assert r.read_bits(16) == 0x1234
    assert r.bits_remaining == 0


def test_bitreader_partial_and_short():
    r = BitReader(bytes([0xFF]))
    v, n = r.try_peek_bits(12)
    assert (v, n) == (0xFF, 8)
    assert not r.is_short
    assert r.read_bits(12) == 0xFF  # partial value returned
    assert r.is_short
    assert r.bits_remaining == 0


def test_bitreader_skip():
    r = BitReader(bytes(range(16)))
    r.skip_bits(13)
    assert r.bits_read == 13
    v, n = r.try_peek_bits(8)
    assert n == 8
    # bits 13..20: bytes 1 (0x01), 2 (0x02): bit13..15 of 0x01=000, then 0x02 low 5 bits
    combined = int.from_bytes(bytes(range(16)), "little")
    assert v == (combined >> 13) & 0xFF


def test_crc_vectorized_matches_serial():
    import random

    random.seed(42)
    for n in [0, 1, 2, 3, 7, 26, 27, 255, 256, 1000, 4096, 65537]:
        data = bytes(random.randrange(256) for _ in range(n))
        assert crc32(data) == crc32_serial(data)


def test_extensions_helpers():
    """Typed reads (reference: NVorbis/Extensions.cs:19-34)."""
    import struct
    from nvorbis_tpu.ogg.bitreader import BitReader

    payload = struct.pack("<BhHiIq", 0xAB, -1234, 40000, -70000, 3_000_000_000,
                          -(1 << 40))
    r = BitReader(payload)
    assert r.read_byte() == 0xAB
    assert r.read_int16() == -1234
    assert r.read_uint16() == 40000
    assert r.read_int32() == -70000
    assert r.read_uint32() == 3_000_000_000
    assert r.read_int64() == -(1 << 40)
    r2 = BitReader(payload)
    r2.skip_bytes(3)
    assert r2.bits_read == 24
