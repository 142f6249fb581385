"""Ogg page CRC-32 (polynomial 0x04c11db7, non-reflected, init 0, no xorout).

Reference semantics: NVorbis/Ogg/Crc.cs:3-43 (byte-at-a-time table walk).

The byte-serial recurrence is too slow in pure Python for page-rate
checksumming, so we exploit the linearity of the CRC over GF(2):

    crc(M) = sum_i  (b_i * x^{8*(n-1-i)+32})  mod P

Each byte contributes independently; we map every byte through the
``b * x^32 mod P`` table, then fold adjacent pairs log2(n) times, where each
fold multiplies the left half by ``x^{8*2^k} mod P`` via four 256-entry
tables.  Everything is vectorized numpy; only ~log2(n) passes run in Python.
"""

import numpy as np

_POLY = 0x104C11DB7  # degree-32 polynomial (with the implicit x^32 term)


def _clmul(a: int, b: int) -> int:
    """Carry-less (GF(2)) polynomial multiply of Python ints."""
    r = 0
    while b:
        lsb = b & -b
        r ^= a * lsb  # multiplying by a power of two == shifting; xor-accumulate
        b ^= lsb
    return r


def _polymod(v: int) -> int:
    """Reduce polynomial ``v`` modulo _POLY (degree 32)."""
    d = v.bit_length()
    while d > 32:
        v ^= _POLY << (d - 33)
        d = v.bit_length()
    return v


def _mulmod(a: int, b: int) -> int:
    return _polymod(_clmul(a, b))


def _make_byte_table() -> np.ndarray:
    # T[b] = (b * x^32) mod P  — identical to the classic MSB-first CRC table.
    tbl = [_polymod(b << 32) for b in range(256)]
    return np.array(tbl, dtype=np.uint32)


_TABLE = _make_byte_table()

# _SHIFT_TABLES[k] is a (4, 256) uint32 array; applying it to a 32-bit value v
# (decomposed into 4 bytes) computes (v * x^{8 * 2^k}) mod P.
_SHIFT_TABLES = {}


def _shift_tables(level: int) -> np.ndarray:
    tabs = _SHIFT_TABLES.get(level)
    if tabs is None:
        c = _polymod(1 << (8 * (1 << level)))  # x^{8*2^level} mod P
        tabs = np.zeros((4, 256), dtype=np.uint32)
        for j in range(4):
            for b in range(256):
                tabs[j, b] = _mulmod(b << (8 * j), c)
        _SHIFT_TABLES[level] = tabs
    return tabs


def _apply_shift(v: np.ndarray, level: int) -> np.ndarray:
    t = _shift_tables(level)
    return (
        t[0][v & 0xFF]
        ^ t[1][(v >> 8) & 0xFF]
        ^ t[2][(v >> 16) & 0xFF]
        ^ t[3][(v >> 24) & 0xFF]
    )


_native_crc = None
_native_checked = False


def crc32(data) -> int:
    """Compute the Ogg CRC over ``data`` (bytes / bytearray / uint8 array).

    Uses the C++ core's table-driven loop when available (the Python page
    scanner calls this once per page; at high stream counts the numpy tree
    fallback's per-call overhead shows up), else the vectorized numpy
    fold."""
    global _native_crc, _native_checked
    if not _native_checked:
        _native_checked = True
        try:
            from nvorbis_tpu import native as _nat

            lib = _nat.load()
            if lib is not None:
                _native_crc = lib.nvt_crc32
        except Exception:
            _native_crc = None
    if _native_crc is not None:
        b = bytes(data)
        return int(_native_crc(b, len(b)))
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    n = buf.shape[0]
    if n == 0:
        return 0
    v = _TABLE[buf]
    m = 1 << (n - 1).bit_length()
    if m != n:
        # zero bytes at the front contribute nothing
        v = np.concatenate([np.zeros(m - n, dtype=np.uint32), v])
    level = 0
    while v.shape[0] > 1:
        v = _apply_shift(v[0::2], level) ^ v[1::2]
        level += 1
    return int(v[0])


def crc32_serial(data) -> int:
    """Byte-at-a-time reference implementation (used to validate crc32)."""
    crc = 0
    tbl = _TABLE
    for b in bytes(data):
        crc = ((crc << 8) & 0xFFFFFFFF) ^ int(tbl[b ^ (crc >> 24)])
    return crc


def page_crc(page) -> int:
    """CRC of a full Ogg page with its checksum field (bytes 22..26) zeroed.

    Reference: NVorbis/Ogg/PageReaderBase.cs:56-69.
    """
    buf = bytearray(page)
    buf[22:26] = b"\x00\x00\x00\x00"
    return crc32(bytes(buf))
