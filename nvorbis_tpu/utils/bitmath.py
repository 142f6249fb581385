"""Bit-level math primitives shared by the Vorbis codec layers.

Semantics match the reference helpers in ``NVorbis/Utils.cs``:
``ilog`` (Utils.cs:5-14), ``BitReverse`` (Utils.cs:16-28), the ±0.99999994
clip point (Utils.cs:30-43) and the packed Vorbis float32 format
(Utils.cs:45-59).
"""

import math

import numpy as np

# Decoded samples are clipped into [-CLIP_LIMIT, +CLIP_LIMIT]
# (reference: NVorbis/Utils.cs:30-43, README.md:35).
CLIP_LIMIT = np.float32(0.99999994)


def ilog(x: int) -> int:
    """Number of bits needed to represent ``x`` (0 for x <= 0).

    Vorbis I spec section 9.2.1; reference NVorbis/Utils.cs:5-14.
    """
    if x <= 0:
        return 0
    return x.bit_length()


def bit_reverse(n: int, bits: int = 32) -> int:
    """Reverse the low ``bits`` bits of ``n``.

    Reference: NVorbis/Utils.cs:16-28.
    """
    n &= 0xFFFFFFFF
    n = ((n & 0xAAAAAAAA) >> 1) | ((n & 0x55555555) << 1)
    n = ((n & 0xCCCCCCCC) >> 2) | ((n & 0x33333333) << 2)
    n = ((n & 0xF0F0F0F0) >> 4) | ((n & 0x0F0F0F0F) << 4)
    n = ((n & 0xFF00FF00) >> 8) | ((n & 0x00FF00FF) << 8)
    n = ((n >> 16) | (n << 16)) & 0xFFFFFFFF
    return n >> (32 - bits)


def vorbis_float32(bits: int) -> np.float32:
    """Unpack the Vorbis codebook float format: 1 sign, 10-bit exponent
    (bias 788), 21-bit mantissa.

    Reference: NVorbis/Utils.cs:45-59; Vorbis I spec `float32_unpack`.
    """
    mantissa = bits & 0x1FFFFF
    exponent = ((bits & 0x7FE00000) >> 21) - 788
    if bits & 0x80000000:
        mantissa = -mantissa
    # mantissa is stored as float32 before scaling in the reference
    return np.float32(np.float32(mantissa) * math.pow(2.0, exponent))
