"""Scalar (numpy) synthesis oracle: FrameSpec -> windowed PCM frames.

This is the reference implementation the TPU path is parity-tested against.
The IMDCT is the Vorbis I spec transform

    y[i] = sum_{k<n/2} X[k] * cos(pi/(2n) * (2i + 1 + n/2) * (2k + 1))

evaluated directly as a float64 matrix product (the reference implements the
same transform via the stb_vorbis 8-step FFT, NVorbis/Mdct.cs:65-313; the two
agree to float rounding).
"""

import numpy as np

from nvorbis_tpu.codec.floor import INVERSE_DB_TABLE, render_polyline, Floor1
from nvorbis_tpu.codec.frames import apply_inverse_coupling

_BASIS_CACHE = {}


def imdct_basis(n: int, dtype=np.float64) -> np.ndarray:
    """[n/2, n] IMDCT basis matrix for block size n."""
    key = (n, np.dtype(dtype).str)
    basis = _BASIS_CACHE.get(key)
    if basis is None:
        k = np.arange(n // 2, dtype=np.float64)[:, None]
        i = np.arange(n, dtype=np.float64)[None, :]
        basis = np.cos(np.pi / (2 * n) * (2 * i + 1 + n / 2) * (2 * k + 1))
        basis = basis.astype(dtype)
        _BASIS_CACHE[key] = basis
    return basis


def imdct(spectrum: np.ndarray, n: int) -> np.ndarray:
    """Inverse MDCT of float32 [.., n/2] -> float32 [.., n]."""
    out = spectrum.astype(np.float64) @ imdct_basis(n)
    return out.astype(np.float32)


def synthesize_frame(setup, frame) -> np.ndarray:
    """Synthesize one frame to windowed PCM float32 [C, n].

    Pipeline order per NVorbis/Mapping.DecodePacket (95-198) +
    Mode.Decode (153-170): inverse coupling on raw residue, floor curve
    multiply, IMDCT, window multiply.  Channels without energy produce
    silence (both halves cleared; Mapping.cs:192-196).
    """
    channels = setup.channels
    n = frame.n
    n2 = n // 2
    residue = frame.residue.copy()
    apply_inverse_coupling(residue, frame.mapping, frame.execute)

    out = np.zeros((channels, n), dtype=np.float32)
    window = frame.mode.windows[frame.window_index]
    for c in range(channels):
        if not frame.execute[c]:
            continue
        floor = setup.floors[frame.mapping.channel_floor[c]]
        if isinstance(floor, Floor1):
            if frame.has_floor[c]:
                p = floor.post_count
                ys = render_polyline(
                    floor.xs_sorted, frame.floor1_ys[c, :p], frame.floor1_used[c, :p], n2
                )
                curve = INVERSE_DB_TABLE[np.clip(ys, 0, 255)]
            else:
                # energy forced by coupling but the floor itself is empty:
                # the floor apply clears the spectrum (Floor1.cs:218-221)
                curve = np.zeros(n2, dtype=np.float32)
        else:
            curve = frame.floor0_curves.get(c)
            if curve is None:
                curve = np.zeros(n2, dtype=np.float32)
        spectrum = residue[c] * curve
        out[c] = imdct(spectrum, n) * window
    return out
