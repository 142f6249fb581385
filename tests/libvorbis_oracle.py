"""Independent golden-PCM oracle: ctypes binding to libvorbisfile.

The reference's golden artifact is a decoded WAV (TestApp/Program.cs:12-29);
this module gives the equivalent *independent* oracle by decoding through
the Xiph reference decoder installed in this image (libvorbisfile.so.3).
Every parity assertion against it catches semantic errors that engine-vs-
engine comparisons cannot (both engines sharing one misread of the spec).

Known, deliberate divergences from libvorbis (we match NVorbis instead):

1. Floor1 posts beyond n (= blockSize/2): NVorbis clamps the segment end to
   n BEFORE computing the Bresenham slope (Floor1.cs:205 ``Math.Min(hx, n)``)
   while libvorbis keeps the true segment slope and merely stops writing at
   n (floor1.c render_line ``if(n>x1)n=x1``).  Real encoders fit floors to
   the block, so fixtures never hit this.
2. Floor0 bark map: NVorbis leaves map[n-1] = 0 (Floor0.cs:73 loop bound
   ``i < n - 1``) where libvorbis fills all n entries; one wrong spectral
   bin spreads over the whole window after the IMDCT.
"""

import ctypes
import ctypes.util
import os
import tempfile

import numpy as np

_VF_SIZE = 4096  # OggVorbis_File is ~720 bytes on x86-64; over-allocate

_lib = None
_lib_failed = False


def _load():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        name = ctypes.util.find_library("vorbisfile") or "libvorbisfile.so.3"
        lib = ctypes.CDLL(name)
        lib.ov_fopen.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
        lib.ov_fopen.restype = ctypes.c_int
        lib.ov_read_float.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.POINTER(ctypes.c_float))),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ov_read_float.restype = ctypes.c_long
        lib.ov_clear.argtypes = [ctypes.c_void_p]
        lib.ov_info.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ov_info.restype = ctypes.c_void_p
        _lib = lib
    except OSError:
        _lib_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def decode_file(path: str) -> np.ndarray:
    """Decode an Ogg Vorbis file to float32 PCM ``[samples, channels]``.

    Unclipped output (``ov_read_float`` returns raw floats).  Chained
    streams are decoded back to back, exactly as ``ov_read_float`` walks
    logical bitstreams.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libvorbisfile is not available")
    vf = ctypes.create_string_buffer(_VF_SIZE)
    rc = lib.ov_fopen(path.encode(), vf)
    if rc != 0:
        raise RuntimeError(f"ov_fopen failed: {rc}")
    try:
        # vorbis_info layout: int version; int channels; long rate; ...
        info = lib.ov_info(vf, -1)
        channels = ctypes.cast(
            info + 4, ctypes.POINTER(ctypes.c_int)
        ).contents.value
        chunks = []
        pcm = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))()
        bs = ctypes.c_int(0)
        while True:
            n = lib.ov_read_float(vf, ctypes.byref(pcm), 4096, ctypes.byref(bs))
            if n < 0:  # OV_HOLE etc.: skip, like most players do
                continue
            if n == 0:
                break
            frame = np.empty((n, channels), np.float32)
            for c in range(channels):
                frame[:, c] = np.ctypeslib.as_array(pcm[c], shape=(n,))
            chunks.append(frame)
        if not chunks:
            return np.zeros((0, channels), np.float32)
        return np.concatenate(chunks)
    finally:
        lib.ov_clear(vf)


def decode_bytes(blob: bytes) -> np.ndarray:
    """Decode an in-memory Ogg Vorbis stream (via a temp file)."""
    fd, path = tempfile.mkstemp(suffix=".ogg")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        return decode_file(path)
    finally:
        os.unlink(path)
