"""Minimal IEEE-float WAV writer/reader (format 3, 32-bit).

Reference: TestApp/WaveWriter.cs:10-70 (the reference's golden-output
harness writes the same format).
"""

import os
import struct

import numpy as np


def write_wav(path, samples: np.ndarray, sample_rate: int, channels: int) -> None:
    """Write interleaved float32 ``samples`` as an IEEE-float WAV.

    One ``writev`` of (header, data): a buffered-file loop of 8 small
    writes plus open/close measured ~420 us per call on this host class
    vs ~300 us for the vectored form (the syscall floor is the open), and
    a C-contiguous array passes through zero-copy.
    """
    samples = np.asarray(samples, dtype=np.float32)
    data = samples.data if samples.flags.c_contiguous else samples.tobytes()
    nbytes = samples.nbytes
    byte_rate = sample_rate * channels * 4
    block_align = channels * 4
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + nbytes) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 3, channels, sample_rate, byte_rate,
                      block_align, 32)
        + b"data" + struct.pack("<I", nbytes)
    )
    # overwrite-then-ftruncate instead of O_TRUNC: truncation drops the
    # file's page-cache pages and the rewrite re-faults them at this host
    # class's first-touch cost (measured 0.146 ms vs 0.005 ms for a 34 KB
    # rewrite — the round-3 demand-paging wall); ftruncate at an unchanged
    # size is a metadata no-op, and shrinks still trim stale tails
    fd = os.open(path, os.O_WRONLY | os.O_CREAT, 0o644)
    try:
        total = len(hdr) + nbytes
        done = os.writev(fd, [hdr, data])
        if done < total:  # partial write (POSIX permits it on any file)
            flat = hdr + bytes(data)
            while done < total:
                done += os.write(fd, memoryview(flat)[done:])
        os.ftruncate(fd, total)
    finally:
        os.close(fd)


def read_wav(path):
    """Read an IEEE-float WAV; returns (samples, sample_rate, channels)."""
    with open(path, "rb") as f:
        riff = f.read(12)
        assert riff[:4] == b"RIFF" and riff[8:12] == b"WAVE"
        sample_rate = channels = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                raise ValueError("no data chunk")
            cid, size = hdr[:4], struct.unpack("<I", hdr[4:])[0]
            if cid == b"fmt ":
                fmt = f.read(size)
                audio_fmt, channels, sample_rate = struct.unpack("<HHI", fmt[:8])
                if audio_fmt != 3:
                    raise ValueError("only IEEE-float WAV supported")
            elif cid == b"data":
                data = f.read(size)
                samples = np.frombuffer(data, dtype=np.float32)
                return samples, sample_rate, channels
            else:
                f.seek(size, 1)
