"""Minimal IEEE-float WAV writer/reader (format 3, 32-bit).

Reference: TestApp/WaveWriter.cs:10-70 (the reference's golden-output
harness writes the same format).
"""

import struct

import numpy as np


def write_wav(path, samples: np.ndarray, sample_rate: int, channels: int) -> None:
    """Write interleaved float32 ``samples`` as an IEEE-float WAV."""
    samples = np.asarray(samples, dtype=np.float32)
    data = samples.tobytes()
    byte_rate = sample_rate * channels * 4
    block_align = channels * 4
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(data)))
        f.write(b"WAVE")
        f.write(b"fmt ")
        f.write(struct.pack("<IHHIIHH", 16, 3, channels, sample_rate, byte_rate, block_align, 32))
        f.write(b"data")
        f.write(struct.pack("<I", len(data)))
        f.write(data)


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
