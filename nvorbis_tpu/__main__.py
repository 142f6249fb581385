"""Decode-to-WAV command line harness — the reference TestApp equivalent
(TestApp/Program.cs:12-29 + WaveWriter.cs): decode an Ogg Vorbis file to a
32-bit float WAV, optionally via the forward-only (non-seekable) path.

    python -m nvorbis_tpu input.ogg [output.wav] [--engine jax|oracle|auto]
                                    [--forward-only] [--stats]
"""

import argparse
import io
import sys
import time


class _ForwardOnlyStream(io.RawIOBase):
    """CanSeek=false wrapper (TestApp/ForwardOnlyStream.cs:6-60)."""

    def __init__(self, path):
        self._f = open(path, "rb")

    def readable(self):
        return True

    def seekable(self):
        return False

    def readinto(self, b):
        return self._f.readinto(b)

    def close(self):
        self._f.close()
        super().close()


def main(argv=None):
    ap = argparse.ArgumentParser(prog="nvorbis_tpu", description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output", nargs="?", default=None)
    ap.add_argument("--engine", default="auto",
                    choices=("auto", "jax", "oracle"))
    ap.add_argument("--forward-only", action="store_true",
                    help="exercise the non-seekable streaming path")
    ap.add_argument("--stats", action="store_true",
                    help="print per-stream bitrate/bit accounting")
    args = ap.parse_args(argv)

    import nvorbis_tpu as nv
    from nvorbis_tpu.wave_io import write_wav

    out_path = args.output or (args.input.rsplit(".", 1)[0] + ".wav")
    source = (_ForwardOnlyStream(args.input) if args.forward_only
              else args.input)

    t0 = time.perf_counter()
    r = nv.VorbisReader(source, engine=args.engine)
    pcm = r.read_all()
    dt = time.perf_counter() - t0
    write_wav(out_path, pcm, r.sample_rate, r.channels)

    audio_sec = len(pcm) / max(1, r.channels) / r.sample_rate
    print(f"{args.input}: {r.channels}ch {r.sample_rate}Hz "
          f"{audio_sec:.2f}s -> {out_path} "
          f"({audio_sec / dt:.1f}x realtime, engine={args.engine})")
    if args.stats:
        s = r.stream_stats
        print(f"  effective bitrate: {s.effective_bit_rate} b/s")
        print(f"  audio/overhead/container/waste bits: {s.audio_bits}/"
              f"{s.overhead_bits}/{s.container_bits}/{s.waste_bits}")
        print(f"  packets: {s.packet_count}, clipped: {r.has_clipped}")
    r.dispose()
    return 0


if __name__ == "__main__":
    sys.exit(main())
