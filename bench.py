"""Benchmark: decoded audio seconds per wall second per chip (x-realtime).

Decodes the stereo 44.1 kHz fixture end-to-end (Ogg container -> host
bit-plane -> batched device synthesis -> overlap-add -> interleaved PCM)
repeatedly and reports the steady-state throughput multiple of realtime.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the ratio against the 500x-realtime north-star target
(the reference publishes no numbers; see BASELINE.md).
"""

import json
import sys
import time

FIXTURE = "/root/reference/TestFiles/3test.ogg"
TARGET_X_REALTIME = 500.0


def decode_once(raw, engine):
    import numpy as np
    import nvorbis_tpu as nv

    r = nv.VorbisReader(raw, engine=engine)
    pcm = r.read_all()
    rate = r.sample_rate
    channels = r.channels
    r.dispose()
    return len(pcm) / channels / rate, pcm


def main():
    engine = "jax"
    if "--oracle" in sys.argv:
        engine = "oracle"
    raw = open(FIXTURE, "rb").read()

    # warmup: populate jit caches
    audio_sec, _ = decode_once(raw, engine)

    reps = 3
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        audio_sec, _ = decode_once(raw, engine)
        dt = time.perf_counter() - t0
        best = max(best, audio_sec / dt)

    print(
        json.dumps(
            {
                "metric": "decode_throughput_stereo_44k1",
                "value": round(best, 3),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(best / TARGET_X_REALTIME, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
