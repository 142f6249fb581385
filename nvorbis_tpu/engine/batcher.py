"""Frame-batching engine: host read-ahead -> bucketed device dispatch.

``JaxPipeline`` plugs into :class:`~nvorbis_tpu.stream_decoder.StreamDecoder`
(the ``engine="jax"`` path).  It reads ahead a window of packets, unpacks
them on the host plane into dense :class:`FrameSpec` tensors, buckets the
frames by *mode* (each mode has a static block size / window set / mapping
topology, so each bucket is one static-shaped XLA program — see
``synth/device.py``), dispatches one device call per bucket, and replays the
results to the decoder in original packet order so all overlap-add, end-trim,
position and stats semantics (``NVorbis/StreamDecoder.cs:417-541``) are
untouched.

This replaces the reference's packet-at-a-time synthesis with frame-batch
data parallelism: the overlap-add dependency between consecutive frames is
only pairwise, so a whole window of frames can be synthesized in parallel and
lapped afterwards.
"""

from collections import deque

import numpy as np


class JaxPipeline:
    """Read-ahead batched synthesis via the JAX device plane."""

    def __init__(self, decoder, readahead: int = 64):
        import jax  # noqa: F401  -- raise early when JAX is unavailable

        from nvorbis_tpu.synth.device import DeviceSynth

        self._DeviceSynth = DeviceSynth
        self._decoder = decoder
        self._readahead = readahead
        self._queue = deque()
        self._provider_done = False
        self._synths = {}  # id(mode) -> DeviceSynth

    def reset(self):
        self._queue.clear()
        self._provider_done = False

    def next_result(self):
        if not self._queue and not self._provider_done:
            self._fill()
        if not self._queue:
            return None
        return self._queue.popleft()

    # -- internals ----------------------------------------------------------

    def _synth_for(self, mode):
        synth = self._synths.get(id(mode))
        if synth is None:
            dec = self._decoder
            synth = self._DeviceSynth(dec._setup, mode, max_posts=dec._max_posts)
            self._synths[id(mode)] = synth
        return synth

    def _fill(self):
        dec = self._decoder
        results = []
        buckets = {}  # id(mode) -> (mode, [(result_index, frame)])
        while len(results) < self._readahead:
            packet = dec._packet_provider.get_next_packet()
            if packet is None:
                self._provider_done = True
                break
            res = dec._unpack_packet_result(packet)
            packet.done()
            frame = getattr(res, "_frame", None)
            results.append(res)
            if frame is not None:
                buckets.setdefault(id(frame.mode), (frame.mode, []))[1].append(
                    (len(results) - 1, frame)
                )
            if res.is_end_of_stream:
                break

        for mode, items in buckets.values():
            synth = self._synth_for(mode)
            frames = [f for _, f in items]
            residue = np.stack([f.residue for f in frames])
            ys = np.stack([f.floor1_ys for f in frames])
            used = np.stack([f.floor1_used for f in frames])
            has_floor = np.stack([f.has_floor for f in frames])
            window_index = np.array([f.window_index for f in frames], dtype=np.int32)
            f0 = None
            if synth.has_floor0:
                f0 = np.zeros(
                    (len(frames), synth.channels, synth.n2), dtype=np.float32
                )
                for i, f in enumerate(frames):
                    for c, curve in f.floor0_curves.items():
                        f0[i, c] = curve
            pcm = synth(residue, ys, used, has_floor, window_index, f0)
            for (ri, frame), out in zip(items, pcm):
                r = results[ri]
                r.pcm = np.array(out)  # writable copy for overlap-add
                r._frame = None

        self._queue.extend(results)
